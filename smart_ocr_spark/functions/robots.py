"""robots.txt evaluation over a web corpus (the politeness/compliance
pass a Common-Crawl-style pipeline runs before or during curation:
drop pages a site's robots.txt disallows for the crawling agent).

Semantics follow the Google robots.txt spec (RFC 9309):
  * groups are runs of ``User-agent:`` lines followed by rules;
    consecutive UA lines stack onto the same group;
  * the group(s) whose agent token equals the caller's agent
    (case-insensitive) apply; if none, the ``*`` group(s) apply; if
    neither exists the host is unrestricted;
  * rule matching is CHARACTER-grain path prefix; ``*`` matches any
    octet run and a trailing ``$`` anchors the end;
  * the longest rule (octets, as written) wins; on a length tie
    ``Allow`` beats ``Disallow``; no matching rule means allowed;
  * an empty ``Disallow:`` is no restriction (dropped at parse).

Scale shape: robots bodies are parsed with an Arrow-batched pandas
pass over the ROBOTS table (one row per host — dictionary-sized,
Python never touches the page corpus); pages join their host's
exploded rules by a host-keyed EQUI-join (fan-out bounded by
rules-per-host, hot hosts are AQE-splittable join keys); per-page
rule matching is JVM ``startswith`` for literal rules and
``regexp_like`` only for the wildcard minority; the winning rule is a
two-stage ``max(struct(...))`` aggregation (longest rule, allow on
ties) — no windows anywhere.

Reference parity: /root/reference has no crawling/compliance surface —
this is part of the web-pipeline operator family the reference lacks.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from smart_ocr_spark.functions.urls import AUTHORITY_PREFIX, host_col

_UA_RE = re.compile(r"^\s*user-agent\s*:\s*(\S+)", re.I)
_RULE_RE = re.compile(r"^\s*(allow|disallow)\s*:\s*(\S*)", re.I)


def parse_robots_rules(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """(rule_path, allow) rules of the group applying to ``agent``
    (pure-Python kernel — unit-testable off Spark, applied over the
    host-grain robots table only)."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] | None = None
    # RFC 9309 §2.3: skip a UTF-8 BOM — real robots.txt files carry
    # one often enough that dropping it silently loses the first
    # User-agent line and with it the whole group's rules
    for line in (text or "").lstrip("\ufeff").splitlines():
        line = line.split("#", 1)[0]
        m = _UA_RE.match(line)
        if m:
            if cur_rules is not None:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], None
            cur_agents.append(m.group(1).lower())
            continue
        m = _RULE_RE.match(line)
        if m and cur_agents:
            if cur_rules is None:
                cur_rules = []
            allow = m.group(1).lower() == "allow"
            path = m.group(2)
            if path == "" and not allow:
                continue  # empty Disallow = no restriction
            if path:
                cur_rules.append((path, allow))
    if cur_agents:
        groups.append((cur_agents, cur_rules or []))

    exact = [r for agents, rules in groups if agent in agents for r in rules]
    if any(agent in agents for agents, _ in groups):
        return exact
    return [r for agents, rules in groups if "*" in agents for r in rules]


def _rule_regex(path: str) -> str:
    """Wildcard robots rule → anchored Java/RE2-safe regex."""
    anchored = path.endswith("$")
    if anchored:
        path = path[:-1]
    parts = [re.escape(p) for p in path.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def robots_rules_df(
    robots: DataFrame,
    agent: str = "*",
    host_col_name: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Explode a (host, robots_txt) table into the agent's rule rows:
    (host, rule_path, allow, is_wildcard, rule_regex, rule_len)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, paths, allows, wilds, regexes, lens = [], [], [], [], [], []
            for host, text in zip(pdf[host_col_name], pdf[text_col]):
                for path, allow in parse_robots_rules(text, agent):
                    # page hosts arrive lowercased (urls.host_col);
                    # normalize the robots side so the equi-join can't
                    # miss on a mixed-case host row
                    hosts.append((host or "").lower())
                    paths.append(path)
                    allows.append(allow)
                    wild = "*" in path or path.endswith("$")
                    wilds.append(wild)
                    regexes.append(_rule_regex(path) if wild else "")
                    lens.append(len(path))
            yield pd.DataFrame(
                {
                    "host": hosts,
                    "rule_path": paths,
                    "allow": allows,
                    "is_wildcard": wilds,
                    "rule_regex": regexes,
                    "rule_len": lens,
                }
            )

    return robots.select(host_col_name, text_col).mapInPandas(
        run,
        "host string, rule_path string, allow boolean, "
        "is_wildcard boolean, rule_regex string, rule_len int",
    )


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Evaluate each page's URL against its host's robots rules.

    ``robots`` carries (host, robots_txt).  Output: (id, host, path,
    robots_blocked, matched_rule) — ``matched_rule`` is the winning
    rule path (longest match, allow on ties), NULL when no rule
    matched or the host has no robots.txt (both allowed)."""
    u = F.col(url_col)
    base = pages.select(
        F.col(id_col),
        host_col(u).alias("host"),
        F.coalesce(
            F.nullif(
                # path+query, fragment dropped (RFC 9309 URI matching);
                # authority prefix shared with urls.py so host and path
                # extraction can never drift apart
                F.regexp_extract(u, AUTHORITY_PREFIX + r"([^#]*)", 1),
                F.lit(""),
            ),
            F.lit("/"),
        ).alias("path"),
    )
    rules = robots_rules_df(robots, agent)
    cand = base.join(rules, "host")
    hit = F.when(
        F.col("is_wildcard"), F.regexp_like("path", F.col("rule_regex"))
    ).otherwise(F.col("path").startswith(F.col("rule_path")))
    winners = (
        cand.where(hit)
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("rule_len").alias("l"),
                    F.col("allow").alias("a"),
                    F.col("rule_path").alias("p"),
                )
            ).alias("_w")
        )
    )
    return base.join(winners, id_col, "left").select(
        F.col(id_col),
        "host",
        "path",
        F.coalesce(~F.col("_w.a"), F.lit(False)).alias("robots_blocked"),
        F.col("_w.p").alias("matched_rule"),
    )
