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
Python never touches the page corpus) into ONE rules-array row per
host; pages join that by a host-keyed EQUI-join that emits EXACTLY
one row per page (no pages×rules fan-out: a Zipf-hot host with a
500-line robots.txt used to multiply every one of its pages by 500
inside the join stage); longest-match/allow-wins evaluation is then
per-row JVM array algebra — ``filter`` over the rules array
(``startswith`` for literal rules, ``regexp_like`` only for the
wildcard minority) and ``array_max`` over (len, allow, path) structs
— the only aggregation anywhere is the robots-grain (dictionary-
sized) duplicate-host merge before the join, no windows, nothing at
page grain for a hot host to skew.

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


def _materialize_rules(text: str, agent: str) -> list[dict]:
    """The ONE kernel both table shapes share: parsed rules of the
    group applying to ``agent``, each with the derived match metadata
    (wildcard flag, compiled regex, length) — keeping the exploded
    diagnostic view and the array view :func:`robots_filter` evaluates
    from ever disagreeing."""
    out = []
    for path, allow in parse_robots_rules(text, agent):
        wild = "*" in path or path.endswith("$")
        out.append(
            {
                "rule_path": path,
                "allow": allow,
                "is_wildcard": wild,
                "rule_regex": _rule_regex(path) if wild else "",
                "rule_len": len(path),
            }
        )
    return out


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
            hosts, rules = [], []
            for host, text in zip(pdf[host_col_name], pdf[text_col]):
                for rule in _materialize_rules(text, agent):
                    # page hosts arrive lowercased (urls.host_col);
                    # normalize the robots side so the equi-join can't
                    # miss on a mixed-case host row
                    hosts.append((host or "").lower())
                    rules.append(rule)
            yield pd.DataFrame(
                {
                    "host": hosts,
                    "rule_path": [r["rule_path"] for r in rules],
                    "allow": [r["allow"] for r in rules],
                    "is_wildcard": [r["is_wildcard"] for r in rules],
                    "rule_regex": [r["rule_regex"] for r in rules],
                    "rule_len": [r["rule_len"] for r in rules],
                }
            )

    return robots.select(host_col_name, text_col).mapInPandas(
        run,
        "host string, rule_path string, allow boolean, "
        "is_wildcard boolean, rule_regex string, rule_len int",
    )


_RULE_STRUCT = (
    "struct<rule_path:string,allow:boolean,is_wildcard:boolean,"
    "rule_regex:string,rule_len:int>"
)


def robots_host_rules_df(
    robots: DataFrame,
    agent: str = "*",
    host_col_name: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """One row PER HOST: (host, rules array<struct<rule_path, allow,
    is_wildcard, rule_regex, rule_len>>) — the join-side shape
    :func:`robots_filter` wants (one array row per host keeps the
    pages join 1:1; :func:`robots_rules_df` is the exploded diagnostic
    view).  The parse is map-only (the array is built inside the same
    Arrow batch that parses the robots body); a host-keyed
    ``flatten(collect_list(...))`` then merges duplicate host rows
    (multi-epoch fetch tables) into ONE array so the downstream pages
    join stays 1:1 and the winner is picked over ALL of a host's rules
    — the agg is at robots-table grain (dictionary-sized), never
    pages, and rule ORDER within the merged array is irrelevant
    (longest-match / allow-on-ties is order-independent)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, rule_arrays = [], []
            for host, text in zip(pdf[host_col_name], pdf[text_col]):
                hosts.append((host or "").lower())
                rule_arrays.append(_materialize_rules(text, agent))
            yield pd.DataFrame({"host": hosts, "rules": rule_arrays})

    parsed = robots.select(host_col_name, text_col).mapInPandas(
        run, f"host string, rules array<{_RULE_STRUCT}>"
    )
    return parsed.groupBy("host").agg(
        F.flatten(F.collect_list("rules")).alias("rules")
    )


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Evaluate each page's URL against its host's robots rules.

    ``robots`` carries (host, robots_txt), one row per host.  Output:
    (id, host, path, robots_blocked, matched_rule) — ``matched_rule``
    is the winning rule path (longest match, allow on ties), NULL when
    no rule matched or the host has no robots.txt (both allowed).

    Exactly ONE output row per page, produced without any
    row-increasing join or aggregation: the rules ride as one array
    per host, matching rules are selected by a JVM ``filter`` over
    the array and the winner by ``array_max`` over (rule_len, allow,
    rule_path) structs — all per-row, so a Zipf-hot host costs its
    page count times its (bounded, dictionary-sized) rule count in
    mapper work instead of a pages×rules shuffle fan-out."""
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
    host_rules = robots_host_rules_df(robots, agent)
    j = base.join(host_rules, "host", "left")  # 1:1 — one row per page

    def hit(r):
        return F.when(
            r["is_wildcard"], F.regexp_like(F.col("path"), r["rule_regex"])
        ).otherwise(F.col("path").startswith(r["rule_path"]))

    winner = F.array_max(
        F.transform(
            F.filter(F.col("rules"), hit),
            lambda r: F.struct(
                r["rule_len"].alias("l"),
                r["allow"].alias("a"),
                r["rule_path"].alias("p"),
            ),
        )
    )
    return j.select(
        F.col(id_col),
        "host",
        "path",
        winner.alias("_w"),
    ).select(
        F.col(id_col),
        "host",
        "path",
        F.coalesce(~F.col("_w.a"), F.lit(False)).alias("robots_blocked"),
        F.col("_w.p").alias("matched_rule"),
    )
