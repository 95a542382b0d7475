"""robots.txt evaluation: pure-Python parser kernel, Google-spec
matching semantics (longest match, allow-on-tie, char-grain prefix,
wildcards), group selection, and the distributed plan shape."""

from smart_ocr_spark.functions.robots import (
    _rule_regex,
    parse_robots_rules,
    robots_filter,
)

BODY = (
    "# comment\n"
    "User-agent: GoodBot\n"
    "User-agent: OtherBot\n"
    "Disallow: /good\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Disallow:\n"          # empty Disallow = no restriction
    "Allow:\n"             # empty Allow = meaningless, dropped
    "Disallow: /wild/*.pdf$\n"
)


def test_parse_group_selection():
    # exact agent match (case-insensitive) beats the * group
    assert parse_robots_rules(BODY, "goodbot") == [("/good", False)]
    # stacked UA lines share one group
    assert parse_robots_rules(BODY, "OTHERBOT") == [("/good", False)]
    # unknown agent falls back to the * group; empty rules dropped
    assert parse_robots_rules(BODY, "ccbot") == [
        ("/private", False),
        ("/private/ok", True),
        ("/wild/*.pdf$", False),
    ]
    assert parse_robots_rules("", "x") == []
    assert parse_robots_rules(None, "x") == []
    # no matching group at all -> unrestricted
    assert parse_robots_rules("User-agent: a\nDisallow: /\n", "b") == []


def test_parse_strips_bom():
    """RFC 9309 §2.3: a UTF-8 BOM must not eat the first User-agent
    line (and with it the whole group)."""
    body = "﻿User-agent: *\nDisallow: /\n"
    assert parse_robots_rules(body, "ccbot") == [("/", False)]


def test_robots_mixed_case_host_row(spark):
    """A mixed-case host in the robots TABLE must still apply: page
    hosts arrive lowercased, so the robots side normalizes too."""
    pages = spark.createDataFrame(
        [(0, "https://Example.com/secret")], ["doc_id", "url"]
    )
    robots = spark.createDataFrame(
        [("Example.com", "User-agent: *\nDisallow: /\n")],
        ["host", "robots_txt"],
    )
    out = robots_filter(pages, robots).collect()
    assert out[0]["robots_blocked"]


def test_rule_regex():
    assert _rule_regex("/a/*.pdf$") == "^/a/.*\\.pdf$"
    assert _rule_regex("/a*b") == "^/a.*b"


def test_robots_filter_semantics(spark):
    pages = spark.createDataFrame(
        [
            (0, "https://s.example/private/x"),       # blocked
            (1, "https://s.example/private/ok/x"),    # allow wins (longer)
            (2, "https://s.example/public"),          # no rule
            (3, "https://s.example/privateer"),       # char-grain prefix
            (4, "https://s.example/wild/doc.pdf"),    # wildcard + anchor
            (5, "https://s.example/wild/doc.pdfx"),   # anchor rejects
            (6, "https://other.example/private/x"),   # no robots -> allowed
            (7, "https://s.example"),                 # empty path -> '/'
        ],
        ["doc_id", "url"],
    )
    robots = spark.createDataFrame(
        [("s.example", BODY)], ["host", "robots_txt"]
    )
    out = {r["doc_id"]: r for r in robots_filter(pages, robots).collect()}
    assert len(out) == 8
    assert out[0]["robots_blocked"] and out[0]["matched_rule"] == "/private"
    assert not out[1]["robots_blocked"]
    assert out[1]["matched_rule"] == "/private/ok"
    assert not out[2]["robots_blocked"] and out[2]["matched_rule"] is None
    assert out[3]["robots_blocked"]  # '/privateer' startswith '/private'
    assert out[4]["robots_blocked"]
    assert out[4]["matched_rule"] == "/wild/*.pdf$"
    assert not out[5]["robots_blocked"]
    assert not out[6]["robots_blocked"] and out[6]["matched_rule"] is None
    assert out[7]["path"] == "/" and not out[7]["robots_blocked"]


def test_robots_filter_query_includes_path(spark):
    """Robots matching applies to path+query (RFC 9309 URI matching)."""
    pages = spark.createDataFrame(
        [(0, "https://h.example/search?q=x"), (1, "https://h.example/p#frag")],
        ["doc_id", "url"],
    )
    robots = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /search?\n")],
        ["host", "robots_txt"],
    )
    out = {r["doc_id"]: r for r in robots_filter(pages, robots).collect()}
    assert out[0]["path"] == "/search?q=x" and out[0]["robots_blocked"]
    # fragment is not part of the matched URI
    assert out[1]["path"] == "/p"


def test_robots_filter_hot_host_plan(spark):
    """Scale shape (VERDICT r5 #2 rewrite): half a 10k-page corpus on
    ONE host.  The rules ride as one array per host, so the plan has
    exactly one host-keyed equi-join emitting one row per page and NO
    aggregation/window at all — nothing for the hot host to fan out
    or skew."""
    n = 10_000
    pages = spark.createDataFrame(
        [
            (i,
             f"http://hot.example/private/{i}" if i % 2
             else f"http://cold{i}.example/x")
            for i in range(n)
        ],
        ["doc_id", "url"],
    ).repartition(8)
    robots = spark.createDataFrame(
        [("hot.example", "User-agent: *\nDisallow: /private\n")],
        ["host", "robots_txt"],
    )
    out_df = robots_filter(pages, robots)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    # winner selection is per-row array algebra: the ONLY aggregate in
    # the plan is the robots-grain duplicate-host merge (keyed by
    # host, dictionary-sized) — nothing aggregates at page grain, so
    # no pages-x-rules fan-out exists anywhere
    import re as _re

    agg_keys = _re.findall(r"Aggregate\(keys=\[(\w*)", plan)
    assert agg_keys and all(k == "host" for k in agg_keys), agg_keys
    assert plan.count("Join") >= 1

    rows = out_df.collect()
    assert len(rows) == n
    assert sum(1 for r in rows if r["robots_blocked"]) == n // 2


def test_robots_filter_hot_host_many_rules(spark):
    """The adversarial fan-out case the rewrite removes: ONE host with
    500 rules under 10k pages — output must stay one row per page with
    the longest-match/allow-wins verdict intact."""
    n = 10_000
    pages = spark.createDataFrame(
        [(i, f"http://hot.example/p{i % 400}/doc-{i}-x") for i in range(n)],
        ["doc_id", "url"],
    ).repartition(8)
    # 500 rules: /p0../p399 disallowed, 50 longer Allow overrides for
    # the longest-match tiebreak (the '-' delimiters keep 'doc-7-' from
    # prefix-matching doc-70-), plus noise rules that never match
    lines = ["User-agent: *"]
    lines += [f"Disallow: /p{k}/" for k in range(400)]
    lines += [f"Allow: /p{k}/doc-{k}-" for k in range(50)]
    lines += [f"Disallow: /never{k}" for k in range(50)]
    robots = spark.createDataFrame(
        [("hot.example", "\n".join(lines))], ["host", "robots_txt"]
    )
    out_df = robots_filter(pages, robots)
    rows = out_df.collect()
    assert len(rows) == n                      # one row per page, no fan-out
    by_id = {r["doc_id"]: r for r in rows}
    # doc k in /pk/doc-k-x hits the longer Allow for k < 50
    assert not by_id[7]["robots_blocked"]
    assert by_id[7]["matched_rule"] == "/p7/doc-7-"
    # every other page is blocked by its /pk/ Disallow
    assert by_id[450]["robots_blocked"]
    assert by_id[450]["matched_rule"] == "/p50/"
    n_allowed = sum(1 for r in rows if not r["robots_blocked"])
    assert n_allowed == 50                     # exactly doc0..doc49


def test_robots_filter_duplicate_host_rows_merge(spark):
    """A robots table with SEVERAL rows for one host (multi-epoch
    fetches) must behave like the union of their rules — one verdict
    row per page, winner picked across ALL rows — not fan pages out
    into contradictory per-row verdicts."""
    pages = spark.createDataFrame(
        [(0, "https://h.example/a/b"), (1, "https://h.example/a/c")],
        ["doc_id", "url"],
    )
    robots = spark.createDataFrame(
        [
            ("h.example", "User-agent: *\nDisallow: /a\n"),
            ("h.example", "User-agent: *\nAllow: /a/b\n"),
        ],
        ["host", "robots_txt"],
    )
    out = robots_filter(pages, robots).collect()
    assert len(out) == 2                     # one row per page
    by_id = {r["doc_id"]: r for r in out}
    # the longer Allow from the SECOND row beats the first row's
    # Disallow — rules merged across duplicate host rows
    assert not by_id[0]["robots_blocked"]
    assert by_id[0]["matched_rule"] == "/a/b"
    assert by_id[1]["robots_blocked"]
    assert by_id[1]["matched_rule"] == "/a"
