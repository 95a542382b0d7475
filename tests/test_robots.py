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
    """Scale shape: half a 10k-page corpus on ONE host. The rule match
    is a host-keyed equi-join (AQE-splittable; no BroadcastNestedLoop)
    and the winner pick a two-stage agg (partial_max, no Window)."""
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
    assert "partial_max" in plan

    rows = out_df.collect()
    assert len(rows) == n
    assert sum(1 for r in rows if r["robots_blocked"]) == n // 2
