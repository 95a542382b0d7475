"""URL canonicalization + host-level curation stats (web-pipeline ops:
Common-Crawl-style corpora dedup by normalized URL before any content
pass — the cheapest dedup tier — and score hosts as spam/quality units;
ccnet and the CC processing literature both work at these grains).

All pure JVM column algebra (regexp chains + array ops), so the
canonicalization runs inside whole-stage codegen and the dedup is one
shuffle keyed by canonical URL.

Canonical form (documented contract, mirrored verbatim by the DuckDB
oracle):
  * scheme and host lowercased; default ports stripped (http:80,
    https:443); other ports kept;
  * fragment dropped;
  * trailing slashes stripped from the path (root collapses to "");
  * tracking parameters dropped (utm_*, gclid, fbclid, ref, mc_cid,
    mc_eid), remaining query params SORTED (order-insensitive dedup),
    empty query dropped;
  * non-URL strings (no ``scheme://``) pass through lowercased — a
    conservative identity-ish fallback rather than a guess.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# anchored match over one "k=v" (or bare "k") query token
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref|mc_cid|mc_eid)(=|$)"

# scheme://authority prefix, shared with every module that splits URLs
# (functions/robots.py) so host/path extraction can never drift between
# ops that join on the host
SCHEME_CHARS = r"[A-Za-z][A-Za-z0-9+.\-]*"
AUTHORITY_PREFIX = rf"^{SCHEME_CHARS}://[^/?#]*"
_SCHEME_RE = rf"^({SCHEME_CHARS})://"
_HOSTPORT_RE = rf"^{SCHEME_CHARS}://([^/?#]*)"
_PATH_RE = rf"{AUTHORITY_PREFIX}([^?#]*)"


def host_col(url: Column) -> Column:
    """Lowercased host without the port ('' for non-URLs)."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    return F.regexp_replace(hostport, r":\d+$", "")


def canonical_url_col(url: Column) -> Column:
    proto = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((proto == "http") & (port == "80"))
        | ((proto == "https") & (port == "443"))
    )
    hostc = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    path = F.regexp_replace(
        F.regexp_extract(url, _PATH_RE, 1), r"/+$", ""
    )
    # strip the fragment BEFORE extracting the query: a '?' inside a
    # fragment (SPA hash-routing, '#/route?x=1') is not a query and
    # must not leak into the canonical form
    pre_fragment = F.regexp_replace(url, r"#.*$", "")
    query = F.regexp_extract(pre_fragment, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qstr = F.array_join(kept, "&")
    canonical = F.concat(
        proto, F.lit("://"), hostc, path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(proto != "", canonical).otherwise(F.lower(url))


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    u = F.col(url_col)
    return df.withColumn("canonical_url", canonical_url_col(u)).withColumn(
        "host", host_col(u)
    )


def url_dedup_keep_list(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """(id, canonical_url, host, kept): first-id-wins per canonical URL
    — the cheapest dedup tier, run BEFORE any content pass.
    Deterministic on any partitioning (min id, not first arrival).

    Skew-safe shape (VERDICT r4 #2 — no window): the min id per
    canonical URL is a two-stage AGGREGATION keyed by the 8-byte
    ``xxhash64(canonical_url)``, so a spam-mirror URL duplicated
    across a large slice of the corpus combines map-side to one
    partial row per map partition before its shuffle.  The per-row
    ``kept`` flag then comes from an equi-join on the fixed-width
    hash: unlike a window (whole key on ONE task, sort required), a
    shuffle join's hot probe partition is AQE-skew-splittable — the
    build side carries exactly one row per distinct URL.  Hash
    collisions (p ~ 2^-64 per pair) would merge two URLs' keep
    groups — the standard hash-keyed dedup trade."""
    c = with_canonical_url(df, url_col).withColumn(
        "_uhash", F.xxhash64("canonical_url")
    )
    mins = c.groupBy("_uhash").agg(F.min(id_col).alias("_first_id"))
    return c.join(mins, "_uhash").select(
        F.col(id_col), "canonical_url", "host",
        (F.col(id_col) == F.col("_first_id")).alias("kept"),
    )


def url_latest_revision(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Cross-dump freshness dedup: keep the NEWEST capture per
    canonical URL (CC-News-style recrawl handling — the complement of
    :func:`url_dedup_keep_list`'s first-id-wins rule).  Keeper =
    max ``(ts, id)`` lexicographic, so timestamp ties break to the
    larger id deterministically; ``ts_col`` may be a timestamp or an
    epoch integer (any orderable type).  NULL timestamps lose to any
    non-NULL capture (and among all-NULL groups the max id wins).

    Same skew-safe shape as the first-id keeper: two-stage
    ``max(struct)`` aggregation keyed by ``xxhash64(canonical_url)``
    (map-side partials absorb a hot recrawled URL), join-back on the
    fixed-width hash, no window."""
    c = with_canonical_url(df, url_col).withColumn(
        "_uhash", F.xxhash64("canonical_url")
    )
    ts = F.col(ts_col)
    best = c.groupBy("_uhash").agg(
        F.max(
            F.struct(
                ts.isNotNull().alias("nn"),
                ts.alias("t"),
                F.col(id_col).alias("i"),
            )
        ).alias("_b")
    )
    return c.join(best, "_uhash").select(
        F.col(id_col),
        "canonical_url",
        (F.col(id_col) == F.col("_b.i")).alias("kept"),
    )


def host_suffix_chain(host: Column, max_labels: int = 10) -> Column:
    """DNS suffix chain of a host, shortest ``max_labels`` suffixes
    kept: ``a.b.example.org`` → ``[a.b.example.org, b.example.org,
    example.org, org]``.  Blocklists hold registered domains (short
    suffixes), so when a pathological host exceeds the cap it is the
    LONG suffixes that drop — the registrable tail always survives."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    start = F.greatest(F.lit(1), n - F.lit(max_labels - 1))
    return F.transform(
        F.sequence(start, n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )


def url_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    max_labels: int = 10,
) -> DataFrame:
    """Domain-blocklist filter (the RefinedWeb/UT1-style first curation
    stage: drop docs whose host IS a blocked domain or is a SUBDOMAIN
    of one).  ``blocklist`` carries one lowercase registered domain per
    row in column ``domain``.

    Output: (id, host, blocked, matched_domain) — ``matched_domain``
    is the LONGEST (most specific) blocklist entry that matched, NULL
    when unblocked; the longest-match pick is deterministic because
    the suffixes of one host have pairwise-distinct lengths.

    Scale shape: subdomain matching is an EQUI-join, never an
    endswith theta-join (which Spark can only execute as a broadcast
    nested-loop — hopeless against a 4.6M-domain UT1-scale list).
    Each host explodes into its ≤``max_labels`` DNS suffixes (bounded
    fan-out, JVM-side) and joins the blocklist on the suffix; Spark
    picks broadcast vs shuffle from the blocklist's actual size, a
    hot blocked domain is an AQE-splittable join key (not a window),
    and the per-doc longest-match reduction is a two-stage ``max``
    aggregation that combines map-side."""
    u = F.col(url_col)
    base = df.select(F.col(id_col), host_col(u).alias("host"))
    bl = blocklist.select(
        F.lower(F.col("domain")).alias("_bl_domain")
    ).distinct()
    sufs = base.select(
        id_col,
        F.explode(host_suffix_chain(F.col("host"), max_labels)).alias(
            "_suffix"
        ),
    )
    hits = (
        sufs.join(bl, sufs["_suffix"] == bl["_bl_domain"])
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.length("_bl_domain").alias("l"),
                    F.col("_bl_domain").alias("d"),
                )
            ).alias("_m")
        )
    )
    return base.join(hits, id_col, "left").select(
        F.col(id_col),
        "host",
        F.col("_m").isNotNull().alias("blocked"),
        F.col("_m.d").alias("matched_domain"),
    )


def host_stats(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """Per-host curation rollup: raw docs, distinct canonical URLs
    (raw - distinct = the host's URL-dup mass, a classic spam/mirror
    signal), and survivors of the URL dedup."""
    keep = url_dedup_keep_list(df, id_col, url_col)
    return keep.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("canonical_url").alias("n_canonical"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
    )
