"""jobs/curate.py: the multi-sweep curation job runs end-to-end in a
fresh interpreter (the spark-submit shape), writes every sweep's
parquet, reports per-sweep stats on one JSON line, and — the
VERDICT r4 #4 seam — finishes with an EMPTY executor cache because
each sweep's pins die with its cache_scope."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_curate_job_end_to_end(tmp_path):
    out = str(tmp_path / "curated")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "curate.py"),
            "--input", SF_DOCS, "--output", out,
            "--sweeps", "funnel,url,paragraph,spans,shards",
            "--master", "local[4]",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])

    funnel = report["sweeps"]["funnel"]
    assert funnel["rows"] == funnel["n_total"] > 0
    assert funnel["n_keep"] <= funnel["n_quality_ok"]
    # documents table carries no url column -> honest skip, not a crash
    assert report["sweeps"]["url"] == {"skipped": "no url column"}
    assert report["sweeps"]["paragraph"]["rows"] == funnel["n_total"]
    # shard assembly gates on the funnel verdicts it just wrote and
    # packs exactly the keepers
    spans = report["sweeps"]["spans"]
    assert spans["rows"] == funnel["n_total"]
    assert spans["blocks_removed"] > 0      # planted exact dups
    shards = report["sweeps"]["shards"]
    assert shards["gates"] == ["spans", "funnel"]
    assert shards["rows"] == funnel["n_keep"]
    assert 0 < shards["shards"] <= 8
    for sub in ("funnel", "paragraph", "spans", "shards", "shard_manifest"):
        assert os.path.isdir(os.path.join(out, sub)), sub
    # the seam: no sweep's pinned intermediates outlive the job
    assert report["cache_empty"] is True


def test_curate_job_ingest_tier(tmp_path):
    """--history engages the dump-vs-history ingestion pair: the Bloom
    exact tier drops verbatim copies of history, the MinHash near-dup
    tier drops verified near-dups, and every later sweep sees only the
    survivors."""
    import duckdb

    hist = str(tmp_path / "history.parquet")
    dump = str(tmp_path / "dump.parquet")
    duckdb.sql(
        f"COPY (SELECT doc_id, text FROM read_parquet('{SF_DOCS}') "
        f"WHERE doc_id % 3 <> 0) TO '{hist}' (FORMAT PARQUET)"
    )
    # dump: every 9th doc an EXACT copy of a history doc, every 6th a
    # NEAR-dup (history text + short tail), the rest genuinely new
    duckdb.sql(f"""
COPY (
  SELECT d.* REPLACE (
    CASE WHEN d.doc_id % 9 = 0 AND h.text IS NOT NULL THEN h.text
         WHEN d.doc_id % 6 = 0 AND h.text IS NOT NULL
           THEN h.text || ' ingest tail'
         ELSE d.text END AS text)
  FROM read_parquet('{SF_DOCS}') d
  LEFT JOIN read_parquet('{SF_DOCS}') h ON h.doc_id = d.doc_id + 1
  WHERE d.doc_id % 3 = 0
) TO '{dump}' (FORMAT PARQUET)""")
    out = str(tmp_path / "curated")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "curate.py"),
            "--input", dump, "--output", out,
            "--history", hist,
            "--sweeps", "ingest,funnel",
            "--master", "local[4]",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    ing = report["sweeps"]["ingest"]
    assert ing["rows_in"] > ing["exact_new"] >= ing["rows"] > 0
    assert ing["dropped_exact"] > 0       # the planted verbatim copies
    assert ing["dropped_neardup"] > 0     # the planted near-dups
    # downstream sweeps curate only the survivors
    assert report["sweeps"]["funnel"]["n_total"] == ing["rows"]
    assert report["cache_empty"] is True
    assert ing["sig_reused"] is False and ing["sig_rows_next"] > 0

    # epoch 2: history = (old history ∪ accepted dump) paired with the
    # stored signature artifact — replaying the SAME dump must drop
    # everything (survivors are now exact dups of history; the old
    # near-dups still verify against the original history text) and
    # the history is never re-signed
    hist2 = str(tmp_path / "history2.parquet")
    duckdb.sql(
        f"""COPY (
        SELECT doc_id, text FROM read_parquet('{hist}')
        UNION ALL
        SELECT doc_id, text FROM read_parquet('{out}/ingest/*.parquet')
        ) TO '{hist2}' (FORMAT PARQUET)"""
    )
    # SAME --output as epoch 1: --history-sig IS this run's own
    # history_sig_next path — the staged write must swap it safely
    proc2 = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "curate.py"),
            "--input", dump, "--output", out,
            "--history", hist2,
            "--history-sig", os.path.join(out, "history_sig_next"),
            "--sweeps", "ingest",
            "--master", "local[4]",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    rep2 = json.loads(proc2.stdout.strip().splitlines()[-1])
    ing2 = rep2["sweeps"]["ingest"]
    assert ing2["sig_reused"] is True
    assert ing2["rows"] == 0
    # the swapped artifact still reads back whole
    assert ing2["sig_rows_next"] >= ing["sig_rows_next"]


def test_curate_job_ingest_skip_without_history(tmp_path):
    out = str(tmp_path / "curated")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "curate.py"),
            "--input", SF_DOCS, "--output", out,
            "--sweeps", "ingest,funnel",
            "--master", "local[4]",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["sweeps"]["ingest"] == {"skipped": "no --history"}
    assert report["sweeps"]["funnel"]["rows"] > 0


def test_curate_job_compliance_sweep(tmp_path, spark):
    """Compliance sweep: domain blocklist + robots.txt verdicts gate
    the shard assembly; per-source blocked counts reported."""
    docs = spark.createDataFrame(
        [
            (
                i,
                f"filler words document {i} body",
                "https://"
                + ("bad.example.org" if i < 5
                   else "sub.bad.example.org" if i < 8
                   else "good.example.net")
                + ("/private/x" if 8 <= i < 12 else "/ok/x"),
            )
            for i in range(20)
        ],
        "doc_id long, text string, url string",
    )
    docs_path = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(docs_path)
    bl_path = str(tmp_path / "blocklist")
    spark.createDataFrame(
        [("bad.example.org",)], "domain string"
    ).write.parquet(bl_path)
    rb_path = str(tmp_path / "robots")
    spark.createDataFrame(
        [("good.example.net", "User-agent: *\nDisallow: /private\n")],
        "host string, robots_txt string",
    ).write.parquet(rb_path)

    out = str(tmp_path / "curated")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "curate.py"),
            "--input", docs_path, "--output", out,
            "--sweeps", "compliance,shards",
            "--blocklist", bl_path, "--robots", rb_path,
            "--master", "local[4]",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    comp = report["sweeps"]["compliance"]
    # 5 exact-host + 3 subdomain-suffix blocklist hits; 4 robots hits
    assert comp["rows"] == 20
    assert comp["blocklist_blocked"] == 8
    assert comp["robots_blocked"] == 4
    assert comp["kept"] == 8
    shards = report["sweeps"]["shards"]
    assert shards["gates"] == ["compliance"]
    assert shards["rows"] == 8
    assert report["cache_empty"] is True


def test_curate_job_compliance_skips_without_url_column(tmp_path):
    out = str(tmp_path / "curated")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "curate.py"),
            "--input", SF_DOCS, "--output", out,
            "--sweeps", "compliance",
            "--master", "local[4]",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["sweeps"]["compliance"] == {
        "skipped": "no url column"
    }


def test_curate_job_compliance_skips_without_inputs(tmp_path, spark):
    """A url-bearing corpus with neither --blocklist nor --robots (the
    DEFAULT_SWEEPS shape for any web corpus) must skip-report, not
    crash or emit an all-keep verdict."""
    docs = spark.createDataFrame(
        [(i, f"doc {i} text", f"https://h{i}.example/p") for i in range(5)],
        "doc_id long, text string, url string",
    )
    docs_path = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(docs_path)
    out = str(tmp_path / "curated")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "curate.py"),
            "--input", docs_path, "--output", out,
            "--sweeps", "compliance",
            "--master", "local[4]",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["sweeps"]["compliance"] == {
        "skipped": "no --blocklist/--robots"
    }
    assert not os.path.exists(os.path.join(out, "compliance"))
