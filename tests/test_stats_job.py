"""jobs/stats.py: the one-pass corpus profile runs in a fresh
interpreter, reports totals/percentiles/langs/dup-rates on one JSON
line, and leaves the cache empty."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_stats_job_profile(tmp_path):
    out = str(tmp_path / "profile")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "stats.py"),
            "--input", SF_DOCS, "--output", out,
            "--master", "local[4]",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["n_docs"] == 500
    assert rep["n_tokens"] > 0 and rep["n_chars"] > rep["n_tokens"]
    p = rep["approx_token_pcts"]
    assert p["p10"] <= p["p50"] <= p["p90"] <= p["p99"]
    assert sum(rep["langs"].values()) == 500
    dup = rep["exact_dup"]
    assert dup["n_distinct_texts"] + dup["n_duplicate_rows"] == 500
    assert 0 <= dup["dup_rate"] < 1
    assert dup["largest_group"] >= 1
    assert rep["cache_empty"] is True
    assert os.path.isdir(os.path.join(out, "by_lang"))


def test_stats_job_counts_planted_dups(tmp_path):
    import duckdb

    dump = str(tmp_path / "dump.parquet")
    duckdb.sql(f"""
COPY (
  SELECT * FROM read_parquet('{SF_DOCS}')
  UNION ALL
  SELECT * REPLACE (doc_id + 1000000 AS doc_id)
  FROM read_parquet('{SF_DOCS}') WHERE doc_id % 5 = 0
) TO '{dump}' (FORMAT PARQUET)""")
    out = str(tmp_path / "profile")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "stats.py"),
            "--input", dump, "--output", out,
            "--master", "local[4]",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    dup = rep["exact_dup"]
    # every 5th doc re-appears once: ~100 duplicate rows over 600 docs
    assert dup["n_duplicate_rows"] >= 90
    assert dup["largest_group"] >= 2
    assert dup["dup_rate"] > 0.1
