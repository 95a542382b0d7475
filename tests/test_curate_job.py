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
            "--sweeps", "funnel,url,paragraph,shards",
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
    shards = report["sweeps"]["shards"]
    assert shards["gates"] == ["funnel"]
    assert shards["rows"] == funnel["n_keep"]
    assert 0 < shards["shards"] <= 8
    for sub in ("funnel", "paragraph", "shards", "shard_manifest"):
        assert os.path.isdir(os.path.join(out, sub)), sub
    # the seam: no sweep's pinned intermediates outlive the job
    assert report["cache_empty"] is True
