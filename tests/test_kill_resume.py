"""Hard kill-and-resume: SIGKILL an actual extraction job process
mid-run, then rerun to completion. Stronger than the in-process
partial-run tests — exercises crash recovery across process boundaries
exactly as a cluster preemption would (SURVEY.md §7.1 step 6)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = 400


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    from smart_ocr_spark.sources.corpus import corpus_df

    path = str(tmp_path_factory.mktemp("killcorpus") / "docs")
    corpus_df(spark, N_DOCS, seed=13).write.mode("overwrite").parquet(path)
    return path


def _run_job(corpus_path: str, out: str, extra: list[str], timeout: int | None):
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "extract.py"),
            "--input", corpus_path,
            "--output", out,
            "--buckets", "8",
            "--master", "local[4]",
            *extra,
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )
    if timeout is None:
        return proc
    proc.wait(timeout=timeout)
    return proc


def test_sigkill_mid_run_then_resume(spark, corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("killout"))

    # first invocation commits a couple of buckets, proving there is
    # prior progress to preserve
    p0 = _run_job(corpus_path, out, ["--max-buckets", "2"], timeout=300)
    assert p0.returncode == 0

    # second invocation gets SIGKILLed while working
    p1 = _run_job(corpus_path, out, [], timeout=None)
    deadline = time.time() + 120
    # let it get past session startup into real work, then kill hard
    time.sleep(25)
    assert p1.poll() is None or time.time() < deadline
    if p1.poll() is None:
        os.kill(p1.pid, signal.SIGKILL)
        p1.wait(timeout=30)

    # resume run must complete the corpus without reprocessing the
    # originally committed buckets' data incorrectly
    p2 = _run_job(corpus_path, out, [], timeout=420)
    assert p2.returncode == 0

    from smart_ocr_spark.plans import checkpoint as cp

    res = cp.read_results(spark, out)
    docs = spark.read.parquet(corpus_path)
    assert res.count() == N_DOCS
    assert res.select("url").distinct().count() == N_DOCS  # no dup rows
    joined = res.join(docs.select("url", F.col("text").alias("expected")), "url")
    assert joined.filter(F.col("final_text") != F.col("expected")).count() == 0

    # idempotent no-op afterwards
    p3 = _run_job(corpus_path, out, [], timeout=300)
    assert p3.returncode == 0
    assert b'"skipped": true' in p3.stdout.read()
