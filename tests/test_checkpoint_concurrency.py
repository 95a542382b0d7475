"""Concurrent-writer safety for the checkpointed extraction run.

The parquet dynamic-overwrite fallback cannot tolerate two simultaneous
writers of the same bucket partition (VERDICT r2 gap #1), so
``run_with_checkpoint`` takes a single-writer advisory lock: a second
live run fails fast with ``ConcurrentRunError``; a lock left by a
SIGKILLed run is stolen.  Reference analog: single-writer
``metadata.json`` with atomic tmp-then-rename (``core/metadata.py:48-56``).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

from smart_ocr_spark.plans import checkpoint as cp
from smart_ocr_spark.sources.corpus import corpus_df

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = 48
N_BUCKETS = 4


@pytest.fixture(scope="module")
def docs(spark):
    return corpus_df(spark, N_DOCS, seed=21).cache()


def _write_lock(out: str, pid: int) -> str:
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, cp.LOCK_FILE)
    with open(path, "w") as fh:
        fh.write(f"{pid} {time.time()}")
    return path


def test_live_lock_rejects_second_writer(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lock1"))
    _write_lock(out, 1)  # pid 1 is always alive (and not ours)
    with pytest.raises(cp.ConcurrentRunError):
        cp.run_with_checkpoint(spark, docs, out, N_BUCKETS)
    # nothing was written under the live lock
    assert not os.path.exists(os.path.join(out, cp.RESULTS_SUBDIR))


def test_stale_lock_is_stolen(spark, docs, tmp_path_factory):
    """A SIGKILLed run leaves its lock behind; the resume must steal it
    (dead owner pid) and complete normally."""
    out = str(tmp_path_factory.mktemp("lock2"))
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    _write_lock(out, child.pid)  # dead pid -> stale lock
    r = cp.run_with_checkpoint(spark, docs, out, N_BUCKETS)
    assert r["processed_buckets"] == N_BUCKETS
    assert cp.read_results(spark, out).count() == N_DOCS
    # lock released after the run
    assert not os.path.exists(os.path.join(out, cp.LOCK_FILE))


def test_recycled_pid_lock_is_stolen(spark, docs, tmp_path_factory):
    """ADVICE r3: a lock whose pid was recycled by an unrelated live
    process must still be stolen — the recorded /proc starttime
    disagrees with the current holder of that pid."""
    out = str(tmp_path_factory.mktemp("lock4"))
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, cp.LOCK_FILE)
    # pid 1 is alive, but its true starttime is ~boot — nothing like this
    with open(path, "w") as fh:
        fh.write(f"pid=1 start=999999999999 t={time.time()}")
    r = cp.run_with_checkpoint(spark, docs, out, N_BUCKETS)
    assert r["processed_buckets"] == N_BUCKETS


def test_flock_held_lock_rejects_regardless_of_pid(spark, docs, tmp_path_factory):
    """The run-duration flock is the primary liveness signal: even a
    lock file whose pid record is DEAD must be honored while someone
    holds the flock (no steal of a partially-visible live lock)."""
    import fcntl

    import subprocess as sp

    out = str(tmp_path_factory.mktemp("lock5"))
    child = sp.Popen([sys.executable, "-c", "pass"])
    child.wait()
    path = _write_lock(out, child.pid)  # dead pid record
    fd = os.open(path, os.O_RDONLY)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        with pytest.raises(cp.ConcurrentRunError):
            cp.run_with_checkpoint(spark, docs, out, N_BUCKETS)
    finally:
        os.close(fd)


def test_dry_run_ignores_lock(spark, docs, tmp_path_factory):
    """Dry runs only read; they must work under someone else's lock."""
    out = str(tmp_path_factory.mktemp("lock3"))
    _write_lock(out, 1)
    r = cp.run_with_checkpoint(spark, docs, out, N_BUCKETS, dry_run=True)
    assert r["dry_run"] and r["would_process_rows"] == N_DOCS


def test_two_process_race(tmp_path_factory, spark, docs):
    """Start one real job; once it holds the lock, a second simultaneous
    job must fail fast.  After the winner finishes, the loser's re-run
    completes the no-op resume with no duplicated rows."""
    corpus = str(tmp_path_factory.mktemp("racecorpus") / "docs")
    docs.write.mode("overwrite").parquet(corpus)
    out = str(tmp_path_factory.mktemp("raceout"))

    def launch():
        return subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "jobs", "extract.py"),
                "--input", corpus,
                "--output", out,
                "--buckets", str(N_BUCKETS),
                "--master", "local[2]",
            ],
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )

    p1 = launch()
    lock_path = os.path.join(out, cp.LOCK_FILE)
    deadline = time.time() + 180
    while not os.path.exists(lock_path) and time.time() < deadline:
        assert p1.poll() is None, "winner died before acquiring the lock"
        time.sleep(0.5)
    assert os.path.exists(lock_path), "winner never acquired the lock"

    p2 = launch()
    p2.wait(timeout=180)
    _, err2 = p2.communicate()
    assert p2.returncode != 0
    assert b"ConcurrentRunError" in err2

    assert p1.wait(timeout=420) == 0
    p3 = launch()
    p3.wait(timeout=180)
    assert p3.returncode == 0

    res = cp.read_results(spark, out)
    assert res.count() == N_DOCS
    assert res.select("url").distinct().count() == N_DOCS  # no dup rows


def test_state_schema_evolution_mixed_footers(spark, tmp_path_factory):
    """ADVICE r2: state rows are appended, so a pre-round-2 dir mixes
    footers without ``out_rows``/``n_success``.  ``load_state`` must
    merge schemas instead of sampling one footer."""
    out = str(tmp_path_factory.mktemp("mixed"))
    state = cp._state_path(out)
    old_schema = (
        f"{cp.BUCKET_COL} int, input_fp bigint, row_count bigint, "
        "status string, committed_at double"
    )
    new_schema = (
        f"{cp.BUCKET_COL} int, input_fp bigint, row_count bigint, "
        "out_rows bigint, n_success bigint, status string, committed_at double"
    )
    spark.createDataFrame(
        [{cp.BUCKET_COL: 0, "input_fp": 11, "row_count": 5,
          "status": "complete", "committed_at": 1.0}],
        schema=old_schema,
    ).write.mode("append").parquet(state)
    spark.createDataFrame(
        [{cp.BUCKET_COL: 1, "input_fp": 22, "row_count": 7, "out_rows": 7,
          "n_success": 7, "status": "complete", "committed_at": 2.0}],
        schema=new_schema,
    ).write.mode("append").parquet(state)

    st = cp.load_state(spark, out)
    assert "out_rows" in st.columns and st.count() == 2
    done = cp.completed_buckets(spark, out)
    assert {r[cp.BUCKET_COL] for r in done.collect()} == {0, 1}


def test_same_process_reacquire_refused(tmp_path_factory):
    """Review fix: two threads of one driver must not both own the lock
    (flock is per-open-file-description, so in-process exclusion has to
    be explicit)."""
    out = str(tmp_path_factory.mktemp("lock6"))
    path = cp._acquire_lock(out)
    try:
        with pytest.raises(cp.ConcurrentRunError, match="THIS process"):
            cp._acquire_lock(out)
    finally:
        cp._release_lock(path)
    # released: a fresh acquire works again
    path2 = cp._acquire_lock(out)
    cp._release_lock(path2)
