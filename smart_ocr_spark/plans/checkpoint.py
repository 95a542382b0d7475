"""Checkpointed, resumable extraction runs with per-partition lineage.

Mirrors the reference's ``MetadataManager`` checkpoint semantics
(``src/socr/core/metadata.py:30-93``: checksum-keyed skip filter,
atomic tmp-then-rename writes) re-expressed for a distributed table:

  * the corpus is split into ``n_buckets`` CONTENT-derived partitions:
    ``pmod(xxhash64(url), n_buckets)`` — stable across runs, cluster
    sizes, and input ordering (SURVEY.md §7.3.5: partition hash must be
    input-derived, not task-derived).
  * each bucket's lineage row carries an order-independent input
    fingerprint ``bit_xor(xxhash64(url, sha2(html)))`` + row count +
    extraction metrics — the ``metadata.json`` analog
    (``metadata.py:80-88``) at partition grain.
  * results are written with dynamic partition-overwrite on the bucket
    column: re-running a bucket REPLACES its output atomically — the
    parquet fallback for Iceberg ``MERGE INTO`` idempotency
    (SURVEY.md §7.2 Iceberg caveat).
  * resume = anti-join of buckets against completed lineage rows whose
    fingerprint still matches (checksum-mismatch ⇒ reprocess, exactly
    the ``metadata.py:58-67`` rule). A killed run re-does at most the
    buckets that had not committed.

At 100 TB: buckets ≫ executors (e.g. 16k buckets) keeps the
reprocess-on-kill quantum small; the state table stays tiny (one row
per bucket per run) and the anti-join is a broadcast.
"""

from __future__ import annotations

import fcntl
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from smart_ocr_spark.plans import extract_pipeline

STATE_SUBDIR = "_extraction_state"
RESULTS_SUBDIR = "results"
BUCKET_COL = "part_bucket"
LOCK_FILE = "_extraction_state.lock"


class ConcurrentRunError(RuntimeError):
    """A live run already owns this checkpoint directory."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _proc_starttime(pid: int) -> int | None:
    """Kernel start time (clock ticks since boot) of ``pid`` — the
    recycling-proof half of a (pid, starttime) identity.  None when
    /proc is unavailable (non-Linux) or the process is gone."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            data = fh.read()
        # comm (field 2) may itself contain spaces/parens; fields 3+
        # start after the LAST ')'.  starttime is field 22 overall,
        # index 19 among the post-comm fields.
        return int(data.rsplit(b")", 1)[1].split()[19])
    except (OSError, ValueError, IndexError):
        return None


def _parse_lock(data: bytes) -> tuple[int | None, int | None]:
    """(owner_pid, owner_starttime) from lock-file content.  Tolerates
    the legacy/foreign ``"<pid> <walltime>"`` form (starttime None)."""
    txt = data.decode(errors="replace").strip()
    try:
        if txt.startswith("pid="):
            fields = dict(f.split("=", 1) for f in txt.split() if "=" in f)
            start = fields.get("start", "")
            return int(fields["pid"]), (int(start) if start.isdigit() else None)
        return int(txt.split()[0]), None
    except (ValueError, KeyError, IndexError):
        return None, None


def _owner_alive(pid: int | None, start: int | None) -> bool:
    """Is the recorded lock owner still the process that took the lock?
    A recorded starttime that disagrees with /proc means the pid was
    recycled by an unrelated process (ADVICE r3) — stale."""
    if pid is None or not _pid_alive(pid):
        return False
    if start is not None:
        cur = _proc_starttime(pid)
        if cur is not None and cur != start:
            return False
    return True


# fd of each lock THIS process holds, keyed by lock path: the flock on
# it is the primary liveness signal and must live as long as the run
_LOCK_FDS: dict[str, int] = {}


def _acquire_lock(out_dir: str) -> str:
    """Single-writer advisory lock on the checkpoint directory.

    The parquet dynamic-overwrite fallback is NOT safe under two
    simultaneous writers of the SAME bucket partition (interleaved
    delete+move can leave duplicate part files) — real Iceberg
    ``MERGE INTO`` would serialize via optimistic snapshot commits
    (SURVEY.md §7.2).  Until that jar exists, this is the reference's
    single-writer ``metadata.json`` model (``metadata.py:48-56`` atomic
    tmp-then-rename) made explicit, with three raceproofing layers
    (ADVICE r3):

      * create is atomic WITH content — the pid record is written to a
        unique tmp file and ``os.link``ed into place, so no reader can
        ever observe a half-written lock;
      * the winner keeps an ``fcntl.flock`` on the lock file for the
        whole run — a held flock means LIVE regardless of pid
        recycling, and a SIGKILLed owner's flock vanishes with it;
      * stealing happens under that same flock with an inode check, so
        of two stealers racing for one dead lock exactly one unlinks it
        — the other either retries into the fresh inode and re-evaluates
        the new owner, or (if it lost the momentary probe-flock race)
        sleeps briefly and retries instead of failing; only an owner
        that holds the flock through every retry is reported live.

    Foreign/legacy lock files (no flock held) fall back to the
    (pid, /proc starttime) identity.  Holds on a local/POSIX shared FS;
    object stores need the Iceberg path.
    """
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, LOCK_FILE)
    if path in _LOCK_FDS:
        # same-process re-acquire (two threads sharing one driver):
        # flock is per-open-file-description, so the races below would
        # be undefined — refuse explicitly
        raise ConcurrentRunError(
            f"checkpoint dir {out_dir} is locked by THIS process"
        )
    mine = _proc_starttime(os.getpid())
    content = (
        f"pid={os.getpid()} start={mine if mine is not None else ''} "
        f"t={time.time()}"
    ).encode()
    for attempt in range(8):  # bounded steal retries
        tmp = os.path.join(out_dir, f".{LOCK_FILE}.{os.getpid()}.{attempt}")
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, content)
        finally:
            os.close(fd)
        try:
            os.link(tmp, path)  # atomic create-with-content
            linked = True
        except FileExistsError:
            linked = False
        finally:
            os.unlink(tmp)
        if linked:
            lfd = os.open(path, os.O_RDONLY)
            # a prober may transiently hold the flock on our fresh inode
            # for the instant of its read — a single non-blocking
            # attempt would raise and strand the lock file with our live
            # pid in it, wedging the directory; an UNBOUNDED blocking
            # wait could hang on a stalled prober.  Bounded NB retries:
            # probe flocks last microseconds, ~1s of patience is ample.
            got = False
            for _ in range(100):
                try:
                    fcntl.flock(lfd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    got = True
                    break
                except OSError:
                    time.sleep(0.01)
            if not got:
                os.close(lfd)
                raise ConcurrentRunError(
                    f"lock file in {out_dir} stayed flocked by another "
                    "process long after creation — refusing to assume "
                    "ownership"
                )
            # re-verify the path still names OUR inode: a stealer that
            # read its own stale record could have unlinked+replaced the
            # file during the window above — proceeding would make two
            # owners.  Retry instead (we'll see the replacement's live
            # flock next iteration).
            try:
                same = os.stat(path).st_ino == os.fstat(lfd).st_ino
            except FileNotFoundError:
                same = False
            if not same:
                os.close(lfd)
                time.sleep(0.01)
                continue
            _LOCK_FDS[path] = lfd
            return path
        # lock exists: probe the owner
        try:
            lfd = os.open(path, os.O_RDONLY)
        except FileNotFoundError:
            continue  # released between link and open — retry
        try:
            try:
                fcntl.flock(lfd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                # EITHER a live run (holds the flock for its duration)
                # OR another prober mid-steal (holds it for an
                # instant).  Indistinguishable at this moment — retry
                # the loop instead of failing a recoverable steal race;
                # a genuinely live owner keeps failing every attempt
                # and the loop exit raises.
                time.sleep(0.05)
                continue
            # flock acquired ⇒ no live flock-holding owner.  Foreign or
            # legacy lock file — judge liveness by its pid record, read
            # through the flocked fd (not the path, which may be newer).
            pid, start = _parse_lock(os.read(lfd, 4096))
            if pid != os.getpid() and _owner_alive(pid, start):
                raise ConcurrentRunError(
                    f"checkpoint dir {out_dir} is locked by live pid {pid}"
                )
            # stale: steal, but only if the path still names the inode
            # we hold flocked — otherwise another stealer already won
            # and the file under `path` is its LIVE lock.
            try:
                if os.stat(path).st_ino == os.fstat(lfd).st_ino:
                    os.unlink(path)
            except FileNotFoundError:
                pass
        finally:
            os.close(lfd)  # releases the probe flock (if held)
    raise ConcurrentRunError(
        f"could not acquire lock in {out_dir} (another run held the "
        "flock through every retry — most likely live)"
    )


def _release_lock(path: str) -> None:
    lfd = _LOCK_FDS.pop(path, None)
    try:
        # unlink only our own inode: if (impossibly) someone replaced
        # the file, removing THEIR live lock would reopen the race
        if lfd is None or os.stat(path).st_ino == os.fstat(lfd).st_ino:
            os.unlink(path)
    except FileNotFoundError:
        pass
    finally:
        if lfd is not None:
            os.close(lfd)  # drops the run-duration flock


def with_bucket(documents: DataFrame, n_buckets: int) -> DataFrame:
    return documents.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )


def bucket_fingerprints(documents: DataFrame, n_buckets: int) -> DataFrame:
    """One lineage row per bucket: order-independent content fingerprint
    + row count.

    The fingerprint covers EVERY pipeline input column (url, payload,
    lang, warc_ts), not just (url, html), and the skip decision compares
    (fingerprint, row_count) — XOR alone is blind to duplicated rows
    (x XOR x cancels) and to changes in columns it doesn't hash."""
    cols = ["url", "sha2(html, 256)"]
    if "lang" in documents.columns:
        cols.append("lang")
    if "warc_ts" in documents.columns:
        cols.append("cast(warc_ts as string)")
    return (
        with_bucket(documents, n_buckets)
        .groupBy(BUCKET_COL)
        .agg(
            F.expr(f"bit_xor(xxhash64({', '.join(cols)}))").alias("input_fp"),
            F.count(F.lit(1)).alias("row_count"),
        )
    )


def _state_path(out_dir: str) -> str:
    return os.path.join(out_dir, STATE_SUBDIR)


def _results_path(out_dir: str) -> str:
    return os.path.join(out_dir, RESULTS_SUBDIR)


def load_state(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = _state_path(out_dir)
    try:
        # mergeSchema: state rows are appended, so a state dir created
        # before a schema addition (e.g. out_rows in round 2) mixes
        # parquet footers.  Without merging, Spark samples ONE file's
        # schema and reads can fail or silently drop the new column
        # depending on which footer it picks.  The state table is tiny
        # (one row per bucket per run), so the footer merge is free.
        return spark.read.option("mergeSchema", "true").parquet(path)
    except Exception:
        return None


def completed_buckets(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Latest lineage row per bucket, filtered to status='complete'."""
    state = load_state(spark, out_dir)
    if state is None:
        return None
    latest = (
        state.groupBy(BUCKET_COL)
        .agg(
            F.max(
                F.struct("committed_at", "status", "input_fp", "row_count")
            ).alias("s")
        )
        .select(
            BUCKET_COL,
            F.col("s.status").alias("status"),
            F.col("s.input_fp").alias("input_fp"),
            F.col("s.row_count").alias("row_count"),
        )
    )
    return latest.where(F.col("status") == "complete").select(
        BUCKET_COL, "input_fp", "row_count"
    )


def run_with_checkpoint(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    n_buckets: int = 32,
    max_buckets_this_run: int | None = None,
    dry_run: bool = False,
    embed_figures: bool = False,
) -> dict:
    """Extract every not-yet-committed bucket; commit results + lineage
    per run. Returns run metrics.

    ``max_buckets_this_run`` caps how many buckets this invocation
    processes (used by the kill-and-resume test to simulate a partial
    run; operationally it bounds a run's blast radius).

    ``dry_run`` reports what WOULD be processed — pending buckets and
    their input row counts — without extracting or writing anything
    (reference orchestrator.py:171-178, F4).

    Concurrency: non-dry runs take the single-writer lock (see
    :func:`_acquire_lock`); a second simultaneous run raises
    :class:`ConcurrentRunError` immediately instead of corrupting the
    results partitions, and a lock left by a SIGKILLed run is stolen.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    lock = None if dry_run else _acquire_lock(out_dir)
    try:
        return _run_locked(
            spark, documents, out_dir, n_buckets, max_buckets_this_run,
            dry_run, embed_figures,
        )
    finally:
        if lock is not None:
            _release_lock(lock)


def _run_locked(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    n_buckets: int,
    max_buckets_this_run: int | None,
    dry_run: bool,
    embed_figures: bool = False,
) -> dict:
    fps = bucket_fingerprints(documents, n_buckets)
    done = completed_buckets(spark, out_dir)
    if done is not None:
        # reprocess when missing OR fingerprint/row-count drifted
        # (checksum rule, metadata.py:58-67 analog)
        pending = fps.join(
            done.withColumnRenamed("input_fp", "done_fp").withColumnRenamed(
                "row_count", "done_rows"
            ),
            BUCKET_COL,
            "left",
        ).where(
            F.col("done_fp").isNull()
            | (F.col("done_fp") != F.col("input_fp"))
            | (F.col("done_rows") != F.col("row_count"))
        )
    else:
        pending = fps
    pending_rows = pending.select(BUCKET_COL, "input_fp", "row_count").collect()
    pending_rows.sort(key=lambda r: r[BUCKET_COL])
    if max_buckets_this_run is not None:
        pending_rows = pending_rows[:max_buckets_this_run]
    if not pending_rows:
        return {"processed_buckets": 0, "processed_rows": 0, "skipped": True}
    if dry_run:
        return {
            "processed_buckets": 0,
            "processed_rows": 0,
            "skipped": False,
            "dry_run": True,
            "would_process_buckets": [int(r[BUCKET_COL]) for r in pending_rows],
            "would_process_rows": int(sum(r["row_count"] for r in pending_rows)),
        }

    todo_ids = [r[BUCKET_COL] for r in pending_rows]
    fp_by_bucket = {r[BUCKET_COL]: r["input_fp"] for r in pending_rows}
    in_rows_by_bucket = {r[BUCKET_COL]: r["row_count"] for r in pending_rows}
    subset = with_bucket(documents, n_buckets).where(F.col(BUCKET_COL).isin(todo_ids))

    results = extract_pipeline.run_extraction(
        spark, subset.drop(BUCKET_COL), repartition=True,
        embed_figures=embed_figures,
    )
    out = extract_pipeline.results_for_write(results)
    # persist: the write AND the metrics rollup both consume this frame;
    # without it the consensus-selection Arrow pass runs twice.
    out = with_bucket(out, n_buckets).persist()

    # Dynamic overwrite replaces exactly the buckets written here —
    # a re-run of a crashed bucket is idempotent (MERGE-equivalent).
    (
        out.repartition(BUCKET_COL)
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(_results_path(out_dir))
    )

    # Lineage commit AFTER the data commit: a kill between the two makes
    # the bucket re-run (idempotent), never silently skipped.
    metrics = (
        out.groupBy(BUCKET_COL)
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum(F.when(F.col("status").startswith("success"), 1).otherwise(0)).alias(
                "n_success"
            ),
        )
        .collect()
    )
    now = float(time.time())
    # The lineage row_count is the INPUT-side count (the same quantity
    # bucket_fingerprints computes on resume) — comparing the resume
    # check against the OUTPUT count would mark every bucket dirty the
    # moment any stage fans out or drops rows.  Buckets whose output is
    # empty still commit a lineage row (metrics keyed off the output
    # frame would skip them and they'd reprocess forever).
    out_by_bucket = {m[BUCKET_COL]: m for m in metrics}
    state_rows = [
        {
            BUCKET_COL: bid,
            "input_fp": fp_by_bucket[bid],
            "row_count": in_rows_by_bucket[bid],
            "out_rows": (
                out_by_bucket[bid]["row_count"] if bid in out_by_bucket else 0
            ),
            "n_success": (
                out_by_bucket[bid]["n_success"] if bid in out_by_bucket else 0
            ),
            "status": "complete",
            "committed_at": now,
        }
        for bid in todo_ids
    ]
    state_schema = (
        f"{BUCKET_COL} int, input_fp bigint, row_count bigint, "
        "out_rows bigint, n_success bigint, status string, committed_at double"
    )
    spark.createDataFrame(state_rows, schema=state_schema).write.mode(
        "append"
    ).parquet(_state_path(out_dir))
    out.unpersist()
    return {
        "processed_buckets": len(state_rows),
        "processed_rows": int(sum(m["row_count"] for m in metrics)),
        "skipped": False,
    }


def read_results(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(_results_path(out_dir))
