"""Scoped executor-cache registry (VERDICT r4 #4).

The bucketed-join operators (MinHash/SimHash/LSH/SemDeDup) persist
intermediate frames because both sides of their self-joins — plus the
fan-in-cap probe — consume the same expensive branch (UDF hashing, the
norm pass, the k-means assignment); unpersisted, that branch would
recompute 2+ times.  But Spark has no unpersist-after-materialization
hook for a *returned lazy* DataFrame, so those persists used to live
for the session, and a long-running multi-sweep curation job would
accrete executor cache sweep after sweep.

This module is the explicit seam:

* :func:`pin` — ``persist()`` that also registers the frame with the
  innermost active :func:`cache_scope`.  With no scope active it is
  exactly the old behavior (session-lifetime persist, reclaimable via
  ``spark.catalog.clearCache()``), so one-shot oracle/bench jobs are
  unchanged.
* :func:`cache_scope` — a context manager for sweep-shaped jobs: run
  the sweep and MATERIALIZE its outputs (write/collect) inside the
  scope; every frame pinned underneath is unpersisted (LIFO) on exit,
  leaving the executor cache as it was found.

Scopes nest (a funnel inside a larger job releases only its own pins)
and the registry is a thread-local-free explicit stack guarded by a
lock, so concurrent driver threads sharing one SparkSession can each
hold a scope without releasing each other's frames — entries record
which scope pinned them.
"""

from __future__ import annotations

import contextlib
import logging
import threading
from typing import Iterator, List

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)

_LOCK = threading.Lock()
# stack of active scopes; each scope is the list of frames it owns.
# Thread-keyed so two driver threads' scopes never capture each other's
# pins (per-thread stacks, one flat dict).
_SCOPES: dict[int, List[List[DataFrame]]] = {}


def _my_stack() -> List[List[DataFrame]]:
    return _SCOPES.setdefault(threading.get_ident(), [])


def pin(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and register it with the innermost active
    :func:`cache_scope` of this thread (no-op registration when no
    scope is active — the documented session-lifetime fallback)."""
    if storage_level is not None:
        df.persist(storage_level)
    else:
        df.persist()
    with _LOCK:
        stack = _my_stack()
        if stack:
            stack[-1].append(df)
    return df


@contextlib.contextmanager
def cache_scope(blocking: bool = False) -> Iterator[None]:
    """Release every frame :func:`pin`-ed inside the block on exit.

    Consumers MUST materialize results (write, collect, count) inside
    the block: after exit the pinned intermediates are gone and any
    still-lazy frame derived from them would silently recompute the
    expensive branches the pins existed to share.
    """
    mine: List[DataFrame] = []
    with _LOCK:
        _my_stack().append(mine)
    try:
        yield
    finally:
        with _LOCK:
            stack = _my_stack()
            if mine in stack:
                stack.remove(mine)
            if not stack:
                _SCOPES.pop(threading.get_ident(), None)
        for df in reversed(mine):
            try:
                df.unpersist(blocking)
            except Exception:  # session already stopped — nothing to free
                _log.debug("cache_scope: unpersist failed", exc_info=True)
        if mine:
            _log.info("cache_scope: released %d pinned frame(s)", len(mine))
