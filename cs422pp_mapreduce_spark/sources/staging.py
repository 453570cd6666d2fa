"""Session-scoped staging directories for write→read contract queries.

Queries that materialize intermediate files (bucketed tables, CSV/JSON/
ORC round-trips, staged streaming inputs) previously called
``tempfile.mkdtemp`` per invocation, so repeated gate/bench/pytest runs
in one session leaked a directory (and, for bucketed tables, catalog
entries) per call. One directory per (Spark application, tag) fixes
that: the first call creates it, every later call reuses it and
overwrites the contents — the write still happens per call (for
bucketed_join the write IS the operator under test), only the
allocation is amortized.
"""

from __future__ import annotations

import os
import tempfile
import threading

from pyspark.sql import SparkSession

_STAGING: dict[tuple[str, str], str] = {}
_TAG_LOCKS: dict[tuple[str, str], threading.Lock] = {}
_LOCK = threading.Lock()


def session_staging_dir(spark: SparkSession, tag: str) -> str:
    """Return the one staging dir for (this Spark application, tag).

    Created on first use; reused (NOT cleaned) on later calls — callers
    write with mode='overwrite' so contents never accumulate. The dict
    insert is lock-guarded (queries may run from concurrent threads)."""
    key = (spark.sparkContext.applicationId, tag)
    with _LOCK:
        path = _STAGING.get(key)
        if path is None or not os.path.isdir(path):
            path = tempfile.mkdtemp(prefix=f"{tag}_")
            _STAGING[key] = path
        return path


def tag_lock(spark: SparkSession, tag: str) -> threading.Lock:
    """One lock per (Spark application, tag), for callers that must
    serialize a build-once/reuse-later section over a shared staging
    dir (e.g. the memoized event-slice build: two concurrent threads
    must not race interleaved overwrite writes into the same parts)."""
    key = (spark.sparkContext.applicationId, tag)
    with _LOCK:
        lk = _TAG_LOCKS.get(key)
        if lk is None:
            lk = _TAG_LOCKS[key] = threading.Lock()
        return lk


def sf_tag(sf_dir: str) -> str:
    """Filesystem/metastore-safe token for an sf_dir (staging dirs and
    table names must be distinct per fixture tier within a session)."""
    return os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
