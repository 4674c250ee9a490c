"""Session-scoped scratch tables: path construction + reclaim.

Several registry queries land a ManifestTable / IVF index under the
system temp dir keyed by the Spark applicationId (the table-format
round-trip queries demonstrate write+read paths; re-landing per
invocation would just re-bench the write). The dirs are appId-unique,
so nothing ever reuses them once the session ends — but without a
lifecycle hook a driver correctness run (or any third-party caller)
leaves them behind, an unbounded-accumulation pattern (r6 verdict #3).

``scratch_dir`` is the one funnel: it builds the path, RECORDS it, and
registers an atexit reclaim the first time a session asks for one —
reclaim deletes exactly what was handed out, so a new scratch-using
query can never drift out of a hard-coded pattern list (the r7 review
caught exactly that: a fixed list missed its very next caller).
``bench.py`` additionally reclaims explicitly before ``spark.stop()``
(belt and braces — atexit also covers callers that crash past the
bench's own cleanup).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading

# app_id -> the exact scratch paths handed out this session; guarded
# by _LOCK — an unsynchronized first-use race could replace a set
# another thread just recorded into, and a lost entry is a permanent
# leak now that reclaim deletes exactly what was recorded
_HANDED_OUT: dict[str, set[str]] = {}
_LOCK = threading.Lock()


def reclaim_scratch(app_id: str) -> int:
    """Remove every scratch dir this session handed out; returns the
    count removed. Idempotent — safe to call from bench AND the
    atexit hook. Only paths ``scratch_dir`` itself constructed are
    touched (never a wildcard over the temp dir — an unrelated path
    containing the application id must not be rmtree'd; advisor r4)."""
    with _LOCK:
        paths = sorted(_HANDED_OUT.get(app_id, ()))
    n = 0
    for d in paths:
        if os.path.exists(d):
            shutil.rmtree(d, ignore_errors=True)
            n += 1
    return n


def scratch_dir(spark, prefix: str, suffix: str = "") -> str:
    """``{tmp}/{prefix}_{applicationId}{suffix}`` — recorded, and (once
    per session) wired to the atexit reclaim so no caller leaks it."""
    app_id = spark.sparkContext.applicationId
    path = os.path.join(tempfile.gettempdir(), f"{prefix}_{app_id}{suffix}")
    with _LOCK:
        first = app_id not in _HANDED_OUT
        if first:
            _HANDED_OUT[app_id] = set()
        _HANDED_OUT[app_id].add(path)
    if first:
        atexit.register(reclaim_scratch, app_id)
    return path
