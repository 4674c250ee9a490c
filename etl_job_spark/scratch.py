"""Session-scoped scratch tables: path construction + reclaim.

Several registry queries land a ManifestTable / IVF index under the
system temp dir keyed by the Spark applicationId (the table-format
round-trip queries demonstrate write+read paths; re-landing per
invocation would just re-bench the write). The dirs are appId-unique,
so nothing ever reuses them once the session ends — but without a
lifecycle hook a driver correctness run (or any third-party caller)
leaves them behind, an unbounded-accumulation pattern (r6 verdict #3).

``scratch_dir`` is the one funnel: it builds the path AND registers an
atexit reclaim for the session's scratch dirs the first time that
session asks for one. ``bench.py`` additionally reclaims explicitly
before ``spark.stop()`` (belt and braces — atexit also covers callers
that crash past the bench's own cleanup).
"""

from __future__ import annotations

import atexit
import glob
import os
import shutil
import tempfile

# exactly the known scratch prefixes — a bare *_{app_id}* wildcard
# would rmtree any unrelated temp path that happens to contain the
# application id (advisor r4)
_PATTERNS = (
    "kicc_mart_versioned_{app}",
    "kicc_mart_gdpr_{app}",
    "kicc_mart_window_read_{app}_*",
    "events_mart_daily_{app}_*",
    "ivf_index_{app}_*",
)

_registered: set[str] = set()


def reclaim_scratch(app_id: str) -> int:
    """Remove every scratch dir this session created; returns the
    count. Idempotent — safe to call from bench AND the atexit hook."""
    n = 0
    for pat in _PATTERNS:
        hits = glob.glob(os.path.join(tempfile.gettempdir(), pat.format(app=app_id)))
        for d in hits:
            shutil.rmtree(d, ignore_errors=True)
            n += 1
    return n


def scratch_dir(spark, prefix: str, suffix: str = "") -> str:
    """``{tmp}/{prefix}_{applicationId}{suffix}`` — and, once per
    session, register the atexit reclaim so no caller leaks the dirs."""
    app_id = spark.sparkContext.applicationId
    if app_id not in _registered:
        _registered.add(app_id)
        atexit.register(reclaim_scratch, app_id)
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{app_id}{suffix}")
