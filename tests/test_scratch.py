"""Scratch-table lifecycle (r6 verdict #3): every session-scoped
scratch dir a registry query lands is reclaimed at session end —
``scratch_dir`` registers the atexit hook on first use, and
``reclaim_scratch`` (what the hook runs, and what bench.py calls
explicitly) removes exactly this session's dirs."""

from __future__ import annotations

import atexit
import glob
import os
import tempfile

from etl_job_spark import scratch


def test_scratch_dir_registers_reclaim_and_reclaims(spark):
    app_id = spark.sparkContext.applicationId
    scratch._HANDED_OUT.pop(app_id, None)  # fresh-session simulation
    p = scratch.scratch_dir(spark, "kicc_mart_window_read", "_deadbeef")
    assert app_id in scratch._HANDED_OUT
    os.makedirs(p, exist_ok=True)
    with open(os.path.join(p, "x.json"), "w") as f:
        f.write("{}")
    q = scratch.scratch_dir(spark, "events_mart_daily", "_deadbeef")
    os.makedirs(q, exist_ok=True)
    # ANY prefix is reclaimed — paths are recorded at hand-out, not
    # matched against a list that can drift (r7 review finding)
    r = scratch.scratch_dir(spark, "some_brand_new_query", "_x")
    os.makedirs(r, exist_ok=True)
    n = scratch.reclaim_scratch(app_id)
    assert n >= 3
    assert not os.path.exists(p) and not os.path.exists(q) and not os.path.exists(r)
    # idempotent
    assert scratch.reclaim_scratch(app_id) == 0


def test_window_read_queries_leave_no_orphans(spark, sf_dir):
    """A fresh session invoking the two window-read queries leaves no
    orphan dirs once the session-end reclaim fires."""
    from etl_job_spark.plans import llm_ops, queries

    app_id = spark.sparkContext.applicationId
    queries.mart_window_read(spark, sf_dir).count()
    llm_ops.events_mart_daily_read(spark, sf_dir).count()
    pats = [
        os.path.join(tempfile.gettempdir(), f"kicc_mart_window_read_{app_id}_*"),
        os.path.join(tempfile.gettempdir(), f"events_mart_daily_{app_id}_*"),
    ]
    assert all(glob.glob(p) for p in pats)  # the scratch dirs exist mid-session
    scratch.reclaim_scratch(app_id)  # what the atexit hook runs
    assert not any(glob.glob(p) for p in pats)
    # the hook itself is registered (unregister returns it was there)
    atexit.unregister(scratch.reclaim_scratch)
