"""as-of join differential tests vs pandas merge_asof — an independent
reference implementation alongside the DuckDB ASOF oracle (the query
registry covers the no-tolerance case; these cover tolerance and the
operator API directly on real events data)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_job_spark.operators.asof import asof_join
from etl_job_spark.sources import load_table


def _frames(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    return purchases, views


def _expected(purchases, views, tolerance=None, direction="backward"):
    lp = purchases.toPandas().sort_values("ts").reset_index(drop=True)
    rp = views.toPandas().sort_values("ts").reset_index(drop=True)
    kwargs = {"tolerance": pd.Timedelta(tolerance)} if tolerance else {}
    m = pd.merge_asof(lp, rp, on="ts", by="user_id", direction=direction, **kwargs)
    return sorted(
        (int(r.purchase_id), -1 if pd.isna(r.view_id) else int(r.view_id))
        for r in m.itertuples()
    )


def _got(df):
    return sorted(
        (int(r.purchase_id), -1 if r.view_id_v is None else int(r.view_id_v))
        for r in df.collect()
    )


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's core property: documents sharing a substring of
    length >= k + window - 1 share at least one fingerprint; unrelated
    text shares none (here — no hash collisions at this size)."""
    from etl_job_spark.operators.text import winnowing_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "xxxx COMMONSUBSTRING yyyy"),
            (2, "aaa COMMONSUBSTRING bbb"),
            (3, "totally unrelated words"),
        ],
        "doc_id long, text string",
    )
    fp = winnowing_fingerprints(docs)
    sets = {
        i: {r.minh for r in fp.filter(F.col("doc_id") == i).collect()} for i in (1, 2, 3)
    }
    assert sets[1] & sets[2]
    assert not (sets[1] & sets[3])


def test_asof_matches_pandas_merge_asof(spark, sf_dir):
    purchases, views = _frames(spark, sf_dir)
    out = asof_join(purchases, views, ["user_id"], "ts", "ts", ["view_id"], suffix="_v")
    assert _got(out) == _expected(purchases, views)


def test_asof_forward_matches_pandas(spark, sf_dir):
    purchases, views = _frames(spark, sf_dir)
    out = asof_join(
        purchases, views, ["user_id"], "ts", "ts", ["view_id"], suffix="_v",
        direction="forward",
    )
    assert _got(out) == _expected(purchases, views, direction="forward")


def test_asof_tolerance_matches_pandas(spark, sf_dir):
    purchases, views = _frames(spark, sf_dir)
    out = asof_join(
        purchases, views, ["user_id"], "ts", "ts", ["view_id"], suffix="_v",
        tolerance="2 hours",
    )
    want = _expected(purchases, views, tolerance="2 hours")
    got = _got(out)
    assert got == want
    # tolerance must actually null some matches on this data
    assert sum(1 for _, v in got if v == -1) > sum(
        1 for _, v in _expected(purchases, views) if v == -1
    )
