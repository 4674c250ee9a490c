"""Per-commit operation metrics (Delta's operationMetrics shape):
every commit records files added/removed, rows written, and the live-
row delta — pure entry-list arithmetic at commit time, surfaced
through DESCRIBE HISTORY's operation json. The live-row delta is what
makes DV-growth (merge-on-read DELETE) commits legible, where file
counts don't move at all.
"""

from __future__ import annotations

import json

from etl_job_spark.table import ManifestTable


def _metrics(t):
    return {
        v: t._read_raw_manifest(v)["operation"].get("metrics")
        for v in t.versions()
    }


def test_commit_metrics_across_verbs(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(k, k) for k in range(10)], "k int, v int").coalesce(2)
    )
    t.append(spark.createDataFrame([(100, 1)], "k int, v int"))
    t.delete_where(spark, "k = 3")                       # CoW rewrite
    t.delete_where(spark, "k = 4", mode="merge_on_read")  # DV growth
    m = _metrics(t)
    assert m[1] == {
        "files_added": 2, "files_removed": 0,
        "rows_added": 10, "live_rows_delta": 10,
    }
    assert m[2]["files_added"] == 1 and m[2]["live_rows_delta"] == 1
    # CoW delete: one file rewritten (its survivors re-land), net -1
    assert m[3]["files_added"] == 1 and m[3]["files_removed"] == 1
    assert m[3]["live_rows_delta"] == -1
    # MoR delete: zero file movement, the delta carries the story
    assert m[4] == {
        "files_added": 0, "files_removed": 0,
        "rows_added": 0, "live_rows_delta": -1,
    }
    # surfaced through DESCRIBE HISTORY's operation json
    row = next(
        r for r in t.history_df(spark).collect() if r.version == 4
    )
    assert json.loads(row.operation_json)["metrics"]["live_rows_delta"] == -1


def test_metadata_only_commits_report_zero_motion(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, 10)], "k int, v int"))
    t.alter_schema(spark, add={"tag": "string"})
    t.alter_schema(spark, widen={"k": "bigint"})
    clone = t.clone_to(str(tmp_path / "dev"))
    for v in (2, 3):
        assert _metrics(t)[v] == {
            "files_added": 0, "files_removed": 0,
            "rows_added": 0, "live_rows_delta": 0,
        }
    # the clone's first commit references the source's files: they
    # count as "added" to the NEW table, with zero bytes copied
    cm = _metrics(clone)[1]
    assert cm["files_added"] == 1 and cm["rows_added"] == 1
