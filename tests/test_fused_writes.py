"""Single-pass guarded library writes (VERDICT r10 next-round #4) and
the Spark/DuckDB constraint dialect boundary (r10 ADVICE, medium).

Guarded writes (CHECK constraints and/or bloom columns) through
ManifestTable.append/overwrite/merge/update_where now take the DSv2
writer's fused shape — one mapInArrow job whose tasks validate each
Arrow batch, write, and build blooms on the just-closed file — instead
of a Spark validation agg + native write + post-write bloom re-read.
Predicates outside the vetted cross-dialect subset fall back to
Spark-side validation (never silently evaluated differently by
DuckDB); the DSv2 writer refuses them at plan time."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_job_spark.table import (
    ConstraintViolationError,
    ManifestTable,
    duckdb_dialect_safe,
)


def _sidecar_blooms(t):
    """path -> bloom dict for every entry of the latest version."""
    man = t._read_manifest(t.latest_version())
    out = {}
    for e in man["files"]:
        if e.get("bloom_ref"):
            with open(os.path.join(t.path, e["bloom_ref"])) as f:
                out[e["path"]] = json.load(f)[e["path"]]
    return out


def test_dialect_safe_classifier():
    ok = [
        "k >= 0",
        "v > 0 AND v < 100",
        "s IS NOT NULL",
        "coalesce(v, 0) + 1 >= abs(w) * 2",
        "length(trim(s)) <= 10",
        "s LIKE 'a%' OR s IN ('x', 'y')",
        "CASE WHEN k > 0 THEN v ELSE 0 END >= 0",
        "k BETWEEN 1 AND 5",
    ]
    bad = [
        "CAST(s AS INT) > 0",          # ANSI cast/overflow divergence
        "s::INT > 0",
        "regexp_like(s, '^a+$')",      # regexp flavor
        "to_date(s) > '2020-01-01'",   # date-function dialect
        's = "literal"',               # string in Spark, IDENTIFIER in DuckDB
        "s || 'x' = 'ax'",
        "unix_timestamp(ts) > 0",      # timezone handling
    ]
    cols = ["k", "v", "w", "s", "ts"]
    for p in ok:
        assert duckdb_dialect_safe(p, columns=cols), p
    for p in bad:
        assert not duckdb_dialect_safe(p, columns=cols), p
    # with the schema known, a dialect-divergent OPERATOR keyword
    # masquerading as an identifier is caught too
    assert not duckdb_dialect_safe("s rlike '^a$'", columns=cols)
    assert not duckdb_dialect_safe("k div 2 = 0", columns=cols)


def test_guarded_append_takes_fused_route_same_sidecars(spark, tmp_path):
    """Fused route fires for constrained+bloomed appends, and its
    bloom sidecar content is IDENTICAL to the native route's for the
    same rows (the sidecar-content pin)."""
    rows = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).coalesce(1)
    extra = spark.range(2000, 2500).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).coalesce(1)
    t_f = ManifestTable(str(tmp_path / "fused"))
    t_n = ManifestTable(str(tmp_path / "native"))
    for t in (t_f, t_n):
        t.overwrite(rows, bloom_cols=["k"])
        t.alter_constraints(spark, add={"k_nonneg": "k >= 0"})
    t_f.append(extra)
    assert t_f.last_write_route == "fused"
    # force the native route on the twin
    t_n._fused_write_route = lambda *a, **kw: None
    t_n.append(extra)
    assert t_n.last_write_route == "native"
    assert t_f.snapshot(spark).count() == t_n.snapshot(spark).count() == 2500
    b_f, b_n = _sidecar_blooms(t_f), _sidecar_blooms(t_n)
    assert sorted(b_f.values(), key=str) == sorted(b_n.values(), key=str)
    # every new entry carries a bloom_ref on both routes
    assert len(b_f) == len(b_n)
    # per-file CORRESPONDENCE (a swapped sidecar would pass the
    # multiset compare): each file's bloom must contain that file's
    # own recorded key min/max and exclude a value no file holds
    from etl_job_spark.table import _bloom_excludes

    for t in (t_f, t_n):
        man = t._read_manifest(t.latest_version())
        for e in man["files"]:
            with open(os.path.join(t.path, e["bloom_ref"])) as f:
                bloom = json.load(f)[e["path"]]["k"]
            own = [e["stats"]["k"]["min"], e["stats"]["k"]["max"]]
            assert not _bloom_excludes(bloom, own), e["path"]
            assert _bloom_excludes(bloom, [10**15 + 7]), e["path"]


def test_fused_violation_atomicity(spark, tmp_path):
    """A violating fused write raises the library's
    ConstraintViolationError, publishes nothing, and leaves no staged
    files or sidecar dirs behind."""
    t = ManifestTable(str(tmp_path / "atom"))
    t.overwrite(
        spark.range(0, 50).select(F.col("id").alias("k")), bloom_cols=["k"]
    )
    t.alter_constraints(spark, add={"k_nonneg": "k >= 0"})
    v = t.latest_version()
    files_before = {e["path"] for e in t._read_manifest(v)["files"]}
    with pytest.raises(ConstraintViolationError, match="k_nonneg"):
        t.append(spark.range(0, 5).select((F.col("id") - 99).alias("k")))
    assert t.latest_version() == v
    on_disk = set()
    for root, _dirs, names in os.walk(t.data_dir):
        for n in names:
            if n.endswith(".parquet"):
                on_disk.add(os.path.relpath(os.path.join(root, n), t.data_dir))
    assert on_disk == files_before  # staged files removed
    # no orphan sidecar dirs from the aborted attempt
    live_refs = {
        os.path.dirname(e["bloom_ref"])
        for e in t._read_manifest(v)["files"]
        if e.get("bloom_ref")
    }
    bloom_root = os.path.join(t.path, "_bloom")
    if os.path.isdir(bloom_root):
        for d in os.listdir(bloom_root):
            assert os.path.join("_bloom", d) in live_refs, d


def test_unvetted_predicate_validates_spark_side(spark, tmp_path):
    """A constraint outside the vetted subset (regexp) still enforces
    — through Spark, on the native route — and never reaches DuckDB."""
    t = ManifestTable(str(tmp_path / "rx"))
    t.overwrite(spark.createDataFrame([("a1",), ("b2",)], "s string"))
    t.alter_constraints(spark, add={"shape": "s rlike '^[a-z][0-9]$'"})
    t.append(spark.createDataFrame([("c3",)], "s string"))
    assert t.last_write_route == "native"
    assert t.snapshot(spark).count() == 3
    with pytest.raises(ConstraintViolationError, match="shape"):
        t.append(spark.createDataFrame([("nope!",)], "s string"))


def test_ds_writer_refuses_unvetted_predicate_at_plan_time(spark, tmp_path):
    from etl_job_spark.sources.manifest_source import write_manifest_table

    d = str(tmp_path / "dsrx")
    t = ManifestTable(d)
    t.overwrite(spark.createDataFrame([("a1",)], "s string"))
    t.alter_constraints(spark, add={"shape": "s rlike '^[a-z][0-9]$'"})
    with pytest.raises(Exception, match="cross-dialect"):
        write_manifest_table(
            spark.createDataFrame([("b2",)], "s string"), d, mode="append"
        )
    # vetted constraints keep working through the DS writer
    t2 = ManifestTable(str(tmp_path / "dsok"))
    t2.overwrite(spark.createDataFrame([(1,)], "k long"))
    t2.alter_constraints(spark, add={"pos": "k > 0"})
    write_manifest_table(
        spark.createDataFrame([(2,)], "k long"), t2.path, mode="append"
    )
    assert t2.snapshot(spark).count() == 2


def test_cross_engine_agreement_on_vetted_subset(spark):
    """The vetted subset's whole point: Spark and DuckDB count the
    SAME violations for the same predicate text over the same rows —
    including NULL rows (NULL predicate = violation, both sides)."""
    import duckdb
    import pyarrow as pa

    rows = [
        (1, 5.0, "ab"), (0, None, "x"), (-3, 2.5, None),
        (7, -1.0, "abc"), (None, 0.0, "zz"),
    ]
    df = spark.createDataFrame(rows, "k int, v double, s string")
    preds = [
        "k >= 0",
        "coalesce(v, 0) >= 0",
        "length(s) <= 2",
        "s LIKE 'a%' OR s IN ('x', 'zz')",
        "CASE WHEN k > 0 THEN v ELSE 0 END >= 0",
        "k BETWEEN 0 AND 7 AND NOT (v < 0)",
    ]
    tbl = pa.Table.from_pandas(df.toPandas())
    con = duckdb.connect()
    con.register("__batch", tbl)
    for pred in preds:
        assert duckdb_dialect_safe(pred), pred
        want = df.filter(
            ~F.coalesce(F.expr(pred), F.lit(False))
        ).count()
        got = con.execute(
            f"SELECT count(*) FROM __batch WHERE NOT ({pred}) OR ({pred}) IS NULL"
        ).fetchone()[0]
        assert got == want, pred


def test_fused_update_merge_and_partitioned_routes(spark, tmp_path):
    """update_where and clause-merge rewrites on a guarded partitioned
    table take the fused route; values and refusals unchanged."""
    t = ManifestTable(str(tmp_path / "um"))
    df = spark.createDataFrame(
        [(i, i * 10, "a" if i % 2 else "b") for i in range(40)],
        "k long, v long, g string",
    )
    t.overwrite(df.repartition("g"), partition_by=["g"], bloom_cols=["k"])
    t.alter_constraints(spark, add={"v_nonneg": "v >= 0"})
    t.update_where(spark, {"v": "v + 1"}, [("g", "=", "a")])
    assert t.last_write_route == "fused"
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert all(v == k * 10 + (1 if k % 2 else 0) for k, v in got.items())
    # merge matched-update through the fused route
    src = spark.createDataFrame([(1, 999), (2, 888)], "k long, v long")
    t.merge(spark, src, ["k"], when_matched_update=["v"], insert_unmatched=False)
    assert t.last_write_route == "fused"
    got = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert got[1] == 999 and got[2] == 888
    # a violating UPDATE refuses and rolls nothing out
    v = t.latest_version()
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        t.update_where(spark, {"v": "-1"}, [("g", "=", "b")])
    assert t.latest_version() == v
    # renamed guarded table: fused route still validates (LOGICAL
    # names — the constraint references the renamed column) and
    # writes physical (renames refuse while a constraint references
    # the column, so re-guard after)
    t.alter_constraints(spark, drop=["v_nonneg"])
    t.rename_column("v", "val")
    t.alter_constraints(spark, add={"val_nonneg": "val >= 0"})
    t.append(
        spark.createDataFrame([(100, 5, "a")], "k long, val long, g string")
    )
    assert t.last_write_route == "fused"
    assert {r.val for r in t.snapshot(spark).filter("k = 100").collect()} == {5}
    with pytest.raises(ConstraintViolationError, match="val_nonneg"):
        t.append(
            spark.createDataFrame([(101, -5, "a")], "k long, val long, g string")
        )


def test_append_omitting_constrained_evolved_column_falls_back(spark, tmp_path):
    """A NULL-tolerant constraint on an evolved column the frame OMITS
    can't resolve against the written frame — the route falls back to
    Spark-side validation on the ALIGNED frame, preserving the
    library's acceptance semantics."""
    t = ManifestTable(str(tmp_path / "evo"))
    t.overwrite(
        spark.createDataFrame([(1, 2.0)], "k long, c double"), bloom_cols=["k"]
    )
    t.alter_constraints(spark, add={"c_ok": "c IS NULL OR c > 0"})
    # frame without c: aligned view NULL-fills, constraint passes
    t.append(spark.createDataFrame([(2,)], "k long"))
    assert t.last_write_route == "native"  # dry-run couldn't resolve c
    got = {r.k: r.c for r in t.snapshot(spark).collect()}
    assert got == {1: 2.0, 2: None}
    # frame WITH c resolves: fused, and violations refuse
    t.append(spark.createDataFrame([(3, 1.5)], "k long, c double"))
    assert t.last_write_route == "fused"
    with pytest.raises(ConstraintViolationError):
        t.append(spark.createDataFrame([(4, -1.0)], "k long, c double"))


def test_write_tasks_coalesce_row_groups(tmp_path):
    """The write tasks coalesce Spark's ~10k-row Arrow batches into
    big row groups (one per 64 MB buffered): 50 small batches land as
    ONE row group, not 50 — the footer/page-index overhead every
    future scan of a big table would pay."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_job_spark.sources.manifest_source import write_task_files

    batches = [
        pa.record_batch([pa.array(range(i * 100, (i + 1) * 100))], names=["k"])
        for i in range(50)
    ]
    files = write_task_files(
        str(tmp_path), "sub", None, {}, {}, [], {}, iter(batches)
    )
    assert len(files) == 1 and files[0]["rows"] == 5000
    pf = pq.ParquetFile(str(tmp_path / "data" / files[0]["rel"]))
    assert pf.metadata.num_row_groups == 1
    # partitioned path coalesces per partition value too
    batches2 = [
        pa.record_batch(
            [pa.array(range(i * 10, (i + 1) * 10)),
             pa.array(["a" if j % 2 else "b" for j in range(10)])],
            names=["k", "g"],
        )
        for i in range(20)
    ]
    files2 = write_task_files(
        str(tmp_path), "sub2", ["g"], {"g": False}, {}, [], {}, iter(batches2)
    )
    assert sorted(f["partition"]["g"] for f in files2) == ["a", "b"]
    for f in files2:
        pf = pq.ParquetFile(str(tmp_path / "data" / f["rel"]))
        assert pf.metadata.num_row_groups == 1, f["rel"]
