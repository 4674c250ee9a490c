"""User TBLPROPERTIES + column NOT NULL / DEFAULT (VERDICT r11
next-round #6 and #7): free-form per-table key/values carried by every
commit with time-travel history, and the two single-verb Delta parity
items on the constraint machinery — ``ALTER COLUMN c SET NOT NULL``
(snapshot-validated, enforced on every write path with violation
atomicity) and ``SET DEFAULT`` (write-time fill for omitted columns,
never retroactive).
"""

from __future__ import annotations

import pytest

from etl_job_spark.sql import execute_dml
from etl_job_spark.table import ConstraintViolationError, ManifestTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path, name="t"):
    t = ManifestTable(str(tmp_path / name))
    t.overwrite(
        spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], "k int, s string, v double")
    )
    return t


# ---------------------------------------------------------------------
# TBLPROPERTIES
# ---------------------------------------------------------------------


def test_tblproperties_roundtrip_and_carry(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = execute_dml(
        spark, t,
        "ALTER TABLE t SET TBLPROPERTIES ('owner' = 'data-eng', "
        "'retention.days' = '30')",
    )
    assert v == 2
    assert t.tblproperties() == {"owner": "data-eng", "retention.days": "30"}
    # metadata-only: same file set
    assert t._read_manifest(2)["files"] == t._read_manifest(1)["files"]
    # carried across unrelated commits
    t.append(spark.createDataFrame([(3, "c", 30.0)], "k int, s string, v double"))
    assert t.tblproperties()["owner"] == "data-eng"
    # SHOW surfaces user keys as plain rows
    shown = dict(
        (r.key, r.value)
        for r in execute_dml(spark, t, "SHOW TBLPROPERTIES t").collect()
    )
    assert shown["owner"] == "data-eng" and shown["retention.days"] == "30"
    # DESCRIBE DETAIL carries them too
    detail = execute_dml(spark, t, "DESCRIBE DETAIL t").first()
    assert '"owner": "data-eng"' in detail.properties


def test_tblproperties_unset_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    execute_dml(spark, t, "ALTER TABLE t SET TBLPROPERTIES ('a' = '1', 'b' = '2')")
    execute_dml(spark, t, "ALTER TABLE t UNSET TBLPROPERTIES ('a')")
    execute_dml(spark, t, "ALTER TABLE t SET TBLPROPERTIES ('b' = '3')")
    assert t.tblproperties() == {"b": "3"}
    # time travel shows each version's values
    assert t.tblproperties(version=2) == {"a": "1", "b": "2"}
    assert t.tblproperties(version=3) == {"b": "2"}
    with pytest.raises(KeyError, match="IF EXISTS"):
        execute_dml(spark, t, "ALTER TABLE t UNSET TBLPROPERTIES ('missing')")
    v = execute_dml(
        spark, t, "ALTER TABLE t UNSET TBLPROPERTIES IF EXISTS ('missing', 'b')"
    )
    assert t.tblproperties(version=v) == {}
    ops = [h["operation"].get("op") for h in t.history()]
    assert ops.count("alter_tblproperties") == 4


# ---------------------------------------------------------------------
# NOT NULL
# ---------------------------------------------------------------------


def test_set_not_null_validates_then_enforces(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN s SET NOT NULL")
    assert v == 2
    # SHOW COLUMNS reports non-nullable
    cols = {r.col_name: r.nullable for r in execute_dml(spark, t, "SHOW COLUMNS IN t").collect()}
    assert cols["s"] is False and cols["v"] is True
    # violating append refuses ATOMICALLY: no version bump, no rows
    before = t.latest_version()
    with pytest.raises(ConstraintViolationError, match="not_null_s"):
        t.append(
            spark.createDataFrame([(9, None, 9.0)], "k int, s string, v double")
        )
    assert t.latest_version() == before
    assert t.snapshot(spark).count() == 2
    # merge insert with a NULL refuses too (all write paths enforce)
    with pytest.raises(ConstraintViolationError):
        t.merge(
            spark,
            spark.createDataFrame([(8, None, 8.0)], "k int, s string, v double"),
            keys=["k"],
        )
    # clean writes pass
    t.append(spark.createDataFrame([(3, "c", 3.0)], "k int, s string, v double"))
    assert t.snapshot(spark).count() == 3


def test_set_not_null_refuses_existing_nulls(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, None)], "k int, s string"))
    with pytest.raises(ConstraintViolationError):
        execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN s SET NOT NULL")


def test_drop_not_null(spark, tmp_path):
    t = _mk(spark, tmp_path)
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN s SET NOT NULL")
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN s DROP NOT NULL")
    t.append(spark.createDataFrame([(9, None, 9.0)], "k int, s string, v double"))
    assert t.snapshot(spark).filter("s IS NULL").count() == 1
    with pytest.raises(KeyError, match="nullable"):
        execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN v DROP NOT NULL")
    with pytest.raises(ValueError, match="not a table column"):
        execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN nope SET NOT NULL")


# ---------------------------------------------------------------------
# DEFAULT
# ---------------------------------------------------------------------


def test_default_fills_omitted_columns_on_append(spark, tmp_path):
    t = _mk(spark, tmp_path)
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN v SET DEFAULT 1.5")
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN s SET DEFAULT 'unk'")
    # library append omitting both columns: defaults land, not NULL
    t.append(spark.createDataFrame([(7,)], "k int"))
    got = {r.k: (r.s, r.v) for r in t.snapshot(spark).collect()}
    assert got[7] == ("unk", 1.5)
    # never retroactive: pre-default rows keep their values
    assert got[1] == ("a", 10.0)
    # SQL column-list INSERT omitting v: default fills
    v = execute_dml(spark, t, "INSERT INTO t (k, s) VALUES (8, 'h')")
    assert v == t.latest_version()
    got = {r.k: (r.s, r.v) for r in t.snapshot(spark).collect()}
    assert got[8] == ("h", 1.5)


def test_default_drop_and_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="does not cast"):
        execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN v SET DEFAULT 'abc'")
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN v SET DEFAULT 2.0")
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN v DROP DEFAULT")
    t.append(spark.createDataFrame([(7, "x")], "k int, s string"))
    assert t.snapshot(spark).filter("k = 7").first().v is None
    with pytest.raises(KeyError, match="no default"):
        execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN v DROP DEFAULT")
    # SHOW TBLPROPERTIES surfaces the defaults map
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN s SET DEFAULT 'd'")
    shown = dict(
        (r.key, r.value)
        for r in execute_dml(spark, t, "SHOW TBLPROPERTIES t").collect()
    )
    assert '"s": "d"' in shown["defaults"]


def test_default_satisfies_not_null(spark, tmp_path):
    """The canonical combo: NOT NULL + DEFAULT — an insert omitting
    the column passes the constraint because the default fills BEFORE
    validation."""
    t = _mk(spark, tmp_path)
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN s SET NOT NULL")
    execute_dml(spark, t, "ALTER TABLE t ALTER COLUMN s SET DEFAULT 'filled'")
    execute_dml(spark, t, "INSERT INTO t (k, v) VALUES (9, 9.0)")
    assert t.snapshot(spark).filter("k = 9").first().s == "filled"


# ---------------------------------------------------------------------
# empty-table CREATE with column markers (round 12, late)
# ---------------------------------------------------------------------


def test_create_empty_table_with_markers(spark, tmp_path):
    """CREATE TABLE (col type [NOT NULL] [DEFAULT lit]) — schema,
    layout, nullability, and defaults all exist BEFORE any data, the
    Delta DDL lifecycle."""
    t = ManifestTable(str(tmp_path / "t"))
    v = execute_dml(
        spark, t,
        "CREATE TABLE t (k INT NOT NULL, s STRING DEFAULT 'unk', "
        "v DECIMAL(10, 2), p STRING) PARTITIONED BY (p)",
    )
    assert v >= 1
    assert t.snapshot(spark).count() == 0
    man = t._read_manifest(t.latest_version())
    assert man["partition_by"] == ["p"]
    assert man["defaults"] == {"s": "unk"}
    assert "not_null_k" in man["constraints"]
    # the markers enforce from the very first write
    import pytest as _pytest

    from etl_job_spark.table import ConstraintViolationError

    with _pytest.raises(ConstraintViolationError):
        t.append(
            spark.createDataFrame(
                [(None, "x", None, "a")], "k int, s string, v decimal(10,2), p string"
            )
        )
    execute_dml(spark, t, "INSERT INTO t (k, p) VALUES (1, 'a')")
    row = t.snapshot(spark).first()
    assert (row.k, row.s, row.v, row.p) == (1, "unk", None, "a")
    # plain CREATE refuses over an existing table; OR REPLACE replaces
    with _pytest.raises(ValueError, match="already exists"):
        execute_dml(spark, t, "CREATE TABLE t (k INT)")
    execute_dml(spark, t, "CREATE OR REPLACE TABLE t (k INT)")
    assert [f.name for f in t.snapshot(spark).schema.fields] == ["k"]
