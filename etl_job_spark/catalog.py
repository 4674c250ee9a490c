"""Unified table catalog — one name-based entry point over every
storage backend the engine speaks.

The reference resolves tables implicitly: a hard-coded MySQL database
holds staging and mart tables and every script opens its own connection
(/root/reference/load_sales_data.py:8-13). The engine grew three call
conventions for the same idea — ``sources.catalog.load_table`` (driver
parquet fixtures), ``table.ManifestTable`` (committed table format),
``sources.jdbc.read_table`` (databases) — which forced pipelines and
the CLI to hard-code a backend per call site. This module closes that
gap: tables register once under a logical name with a backend spec,
and callers use two verbs:

- ``load(spark, name)``  → DataFrame (any backend)
- ``merge(spark, name, source, keys)`` → K3 upsert (writable backends)

Specs are plain JSON-able dicts so a deployment can keep its catalog
in a file (``Catalog.from_json_file``) and the CLI can resolve
``--catalog cat.json --name mart`` without code. Backends:

- ``{"backend": "parquet", "path": P}``      — parquet file/directory
- ``{"backend": "driver", "sf_dir": D, "table": T}`` — driver fixture
  tables, with the events timestamp handling of sources/catalog.py
- ``{"backend": "manifest", "path": P}``     — ManifestTable snapshot
  (optionally pinned: ``"version": N``)
- ``{"backend": "jdbc", "url": U, "table": T, ...}`` — JDBC read via
  sources/jdbc.py; optional ``partition_column``/``num_partitions``
  for range-parallel extract, ``merge_dialect`` for upserts

At 100 TB the catalog is exactly what keeps physical layout a
deploy-time concern: a pipeline written against logical names moves
from a parquet lake to a manifest table (or a JDBC mart) by editing
the catalog file, and every read keeps its pushdown/pruning behavior
because each backend's reader is the specialized one.
"""

from __future__ import annotations

import json
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession

BACKENDS = ("parquet", "driver", "manifest", "jdbc")


class Catalog:
    """Name → backend-spec registry with uniform load/merge verbs."""

    def __init__(self, tables: dict[str, dict[str, Any]] | None = None):
        self._tables: dict[str, dict[str, Any]] = {}
        for name, spec in (tables or {}).items():
            self.register(name, spec)

    # -- registration -------------------------------------------------

    def register(self, name: str, spec: dict[str, Any]) -> None:
        backend = spec.get("backend")
        if backend not in BACKENDS:
            raise ValueError(
                f"table {name!r}: unknown backend {backend!r}; expected one of {BACKENDS}"
            )
        required = {
            "parquet": ("path",),
            "driver": ("sf_dir", "table"),
            "manifest": ("path",),
            "jdbc": ("url", "table"),
        }[backend]
        missing = [k for k in required if k not in spec]
        if missing:
            raise ValueError(f"table {name!r} ({backend}): missing spec keys {missing}")
        self._tables[name] = dict(spec)

    @classmethod
    def from_json_file(cls, path: str) -> Catalog:
        with open(path) as f:
            return cls(json.load(f))

    def names(self) -> list[str]:
        return sorted(self._tables)

    def describe(self, name: str) -> dict[str, Any]:
        return dict(self._spec(name))

    def _spec(self, name: str) -> dict[str, Any]:
        if name not in self._tables:
            raise KeyError(f"unknown table {name!r}; known: {self.names()}")
        return self._tables[name]

    # -- verbs --------------------------------------------------------

    def load(
        self, spark: SparkSession, name: str, where: list[tuple] | None = None
    ) -> DataFrame:
        """Load a table by logical name. ``where`` is an optional
        conjunctive predicate spec ``[(col, op, value), …]`` (the
        ``snapshot_where`` spec): manifest-backed tables plan it as
        read-path data skipping (stats + bloom + partition pruning of
        the file list BEFORE the scan); every other backend applies it
        as an ordinary filter, which Catalyst pushes into the scan —
        same rows either way, so pipelines can pass predicates without
        knowing the backend."""
        from etl_job_spark.table import predicate_column

        spec = self._spec(name)
        backend = spec["backend"]
        if backend == "parquet":
            df = spark.read.parquet(spec["path"])
            return df.filter(predicate_column(where)) if where else df
        if backend == "driver":
            from etl_job_spark.sources.catalog import load_table

            df = load_table(spark, spec["sf_dir"], spec["table"])
            return df.filter(predicate_column(where)) if where else df
        if backend == "manifest":
            from etl_job_spark.table import ManifestTable

            t = ManifestTable(spec["path"])
            if where:
                return t.snapshot_where(spark, where, version=spec.get("version"))
            return t.snapshot(spark, version=spec.get("version"))
        # jdbc
        cfg = self._jdbc_cfg(spec)
        from etl_job_spark.sources.jdbc import read_table

        df = read_table(
            spark,
            cfg,
            spec["table"],
            partition_column=spec.get("partition_column"),
            num_partitions=int(spec.get("num_partitions", 8)),
        )
        # Catalyst pushes the filter into the JDBC WHERE clause
        return df.filter(predicate_column(where)) if where else df

    def merge(
        self,
        spark: SparkSession,
        name: str,
        source: DataFrame,
        keys: Sequence[str],
        order_col: str | None = None,
    ) -> None:
        """K3 upsert into a writable backend (manifest or jdbc); the
        driver fixtures and bare parquet paths are read-only by
        contract (fixtures belong to the driver; a bare parquet dir has
        no commit protocol — promote it to a manifest table to write)."""
        spec = self._spec(name)
        backend = spec["backend"]
        if backend == "manifest":
            from etl_job_spark.table import ManifestTable

            ManifestTable(spec["path"]).merge(spark, source, keys, order_col=order_col)
            return
        if backend == "jdbc":
            from etl_job_spark.sources.jdbc import merge_upsert_jdbc

            merge_upsert_jdbc(
                spark,
                self._jdbc_cfg(spec),
                spec["table"],
                source,
                keys,
                order_col=order_col,
                merge_dialect=spec.get("merge_dialect", "ansi"),
            )
            return
        raise ValueError(f"table {name!r}: backend {backend!r} is read-only")

    def overwrite(
        self,
        spark: SparkSession,
        name: str,
        df: DataFrame,
        partition_by: Sequence[str] | None = None,
    ) -> None:
        """K4 full refresh of a writable backend. Manifest tables get a
        new committed version (readers of the old snapshot are safe —
        which also makes read-transform-overwrite of the SAME table
        safe, unlike an in-place parquet rewrite); JDBC uses truncating
        overwrite so server-side DDL survives.

        JDBC self-reference guard: a lazily-evaluated ``df`` whose
        lineage scans the table being overwritten would execute AFTER
        the truncate and read back empty/partial rows — silent data
        loss (only the manifest backend is snapshot-safe). When the
        target table's JDBCRelation appears in ``df``'s analyzed plan,
        the frame is eagerly localCheckpoint-ed first: the enrichment
        rows are pinned executor-side before the truncate fires. The
        match is a conservative substring test — a false positive only
        costs one extra materialization of data that was about to be
        fully written anyway."""
        spec = self._spec(name)
        backend = spec["backend"]
        if backend == "manifest":
            from etl_job_spark.table import ManifestTable

            ManifestTable(spec["path"]).overwrite(df, partition_by=partition_by)
            return
        if backend == "jdbc":
            from etl_job_spark.sources.jdbc import write_table

            plan = df._jdf.queryExecution().analyzed().toString()
            if "JDBCRelation" in plan and spec["table"] in plan:
                df = df.localCheckpoint(eager=True)
            write_table(
                df, self._jdbc_cfg(spec), spec["table"], mode="overwrite",
                truncate=bool(spec.get("truncate", True)),
            )
            return
        raise ValueError(f"table {name!r}: backend {backend!r} is read-only")

    @staticmethod
    def _jdbc_cfg(spec: dict[str, Any]):
        from etl_job_spark.sources.jdbc import JdbcConfig

        return JdbcConfig(
            url=spec["url"],
            driver=spec.get("driver"),
            user=spec.get("user"),
            password=spec.get("password"),
            properties=dict(spec.get("properties", {})),
        )
