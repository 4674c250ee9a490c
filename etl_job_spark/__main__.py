"""CLI — the cron-invocable surface replacing the reference's
per-script entry points (load_*.py / kicc_to_tb_*.py __main__ blocks,
SURVEY.md §3). One binary, subcommands per pipeline, windows as flags
instead of three script variants per job.

    python -m etl_job_spark list-queries
    python -m etl_job_spark query --name pricing_summary [--sf-dir D] [--limit N]
    python -m etl_job_spark mart-store --sf-dir D --out PATH
    python -m etl_job_spark mart-prod  --sf-dir D --out PATH --from 19980101 --to 19980331
    python -m etl_job_spark compact    --path PATH [--rows-per-file N]
    python -m etl_job_spark table versions|show|diff|compact|vacuum --path PATH
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_job_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run a named registry query")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=10)

    sub.add_parser("list-queries", help="list registry query names")

    ms = sub.add_parser("mart-store", help="E2: build tb_sales_by_store mart")
    ms.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ms.add_argument("--out", required=True)

    mp = sub.add_parser("mart-prod", help="E3: build tb_sales_by_prod mart over a window")
    mp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    mp.add_argument("--out", required=True)
    mp.add_argument("--from", dest="lo", required=True, help="YYYYMMDD")
    mp.add_argument("--to", dest="hi", required=True, help="YYYYMMDD")

    cp = sub.add_parser("compact", help="compact a fragmented parquet table")
    cp.add_argument("--path", required=True)
    cp.add_argument("--rows-per-file", type=int, default=1_000_000)

    ct = sub.add_parser("catalog", help="resolve logical tables from a catalog file")
    ct.add_argument("action", choices=["names", "show"])
    ct.add_argument("--catalog", required=True, help="path to a catalog JSON file")
    ct.add_argument("--name", default=None, help="for show")
    ct.add_argument("--limit", type=int, default=10)

    tb = sub.add_parser("table", help="inspect/maintain a ManifestTable")
    tb.add_argument("--path", required=True)
    tb.add_argument(
        "action",
        choices=[
            "versions", "history", "show", "read", "count", "rows",
            "agg", "diff", "compact", "vacuum", "restore", "delete",
            "delete-keys", "update", "constraints", "rename", "drop-cols",
            "files", "partitions", "sql", "convert",
        ],
    )
    tb.add_argument(
        "--partitioned-by",
        default=None,
        help="for convert: comma-separated partition columns the "
        "adopted hive layout must match (omit to accept the "
        "discovered layout)",
    )
    tb.add_argument(
        "--statement",
        default=None,
        help="for sql: one DML statement (INSERT INTO/UPDATE/DELETE "
        "FROM/MERGE INTO) executed against the table via "
        "sql.execute_dml; the statement's table name must match the "
        "--path basename. MERGE/INSERT sources are resolved as Spark "
        "views — register them via --views name=parquet_path "
        "(repeatable)",
    )
    tb.add_argument(
        "--views",
        action="append",
        default=[],
        metavar="NAME=PARQUET_PATH",
        help="for sql: register a parquet file/dir as a temp view "
        "before executing the statement (repeatable)",
    )
    tb.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="COL=SQL",
        help="for update: a SET assignment (repeatable; SQL expression "
        "evaluated against the pre-update row, cast to the column type)",
    )
    tb.add_argument(
        "--from-col", default=None,
        help="for rename: current (logical) column name",
    )
    tb.add_argument(
        "--to-col", default=None,
        help="for rename: new column name (metadata-only; files keep "
        "the physical name — Delta-style column mapping)",
    )
    tb.add_argument(
        "--cols", default=None,
        help="for drop-cols: comma-separated column names to DROP "
        "(metadata-only, tombstoned against resurrection); for agg: "
        "the columns to aggregate",
    )
    tb.add_argument(
        "--add",
        action="append",
        default=[],
        metavar="NAME=SQL",
        help="for constraints: add a named CHECK (repeatable)",
    )
    tb.add_argument(
        "--drop",
        action="append",
        default=[],
        metavar="NAME",
        help="for constraints: drop a named CHECK (repeatable)",
    )
    tb.add_argument("--where", default=None, help="for delete: SQL predicate")
    tb.add_argument(
        "--predicates",
        default=None,
        help='for read: JSON conjunctive spec, e.g. '
        '\'[["sale_date","between",["19980201","19980214"]],'
        '["sp_code","in",["000002"]]]\' — files are pruned via '
        "manifest stats/blooms/partitions before the scan",
    )
    tb.add_argument("--key-col", default=None, help="for delete-keys: key column")
    tb.add_argument(
        "--keys",
        default=None,
        help="for delete-keys: comma-separated values, parsed by the key "
        "column's type from the manifest schema; planning skips files "
        "via manifest stats and bloom filters",
    )
    tb.add_argument(
        "--mode",
        choices=["copy_on_write", "merge_on_read"],
        default="copy_on_write",
        help="for delete: CoW rewrites matching files; MoR lands deletion vectors",
    )
    tb.add_argument(
        "--mor-row-limit",
        type=int,
        default=None,
        help="for delete --mode merge_on_read: matched-row cap past "
        "which the delete auto-falls-back to copy-on-write",
    )
    tb.add_argument("--version", type=int, default=None, help="for show/restore")
    tb.add_argument(
        "--as-of", default=None, help="for show: ISO timestamp time travel"
    )
    tb.add_argument("--from", dest="from_v", type=int, default=None, help="for diff")
    tb.add_argument("--to", dest="to_v", type=int, default=None, help="for diff")
    tb.add_argument("--keep-last", type=int, default=2, help="for vacuum")
    tb.add_argument(
        "--grace-seconds", type=float, default=3600.0,
        help="vacuum: never reclaim a never-referenced file younger than this "
        "(protects in-flight commits); dropped versions reclaim immediately",
    )
    tb.add_argument("--limit", type=int, default=10)
    tb.add_argument(
        "--cluster-by",
        default=None,
        help="for compact: comma-separated key columns to range-cluster "
        "(narrow per-file key ranges -> MERGE data skipping)",
    )
    tb.add_argument(
        "--zorder",
        action="store_true",
        help="for compact with --cluster-by: interleave quantile-bucket "
        "bits (space-filling curve) so EVERY listed dimension skips",
    )
    tb.add_argument(
        "--small-files-only",
        action="store_true",
        help="for compact: bin-pack only fragmented/DV-carrying files "
        "(incremental OPTIMIZE — cost scales with fragmentation, not "
        "table size); incompatible with --cluster-by/--zorder",
    )
    tb.add_argument(
        "--rows-per-file", type=int, default=1_000_000,
        help="for compact: target rows per output file",
    )

    args = ap.parse_args(argv)

    from etl_job_spark.plans.registry import QUERIES

    if args.cmd == "list-queries":
        print(json.dumps(sorted(QUERIES)))
        return 0

    from pyspark.sql import SparkSession

    from etl_job_spark.session import get_spark

    # only stop a session this process created (tests and notebooks
    # call main() with a live session; getOrCreate reuses it)
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(f"etl-job-spark-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "query":
            if args.name not in QUERIES:
                print(f"unknown query {args.name!r}", file=sys.stderr)
                return 2
            df = QUERIES[args.name](spark, args.sf_dir)
            rows = [r.asDict(recursive=True) for r in df.limit(args.limit).collect()]
            print(json.dumps({"query": args.name, "n_preview": len(rows), "rows": rows},
                             default=str))
        elif args.cmd == "mart-store":
            from etl_job_spark import pipelines
            from etl_job_spark.plans import kicc

            pipelines.build_mart_store(
                spark,
                kicc.kicc_sales_data(spark, args.sf_dir),
                kicc.tb_store_temp(spark, args.sf_dir),
                kicc.tb_store_easypos(spark, args.sf_dir),
                args.out,
            )
            print(json.dumps({"mart": args.out, "rows": spark.read.parquet(args.out).count()}))
        elif args.cmd == "mart-prod":
            from etl_job_spark import pipelines
            from etl_job_spark.plans import kicc

            pipelines.build_mart_prod(
                spark,
                kicc.kicc_store_product_sales(spark, args.sf_dir),
                kicc.kicc_product_list(spark, args.sf_dir),
                args.out,
                (args.lo, args.hi),
            )
            print(json.dumps({"mart": args.out, "rows": spark.read.parquet(args.out).count()}))
        elif args.cmd == "compact":
            from etl_job_spark import sinks

            n = sinks.compact(spark, args.path, target_rows_per_file=args.rows_per_file)
            print(json.dumps({"path": args.path, "files": n}))
        elif args.cmd == "catalog":
            from etl_job_spark.catalog import Catalog

            cat = Catalog.from_json_file(args.catalog)
            if args.action == "names":
                print(json.dumps(cat.names()))
            elif args.action == "show":
                if args.name is None:
                    print("catalog show requires --name", file=sys.stderr)
                    return 2
                df = cat.load(spark, args.name)
                rows = [r.asDict(recursive=True) for r in df.limit(args.limit).collect()]
                print(json.dumps(
                    {"name": args.name, "backend": cat.describe(args.name)["backend"],
                     "rows": rows}, default=str))
        elif args.cmd == "table":
            from etl_job_spark.table import ManifestTable

            t = ManifestTable(args.path)
            if args.action == "convert":
                pb = (
                    [c.strip() for c in args.partitioned_by.split(",") if c.strip()]
                    if args.partitioned_by
                    else None
                )
                conv = ManifestTable.convert(spark, args.path, partition_by=pb)
                print(json.dumps({
                    "path": args.path,
                    "version": conv.latest_version(),
                    "files": len(conv._read_manifest(conv.latest_version())["files"]),
                    "partition_by": conv._read_manifest(
                        conv.latest_version()
                    )["partition_by"],
                }))
            elif args.action == "versions":
                print(json.dumps({"path": args.path, "versions": t.versions()}))
            elif args.action == "history":
                print(json.dumps({"path": args.path, "history": t.history()}))
            elif args.action == "show":
                if args.as_of is not None:
                    shown = t.version_as_of(args.as_of)
                else:
                    shown = args.version if args.version is not None else t.latest_version()
                df = t.snapshot(spark, version=shown)
                rows = [r.asDict(recursive=True) for r in df.limit(args.limit).collect()]
                print(json.dumps(
                    {"path": args.path, "version": shown,
                     "as_of": args.as_of, "rows": rows}, default=str))
            elif args.action in ("read", "count"):
                if not args.predicates:
                    print(
                        f"table {args.action} requires --predicates (JSON)",
                        file=sys.stderr,
                    )
                    return 2
                try:
                    # JSON lists arrive for between pairs; value-less
                    # nullness tests arrive as 2-element specs;
                    # predicate ops validate inside snapshot_where
                    spec = []
                    for p in json.loads(args.predicates):
                        c, op, v = p if len(p) == 3 else (*p, None)
                        spec.append((c, op, tuple(v) if op == "between" else v))
                except (ValueError, TypeError) as exc:
                    print(f"--predicates does not parse: {exc}", file=sys.stderr)
                    return 2
                if args.action == "count":
                    n = t.count_where(spark, spec, version=args.version)
                    print(json.dumps(
                        {"path": args.path, "predicates": args.predicates,
                         "count": n, "plan": t.last_count_plan}))
                else:
                    df = t.snapshot_where(spark, spec, version=args.version)
                    rows = [
                        r.asDict(recursive=True) for r in df.limit(args.limit).collect()
                    ]
                    print(json.dumps(
                        {"path": args.path, "predicates": args.predicates,
                         "n_preview": len(rows), "rows": rows}, default=str))
            elif args.action == "rows":
                print(json.dumps(
                    {"path": args.path,
                     "version": args.version
                     if args.version is not None else t.latest_version(),
                     "rows": t.row_count(version=args.version)}))
            elif args.action == "diff":
                frm = args.from_v if args.from_v is not None else (t.latest_version() or 1) - 1
                to = args.to_v if args.to_v is not None else t.latest_version()
                df = t.diff(spark, frm, to)
                rows = [r.asDict(recursive=True) for r in df.limit(args.limit).collect()]
                print(json.dumps(
                    {"path": args.path, "from": frm, "to": to,
                     "n_preview": len(rows), "rows": rows}, default=str))
            elif args.action == "compact":
                cluster = args.cluster_by.split(",") if args.cluster_by else None
                if args.small_files_only:
                    if cluster or args.zorder:
                        print("--small-files-only cannot cluster/zorder "
                              "(bin-packing preserves no global order)",
                              file=sys.stderr)
                        return 2
                    v = t.compact_small_files(
                        spark, target_rows_per_file=args.rows_per_file
                    )
                    print(json.dumps(
                        {"path": args.path, "version": v, "small_files_only": True}))
                else:
                    v = t.compact(
                        spark, target_rows_per_file=args.rows_per_file,
                        cluster_by=cluster, zorder=args.zorder,
                    )
                    print(json.dumps(
                        {"path": args.path, "version": v, "cluster_by": cluster or [],
                         "zorder": bool(cluster) and args.zorder}))
            elif args.action == "vacuum":
                n = t.vacuum(keep_last=args.keep_last, grace_seconds=args.grace_seconds)
                print(json.dumps({"path": args.path, "deleted_files": n}))
            elif args.action == "restore":
                if args.version is None:
                    print("table restore requires --version", file=sys.stderr)
                    return 2
                v = t.restore(spark, args.version)
                print(json.dumps(
                    {"path": args.path, "restored": args.version, "version": v}))
            elif args.action == "delete":
                if not args.where:
                    print("table delete requires --where", file=sys.stderr)
                    return 2
                kw = {}
                if args.mor_row_limit is not None:
                    kw["mor_row_limit"] = args.mor_row_limit
                v = t.delete_where(spark, args.where, mode=args.mode, **kw)
                print(json.dumps(
                    {"path": args.path, "version": v, "mode": args.mode,
                     "where": args.where}))
            elif args.action == "update":
                if (not args.where and not args.predicates) or not args.set:
                    print(
                        "table update requires --where (SQL) or --predicates "
                        "(pruning spec), plus at least one --set COL=SQL",
                        file=sys.stderr,
                    )
                    return 2
                sets = {}
                for item in args.set:
                    col, eq, expr = item.partition("=")
                    if not eq or not col.strip() or not expr.strip():
                        print(f"--set {item!r}: expected COL=SQL", file=sys.stderr)
                        return 2
                    sets[col.strip()] = expr.strip()
                # --predicates (the spec form) plans through
                # partition/stats/bloom file pruning; --where is the
                # general SQL-predicate path (hit-scan only)
                where = (
                    [tuple(p) for p in json.loads(args.predicates)]
                    if args.predicates
                    else args.where
                )
                v = t.update_where(spark, sets, where)
                print(json.dumps(
                    {"path": args.path, "version": v, "set": sorted(sets),
                     "where": args.where or args.predicates}))
            elif args.action == "sql":
                if not args.statement:
                    print("table sql requires --statement", file=sys.stderr)
                    return 2
                from etl_job_spark.sql import execute_dml

                for item in args.views:
                    name, eq, src = item.partition("=")
                    if not eq or not name.strip() or not src.strip():
                        print(f"--views {item!r}: expected NAME=PARQUET_PATH",
                              file=sys.stderr)
                        return 2
                    spark.read.parquet(src.strip()).createOrReplaceTempView(
                        name.strip()
                    )
                v = execute_dml(spark, t, args.statement)
                if isinstance(v, int):
                    print(json.dumps(
                        {"path": args.path, "version": v,
                         "statement": args.statement}))
                else:
                    # DESCRIBE HISTORY/DETAIL return a DataFrame: print
                    # one JSON line per row (cron-parseable, like the
                    # version line)
                    for row in v.collect():
                        print(json.dumps(row.asDict(), default=str))
            elif args.action == "delete-keys":
                if not args.key_col or not args.keys:
                    print("table delete-keys requires --key-col and --keys",
                          file=sys.stderr)
                    return 2
                # parse key tokens by the TABLE's column type, never by
                # token shape: against a string key column a sniffed
                # int 123 would make Spark coerce the column numerically
                # (so '0123' also matches) and the int-vs-str mismatch
                # would disable all bloom/stat pruning
                latest = t.latest_version()
                if latest is None:
                    print(f"no committed version at {args.path}", file=sys.stderr)
                    return 2
                from etl_job_spark.table import ManifestTable as _MT

                schema = _MT._manifest_schema(t._read_manifest(latest))
                field = None
                if schema is not None:
                    field = next(
                        (f for f in schema.fields if f.name == args.key_col), None
                    )
                    if field is None:
                        print(
                            f"column {args.key_col!r} not in table schema "
                            f"({schema.simpleString()})",
                            file=sys.stderr,
                        )
                        return 2
                kind = field.dataType.simpleString() if field is not None else "string"

                def _parse(tok: str):
                    import datetime as _dt

                    if kind in ("tinyint", "smallint", "int", "bigint"):
                        return int(tok)
                    if kind in ("float", "double"):
                        return float(tok)
                    if kind == "date":
                        return _dt.date.fromisoformat(tok)
                    if kind.startswith("timestamp"):
                        return _dt.datetime.fromisoformat(tok)
                    return tok  # string & anything else: pass through as-is

                try:
                    vals = [_parse(tok.strip()) for tok in args.keys.split(",")]
                except ValueError as exc:
                    print(
                        f"--keys value does not parse as the {args.key_col!r} "
                        f"column's type {kind}: {exc}",
                        file=sys.stderr,
                    )
                    return 2
                kw = {}
                if args.mor_row_limit is not None:
                    kw["mor_row_limit"] = args.mor_row_limit
                v = t.delete_keys(spark, args.key_col, vals, mode=args.mode, **kw)
                print(json.dumps(
                    {"path": args.path, "version": v, "mode": args.mode,
                     "key_col": args.key_col, "n_keys": len(vals)}))
            elif args.action == "agg":
                if not args.cols:
                    print("table agg requires --cols", file=sys.stderr)
                    return 2
                res = t.meta_agg(
                    spark,
                    [c.strip() for c in args.cols.split(",") if c.strip()],
                    version=args.version,
                )
                print(json.dumps({"path": args.path, **res}, default=str))
            elif args.action == "files":
                df = t.files_df(spark, version=args.version)
                for r in df.drop("entry_json").limit(args.limit).collect():
                    print(json.dumps(r.asDict(), default=str, sort_keys=True))
            elif args.action == "partitions":
                df = t.partitions_df(spark, version=args.version)
                for r in df.orderBy("partition_json").limit(args.limit).collect():
                    print(json.dumps(r.asDict(), default=str, sort_keys=True))
            elif args.action == "rename":
                if not args.from_col or not args.to_col:
                    print("rename wants --from-col and --to-col", file=sys.stderr)
                    return 2
                v = t.rename_column(args.from_col, args.to_col)
                print(json.dumps(
                    {"path": args.path, "version": v,
                     "renamed": {args.from_col: args.to_col}}))
            elif args.action == "drop-cols":
                if not args.cols:
                    print("drop-cols wants --cols a,b,...", file=sys.stderr)
                    return 2
                cols = [c for c in args.cols.split(",") if c]
                v = t.alter_schema(spark, drop=cols)
                print(json.dumps(
                    {"path": args.path, "version": v, "dropped": cols}))
            elif args.action == "constraints":
                add = {}
                for spec in args.add:
                    name, sep, expr = spec.partition("=")
                    if not sep or not name or not expr:
                        print(f"--add wants NAME=SQL, got {spec!r}", file=sys.stderr)
                        return 2
                    add[name] = expr
                if not add and not args.drop:
                    latest = t.latest_version()
                    if latest is None:
                        print(f"no committed version at {args.path}", file=sys.stderr)
                        return 2
                    man = t._read_manifest(latest)
                    print(json.dumps(
                        {"path": args.path,
                         "constraints": man.get("constraints") or {}}))
                else:
                    v = t.alter_constraints(spark, add=add or None, drop=args.drop or None)
                    print(json.dumps(
                        {"path": args.path, "version": v,
                         "added": sorted(add), "dropped": sorted(args.drop)}))
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
