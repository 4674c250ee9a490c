"""Bench harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line the driver records as BENCH_r{N}.json.

Timing = per-query wall clock of plan construction + execution to a
count-materializing action. Warm-up runs the flagship query once,
untimed (reported as ``warmup_seconds``), so session start / codegen /
parquet-footer costs aren't billed to the first timed query and
per-query times are comparable round over round.
"""

from __future__ import annotations

import json
import os
import sys
import time

from etl_job_spark.plans.registry import QUERIES
from etl_job_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark("etl-job-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up JVM + whole-stage codegen + parquet footer reads by
    # running the flagship query once, untimed
    t0 = time.perf_counter()
    first_name, first_fn = next(iter(QUERIES.items()))
    first_fn(spark, sf_dir).count()
    warmup = round(time.perf_counter() - t0, 4)
    print(f"# warmup ({first_name}): {warmup:.3f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 4)
            print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
        except Exception as exc:  # pragma: no cover - bench resilience
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"# {name}: FAILED {failures[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "warmup_seconds": warmup,
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
