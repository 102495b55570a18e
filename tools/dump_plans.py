"""Dump `.explain("formatted")` for named registered queries to
plans/<tag>/<name>_<suffix>.txt — the committed evidence files the
optimization rounds pair as `<query>_before.txt` / `<query>_after.txt`.

Usage: python tools/dump_plans.py --suffix before [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--suffix", required=True, help="before|after")
    ap.add_argument("--out", default="plans/r14")
    args = ap.parse_args()

    from cse_datapipeline_and_mls_spark.queries import QUERIES
    from cse_datapipeline_and_mls_spark.session import get_spark

    spark = get_spark("dump_plans")
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out)
    os.makedirs(root, exist_ok=True)
    for name in args.names:
        if name not in QUERIES:
            print(f"SKIP unknown query {name}")
            continue
        df = QUERIES[name](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(root, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"wrote {path} (Exchange x{n_ex}, {len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
