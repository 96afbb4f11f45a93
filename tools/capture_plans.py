"""Dump .explain("formatted") for named registry queries to files.

Usage:
    python tools/capture_plans.py --out plans/r16 --suffix _before q41,q48,...

Queries whose construction runs driver-side actions (the iterative CC /
pagerank loops) still work: explain is taken on the returned frame.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", help="comma-separated registry names")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from allora_indexer_spark.registry import all_queries
    from allora_indexer_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names.split(","):
        df = registry[name].fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
