"""Derive a MULTI-SPLIT copy of an sf dir for measurement sweeps.

The driver's sf tables are single parquet files with one row group each,
so every scan is one task and the local bench structurally cannot see
parallelism wins (r16 verdict: 8-vs-32-core ratios ≈ 1 everywhere; the
scaling block measures fixed overhead, not the engine). This tool
rewrites each table as a DIRECTORY of N row-group-sized files so that

- scans parallelize like a production corpus,
- ``tables.widen_if_narrow`` takes its production NO-OP path (the
  data-derived condition sees >= defaultParallelism splits), and
- plan shapes that depend on multi-split inputs (AQE coalescing,
  ReusedExchange under real partitioning — VERDICT r16 item 8) can be
  captured locally.

Measurement-only: bench.py and the oracle sweeps keep reading
$SPARK_GRAFT_SF_DIR untouched. Rows are byte-identical (one
round-robin repartition per table; no values change), so any query may
also be oracle-checked against the split copy.

Usage:
    python tools/make_split_corpus.py [--sf /root/testdata/sf0.1]
        [--out /tmp/sf0.1_split] [--files 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf0.1_split")
    ap.add_argument("--files", type=int, default=32)
    args = ap.parse_args()

    from allora_indexer_spark.session import get_spark
    from allora_indexer_spark.tables import TABLE_NAMES

    spark = get_spark(app_name="make-split-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    for name in TABLE_NAMES:
        src = os.path.join(args.sf, f"{name}.parquet")
        dst = os.path.join(args.out, f"{name}.parquet")
        df = spark.read.parquet(src)
        n = df.count()
        # small dimension tables stay 1 file; fact tables split
        k = 1 if n < 10 * args.files else args.files
        df.repartition(k).write.mode("overwrite").parquet(dst)
        print(f"{name}: {n} rows -> {k} files")
    print(f"split corpus at {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
