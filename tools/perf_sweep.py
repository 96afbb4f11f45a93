"""Engine-only per-query timing sweep across the FULL registry.

The bench (bench.py) times only the 17 headline queries; the correctness
sweeps (tools/local_correctness.py) time Spark + toPandas + the DuckDB
oracle together, which buries the engine's own cost. This tool isolates
the Spark computation per registered query with the noop sink (guide
§1.4: full distributed execution of every column, no driver collect, no
output cost) so optimization targets are picked from engine time, not
oracle time.

Usage:
    python tools/perf_sweep.py [--sf /root/testdata/sf0.1] [--reps 2]
        [--out PERF_SWEEP_r16.json] [--only q41,q97,...]

Writes {name: {"secs": [...], "best": s, "median": s}} plus load context.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="PERF_SWEEP_r16.json")
    ap.add_argument("--only", default=None, help="comma-separated names")
    args = ap.parse_args()

    from allora_indexer_spark.registry import all_queries
    from allora_indexer_spark.session import get_spark

    spark = get_spark(app_name="perf-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    names = (
        args.only.split(",") if args.only else sorted(registry.keys())
    )

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # warm-up: JIT/codegen + parquet footer caches, not counted
    noop(registry["q01_pricing_summary"].fn(spark, args.sf))

    out: dict[str, dict] = {}
    load0 = os.getloadavg()
    for name in names:
        fn = registry[name].fn
        spark.sparkContext.setJobDescription(f"perf_sweep:{name}")
        secs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            noop(fn(spark, args.sf))
            secs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "secs": secs,
            "best": min(secs),
            "median": round(statistics.median(secs), 3),
        }
        print(f"{name}: {secs}", flush=True)
    spark.sparkContext.setJobDescription(None)

    payload = {
        "sf_dir": args.sf,
        "reps": args.reps,
        "total_best_sec": round(sum(v["best"] for v in out.values()), 1),
        "load_start": [round(x, 2) for x in load0],
        "load_end": [round(x, 2) for x in os.getloadavg()],
        "queries": out,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out
    )
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {path}: total_best={payload['total_best_sec']}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
