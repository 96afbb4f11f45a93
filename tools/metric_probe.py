"""Load-independent execution metrics per registry query.

Wall-clock on the shared container swings 2-5x with box weather
(BASELINE.md), which makes single-run timing useless for adjudicating an
optimization. This probe records the DETERMINISTIC execution footprint
instead: Spark job count, stage count, task count, input bytes, shuffle
read/write bytes — read from the driver's own UI REST API after running
the query against the noop sink. Fewer jobs/stages/shuffled bytes at
equal results is a real win regardless of the scheduler weather.

Usage:
    python tools/metric_probe.py q41_minhash_lsh_dedup,q48_dedup_components \
        [--sf /root/testdata/sf0.1] [--out /tmp/metrics.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:  # localhost UI only
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", help="comma-separated registry names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from allora_indexer_spark.registry import all_queries
    from allora_indexer_spark.session import get_spark

    spark = get_spark(
        app_name="metric-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    registry = all_queries()

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    noop(registry["q01_pricing_summary"].fn(spark, args.sf))  # warm-up

    def job_count() -> int:
        return len(_rest(base, f"/api/v1/applications/{app_id}/jobs"))

    def stage_totals() -> dict:
        stages = _rest(
            base, f"/api/v1/applications/{app_id}/stages?status=complete"
        )
        return {
            "stages": len(stages),
            "tasks": sum(s["numCompleteTasks"] for s in stages),
            "input_mb": round(
                sum(s["inputBytes"] for s in stages) / 1e6, 2
            ),
            "shuffle_read_mb": round(
                sum(s["shuffleReadBytes"] for s in stages) / 1e6, 2
            ),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in stages) / 1e6, 2
            ),
        }

    out: dict[str, dict] = {}
    for name in args.names.split(","):
        j0, s0 = job_count(), stage_totals()
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"metric_probe:{name}")
        noop(registry[name].fn(spark, args.sf))
        wall = round(time.perf_counter() - t0, 3)
        j1, s1 = job_count(), stage_totals()
        rec = {
            "wall_sec": wall,
            "jobs": j1 - j0,
            **{k: round(s1[k] - s0[k], 2) for k in s1},
        }
        out[name] = rec
        print(f"{name}: {json.dumps(rec)}", flush=True)
    spark.sparkContext.setJobDescription(None)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
