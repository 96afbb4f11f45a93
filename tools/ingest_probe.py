"""Decompose bench._run_ingest: plan-construction time vs execution, plus
the REST execution footprint (jobs/stages/tasks/shuffle) of one pass.

Usage: python tools/ingest_probe.py [--conf k=v ...] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from allora_indexer_spark.session import get_spark
    from allora_indexer_spark.sources.fixtures import write_fixtures
    from allora_indexer_spark.plans import ingest as ip

    extra = {"spark.ui.enabled": "true"}
    for kv in args.conf:
        k, v = kv.split("=", 1)
        extra[k] = v
    spark = get_spark(app_name="ingest-probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    fx = tempfile.mkdtemp(prefix="probe_ingest_")
    blocks_dir, results_dir = write_fixtures(fx)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def one_pass() -> dict:
        t0 = time.perf_counter()
        blocks = ip.read_blocks(spark, blocks_dir)
        results = ip.read_block_results(spark, results_dir)
        t_read = time.perf_counter()
        msgs = ip.messages(blocks).persist()
        fev = ip.flat_events(results).persist()
        t_roots = time.perf_counter()
        with ThreadPoolExecutor(2) as pool:
            list(pool.map(lambda d: d.count(), [msgs, fev]))
        t_counts = time.perf_counter()
        tables = ip.build_tables_from(blocks, msgs, fev)
        t_build = time.perf_counter()
        with ThreadPoolExecutor(max_workers=12) as pool:
            list(pool.map(noop, tables.values()))
        t_write = time.perf_counter()
        msgs.unpersist()
        fev.unpersist()
        return {
            "read_plan_s": round(t_read - t0, 3),
            "roots_plan_s": round(t_roots - t_read, 3),
            "counts_s": round(t_counts - t_roots, 3),
            "build_plans_s": round(t_build - t_counts, 3),
            "writes_s": round(t_write - t_build, 3),
            "total_s": round(t_write - t0, 3),
        }

    one_pass()  # warm-up (JIT, codegen, parquet caches)
    j0 = len(_rest(base, f"/api/v1/applications/{app_id}/jobs"))
    stages0 = _rest(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    sids0 = {s["stageId"] for s in stages0}
    passes = [one_pass() for _ in range(args.reps)]
    j1 = len(_rest(base, f"/api/v1/applications/{app_id}/jobs"))
    stages1 = _rest(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    new = [s for s in stages1 if s["stageId"] not in sids0]
    out = {
        "per_pass_median": {
            k: round(statistics.median(p[k] for p in passes), 3)
            for k in passes[0]
        },
        "passes": passes,
        "jobs_per_pass": round((j1 - j0) / args.reps, 1),
        "stages_per_pass": round(len(new) / args.reps, 1),
        "tasks_per_pass": round(sum(s["numCompleteTasks"] for s in new) / args.reps, 1),
        "shuffle_write_mb_per_pass": round(
            sum(s["shuffleWriteBytes"] for s in new) / 1e6 / args.reps, 2
        ),
        "conf": args.conf,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
