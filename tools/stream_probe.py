"""One-trigger decomposition of the streaming block-ingest sink: per-batch
trigger latencies from the query's own progress events plus the REST job
count across the stream — the adjudicator for stream_batch_p50 work.

Usage: python tools/stream_probe.py [--conf k=v ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base, path):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    from allora_indexer_spark.session import get_spark
    from allora_indexer_spark.sources.fixtures import build_blocks
    from allora_indexer_spark.streaming import stream as stream_mod

    extra = {"spark.ui.enabled": "true"}
    for kv in args.conf:
        k, v = kv.split("=", 1)
        extra[k] = v
    spark = get_spark(app_name="stream-probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    sdir = tempfile.mkdtemp(prefix="probe_stream_")
    feed = os.path.join(sdir, "blocks")
    os.makedirs(feed)
    for i, b in enumerate(build_blocks()):
        with open(os.path.join(feed, f"part-{i:03d}.jsonl"), "w") as f:
            f.write(json.dumps(b) + "\n")

    j0 = len(_rest(base, f"/api/v1/applications/{app_id}/jobs"))
    q = stream_mod.start_block_ingest(
        spark,
        feed,
        os.path.join(sdir, "wh"),
        os.path.join(sdir, "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(600)
    j1 = len(_rest(base, f"/api/v1/applications/{app_id}/jobs"))
    lat = sorted(
        float(p["durationMs"]["triggerExecution"])
        for p in q.recentProgress
        if p["numInputRows"] > 0
    )
    out = {
        "batches": len(lat),
        "p50_ms": lat[len(lat) // 2] if lat else None,
        "all_ms": lat,
        "jobs_total": j1 - j0,
        "jobs_per_batch": round((j1 - j0) / max(len(lat), 1), 1),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "conf": args.conf,
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
