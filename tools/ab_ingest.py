"""Ingest-fixture A/B: adjudicate the r6->r8 ingest drift (BENCH_r06
4.388 s -> BENCH_r08 6.27 s, +43%) with enough reps to beat the
container's scheduler noise (the per-round bench uses 3 reps; the drift
sat inside its 1.55 s IQR for two rounds).

Method: each SIDE (a git ref or a checkout dir) runs in its own fresh
JVM via the _child runner below — cwd + sys.path pinned to the checkout,
1 warmup + N measured passes of that checkout's own bench._run_ingest
(identical code on both sides: fixtures -> shared parse subplans -> the
23-table fan-out -> noop sinks; no warehouse writers are involved, so
append-path machinery is out of scope by construction). Sides alternate
A,B,A,B,... so slow machine drift cancels; run this under LOW LOAD (no
concurrent soak/pytest).

Usage:
  python tools/ab_ingest.py                # HEAD vs 5fc2369, 2x4 reps/side
  python tools/ab_ingest.py --ref <sha> --rounds 2 --reps 4

Prints one JSON line with per-side samples/median/IQR and a verdict:
"real regression" when the median delta exceeds both sides' IQRs,
"noise" otherwise.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import importlib.util, json, os, statistics, sys, tempfile
root, reps = sys.argv[1], int(sys.argv[2])
os.chdir(root)
sys.path.insert(0, root)
spec = importlib.util.spec_from_file_location("bench_mod", os.path.join(root, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
from allora_indexer_spark.session import get_spark
from allora_indexer_spark.sources.fixtures import write_fixtures
spark = get_spark(app_name="ab-ingest")
spark.sparkContext.setLogLevel("ERROR")
fx = tempfile.mkdtemp(prefix="ab_ingest_")
blocks_dir, results_dir = write_fixtures(fx)
bench._run_ingest(spark, blocks_dir, results_dir)  # warmup, not counted
out = [bench._run_ingest(spark, blocks_dir, results_dir) for _ in range(reps)]
print("ABRESULT " + json.dumps(out), flush=True)
"""


def run_side(root: str, reps: int) -> list[float]:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fh:
        fh.write(_CHILD)
        child = fh.name
    try:
        proc = subprocess.run(
            [sys.executable, child, root, str(reps)],
            capture_output=True,
            text=True,
            timeout=1200,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("ABRESULT "):
                return json.loads(line[len("ABRESULT "):])
        raise RuntimeError(
            f"side {root} produced no result:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
    finally:
        os.unlink(child)


def iqr(xs: list[float]) -> float:
    if len(xs) >= 4:
        q = statistics.quantiles(xs, n=4)
        return q[2] - q[0]
    return max(xs) - min(xs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="5fc2369")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    wt = tempfile.mkdtemp(prefix="ab_wt_")
    os.rmdir(wt)
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, args.ref],
        check=True,
        capture_output=True,
    )
    try:
        head_s: list[float] = []
        ref_s: list[float] = []
        for _ in range(args.rounds):  # alternate so machine drift cancels
            head_s += run_side(REPO, args.reps)
            ref_s += run_side(wt, args.reps)
        h_med, r_med = statistics.median(head_s), statistics.median(ref_s)
        h_iqr, r_iqr = iqr(head_s), iqr(ref_s)
        delta = h_med - r_med
        real = abs(delta) > max(h_iqr, r_iqr)
        print(
            json.dumps(
                {
                    "head": {
                        "median": round(h_med, 3),
                        "iqr": round(h_iqr, 3),
                        "samples": [round(x, 3) for x in head_s],
                    },
                    args.ref: {
                        "median": round(r_med, 3),
                        "iqr": round(r_iqr, 3),
                        "samples": [round(x, 3) for x in ref_s],
                    },
                    "delta_sec": round(delta, 3),
                    "delta_pct": round(100.0 * delta / r_med, 1),
                    "verdict": (
                        "real regression" if (real and delta > 0)
                        else "real improvement" if real
                        else "noise (delta inside IQR)"
                    ),
                }
            )
        )
        return 0
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )


if __name__ == "__main__":
    sys.exit(main())
