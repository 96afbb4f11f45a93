"""Full-registry local correctness sweep -> CORRECTNESS_LOCAL.json.

The grading driver's CORRECTNESS artifact covers only the first 50 sorted
query names; everything >= q50 (the similarity/ANN and curation families)
is oracle-checked only by the local DuckDB twin. This script runs the SAME
comparison the driver runs (row count, sorted column names,
order-insensitive exact values) over the ENTIRE registry and writes a
machine-readable artifact at the repo root, so the q50+ verification is a
recorded fact rather than a claim.

Density-sensitive semantics (RANGE frames over fractional-second
timestamps, as-of tolerances, percentile boundaries) can pass at sf0.01
and diverge at sf0.1 — q36's floored-epoch bug did exactly that for seven
rounds.  `--sf /root/testdata/sf0.1 --out CORRECTNESS_SF01.json` runs the
same sweep at the density where those bugs can actually fail.

Run from the repo root:
    python tools/local_correctness.py                 # sf0.01 -> CORRECTNESS_LOCAL.json
    python tools/local_correctness.py --sf /root/testdata/sf0.1 --out CORRECTNESS_SF01.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_pos", nargs="?", default=None, help="sf dir (positional, legacy)")
    ap.add_argument("--sf", default=None, help="scale-factor data dir")
    ap.add_argument("--out", default="CORRECTNESS_LOCAL.json",
                    help="output artifact filename (repo root)")
    ap.add_argument("--cpus", type=int, default=8, help="local[N] cores")
    args = ap.parse_args()
    sf = args.sf or args.sf_pos or "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    # vanilla session on purpose: the driver supplies its own, so any
    # config the queries need must be self-installed by the entry wrappers
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as entry
    from tests.oracle_harness import compare_frames, duckdb_connect

    con = duckdb_connect(sf)
    oracles = entry.oracle_sql()
    results: dict[str, dict] = {}
    n_fail = 0
    for name, fn in sorted(entry.queries().items()):
        rec: dict = {
            "oracle": name in oracles,
            "rows": None,
            "pass": False,
            "err": None,
        }
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf).toPandas()
            rec["rows"] = int(len(sdf))
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                compare_frames(sdf, odf, name)  # raises on any mismatch
                rec["pass"] = True
            else:
                # rows-only check, mirroring the driver's weaker gate
                rec["pass"] = len(sdf.columns) > 0
        except Exception as ex:  # noqa: BLE001 — record and continue
            rec["err"] = f"{type(ex).__name__}: {ex}"[:500]
            n_fail += 1
        rec["sec"] = round(time.monotonic() - t0, 3)
        results[name] = rec
        tag = "OK " if rec["pass"] else "FAIL"
        kind = "oracle" if rec["oracle"] else "rows-only"
        print(f"{tag} {name} ({rec['rows']} rows, {kind}, {rec['sec']}s)", flush=True)

    out = {
        "sf_dir": sf,
        "n_queries": len(results),
        "n_oracle": sum(1 for r in results.values() if r["oracle"]),
        "n_pass": sum(1 for r in results.values() if r["pass"]),
        "total_sec": round(sum(r["sec"] for r in results.values()), 1),
        "queries": results,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\nwrote {path}: {out['n_pass']}/{out['n_queries']} pass "
          f"({out['n_oracle']} oracle-checked)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
