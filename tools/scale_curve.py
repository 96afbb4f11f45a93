#!/usr/bin/env python
"""Weak-scaling curve: run representative queries at every provided scale
factor (sf0.001 / sf0.01 / sf0.1 — 100x row spread) and report how runtime
grows with data.

The diagnostic is the INCREMENTAL RATIO

    incr_ratio = (t(sf0.1) - t(sf0.01)) / (t(sf0.01) - t(sf0.001))

which cancels the fixed per-query overhead (session, planning, codegen,
stage scheduling) that dominates small-SF wall clock. Pure linear-in-data
execution gives ~10 (the SF step is 10x); a quadratic operator would show
~100 on the top step; numbers well under 10 mean the query is still
overhead-bound even at sf0.1. Negative/zero denominators (both small SFs
inside noise) are reported as null.

Medians of $SPARK_GRAFT_BENCH_REPS (default 3) noop-sink runs per point,
same measurement discipline as bench.py. Writes $SPARK_GRAFT_SCALE_OUT
(default SCALE.json) and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from allora_indexer_spark.registry import all_queries
from allora_indexer_spark.session import get_spark

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
OUT = os.environ.get("SPARK_GRAFT_SCALE_OUT", "SCALE.json")

# one representative per plan family (scan-agg, shuffle join, window,
# LSH self-join, gram census join-back, winnowed window+join, BNL knn,
# sessionization, bucket-offset rank, persisted DPP-pruned index probe)
QUERIES = [
    "q01_pricing_summary",
    "q08_left_join_order_counts",
    "q10_running_user_value",
    "q41_minhash_lsh_dedup",
    "q97_duplicated_span_stats",
    "q99zr_winnowing_fingerprints",
    "q51_knn_bruteforce",
    "q98_sessionization",
    "q99zq_global_shuffle_batches",
    # the persisted IVF index probe: first rep pays the one-time build
    # (session-cached), later reps measure the query-many path — the
    # shape whose scan cost should grow with nprobe/n_cells of the
    # corpus, not the corpus
    "q99zu_ivf_index_topk",
    # SemDeDup both ways (round 14: BOTH registered forms are bounded —
    # q99zw rides n_cells="auto", q99zx the per-cell adaptive cap; the
    # unbounded label-Voronoi plan whose hot curve r13 measured is now
    # reachable only as semdedup(n_cells=None)). Both rows should carry
    # the flat(ish) bounded-cell signature.
    "q99zw_semdedup_embedding_dedup",
    "q99zx_semdedup_cells",
    # the production cell source: SemDeDup over the persisted IVF
    # quantizer's cells (first rep pays the session-cached index build,
    # like q99zu; later reps measure the partition-pruned pair join)
    "q99zy_semdedup_ivf",
    # the composed IVFPQ path — the heaviest plan in the registry
    # (PLANS.md: 7 scans / 9 exchanges / 8 windows): its scale signature
    # is the codes table (~64x smaller than the corpus) doing the probe
    # work with a shortlist-bounded exact rerank, so the curve should be
    # as flat as q99zu's despite the plan size
    "q99zv_ivfpq_index_topk",
    # the per-modality hash-dedup family: the image dHash pair join is
    # the banded-equi-join shape (multi-index hashing), the JPEG
    # roundtrip is the Python codec stage — both should scale linearly
    # in docs with no quadratic tail.
    "q99zzd_image_near_dup_pairs",
    "q99zza_jpeg_decode",
    # round 15: the wide (128-bit/4x32) dial configuration q99zzd
    # switches to past the planner threshold — same banded cost model,
    # twice the hash expressions; the progressive JPEG codec stage
    # (~15 scans/image, the heaviest Python decode); the DSIR KL
    # acceptance check (q99zz's stages + O(buckets) tails).
    "q99zzg_image_near_dup_pairs_wide",
    "q99zzf_jpeg_progressive_decode",
    "q99zzi_dsir_kl_validation",
    # round 16: the REAL decode→pool→hash→pair composition (the heaviest
    # codec stage feeding a banded join — one decode per doc+twin, then
    # the q99zzd cost model); the past-cap combination-key join (10
    # string indexes per item instead of 4 words); the skewed-target KL
    # check (q99zzo — dsir_kl_check's generic two-model path).
    "q99zzk_image_raster_near_dup_pairs",
    "q99zzn_image_near_dup_pairs_combo_planted",
    "q99zzo_dsir_kl_skewed_target",
    # round 16: the Y4M video family — container decode (codec-bound
    # map-only), keyframe dHash (same stage + bounded fan-out), and the
    # temporally-aligned banded pair join (q99zzd's cost model with
    # frame_idx sharpening the buckets).
    "q99zzp_y4m_video_decode",
    "q99zzq_video_frame_dhash",
    "q99zzr_video_near_dup_pairs",
    # round 16: the dedup decision stage (CC + quality argmax — the CC
    # loop dominates; selection is one component-key window shuffle).
    "q99zzs_dedup_canonical_selection",
    # round 16: the mixed-corpus sniff-dispatch decode (all five codecs
    # live behind a per-row magic-byte switch; map-only, codec-bound).
    "q99zzt_multimodal_sniff_decode",
    # round 16: shot-boundary detection (codec stage + one video-id
    # window shuffle; per-video partition bounded by clip length).
    "q99zzu_video_scene_cuts",
]


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="scale-curve",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = all_queries()
    # warm the JVM/codegen paths once per query at the smallest SF so the
    # first measured point is not paying one-off initialization
    for name in QUERIES:
        _noop(qs[name].fn(spark, f"{ROOT}/{SFS[0]}"))

    results: dict[str, dict] = {}
    for name in QUERIES:
        row: dict = {}
        for sf in SFS:
            times = []
            for _ in range(REPS):
                t0 = time.time()
                _noop(qs[name].fn(spark, f"{ROOT}/{sf}"))
                times.append(time.time() - t0)
            row[sf] = round(statistics.median(times), 4)
        d_small = row[SFS[1]] - row[SFS[0]]
        d_big = row[SFS[2]] - row[SFS[1]]
        # delta_top: absolute marginal cost of the last 10x of data — the
        # meaningful number even when the small-SF step is inside noise
        row["delta_top"] = round(d_big, 4)
        # the ratio needs a denominator comfortably above container noise
        # (~50 ms) or it amplifies jitter into fake super-linearity
        row["incr_ratio"] = (
            round(d_big / d_small, 2) if d_small > 0.05 else None
        )
        results[name] = row
        print(f"{name}: {row}", file=sys.stderr)

    report = {
        "metric": "scale_curve_incremental_ratio",
        "sfs": SFS,
        "reps": REPS,
        "linear_reference": 10.0,
        "queries": results,
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
