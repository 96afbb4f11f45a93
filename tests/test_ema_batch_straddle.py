"""Pin for q12's batch-streaming EMA (round 16): the carried-seed path.

The optimized q12 streams sorted Arrow batches through pandas grouped
ewm with O(batch) memory, carrying (user, ema) state across the one
group that can straddle a batch boundary. On the small fixtures a whole
partition fits one Arrow batch, so the straddle branch never fires in
the oracle sweeps — this test forces it by shrinking
``spark.sql.execution.arrow.maxRecordsPerBatch`` below the per-user row
count and asserts the EMA stays BIT-IDENTICAL to the single-batch run.
"""

from __future__ import annotations

from allora_indexer_spark.registry import all_queries


def _ema_map(spark, sf_dir):
    fn = all_queries()["q12_ema_scores"].fn
    rows = fn(spark, sf_dir).collect()
    return {(r["user_id"], r["event_id"]): r["ema"] for r in rows}


def test_straddling_groups_carry_exact_state(spark, sf_dir):
    base = _ema_map(spark, sf_dir)
    # events at sf0.001 average far more than 3 rows per user, so with
    # 3-row Arrow batches many users straddle batch boundaries and the
    # seeded-continuation branch runs for real
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "3")
        split = _ema_map(spark, sf_dir)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert split.keys() == base.keys()
    diffs = [k for k in base if split[k] != base[k]]
    assert not diffs, (
        f"{len(diffs)} EMA values changed under batch splitting, e.g. "
        f"{diffs[:3]}"
    )
