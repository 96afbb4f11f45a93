"""Tolerance gates for the sampled-boundary scale twins.

q99zj (deciles) and q99zk (quartile / percent rank) are EXACT against
their DuckDB oracles — the oracle pins the deterministic sampled-boundary
computation itself.  What the oracle cannot pin is the STATISTICAL claim:
that sampled boundaries assign (nearly) the same ranks as the exact
single-partition-sort forms they replace (q99c's NTILE, q49's window
suite).  These tests gate that claim per row at sf0.01, the same
exact↔approximate pattern as q53's recall gate against q51.

Thresholds are set from measured agreement with margin (measured at
sf0.01 / sf0.1: q99zj exact 0.716 / 0.857, within-one 1.0 / 1.0;
q99zk quartile 0.967 / 0.989, within-one 1.0 / 1.0, pct-rank MAE
0.033 / 0.024).  Boundary error shrinks as 1/sqrt(sample size), so the
gates get easier — never harder — as the corpus grows toward 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from allora_indexer_spark.operators.curation import (
    _ttr_per_doc,
    quality_decile_assignments_sampled,
)
from allora_indexer_spark.operators.relational import (
    analytic_rank_assignments_sampled,
)
from allora_indexer_spark.tables import load_table
from tests.conftest import SF_MEDIUM


def test_sampled_deciles_agree_with_exact_ntile(spark):
    sampled = quality_decile_assignments_sampled(spark, SF_MEDIUM).select(
        "doc_id", F.col("decile").alias("ds")
    )
    t = _ttr_per_doc(spark, SF_MEDIUM)
    exact = t.withColumn(
        "de", F.ntile(10).over(Window.orderBy("ttr", "doc_id"))
    ).select("doc_id", "de")
    j = sampled.join(exact, "doc_id")
    r = j.agg(
        F.count("*").alias("n"),
        F.avg((F.col("ds") == F.col("de")).cast("double")).alias("exact"),
        F.avg(
            (F.abs(F.col("ds") - F.col("de")) <= 1).cast("double")
        ).alias("within1"),
    ).collect()[0]
    # every doc must be assigned, exactly once
    assert r["n"] == t.count()
    assert r["exact"] >= 0.65, r
    assert r["within1"] >= 0.999, r


def test_sampled_ranks_agree_with_exact_windows(spark):
    sampled = analytic_rank_assignments_sampled(spark, SF_MEDIUM).select(
        "o_orderkey",
        F.col("price_quartile").alias("qs"),
        F.col("price_pct_rank_est").alias("ps"),
    )
    orders = load_table(spark, SF_MEDIUM, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    exact = orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("qe"),
        F.percent_rank().over(w).alias("pe"),
    )
    j = sampled.join(exact, "o_orderkey")
    r = j.agg(
        F.count("*").alias("n"),
        F.avg((F.col("qs") == F.col("qe")).cast("double")).alias("q_exact"),
        F.avg(
            (F.abs(F.col("qs") - F.col("qe")) <= 1).cast("double")
        ).alias("q_within1"),
        F.avg(F.abs(F.col("ps") - F.col("pe"))).alias("p_mae"),
        F.max(F.abs(F.col("ps") - F.col("pe"))).alias("p_maxae"),
    ).collect()[0]
    assert r["n"] == orders.count()
    assert r["q_exact"] >= 0.94, r
    assert r["q_within1"] >= 0.999, r
    # grid resolution is 1/20 = 0.05; sampling adds ~1/sqrt(n_s)
    assert r["p_mae"] <= 0.05, r
    assert r["p_maxae"] <= 0.12, r


def test_sampled_plans_have_no_per_row_global_sort(spark):
    """The point of the twins: no Window/Sort over the per-row grain.
    The ONLY unpartitioned window allowed is the cumulative count over
    the bounded value histogram — whose input has passed through a
    groupBy (HashAggregate), never the raw scan."""
    for df in (
        quality_decile_assignments_sampled(spark, SF_MEDIUM),
        analytic_rank_assignments_sampled(spark, SF_MEDIUM),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # windows exist (the histogram cum + in-bucket rank) but every
        # one must sit above an aggregate or a bucket-pruned join, never
        # directly above a full relation scan: assert no Window whose
        # immediate child chain is Scan without an intervening aggregate
        # or join.  Cheap structural proxy: count Window operators and
        # ensure an HashAggregate appears below the first one.
        assert "Window" in plan
        first_window = plan.index("Window")
        below = plan[first_window:]
        assert "HashAggregate" in below or "SortAggregate" in below, plan
