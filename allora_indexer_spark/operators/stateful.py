"""Stateful / UDF-surface operators (SURVEY.md §2.5 UDF row + ema_scores).

q12 models the reference's ema_scores table (K6, /root/reference/db.go:
1246-1350): an exponentially-weighted score per key updated at every height.
The Spark implementation is a grouped ``applyInPandas`` — the idiomatic
escape hatch for genuinely sequential per-key recurrences (Arrow-batched,
one pass per group, no Python in any other stage).

The DuckDB oracle runs the same recurrence as a recursive CTE. Both sides
compute ``alpha*x + beta*prev`` with the same operation order on IEEE
doubles, so results are bit-identical.

Scale: groups are per-user (per-topic-actor in the reference) — thousands of
independent small series; applyInPandas distributes them across executors
with one shuffle on the group key.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from allora_indexer_spark.registry import query
from allora_indexer_spark.tables import load_table

ALPHA = 0.2
BETA = 1.0 - ALPHA

_EMA_ORACLE = f"""
WITH RECURSIVE seq AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
),
ema AS (
  SELECT user_id, event_id, value, rn, value AS ema FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.value, s.rn,
         {ALPHA} * s.value + {BETA} * e.ema
  FROM ema e JOIN seq s ON s.user_id = e.user_id AND s.rn = e.rn + 1
)
SELECT user_id, event_id, value, ema FROM ema
"""


@query("q12_ema_scores", oracle=_EMA_ORACLE)
def q12_ema_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA of event values per user (ema_i = 0.2*x_i + 0.8*ema_{i-1}).

    Round-16 shape: ONE Python crossing per partition instead of one per
    user (guide §4.1/4.2). The old grouped ``applyInPandas`` paid the
    Arrow/pandas round-trip and a Python function call per GROUP —
    thousands of tiny frames; now the frame is hash-repartitioned on
    user_id (each user wholly inside one partition, same exchange the
    grouped form did) and SORTED by (user_id, event_id) in the JVM
    (spillable, unlike a pandas sort), and a single ``mapInPandas``
    stage streams the sorted Arrow batches through pandas' cython
    grouped-ewm, carrying the (user, ema) state across the one group
    that can straddle a batch boundary — seeded by prepending the
    carried ema as a synthetic first observation, which the
    adjust=False recurrence consumes exactly (ema_1 = alpha*x_1 +
    beta*seed, the identical operation), then dropping that row.
    Memory is O(arrow batch), never O(partition) — the shape that
    survives a 100 TB events table at any shuffle-partition setting.

    The recurrence, operation order and dtypes are unchanged:
    ewm(adjust=False) computes (beta*prev + alpha*x) / (beta + alpha);
    the products match the oracle's `alpha*x + beta*prev` term-for-term,
    IEEE addition is commutative, and beta + alpha rounds to exactly
    1.0, so the division is an identity — bit-identical to the recursive
    CTE (oracle-gated at both SFs; values are NaN-free by the F7 ingest
    guard, so ignore_na semantics never engage)."""
    from collections.abc import Iterator

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )

    def ema_partition(
        pdfs: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        prev_user = None
        prev_ema = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            seeded = (
                prev_user is not None
                and pdf["user_id"].iloc[0] == prev_user
            )
            if seeded:
                # continue the straddling group from its carried state:
                # the seed row IS ema_{i-1}; ewm then computes
                # alpha*x + beta*seed for the next row — the exact
                # recurrence step — and the seed row is dropped below
                work = pd.concat(
                    [
                        pd.DataFrame(
                            {
                                "user_id": pd.array(
                                    [prev_user], dtype=pdf["user_id"].dtype
                                ),
                                "event_id": pd.array(
                                    [-1], dtype=pdf["event_id"].dtype
                                ),
                                "value": pd.array(
                                    [prev_ema], dtype=pdf["value"].dtype
                                ),
                            }
                        ),
                        pdf,
                    ],
                    ignore_index=True,
                )
            else:
                work = pdf.reset_index(drop=True)
            ema = (
                work.groupby("user_id", sort=False)["value"]
                .ewm(alpha=ALPHA, adjust=False)
                .mean()
                .reset_index(level=0, drop=True)
            )
            work = work.assign(ema=ema)
            if seeded:
                work = work.iloc[1:]
            prev_user = work["user_id"].iloc[-1]
            prev_ema = work["ema"].iloc[-1]
            yield work

    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "event_id")
        .mapInPandas(
            ema_partition,
            schema="user_id long, event_id long, value double, ema double",
        )
    )


@query(
    "q58_pandas_grouped_agg_mad",
    oracle="""
    WITH m AS (
      SELECT event_type, median(value) AS median_value
      FROM events GROUP BY event_type
    )
    SELECT m.event_type, m.median_value,
           median(abs(e.value - m.median_value)) AS mad,
           COUNT(*) AS n_events
    FROM events e JOIN m ON e.event_type = m.event_type
    GROUP BY m.event_type, m.median_value
    """,
)
def q58_pandas_grouped_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type via a GROUPED_AGG pandas
    UDF — the Arrow-vectorized UDAF surface (one Arrow batch per group in,
    one scalar out), complementing q12's grouped-map applyInPandas. MAD is
    a robust spread statistic no Spark built-in provides in one step.

    Cross-engine exactness: median/abs/subtract are order-insensitive and
    correctly rounded, so numpy (Spark side) and DuckDB's quantile_cont
    agree bit-for-bit — same argument as q37. Scale: grouped-agg UDFs do a
    full shuffle of the group's values (unlike built-in partial aggs) —
    that is the documented price of arbitrary-percentile statistics, paid
    only on columns that need them."""
    import numpy as np

    # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg(), so all three statistics are pandas UDFs.
    @F.pandas_udf("double")
    def med_udf(v: pd.Series) -> float:
        return float(np.median(v))

    @F.pandas_udf("double")
    def mad(v: pd.Series) -> float:
        med = np.median(v)
        return float(np.median(np.abs(v - med)))

    @F.pandas_udf("long")
    def n_udf(v: pd.Series) -> int:
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        med_udf("value").alias("median_value"),
        mad("value").alias("mad"),
        n_udf("value").alias("n_events"),
    )
