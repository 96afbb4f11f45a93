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
    """EMA of event values per user (ema_i = 0.2*x_i + 0.8*ema_{i-1})."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def ema_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        out = []
        prev = None
        for v in pdf["value"].tolist():
            # same op order as the oracle's `alpha*x + beta*prev`
            prev = v if prev is None else ALPHA * v + BETA * prev
            out.append(prev)
        pdf = pdf.copy()
        pdf["ema"] = out
        return pdf

    return ev.groupBy("user_id").applyInPandas(
        ema_group, schema="user_id long, event_id long, value double, ema double"
    )
