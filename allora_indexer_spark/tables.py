"""Loaders for the driver's synthetic test tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under an sf dir.

All loads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning; never cache here (callers decide).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # manifest-aware: a source that has been adopted into the warehouse
    # manifest layout (appends/compactions — e.g. a production embeddings
    # corpus) keeps its files under _versions/, which a plain parquet
    # read cannot see. read_dir probes the manifest once (driver-local
    # JSON read) and falls back to the plain parquet read — pushdown on
    # plain sources is untouched. The internal _kb bucket column of a
    # bucket-converted source must not leak into query-visible schemas
    # (same drop read_table does); drop() on plain sources is a no-op.
    from allora_indexer_spark.plans.warehouse import _BUCKET_COL, read_dir

    df = read_dir(spark, path).drop(_BUCKET_COL)
    # Parquet TIMESTAMP(NANOS) columns arrive as long nanos (see session.py);
    # truncate to micros exactly like DuckDB's scan does.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def widen_if_narrow(df: DataFrame, key: str | None = None) -> DataFrame:
    """Widen a scan to the session's default parallelism — ONLY when the
    scan yields fewer partitions than that (round 16).

    CPU-dense derivations (per-shingle md5 digests, per-token hashing)
    inherit the scan's split count, and a small input that arrives as a
    single parquet row group serializes the whole pass on one core
    (guide §2.5's "one huge unsplittable file → repartition immediately
    after the read"). The condition is DATA-derived: a production corpus
    whose scan already has >= parallelism splits returns unchanged, so
    no cluster-scale run ever pays the extra exchange — this is the
    conditional JVM-side twin of the codec stages' unconditional
    repartition (multimodal.py:1051). With ``key`` the exchange is a
    deterministic hash partitioning on that column; keyless falls back
    to round-robin (deterministic for deterministic input — Spark sorts
    before round-robin repartition, SPARK-23207)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key) if key else df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> None:
    """Register tables as temp views so spark.sql() can be used. Pass
    ``names`` to register only the tables a query references — the
    default all-tables sweep costs one parquet footer read per table and
    churns the session-global view namespace per invocation."""
    for t in names if names is not None else TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
