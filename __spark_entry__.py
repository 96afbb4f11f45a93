"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``allora_indexer_spark``; this module only adapts the
registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from allora_indexer_spark.registry import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "q02_revenue_by_nation"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    # The driver supplies its own SparkSession, which may not carry our
    # session defaults — pin the ones correctness depends on.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    return all_queries()[_FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark 4 defaults ANSI on: null-on-failure casts and missing
        # map keys are part of the determinism contract (session.py pins
        # the same), so a driver-supplied default session must not run
        # the registry in ANSI mode
        spark.conf.set("spark.sql.ansi.enabled", "false")
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(q.fn) for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-able query."""
    return {
        name: q.oracle for name, q in sorted(all_queries().items()) if q.oracle
    }
