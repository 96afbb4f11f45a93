"""Local twin of the driver's DuckDB-oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and order-insensitive
exact values (the driver hashes values; we diff them so failures are
debuggable).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from allora_indexer_spark.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # normalize timestamps to naive UTC for comparison
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} (spark) != {len(oracle_df)} (oracle)"
    )
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(oracle_df.columns)}"
    )
    s = _canon(spark_df)
    o = _canon(oracle_df)
    mismatches = []
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _values_equal(a, b):
                mismatches.append((col, i, a, b))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"{name}: value mismatches (col,row,spark,oracle): {mismatches}"
