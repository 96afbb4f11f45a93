"""Every registered query with an oracle must hash-match DuckDB (the local
twin of the driver's t2 gate); oracle-less queries must at least run and
return a stable schema."""

from __future__ import annotations

import pytest

from allora_indexer_spark.registry import all_queries
from tests.oracle_harness import compare_frames, duckdb_connect

QUERIES = all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf.columns) > 0
        return
    odf = duck.execute(q.oracle).df()
    compare_frames(sdf, odf, name)
