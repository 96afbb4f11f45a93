"""q99zz DSIR semantics the exact-value gate can't express: importance
resampling must ENRICH target-distribution documents, and the Gumbel
noise must actually mix the draw (not reduce to a deterministic argmax
of the weights)."""

from __future__ import annotations

from pyspark.sql import functions as F

from allora_indexer_spark.operators.curation import (
    DSIR_TARGET_SOURCES,
    DSIR_TOP_K,
)
from allora_indexer_spark.registry import all_queries
from allora_indexer_spark.tables import load_table


def test_dsir_enriches_target_sources(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    base = docs.filter(
        F.col("source").isin(*DSIR_TARGET_SOURCES)
    ).count() / docs.count()
    sel = (
        all_queries()["q99zz_dsir_importance_sampling"]
        .fn(spark, sf_dir)
        .join(docs, "doc_id")
    )
    n = sel.count()
    assert n == DSIR_TOP_K
    hit = sel.filter(F.col("source").isin(*DSIR_TARGET_SOURCES)).count() / n
    # the fixture's sources share a vocabulary, so enrichment is mild but
    # must be directionally present: selected docs skew toward the target
    assert hit > base, (hit, base)


def test_dsir_gumbel_mixes_the_draw(spark, sf_dir):
    out = (
        all_queries()["q99zz_dsir_importance_sampling"]
        .fn(spark, sf_dir)
        .toPandas()
    )
    # ranking by gumbel_score must differ from ranking by raw weight —
    # if they coincide the noise term silently vanished
    by_score = list(out.sort_values("gumbel_score", ascending=False).doc_id)
    by_weight = list(out.sort_values("log_weight", ascending=False).doc_id)
    assert by_score != by_weight
    # and the noise is bounded enough that weights still matter: the
    # selected set's mean log-weight beats the corpus mean (weights are
    # centered near 0 by construction of the log-ratio)
    assert out["log_weight"].mean() > -0.5


def test_dsir_kl_validation_improves_toward_target(spark, sf_dir):
    """The paper's acceptance check as a query (q99zzi, round-14 verdict
    item 6): against the statistically fair control — a hash-random
    subset of the SAME size K — the selected subset's hashed-token
    distribution must be strictly closer to the target where the target
    carries signal (the conftest SF), and all three divergences must be
    non-negative finite (Laplace smoothing guarantees support)."""
    out = (
        all_queries()["q99zzi_dsir_kl_validation"]
        .fn(spark, sf_dir)
        .toPandas()
    )
    assert len(out) == 1
    row = out.iloc[0]
    assert bool(row["improved"])
    assert 0.0 <= row["kl_selected"] < row["kl_random"] < 10.0
    assert 0.0 <= row["kl_corpus"] < 10.0


def test_dsir_kl_validation_is_a_diagnostic_not_a_rubber_stamp():
    """The per-SF truth of the acceptance check, pinned through the
    DuckDB oracle (fast — no Spark session per SF): at sf0.001/sf0.01
    the source-family target is distinguishable and selection improves
    on the random-K control; at sf0.1 the synthetic corpus converges to
    its own marginal (KL(corpus||target) < 1e-3), the weights chase
    estimation noise, and the check CORRECTLY reports improved=False.
    A validation query that could not return False would be a rubber
    stamp — this pins that it can, on real data."""
    import __spark_entry__ as entry

    from tests.oracle_harness import duckdb_connect

    sql = entry.oracle_sql()["q99zzi_dsir_kl_validation"]
    expected = {"sf0.001": True, "sf0.01": True, "sf0.1": False}
    for sf, want in expected.items():
        con = duckdb_connect(f"/root/testdata/{sf}")
        row = con.execute(sql).df().iloc[0]
        assert bool(row["improved"]) is want, (sf, dict(row))
        if not want:  # the no-signal regime: corpus already on-target
            assert row["kl_corpus"] < 1e-3
