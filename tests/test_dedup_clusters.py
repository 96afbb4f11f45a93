"""q48 near-dup clustering over the REAL q41 LSH edge set (r3 verdict #3).

The fixture triple was chosen so the md5-banded LSH deterministically
surfaces the a~b and b~c candidate pairs (verified offline against the same
md5/minhash/band arithmetic both engines use) while a and c are neither
similar enough (Jaccard 0.556 < 0.6) nor band-colliding — the transitive
case only a clustering operator can collapse.
"""

from pyspark.sql import functions as F

from allora_indexer_spark.operators.dedup import (
    CLUSTER_THRESHOLD,
    connected_components,
    lsh_verified_pairs,
)

DOC_A = "the quick brown fox jumps over lazy dog"
DOC_B = "the quick brown fox jumps over lazy cat"  # ~A (0.75)
DOC_C = "a quick brown fox jumps over lazy cat"  # ~B (0.75), not ~A (0.556)
DOC_D = "completely unrelated text about spark physical plans"


def _docs(spark):
    return spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, DOC_C), (4, DOC_D)],
        "doc_id long, text string",
    )


def test_lsh_edges_form_transitive_chain(spark):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_verified_pairs(_docs(spark), CLUSTER_THRESHOLD).collect()
    }
    assert (1, 2) in pairs and (2, 3) in pairs
    assert (1, 3) not in pairs  # the chain is genuinely transitive


def test_chain_collapses_to_one_keeper(spark):
    docs = _docs(spark)
    pairs = lsh_verified_pairs(docs, CLUSTER_THRESHOLD).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = {
        r["doc_id"]: (r["component"], r["is_keeper"])
        for r in connected_components(docs.select("doc_id"), pairs).collect()
    }
    # a~b~c collapse to component 1 with a single keeper…
    assert comp[1] == (1, True)
    assert comp[2] == (1, False)
    assert comp[3] == (1, False)
    # …and the unrelated doc keeps itself
    assert comp[4] == (4, True)


def test_connected_components_warns_at_round_cap(spark, monkeypatch):
    """An adversarially long chain that cannot converge inside the round
    cap must raise a RuntimeWarning (under-merged output), never return
    silently — and convergent inputs must stay warning-free."""
    import warnings

    import pytest

    from allora_indexer_spark.operators import dedup

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src LONG, dst LONG"
    )
    vertices = spark.range(64).select(F.col("id").alias("doc_id"))
    monkeypatch.setattr(dedup, "CC_MAX_ROUNDS", 1)
    with pytest.warns(RuntimeWarning, match="still changing"):
        dedup.connected_components(vertices, chain)
    # at the real cap the same chain converges — and quietly
    monkeypatch.setattr(dedup, "CC_MAX_ROUNDS", 25)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = {
            r["doc_id"]: r["component"]
            for r in dedup.connected_components(vertices, chain).collect()
        }
    assert set(out.values()) == {0}


def test_canonical_selection_invariants(spark, sf_dir):
    """q99zzs (the dedup DECISION stage): every multi-member component
    emits exactly ONE keeper; the keeper carries the component's
    maximum quality score (lowest doc_id on ties); every emitted member
    agrees on (n_members, canonical_id); and the member set matches
    q48's multi-member components exactly."""
    from collections import defaultdict

    from allora_indexer_spark.operators.dedup import (
        q48_dedup_components,
        q99zzs_dedup_canonical_selection,
    )

    rows = q99zzs_dedup_canonical_selection(spark, sf_dir).collect()
    assert rows
    by_comp = defaultdict(list)
    for r in rows:
        by_comp[r["component"]].append(r)
    comp_sizes = defaultdict(set)
    for r in q48_dedup_components(spark, sf_dir).collect():
        comp_sizes[r["component"]].add(r["doc_id"])
    multi = {c: m for c, m in comp_sizes.items() if len(m) >= 2}
    assert set(by_comp) == set(multi)
    for c, members in by_comp.items():
        assert {r["doc_id"] for r in members} == multi[c]
        assert {r["n_members"] for r in members} == {len(multi[c])}
        keepers = [r for r in members if r["keep"]]
        assert len(keepers) == 1, c
        k = keepers[0]
        assert {r["canonical_id"] for r in members} == {k["doc_id"]}
        best = max(members, key=lambda r: (r["quality_score"], -r["doc_id"]))
        assert k["doc_id"] == best["doc_id"], c
