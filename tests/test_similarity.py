"""Quality gates for the approximate similarity operators that have no SQL
oracle: ANN recall@k vs the exact brute-force baseline."""

from __future__ import annotations

from allora_indexer_spark.registry import all_queries


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    qs = all_queries()
    exact = (
        qs["q51_knn_bruteforce"].fn(spark, sf_dir).toPandas()
    )
    approx = qs["q53_ann_lsh"].fn(spark, sf_dir).toPandas()
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(truth & got) / len(truth))
    mean_recall = sum(recalls) / len(recalls)
    # threshold=inf makes the approx join exhaustive within hash-table unions;
    # with 4 tables recall should be high but bucketing may drop a few.
    assert mean_recall >= 0.6, f"ANN recall@5 too low: {mean_recall} ({recalls})"


def test_simhash_is_stable_fingerprint(spark, sf_dir):
    qs = all_queries()
    a = qs["q42_simhash"].fn(spark, sf_dir).toPandas().set_index("doc_id")["simhash"]
    b = qs["q42_simhash"].fn(spark, sf_dir).toPandas().set_index("doc_id")["simhash"]
    assert (a.sort_index() == b.sort_index()).all()
    # 32-bit range
    assert a.between(0, 2**32 - 1).all()


def test_ann_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF probing is lossy only when a true neighbor lives in an
    unprobed cell; with N_PROBE=3 of 8 cells recall must stay useful."""
    qs = all_queries()
    exact = qs["q51_knn_bruteforce"].fn(spark, sf_dir).toPandas()
    approx = qs["q53b_ann_ivf"].fn(spark, sf_dir).toPandas()
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(truth & got) / len(truth))
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"IVF recall@5 too low: {mean_recall} ({recalls})"
