"""SemDeDup (q99zw / q99zx) invariants the DuckDB value-hash gate can't see:

- BOTH registered forms' removed sets are SUBSETS of the unbounded
  label-Voronoi baseline's (``semdedup(n_cells=None)`` — an engine knob,
  deliberately not a registered query since SCALE_r13 measured it
  super-linear): sub-splitting only ever drops comparisons, and the
  per-pair keep rule is unchanged;
- the hash-mod sub-split is DETERMINISTIC and window-free: the md5 bucket
  recomputed row-by-row in Python matches Spark's assignment exactly, and
  the optimized plan's only window partitions by vec_id (argmin over the
  L candidate centroids — a bounded partition), never by the
  corpus-proportional Voronoi label (the round-13 round-robin split's
  row_number window, removed in round 14);
- the per-cell cap form (q99zx) is skew-robust where the global-k form
  (q99zw) is not: a label holding most of the corpus gets
  ceil(|cell|/TARGET) sub-cells of its own;
- the production regime (tau=0.95, dense planted duplicate clusters) on an
  engineered fixture: every planted near-duplicate is removed except the
  member farthest from its centroid (the paper's keep-least-prototypical
  rule), and no background vector is touched;
- QUANTIFIED recall of every bounded form against the exact baseline on a
  fixture with many planted cliques at two taus (the number the round-13
  verdict asked for — like q99zb's pinned LSH recall floor).

The committed driver fixtures carry no engineered embedding dups (q99zw
runs the documented fixture threshold 0.3), so the planted-corpus tests
are the only coverage of the regime SemDeDup actually ships at.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

from allora_indexer_spark.operators.similarity import (
    SEMDEDUP_CELL_TARGET,
    _capped_assignment,
    _nearest_centroid_assignment,
    _refined_assignment,
    _semdedup_k,
    semdedup,
)
from allora_indexer_spark.registry import all_queries
from allora_indexer_spark.tables import load_table


def _md5_hex32(key) -> int:
    """Python twin of hashutil's cross-engine md5 hex32 idiom."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


def test_registered_forms_removed_sets_subset_of_exact(spark, sf_dir):
    exact = {
        r.vec_id
        for r in semdedup(spark, sf_dir, n_cells=None).collect()
    }
    assert exact, "fixture threshold should produce a non-trivial removed set"
    for name in ("q99zw_semdedup_embedding_dedup", "q99zx_semdedup_cells"):
        got = {r.vec_id for r in all_queries()[name].fn(spark, sf_dir).collect()}
        assert got <= exact, name
    # and with a FORCED k > 1 (sf0.001 derives k=1, where refined == exact)
    # the subset is proper on this fixture
    forced = {
        r.vec_id
        for r in semdedup(spark, sf_dir, n_cells=30).collect()
    }
    assert forced <= exact
    assert forced < exact, "k=3 split should drop at least one cross-bucket pair"


def test_hashmod_split_deterministic_and_matches_python(spark, sf_dir):
    # force k > 1 regardless of corpus size by asking for many cells
    emb = load_table(spark, sf_dir, "embeddings")
    n_labels = emb.select("label").distinct().count()
    refined, k = _refined_assignment(spark, sf_dir, n_cells=n_labels * 3)
    assert k == 3
    got = refined.toPandas().set_index("vec_id")["cell"]
    assigned = _nearest_centroid_assignment(spark, sf_dir).toPandas()
    for _, row in assigned.iterrows():
        expect = int(row["c_label"]) * k + _md5_hex32(int(row["vec_id"])) % k
        assert int(got[row["vec_id"]]) == expect
    # the split actually happened: more cells than labels
    assert got.nunique() > n_labels


def test_capped_split_deterministic_and_per_cell_bounded(spark, sf_dir):
    capped = _capped_assignment(spark, sf_dir).toPandas().set_index("vec_id")
    assigned = _nearest_centroid_assignment(spark, sf_dir).toPandas()
    cnt = assigned.groupby("c_label").size()
    t = SEMDEDUP_CELL_TARGET
    stride = 1 << 32
    for _, row in assigned.iterrows():
        kc = -(-int(cnt[row["c_label"]]) // t)  # ceil
        expect = int(row["c_label"]) * stride + _md5_hex32(int(row["vec_id"])) % kc
        assert int(capped.loc[row["vec_id"], "cell"]) == expect
    # per-parent sub-cell count is exactly ceil(|cell|/TARGET)
    capped = capped.reset_index()
    capped["parent"] = capped["cell"] // stride
    for parent, grp in capped.groupby("parent"):
        kc = -(-int(cnt[parent]) // t)
        assert grp["cell"].nunique() <= kc
        # expected size TARGET: no sub-cell should exceed its parent size
        assert grp.groupby("cell").size().max() <= int(cnt[parent])


def test_refined_plans_have_no_label_partitioned_window(spark, sf_dir):
    """Round-14 contract: the sub-split is a per-row projection. The only
    window anywhere in the SemDeDup assignment plans partitions by vec_id
    (the argmin over L candidate centroids — partition size == label
    count, a constant), never by the Voronoi label whose partitions grow
    linearly with the corpus.

    Round 16: _capped_assignment lazily checkpoints the shared
    assignment, which hides that subtree behind a LogicalRDD in its
    outer plan — so the argmin window is asserted on the shared
    producer (_nearest_centroid_assignment), and the refined/capped
    outer plans are asserted to add no NEW non-vec_id window."""
    producer = _nearest_centroid_assignment(spark, sf_dir)
    pplan = producer._jdf.queryExecution().optimizedPlan().toString()
    keys = re.findall(r"windowspecdefinition\((\w+)", pplan)
    assert keys, "argmin window should be present"
    assert all(k.startswith("vec_id") for k in keys), keys
    refined, _ = _refined_assignment(spark, sf_dir, n_cells="auto")
    capped = _capped_assignment(spark, sf_dir)
    for df in (refined, capped):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        keys = re.findall(r"windowspecdefinition\((\w+)", plan)
        assert all(k.startswith("vec_id") for k in keys), keys


def test_auto_k_derivation_matches_oracle_identity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_labels = emb.select("label").distinct().count()
    k = _semdedup_k(emb, "auto")
    # the SQL oracle's single-division form
    c = SEMDEDUP_CELL_TARGET
    assert k == max(1, (n + c * n_labels - 1) // (c * n_labels))


def _write_embeddings(spark, d, rows):
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))


@pytest.fixture(scope="module")
def skewed_dir(spark, tmp_path_factory):
    """One heavy label (320 members) beside three light ones (40 each):
    the regime where a GLOBAL k derived from the corpus average
    under-splits the heavy cell but the per-cell cap does not."""
    rng = np.random.RandomState(11)
    dim = 16
    label_dirs = rng.normal(size=(4, dim))
    label_dirs /= np.linalg.norm(label_dirs, axis=1, keepdims=True)
    rows, vec_id = [], 0
    for lab, size in ((0, 320), (1, 40), (2, 40), (3, 40)):
        for _ in range(size):
            v = label_dirs[lab] * 3.0 + rng.normal(scale=0.8, size=dim)
            rows.append((vec_id, v.astype(np.float32).tolist(), lab))
            vec_id += 1
    d = tmp_path_factory.mktemp("semdedup_skew")
    _write_embeddings(spark, d, rows)
    return str(d)


def test_cap_form_is_skew_robust_where_global_k_is_not(spark, skewed_dir):
    # N=440, L=4 -> global k = ceil(440/256) = 2: the heavy label's
    # sub-cells average 160 members, 2.5x the target
    refined, k = _refined_assignment(spark, skewed_dir, n_cells="auto")
    assert k == 2
    sizes = refined.toPandas().groupby("cell").size()
    heavy_global = sizes.max()
    assert heavy_global > SEMDEDUP_CELL_TARGET * 2  # measurably over target
    # the cap form gives the heavy label ceil(320/64) = 5 buckets of its
    # own -> every sub-cell lands near the target
    capped = _capped_assignment(spark, skewed_dir).toPandas()
    stride = 1 << 32
    heavy = capped[capped["cell"] // stride == 0]
    assert heavy["cell"].nunique() == 5
    assert heavy.groupby("cell").size().max() <= 2 * SEMDEDUP_CELL_TARGET


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """An sf_dir whose embeddings table carries engineered near-duplicate
    clusters: 3 planted groups of eps-perturbed copies (pairwise cosine
    > 0.999) on top of a background of well-separated random unit
    vectors (64-dim random pairs concentrate near cosine 0 — far below
    tau=0.95). Labels place each planted group in one Voronoi cell."""
    rng = np.random.RandomState(7)
    dim, n_labels, bg_per_label = 64, 4, 30
    rows = []
    vec_id = 0
    # distinct label directions keep Voronoi assignment stable
    label_dirs = rng.normal(size=(n_labels, dim))
    label_dirs /= np.linalg.norm(label_dirs, axis=1, keepdims=True)
    for lab in range(n_labels):
        for _ in range(bg_per_label):
            v = label_dirs[lab] * 3.0 + rng.normal(scale=0.8, size=dim)
            rows.append((vec_id, v.astype(np.float32).tolist(), lab))
            vec_id += 1
    planted = {}
    for lab, size in ((0, 3), (1, 4), (2, 2)):
        base = label_dirs[lab] * 3.0 + rng.normal(scale=0.8, size=dim)
        ids = []
        for _ in range(size):
            v = base + rng.normal(scale=1e-3, size=dim)  # eps-perturbed copy
            rows.append((vec_id, v.astype(np.float32).tolist(), lab))
            ids.append(vec_id)
            vec_id += 1
        planted[lab] = ids
    d = tmp_path_factory.mktemp("semdedup_fixture")
    _write_embeddings(spark, d, rows)
    return str(d), planted


def test_planted_dups_removed_at_production_tau(spark, planted_dir):
    sf_dir, planted = planted_dir
    # 129 vectors, 4 labels -> auto keeps k=1, so the registered default
    # IS the exact form on this corpus
    out = semdedup(spark, sf_dir, tau=0.95).toPandas()
    removed = set(out["vec_id"])
    all_planted = {i for ids in planted.values() for i in ids}
    # nothing outside the planted clusters crosses tau=0.95
    assert removed <= all_planted
    # each cluster keeps exactly ONE member: the farthest-from-centroid
    # (max d2) survivor of the clique
    assigned = (
        _nearest_centroid_assignment(spark, sf_dir)
        .toPandas()
        .set_index("vec_id")
    )
    for ids in planted.values():
        group = assigned.loc[ids]
        # the whole clique must share a cell, else the test is vacuous
        assert group["c_label"].nunique() == 1
        keeper = group["d2"].astype(float).idxmax()
        assert set(ids) - removed == {keeper}
    # clique accounting: an n-clique removes n-1 members, and the removed
    # row's n_dup_partners counts its within-clique losses
    assert len(removed) == sum(len(ids) - 1 for ids in planted.values())
    assert (out["max_cosine"] >= 0.95).all()


def test_planted_corpus_clean_below_tau(spark, planted_dir):
    sf_dir, planted = planted_dir
    # background-only check: at tau=0.95 with the planted ids excluded the
    # corpus is duplicate-free, so a run on the full corpus removes ONLY
    # planted members (asserted above); the CAP form on this corpus keeps
    # kc=1 everywhere (~33 members/label under the 64 target) and still
    # catches every planted pair
    out = semdedup(spark, sf_dir, tau=0.95, n_cells="cap").toPandas()
    all_planted = {i for ids in planted.values() for i in ids}
    assert set(out["vec_id"]) <= all_planted
    assert len(out) == sum(len(ids) - 1 for ids in planted.values())


def test_semdedup_ivf_planted_cliques(spark, planted_dir, tmp_path):
    """The production cell source (trained IVF quantizer) on the planted
    corpus: eps-perturbed clique members are near-identical vectors, so
    any sane quantizer co-locates each clique in one cell — every clique
    then loses exactly n-1 members, the background is untouched, and the
    survivor is its clique's farthest-from-centroid member (the same
    keep rule as the exact form, under the IVF centroid)."""
    from allora_indexer_spark.operators.ann_index import (
        build_ivf_index,
        semdedup_ivf,
    )

    sf_dir, planted = planted_dir
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_sd")
    build_ivf_index(spark, emb, idx, n_cells=4)
    out = semdedup_ivf(spark, idx, tau=0.95).toPandas()
    removed = set(out["vec_id"])
    all_planted = {i for ids in planted.values() for i in ids}
    assert removed <= all_planted
    assert len(removed) == sum(len(ids) - 1 for ids in planted.values())
    assert (out["max_cosine"] >= 0.95).all()


# ---------------------------------------------------------------------------
# Quantified recall of the bounded forms vs the exact baseline
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def recall_dir(spark, tmp_path_factory):
    """A HARDER fixture than planted_dir: large enough that auto derives
    k=3 (so bounded forms genuinely drop cross-bucket pairs), with MANY
    planted cliques at two tightness levels — eps=1e-3 copies (pairwise
    cosine > 0.999, dups at every tau) and eps=0.3 perturbations
    (pairwise
    cosine ~0.85-0.95, partially over tau=0.9, never over tau=0.97) — so recall is measured where it can actually be < 1."""
    rng = np.random.RandomState(23)
    # dim MUST be 64: the cosine verifier unrolls similarity.DIM terms
    dim, n_labels, bg_per_label = 64, 4, 150
    rows, vec_id = [], 0
    label_dirs = rng.normal(size=(n_labels, dim))
    label_dirs /= np.linalg.norm(label_dirs, axis=1, keepdims=True)
    for lab in range(n_labels):
        for _ in range(bg_per_label):
            v = label_dirs[lab] * 3.0 + rng.normal(scale=0.8, size=dim)
            rows.append((vec_id, v.astype(np.float32).tolist(), lab))
            vec_id += 1
    for i in range(24):  # 24 cliques of size 4, alternating tightness
        lab = i % n_labels
        eps = 1e-3 if i % 2 == 0 else 0.3
        base = label_dirs[lab] * 3.0 + rng.normal(scale=0.8, size=dim)
        for _ in range(4):
            v = base + rng.normal(scale=eps, size=dim)
            rows.append((vec_id, v.astype(np.float32).tolist(), lab))
            vec_id += 1
    d = tmp_path_factory.mktemp("semdedup_recall")
    _write_embeddings(spark, d, rows)
    return str(d)


def test_bounded_forms_recall_floor_vs_exact(spark, recall_dir, tmp_path):
    """The quantitative gate the rows-only q99zy check lacked: removed-set
    recall of each bounded form against the exact unbounded baseline, on
    a corpus where the bounded forms actually drop pairs (auto k=3).

    Expected recall for the hash-split forms: a clique of n members
    spread over k buckets keeps one survivor PER NON-EMPTY BUCKET, so it
    removes n - b of the exact form's n - 1 — with n=4, k=3 that is
    ~0.56 in expectation per clique. The pinned floors are deliberately
    a step below the deterministic observed values (md5 is fixed, so
    these numbers are stable, not flaky). The IVF form's cells are
    SEMANTIC (trained k-means), so cliques co-locate and its recall
    should beat the hash-split forms — that ordering is the real
    assertion."""
    from allora_indexer_spark.operators.ann_index import (
        build_ivf_index,
        semdedup_ivf,
    )

    emb = load_table(spark, recall_dir, "embeddings")
    n = emb.count()
    idx = str(tmp_path / "ivf_recall")
    build_ivf_index(spark, emb, idx, n_cells=-(-n // SEMDEDUP_CELL_TARGET))

    floors = {"auto": 0.40, "cap": 0.40, "ivf": 0.80}
    for tau in (0.9, 0.97):
        exact = {r.vec_id for r in semdedup(spark, recall_dir, tau=tau,
                                            n_cells=None).collect()}
        assert len(exact) >= 30, "fixture must plant a rich removed set"
        got = {
            "auto": {r.vec_id for r in semdedup(spark, recall_dir,
                                                tau=tau).collect()},
            "cap": {r.vec_id for r in semdedup(spark, recall_dir, tau=tau,
                                               n_cells="cap").collect()},
            "ivf": {r.vec_id for r in semdedup_ivf(spark, idx,
                                                   tau=tau).collect()},
        }
        recalls = {}
        for form, removed in got.items():
            # bounded forms never remove anything the exact form keeps
            # (hash forms: proper subset property; IVF: its cells may
            # differ from label-Voronoi cells, so assert recall only)
            if form != "ivf":
                assert removed <= exact, form
            recalls[form] = len(removed & exact) / len(exact)
            assert recalls[form] >= floors[form], (form, tau, recalls[form])
        # semantic cells beat hash buckets
        assert recalls["ivf"] >= max(recalls["auto"], recalls["cap"]), recalls
