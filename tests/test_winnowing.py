"""Winnowing fingerprint selection (q99zr) — the SIGMOD 2003 guarantees.

Pins the two properties the operator's docstring sells:
  1. DETECTION — any cross-document shared token run of length
     >= WINNOW_W + WINNOW_K - 1 yields at least one shared fingerprint
     (so the winnowed join-back misses nothing the q97 full census
     would catch at that span width);
  2. DENSITY — the selection keeps a bounded fraction of grams
     (~2/(w+1) expected; hard upper bound: one selection per window).

Both run against the SAME ``winnow_fingerprints`` helper the registered
query uses, over constructed DataFrames (hypothesis drives the shared-run
placement), plus a positional sanity check of the rightmost-min tie rule.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from allora_indexer_spark.operators.dedup import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)

GUARANTEE = WINNOW_W + WINNOW_K - 1  # 8 tokens


def _fps(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return [
        (r.doc_id, r.gh, r.pos)
        for r in winnow_fingerprints(df).collect()
    ]


# small disjoint vocabularies so the surrounding context of the two
# documents never accidentally collides with the shared run
_VOCAB_A = [f"a{i}" for i in range(20)]
_VOCAB_B = [f"b{i}" for i in range(20)]
_SHARED = [f"s{i}" for i in range(GUARANTEE)]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(
    pre_a=st.integers(0, 10),
    pre_b=st.integers(0, 10),
    suf_a=st.integers(0, 10),
    suf_b=st.integers(0, 10),
)
def test_winnowing_detection_guarantee(spark, pre_a, pre_b, suf_a, suf_b):
    """A shared run of exactly w+k-1 tokens at ARBITRARY offsets in two
    otherwise-disjoint documents always produces a shared fingerprint
    hash — the paper's detection guarantee, which position-independent
    matching (the point of fingerprinting) depends on."""
    doc_a = " ".join(_VOCAB_A[:pre_a] + _SHARED + _VOCAB_A[10 : 10 + suf_a])
    doc_b = " ".join(_VOCAB_B[:pre_b] + _SHARED + _VOCAB_B[10 : 10 + suf_b])
    fps = _fps(spark, [(1, doc_a), (2, doc_b)])
    h1 = {gh for d, gh, _ in fps if d == 1}
    h2 = {gh for d, gh, _ in fps if d == 2}
    shared = h1 & h2
    assert shared, (doc_a, doc_b)
    # and the shared hash really is a hash of shared-run content
    run_grams = {
        hashlib.md5(
            " ".join(_SHARED[i : i + WINNOW_K]).encode()
        ).hexdigest()
        for i in range(len(_SHARED) - WINNOW_K + 1)
    }
    assert shared <= run_grams


def test_winnowing_density_bounds(spark, sf_dir):
    """Selection count per doc is bounded: at least one fingerprint per
    full window-span, never more than the gram count, and (loose upper
    bound from the clipped leading frames) never more than w distinct
    selections per w-window region — checked as n_fp <= n_grams and
    n_fp >= ceil(n_grams / w) for docs with >= 1 gram."""
    from allora_indexer_spark.registry import all_queries

    rows = (
        all_queries()["q99zr_winnowing_fingerprints"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert rows
    for r in rows:
        if r.n_grams == 0:
            assert r.n_fp == 0 and r.fp_density == 0.0
            continue
        assert 1 <= r.n_fp <= r.n_grams
        assert r.n_fp * WINNOW_W >= r.n_grams  # >= one pick per window
        assert abs(r.fp_density - r.n_fp / r.n_grams) < 1e-12


def test_winnowing_rightmost_min_tie(spark):
    """A doc that repeats one token everywhere has ONE distinct gram hash
    tied across every window; plain winnowing's rightmost-tie rule then
    selects each window's CURRENT position — so all positions surface,
    pinning the tie direction (a leftmost-tie bug would also select all
    positions but shift the clipped leading frames; an unstable argmin
    would differ between engines and fail the oracle hash instead)."""
    n_tokens = 20
    doc = " ".join(["x"] * n_tokens)
    fps = _fps(spark, [(1, doc)])
    n_grams = n_tokens - WINNOW_K + 1  # 16
    assert {gh for _, gh, _ in fps} == {
        hashlib.md5(" ".join(["x"] * WINNOW_K).encode()).hexdigest()
    }
    # rightmost tie => window ending at e selects pos e; dedup leaves
    # every position (the clipped leading frames included)
    assert sorted(p for _, _, p in fps) == list(range(1, n_grams + 1))


def test_winnowing_position_bound_enforced(spark, monkeypatch):
    """The order-embedding key packs BASE - pos into fixed digits, so a
    doc whose gram positions would reach _POS_BASE must be EXCLUDED from
    selection (surfacing with zero fingerprints), not silently emit
    corrupted keys ('-' sorts before digits, breaking the rightmost-min
    rule and the position decode). Tested at a shrunken base — the
    production 10^9 bound is the same code path."""
    import allora_indexer_spark.operators.dedup as d

    monkeypatch.setattr(d, "_POS_PAD", 2)
    monkeypatch.setattr(d, "_POS_BASE", 100)
    monkeypatch.setattr(d, "_WINNOW_MAX_TOKENS", 100 + WINNOW_K - 1)
    ok_doc = " ".join(f"t{i}" for i in range(103))      # 99 grams: max pos 99 < 100
    over_doc = " ".join(f"t{i}" for i in range(104))    # 100 grams: pos 100 = BASE
    df = spark.createDataFrame(
        [(1, ok_doc), (2, over_doc)], "doc_id long, text string"
    )
    fps = d.winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    assert 2 not in by_doc  # over-bound doc excluded, no corrupt keys
    assert by_doc[1], "in-bound doc still fingerprints"
    assert all(1 <= p <= 99 for p in by_doc[1])
