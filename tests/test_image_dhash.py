"""Per-modality hash-dedup invariants (image dHash q99zzc/q99zzd, audio
energy-contour fingerprint q99zze) beyond the value-hash gate:

- the PIGEONHOLE lemma the banded candidate join rests on: any two 64-bit
  hashes within hamming <= 3 share at least one of the 4 16-bit bands
  (hypothesis-pinned over random hashes and adversarial bit placements) —
  zero false negatives, the q42/q43 guarantee family;
- planted perturbations: a document whose text differs in a single
  character from another lands within hamming <= 2 (one changed byte
  touches one grid cell, which borders two comparisons) and IS paired;
  unrelated random documents are not;
- the pair plan is a banded equi-join, never a cartesian product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from allora_indexer_spark.operators.multimodal import (
    _AFP_SAMPLES,
    _DHASH_TAU,
    _dhash_frame,
    q99zzd_image_near_dup_pairs,
)
from allora_indexer_spark.registry import all_queries


def _bands(hi: int, lo: int) -> tuple[int, int, int, int]:
    return (hi >> 16, hi & 0xFFFF, lo >> 16, lo & 0xFFFF)


@settings(max_examples=300, deadline=None)
@given(
    h=st.integers(min_value=0, max_value=(1 << 64) - 1),
    flips=st.lists(
        st.integers(min_value=0, max_value=63),
        min_size=0,
        max_size=_DHASH_TAU,
    ),
)
def test_pigeonhole_lemma_no_false_negatives(h, flips):
    """<= TAU flipped bits can disturb at most TAU of the 4 bands."""
    h2 = h
    for b in flips:
        h2 ^= 1 << b
    a = _bands(h >> 32, h & 0xFFFFFFFF)
    b = _bands(h2 >> 32, h2 & 0xFFFFFFFF)
    assert any(x == y for x, y in zip(a, b))


def test_pigeonhole_adversarial_three_bands_hit():
    # place one flip in each of three distinct bands: the fourth must match
    h = 0x0123456789ABCDEF
    h2 = h ^ (1 << 63) ^ (1 << 40) ^ (1 << 5)  # bands 0, 1, 3
    a, b = _bands(h >> 32, h & 0xFFFFFFFF), _bands(h2 >> 32, h2 & 0xFFFFFFFF)
    assert sum(x == y for x, y in zip(a, b)) == 1


@pytest.fixture()
def planted_docs_dir(spark, tmp_path):
    """Doc 1 = doc 0 with ONE character changed; docs 2/3 unrelated.
    Texts are _AFP_SAMPLES (520) chars — at least as long as EVERY
    modality's tiled raster — so the single perturbed byte lands in the
    raster exactly once per modality (a shorter text would be tiled and
    the duplicate copies of the changed byte could flip more contour
    bits than the one-cell argument allows)."""
    rng = np.random.RandomState(5)
    base = "".join(
        chr(97 + rng.randint(0, 26)) for _ in range(_AFP_SAMPLES)
    )
    near = base[:100] + ("z" if base[100] != "z" else "y") + base[101:]
    other = "".join(
        chr(97 + rng.randint(0, 26)) for _ in range(len(base))
    )
    other2 = "".join(
        chr(97 + rng.randint(0, 26)) for _ in range(len(base))
    )
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [base, near, other, other2],
            "lang": ["en"] * 4,
            "source": ["src0"] * 4,
        }
    )
    d = tmp_path / "docs"
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_planted_single_char_perturbation_is_paired(spark, planted_docs_dir):
    hashes = (
        _dhash_frame(spark, planted_docs_dir)
        .toPandas()
        .set_index("doc_id")
    )
    # one changed byte touches exactly one grid cell -> at most the two
    # comparisons bordering it flip
    ham = bin(
        (int(hashes.loc[0, "dhash_hi"]) ^ int(hashes.loc[1, "dhash_hi"]))
        | (int(hashes.loc[0, "dhash_lo"]) ^ int(hashes.loc[1, "dhash_lo"]))
        << 64
    ).count("1")
    assert ham <= 2
    pairs = q99zzd_image_near_dup_pairs(spark, planted_docs_dir).toPandas()
    got = {tuple(r) for r in pairs[["doc_a", "doc_b"]].values.tolist()}
    assert (0, 1) in got
    # unrelated random 288-char strings: expected hamming ~32, far above
    # tau — no spurious pair involves docs 2 or 3
    assert not any(2 in p or 3 in p for p in got)


def test_pair_plan_is_banded_equi_join(spark, sf_dir):
    plan = (
        all_queries()["q99zzd_image_near_dup_pairs"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_planted_audio_perturbation_is_paired(spark, planted_docs_dir):
    """The audio member of the family: the same planted single-char
    perturbation pairs under the energy-contour fingerprint (the fixture
    text is exactly _AFP_SAMPLES chars, so the changed byte becomes ONE
    changed PCM sample perturbing ONE window's energy — at most the two
    comparisons bordering it flip, within tau), and the unrelated docs
    stay unpaired."""
    from allora_indexer_spark.operators.multimodal import (
        q99zze_audio_near_dup_pairs,
    )

    pairs = q99zze_audio_near_dup_pairs(
        spark, planted_docs_dir
    ).toPandas()
    got = {tuple(r) for r in pairs[["doc_a", "doc_b"]].values.tolist()}
    assert (0, 1) in got
    assert not any(2 in p or 3 in p for p in got)
