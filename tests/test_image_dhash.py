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


# ---------------------------------------------------------------------------
# the DERIVED multi-index-hashing scale dial (round 15: mih_band_plan)
# ---------------------------------------------------------------------------


def test_mih_band_plan_invariants():
    """The planner's contract across synthetic corpus sizes: the band
    count NEVER drops below tau+1 (pigeonhole — zero false negatives at
    every scale), band width is even, clamped to [16, 32], monotone in
    corpus size, and keeps the expected bucket size bounded until the
    documented 32-bit cap (where `saturated` reports the truth instead
    of silently degrading)."""
    from allora_indexer_spark.operators.multimodal import (
        _MIH_TARGET_BUCKET,
        mih_band_plan,
    )

    prev_bits = 0
    for n in [1, 10**3, 10**6, 10**7, 2**26, 2**16 * 1024, 10**8, 10**9,
              10**12, 5 * 10**12, 10**13]:
        p = mih_band_plan(n)
        assert p["bands"] == _DHASH_TAU + 1, n
        assert 16 <= p["band_bits"] <= 32 and p["band_bits"] % 2 == 0, n
        assert p["band_bits"] >= prev_bits, "dial must widen, never shrink"
        prev_bits = p["band_bits"]
        assert p["hash_bits"] == p["bands"] * p["band_bits"]
        assert (p["grid_cols"] - 1) * p["grid_rows"] == p["hash_bits"]
        if not p["saturated"]:
            assert n / (1 << p["band_bits"]) <= _MIH_TARGET_BUCKET, n
    # the two operating points the repo ships: classic at test SFs ...
    assert mih_band_plan(60_000)["band_bits"] == 16
    assert mih_band_plan(600_000)["band_bits"] == 16
    # ... the dial widens gradually (20-bit bands at 1e9) ...
    assert mih_band_plan(10**9)["band_bits"] == 20
    # ... and the registered wide query pins the 32-bit cap configuration
    wide = mih_band_plan(10**13)
    assert (wide["band_bits"], wide["grid_cols"]) == (32, 17)
    # exactly at the 4x16 saturation boundary the classic split holds
    assert mih_band_plan(2**16 * 1024)["band_bits"] == 16
    assert mih_band_plan(2**16 * 1024 + 1)["band_bits"] > 16
    # the cap is reported, not hidden
    assert mih_band_plan(10**13)["saturated"]
    assert not mih_band_plan(10**9)["saturated"]
    assert not mih_band_plan(10**12)["saturated"]


@settings(max_examples=300, deadline=None)
@given(
    h=st.integers(min_value=0, max_value=(1 << 128) - 1),
    flips=st.lists(
        st.integers(min_value=0, max_value=127),
        min_size=0,
        max_size=_DHASH_TAU,
    ),
)
def test_pigeonhole_lemma_wide_bands(h, flips):
    """The zero-false-negative lemma under the WIDE (128-bit, 4x32)
    geometry: <= tau flips disturb at most tau of the 4 bands."""
    h2 = h
    for b in flips:
        h2 ^= 1 << b
    a = [(h >> (32 * i)) & 0xFFFFFFFF for i in range(4)]
    b = [(h2 >> (32 * i)) & 0xFFFFFFFF for i in range(4)]
    assert any(x == y for x, y in zip(a, b))


@pytest.fixture()
def planted_docs_wide_dir(spark, tmp_path):
    """Like planted_docs_dir but with texts AT LEAST as long as the WIDE
    rasters (image 17x8x4 = 544 bytes, audio 129x8 = 1032 samples), so
    the single perturbed byte lands in each wide raster exactly once."""
    rng = np.random.RandomState(7)
    n = 1032
    base = "".join(chr(97 + rng.randint(0, 26)) for _ in range(n))
    near = base[:100] + ("z" if base[100] != "z" else "y") + base[101:]
    other = "".join(chr(97 + rng.randint(0, 26)) for _ in range(n))
    other2 = "".join(chr(97 + rng.randint(0, 26)) for _ in range(n))
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


def test_wide_paths_pair_planted_perturbation(spark, planted_docs_wide_dir):
    """Both WIDE members (q99zzg image, q99zzh audio) pair the planted
    single-char perturbation and nothing else — the 128-bit rasters see
    the changed byte once, so at most two comparisons flip per
    modality."""
    from allora_indexer_spark.operators.multimodal import (
        q99zzg_image_near_dup_pairs_wide,
        q99zzh_audio_near_dup_pairs_wide,
    )

    for fn in (
        q99zzg_image_near_dup_pairs_wide,
        q99zzh_audio_near_dup_pairs_wide,
    ):
        pairs = fn(spark, planted_docs_wide_dir).toPandas()
        got = {tuple(r) for r in pairs[["doc_a", "doc_b"]].values.tolist()}
        assert (0, 1) in got, fn.__name__
        assert not any(2 in p or 3 in p for p in got), fn.__name__


def test_classic_queries_route_to_wide_past_threshold(
    spark, planted_docs_wide_dir, monkeypatch
):
    """q99zzd/q99zze consult mih_band_plan at plan time; when the plan
    says wide, their output must be the wide queries' output (same
    fixture, same pairs) — the routing is live code, not a docstring."""
    from allora_indexer_spark.operators import multimodal as mm

    monkeypatch.setattr(
        mm, "mih_band_plan", lambda n, **kw: mm._WIDE_PLAN
    )
    for classic, wide in (
        (mm.q99zzd_image_near_dup_pairs, mm.q99zzg_image_near_dup_pairs_wide),
        (mm.q99zze_audio_near_dup_pairs, mm.q99zzh_audio_near_dup_pairs_wide),
    ):
        got = sorted(
            map(tuple, classic(spark, planted_docs_wide_dir).toPandas()
                .values.tolist())
        )
        want = sorted(
            map(tuple, wide(spark, planted_docs_wide_dir).toPandas()
                .values.tolist())
        )
        assert got == want, classic.__name__


def test_audio_fingerprint_drops_failed_rows_not_sentinels():
    """Round-14 review: a (-1,-1) sentinel row for a failed decode would
    self-join into a bogus hamming-0 'near-duplicate'. Failed/empty
    payloads must vanish from the fingerprint output entirely."""
    from allora_indexer_spark.operators.multimodal import (
        audio_fingerprint_stats,
    )

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [b"abc", b"", b"xyz"]}
    )
    (out,) = list(audio_fingerprint_stats(iter([pdf])))
    assert list(out["doc_id"]) == [1, 3]
    assert (out["fp_hi"] >= 0).all() and (out["fp_lo"] >= 0).all()


def test_audio_fingerprint_shift_sensitivity_bound():
    """The documented robustness contract (q99zze docstring): amplitude
    perturbations inside one window stay within tau (the planted test
    above), but a TIME offset of even one sample misaligns every
    non-overlapping window and flips far more than tau bits — the
    fingerprint is alignment-sensitive BY DESIGN (exact integer replay
    over byte-aligned payloads), and this pins the failing offset size
    so the non-goal is a measured fact, not a hope."""
    from allora_indexer_spark.operators.multimodal import (
        audio_fingerprint_stats,
    )

    rng = np.random.RandomState(11)
    for _ in range(5):
        base = bytes(
            rng.randint(32, 127, _AFP_SAMPLES, dtype=np.uint8).tolist()
        )
        for off in (1, 2, 4):
            sh = base[off:] + base[:off]
            pdf = pd.DataFrame({"doc_id": [0, 1], "payload": [base, sh]})
            (out,) = list(audio_fingerprint_stats(iter([pdf])))
            ham = bin(
                (int(out.fp_hi[0]) ^ int(out.fp_hi[1])) << 32
                | (int(out.fp_lo[0]) ^ int(out.fp_lo[1]))
            ).count("1")
            assert ham > _DHASH_TAU, (off, ham)


def test_saturated_plan_warns_at_call_sites(spark, planted_docs_wide_dir, monkeypatch):
    """Past the 32-bit cap the planner reports saturation and the pair
    queries must surface it as a RuntimeWarning — never a silent cost
    blowup (round-15 review: the flag existed but nothing read it)."""
    from allora_indexer_spark.operators import multimodal as mm

    sat = dict(mm._WIDE_PLAN, saturated=True)
    monkeypatch.setattr(mm, "mih_band_plan", lambda n, **kw: sat)
    for fn in (mm.q99zzd_image_near_dup_pairs, mm.q99zze_audio_near_dup_pairs):
        with pytest.warns(RuntimeWarning, match="saturated"):
            fn(spark, planted_docs_wide_dir)
