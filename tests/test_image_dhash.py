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
from pyspark.sql import functions as F
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
    corpus size, expected bucket size bounded; past the 32-bit cap the
    COMBINATION dial takes over (round-15 verdict item 4: more 32-bit
    bands, join keys = match_bands-word concatenations, 2^(32r) bucket
    keys), and `saturated` is reserved for the unreachable r > 8
    regime."""
    from allora_indexer_spark.operators.multimodal import (
        _MIH_TARGET_BUCKET,
        mih_band_plan,
    )

    prev_bits = 0
    prev_bands = 0
    for n in [1, 10**3, 10**6, 10**7, 2**26, 2**16 * 1024, 10**8, 10**9,
              10**12, 5 * 10**12, 10**13, 10**15, 10**20]:
        p = mih_band_plan(n)
        assert p["bands"] >= _DHASH_TAU + 1, n
        # the pigeonhole identity: m bands, r-word keys, detection
        # guaranteed for hamming <= m - r; the planner pins m = tau + r
        assert p["bands"] == _DHASH_TAU + p["match_bands"], n
        assert 16 <= p["band_bits"] <= 32 and p["band_bits"] % 2 == 0, n
        assert p["band_bits"] >= prev_bits, "dial must widen, never shrink"
        assert p["bands"] >= prev_bands, "dial must widen, never shrink"
        prev_bits, prev_bands = p["band_bits"], p["bands"]
        assert p["hash_bits"] == p["bands"] * p["band_bits"]
        assert (p["grid_cols"] - 1) * p["grid_rows"] == p["hash_bits"]
        if not p["saturated"]:
            # the JOIN KEY (match_bands concatenated words) keeps the
            # expected bucket bounded, at every scale the dial covers
            key_bits = p["band_bits"] * p["match_bands"]
            assert n / (1 << key_bits) <= _MIH_TARGET_BUCKET, n
    # the two operating points the repo ships: classic at test SFs ...
    assert mih_band_plan(60_000)["band_bits"] == 16
    assert mih_band_plan(600_000)["band_bits"] == 16
    # ... the dial widens gradually (20-bit bands at 1e9) ...
    assert mih_band_plan(10**9)["band_bits"] == 20
    # ... the registered wide query pins the single-band 32-bit cap ...
    wide = mih_band_plan(4 * 10**12)
    assert (wide["band_bits"], wide["grid_cols"], wide["match_bands"]) \
        == (32, 17, 1)
    # ... and past it the combination dial engages (q99zzn's plan)
    combo = mih_band_plan(10**13)
    assert (combo["bands"], combo["band_bits"], combo["match_bands"],
            combo["index_count"], combo["grid_cols"]) == (5, 32, 2, 10, 21)
    assert not combo["saturated"]
    # exactly at the 4x16 saturation boundary the classic split holds
    assert mih_band_plan(2**16 * 1024)["band_bits"] == 16
    assert mih_band_plan(2**16 * 1024 + 1)["band_bits"] > 16
    # r = 2 covers everything physical (up to ~1.8e22 items); the honest
    # saturation report survives at the (unreachable) r > 8 horizon
    assert mih_band_plan(10**20)["match_bands"] == 2
    assert not mih_band_plan(10**12)["saturated"]
    assert mih_band_plan(2**300)["saturated"]


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


# ---------------------------------------------------------------------------
# round 16: the REAL decode→pool→hash→pair composition, the combination
# dial, the planted-twin queries, and intermediate band widths
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    h=st.integers(min_value=0, max_value=(1 << 160) - 1),
    flips=st.lists(
        st.integers(min_value=0, max_value=159),
        min_size=0,
        max_size=_DHASH_TAU,
    ),
)
def test_pigeonhole_lemma_combination_keys(h, flips):
    """The COMBINATION-dial lemma (5x32 bands, 2-word join keys): <= tau
    flips disturb at most tau of the 5 bands, leaving >= 2 intact, so at
    least one of the C(5,2) pair-keys matches exactly."""
    from itertools import combinations

    h2 = h
    for b in flips:
        h2 ^= 1 << b
    a = [(h >> (32 * i)) & 0xFFFFFFFF for i in range(5)]
    b = [(h2 >> (32 * i)) & 0xFFFFFFFF for i in range(5)]
    assert any(
        a[i] == b[i] and a[j] == b[j]
        for i, j in combinations(range(5), 2)
    )


def test_reencoded_jpeg_pairs_through_raster_dhash():
    """Round-15 verdict item 1's planted test: the SAME image re-encoded
    at a different quality (a REAL re-encode — different DQT, different
    entropy stream) decodes to a slightly different raster whose pooled
    dHash stays within tau, while an unrelated image stays far away.
    This drives decoded PIXELS through pool_dhash_from_gray — no
    text-derived synthesis anywhere."""
    from allora_indexer_spark.operators.jpegcodec import (
        decode_jpeg,
        synth_jpeg_baseline,
        synth_jpeg_progressive,
    )
    from allora_indexer_spark.operators.multimodal import (
        pool_dhash_from_gray,
    )

    rng = np.random.RandomState(13)
    # strong cell-to-cell gradients (steps >= 16 gray levels) + mild
    # in-block texture: quantization drift at any quality stays far
    # below the gaps that decide the 64 comparisons
    cells = ((np.arange(72).reshape(8, 9) * 5) % 15) * 16 + 8
    raster = (
        np.repeat(np.repeat(cells, 8, 0), 8, 1)
        + rng.randint(0, 3, (64, 72))
    ).astype(np.uint8).tobytes()
    other = rng.randint(0, 256, (64, 72), dtype=np.uint8).tobytes()

    def hash_of(buf):
        d = decode_jpeg(buf)
        assert d is not None and (d["width"], d["height"]) == (72, 64)
        return pool_dhash_from_gray(
            np.frombuffer(d["pixels"], np.uint8).reshape(64, 72)
        )

    h50 = hash_of(synth_jpeg_baseline(72, 64, raster, 1))
    h90 = hash_of(synth_jpeg_baseline(72, 64, raster, 1, quality=90))
    h30p = hash_of(synth_jpeg_progressive(72, 64, raster, 1, quality=30))
    hx = hash_of(synth_jpeg_baseline(72, 64, other, 1))

    def ham(a, b):
        return bin(((a[0] ^ b[0]) << 32) | (a[1] ^ b[1])).count("1")

    assert ham(h50, h90) <= _DHASH_TAU, "re-encode at q90 drifted past tau"
    assert ham(h50, h30p) <= _DHASH_TAU, "progressive q30 drifted past tau"
    assert ham(h50, hx) > _DHASH_TAU, "unrelated image within tau"


def test_planted_twin_queries_emit_one_pair_per_planted_doc(spark, sf_dir):
    """The pair-positive contract the round-15 verdict asked for
    (item 2): at EVERY SF each doc_id % 7 == 0 document pairs with its
    one-cell-perturbed twin, through the raster composition (q99zzk),
    the 4x32 wide paths (q99zzl image / q99zzm audio) and the
    combination-key path (q99zzn) — the oracles these queries register
    therefore verify actual pairs, never the empty set."""
    from allora_indexer_spark.operators.multimodal import (
        _TWIN_MOD,
        _TWIN_OFFSET,
        q99zzk_image_raster_near_dup_pairs,
        q99zzl_image_near_dup_pairs_wide_planted,
        q99zzm_audio_near_dup_pairs_wide_planted,
        q99zzn_image_near_dup_pairs_combo_planted,
    )
    from allora_indexer_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = {
        r[0]
        for r in docs.filter(
            (F.col("doc_id") % _TWIN_MOD == 0) & (F.length("text") > 0)
        ).select("doc_id").collect()
    }
    assert planted
    for fn in (
        q99zzk_image_raster_near_dup_pairs,
        q99zzl_image_near_dup_pairs_wide_planted,
        q99zzm_audio_near_dup_pairs_wide_planted,
        q99zzn_image_near_dup_pairs_combo_planted,
    ):
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in fn(spark, sf_dir).collect()
        }
        for d in planted:
            assert (d, d + _TWIN_OFFSET) in got, (fn.__name__, d)
            assert got[(d, d + _TWIN_OFFSET)] <= 2, (fn.__name__, d)


def test_intermediate_band_width_matches_duckdb(spark, sf_dir):
    """Round-15 reviewer advice: the dial passes through 18-30-bit band
    widths on its way from 16 to 32, and none of them was verified
    anywhere (only the endpoints have registered oracles). Pin the
    20-bit geometry (what ~1e9 items select) cross-engine: hash words
    AND the banded pair set must match a DuckDB replay exactly."""
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_frames, duckdb_connect

    from allora_indexer_spark.operators.multimodal import (
        _banded_pairs_duck,
        _banded_pairs_frame,
        _dhash_band_cols,
        _dhash_wide_ctes_duck,
        mih_band_plan,
    )
    from allora_indexer_spark.tables import load_table

    plan = mih_band_plan(10**9)
    assert plan["band_bits"] == 20 and plan["match_bands"] == 1
    docs = load_table(spark, sf_dir, "documents")
    h = _dhash_band_cols(docs, plan).localCheckpoint(eager=False)
    con = duckdb_connect(sf_dir)
    oracle_h = con.execute(
        f"WITH {_dhash_wide_ctes_duck(plan)} "
        "SELECT doc_id, band0, band1, band2, band3 FROM h"
    ).fetchdf()
    compare_frames(h.toPandas(), oracle_h, "dhash-20bit-hash-words")
    pairs = _banded_pairs_frame(h, plan["bands"], _DHASH_TAU).toPandas()
    oracle_p = con.execute(
        f"WITH {_dhash_wide_ctes_duck(plan)} "
        + _banded_pairs_duck(plan["bands"], _DHASH_TAU)
    ).fetchdf()
    compare_frames(pairs, oracle_p, "dhash-20bit-pairs")


def test_classic_queries_warn_on_static_oracle_divergence(
    spark, planted_docs_wide_dir, monkeypatch
):
    """Round-15 reviewer advice: when the derived plan leaves the
    classic 4x16 geometry, q99zzd/q99zze's registered static oracles
    diverge BY CONSTRUCTION — the queries must say so loudly at plan
    time instead of surfacing as an opaque value-hash mismatch."""
    from allora_indexer_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "mih_band_plan", lambda n, **kw: mm._WIDE_PLAN)
    for fn in (mm.q99zzd_image_near_dup_pairs,
               mm.q99zze_audio_near_dup_pairs):
        with pytest.warns(RuntimeWarning, match="WILL diverge"):
            fn(spark, planted_docs_wide_dir)
