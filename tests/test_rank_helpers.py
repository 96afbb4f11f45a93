"""The bucket-offset global-rank helpers (q99zq/q99zs) vs the naive rank.

Both helpers compute ``ROW_NUMBER() OVER (ORDER BY bucket_axes, order) - 1``
without a global sort; the correctness condition is that the bucket axes
form an order-embedding of the intended global order. Pinned here against
a driver-side naive rank over randomized small frames — an off-by-one in
either cumulative-offset pass (the one-level histogram window or the
two-level major/minor decomposition) shifts whole bucket blocks and fails
on the first example.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from allora_indexer_spark.operators.curation import (
    _bucket_offset_ranked,
    _two_level_offset_ranked,
)


def _naive_rank(rows, keyfn):
    order = sorted(range(len(rows)), key=lambda i: keyfn(rows[i]))
    rank = [0] * len(rows)
    for r, i in enumerate(order):
        rank[i] = r
    return rank


def test_one_level_rank_matches_naive(spark):
    rnd = random.Random(7)
    for trial in range(3):
        rows = [
            (i, rnd.randrange(5), rnd.randrange(100))
            for i in range(rnd.randrange(1, 120))
        ]
        df = spark.createDataFrame(rows, "id long, bucket int, ord long")
        got = {
            r.id: r.rnk
            for r in _bucket_offset_ranked(df, ["bucket"], ["ord", "id"]).collect()
        }
        want = _naive_rank(rows, lambda t: (t[1], t[2], t[0]))
        assert got == {rows[i][0]: want[i] for i in range(len(rows))}, trial


def test_two_level_rank_matches_naive(spark):
    rnd = random.Random(11)
    for trial in range(3):
        rows = [
            (i, rnd.randrange(4), rnd.randrange(3), rnd.randrange(50))
            for i in range(rnd.randrange(1, 120))
        ]
        df = spark.createDataFrame(
            rows, "id long, major int, minor int, ord long"
        )
        got = {
            r.id: r.rnk
            for r in _two_level_offset_ranked(
                df, "major", "minor", ["ord", "id"]
            ).collect()
        }
        want = _naive_rank(rows, lambda t: (t[1], t[2], t[3], t[0]))
        assert got == {rows[i][0]: want[i] for i in range(len(rows))}, trial


def test_two_level_equals_one_level_on_same_axes(spark):
    # the decomposition changes the physical shape, never the rank
    rows = [(i, i % 6, (i * 7) % 4, (i * 13) % 50) for i in range(97)]
    df = spark.createDataFrame(rows, "id long, major int, minor int, ord long")
    one = {
        r.id: r.rnk
        for r in _bucket_offset_ranked(
            df, ["major", "minor"], ["ord", "id"]
        ).collect()
    }
    two = {
        r.id: r.rnk
        for r in _two_level_offset_ranked(
            df, "major", "minor", ["ord", "id"]
        ).collect()
    }
    assert one == two
    # ranks are a permutation of 0..n-1
    assert sorted(one.values()) == list(range(len(rows)))


def test_rank_helpers_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "id long, major int, minor int, ord long")
    assert _two_level_offset_ranked(empty, "major", "minor", ["ord"]).count() == 0
    one = spark.createDataFrame([(1, 0, 0, 9)], "id long, major int, minor int, ord long")
    rows = _two_level_offset_ranked(one, "major", "minor", ["ord"]).collect()
    assert [r.rnk for r in rows] == [0]


def test_hash_prefix_width_is_rank_invariant(spark, monkeypatch):
    """SHUF_PREFIX_HEX is the widen-at-scale knob (16**w buckets): any
    width must compute the IDENTICAL global rank, because a hex prefix of
    any length is an order-embedding of the full-hash order. Run the
    q99zq bucket axis at widths 1, 2 and 3 over the same frame and
    require rank equality (plus equality with the naive global sort)."""
    from allora_indexer_spark.operators import curation

    rows = [(i,) for i in range(157)]
    df = spark.createDataFrame(rows, "id long").select(
        "id", F.md5(F.col("id").cast("string")).alias("hk")
    )
    by_width = {}
    # width 8 reaches 16^8-1 = 2^32-1: an int32 bucket cast would NULL
    # half the buckets and the offsets equi-join would silently drop
    # those rows — the bigint cast must keep every width identical
    for width in (1, 2, 3, 8):
        monkeypatch.setattr(curation, "SHUF_PREFIX_HEX", width)
        ranked = _bucket_offset_ranked(
            df.withColumn("bucket", curation._hash_prefix_bucket("hk")),
            ["bucket"],
            ["hk", "id"],
        )
        by_width[width] = {r.id: r.rnk for r in ranked.collect()}
    assert by_width[1] == by_width[2] == by_width[3] == by_width[8]
    # out-of-range widths fail loudly instead of overflowing
    import pytest

    for bad in (0, 16):
        with pytest.raises(ValueError):
            curation._hash_prefix_bucket("hk", prefix_hex=bad)
    # and the shared answer IS the global (hk, id) order
    naive = {
        rid: rnk
        for rnk, (hk, rid) in enumerate(
            sorted((r.hk, r.id) for r in df.collect())
        )
    }
    assert by_width[2] == naive
