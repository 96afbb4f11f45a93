"""Short/empty documents must not crash the shingle-based operators.

Spark's sequence(1, stop) with stop < 1 produces a *descending* sequence
(unlike DuckDB's range(), which returns empty), so an unguarded
transform(sequence(1, size(w) - k), ...) hits element_at(w, 0) /
slice(w, 0, n) and throws on any doc with <= k tokens. Every fixture doc
has >= 10 tokens, so only these synthetic short docs exercise the guard.
"""

import os

import pytest
from pyspark.sql import functions as F

from allora_indexer_spark.operators.dedup import (
    _FIVEGRAM_SPARK,
    _SHINGLES_SPARK,
    q41_minhash_lsh_dedup,
    q78_decontaminate,
)
from allora_indexer_spark.operators.multimodal import (
    q62_frame_sampling,
    q90_waveform_window_stats,
)
from allora_indexer_spark.operators.textstats import q80_repetition_score

SHORT_TEXTS = [
    "",  # split -> [""] (1 element)
    "one",
    "alpha beta gamma",
    "alpha beta gamma delta",
    "alpha beta gamma delta epsilon",
    "the quick brown fox jumps over the lazy dog again",
]


@pytest.fixture(scope="module")
def short_sf_dir(spark, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("short_docs"))
    rows = []
    for i, text in enumerate(SHORT_TEXTS):
        # Mix of held-in and held-out sources so q78 sees both sides.
        source = "src18" if i % 3 == 0 else f"src{i}"
        rows.append((i, text, "en", source, len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(os.path.join(out, "documents.parquet"))
    return out


def _words(spark, texts):
    return spark.createDataFrame(
        [(t,) for t in texts], "text string"
    ).select(F.split("text", " ").alias("w"))


def test_shingle_fragment_empty_below_two_tokens(spark):
    got = (
        _words(spark, SHORT_TEXTS)
        .select(F.size(F.expr(_SHINGLES_SPARK)).alias("n"))
        .orderBy("n")
        .collect()
    )
    # 0- and 1-token docs -> no bigrams; others -> n_tokens - 1 (distinct).
    assert [r.n for r in got] == [0, 0, 2, 3, 4, 9]


def test_fivegram_fragment_empty_below_five_tokens(spark):
    got = (
        _words(spark, SHORT_TEXTS)
        .select(F.size(F.expr(_FIVEGRAM_SPARK)).alias("n"))
        .orderBy("n")
        .collect()
    )
    assert [r.n for r in got] == [0, 0, 0, 0, 1, 6]


@pytest.mark.parametrize(
    "fn", [q41_minhash_lsh_dedup, q78_decontaminate, q80_repetition_score]
)
def test_shingle_queries_survive_short_docs(spark, short_sf_dir, fn):
    # The guard means short docs simply contribute no shingles; the plan
    # must execute end-to-end rather than throw INVALID_PARAMETER_VALUE.
    fn(spark, short_sf_dir).collect()


@pytest.mark.parametrize("fn", [q62_frame_sampling, q90_waveform_window_stats])
def test_frame_queries_emit_nothing_for_empty_payload(spark, short_sf_dir, fn):
    # sequence(0, -1) descends in Spark, so an unguarded empty payload
    # would emit bogus frame rows (DuckDB's range(0, 0) emits none).
    rows = fn(spark, short_sf_dir).collect()
    assert all(r["doc_id"] != 0 for r in rows)  # doc 0 is the empty text
    assert rows  # non-empty docs still produce frames


def test_token_chunking_covers_tail(spark, tmp_path):
    """A 33-token doc must yield two overlapping chunks — the stride
    sequence's last start is pulled forward so the final token is never
    dropped; empty and 1-token docs yield their single short chunk."""
    import os

    from allora_indexer_spark.operators.textstats import q92_token_chunking

    texts = ["", "one", " ".join(f"t{i}" for i in range(33))]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    d = str(tmp_path / "chunk_docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))
    out = q92_token_chunking(spark, d).orderBy("doc_id", "chunk_idx").collect()
    got = [(r["doc_id"], r["chunk_idx"], r["n_tokens"]) for r in out]
    assert got == [(0, 0, 1), (1, 0, 1), (2, 0, 32), (2, 1, 9)]
    # overlap: chunk 1 of doc 2 starts at token 25 (stride 24)
    assert out[-1]["chunk_text"].startswith("t24 ")
