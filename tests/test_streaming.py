"""Structured Streaming ingest: availableNow backfill over the fixture feeds
must produce exactly the batch pipeline's tables (T1/T2/T6), and a second
stream start with a fresh checkpoint must not duplicate rows (T3)."""

from __future__ import annotations

import pytest

from allora_indexer_spark.plans import ingest, warehouse
from allora_indexer_spark.sources.fixtures import write_fixtures
from allora_indexer_spark.streaming import stream


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_fixtures")
    write_fixtures(str(d))
    return str(d)


def test_streaming_matches_batch(spark, fixture_dir, tmp_path):
    wh = str(tmp_path / "wh")
    q1 = stream.start_block_ingest(
        spark, f"{fixture_dir}/blocks", wh, str(tmp_path / "ckpt_b")
    )
    q1.awaitTermination(120)
    q2 = stream.start_event_ingest(
        spark, f"{fixture_dir}/block_results", wh, str(tmp_path / "ckpt_e")
    )
    q2.awaitTermination(120)

    blocks = ingest.read_blocks(spark, f"{fixture_dir}/blocks")
    results = ingest.read_block_results(
        spark, f"{fixture_dir}/block_results"
    )
    batch = ingest.build_tables(blocks, results)
    for name, bdf in batch.items():
        streamed = warehouse.read_table(spark, wh, name)
        assert streamed.count() == bdf.count(), f"{name}: stream != batch count"

    # replay with a fresh checkpoint: idempotent writers absorb the rerun
    q3 = stream.start_block_ingest(
        spark, f"{fixture_dir}/blocks", wh, str(tmp_path / "ckpt_b2")
    )
    q3.awaitTermination(120)
    for name in ("block_info", "messages", "inferences"):
        assert warehouse.read_table(spark, wh, name).count() == batch[name].count()


def test_watermarked_window_drops_too_late_blocks(spark, tmp_path):
    """Append-mode windowed aggregation with a 1-minute watermark: windows
    finalize once the watermark passes; a block arriving behind the
    watermark is dropped, one within a still-open window is counted."""
    import json

    from allora_indexer_spark.sources.fixtures import build_blocks

    feed = tmp_path / "feed"
    feed.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    blocks = build_blocks()  # heights 101..106 at minutes 00:01..00:06
    with open(feed / "part-000.jsonl", "w") as f:
        for b in blocks:
            f.write(json.dumps(b) + "\n")
    q = stream.start_block_window_stats(spark, str(feed), out, ckpt)
    q.awaitTermination(120)

    emitted = {
        str(r["window_start"]): r["n_blocks"]
        for r in spark.read.parquet(out).collect()
    }
    # watermark = 00:06 - 1min = 00:05 → windows ending <= 00:05 finalized:
    # [00:00,00:02)={101}, [00:02,00:04)={102,103,103-dup}; [00:04,00:06) open.
    # The stream counts raw feed rows — the duplicated height-103 block is
    # visible here; per-height dedup belongs to block_info (K1), not the
    # window stats.
    assert emitted == {
        "2024-06-01 00:00:00": 1,
        "2024-06-01 00:02:00": 3,
    }

    # phase 2: a too-late block (00:00:30, behind the watermark → dropped)
    # and a fresh one at 00:08 advancing the watermark past 00:06
    late = build_blocks()[0]
    late["header"]["height"] = "90"
    late["header"]["time"] = "2024-06-01T00:00:30Z"
    fresh = build_blocks()[0]
    fresh["header"]["height"] = "108"
    fresh["header"]["time"] = "2024-06-01T00:08:00Z"
    with open(feed / "part-001.jsonl", "w") as f:
        f.write(json.dumps(late) + "\n")
        f.write(json.dumps(fresh) + "\n")
    q = stream.start_block_window_stats(spark, str(feed), out, ckpt)
    q.awaitTermination(120)

    emitted = {
        str(r["window_start"]): r["n_blocks"]
        for r in spark.read.parquet(out).collect()
    }
    # [00:00,00:02) was NOT re-emitted with the late block (dropped), and
    # [00:04,00:06) finalized with its original two blocks {104,105}
    assert emitted["2024-06-01 00:00:00"] == 1
    assert emitted["2024-06-01 00:04:00"] == 2
