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
