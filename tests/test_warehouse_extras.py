"""Consensus-params source (S7) and snapshot bootstrap (S8)."""

from __future__ import annotations

import pytest

from allora_indexer_spark.plans import ingest, warehouse
from allora_indexer_spark.sources.fixtures import write_consensus_params, write_fixtures


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wh_fixtures")
    write_fixtures(str(d))
    write_consensus_params(str(d))
    return str(d)


def test_consensus_params(spark, fixture_dir):
    cp = ingest.read_consensus_params(
        spark, f"{fixture_dir}/consensus_params"
    ).collect()
    assert len(cp) == 1
    row = cp[0]
    assert row["max_bytes"] == "22020096"
    assert row["max_gas"] == "-1"
    assert row["max_age_duration"] == "172800s"
    assert row["evidence_max_bytes"] == "1048576"
    assert row["pub_key_types"] == "ed25519"


def test_snapshot_bootstrap(spark, fixture_dir, tmp_path):
    blocks = ingest.read_blocks(spark, f"{fixture_dir}/blocks")
    results = ingest.read_block_results(spark, f"{fixture_dir}/block_results")
    tables = ingest.build_tables(blocks, results)

    snapshot = str(tmp_path / "snapshot")
    warehouse.write_tables(spark, tables, snapshot)

    # bootstrap a fresh warehouse from the snapshot
    wh = str(tmp_path / "wh")
    restored = warehouse.bootstrap_from_snapshot(spark, snapshot, wh)
    assert "block_info" in restored and "messages" in restored
    for name in tables:
        assert warehouse.read_table(spark, wh, name).count() == tables[name].count()

    # re-bootstrap is a no-op (restart safety), and ingest on top stays
    # idempotent — the restored warehouse absorbs a full replay
    assert warehouse.bootstrap_from_snapshot(spark, snapshot, wh) == []
    warehouse.write_tables(spark, tables, wh)
    for name in ("block_info", "messages", "scores", "last_commit_values"):
        assert warehouse.read_table(spark, wh, name).count() == tables[name].count()
