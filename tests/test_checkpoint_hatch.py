"""The reliable-checkpoint escape hatch (round 17, VERDICT r16 item 6):
every loop/reuse pin in the engine goes through tables.pin, which is a
localCheckpoint by default and a RELIABLE df.checkpoint when the session
has a checkpoint directory configured. These tests pin (a) the dispatch
contract and (b) that the iterative q48 component loop converges to the
same labels under the reliable path — the 100 TB fault-tolerance flag
must not change any result."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from allora_indexer_spark.tables import pin, pin_lazy


def _set_checkpoint_dir(spark, path):
    spark.sparkContext.setCheckpointDir(path)


def _clear_checkpoint_dir(spark):
    # SparkContext has no public unset; restore the default (no dir) via
    # the underlying Scala var so later tests keep the local-mode path
    sc = spark.sparkContext
    empty = sc._jvm.scala.Option.empty()
    getattr(sc._jsc.sc(), "checkpointDir_$eq")(empty)


def test_pin_dispatches_on_checkpoint_dir(spark, tmp_path):
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    try:
        # default: local checkpoint, no files under the (unset) dir
        out = pin(df)
        assert out.count() == 10
        _set_checkpoint_dir(spark, str(tmp_path / "ck"))
        out2 = pin(df)
        assert out2.count() == 10
        # a reliable checkpoint writes RDD files under the configured dir
        found = [
            f
            for root, _, files in os.walk(tmp_path / "ck")
            for f in files
        ]
        assert found, "reliable checkpoint wrote no files"
        # lazy form: materialized by the first action, same contract
        out3 = pin_lazy(df.withColumn("w", F.col("id") + 1))
        assert out3.count() == 10
    finally:
        _clear_checkpoint_dir(spark)


def test_connected_components_identical_under_reliable_checkpoint(
    spark, tmp_path
):
    from allora_indexer_spark.operators.dedup import connected_components

    vertices = spark.createDataFrame(
        [(i,) for i in range(1, 11)], "doc_id LONG"
    )
    # two chains + one isolated vertex cluster: 1-2-3-4, 5-6, 7..10 isolated
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "src LONG, dst LONG"
    )
    base = {
        (r.doc_id, r.component, r.is_keeper)
        for r in connected_components(vertices, edges).collect()
    }
    try:
        _set_checkpoint_dir(spark, str(tmp_path / "ck2"))
        reliable = {
            (r.doc_id, r.component, r.is_keeper)
            for r in connected_components(vertices, edges).collect()
        }
    finally:
        _clear_checkpoint_dir(spark)
    assert reliable == base
    assert {(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5)} <= {
        (d, c) for d, c, _ in base
    }
