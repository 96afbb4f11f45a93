"""S5 version-routed decode: epoch selection and per-epoch parse schemas.

The reference picks a decoder binary per height epoch
(/root/reference/execute.go:82-109); the engine turns that table into a
decoder_version column and keys parse schemas on it. These tests pin the
epoch boundaries (the round-2 ordering bug would have flipped them) and
prove the SAME message JSON parses differently on either side of an epoch
edge — version-correct parsing, not a silent union-schema null.
"""

import json

import pytest
from pyspark.sql import functions as F

from allora_indexer_spark import schemas
from allora_indexer_spark.plans.ingest import (
    decoder_version,
    topics,
    with_versioned_parse,
)

# (height, expected version) — each epoch edge from execute.go:88-98 plus a
# far-future height; the edge-1 row pins the previous epoch's upper end.
EPOCH_CASES = [
    (0, "v0.2.14"),
    (101, "v0.2.14"),
    (811999, "v0.2.14"),
    (812000, "v0.3.0"),
    (1004549, "v0.3.0"),
    (1004550, "v0.4.0"),
    (1296199, "v0.4.0"),
    (1296200, "v0.5.0"),
    (1574266, "v0.5.0"),
    (1574267, "v0.6.0"),
    (1600000, "v0.6.0"),
]


def test_decoder_version_epoch_boundaries(spark):
    df = spark.createDataFrame(
        [(h,) for h, _ in EPOCH_CASES], "height long"
    ).withColumn("ver", decoder_version(F.col("height")))
    got = {r.height: r.ver for r in df.collect()}
    assert got == {h: v for h, v in EPOCH_CASES}


TOPIC_JSON = json.dumps(
    {
        "@type": "/emissions.v1.MsgCreateNewTopic",
        "creator": "alice",
        "metadata": "m1",
        "loss_logic": "ll",
        "loss_method": "lm",
        "inference_logic": "il",
        "inference_method": "im",
        "epoch_length": "10",
        "ground_truth_lag": "5",
        "default_arg": "da",
        "pnorm": "3",
        "alpha_regret": "0.1",
        "preward_reputer": "0.5",
        "preward_inference": "0.3",
        "preward_forecast": "0.2",
        "f_tolerance": "0.01",
        "allow_negative": True,
    }
)


def _msgs_at(spark, heights):
    rows = [
        (h, 0, 0, h * 1_000_000, "/emissions.v1.MsgCreateNewTopic", "alice",
         TOPIC_JSON, 1)
        for h in heights
    ]
    df = spark.createDataFrame(
        rows,
        "height long, tx_idx int, msg_idx int, message_id long, type string,"
        " sender string, data string, hash long",
    )
    return df.withColumn("decoder_version", decoder_version(F.col("height")))


def test_same_payload_parses_by_epoch(spark):
    """The identical CreateNewTopic JSON at 811999 vs 812000: the legacy
    epoch's decoder knows the WASM-logic fields, the modern one does not —
    even though the bytes carry them."""
    t = topics(_msgs_at(spark, [811999, 812000])).orderBy("message_height")
    legacy, modern = t.collect()
    assert legacy["message_height"] == 811999
    assert legacy["loss_logic"] == "ll"
    assert legacy["preward_reputer"] == "0.5"
    assert legacy["f_tolerance"] == "0.01"
    assert modern["message_height"] == 812000
    assert modern["loss_logic"] is None
    assert modern["preward_reputer"] is None
    assert modern["f_tolerance"] is None
    # shared fields parse identically on both sides
    for row in (legacy, modern):
        assert row["creator"] == "alice"
        assert row["loss_method"] == "lm"
        assert row["epoch_length"] == "10"
        assert row["pnorm"] == "3"
        assert row["allow_negative"] is True


@pytest.mark.parametrize(
    "height,expect_legacy",
    [(0, True), (811999, True), (812000, False), (1600000, False)],
)
def test_versioned_parse_field_gating(spark, height, expect_legacy):
    df = with_versioned_parse(
        _msgs_at(spark, [height]),
        F.col("data"),
        F.col("decoder_version"),
        schemas.MSG_CREATE_NEW_TOPIC_SCHEMAS,
    )
    row = df.select("m.loss_logic", "m.metadata").collect()[0]
    assert (row["loss_logic"] == "ll") is expect_legacy
    assert row["metadata"] == "m1"


def test_versioned_parse_rejects_unmapped_epoch(spark):
    """ADVICE r3: a DECODER_EPOCHS label absent from the schema dict must be
    a loud error at plan time, not all-NULL structs for that epoch's rows."""
    partial = {
        k: v for k, v in schemas.MSG_CREATE_NEW_TOPIC_SCHEMAS.items()
        if k != "v0.6.0"
    }
    with pytest.raises(ValueError, match="v0.6.0"):
        with_versioned_parse(
            _msgs_at(spark, [101]),
            F.col("data"),
            F.col("decoder_version"),
            partial,
        )


def test_versioned_parse_one_parse_per_distinct_schema(spark):
    """Cost guard: 5 versions but 2 distinct schemas must evaluate exactly
    2 from_json parses per row — re-referencing the parse per union field
    would let the optimizer split it into one pruned parse per field."""
    df = with_versioned_parse(
        _msgs_at(spark, [101]),
        F.col("data"),
        F.col("decoder_version"),
        schemas.MSG_CREATE_NEW_TOPIC_SCHEMAS,
    ).select("m.loss_logic", "m.metadata", "m.creator", "m.pnorm")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") == 2
