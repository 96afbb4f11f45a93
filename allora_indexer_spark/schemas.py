"""Explicit schemas for the ingest pipeline.

Input side mirrors the reference's wire shapes (schema-on-read JSON):
- raw block payload        — types.BlockQuery, /root/reference/types/block.go:107-156
- raw block_results events — BlockResult/Event/Attribute,
                             /root/reference/process_events.go:63-89
- decoded transactions     — types.Tx (messages as untyped maps),
                             /root/reference/types/tx.go:5-38; per-message
                             typed shapes /root/reference/types/messages.go

Output side is the reference's 23-table relational model
(/root/reference/db.go:178-525). SERIAL surrogate keys are replaced by
natural composite keys (height, tx_idx, msg_idx, ...) — Spark has no
INSERT..RETURNING, and natural keys make every write idempotent and
deterministic (SURVEY.md §2.2 K2/K7).

NUMERIC(72,18) narrows to DECIMAL(38,18): Spark's max precision is 38. The
raw string is preserved alongside every narrowed value (``*_raw`` columns)
for lossless round-trip, and the same Infinity/NaN guard the reference
applies (/root/reference/db.go:1715-1717) runs before every cast.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Wire schemas (input)
# ---------------------------------------------------------------------------


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


_PART_SET_HEADER = _s(_f("total", IntegerType()), _f("hash", StringType()))
_BLOCK_ID = _s(_f("hash", StringType()), _f("part_set_header", _PART_SET_HEADER))

# types.BlockQuery header (block.go:107-156); height/time arrive as strings.
RAW_BLOCK_SCHEMA = _s(
    _f("block_id", _BLOCK_ID),
    _f(
        "header",
        _s(
            _f("version", _s(_f("block", StringType()), _f("app", StringType()))),
            _f("chain_id", StringType()),
            _f("height", StringType()),
            _f("time", StringType()),
            _f("last_block_id", _BLOCK_ID),
            _f("last_commit_hash", StringType()),
            _f("data_hash", StringType()),
            _f("validators_hash", StringType()),
            _f("next_validators_hash", StringType()),
            _f("consensus_hash", StringType()),
            _f("app_hash", StringType()),
            _f("last_results_hash", StringType()),
            _f("evidence_hash", StringType()),
            _f("proposer_address", StringType()),
        ),
    ),
    # data.txs: opaque base64 tx blobs (block.go: Data.Txs)
    _f("data", _s(_f("txs", ArrayType(StringType())))),
    _f(
        "last_commit",
        _s(
            _f("height", StringType()),
            _f(
                "signatures",
                ArrayType(
                    _s(
                        _f("block_id_flag", StringType()),
                        _f("validator_address", StringType()),
                        _f("timestamp", StringType()),
                        _f("signature", StringType()),
                    )
                ),
            ),
        ),
    ),
)

# Event / Attribute (process_events.go:80-89)
ATTRIBUTE_SCHEMA = _s(_f("key", StringType()), _f("value", StringType()))
EVENT_SCHEMA = _s(
    _f("type", StringType()), _f("attributes", ArrayType(ATTRIBUTE_SCHEMA))
)

# BlockResult (process_events.go:63-78)
RAW_BLOCK_RESULTS_SCHEMA = _s(
    _f(
        "result",
        _s(
            _f("height", StringType()),
            _f("finalize_block_events", ArrayType(EVENT_SCHEMA)),
            _f(
                "txs_results",
                ArrayType(
                    _s(
                        _f("code", IntegerType()),
                        _f("gas_wanted", StringType()),
                        _f("gas_used", StringType()),
                        _f("events", ArrayType(EVENT_SCHEMA)),
                    )
                ),
            ),
        ),
    )
)

# Decoded tx (types/tx.go:5-38): body.messages kept as raw JSON strings —
# the schema-on-read analog of Go's map[string]interface{}; each message is
# re-parsed with its typed schema after @type dispatch.
TX_SCHEMA = _s(
    _f(
        "body",
        _s(
            _f("messages", ArrayType(StringType())),
            _f("memo", StringType()),
        ),
    ),
    _f(
        "auth_info",
        _s(_f("fee", _s(_f("gas_limit", StringType()), _f("payer", StringType())))),
    ),
    _f("signatures", ArrayType(StringType())),
)

# Typed message payloads (types/messages.go). All chain numerics are
# string-encoded on the wire; casts happen in the ingest plan.
_VALUE_WORKER = _s(_f("value", StringType()), _f("worker", StringType()))

# CreateNewTopic drifted across chain upgrades (S5): the reference carries
# the UNION of every epoch's fields in one Go struct
# (types/messages.go:3-22) and lets fields absent from a given epoch's
# decoder output come back empty — silently. We key the parse schema by
# decoder epoch instead (execute.go:82-109's binary table as data): the
# v0.2.14-era decoder emits the WASM-logic field set (loss_logic,
# inference_logic/method, preward_*, f_tolerance, default_arg); the
# v0.3.0+ decoders dropped those fields, so parsing them at a modern
# height is *declared* impossible rather than silently null.
MSG_CREATE_NEW_TOPIC_LEGACY_SCHEMA = _s(
    _f("@type", StringType()),
    _f("creator", StringType()),
    _f("metadata", StringType()),
    _f("loss_logic", StringType()),
    _f("loss_method", StringType()),
    _f("inference_logic", StringType()),
    _f("inference_method", StringType()),
    _f("epoch_length", StringType()),
    _f("ground_truth_lag", StringType()),
    _f("default_arg", StringType()),
    _f("pnorm", StringType()),
    _f("alpha_regret", StringType()),
    _f("preward_reputer", StringType()),
    _f("preward_inference", StringType()),
    _f("preward_forecast", StringType()),
    _f("f_tolerance", StringType()),
    _f("allow_negative", BooleanType()),
)

MSG_CREATE_NEW_TOPIC_MODERN_SCHEMA = _s(
    _f("@type", StringType()),
    _f("creator", StringType()),
    _f("metadata", StringType()),
    _f("loss_method", StringType()),
    _f("epoch_length", StringType()),
    _f("ground_truth_lag", StringType()),
    _f("pnorm", StringType()),
    _f("alpha_regret", StringType()),
    _f("allow_negative", BooleanType()),
)

# decoder version label -> parse schema for this family. Consumed by
# ingest.with_versioned_parse; extending another family to version-keyed
# parsing means adding its dict here and swapping its from_json call.
MSG_CREATE_NEW_TOPIC_SCHEMAS = {
    "v0.2.14": MSG_CREATE_NEW_TOPIC_LEGACY_SCHEMA,
    "v0.3.0": MSG_CREATE_NEW_TOPIC_MODERN_SCHEMA,
    "v0.4.0": MSG_CREATE_NEW_TOPIC_MODERN_SCHEMA,
    "v0.5.0": MSG_CREATE_NEW_TOPIC_MODERN_SCHEMA,
    "v0.6.0": MSG_CREATE_NEW_TOPIC_MODERN_SCHEMA,
}

# Union alias kept for schema-on-read callers (DDL export, tests).
MSG_CREATE_NEW_TOPIC_SCHEMA = MSG_CREATE_NEW_TOPIC_LEGACY_SCHEMA

MSG_SEND_SCHEMA = _s(
    _f("@type", StringType()),
    _f("from_address", StringType()),
    _f("to_address", StringType()),
    _f(
        "amount",
        ArrayType(_s(_f("denom", StringType()), _f("amount", StringType()))),
    ),
)

MSG_FUND_TOPIC_SCHEMA = _s(
    _f("@type", StringType()),
    _f("sender", StringType()),
    _f("topic_id", StringType()),
    _f("amount", StringType()),
)

MSG_REGISTER_SCHEMA = _s(
    _f("@type", StringType()),
    _f("sender", StringType()),
    _f("topic_id", StringType()),
    _f("owner", StringType()),
    _f("lib_p2p_key", StringType()),
    _f("multi_address", StringType()),
    _f("is_reputer", BooleanType()),
)

# lib_p2p_key is a WASM-era emissions.v1 concept (the reference's DDL calls
# the column worker_libp2pkey and its union struct marks the field
# omitempty, /root/reference/types/messages.go:158-166); modern decoder
# epochs declare it away, so a modern registration yields NULL by schema,
# not by silent parse miss — same legacy/modern split as the topic family.
MSG_REGISTER_MODERN_SCHEMA = _s(
    _f("@type", StringType()),
    _f("sender", StringType()),
    _f("topic_id", StringType()),
    _f("owner", StringType()),
    _f("multi_address", StringType()),
    _f("is_reputer", BooleanType()),
)

MSG_REGISTER_SCHEMAS = {
    "v0.2.14": MSG_REGISTER_SCHEMA,
    "v0.3.0": MSG_REGISTER_MODERN_SCHEMA,
    "v0.4.0": MSG_REGISTER_MODERN_SCHEMA,
    "v0.5.0": MSG_REGISTER_MODERN_SCHEMA,
    "v0.6.0": MSG_REGISTER_MODERN_SCHEMA,
}

_NONCE = _s(_f("block_height", StringType()))

WORKER_DATA_BUNDLE_SCHEMA = _s(
    _f("worker", StringType()),
    _f("nonce", _NONCE),
    _f("topic_id", StringType()),
    _f(
        "inference_forecasts_bundle",
        _s(
            _f(
                "forecast",
                _s(
                    _f("topic_id", StringType()),
                    _f("extra_data", StringType()),
                    _f("forecaster", StringType()),
                    _f("block_height", StringType()),
                    _f("forecast_elements", ArrayType(_s(
                        _f("inferer", StringType()), _f("value", StringType())
                    ))),
                ),
            ),
            _f(
                "inference",
                _s(
                    _f("value", StringType()),
                    _f("inferer", StringType()),
                    _f("topic_id", StringType()),
                    _f("extra_data", StringType()),
                    _f("block_height", StringType()),
                    _f("proof", StringType()),
                ),
            ),
        ),
    ),
    _f("inferences_forecasts_bundle_signature", StringType()),
    _f("pubkey", StringType()),
)

MSG_WORKER_PAYLOAD_SCHEMA = _s(
    _f("@type", StringType()),
    _f("sender", StringType()),
    _f("worker_data_bundle", WORKER_DATA_BUNDLE_SCHEMA),
)

MSG_BULK_WORKER_PAYLOAD_SCHEMA = _s(
    _f("@type", StringType()),
    _f("nonce", _NONCE),
    _f("sender", StringType()),
    _f("topic_id", StringType()),
    _f("worker_data_bundles", ArrayType(WORKER_DATA_BUNDLE_SCHEMA)),
)

VALUE_BUNDLE_SCHEMA = _s(
    _f("reputer", StringType()),
    _f("topic_id", StringType()),
    _f("extra_data", StringType()),
    _f("naive_value", StringType()),
    _f("combined_value", StringType()),
    _f("inferer_values", ArrayType(_VALUE_WORKER)),
    _f("forecaster_values", ArrayType(_VALUE_WORKER)),
    _f(
        "reputer_request_nonce",
        _s(_f("worker_nonce", _NONCE), _f("reputer_nonce", _NONCE)),
    ),
    _f("one_out_inferer_values", ArrayType(_VALUE_WORKER)),
    _f("one_in_forecaster_values", ArrayType(_VALUE_WORKER)),
    _f("one_out_forecaster_values", ArrayType(_VALUE_WORKER)),
    _f(
        "one_out_inferer_forecaster_values",
        ArrayType(
            _s(
                _f("forecaster", StringType()),
                _f("one_out_inferer_values", ArrayType(_VALUE_WORKER)),
            )
        ),
    ),
)

MSG_REPUTER_PAYLOAD_SCHEMA = _s(
    _f("@type", StringType()),
    _f("sender", StringType()),
    _f(
        "reputer_value_bundle",
        _s(
            _f("pubkey", StringType()),
            _f("signature", StringType()),
            _f("value_bundle", VALUE_BUNDLE_SCHEMA),
        ),
    ),
)

MSG_BULK_REPUTER_PAYLOAD_SCHEMA = _s(
    _f("@type", StringType()),
    _f("sender", StringType()),
    _f("topic_id", StringType()),
    _f(
        "reputer_request_nonce",
        _s(_f("worker_nonce", _NONCE), _f("reputer_nonce", _NONCE)),
    ),
    _f(
        "reputer_value_bundles",
        ArrayType(
            _s(
                _f("pubkey", StringType()),
                _f("signature", StringType()),
                _f("value_bundle", VALUE_BUNDLE_SCHEMA),
            )
        ),
    ),
)

# Per-epoch dicts for the remaining versioned-parse families. The reference
# union structs (types/messages.go) show no field drift across today's
# epochs for these shapes, so every label maps to the same schema object —
# with_versioned_parse collapses that to a single parse (zero cost) while
# keeping the dispatch seam + epoch-coverage fail-fast in place: a future
# epoch that drifts gets its own entry here, nothing else moves.
_ALL_EPOCHS = ("v0.2.14", "v0.3.0", "v0.4.0", "v0.5.0", "v0.6.0")

MSG_FUND_TOPIC_SCHEMAS = {v: MSG_FUND_TOPIC_SCHEMA for v in _ALL_EPOCHS}
MSG_WORKER_PAYLOAD_SCHEMAS = {v: MSG_WORKER_PAYLOAD_SCHEMA for v in _ALL_EPOCHS}
MSG_REPUTER_PAYLOAD_SCHEMAS = {
    v: MSG_REPUTER_PAYLOAD_SCHEMA for v in _ALL_EPOCHS
}

# Message @type suffixes → route names (process_tx.go:66-170 dispatch).
MSG_ROUTES = {
    "MsgCreateNewTopic": "create_new_topic",
    "MsgFundTopic": "fund_topic",
    "MsgAddStake": "add_stake",
    "MsgSend": "send",
    "MsgRegister": "register",
    "MsgInsertBulkWorkerPayload": "bulk_worker_payload",
    "MsgInsertWorkerPayload": "worker_payload",
    "MsgInsertBulkReputerPayload": "bulk_reputer_payload",
    "MsgInsertReputerPayload": "reputer_payload",
}

# The 23 output tables (db.go:54-78); used by the warehouse writers and the
# idempotence keys (unique constraints db.go:1654-1686 → natural merge keys).
# Postgres ENUM domain for bundle-value type tags (reputerValueType /
# networklossBundleValueType, db.go:340-350, 442-452). The DDL declares 5
# labels, but the reference's own inserts write a 6th
# ('OneOutInfererForecasterValues', db.go:1628-1646) — we validate against
# what the reference WRITES, and note the DDL/insert divergence here.
VALUE_BUNDLE_TAGS = [
    "InfererValues",
    "ForecasterValues",
    "OneOutInfererValues",
    "OneInForecasterValues",
    "OneOutForecasterValues",
    "OneOutInfererForecasterValues",
]

# CHECK-style column domains per table (Spark has no enum type; the MERGE
# keys + these expectations replace Postgres constraints — K8).
ENUM_DOMAINS: dict[str, dict[str, list[str]]] = {
    "bundle_values": {"reputer_value_type": VALUE_BUNDLE_TAGS},
    "networkloss_bundle_values": {"reputer_value_type": VALUE_BUNDLE_TAGS},
}

TABLE_KEYS: dict[str, list[str]] = {
    "block_info": ["height"],
    "consensus_params": ["height"],
    # UNIQUE(height, hash) per db.go:1662-1668 — an in-block duplicate tx
    # is ONE message row (tx_idx/msg_idx of the first occurrence survive
    # as ordinary columns)
    "messages": ["height", "hash"],
    "topics": ["id"],
    # addr_key = coalesce(address, pub_key): the table holds BOTH
    # address rows and reputer-bundle pubkey-only rows (address NULL,
    # process_tx.go:202/252), and natural keys must be non-null.
    # Pre-upgrade warehouses (key was ['address']) lack the column —
    # KEY_DERIVATIONS below is the read-side migration path.
    "addresses": ["addr_key"],
    "worker_registrations": ["message_height", "message_id", "topic_id"],
    "transfers": ["message_height", "message_id"],
    "inferences": ["message_height", "message_id", "bundle_idx"],
    "forecasts": ["message_height", "message_id", "bundle_idx"],
    "forecast_values": ["message_height", "message_id", "bundle_idx", "element_idx"],
    "reputer_payload": ["message_height", "message_id", "bundle_idx"],
    "reputer_bundles": ["message_height", "message_id", "bundle_idx"],
    "bundle_values": [
        "message_height", "message_id", "bundle_idx", "reputer_value_type", "value_idx"
    ],
    "events": ["height", "hash", "type"],
    "scores": ["height", "topic_id", "type", "address"],
    "rewards": ["height", "topic_id", "type", "address"],
    "networklosses": ["height_tx", "height", "topic_id"],
    "networkloss_bundle_values": [
        "height_tx", "height", "topic_id", "reputer_value_type", "value_idx"
    ],
    "ema_scores": ["topic_id", "type", "address", "height"],
    "last_commit_values": ["topic_id", "is_worker"],
    "tokenomics": ["height_tx"],
    "topic_rewards": ["topic_id", "height_tx"],
    "topic_forecasting_scores": ["topic_id", "height_tx"],
    "ecosystem_token_mint": ["height_tx", "block_height"],
    "reward_current_block_emission": ["height_tx", "block_height"],
}


# Read-side derivations for natural-key columns that were introduced
# AFTER their table first shipped (the online-migration analog of the
# reference's addColumn, db.go:1699-1708). A warehouse written before the
# key change lacks the column entirely — and a half-migrated plain dir can
# sample the NEW schema and read the old files' key as NULL — so probes
# must derive the key from the source columns instead of failing with
# AnalysisException (or worse: NULL keys silently vacate the idempotent
# anti-join and every replayed row re-admits). Expressions are ANSI SQL
# over the table's own columns; warehouse.existing_keys_in_range applies
# them as coalesce(key, derivation) so mixed old/new file sets heal too.
KEY_DERIVATIONS: dict[str, dict[str, str]] = {
    "addresses": {"addr_key": "coalesce(address, pub_key)"},
}


# Logical foreign keys between the 23 tables — the relationships the
# reference's DDL declares (db.go:359-389; Postgres enforcement is
# commented out there, the ingest order is what really guarantees them)
# plus the parent/child cascades the builders create (K7). On a lake
# warehouse nothing enforces these at write time — parents-before-children
# ordering in write_tables() is the operational guarantee — so
# warehouse.integrity_report() exists to AUDIT them, the after-the-fact
# twin of a constraint. Each entry: child → [(child_cols, parent,
# parent_cols), ...]. NULL child keys are exempt (SQL FK semantics — F7's
# quarantine rows must not read as orphans).
TABLE_FKS: dict[str, list[tuple[list[str], str, list[str]]]] = {
    "messages": [(["height"], "block_info", ["height"])],
    "events": [(["height"], "block_info", ["height"])],
    "inferences": [
        (["message_height", "message_id"], "messages", ["height", "message_id"])
    ],
    "forecasts": [
        (["message_height", "message_id"], "messages", ["height", "message_id"])
    ],
    "reputer_payload": [
        (["message_height", "message_id"], "messages", ["height", "message_id"])
    ],
    "transfers": [
        (["message_height", "message_id"], "messages", ["height", "message_id"])
    ],
    "worker_registrations": [
        (["message_height", "message_id"], "messages", ["height", "message_id"]),
        (["topic_id"], "topics", ["id"]),
    ],
    "forecast_values": [
        (
            ["message_height", "message_id", "bundle_idx"],
            "forecasts",
            ["message_height", "message_id", "bundle_idx"],
        )
    ],
    "reputer_bundles": [
        (
            ["message_height", "message_id", "bundle_idx"],
            "reputer_payload",
            ["message_height", "message_id", "bundle_idx"],
        )
    ],
    "bundle_values": [
        (
            ["message_height", "message_id", "bundle_idx"],
            "reputer_bundles",
            ["message_height", "message_id", "bundle_idx"],
        )
    ],
    "networkloss_bundle_values": [
        (
            ["height_tx", "height", "topic_id"],
            "networklosses",
            ["height_tx", "height", "topic_id"],
        )
    ],
    "scores": [(["topic_id"], "topics", ["id"])],
    "rewards": [(["topic_id"], "topics", ["id"])],
    "ema_scores": [(["topic_id"], "topics", ["id"])],
    "networklosses": [(["topic_id"], "topics", ["id"])],
    "topic_rewards": [(["topic_id"], "topics", ["id"])],
    "topic_forecasting_scores": [(["topic_id"], "topics", ["id"])],
    "last_commit_values": [(["topic_id"], "topics", ["id"])],
}


# ---------------------------------------------------------------------------
# DDL export (round 17): the ingest builders batch their projections into
# single selectExpr calls (see functions/events.py's SQL-twins note), and
# an inline `from_json(col, '<ddl>')` needs the schema as DDL text. The
# conversion goes through the JVM's own StructType.toDDL — the StructType
# object above stays the single source of truth — and is cached per
# schema object, so it costs two py4j calls once per process.
# ---------------------------------------------------------------------------

_DDL_CACHE: dict[int, str] = {}


def ddl(spark, schema: StructType) -> str:
    """DDL text of ``schema`` (e.g. "`a` STRING, `b` BIGINT"), suitable
    for inline SQL ``from_json``. Cached per schema object identity."""
    out = _DDL_CACHE.get(id(schema))
    if out is None:
        jdt = spark._jvm.org.apache.spark.sql.types.DataType.fromJson(
            schema.json()
        )
        out = jdt.toDDL()
        _DDL_CACHE[id(schema)] = out
    return out
