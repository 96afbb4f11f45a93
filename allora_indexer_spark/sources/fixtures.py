"""Deterministic reference-shaped ingest fixtures (FIXTURES.md §B).

Generates JSONL block payloads (B1), block_results event payloads (B2) and
base64-embedded decoded transactions (B3) that exercise every dispatch arm of
the ingest plan: all 8+ message kinds + an unknown kind, all 11 whitelisted
event kinds + unknown/invalid kinds, version-agnostic prefixes
(emissions.v1 … v12, mint.*), quoted-scalar / JSON-array / nested-object
attribute encodings, an Infinity score that must be quarantined, a duplicated
block (idempotence), and events on both the finalize and per-tx streams.

The real chain feeds the same shapes through `allorad query block` /
`block_results` (/root/reference/process_block.go:29-59,
process_events.go:92-116); the tx blob here is base64 of the decoded JSON,
standing in for the `allorad tx decode` subprocess hop
(/root/reference/execute.go:82-109).
"""

from __future__ import annotations

import base64
import json
import os

CHAIN_ID = "allora-testnet-fixture"
VALIDATORS = ["valoper1aaa", "valoper1bbb", "valoper1ccc"]


def _b64(obj: dict) -> str:
    return base64.b64encode(json.dumps(obj).encode()).decode()


def _tx(*messages: dict) -> str:
    return _b64(
        {
            "body": {"messages": [json.dumps(m) for m in messages], "memo": ""},
            "auth_info": {"fee": {"gas_limit": "200000", "payer": ""}},
            "signatures": ["sig0"],
        }
    )


def _msg(type_suffix: str, **fields) -> dict:
    return {"@type": f"/emissions.v1.{type_suffix}", **fields}


def _wdb(worker: str, topic: str, height: str, value: str, n_elements: int = 2) -> dict:
    """A WorkerDataBundle (types/messages.go:40-68)."""
    return {
        "worker": worker,
        "nonce": {"block_height": height},
        "topic_id": topic,
        "inference_forecasts_bundle": {
            "inference": {
                "value": value,
                "inferer": worker,
                "topic_id": topic,
                "extra_data": "",
                "block_height": height,
                "proof": f"proof-{worker}",
            },
            "forecast": {
                "topic_id": topic,
                "extra_data": "",
                "forecaster": worker,
                "block_height": height,
                "forecast_elements": [
                    {"inferer": f"inferer{i}", "value": f"{i}.25"}
                    for i in range(n_elements)
                ],
            },
        },
        "inferences_forecasts_bundle_signature": f"bsig-{worker}",
        "pubkey": f"pk-{worker}",
    }


def _value_bundle(reputer: str, topic: str, h: str) -> dict:
    """A MsgValueBundle with all six parallel arrays (types/messages.go:70-111)."""
    vw = lambda v, w: {"value": v, "worker": w}  # noqa: E731
    return {
        "reputer": reputer,
        "topic_id": topic,
        "extra_data": "",
        "naive_value": "0.111",
        "combined_value": "0.222",
        "inferer_values": [vw("1.1", "w1"), vw("1.2", "w2")],
        "forecaster_values": [vw("2.1", "w1")],
        "reputer_request_nonce": {
            "worker_nonce": {"block_height": h},
            "reputer_nonce": {"block_height": h},
        },
        "one_out_inferer_values": [vw("3.1", "w1")],
        "one_in_forecaster_values": [vw("4.1", "w2")],
        "one_out_forecaster_values": [vw("5.1", "w1"), vw("5.2", "w2")],
        "one_out_inferer_forecaster_values": [
            {
                "forecaster": "w9",
                "one_out_inferer_values": [vw("6.1", "w1"), vw("6.2", "w2")],
            }
        ],
    }


def _event(etype: str, **attrs: str) -> dict:
    return {
        "type": etype,
        "attributes": [{"key": k, "value": v} for k, v in attrs.items()],
    }


def _q(v) -> str:
    """Quoted-scalar attribute encoding ('\"1\"')."""
    return json.dumps(str(v))


def _j(v) -> str:
    """JSON attribute encoding (arrays / objects)."""
    return json.dumps(v)


def _block(height: int, txs: list[str]) -> dict:
    h = str(height)
    return {
        "block_id": {"hash": f"BH{h}", "part_set_header": {"total": 1, "hash": f"PH{h}"}},
        "header": {
            "version": {"block": "11", "app": "0"},
            "chain_id": CHAIN_ID,
            "height": h,
            "time": f"2024-06-01T00:{height - 100:02d}:00Z",
            "last_block_id": {
                "hash": f"BH{height - 1}",
                "part_set_header": {"total": 1, "hash": f"PH{height - 1}"},
            },
            "last_commit_hash": f"LC{h}",
            "data_hash": f"DH{h}",
            "validators_hash": f"VH{h}",
            "next_validators_hash": f"NV{h}",
            "consensus_hash": f"CH{h}",
            "app_hash": f"AH{h}",
            "last_results_hash": f"LR{h}",
            "evidence_hash": f"EH{h}",
            "proposer_address": VALIDATORS[height % len(VALIDATORS)],
        },
        "data": {"txs": txs},
        "last_commit": {
            "height": str(height - 1),
            "signatures": [
                {
                    "block_id_flag": "BLOCK_ID_FLAG_COMMIT",
                    "validator_address": v,
                    "timestamp": f"2024-06-01T00:{height - 100:02d}:00Z",
                    "signature": f"S{h}{i}",
                }
                for i, v in enumerate(VALIDATORS)
            ],
        },
    }


def build_blocks() -> list[dict]:
    blocks = [
        _block(101, [
            _tx(
                _msg("MsgCreateNewTopic", creator="alice", metadata="topic-one",
                     loss_logic="ll", loss_method="lm", inference_logic="il",
                     inference_method="im", epoch_length="10",
                     ground_truth_lag="5", default_arg="da", pnorm="3",
                     alpha_regret="0.1", preward_reputer="0.5",
                     preward_inference="0.3", preward_forecast="0.2",
                     f_tolerance="0.01", allow_negative=True),
                {"@type": "/cosmos.bank.v1beta1.MsgSend",
                 "from_address": "bob", "to_address": "carol",
                 "amount": [{"denom": "uallo", "amount": "1000"},
                            {"denom": "ignored", "amount": "7"}]},
                {"@type": "/cosmos.gov.v1.MsgVote", "voter": "zed"},  # skipped arm
            ),
        ]),
        _block(102, [
            _tx(_msg("MsgRegister", sender="dave", topic_id="1", owner="dave",
                     lib_p2p_key="p2p-dave", multi_address="/ip4/1.2.3.4",
                     is_reputer=False)),
            _tx(_msg("MsgFundTopic", sender="alice", topic_id="1", amount="500")),
        ]),
        _block(103, [
            _tx(_msg("MsgInsertWorkerPayload", sender="dave",
                     worker_data_bundle=_wdb("dave", "1", "103", "3.14"))),
        ]),
        _block(104, [
            _tx({"@type": "/emissions.v2.MsgInsertReputerPayload",
                 "sender": "erin",
                 "reputer_value_bundle": {
                     "pubkey": "pk-erin", "signature": "sig-erin",
                     "value_bundle": _value_bundle("erin", "1", "103"),
                 }}),
        ]),
        _block(105, [
            # bulk forms carry the /emissions.v1 prefix: the reference
            # dispatch only accepts them from that proto family
            # (process_tx.go:120-131)
            _tx({"@type": "/emissions.v1.MsgInsertBulkWorkerPayload",
                 "sender": "dave", "topic_id": "1",
                 "nonce": {"block_height": "105"},
                 "worker_data_bundles": [
                     _wdb("dave", "1", "105", "2.71", 1),
                     _wdb("fred", "1", "105", "not-a-number", 1),  # F8 gate
                 ]}),
            # foreign-family bulk: a later-era type claiming the bulk form
            # must be IGNORED, exactly as the reference's v1-prefix check
            # drops it — its bundle would otherwise fabricate an inference
            _tx({"@type": "/emissions.v3.MsgInsertBulkWorkerPayload",
                 "sender": "mallory", "topic_id": "1",
                 "nonce": {"block_height": "105"},
                 "worker_data_bundles": [
                     _wdb("mallory", "1", "105", "9.99", 1),
                 ]}),
            _tx(_msg("MsgCreateNewTopic", creator="gail", metadata="topic-two",
                     loss_logic="ll", loss_method="lm", inference_logic="il",
                     inference_method="im", epoch_length="20",
                     ground_truth_lag="10", default_arg="da", pnorm="2",
                     alpha_regret="0.2", preward_reputer="0.4",
                     preward_inference="0.4", preward_forecast="0.2",
                     f_tolerance="0.02", allow_negative=False)),
        ]),
        _block(106, [
            _tx({"@type": "/emissions.v1.MsgInsertBulkReputerPayload",
                 "sender": "erin", "topic_id": "2",
                 "reputer_request_nonce": {
                     "worker_nonce": {"block_height": "105"},
                     "reputer_nonce": {"block_height": "106"},
                 },
                 "reputer_value_bundles": [
                     {"pubkey": "pk-erin", "signature": "s1",
                      "value_bundle": _value_bundle("erin", "2", "105")},
                     {"pubkey": "pk-hank", "signature": "s2",
                      "value_bundle": _value_bundle("hank", "2", "105")},
                 ]}),
            _tx(_msg("MsgAddStake", sender="bob", topic_id="2", amount="250")),
            # byte-identical duplicate tx WITHIN the block: collapses to one
            # message row under UNIQUE(height, hash) (db.go:1662-1668), the
            # first occurrence (tx_idx 1) winning
            _tx(_msg("MsgAddStake", sender="bob", topic_id="2", amount="250")),
        ]),
    ]
    # duplicated block: replaying the same height must leave tables unchanged
    blocks.append(_block(103, blocks[2]["data"]["txs"]))
    return blocks


def build_block_results() -> list[dict]:
    def res(height: int, finalize: list[dict], per_tx: list[list[dict]] = ()) -> dict:
        return {
            "result": {
                "height": str(height),
                "finalize_block_events": finalize,
                "txs_results": [
                    {"code": 0, "gas_wanted": "100", "gas_used": "90", "events": evs}
                    for evs in per_tx
                ],
            }
        }

    return [
        res(101, [
            _event("emissions.v1.EventScoresSet",
                   topic_id=_q(1), actor_type=_q("inferer"), block_height=_q(101),
                   addresses=_j(["w1", "w2", "w3"]),
                   scores=_j(["1.5", "2.5", "3.5"])),
            _event("unlisted.v1.EventSomethingElse", foo=_q("bar")),
            _event("noversion", foo=_q("bar")),
        ]),
        res(102, [
            _event("emissions.v2.EventRewardsSettled",
                   topic_id=_q(1), actor_type=_q("reputer"), block_height=_q(102),
                   addresses=_j(["r1", "r2"]), rewards=_j(["10.5", "20.25"])),
        ], [[
            _event("mint.v2.EventTokenomicsSet",
                   sender=_q("mintmod"),
                   circulating_supply=_q("1000000.5"),
                   emissions_amount=_q("123.25"),
                   staked_token_amount=_q("555.125")),
        ]]),
        res(103, [
            _event("emissions.v3.EventNetworkLossSet",
                   topic_id=_q(1), block_height=_q(103),
                   value_bundle=_j(_value_bundle("netloss", "1", "103"))),
            _event("emissions.v12.EventForecastTaskScoreSet",
                   topic_id=_q(1), score=_q("0.875")),
        ]),
        res(104, [
            _event("emissions.v4.EventWorkerLastCommitSet",
                   topic_id=_q(1), block_height=_q(104),
                   nonce=_j({"block_height": "103"})),
            _event("emissions.v4.EventReputerLastCommitSet",
                   topic_id=_q(1), block_height=_q(104),
                   nonce=_j({"block_height": "103"})),
        ], [[
            _event("mint.v1.EventEcosystemTokenMintSet",
                   sender=_q("mintmod"), block_height=_q(104),
                   token_amount=_q("42.125")),
        ]]),
        res(105, [
            _event("emissions.v5.EventEMAScoresSet",
                   topic_id=_q(1), actor_type=_q("inferer"), nonce=_q(105),
                   addresses=_j(["w1", "w2"]), scores=_j(["0.5", "0.75"]),
                   is_active=_j([True, False])),
            _event("emissions.v5.EventTopicRewardsSet",
                   block_height=_q(105),
                   topic_ids=_j(["1", "2"]), rewards=_j(["100.5", "200.25"])),
        ]),
        res(106, [
            _event("mint.v3.EventRewardCurrentBlockEmission",
                   sender=_q("mintmod"), block_height=_q(106),
                   token_amount=_q("7.625")),
            # later worker commit for topic 1 — keep-latest must pick this one
            _event("emissions.v4.EventWorkerLastCommitSet",
                   topic_id=_q(1), block_height=_q(106),
                   nonce=_j({"block_height": "105"})),
            # Infinity score → quarantined by the numeric guard, row dropped
            _event("emissions.v1.EventScoresSet",
                   topic_id=_q(2), actor_type=_q("inferer"), block_height=_q(106),
                   addresses=_j(["w1", "w2"]),
                   scores=_j(["Infinity", "4.5"])),
        ]),
        # duplicate of height 103's results (idempotence)
        res(103, [
            _event("emissions.v3.EventNetworkLossSet",
                   topic_id=_q(1), block_height=_q(103),
                   value_bundle=_j(_value_bundle("netloss", "1", "103"))),
            _event("emissions.v12.EventForecastTaskScoreSet",
                   topic_id=_q(1), score=_q("0.875")),
        ]),
    ]


def write_fixtures(out_dir: str) -> tuple[str, str]:
    """Writes blocks/ and block_results/ feed DIRECTORIES (one JSONL file
    each) — directories so the same paths serve both batch reads and the
    file streaming source."""
    blocks_dir = os.path.join(out_dir, "blocks")
    results_dir = os.path.join(out_dir, "block_results")
    os.makedirs(blocks_dir, exist_ok=True)
    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(blocks_dir, "part-000.jsonl"), "w") as f:
        for b in build_blocks():
            f.write(json.dumps(b) + "\n")
    with open(os.path.join(results_dir, "part-000.jsonl"), "w") as f:
        for r in build_block_results():
            f.write(json.dumps(r) + "\n")
    return blocks_dir, results_dir


def build_consensus_params() -> list[dict]:
    """One-shot consensus params snapshot (S7; the reference fetches this
    once per run via `query consensus params`)."""
    return [
        {
            "height": "101",
            "params": {
                "block": {"max_bytes": "22020096", "max_gas": "-1"},
                "evidence": {
                    "max_age_num_blocks": "100000",
                    "max_age_duration": "172800s",
                    "max_bytes": "1048576",
                },
                "validator": {"pub_key_types": ["ed25519"]},
            },
        }
    ]


def write_consensus_params(out_dir: str) -> str:
    d = os.path.join(out_dir, "consensus_params")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part-000.jsonl"), "w") as f:
        for p in build_consensus_params():
            f.write(json.dumps(p) + "\n")
    return d
