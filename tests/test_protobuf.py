"""Protobuf wire decode — ports the reference ProtobufConverterTests
fixtures (ProtobufConverterTests.kt; messages from
src/test/proto/es_kafka_evo/test.proto TestDocument{id:int32, name:string,
counter:int64} and src/main/proto/kafka_es/bulk_action.proto)."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.functions.protowire import (
    BULK_ACTION,
    OP_DELETE,
    OP_INDEX,
    TEST_DOCUMENT,
    ProtoMessageType,
    resolve_proto,
)
from kafka_es_ray.stages.actions import ParseProtobufActionsStage

# the reference fixtures: indexAction{opType=INDEX,id="123",routing="456"},
# deleteAction{opType=DELETE,...}, testMsg{id=123,name="Teo"}
INDEX_ACTION = BULK_ACTION.encode({"op_type": OP_INDEX, "id": "123", "routing": "456"})
DELETE_ACTION = BULK_ACTION.encode({"op_type": OP_DELETE, "id": "123", "routing": "456"})
TEST_MSG = TEST_DOCUMENT.encode({"id": 123, "name": "Teo"})


def test_wire_roundtrip_matches_protoc_bytes():
    """Our encoder must produce canonical proto3 wire bytes (cross-checked
    against the google protobuf runtime when available)."""
    # canonical bytes computed by protoc for TestDocument{id=123,name="Teo"}:
    # field 1 varint 123 -> 08 7b ; field 2 len 3 "Teo" -> 12 03 54 65 6f
    assert TEST_MSG == bytes.fromhex("087b120354656f")
    assert TEST_DOCUMENT.decode(TEST_MSG) == {"id": 123, "name": "Teo", "counter": 0}
    # delete action: op_type=1 -> 08 01 ; id "123" -> 22 03 313233 ;
    # routing "456" -> 2a 03 343536
    assert DELETE_ACTION == bytes.fromhex("0801" + "2203313233" + "2a03343536")
    try:
        from google.protobuf import descriptor_pb2  # noqa: F401
    except Exception:
        pytest.skip("google.protobuf runtime not importable")


def test_decode_negative_and_large_ints():
    t = ProtoMessageType("t.T", {1: ("a", "int32"), 2: ("b", "int64"), 3: ("c", "uint64")})
    enc = t.encode({"a": -5, "b": -(1 << 40), "c": (1 << 63) + 7})
    assert t.decode(enc) == {"a": -5, "b": -(1 << 40), "c": (1 << 63) + 7}


def test_proto_json_printer_goldens():
    """proto field names, no whitespace, int64 as string; default-value
    inclusion toggle (golden '\"counter\":\"0\"',
    ElasticsearchBulkSenderTests.kt:215-218)."""
    vals = TEST_DOCUMENT.decode(TEST_MSG)
    assert TEST_DOCUMENT.to_json(vals) == '{"id":123,"name":"Teo"}'
    assert (
        TEST_DOCUMENT.to_json(vals, include_defaults=True)
        == '{"id":123,"name":"Teo","counter":"0"}'
    )


def test_unknown_class_errors_at_configure_time():
    with pytest.raises(ValueError, match="could not be found"):
        resolve_proto("dev.evo.kafka.elasticsearch.UnknownMessage")
    with pytest.raises(ValueError, match="could not be found"):
        ParseProtobufActionsStage("nope.Missing")


def _records(rows):
    return pd.DataFrame(
        [(t, i, a, v, g) for i, (t, a, v, g) in enumerate(rows)],
        columns=["topic", "seq", "action", "value", "tag"],
    )


def test_deserialize_index_action():
    stage = ParseProtobufActionsStage("evo_kafka_es.TestDocument", default_index="t")
    out = stage(_records([("t", INDEX_ACTION, TEST_MSG, None)]))
    assert out["op"].tolist() == ["index"]
    assert out["id"].tolist() == ["123"]
    assert out["routing"].tolist() == ["456"]
    assert out["source"].tolist() == ['{"id":123,"name":"Teo"}']


def test_deserialize_delete_action_no_value():
    stage = ParseProtobufActionsStage("evo_kafka_es.TestDocument", default_index="t")
    out = stage(_records([("t", DELETE_ACTION, None, None)]))
    assert out["op"].tolist() == ["delete"]
    assert out["id"].tolist() == ["123"]
    assert out["source"].isna().all()


def test_deserialize_invalid_data_quarantined():
    stage = ParseProtobufActionsStage("evo_kafka_es.TestDocument", default_index="t")
    out = stage(_records([("t", INDEX_ACTION, b"invalid data", None)]))
    assert out["op"].tolist() == ["quarantine"]
    assert "Error when parsing protobuf data" in out["error"].iloc[0]


def test_unrecognized_op_quarantined():
    bad = BULK_ACTION.encode({"op_type": 7, "id": "123"})
    stage = ParseProtobufActionsStage("evo_kafka_es.TestDocument", default_index="t")
    out = stage(_records([("t", bad, TEST_MSG, None)]))
    assert out["op"].tolist() == ["quarantine"]
    assert "Unrecognized operation" in out["error"].iloc[0]


def test_tag_filter_matrix():
    """tag present+same -> convert; tag absent -> convert; mismatch -> skip
    (BaseConverter.kt:52-61 via ProtobufConverterTests tag cases)."""
    stage = ParseProtobufActionsStage("evo_kafka_es.TestDocument", tag="foo", default_index="t")
    out = stage(
        _records(
            [
                ("t", DELETE_ACTION, None, "foo"),   # match -> kept
                ("t", DELETE_ACTION, None, None),    # absent -> kept
                ("t", DELETE_ACTION, None, "bar"),   # mismatch -> skipped
            ]
        )
    )
    assert len(out) == 2
    assert (out["op"] == "delete").all()


def test_empty_string_normalized_to_null():
    """ProtobufConverter.kt:71-74: empty proto strings become nulls; a
    missing index falls through to the default."""
    act = BULK_ACTION.encode({"op_type": OP_INDEX, "id": "9", "index": "", "routing": ""})
    stage = ParseProtobufActionsStage("evo_kafka_es.TestDocument", default_index="dflt")
    out = stage(_records([("t", act, TEST_MSG, None)]))
    assert out["index"].tolist() == ["dflt"]
    assert out["routing"].isna().all()


def test_proto_actions_end_to_end(ray_session, tmp_path):
    """Proto records -> parse -> resolve -> index -> BM25 search: the
    full ProtobufConverter pipeline shape against the index engine."""
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import IndexSearcher
    from kafka_es_ray.stages.actions import resolve_actions

    docs = [
        (BULK_ACTION.encode({"op_type": OP_INDEX, "id": f"d{i}"}),
         TEST_DOCUMENT.encode({"id": i, "name": f"name token{i} shared"}))
        for i in range(20)
    ]
    docs.append((BULK_ACTION.encode({"op_type": OP_DELETE, "id": "d3"}), None))
    recs = _records([("t", a, v, None) for a, v in docs])
    parsed = rd.from_pandas(recs).map_batches(
        ParseProtobufActionsStage,
        fn_constructor_kwargs={"protobuf_class": "evo_kafka_es.TestDocument", "default_index": "t"},
        batch_format="pandas",
        concurrency=2,
    )
    live = resolve_actions(parsed)

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        return pd.DataFrame(
            {
                "id": b["id"],
                "seq": b["seq"],
                "text": b["source"].map(lambda s: _json.loads(s).get("name", "")),
                "lang": "en",
            }
        )

    idx = str(tmp_path / "pidx")
    cfg = EngineConfig(num_partitions=2)
    build_index(
        live.map_batches(extract, batch_format="pandas"), idx, cfg,
        key_col="id", html_col=None, ts_col=None, seq_col="seq",
    )
    s = IndexSearcher(idx, cfg)
    assert len(s.search("shared", k=30)) == 19       # 20 indexed - 1 deleted
    assert s.search("token7")["key"].tolist() == ["d7"]
    assert len(s.search("token3")) == 0              # deleted doc absent
