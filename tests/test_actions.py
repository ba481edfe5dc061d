"""Action-stream semantics: parse matrix (ops, missing header/source,
fan-out, tag filter), NDJSON goldens, index-map defaulting, LWW+tombstone
resolution — mirroring the reference test matrix (JsonConverterTests.kt,
BulkActionTests.kt, ElasticsearchSinkTaskTests.kt)."""

import json

import pandas as pd
import pytest

from kafka_es_ray.stages.actions import (
    ParseActionsStage,
    parse_record,
    resolve_actions,
    serialize_action,
    serialize_bulk,
)


def test_parse_all_ops():
    a = parse_record('{"index":{"id":"1","index":"t"}}', '{"name":"x"}')
    assert a == [{"op": "index", "id": "1", "index": "t", "routing": None,
                  "parent": None, "retry_on_conflict": None, "source": '{"name":"x"}'}]
    d = parse_record('{"delete":{"id":"2"}}', None)
    assert d[0]["op"] == "delete" and d[0]["source"] is None
    u = parse_record('{"update":{"id":"3","retry_on_conflict":2}}', '{"doc":{"a":1}}')
    assert u[0]["retry_on_conflict"] == 2
    c = parse_record('{"create":{"id":"4"}}', "{}")
    assert c[0]["op"] == "create"


def test_parse_errors_and_normalization():
    with pytest.raises(ValueError):
        parse_record(None, "{}")
    with pytest.raises(ValueError):
        parse_record('{"boom":{}}', "{}")
    with pytest.raises(ValueError):
        parse_record('{"index":{"id":"1"}}', None)  # index needs a source
    # empty-string -> null (ProtobufConverter.kt:71-74)
    a = parse_record('{"index":{"id":"","routing":""}}', "{}")
    assert a[0]["id"] is None and a[0]["routing"] is None


def test_fanout_list_value():
    # one record carrying a LIST of sources (ElasticsearchSinkTaskTests.kt:102-135)
    a = parse_record('{"index":{"id":"1"}}', '[{"a":1},{"a":2}]')
    assert len(a) == 2
    assert a[0]["source"] == '{"a":1}' and a[1]["source"] == '{"a":2}'


def test_ndjson_goldens():
    # ES /_bulk wire-format goldens (BulkAction.kt:104-111 analog)
    assert (
        serialize_action("index", id="1", index="test", source='{"name":"w"}')
        == '{"index":{"_id":"1","_index":"test"}}\n{"name":"w"}\n'
    )
    assert serialize_action("delete", id="2", index="test") == '{"delete":{"_id":"2","_index":"test"}}\n'
    assert (
        serialize_action("update", id="3", index="t", retry_on_conflict=5, source='{"doc":{"x":null}}')
        == '{"update":{"_id":"3","_index":"t","retry_on_conflict":5}}\n{"doc":{"x":null}}\n'
    )
    # null JSON values survive serialization (ElasticsearchBulkSenderTests.kt:87-90)
    src = json.dumps({"keyword": None}, separators=(",", ":"))
    assert '"keyword":null' in serialize_action("index", id="9", index="t", source=src)


def test_serialize_bulk():
    df = pd.DataFrame(
        [
            {"op": "index", "id": "1", "index": "t", "source": "{}"},
            {"op": "delete", "id": "2", "index": "t", "source": None},
        ]
    )
    body = serialize_bulk(df)
    assert body == '{"index":{"_id":"1","_index":"t"}}\n{}\n{"delete":{"_id":"2","_index":"t"}}\n'


def _records(rows):
    return pd.DataFrame(rows, columns=["topic", "seq", "action", "value", "tag"])


def test_parse_stage_tag_filter_and_index_map():
    stage = ParseActionsStage(tag="foo", default_index="fallback", topic_index_map={"t1": "idx1"})
    batch = _records(
        [
            ("t1", 0, '{"index":{"id":"a"}}', "{}", "foo"),   # kept, index from map
            ("t1", 1, '{"index":{"id":"b"}}', "{}", "bar"),   # dropped: tag mismatch
            ("t2", 2, '{"index":{"id":"c"}}', "{}", None),    # kept: missing tag
            ("t2", 3, '{"index":{"id":"d","index":"preset"}}', "{}", "foo"),  # preset wins
            ("t2", 4, "not json", "{}", "foo"),               # quarantined
        ]
    )
    out = stage(batch)
    assert out[out["id"] == "a"]["index"].iloc[0] == "idx1"
    assert "b" not in set(out["id"].dropna())
    assert out[out["id"] == "c"]["index"].iloc[0] == "fallback"
    assert out[out["id"] == "d"]["index"].iloc[0] == "preset"
    q = out[out["op"] == "quarantine"]
    assert len(q) == 1 and q["seq"].iloc[0] == 4


def test_parse_stage_unresolved_index_quarantined():
    stage = ParseActionsStage()  # no default index, no map
    out = stage(_records([("t", 0, '{"index":{"id":"a"}}', "{}", None)]))
    assert out["op"].tolist() == ["quarantine"]
    assert "not resolved" in out["error"].iloc[0]


def test_resolve_actions_lww_and_tombstones(ray_session):
    import ray.data as rd

    stage = ParseActionsStage(default_index="t")
    batch = stage(
        _records(
            [
                ("t", 0, '{"index":{"id":"a"}}', '{"v":1}', None),
                ("t", 1, '{"index":{"id":"a"}}', '{"v":2}', None),   # wins for a
                ("t", 2, '{"index":{"id":"b"}}', '{"v":1}', None),
                ("t", 3, '{"delete":{"id":"b"}}', None, None),       # tombstones b
                ("t", 4, '{"index":{"id":"c","routing":"r1"}}', '{"v":1}', None),
                ("t", 5, '{"update":{"id":"c","routing":"r1"}}', '{"v":9}', None),  # wins for c
            ]
        )
    )
    out = resolve_actions(rd.from_pandas(batch)).to_pandas().sort_values("id")
    assert out["id"].tolist() == ["a", "c"]
    assert json.loads(out[out["id"] == "a"]["source"].iloc[0]) == {"v": 2}
    assert json.loads(out[out["id"] == "c"]["source"].iloc[0]) == {"v": 9}


def test_resolve_fixture_scale(ray_session):
    """Fixture actions stream resolves deterministically; deleted ids
    whose delete is the last op are absent."""
    import ray.data as rd

    from kafka_es_ray.fixtures import make_actions, make_pages

    pages = make_pages(300)
    actions = make_actions(pages, 500).to_pandas()
    actions["op"] = actions["op"].astype(str)
    parsed = actions.rename(columns={"index": "index"}).assign(error=None)
    ds = rd.from_pandas(parsed[["op", "id", "index", "routing", "seq", "source", "error"]])
    out = resolve_actions(ds).to_pandas()

    # independent state-machine oracle: resolution is per (route_key, id)
    # — like ES, a doc written with inconsistent routing lands on
    # multiple shards; create conflicts, update merges (missing -> drop)
    df = parsed[~parsed["id"].isna()].copy()
    df["route_key"] = df["routing"].where(~df["routing"].isna(), df["id"])
    state = {}
    for r in df.sort_values("seq").itertuples(index=False):
        key = (r.route_key, r.id)
        if r.op == "index":
            state[key] = r.source
        elif r.op == "create":
            state.setdefault(key, r.source)
        elif r.op == "update":
            if key in state and r.source is not None:
                state[key] = r.source  # merge irrelevant for id-set check
        elif r.op == "delete":
            state.pop(key, None)
    assert sorted(out["id"]) == sorted(k[1] for k in state)


def test_fold_op_semantics(ray_session):
    """Full ES doc-op semantics: create conflict, nested partial-merge
    update, update-on-missing dropped, scripted update dropped."""
    import ray.data as rd

    stage = ParseActionsStage(default_index="t")
    batch = stage(
        _records(
            [
                ("t", 0, '{"index":{"id":"a"}}', '{"title":"one","meta":{"x":1,"y":2}}', None),
                ("t", 1, '{"create":{"id":"a"}}', '{"title":"CONFLICT"}', None),      # dropped
                ("t", 2, '{"update":{"id":"a"}}', '{"doc":{"meta":{"y":9},"z":3}}', None),  # nested merge
                ("t", 3, '{"update":{"id":"ghost"}}', '{"doc":{"q":1}}', None),       # missing -> drop
                ("t", 4, '{"update":{"id":"a"}}', '{"script":{"source":"ctx..."}}', None),  # scripted -> drop
                ("t", 5, '{"create":{"id":"b"}}', '{"fresh":true}', None),            # create on missing ok
            ]
        )
    )
    out = resolve_actions(rd.from_pandas(batch)).to_pandas().sort_values("id")
    assert out["id"].tolist() == ["a", "b"]
    a_src = json.loads(out[out["id"] == "a"]["source"].iloc[0])
    assert a_src == {"title": "one", "meta": {"x": 1, "y": 9}, "z": 3}
    assert json.loads(out[out["id"] == "b"]["source"].iloc[0]) == {"fresh": True}


def test_auto_id_path(ray_session):
    """Null _id on index/create auto-generates a deterministic id
    (BulkAction.kt:117 analog); delete/update without id quarantine."""
    import ray.data as rd

    stage = ParseActionsStage(default_index="t")
    out = stage(
        _records(
            [
                ("t", 7, '{"index":{}}', '[{"a":1},{"a":2}]', None),  # 2 auto ids (fan-out)
                ("t", 8, '{"delete":{}}', None, None),                # quarantined
            ]
        )
    )
    auto = out[out["op"] == "index"]
    assert auto["id"].tolist() == ["_auto_7_0", "_auto_7_1"]
    q = out[out["op"] == "quarantine"]
    assert len(q) == 1 and "requires an id" in q["error"].iloc[0]
    # auto-id docs survive resolution independently (no false dedup)
    live = resolve_actions(rd.from_pandas(out)).to_pandas()
    assert len(live) == 2
