"""Incremental updates: delta segments + tombstones, merge purge —
the continuous-ingest semantics of the reference sink (put() upserts by
_id, ES refresh visibility, merge making deletes permanent)."""

import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.merge import merge_index
from kafka_es_ray.index.segment import read_manifest
from kafka_es_ray.pipelines.actions_flow import index_from_actions, update_index_from_actions
from kafka_es_ray.query.engine import IndexSearcher

CFG = EngineConfig(num_partitions=4)


def _records(rows, seq0=0):
    return pd.DataFrame(
        [(t, seq0 + i, a, v, g) for i, (t, a, v, g) in enumerate(rows)],
        columns=["topic", "seq", "action", "value", "tag"],
    )


@pytest.fixture()
def base_index(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "inc")
    records = _records(
        [
            ("t", '{"index":{"id":"a"}}', '{"title":"apple pie"}', None),
            ("t", '{"index":{"id":"b"}}', '{"title":"banana split"}', None),
            ("t", '{"index":{"id":"c"}}', '{"title":"cherry cake"}', None),
        ]
    )
    index_from_actions(rd.from_pandas(records), idx, CFG)
    return idx


def test_incremental_upsert_delete_new(ray_session, base_index):
    import ray.data as rd

    delta = _records(
        [
            ("t", '{"index":{"id":"a"}}', '{"title":"apricot tart"}', None),  # upsert a
            ("t", '{"delete":{"id":"b"}}', None, None),                        # delete b
            ("t", '{"index":{"id":"d"}}', '{"title":"damson jam"}', None),     # new doc
        ],
        seq0=100,
    )
    m = update_index_from_actions(base_index, rd.from_pandas(delta), CFG)
    s = IndexSearcher(base_index, CFG)

    assert s.search("apricot")["key"].tolist() == ["a"]
    assert len(s.search("apple")) == 0        # old version of a tombstoned
    assert len(s.search("banana")) == 0       # b deleted
    assert s.search("damson")["key"].tolist() == ["d"]
    assert s.search("cherry")["key"].tolist() == ["c"]  # untouched doc intact
    assert m["next_segment_id"] > 200000
    assert len(m["tombstoned_docs"]) == 2     # old a + b


def test_incremental_twice_then_merge(ray_session, base_index):
    import ray.data as rd

    update_index_from_actions(
        base_index,
        rd.from_pandas(_records([("t", '{"index":{"id":"a"}}', '{"title":"v two"}', None)], 100)),
        CFG,
    )
    update_index_from_actions(
        base_index,
        rd.from_pandas(_records([("t", '{"index":{"id":"a"}}', '{"title":"v three"}', None)], 200)),
        CFG,
    )
    s = IndexSearcher(base_index, CFG)
    assert s.search("three")["key"].tolist() == ["a"]
    assert len(s.search("two")) == 0

    # merge purges tombstones permanently; results unchanged
    m = merge_index(base_index, merge_factor=100, cfg=CFG)
    s2 = IndexSearcher(base_index, CFG)
    assert s2.search("three")["key"].tolist() == ["a"]
    assert len(s2.search("two")) == 0
    assert len(s2.search("banana")) == 1  # b still live in this fixture
    # post-merge stats are live-docs-only
    assert m["n_docs"] == 3  # a, b, c (one live version each)
    mm = read_manifest(base_index)
    assert mm["n_docs"] == 3


def test_incremental_keeps_stats_stale_until_merge(ray_session, base_index):
    import ray.data as rd

    m0 = read_manifest(base_index)
    update_index_from_actions(
        base_index,
        rd.from_pandas(_records([("t", '{"delete":{"id":"c"}}', None, None)], 100)),
        CFG,
    )
    m1 = read_manifest(base_index)
    # ES-faithful: delete hides the doc but N stays until merge
    assert m1["n_docs"] == m0["n_docs"]
    s = IndexSearcher(base_index, CFG)
    assert len(s.search("cherry")) == 0
    merge_index(base_index, merge_factor=100, cfg=CFG)
    assert read_manifest(base_index)["n_docs"] == m0["n_docs"] - 1
