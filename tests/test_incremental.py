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


def test_apply_retry_after_crash_is_idempotent(ray_session, base_index):
    """A crash between delta-segment writes and the manifest commit means
    the driver retries the whole batch: segment ids, doc_id ranks and
    tombstones must come out identical (deterministic overwrite), so
    at-least-once delivery converges — the reference's at-least-once +
    idempotent-upsert contract (ElasticsearchSinkTask.kt:312-332)."""
    import json
    import os

    import ray.data as rd

    from kafka_es_ray.index.segment import Segment

    delta = _records(
        [
            ("t", '{"index":{"id":"a"}}', '{"title":"retry winner"}', None),
            ("t", '{"delete":{"id":"c"}}', None, None),
        ],
        seq0=500,
    )
    mpath = os.path.join(base_index, "manifest.json")
    pre = open(mpath).read()

    m1 = update_index_from_actions(base_index, rd.from_pandas(delta), CFG)
    sid = [s for s in m1["parts"] if s >= 200000][0]
    seg_before = Segment.load(base_index, sid)

    # simulate the crash: roll the manifest back to the pre-apply state
    with open(mpath, "w") as f:
        f.write(pre)
    m2 = update_index_from_actions(base_index, rd.from_pandas(delta), CFG)

    assert m2["parts"] == m1["parts"]
    assert m2["tombstoned_docs"] == m1["tombstoned_docs"]
    assert m2["alloc"] == m1["alloc"]
    seg_after = Segment.load(base_index, sid)
    assert seg_after.doc_ids_store.tolist() == seg_before.doc_ids_store.tolist()
    assert seg_after.terms.tolist() == seg_before.terms.tolist()

    s = IndexSearcher(base_index, CFG)
    assert s.search("retry")["key"].tolist() == ["a"]
    assert len(s.search("cherry")) == 0  # c deleted exactly once
