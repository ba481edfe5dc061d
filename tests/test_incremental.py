"""Incremental updates: delta segments + tombstones, merge purge —
the continuous-ingest semantics of the reference sink (put() upserts by
_id, ES refresh visibility, merge making deletes permanent)."""

import numpy as np
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
    assert m["n_tombstoned"] == 2             # old a + b


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
    assert m2["n_tombstoned"] == m1["n_tombstoned"]
    assert m2["alloc"] == m1["alloc"]
    seg_after = Segment.load(base_index, sid)
    assert seg_after.doc_ids_store.tolist() == seg_before.doc_ids_store.tolist()
    assert seg_after.terms.tolist() == seg_before.terms.tolist()

    s = IndexSearcher(base_index, CFG)
    assert s.search("retry")["key"].tolist() == ["a"]
    assert len(s.search("cherry")) == 0  # c deleted exactly once


def test_uncommitted_tombstones_invisible(ray_session, base_index):
    """Tombstone visibility is manifest-gated: a generation tombstone file
    written by a crashed apply (never listed in a committed manifest) must
    NOT hide docs — otherwise a crash between the tombstone write and the
    manifest commit hides old versions while the replacement delta segment
    is not yet visible."""
    import json as _json

    from kafka_es_ray.index import segment as seg

    # rogue file: tombstone every doc of partition-0's segment, unlisted
    m = read_manifest(base_index)
    sid = m["parts"][0]
    from kafka_es_ray.index.segment import Segment

    s0 = Segment.load(base_index, sid)
    rogue = seg.gen_tombstones_path(base_index, sid, 999)
    with open(rogue, "w") as f:
        _json.dump([int(x) for x in s0.doc_ids_store], f)

    s = IndexSearcher(base_index, CFG)
    hits = len(s.search("apple")) + len(s.search("banana")) + len(s.search("cherry"))
    assert hits == 3  # all three docs still visible


def test_orphan_update_partial_merge_against_store(ray_session, tmp_path):
    """An update whose doc is not in the delta batch partial-merges into
    the STORED doc (ES doc-merge into _source): patch with the text field
    replaces it; patch without it inherits the stored text; update of a
    missing id is dropped and counted (document_missing analog)."""
    import ray.data as rd

    cfg = EngineConfig(num_partitions=4, store_text=True)
    idx = str(tmp_path / "orph")
    base = _records(
        [
            ("t", '{"index":{"id":"a"}}', '{"title":"apple pie"}', None),
            ("t", '{"index":{"id":"b"}}', '{"title":"banana split"}', None),
        ]
    )
    index_from_actions(rd.from_pandas(base), idx, cfg)

    delta = _records(
        [
            # patch lacking "title": a keeps its stored text, new seq wins
            ("t", '{"update":{"id":"a"}}', '{"doc":{"rating":5}}', None),
            # patch with "title": b gets the new text
            ("t", '{"update":{"id":"b"}}', '{"doc":{"title":"blueberry tart"}}', None),
            # missing doc -> dropped + counted
            ("t", '{"update":{"id":"ghost"}}', '{"doc":{"title":"nope"}}', None),
        ],
        seq0=100,
    )
    m = update_index_from_actions(idx, rd.from_pandas(delta), cfg)
    s = IndexSearcher(idx, cfg)
    assert s.search("apple")["key"].tolist() == ["a"]       # text inherited
    assert s.search("blueberry")["key"].tolist() == ["b"]   # text replaced
    assert len(s.search("banana")) == 0                      # old b gone
    assert m["apply_metrics"]["orphan_updates_dropped"] == 1


def test_scripted_update_applies_and_quarantines(ray_session, tmp_path):
    """Whitelisted painless subset (the reference scripted-update golden,
    BulkActionTests.kt:186-207: ctx._source.counter += params.param1)
    applies to an in-batch doc; anything outside the subset surfaces as a
    quarantine row — never a silent drop."""
    import json as _json

    import ray.data as rd

    from kafka_es_ray.stages.actions import ParseActionsStage, resolve_actions

    stage = ParseActionsStage(default_index="t")
    batch = stage(
        pd.DataFrame(
            [
                ("t", 0, '{"index":{"id":"a"}}', '{"counter":1,"name":"x"}', None),
                (
                    "t",
                    1,
                    '{"update":{"id":"a","retry_on_conflict":3}}',
                    '{"script":{"lang":"painless","source":"ctx._source.counter += params.param1","params":{"param1":1}}}',
                    None,
                ),
                ("t", 2, '{"update":{"id":"a"}}', '{"script":{"source":"ctx._source.whatever()"}}', None),
            ],
            columns=["topic", "seq", "action", "value", "tag"],
        )
    )
    out = resolve_actions(rd.from_pandas(batch), keep_quarantine=True).to_pandas()
    live = out[out["op"] == "index"]
    assert _json.loads(live["source"].iloc[0]) == {"counter": 2, "name": "x"}
    q = out[out["op"] == "quarantine"]
    assert len(q) == 1 and "whitelisted" in q["error"].iloc[0]


def test_delete_by_query_and_count(ray_session, base_index):
    """ES _count + _delete_by_query analogs: count matches, tombstone
    them (manifest-gated), stats stale until merge purges."""
    from kafka_es_ray.index.incremental import delete_by_query

    s = IndexSearcher(base_index, CFG)
    assert s.count("apple banana") == 2            # or-match: docs a, b
    assert s.count("apple pie", operator="and") == 1
    assert s.count("zzznope") == 0

    m0 = read_manifest(base_index)
    m = delete_by_query(base_index, "apple banana", CFG)
    assert m["last_delete_by_query"]["deleted"] == 2
    assert m["n_docs"] == m0["n_docs"]             # stale until merge

    s2 = IndexSearcher(base_index, CFG)
    assert len(s2.search("apple")) == 0
    assert len(s2.search("banana")) == 0
    assert s2.search("cherry")["key"].tolist() == ["c"]
    assert s2.count("apple banana") == 0

    merge_index(base_index, merge_factor=100, cfg=CFG)
    assert read_manifest(base_index)["n_docs"] == m0["n_docs"] - 2


def test_large_delta_streams_through_workers(ray_session, base_index):
    """The apply path must scale with the delta: a 100k-row delta flows
    through map_groups workers (never .to_pandas() on the driver) and
    commits one delta segment per touched partition."""
    import ray.data as rd

    from kafka_es_ray.index.incremental import apply_incremental

    n = 100_000
    delta = pd.DataFrame(
        {
            "id": [f"bulk{i}" for i in range(n)],
            "text": [f"bulk doc {i} flood" for i in range(n)],
            "lang": ["en"] * n,
            "seq": np.arange(n, dtype=np.int64) + 1000,
        }
    )
    m = apply_incremental(base_index, rd.from_pandas(delta), CFG, key_col="id")
    assert m["apply_metrics"]["rows"] >= n
    new_segs = [s for s in m["parts"] if s >= 200000]
    assert len(new_segs) == CFG.num_partitions  # every partition touched
    total_new = sum(m["part_manifests"][str(s)]["n_docs"] for s in new_segs)
    assert total_new == n
    s = IndexSearcher(base_index, CFG)
    assert s.count("flood") == n


def test_doc_as_upsert(ray_session, tmp_path):
    """ES update {doc_as_upsert: true}: merges into an existing doc, and
    INSERTS the patch when the doc is missing (a plain update of a
    missing doc still drops + counts)."""
    import ray.data as rd

    cfg = EngineConfig(num_partitions=4, store_text=True)
    idx = str(tmp_path / "dau")
    base = _records([("t", '{"index":{"id":"a"}}', '{"title":"apple pie"}', None)])
    index_from_actions(rd.from_pandas(base), idx, cfg)

    delta = _records(
        [
            # existing doc: normal partial merge
            ("t", '{"update":{"id":"a"}}', '{"doc":{"title":"apricot jam"},"doc_as_upsert":true}', None),
            # missing doc + doc_as_upsert -> INSERT
            ("t", '{"update":{"id":"new"}}', '{"doc":{"title":"nectarine fool"},"doc_as_upsert":true}', None),
            # missing doc, plain update -> dropped + counted
            ("t", '{"update":{"id":"ghost"}}', '{"doc":{"title":"nope"}}', None),
        ],
        seq0=100,
    )
    m = update_index_from_actions(idx, rd.from_pandas(delta), cfg)
    s = IndexSearcher(idx, cfg)
    assert s.search("apricot")["key"].tolist() == ["a"]
    assert s.search("nectarine")["key"].tolist() == ["new"]
    assert len(s.search("nope")) == 0
    assert m["apply_metrics"]["orphan_updates_dropped"] == 1
