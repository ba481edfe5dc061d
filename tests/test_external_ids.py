"""External-id (id_col) indexes: internal doc_id ranges carry no
partition information there, so partition tests must come from manifest
records — regression tests for the two round-4 bugs where the doc_id
stride assumption silently no-opped deletes outside partition 0 and
made point lookups miss whole want-sets."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.functions.hashing import route_partition
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.incremental import apply_incremental
from kafka_es_ray.query.engine import IndexSearcher, run_mget

CFG = EngineConfig(num_partitions=4)
N = 40


@pytest.fixture()
def ext_index(ray_session, tmp_path):
    import ray.data as rd

    docs = pd.DataFrame(
        {
            "key": [str(i) for i in range(N)],
            "text": [f"red gold w{i % 5}" for i in range(N)],
            "lang": "en",
            "doc_id": np.arange(N, dtype=np.int64) * 7 + 3,  # arbitrary ids
        }
    )
    d = str(tmp_path / "extidx")
    build_index(
        rd.from_pandas(docs), d, CFG, key_col="key", html_col=None,
        ts_col=None, id_col="doc_id",
    )
    return d


def test_manifest_records_id_mode(ext_index):
    from kafka_es_ray.index.segment import read_manifest

    m = read_manifest(ext_index)
    assert m["external_ids"] is True and m["routed"] is False


def test_delete_lands_in_every_partition(ext_index):
    """Deletes must tombstone docs in ALL routing partitions (the old
    doc_id-range test only ever matched partition 0's docs)."""
    keys = [str(i) for i in range(N)]
    parts = route_partition(np.asarray(keys, dtype=object), 4)
    assert len(set(parts)) == 4  # probe covers every partition
    dele = pd.DataFrame(
        {"key": keys, "text": None, "lang": "en", "op": "delete"}
    )
    m2 = apply_incremental(ext_index, dele, CFG, key_col="key", seq_col=None)
    tot = sum(
        len(json.load(open(os.path.join(ext_index, os.path.basename(f)))))
        for fs in (m2.get("tombstones") or {}).values()
        for f in fs
    )
    assert tot == N
    s = IndexSearcher(ext_index, CFG)
    assert s.search("red gold", k=1000).empty


def test_point_lookup_prunes_by_manifest_not_id_range(ext_index):
    """IndexSearcher.get / run_mget must find keys whose partitions
    share no segment with the [0, stride) id range."""
    keys = [str(i) for i in range(N)]
    parts = route_partition(np.asarray(keys, dtype=object), 4)
    probe = [k for k, p in zip(keys, parts) if p == 3][:5]
    assert probe and 0 not in set(
        route_partition(np.asarray(probe, dtype=object), 4)
    )
    got = IndexSearcher(ext_index, CFG).get(probe)
    assert got["found"].all() and len(got) == len(probe)
    dist = run_mget(probe, ext_index, CFG, concurrency=2)
    df = dist.to_pandas() if hasattr(dist, "to_pandas") else dist
    assert df["found"].all() and len(df) == len(probe)
