"""Segment merge: merged index must return byte-identical query results
(ES merge semantics E3 — merge changes layout, never results)."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.fixtures import make_pages, make_queries
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.merge import merge_index
from kafka_es_ray.index.segment import Segment, read_manifest
from kafka_es_ray.query.engine import IndexSearcher

CFG = EngineConfig(num_partitions=8)


def test_merge_preserves_results(ray_session, pages_small, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "m")
    build_index(rd.from_arrow(pages_small), idx, CFG)
    s_before = IndexSearcher(idx, CFG)
    qs = make_queries(12).to_pandas()
    before = s_before.search_batch(qs)

    m = merge_index(idx, merge_factor=4, cfg=CFG)
    assert len(m["parts"]) == 2  # 8 parts / factor 4
    s_after = IndexSearcher(idx, CFG)
    after = s_after.search_batch(qs)
    pd.testing.assert_frame_equal(before.reset_index(drop=True), after.reset_index(drop=True))


def test_merge_stats_and_postings(ray_session, pages_small, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "m2")
    m0 = build_index(rd.from_arrow(pages_small), idx, CFG)
    m1 = merge_index(idx, merge_factor=8, cfg=CFG)
    assert len(m1["parts"]) == 1
    s = Segment.load(idx, m1["parts"][0])
    assert s.n_docs == m0["n_docs"]
    assert (np.diff(s.doc_ids_store) > 0).all()
    # df conservation: merged df per term == sum of pre-merge dfs
    pm = m1["part_manifests"][str(m1["parts"][0])]
    assert pm["n_postings"] == sum(p["n_postings"] for p in m0["part_manifests"].values())
    for ti in range(0, s.terms.size, max(1, s.terms.size // 13)):
        ids, tfs = s.postings(ti)
        assert (np.diff(ids) > 0).all()
        assert ids.size == int(s.df[ti])


def test_double_merge_after_incremental(ray_session, pages_small, tmp_path):
    """merge -> incremental -> merge: the second merge's output ids must
    not collide with the first's (a fixed-base id scheme would let the
    post-commit cleanup delete the fresh files the new manifest names)."""
    import ray.data as rd

    from kafka_es_ray.index.incremental import apply_incremental
    from kafka_es_ray.fixtures import make_queries

    idx = str(tmp_path / "mm")
    build_index(rd.from_arrow(pages_small), idx, CFG)
    m1 = merge_index(idx, merge_factor=4, cfg=CFG)
    first_ids = set(m1["parts"])

    delta = pd.DataFrame(
        {
            "url": ["https://x.example/new1", "https://x.example/new2"],
            "text": ["zanzibar quokka zephyr", "quokka zenith"],
            "lang": ["en", "en"],
        }
    )
    apply_incremental(idx, delta, CFG, key_col="url")
    m2 = merge_index(idx, merge_factor=4, cfg=CFG)
    assert not (set(m2["parts"]) & first_ids)

    s = IndexSearcher(idx, CFG)
    assert s.search("zanzibar")["key"].tolist() == ["https://x.example/new1"]
    assert len(s.search("quokka")) == 2
    qs = make_queries(8).to_pandas()
    assert len(s.search_batch(qs)) > 0  # original corpus still queryable


def test_delta_after_merge_allocates_disjoint_ids(ray_session, pages_small, tmp_path):
    """After a merge drops per-partition manifests, a delta segment's
    rank_base must come from the preserved alloc map — not reset to 0
    (which would reuse doc_ids already held by live docs)."""
    import ray.data as rd

    from kafka_es_ray.index.incremental import apply_incremental

    idx = str(tmp_path / "alloc")
    build_index(rd.from_arrow(pages_small), idx, CFG)
    merge_index(idx, merge_factor=8, cfg=CFG)

    delta = pd.DataFrame(
        {
            "url": ["https://x.example/afterm"],
            "text": ["xylophone vortex"],
            "lang": ["en"],
        }
    )
    m = apply_incremental(idx, delta, CFG, key_col="url")
    all_ids = []
    for pid in m["parts"]:
        all_ids.append(Segment.load(idx, pid).doc_ids_store)
    all_ids = np.concatenate(all_ids)
    assert np.unique(all_ids).size == all_ids.size  # disjoint ranges held

    s = IndexSearcher(idx, CFG)
    assert s.search("xylophone")["key"].tolist() == ["https://x.example/afterm"]
