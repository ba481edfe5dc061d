"""Frozen golden top-k fixture (FIXTURES.md §3 topk_expected): the engine
must reproduce the committed file byte-for-byte.  Unlike the live-oracle
tests, this catches CORRELATED drift (oracle and engine changing
together — e.g. an accidental analyzer or extraction change): any diff
here is a breaking index-format/analyzer version (SURVEY §7.4)."""

import os

import numpy as np
import pandas as pd
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "topk_expected.parquet")


def test_engine_matches_frozen_goldens(ray_session, tmp_path):
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.fixtures import make_pages, make_queries
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import IndexSearcher

    cfg = EngineConfig(num_partitions=4)
    idx = str(tmp_path / "gidx")
    build_index(rd.from_arrow(make_pages(1000)), idx, cfg)
    s = IndexSearcher(idx, cfg)
    got = s.search_batch(make_queries(16).to_pandas()).reset_index(drop=True)

    expected = pd.read_parquet(GOLDEN)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id", "key", "score"]].astype({"query_id": np.int64}),
        expected[["query_id", "rank", "doc_id", "key", "score"]].astype({"query_id": np.int64}),
    )
