"""ES variable_width_histogram: deterministic adjacent-gap 1-D
agglomerative clustering over exact per-value count partials."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.engine import (
    _agglomerate_1d,
    run_agg_variable_width_histogram,
)


def test_agglomerate_hand_case():
    # values 1,2,10,11,12,30 (count 1 each), buckets=3:
    # gaps 1,8,1,1,18 -> merge (1,2); gaps 8,1,1,18 -> merge (10,11);
    # centroids 1.5, 10.5, 12, 30; gaps 9, 1.5, 18 -> merge (10.5,12)
    vals = np.array([1.0, 2.0, 10.0, 11.0, 12.0, 30.0])
    got = _agglomerate_1d(vals, np.ones(6, dtype=np.int64), 3)
    assert got == [(1.0, 2.0, 1.5, 2), (10.0, 12.0, 11.0, 3), (30.0, 30.0, 30.0, 1)]


def test_agglomerate_weighted_and_ties():
    # weights shift centroids: values 0(x3), 3(x1) -> centroid 0.75
    got = _agglomerate_1d(
        np.array([0.0, 3.0]), np.array([3, 1], dtype=np.int64), 1
    )
    assert got == [(0.0, 3.0, 0.75, 4)]
    # equal gaps merge LEFTMOST first
    got = _agglomerate_1d(
        np.array([0.0, 1.0, 2.0]), np.ones(3, dtype=np.int64), 2
    )
    assert got == [(0.0, 1.0, 0.5, 2), (2.0, 2.0, 2.0, 1)]


def test_vwh_distributed_matches_brute(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 120
    vals = np.concatenate(
        [rng.integers(0, 20, 50), rng.integers(100, 130, 50), rng.integers(500, 520, 20)]
    ).astype(np.int64)
    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(n)],
            "text": ["red gold" if i % 2 == 0 else "red" for i in range(n)],
            "lang": "en",
            "v": vals,
        }
    )
    cfg = EngineConfig(num_partitions=3, numeric_cols=("v",))
    d = str(tmp_path / "vwhidx")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    q = pd.DataFrame({"query_id": np.int64([0]), "text": ["gold"], "lang": "en"})
    out = run_agg_variable_width_histogram(q, d, "v", buckets=4, cfg=cfg)
    # brute force: match set = even docs; same clustering spec
    mvals = vals[::2]
    u, c = np.unique(mvals, return_counts=True)
    want = _agglomerate_1d(u.astype(np.float64), c.astype(np.int64), 4)
    got = list(
        zip(out["min"], out["max"],
            [round(x, 6) for x in (w[2] for w in want)], out["doc_count"])
    )
    assert len(out) == 4
    assert out["doc_count"].sum() == len(mvals)
    for row, (mn, mx, cent, cnt) in zip(out.itertuples(index=False), want):
        assert row.min == mn and row.max == mx and row.doc_count == cnt
        assert abs(row.centroid - cent) < 1e-6
    # buckets ordered and non-overlapping
    assert (out["min"].to_numpy()[1:] > out["max"].to_numpy()[:-1]).all()


def test_vwh_absent_term_empty(ray_session, tmp_path):
    import ray.data as rd

    cfg = EngineConfig(num_partitions=2, numeric_cols=("v",))
    docs = pd.DataFrame(
        {"url": ["a", "b"], "text": ["x y", "y z"], "lang": "en",
         "v": np.int64([1, 2])}
    )
    d = str(tmp_path / "vwhempty")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    q = pd.DataFrame({"query_id": np.int64([0]), "text": ["absent"], "lang": "en"})
    out = run_agg_variable_width_histogram(q, d, "v", buckets=3, cfg=cfg)
    assert len(out) == 0
    assert list(out.columns) == [
        "query_id", "bucket", "min", "max", "centroid", "doc_count",
    ]
