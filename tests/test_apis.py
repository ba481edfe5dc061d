"""ES _field_caps (merged mapping capabilities, conflict rows) and
_msearch (N bodies == one distributed batch == per-query search)."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.apis import field_caps, run_msearch
from kafka_es_ray.query.engine import run_queries


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    import ray.data as rd

    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(12)],
            "text": [f"red gold w{i % 3}" for i in range(12)],
            "lang": ["en"] * 12,
            "src": [f"s{i % 2}" for i in range(12)],
            "n": np.arange(12, dtype=np.int64),
        }
    )
    root = tmp_path_factory.mktemp("fcidx")
    a, b = str(root / "alpha"), str(root / "beta")
    build_index(
        rd.from_pandas(docs), a,
        EngineConfig(num_partitions=2, keyword_cols=("src",), numeric_cols=("n",)),
        html_col=None, ts_col=None,
    )
    build_index(
        rd.from_pandas(docs), b,
        EngineConfig(num_partitions=2, keyword_cols=("n",)),
        html_col=None, ts_col=None,
    )
    return a, b


def test_field_caps_merge_and_conflict(two_indexes):
    a, b = two_indexes
    caps = field_caps([a, b])
    got = {(r.field, r.type): r for r in caps.itertuples(index=False)}
    assert got[("text", "text")].indices == "alpha,beta"
    assert got[("src", "keyword")].indices == "alpha"
    # conflict: n is double in alpha, keyword in beta -> two rows
    assert got[("n", "double")].indices == "alpha"
    assert got[("n", "keyword")].indices == "beta"
    assert got[("n", "double")].aggregatable and not got[("text", "text")].aggregatable
    # single index, custom name
    one = field_caps(a, names=["idx1"])
    assert set(one["indices"]) == {"idx1"}


def test_msearch_equals_per_query_search(two_indexes):
    a, _ = two_indexes
    bodies = [
        {"query": {"match": {"text": "red gold"}}, "size": 5},
        {
            "query": {
                "bool": {
                    "must": [{"match": {"text": "w1"}}],
                    "filter": [{"term": {"src": "s1"}}],
                }
            },
            "size": 5,
        },
    ]
    got = run_msearch(bodies, a).to_pandas()
    want = run_queries(
        pd.DataFrame(
            {
                "query_id": np.int64([0, 1]),
                "text": ["red gold", "w1"],
                "k": np.int32(5),
                "kw_field": [None, "src"],
                "kw_value": [None, "s1"],
            }
        ),
        a,
    ).to_pandas()
    key = ["query_id", "rank", "doc_id", "score"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
    )
