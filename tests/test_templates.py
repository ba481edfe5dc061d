"""ES search templates: mustache-subset rendering ({{var}} / toJson /
inverted default), DSL-subset -> queries-row conversion, and the
rendered batch matching a hand-built run_queries batch."""

import json

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.query.templates import (
    query_row_from_dsl,
    render_template,
    run_search_template,
)


def test_render_scalars_and_escaping():
    src = '{"query": {"match": {"text": "{{q}}"}}, "size": {{k}}}'
    out = render_template(src, {"q": 'he said "hi"\n', "k": 7})
    body = json.loads(out)
    assert body["query"]["match"]["text"] == 'he said "hi"\n'
    assert body["size"] == 7


def test_render_tojson_and_inverted_default():
    src = (
        '{"terms": {{#toJson}}vals{{/toJson}},'
        ' "size": {{size}}{{^size}}10{{/size}}}'
    )
    body = json.loads(render_template(src, {"vals": ["a", "b"]}))
    assert body == {"terms": ["a", "b"], "size": 10}
    body2 = json.loads(render_template(src, {"vals": [], "size": 3}))
    assert body2 == {"terms": [], "size": 3}


def test_render_rejects_unsupported_mustache():
    with pytest.raises(ValueError):
        render_template('{"a": "{{#each}}x{{/each}}"}', {})


def test_dsl_match_and_bool_filters():
    row = query_row_from_dsl({"query": {"match": {"text": "a b"}}, "size": 5})
    assert row["text"] == "a b" and row["k"] == 5
    row = query_row_from_dsl(
        {
            "query": {
                "bool": {
                    "must": [{"match": {"text": {"query": "x"}}}],
                    "filter": [
                        {"terms": {"src": ["s1", "s2"]}},
                        {"range": {"n": {"gte": 1, "lte": 9}}},
                    ],
                }
            }
        }
    )
    assert row == {
        "text": "x",
        "kw_field": "src",
        "kw_value": "s1|s2",
        "range_field": "n",
        "range_gte": 1.0,
        "range_lte": 9.0,
    }
    with pytest.raises(ValueError):
        query_row_from_dsl({"query": {"match_all": {}}})


def test_template_batch_equals_plain_run_queries(ray_session, tmp_path):
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import run_queries

    cfg = EngineConfig(num_partitions=2, numeric_cols=("n",))
    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(20)],
            "text": [f"red gold w{i % 4}" for i in range(20)],
            "lang": ["en"] * 20,
            "n": np.arange(20, dtype=np.int64),
        }
    )
    d = str(tmp_path / "tmplidx")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    src = (
        '{"query": {"bool": {"must": [{"match": {"text": "{{q}}"}}],'
        ' "filter": [{"range": {"n": {"gte": {{lo}}{{^lo}}0{{/lo}},'
        ' "lte": {{hi}}{{^hi}}99{{/hi}}}}}]}},'
        ' "size": {{size}}{{^size}}10{{/size}}}'
    )
    got = run_search_template(
        src, [{"q": "red gold", "lo": 5, "hi": 12}, {"q": "w1"}], d, cfg
    ).to_pandas()
    want = run_queries(
        pd.DataFrame(
            {
                "query_id": np.int64([0, 1]),
                "text": ["red gold", "w1"],
                "k": np.int32(10),
                "range_field": "n",
                "range_gte": [5.0, 0.0],
                "range_lte": [12.0, 99.0],
            }
        ),
        d,
        cfg,
    ).to_pandas()
    key = ["query_id", "rank", "doc_id", "score"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
    )


def test_msearch_template_batch(ray_session, tmp_path):
    """_msearch/template: heterogeneous (source, params) pairs in one
    batch == the per-request run_search_template results."""
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.templates import run_msearch_template, run_search_template

    CFG = EngineConfig(num_partitions=2, numeric_cols=("n",))
    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(30)],
            "text": [f"alpha beta w{i % 4}" for i in range(30)],
            "lang": ["en"] * 30,
            "n": np.arange(30, dtype=np.int64) * 20,
        }
    )
    idx = str(tmp_path / "mstidx")
    build_index(rd.from_pandas(docs), idx, CFG, html_col=None, ts_col=None)
    plain = '{"query": {"match": {"text": "{{q}}"}}, "size": 10}'
    ranged = (
        '{"query": {"bool": {"must": [{"match": {"text": "{{q}}"}}],'
        ' "filter": [{"range": {"n": {"gte": {{lo}}, "lte": {{hi}}}}}]}},'
        ' "size": 10}'
    )
    entries = [
        {"source": plain, "params": {"q": "alpha"}},
        {"source": ranged, "params": {"q": "alpha", "lo": 10, "hi": 400}},
    ]
    got = run_msearch_template(entries, idx, CFG).to_pandas()
    a = run_search_template(plain, [{"q": "alpha"}], idx, CFG).to_pandas()
    b = run_search_template(
        ranged, [{"q": "alpha", "lo": 10, "hi": 400}], idx, CFG
    ).to_pandas()
    g0 = got[got["query_id"] == 0].sort_values("rank").reset_index(drop=True)
    g1 = got[got["query_id"] == 1].sort_values("rank").reset_index(drop=True)
    assert g0["doc_id"].tolist() == a.sort_values("rank")["doc_id"].tolist()
    assert g1["doc_id"].tolist() == b.sort_values("rank")["doc_id"].tolist()
    assert g1["score"].tolist() == b.sort_values("rank")["score"].tolist()
