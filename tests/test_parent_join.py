"""ES parent-child joins (join field + has_child / has_parent): parents
and children co-located by routing = parent key; both queries are one
shard-local sweep with no exchange."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.parent_join import run_has_child, run_has_parent

CFG = EngineConfig(
    num_partitions=3,
    keyword_cols=("join_name", "parent_key", "grade"),
    numeric_cols=("score",),
)


@pytest.fixture(scope="module")
def pj_index(ray_session, tmp_path_factory):
    import ray.data as rd

    # parents P0..P3; children: P0 -> 3 (two grade=a), P1 -> 1 (grade=a),
    # P2 -> 2 (grade=b), P3 -> none
    parents = pd.DataFrame(
        {
            "url": [f"P{i}" for i in range(4)],
            "text": ["order open"] * 4,
            "lang": "en",
            "routing": [f"P{i}" for i in range(4)],
            "join_name": "parent",
            "parent_key": "",
            "grade": ["g1", "g2", "g1", "g2"],
            "score": np.nan,
        }
    )
    kids = [
        ("C0", "P0", "a", 10.0), ("C1", "P0", "a", 20.0), ("C2", "P0", "b", 30.0),
        ("C3", "P1", "a", 40.0),
        ("C4", "P2", "b", 50.0), ("C5", "P2", "b", 5.0),
    ]
    children = pd.DataFrame(
        {
            "url": [k[0] for k in kids],
            "text": ["line item"] * len(kids),
            "lang": "en",
            "routing": [k[1] for k in kids],
            "join_name": "child",
            "parent_key": [k[1] for k in kids],
            "grade": [k[2] for k in kids],
            "score": [k[3] for k in kids],
        }
    )
    d = str(tmp_path_factory.mktemp("pj") / "idx")
    build_index(
        rd.from_pandas(pd.concat([parents, children], ignore_index=True)),
        d, CFG, html_col=None, ts_col=None, routing_col="routing",
    )
    return d


def test_has_child_counts_and_min_children(pj_index):
    out = run_has_child(
        pj_index, {"kw": [("grade", "a")]}, min_children=1, cfg=CFG
    ).to_pandas().sort_values("key")
    assert list(zip(out["key"], out["n_children"])) == [("P0", 2), ("P1", 1)]
    out2 = run_has_child(
        pj_index, {"kw": [("grade", "a")]}, min_children=2, cfg=CFG
    ).to_pandas()
    assert out2["key"].tolist() == ["P0"]


def test_has_child_range_filter(pj_index):
    out = run_has_child(
        pj_index, {"range": [("score", 20.0, None)]}, min_children=2, cfg=CFG
    ).to_pandas().sort_values("key")
    # P0 has C1(20)+C2(30); P2 has only C4(50) >= 20
    assert list(zip(out["key"], out["n_children"])) == [("P0", 2)]


def test_has_parent(pj_index):
    out = run_has_parent(
        pj_index, {"kw": [("grade", "g1")]}, cfg=CFG
    ).to_pandas().sort_values("key")
    # parents g1 = P0, P2 -> their children
    assert list(zip(out["key"], out["parent"])) == [
        ("C0", "P0"), ("C1", "P0"), ("C2", "P0"), ("C4", "P2"), ("C5", "P2"),
    ]


def test_no_matches_empty_contract(pj_index):
    out = run_has_child(pj_index, {"kw": [("grade", "zzz")]}, cfg=CFG)
    assert out.count() == 0 and set(out.schema().names) == {"key", "n_children"}
    out2 = run_has_parent(pj_index, {"kw": [("grade", "zzz")]}, cfg=CFG)
    assert out2.count() == 0 and set(out2.schema().names) == {"key", "parent"}


def test_children_terms_agg(pj_index):
    from kafka_es_ray.query.parent_join import run_children_terms_agg

    # parents g1 = P0, P2; their children's grades: a,a,b (P0) + b,b (P2)
    out = run_children_terms_agg(
        pj_index, {"kw": [("grade", "g1")]}, "grade", cfg=CFG
    )
    assert list(zip(out["value"], out["n"])) == [("b", 3), ("a", 2)]
    empty = run_children_terms_agg(
        pj_index, {"kw": [("grade", "zzz")]}, "grade", cfg=CFG
    )
    assert len(empty) == 0 and list(empty.columns) == ["value", "n"]


def test_parent_terms_agg(pj_index):
    from kafka_es_ray.query.parent_join import run_parent_terms_agg

    # children grade=a -> parents P0, P1 (each once) -> grades g1, g2
    out = run_parent_terms_agg(
        pj_index, {"kw": [("grade", "a")]}, "grade", cfg=CFG
    )
    assert list(zip(out["value"], out["n"])) == [("g1", 1), ("g2", 1)]
    # grade=b -> parents P0, P2, BOTH g1; P0 counted once despite C2
    out2 = run_parent_terms_agg(
        pj_index, {"kw": [("grade", "b")]}, "grade", cfg=CFG
    )
    assert list(zip(out2["value"], out2["n"])) == [("g1", 2)]
    empty = run_parent_terms_agg(
        pj_index, {"kw": [("grade", "zzz")]}, "grade", cfg=CFG
    )
    assert len(empty) == 0 and list(empty.columns) == ["value", "n"]


def test_has_child_inner_hits(pj_index):
    from kafka_es_ray.query.parent_join import run_has_child_inner_hits

    # grade=a children: C0,C1 (P0), C3 (P1); key-asc order within parent
    out = run_has_child_inner_hits(
        pj_index, {"kw": [("grade", "a")]}, n_hits=3, cfg=CFG
    ).to_pandas().sort_values(["key", "inner_rank"]).reset_index(drop=True)
    assert list(zip(out["key"], out["child_key"], out["inner_rank"])) == [
        ("P0", "C0", 1), ("P0", "C1", 2), ("P1", "C3", 1),
    ]
    # n_hits caps the inner list
    capped = run_has_child_inner_hits(
        pj_index, {"kw": [("grade", "a")]}, n_hits=1, cfg=CFG
    ).to_pandas()
    assert (capped["inner_rank"] == 1).all() and len(capped) == 2
    empty = run_has_child_inner_hits(
        pj_index, {"kw": [("grade", "zzz")]}, cfg=CFG
    )
    assert empty.count() == 0 and set(empty.schema().names) == {
        "key", "child_key", "inner_rank",
    }
