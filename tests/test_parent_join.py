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


# ---- ES nested query (block join) ----

NESTED_CFG = EngineConfig(
    num_partitions=3,
    keyword_cols=("join_name", "parent_key", "grade"),
    numeric_cols=("score",),
)


@pytest.fixture(scope="module")
def nested_index(ray_session, tmp_path_factory):
    import ray.data as rd

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
        # (key, parent, text, grade, score)
        ("C0", "P0", "red fox jumps", "a", 10.0),
        ("C1", "P0", "red red dog", "a", 20.0),
        ("C2", "P0", "blue cat", "b", 30.0),
        ("C3", "P1", "red fox red fox", "a", 40.0),
        ("C4", "P2", "blue dog sleeps here", "b", 50.0),
        ("C5", "P2", "fox den", "b", 5.0),
        ("C6", "P3", "green tree", "a", 7.0),
    ]
    children = pd.DataFrame(
        {
            "url": [k[0] for k in kids],
            "text": [k[2] for k in kids],
            "lang": "en",
            "routing": [k[1] for k in kids],
            "join_name": "child",
            "parent_key": [k[1] for k in kids],
            "grade": [k[3] for k in kids],
            "score": [k[4] for k in kids],
        }
    )
    d = str(tmp_path_factory.mktemp("nst") / "idx")
    build_index(
        rd.from_pandas(pd.concat([parents, children], ignore_index=True)),
        d, NESTED_CFG, html_col=None, ts_col=None, routing_col="routing",
    )
    docs = {r.url: r.text for r in pd.concat(
        [parents, children], ignore_index=True).itertuples()}
    kid_parent = {k[0]: k[1] for k in kids}
    return d, docs, kid_parent, {k[0]: (k[3], k[4]) for k in kids}


def _nested_bruteforce(docs, kid_parent, query, score_mode, meta=None,
                       grade=None, score_min=None):
    """From-scratch ES nested semantics: BM25 per child over GLOBAL
    stats (all docs), combine matching children per root."""
    import math

    toks = {k: v.lower().split() for k, v in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    qts = sorted(set(query.split()))
    df = {t: sum(1 for v in toks.values() if t in v) for t in qts}
    per_root = {}
    child_scores = {}
    for ck, parent in kid_parent.items():
        if grade is not None and meta[ck][0] != grade:
            continue
        if score_min is not None and not meta[ck][1] >= score_min:
            continue
        tv = toks[ck]
        s = 0.0
        hit = False
        for t in qts:
            tf = tv.count(t)
            if not tf or not df[t]:
                continue
            hit = True
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(tv) / avgdl))
        if hit:
            per_root.setdefault(parent, []).append((ck, s))
            child_scores[ck] = s
    out = {}
    for root, pairs in per_root.items():
        vals = [s for _, s in pairs]
        comb = {
            "sum": sum(vals), "max": max(vals), "min": min(vals),
            "avg": sum(vals) / len(vals), "none": 0.0,
        }[score_mode]
        out[root] = (round(comb + 1e-12, 6) if comb >= 0 else round(comb, 6),
                     len(vals))
    return out, child_scores


@pytest.mark.parametrize("mode", ["avg", "sum", "max", "min", "none"])
def test_nested_score_modes_match_bruteforce(nested_index, mode):
    from kafka_es_ray.query.parent_join import run_nested

    d, docs, kid_parent, meta = nested_index
    got = run_nested(d, "red fox", score_mode=mode, k=10, inner_n=5,
                     cfg=NESTED_CFG)
    want, child_scores = _nested_bruteforce(docs, kid_parent, "red fox", mode)
    heads = got.drop_duplicates("key")
    assert set(heads["key"]) == set(want)
    for r in heads.itertuples():
        assert abs(r.score - want[r.key][0]) < 2e-6, (mode, r.key)
        assert r.n_matched == want[r.key][1]
    # ranking: score desc, key asc
    ranked = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))
    assert heads.sort_values("rank")["key"].tolist() == [k for k, _ in ranked]
    # inner hits: every matching child present (inner_n=5 > any family),
    # child_score desc / child_key asc within root, round6'd
    for root, grp in got.groupby("key"):
        fam = sorted(
            ((ck, round(child_scores[ck] + 1e-12, 6))
             for ck, p in kid_parent.items()
             if p == root and ck in child_scores),
            key=lambda t: (-t[1], t[0]),
        )
        grp = grp.sort_values("inner_rank")
        assert grp["child_key"].tolist() == [ck for ck, _ in fam]
        assert np.allclose(grp["child_score"], [s for _, s in fam], atol=2e-6)


def test_nested_child_filter_and_edges(nested_index):
    from kafka_es_ray.query.parent_join import run_nested

    d, docs, kid_parent, meta = nested_index
    got = run_nested(
        d, "red fox", score_mode="sum", k=10, inner_n=5,
        child_filter={"kw": [("grade", "a")], "range": [("score", 15.0, None)]},
        cfg=NESTED_CFG,
    )
    want, _ = _nested_bruteforce(
        docs, kid_parent, "red fox", "sum", meta=meta, grade="a",
        score_min=15.0,
    )
    heads = got.drop_duplicates("key")
    assert set(heads["key"]) == set(want)
    for r in heads.itertuples():
        assert abs(r.score - want[r.key][0]) < 2e-6
    # no-match query and empty analysis both return the typed empty frame
    for q in ["zzzz qqqq", "   ", ""]:
        empty = run_nested(d, q, cfg=NESTED_CFG)
        assert len(empty) == 0
        assert list(empty.columns) == [
            "rank", "key", "score", "n_matched", "inner_rank", "child_key",
            "child_score",
        ]
    # k cuts the root list; inner_n caps per-root hits
    one = run_nested(d, "red fox", score_mode="sum", k=1, inner_n=1,
                     cfg=NESTED_CFG)
    assert one["key"].nunique() == 1 and (one["inner_rank"] == 1).all()
    # roots never match as inner hits even though they contain "order"
    got2 = run_nested(d, "order", score_mode="sum", cfg=NESTED_CFG)
    assert len(got2) == 0
