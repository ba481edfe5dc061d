"""ES bool queries: multiple must/should match clauses +
minimum_should_match + must_not, scored as round6(sum of matched
clauses' round6'd BM25) — composed from per-clause plain searches as
the oracle (each clause IS a plain match, already rank-verified)."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.bm25 import round6
from kafka_es_ray.query.engine import IndexSearcher, run_queries

CFG = EngineConfig(num_partitions=4)

DOCS = pd.DataFrame(
    {
        "url": [f"d{i}" for i in range(10)],
        "text": [
            "apple banana cherry",
            "apple banana",
            "apple cherry",
            "banana cherry",
            "apple",
            "banana",
            "cherry",
            "apple banana cherry date",
            "date elderberry",
            "apple date date",
        ],
        "lang": ["en"] * 10,
    }
)


@pytest.fixture(scope="module")
def bool_index(ray_session, tmp_path_factory):
    import ray.data as rd

    idx = str(tmp_path_factory.mktemp("boolidx"))
    build_index(rd.from_pandas(DOCS), idx, CFG, html_col=None, ts_col=None)
    return idx


def _clause_scores(s: IndexSearcher, clause: str) -> dict[str, float]:
    r = s.search(clause, k=100)
    return dict(zip(r["key"], r["score"]))


def _expect(
    s: IndexSearcher,
    must: list[str],
    should: list[str] = (),
    must_not: str | None = None,
    msm: int | None = None,
) -> dict[str, float]:
    """Compose the bool result from per-clause plain matches."""
    m_maps = [_clause_scores(s, c) for c in must]
    s_maps = [_clause_scores(s, c) for c in should]
    if msm is None:
        msm = 0 if must else 1
    cand = set(m_maps[0]) if m_maps else set().union(*s_maps) if s_maps else set()
    for m in m_maps[1:]:
        cand &= set(m)
    if msm > 0:
        cand = {k for k in cand if sum(k in sm for sm in s_maps) >= msm}
    if must_not:
        cand -= set(_clause_scores(s, must_not))
    return {
        k: float(round6(sum(m.get(k, 0.0) for m in m_maps + s_maps)))
        for k in cand
    }


def test_single_must_equals_match(bool_index):
    s = IndexSearcher(bool_index, CFG)
    a = s.search_bool(must=["apple banana"], k=100)
    b = s.search("apple banana", k=100)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize(
    "must,should,must_not,msm",
    [
        (["apple", "banana"], [], None, None),          # AND of clauses
        (["apple"], ["cherry", "date"], None, None),    # should boosts only
        ([], ["apple", "date"], None, 1),               # pure should union
        ([], ["apple", "cherry"], None, 2),             # msm=2 intersection
        (["apple"], ["banana", "date"], "cherry", 1),   # all parts at once
        (["apple banana"], ["date elderberry"], None, None),  # multi-term clauses
    ],
)
def test_bool_composes_clause_scores(bool_index, must, should, must_not, msm):
    s = IndexSearcher(bool_index, CFG)
    got = s.search_bool(
        must=must, should=should, must_not=must_not, minimum_should_match=msm, k=100
    )
    want = _expect(s, must, should, must_not, msm)
    assert dict(zip(got["key"], got["score"])) == want
    assert got["score"].is_monotonic_decreasing


def test_bool_empty_cases(bool_index):
    s = IndexSearcher(bool_index, CFG)
    assert len(s.search_bool(must=["zzzabsent"], should=["apple"])) == 0
    assert len(s.search_bool(must=[], should=["apple"], minimum_should_match=2)) == 0
    assert len(s.search_bool(must=["apple"], minimum_should_match=1)) == 0  # msm > #should
    assert len(s.search_bool()) == 0
    # an absent SHOULD clause is dropped, not fatal
    r = s.search_bool(must=["apple"], should=["zzzabsent"])
    assert r["key"].tolist() == s.search("apple", k=10)["key"].tolist()


def test_distributed_bool_parity(bool_index, ray_session):
    import ray.data as rd

    s = IndexSearcher(bool_index, CFG)
    qs = pd.DataFrame(
        {
            "query_id": np.arange(4, dtype=np.int64),
            "type": "bool",
            "must": ["apple|banana", "apple", None, "apple banana"],
            "should": [None, "cherry|date", "apple|date", "date elderberry"],
            "must_not": [None, None, "cherry", None],
            "msm": [None, None, 1, None],
            "k": 100,
        }
    )
    out = run_queries(rd.from_pandas(qs), bool_index, CFG, concurrency=2).to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = []
    for r in qs.itertuples(index=False):
        must = r.must.split("|") if isinstance(r.must, str) else []
        should = r.should.split("|") if isinstance(r.should, str) else []
        mn = r.must_not if isinstance(r.must_not, str) else None
        msm = int(r.msm) if r.msm is not None and not pd.isna(r.msm) else None
        exp.append(
            s.search_bool(
                must=must, should=should, must_not=mn, minimum_should_match=msm, k=100
            ).assign(query_id=np.int64(r.query_id))
        )
    exp = pd.concat(exp, ignore_index=True).sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["query_id", "rank", "doc_id", "score"]].astype({"query_id": np.int64}),
        exp[["query_id", "rank", "doc_id", "score"]].astype({"query_id": np.int64}),
    )
