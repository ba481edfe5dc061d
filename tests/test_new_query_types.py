"""ES query-type additions (round 4): constant_score, boosting,
terms_set, match_bool_prefix, simple_query_string — each composed from
the already rank-verified plain-match / bool paths as the oracle, run
through the distributed run_queries surface.  Cross-engine parity is
covered by the DuckDB oracles in __ray_entry__.oracle_sql()."""

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
        "url": [f"d{i}" for i in range(12)],
        "text": [
            "apple banana cherry",
            "apple banana",
            "apple cherry",
            "banana cherry",
            "apple apricot",
            "banana date",
            "cherry drum",
            "apple banana cherry date",
            "date drum",
            "apple date date",
            "apricot drum",
            "banana apricot cherry",
        ],
        "lang": ["en"] * 12,
    }
)


@pytest.fixture(scope="module")
def qt_index(ray_session, tmp_path_factory):
    import ray.data as rd

    idx = str(tmp_path_factory.mktemp("qtidx"))
    build_index(rd.from_pandas(DOCS), idx, CFG, html_col=None, ts_col=None)
    return idx


def _run(qs: pd.DataFrame, idx: str) -> pd.DataFrame:
    out = run_queries(qs, idx, CFG, concurrency=2).to_pandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _match_map(s: IndexSearcher, text: str) -> dict[int, float]:
    r = s.search(text, k=100)
    return dict(zip(r["doc_id"], r["score"]))


def test_constant_score_ids_and_boost(qt_index):
    s = IndexSearcher(qt_index, CFG)
    matching = sorted(set(_match_map(s, "apple")) | set(_match_map(s, "date")))
    k = 4
    assert len(matching) > k  # the k-cut must actually truncate
    out = _run(
        pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": "constant_score",
                "text": ["apple date"],
                "boost": [2.5],
                "k": np.int32(k),
            }
        ),
        qt_index,
    )
    assert out["doc_id"].tolist() == matching[:k]  # k smallest matching ids
    assert (out["score"] == 2.5).all()
    assert out["rank"].tolist() == list(range(1, k + 1))


def test_constant_score_default_boost_and_absent(qt_index):
    out = _run(
        pd.DataFrame(
            {
                "query_id": np.int64([0, 1]),
                "type": "constant_score",
                "text": ["drum", "zzzabsent"],
                "boost": [np.nan, np.nan],
                "k": np.int32(10),
            }
        ),
        qt_index,
    )
    assert set(out["query_id"]) == {0}  # absent query yields no rows
    assert (out["score"] == 1.0).all()  # ES default boost


def test_boosting_demotes_negative_matches(qt_index):
    s = IndexSearcher(qt_index, CFG)
    base = _match_map(s, "apple banana")
    neg = set(_match_map(s, "date"))
    nb = 0.4
    exp = {
        d: float(round6(sc * nb)) if d in neg else sc for d, sc in base.items()
    }
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = _run(
        pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": "boosting",
                "text": ["apple banana"],
                "negative": ["date"],
                "negative_boost": [nb],
                "k": np.int32(10),
            }
        ),
        qt_index,
    )
    assert list(zip(out["doc_id"], out["score"])) == ranked
    # demotion must have actually reordered something vs the plain match
    plain = sorted(base.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [d for d, _ in plain] != [d for d, _ in ranked]


def test_boosting_absent_negative_equals_match(qt_index):
    s = IndexSearcher(qt_index, CFG)
    out = _run(
        pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": "boosting",
                "text": ["cherry"],
                "negative": ["zzzabsent"],
                "negative_boost": [0.1],
                "k": np.int32(10),
            }
        ),
        qt_index,
    )
    want = s.search("cherry", k=10)
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert out["score"].tolist() == want["score"].tolist()


@pytest.mark.parametrize("msm", [1, 2, 3])
def test_terms_set_equals_bool_msm(qt_index, msm):
    s = IndexSearcher(qt_index, CFG)
    terms = ["apple", "cherry", "date"]
    want = s.search_bool(
        must=[], should=terms, minimum_should_match=msm, k=100
    )
    out = _run(
        pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": "terms_set",
                "text": [" ".join(terms)],
                "msm": [msm],
                "k": np.int32(100),
            }
        ),
        qt_index,
    )
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert out["score"].tolist() == want["score"].tolist()


def test_terms_set_msm_exceeds_terms(qt_index):
    out = run_queries(
        pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": "terms_set",
                "text": ["apple cherry"],
                "msm": [3],
                "k": np.int32(10),
            }
        ),
        qt_index,
        CFG,
        concurrency=2,
    )
    # Ray's Dataset.to_pandas drops columns at 0 rows, so the stable
    # empty contract is checked through the Dataset schema instead
    assert out.count() == 0
    assert {"query_id", "rank", "doc_id", "score"} <= set(out.schema().names)


def test_match_bool_prefix_composes(qt_index):
    # "banana ap": rest=["banana"] scores BM25; prefix "ap" expands to
    # {apple, apricot} and adds 1.0 per doc matching either (the ES
    # constant_score multi-term rewrite — 1.0 per DOC, not per term)
    s = IndexSearcher(qt_index, CFG)
    base = _match_map(s, "banana")
    pref = set(_match_map(s, "apple")) | set(_match_map(s, "apricot"))
    exp = {
        d: float(round6(base.get(d, 0.0) + (1.0 if d in pref else 0.0)))
        for d in set(base) | pref
    }
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = _run(
        pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": "match_bool_prefix",
                "text": ["banana ap"],
                "k": np.int32(10),
            }
        ),
        qt_index,
    )
    assert list(zip(out["doc_id"], out["score"])) == ranked


def test_match_bool_prefix_prefix_only(qt_index):
    # single token: no complete terms, pure prefix — every match ties at
    # 1.0 and ties break doc_id asc
    s = IndexSearcher(qt_index, CFG)
    pref = sorted(set(_match_map(s, "date")) | set(_match_map(s, "drum")))
    out = _run(
        pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": "match_bool_prefix",
                "text": ["d"],
                "k": np.int32(10),
            }
        ),
        qt_index,
    )
    assert out["doc_id"].tolist() == pref[:10]
    assert (out["score"] == 1.0).all()


def test_simple_query_string_equals_bool(qt_index):
    s = IndexSearcher(qt_index, CFG)
    cases = [
        # (+must, bare should, -must_not, expected msm)
        ("+apple banana date -drum", ["apple"], ["banana", "date"], "drum", 0),
        ("banana cherry", [], ["banana", "cherry"], None, 1),
        ("+apple +cherry", ["apple", "cherry"], [], None, 0),
    ]
    qs = pd.DataFrame(
        {
            "query_id": np.arange(len(cases), dtype=np.int64),
            "type": "simple_query_string",
            "text": [c[0] for c in cases],
            "k": np.int32(100),
        }
    )
    out = _run(qs, qt_index)
    for qid, (_, must, should, mn, msm) in enumerate(cases):
        want = s.search_bool(
            must=must, should=should, must_not=mn,
            minimum_should_match=msm, k=100,
        )
        got = out[out["query_id"] == qid]
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), cases[qid]
        assert got["score"].tolist() == want["score"].tolist(), cases[qid]


def test_simple_query_string_mixed_with_other_types(qt_index):
    # the sqs rewrite mutates the query frame — other rows in the same
    # batch must pass through untouched
    s = IndexSearcher(qt_index, CFG)
    qs = pd.DataFrame(
        {
            "query_id": np.int64([0, 1]),
            "type": ["match", "simple_query_string"],
            "text": ["apple banana", "+cherry -date"],
            "k": np.int32(10),
        }
    )
    out = _run(qs, qt_index)
    want0 = s.search("apple banana", k=10)
    got0 = out[out["query_id"] == 0]
    assert got0["doc_id"].tolist() == want0["doc_id"].tolist()
    want1 = s.search_bool(must=["cherry"], must_not="date", k=10)
    got1 = out[out["query_id"] == 1]
    assert got1["doc_id"].tolist() == want1["doc_id"].tolist()


@pytest.fixture(scope="module")
def qt_pos_index(ray_session, tmp_path_factory):
    import ray.data as rd

    idx = str(tmp_path_factory.mktemp("qtposidx"))
    build_index(
        rd.from_pandas(DOCS), idx,
        EngineConfig(num_partitions=4, index_positions=True),
        html_col=None, ts_col=None,
    )
    return idx


CFG_POS = EngineConfig(num_partitions=4, index_positions=True)


def test_query_string_equals_bool(qt_index):
    """Lucene-syntax subset: +must / -not / NOT / AND / bare-should all
    rewrite onto the rank-verified bool path."""
    s = IndexSearcher(qt_index, CFG)
    cases = [
        ("+apple banana -drum", ["apple"], ["banana"], "drum", 0),
        ("apple AND banana", ["apple", "banana"], [], None, 0),
        ("apple NOT drum", [], ["apple"], "drum", 1),
        ("banana OR cherry", [], ["banana", "cherry"], None, 1),
    ]
    qs = pd.DataFrame(
        {
            "query_id": np.arange(len(cases), dtype=np.int64),
            "type": "query_string",
            "text": [c[0] for c in cases],
            "k": np.int32(100),
        }
    )
    out = _run(qs, qt_index)
    for qid, (_, must, should, mn, msm) in enumerate(cases):
        want = s.search_bool(
            must=must, should=should, must_not=mn,
            minimum_should_match=msm, k=100,
        )
        got = out[out["query_id"] == qid]
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), cases[qid]
        assert got["score"].tolist() == want["score"].tolist(), cases[qid]


def test_query_string_phrase_clause(qt_pos_index):
    """A quoted clause is a MUST phrase: match set = docs with the
    adjacent bigram; score = round6(phrase BM25 + matched should BM25)."""
    s = IndexSearcher(qt_pos_index, CFG_POS)
    out = run_queries(
        pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": ["query_string"],
                "text": ['"apple banana" cherry'],
                "k": np.int32(100),
            }
        ),
        qt_pos_index, CFG_POS, concurrency=2,
    ).to_pandas().sort_values("rank")
    ph = s.search_phrase("apple banana", k=100)
    cherry = dict(zip(*(lambda r: (r["doc_id"], r["score"]))(s.search("cherry", k=100))))
    want = {
        int(d): round6(np.array([sc + cherry.get(int(d), 0.0)]))[0]
        for d, sc in zip(ph["doc_id"], ph["score"])
    }
    got = dict(zip(out["doc_id"].astype(int), out["score"]))
    assert got == want
    # docs with both words NON-adjacent must not appear
    assert set(out["doc_id"].astype(int)) == set(ph["doc_id"].astype(int))


def test_query_string_negated_phrase_degrades_to_terms(qt_pos_index):
    # -"apple banana" adds both terms to must_not (documented): every
    # apple doc is excluded, so 'apple' as should matches nothing
    out = run_queries(
        pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": ["query_string"],
                "text": ['-"apple banana" apple'],
                "k": np.int32(100),
            }
        ),
        qt_pos_index, CFG_POS, concurrency=2,
    ).to_pandas()
    assert len(out) == 0


def test_ids_query(qt_index):
    """ES ids query: docs whose _id is in the set, constant score 1.0,
    ties doc_id asc; missing ids are simply absent."""
    out = _run(
        pd.DataFrame(
            {
                "query_id": np.int64([0]),
                "type": "ids",
                "text": ["d3|d7|d11|zzmissing"],
                "k": np.int32(10),
            }
        ),
        qt_index,
    )
    s = IndexSearcher(qt_index, CFG)
    want = sorted(
        int(d) for seg in s.segments
        for d, k2 in zip(seg.doc_ids_store, seg.keys)
        if k2 in {"d3", "d7", "d11"}
    )
    assert out["doc_id"].tolist() == want
    assert (out["score"] == 1.0).all()
    assert out["rank"].tolist() == list(range(1, len(want) + 1))


def test_constant_score_expansion_filters(qt_index):
    """constant_score with an expansion filter (prefix / wildcard /
    exists): the k smallest doc ids of the expansion match set at the
    boost score — the ES filter-context rewrite for multi-term queries."""
    s = IndexSearcher(qt_index, CFG)
    pref_ids = sorted(set(_match_map(s, "apple")) | set(_match_map(s, "apricot")))
    out = _run(
        pd.DataFrame(
            {
                "query_id": np.int64([0, 1]),
                "type": "constant_score",
                "text": [None, None],
                "prefix": ["ap", None],
                "wildcard": [None, "d*m"],
                "boost": [3.0, 1.0],
                "k": np.int32(10),
            }
        ),
        qt_index,
    )
    g0 = out[out["query_id"] == 0]
    assert g0["doc_id"].tolist() == pref_ids[:10]
    assert (g0["score"] == 3.0).all()
    drum_ids = sorted(_match_map(s, "drum"))
    g1 = out[out["query_id"] == 1]
    assert g1["doc_id"].tolist() == drum_ids[:10]
    assert (g1["score"] == 1.0).all()


def test_random_score_deterministic(qt_index):
    """ES function_score random_score: the md5-contract score per
    (seed, doc_id) — same seed reproduces the ranking exactly, a
    different seed permutes it; match set unchanged."""
    import hashlib

    q = pd.DataFrame(
        {
            "query_id": np.int64([0]),
            "type": "random_score",
            "text": ["apple"],
            "seed": ["7"],
            "k": np.int32(20),
        }
    )
    a = _run(q, qt_index)
    b = _run(q, qt_index)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()
    for d, sc in zip(a["doc_id"], a["score"]):
        want = (
            int.from_bytes(hashlib.md5(f"7:{d}".encode()).digest()[8:16], "little")
            % 1_000_000
        ) / 1e6
        assert sc == want
    c = _run(q.assign(seed="8"), qt_index)
    assert set(c["doc_id"]) == set(a["doc_id"])  # same match set
    assert c["doc_id"].tolist() != a["doc_id"].tolist()  # different order


def test_wrapper_query_rewrites(ray_session, tmp_path):
    """ES wrapper query: base64(JSON) inner match / match_phrase rewritten
    at plan time — identical results to the native rows; undecodable or
    unsupported inners are hard errors."""
    import base64
    import json

    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import run_queries

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(4)],
            "text": [
                "alpha beta gamma",
                "alpha gamma beta",
                "beta alpha",
                "gamma only here",
            ],
            "lang": ["en"] * 4,
        }
    )
    cfg = EngineConfig(num_partitions=2, index_positions=True)
    d = str(tmp_path / "wrapx")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)

    def enc(obj):
        return base64.b64encode(json.dumps(obj).encode()).decode()

    wrapped = pd.DataFrame(
        {
            "query_id": [0, 1],
            "text": [
                enc({"match": {"text": "alpha beta"}}),
                enc({"match_phrase": {"text": {"query": "alpha beta", "slop": 1}}}),
            ],
            "type": ["wrapper", "wrapper"],
        }
    )
    native = pd.DataFrame(
        {
            "query_id": [0, 1],
            "text": ["alpha beta", "alpha beta"],
            "type": [None, "phrase"],
            "slop": [None, 1],
        }
    )
    got = run_queries(wrapped, d, cfg).to_pandas().sort_values(["query_id", "rank"])
    want = run_queries(native, d, cfg).to_pandas().sort_values(["query_id", "rank"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # phrase slop=1 matches the transposed doc u1 (gap 1), plain adjacency would not
    assert "u1" in set(got[got["query_id"] == 1]["key"])
    for bad in ("notbase64!!", enc({"regexp": {"text": "a.*"}}), enc([1, 2])):
        with pytest.raises(ValueError, match="wrapper"):
            run_queries(
                pd.DataFrame({"query_id": [0], "text": [bad], "type": ["wrapper"]}),
                d, cfg,
            )


def test_match_fuzziness_expansion(ray_session, tmp_path):
    """match fuzziness=1 == the bool-OR of the global edit-1 dictionary
    expansion; fuzziness>1 rejected; no-expansion probe -> empty."""
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import run_queries

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(5)],
            "text": [
                "brown fox",        # edit-1 of "browm"
                "brow fox",         # deletion
                "crown fox",        # substitution at 0... dist(browm,crown)=2 -> no
                "brownx fox",       # insertion at end -> dist 2 from browm? b-r-o-w-n-x vs b-r-o-w-m: sub+ins = 2 -> no
                "frown fox",
            ],
            "lang": ["en"] * 5,
        }
    )
    cfg = EngineConfig(num_partitions=2)
    d = str(tmp_path / "fzx")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    fuzzy = pd.DataFrame({"query_id": [0], "text": ["browm"], "fuzziness": [1]})
    got = run_queries(fuzzy, d, cfg).to_pandas()
    # expansion of "browm": brown (sub), brow (del); crown/frown/brownx are dist 2
    native = pd.DataFrame({"query_id": [0], "text": ["brown brow"]})
    want = run_queries(native, d, cfg).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("rank").reset_index(drop=True),
        want.sort_values("rank").reset_index(drop=True),
    )
    assert set(got["key"]) == {"u0", "u1"}
    # fuzziness=2 widens to the dist-2 variants (crown/brownx/frown)
    got2 = run_queries(
        pd.DataFrame(
            {"query_id": [0], "text": ["browm"], "fuzziness": [2],
             "k": np.int32(10)}
        ),
        d, cfg,
    ).to_pandas()
    assert set(got2["key"]) == {"u0", "u1", "u2", "u3", "u4"}
    # "auto": the 5-char probe gets 1 edit (AUTO:3,6) == the fuzziness=1 set
    got_a = run_queries(
        pd.DataFrame({"query_id": [0], "text": ["browm"], "fuzziness": ["auto"]}),
        d, cfg,
    ).to_pandas()
    assert set(got_a["key"]) == {"u0", "u1"}
    with pytest.raises(ValueError, match="fuzziness"):
        run_queries(
            pd.DataFrame({"query_id": [0], "text": ["browm"], "fuzziness": [3]}),
            d, cfg,
        )
    empty = run_queries(
        pd.DataFrame({"query_id": [0], "text": ["zzzzzzzzz"], "fuzziness": [1]}),
        d, cfg,
    )
    assert empty.count() == 0


def test_weighted_terms_dot_product(ray_session, tmp_path):
    """weighted_terms == Σ w_t · tf(t, d) dot product (no idf / length
    norm); absent terms contribute 0; malformed pairs are hard errors."""
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import run_queries

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(4)],
            "text": [
                "alpha alpha beta",      # 2*1.5 + 1*0.5 = 3.5
                "beta beta beta",        # 3*0.5 = 1.5
                "alpha gamma",           # 1.5 (gamma unweighted)
                "nothing relevant",
            ],
            "lang": ["en"] * 4,
        }
    )
    cfg = EngineConfig(num_partitions=2)
    d = str(tmp_path / "wtx")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    q = pd.DataFrame(
        {"query_id": [0], "text": ["alpha:1.5 beta:0.5 zzznothing:9.0"],
         "type": ["weighted_terms"]}
    )
    got = run_queries(q, d, cfg).to_pandas().sort_values("rank")
    want = {"u0": 3.5, "u1": 1.5, "u2": 1.5}
    assert dict(zip(got["key"], got["score"])) == want
    assert got["key"].tolist() == ["u0", "u1", "u2"]  # tie u1/u2 -> doc_id asc
    with pytest.raises(ValueError, match="weighted_terms"):
        run_queries(
            pd.DataFrame({"query_id": [0], "text": ["alpha"], "type": ["weighted_terms"]}),
            d, cfg,
        )
    with pytest.raises(ValueError, match="one token"):
        run_queries(
            pd.DataFrame({"query_id": [0], "text": ["two-words:1.0"],
                          "type": ["weighted_terms"]}),
            d, cfg,
        )


def test_validate_query(ray_session, tmp_path):
    """_validate/query: per-row verdicts with plan-time errors; a bad
    row doesn't mask good ones."""
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import run_validate

    docs = pd.DataFrame(
        {"url": ["u0", "u1"], "text": ["alpha beta", "beta gamma"],
         "lang": ["en", "en"]}
    )
    cfg = EngineConfig(num_partitions=2)
    d = str(tmp_path / "valx")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    q = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["alpha", "notbase64!!", "alpha:bad"],
            "type": [None, "wrapper", "weighted_terms"],
        }
    )
    got = run_validate(q, d, cfg)
    assert got["valid"].tolist() == [True, False, False]
    assert got["error"].iloc[0] == ""
    assert "wrapper" in got["error"].iloc[1]
    assert "weighted_terms" in got["error"].iloc[2] or "float" in got["error"].iloc[2]
