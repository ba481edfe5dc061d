"""ES _explain (per-term BM25 score breakdown) and scroll (exhaustive
deep pagination via search_after cursors).  Oracles: the breakdown must
reproduce the hit's score from the segment's own df/tf/dl; scroll must
equal one big search, across page boundaries and through score ties."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.bm25 import bm25_idf, bm25_tf_part, round6
from kafka_es_ray.query.engine import (
    IndexSearcher,
    read_manifest,
    run_explain,
    run_queries,
    run_scroll,
)

CFG = EngineConfig(num_partitions=4)

WORDS = ["red", "green", "blue", "cyan", "teal", "plum", "gold", "jade"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 90
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(2, 8)).tolist())
        for _ in range(n)
    ]
    texts[0] = "red red gold"  # known tf for the explain assertions
    texts[1] = "red only here"  # contains red but NOT gold
    texts[40:52] = ["red gold red"] * 12  # identical scores (tie coverage)
    df = pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "doc_id": np.arange(1, n + 1, dtype=np.int64),
            "text": texts,
            "lang": "en",
        }
    )
    idx = str(tmp_path_factory.mktemp("explidx"))
    build_index(
        rd.from_pandas(df), idx, CFG,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    return idx, df


def test_explain_reproduces_hit_score(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    top = s.search("red gold", k=3)
    pairs = pd.DataFrame(
        {
            "query_id": np.arange(len(top), dtype=np.int64),
            "doc_id": top["doc_id"].to_numpy(np.int64),
            "text": "red gold",
        }
    )
    got = run_explain(pairs, idx, CFG)
    # summing each pair's RAW per-term parts reproduces the round6'd hit
    # score; the rounded contributions sum to it within 1 ulp per term
    for qid, hit_score in zip(pairs["query_id"], top["score"]):
        sub = got[got["query_id"] == qid]
        assert abs(sub["contribution"].sum() - hit_score) <= 2e-6
        assert (sub["tf"] > 0).all()


def test_explain_df_tf_are_exact_counts(built):
    idx, df = built
    # doc 1 = "red red gold": tf(red)=2, tf(gold)=1; df from the corpus
    pairs = pd.DataFrame({"query_id": [0], "doc_id": [1], "text": ["red gold"]})
    got = run_explain(pairs, idx, CFG).set_index("term")
    assert got.loc["red", "tf"] == 2
    assert got.loc["gold", "tf"] == 1
    want_df_red = df["text"].str.split().map(lambda t: "red" in t).sum()
    assert got.loc["red", "df"] == want_df_red
    # contribution matches the formula from the same global stats
    m = read_manifest(idx)
    idf = bm25_idf(np.array([int(got.loc["red", "df"])]), int(m["n_docs"]))
    dl = float(len("red red gold".split()))
    part = bm25_tf_part(np.array([2.0]), np.array([dl]), float(m["avgdl"]), 1.2, 0.75)
    assert got.loc["red", "contribution"] == round6(idf * part)[0]


def test_explain_omits_unmatched_terms(built):
    idx, _ = built
    # doc 2 = "red only here" does not contain gold -> no gold row (ES
    # explain lists matched sub-scorers only); absent term never emits
    pairs = pd.DataFrame(
        {"query_id": [0], "doc_id": [2], "text": ["red gold zzzabsentterm"]}
    )
    got = run_explain(pairs, idx, CFG)
    assert got["term"].tolist() == ["red"]


def test_explain_empty_inputs(built):
    idx, _ = built
    pairs = pd.DataFrame({"query_id": [0], "doc_id": [1], "text": ["zzzabsent"]})
    got = run_explain(pairs, idx, CFG)
    assert len(got) == 0
    assert list(got.columns) == [
        "query_id", "doc_id", "term", "df", "tf", "contribution",
    ]


def test_scroll_equals_one_big_search(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    full = s.search("red gold", k=1000)
    queries = pd.DataFrame({"query_id": [0], "text": ["red gold"], "lang": "en"})
    got = run_scroll(queries, idx, page_size=7, cfg=CFG)
    assert got["doc_id"].tolist() == full["doc_id"].tolist()
    assert got["score"].tolist() == full["score"].tolist()
    assert got["rank"].tolist() == list(range(1, len(full) + 1))


def test_scroll_exact_page_multiple(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    full = s.search("red gold", k=1000)
    n = len(full)
    divisors = [p for p in range(2, n + 1) if n % p == 0]
    assert divisors, "fixture must allow an exact page multiple"
    queries = pd.DataFrame({"query_id": [0], "text": ["red gold"], "lang": "en"})
    got = run_scroll(queries, idx, page_size=divisors[0], cfg=CFG)
    # the final empty page must not duplicate or drop anything
    assert got["doc_id"].tolist() == full["doc_id"].tolist()


def test_scroll_multi_query_and_absent(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["red gold", "plum", "zzzabsentterm"],
            "lang": "en",
        }
    )
    got = run_scroll(queries, idx, page_size=5, cfg=CFG)
    assert set(got["query_id"]) == {0, 1}  # absent term yields nothing
    for qid, text in [(0, "red gold"), (1, "plum")]:
        want = s.search(text, k=1000)
        sub = got[got["query_id"] == qid]
        assert sub["doc_id"].tolist() == want["doc_id"].tolist()
        assert sub["rank"].tolist() == list(range(1, len(want) + 1))


def test_sliced_scroll_partitions_the_match_set(built):
    from kafka_es_ray.query.engine import run_sliced_scroll

    idx, _ = built
    queries = pd.DataFrame({"query_id": [0], "text": ["red gold"], "lang": "en"})
    full = run_scroll(queries, idx, page_size=7, cfg=CFG)
    got = run_sliced_scroll(queries, idx, slice_max=3, page_size=7, cfg=CFG)
    # slices are a disjoint partition of the full match set
    assert sorted(got["doc_id"]) == sorted(full["doc_id"])
    assert got.groupby("doc_id").size().max() == 1
    assert set(got["slice_id"]) <= {0, 1, 2}
    # slice-local rank follows the global (score desc, doc_id asc) order
    for _, g in got.groupby("slice_id"):
        g = g.sort_values("rank")
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert (
            g[["score", "doc_id"]]
            .apply(tuple, axis=1)
            .tolist()
            == sorted(
                g[["score", "doc_id"]].apply(tuple, axis=1),
                key=lambda t: (-t[0], t[1]),
            )
        )
    # membership is the md5 oracle contract (partition-invariant)
    import hashlib

    for d, s in zip(got["doc_id"], got["slice_id"]):
        h = int.from_bytes(hashlib.md5(str(int(d)).encode()).digest()[8:16], "little")
        assert h % 3 == s


def test_sliced_scroll_absent_term_empty(built):
    from kafka_es_ray.query.engine import run_sliced_scroll

    idx, _ = built
    queries = pd.DataFrame({"query_id": [0], "text": ["zzzabsentterm"], "lang": "en"})
    got = run_sliced_scroll(queries, idx, slice_max=4, cfg=CFG)
    assert len(got) == 0 and "slice_id" in got.columns
