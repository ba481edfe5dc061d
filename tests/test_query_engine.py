"""Query engine: rank-identical BM25 vs the brute-force oracle (the
mock-transport-golden analog, ElasticsearchBulkSenderTests.kt:30-63),
plus edge paths: absent term, empty query, k > corpus, distributed
query stage."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.fixtures import make_queries
from kafka_es_ray.functions.hashing import route_partition
from kafka_es_ray.functions.textproc import fill_text_from_html
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.bruteforce import bruteforce_topk
from kafka_es_ray.query.engine import IndexSearcher, run_queries

CFG = EngineConfig(num_partitions=4)


@pytest.fixture(scope="module")
def corpus_and_index(ray_session, pages_small, tmp_path_factory):
    import ray.data as rd

    idx = str(tmp_path_factory.mktemp("qidx"))
    build_index(rd.from_arrow(pages_small), idx, CFG)
    # oracle-side corpus: same LWW + doc_id rules, driver-side pandas
    df = pages_small.to_pandas()
    df = df.sort_values(["url", "warc_ts"], ascending=[True, False]).drop_duplicates("url")
    df["text"] = fill_text_from_html(df["text"].to_numpy(), df["html"].to_numpy())
    df["part_id"] = route_partition(df["url"].to_numpy(), CFG.num_partitions)
    df = df.sort_values(["part_id", "url"])
    df["doc_id"] = df.groupby("part_id").cumcount() + df["part_id"].astype("int64") * CFG.part_stride
    df = df.rename(columns={"url": "key"})
    return df, idx


def test_rank_identical_vs_oracle(corpus_and_index):
    df, idx = corpus_and_index
    s = IndexSearcher(idx)
    qs = make_queries(16).to_pandas()
    for row in qs.itertuples(index=False):
        eng = s.search(row.text, lang=row.lang, k=int(row.k))
        ora = bruteforce_topk(df, row.text, k=int(row.k), query_lang=row.lang)
        assert eng["doc_id"].tolist() == ora["doc_id"].tolist(), row.text
        assert eng["score"].tolist() == ora["score"].tolist(), row.text
        assert eng["key"].tolist() == ora["key"].tolist()
        assert eng["rank"].tolist() == list(range(1, len(eng) + 1))


def test_absent_term_empty_result(corpus_and_index):
    _, idx = corpus_and_index
    s = IndexSearcher(idx)
    assert len(s.search("zzzabsentterm")) == 0
    assert len(s.search("")) == 0
    assert len(s.search("...!!!")) == 0


def test_k_larger_than_corpus(corpus_and_index):
    df, idx = corpus_and_index
    s = IndexSearcher(idx)
    res = s.search("home", k=10_000_000)  # template term: present in every doc
    assert len(res) == len(df)
    assert res["score"].is_monotonic_decreasing


def test_scores_sorted_and_tiebreak(corpus_and_index):
    _, idx = corpus_and_index
    s = IndexSearcher(idx)
    res = s.search("w00001 w00003", k=50)
    assert res["score"].is_monotonic_decreasing
    for sc in res["score"].unique():
        grp = res[res["score"] == sc]
        assert grp["doc_id"].is_monotonic_increasing  # ties -> doc_id asc


def test_distributed_query_stage(corpus_and_index, ray_session):
    import ray.data as rd

    df, idx = corpus_and_index
    qs = make_queries(8)
    out = run_queries(rd.from_arrow(qs), idx, CFG, concurrency=2).to_pandas()
    s = IndexSearcher(idx)
    expected = s.search_batch(qs.to_pandas())
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    expected = expected.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["query_id", "rank", "doc_id", "score"]].astype({"query_id": np.int64}),
        expected[["query_id", "rank", "doc_id", "score"]].astype({"query_id": np.int64}),
    )


def test_global_df_matches_oracle(corpus_and_index):
    df, idx = corpus_and_index
    s = IndexSearcher(idx)
    from kafka_es_ray.query.bruteforce import corpus_token_stats

    toks, _ = corpus_token_stats(df)
    for term in ["home", "w00001", "w09999", "zzzabsent"]:
        oracle_df = int(sum(term in set(t) for t in toks))
        assert s.global_df([term])[0] == oracle_df, term


def test_and_operator(corpus_and_index):
    df, idx = corpus_and_index
    s = IndexSearcher(idx)
    both = s.search("w00001 w00002", operator="and", k=1000)
    either = s.search("w00001 w00002", operator="or", k=100000)
    assert len(both) <= len(either)
    # oracle: docs containing BOTH terms
    from kafka_es_ray.query.bruteforce import corpus_token_stats

    toks, _ = corpus_token_stats(df)
    expect = {
        int(d)
        for d, t in zip(df["doc_id"], toks)
        if "w00001" in set(t) and "w00002" in set(t)
    }
    assert set(both["doc_id"]) == expect
    # AND scores equal the OR scores for the same docs
    merged = both.merge(either, on="doc_id", suffixes=("_a", "_o"))
    assert (merged["score_a"] == merged["score_o"]).all()
    # a query with an absent term matches nothing under AND
    assert len(s.search("w00001 zzzabsentterm", operator="and")) == 0


def test_filter_lang(corpus_and_index):
    df, idx = corpus_and_index
    s = IndexSearcher(idx)
    res = s.search("home", k=100000, filter_lang="de")
    expect = set(df[df["lang"] == "de"]["doc_id"].astype(int))
    assert set(res["doc_id"]) == expect  # every de doc has the template term
    assert len(res) > 0


def test_distributed_queries_and_operator(corpus_and_index, ray_session):
    import ray.data as rd

    _, idx = corpus_and_index
    qs = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["w00001 w00002", "w00001 zzzabsent", "home"],
            "lang": ["en"] * 3,
            "k": np.int32([50, 10, 20]),
            "operator": ["and", "and", "or"],
            "filter_lang": [None, None, "de"],
        }
    )
    out = run_queries(rd.from_pandas(qs), idx, CFG, concurrency=2).to_pandas()
    s = IndexSearcher(idx)
    expected = s.search_batch(qs)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    expected = expected.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["query_id", "rank", "doc_id", "score"]].astype({"query_id": np.int64}),
        expected[["query_id", "rank", "doc_id", "score"]].astype({"query_id": np.int64}),
    )
    assert 1 not in set(out["query_id"])  # absent term under AND -> no rows


def test_store_text_fetch(ray_session, pages_small, tmp_path):
    import ray.data as rd

    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.index.merge import merge_index

    cfg = EngineConfig(num_partitions=4, store_text=True)
    idx = str(tmp_path / "fidx")
    build_index(rd.from_arrow(pages_small), idx, cfg)
    s = IndexSearcher(idx, cfg)
    res = s.search("w00001", k=5, fetch=True)
    assert len(res) > 0 and "text" in res.columns
    for t in res["text"]:
        assert "w00001" in t  # fetched _source contains the query term
    # fetch survives a merge
    merge_index(idx, merge_factor=4, cfg=cfg)
    s2 = IndexSearcher(idx, cfg)
    res2 = s2.search("w00001", k=5, fetch=True)
    assert res2["text"].tolist() == res["text"].tolist()
    # unfetchable index raises a clear error
    idx2 = str(tmp_path / "nofetch")
    build_index(rd.from_arrow(pages_small), idx2, EngineConfig(num_partitions=4))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="store_text"):
        IndexSearcher(idx2).search("w00001", fetch=True)


def test_pagination_offset(corpus_and_index):
    """ES from/size: page windows tile the full ranking exactly."""
    _, idx = corpus_and_index
    s = IndexSearcher(idx)
    full = s.search("w00001 w00002", k=30)
    p1 = s.search("w00001 w00002", k=10, offset=0)
    p2 = s.search("w00001 w00002", k=10, offset=10)
    p3 = s.search("w00001 w00002", k=10, offset=20)
    paged = pd.concat([p1, p2, p3], ignore_index=True)
    pd.testing.assert_frame_equal(paged, full.reset_index(drop=True))
    assert p2["rank"].tolist() == list(range(11, 21))
    # offset past the end -> empty
    assert len(s.search("w00001", offset=10_000_000, k=10)) == 0


def test_query_metrics_counters(ray_session, pages_small, tmp_path):
    """MetricsUpdater-analog counters (reference MetricsUpdater.kt:3-15):
    searcher-level searches/postings/terms and driver-level run_queries
    batch counters must advance."""
    import ray.data as rd

    from kafka_es_ray.query import engine as eng

    d = str(tmp_path / "qm")
    build_index(rd.from_arrow(pages_small), d, CFG)
    s = IndexSearcher(d, CFG)
    s.search("home about example")
    s.search("w00001")
    assert s.metrics["searches"] == 2
    assert s.metrics["terms_looked_up"] >= 4
    assert s.metrics["postings_decoded"] > 0

    before = dict(eng.QUERY_METRICS)
    qs = make_queries(6).to_pandas()
    eng.run_queries(rd.from_pandas(qs), d, CFG, concurrency=2).count()
    assert eng.QUERY_METRICS["query_batches"] == before["query_batches"] + 1
    assert eng.QUERY_METRICS["queries"] == before["queries"] + len(qs)
    assert eng.QUERY_METRICS["segments_scheduled"] > before["segments_scheduled"]


def test_agg_terms_lang_buckets(ray_session, tmp_path):
    """ES terms-agg analog: lang buckets over the match set, bucket order
    (n_docs desc, value asc), deletes excluded."""
    import ray.data as rd

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(6)],
            "text": ["shared alpha"] * 3 + ["shared beta"] * 2 + ["other"],
            "lang": ["en", "en", "de", "de", "fr", "en"],
        }
    )
    d = str(tmp_path / "agg")
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    s = IndexSearcher(d, CFG)
    agg = s.agg_terms("shared")
    assert agg["value"].tolist() == ["de", "en", "fr"]
    assert agg["n_docs"].tolist() == [2, 2, 1]
    with pytest.raises(ValueError, match="unsupported aggregation field"):
        s.agg_terms("shared", field="nope")


def test_mget_by_key(ray_session, tmp_path):
    """ES _mget analog: latest live version per key, missing keys flagged
    not-found, deleted keys excluded."""
    import ray.data as rd

    from kafka_es_ray.index.incremental import apply_incremental

    cfg = EngineConfig(num_partitions=4, store_text=True)
    docs = pd.DataFrame(
        {
            "url": ["a", "b", "c"],
            "text": ["first alpha", "second beta", "third gamma"],
            "lang": ["en", "de", "en"],
        }
    )
    d = str(tmp_path / "mget")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    delta = pd.DataFrame(
        {"id": ["a", "b"], "text": ["first REVISED", None], "lang": ["en", "en"],
         "op": ["index", "delete"]}
    )
    apply_incremental(d, delta, cfg, key_col="id")
    s = IndexSearcher(d, cfg)
    out = s.get(["a", "b", "c", "ghost"])
    assert out["found"].tolist() == [True, False, True, False]
    a_row = out[out["key"] == "a"].iloc[0]
    assert a_row["text"] == "first REVISED"   # latest live version wins
    assert out[out["key"] == "c"].iloc[0]["lang"] == "en"


def test_distributed_pagination(corpus_and_index, ray_session):
    """ES from/size in the distributed path: page windows tile the
    single-searcher ranking exactly."""
    import ray.data as rd

    _, idx = corpus_and_index
    s = IndexSearcher(idx)
    full = s.search("home", k=30)
    qs = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["home"] * 3,
            "lang": ["en"] * 3,
            "k": np.int32([10, 10, 10]),
            "offset": np.int32([0, 10, 20]),
        }
    )
    out = run_queries(rd.from_pandas(qs), idx, CFG, concurrency=2).to_pandas()
    pages = []
    for qid in (0, 1, 2):
        g = out[out["query_id"] == qid].sort_values("rank")
        pages.append(g)
        assert g["rank"].tolist() == list(range(qid * 10 + 1, qid * 10 + 11))
    tiled = pd.concat(pages, ignore_index=True)
    assert tiled["doc_id"].tolist() == full["doc_id"].tolist()
    assert tiled["score"].tolist() == full["score"].tolist()


def test_highlight_snippets(ray_session, tmp_path):
    """ES highlighter analog: snippet around the first hit, matches
    wrapped in <em></em>, whole-token only (no substring bleed)."""
    import ray.data as rd

    cfg = EngineConfig(num_partitions=2, store_text=True)
    docs = pd.DataFrame(
        {
            "url": ["a", "b"],
            "text": [
                "x " * 50 + "the banana split is great banana dessert " + "y " * 50,
                "bananarama is a band not a fruit",  # substring: must NOT match
            ],
            "lang": ["en", "en"],
        }
    )
    d = str(tmp_path / "hl")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    s = IndexSearcher(d, cfg)
    res = s.search("banana", k=5, highlight=True)
    assert res["key"].tolist() == ["a"]
    hl = res["highlight"].iloc[0]
    assert "<em>banana</em>" in hl
    assert hl.startswith("...") and hl.endswith("...")
    assert "text" not in res.columns  # highlight without fetch drops _source
    res2 = s.search("banana", k=5, highlight=True, fetch=True)
    assert "text" in res2.columns


def test_distributed_all_empty_batch(corpus_and_index, ray_session):
    """A batch whose every query analyzes to nothing must return an
    empty result, not crash the plan build."""
    import ray.data as rd

    _, idx = corpus_and_index
    qs = pd.DataFrame(
        {"query_id": [0, 1], "text": ["", "zzzabsentterm"], "lang": ["en"] * 2, "k": np.int32([5, 5])}
    )
    out = run_queries(rd.from_pandas(qs), idx, CFG, concurrency=2).to_pandas()
    assert len(out) == 0  # no crash, empty result (Ray drops cols on empty)


def test_must_not_exclusion(corpus_and_index, ray_session):
    """ES bool must_not: docs containing any excluded term drop out;
    remaining ranking identical to the unfiltered one minus those docs;
    distributed path agrees."""
    import ray.data as rd

    df, idx = corpus_and_index
    s = IndexSearcher(idx)
    base = s.search("home", k=100000)
    mn = s.search("home", k=100000, must_not="w00001 w00002")
    from kafka_es_ray.query.bruteforce import corpus_token_stats

    toks, _ = corpus_token_stats(df)
    excluded = {
        int(d) for d, t in zip(df["doc_id"], toks) if {"w00001", "w00002"} & set(t)
    }
    assert set(mn["doc_id"]) == set(base["doc_id"]) - excluded
    kept = base[~base["doc_id"].isin(excluded)]
    assert mn["doc_id"].tolist() == kept["doc_id"].tolist()  # order preserved
    assert mn["score"].tolist() == kept["score"].tolist()

    qs = pd.DataFrame(
        {
            "query_id": [0],
            "text": ["home"],
            "lang": ["en"],
            "k": np.int32([50]),
            "must_not": ["w00001 w00002"],
        }
    )
    got = (
        run_queries(rd.from_pandas(qs), idx, CFG, concurrency=2)
        .to_pandas()
        .sort_values("rank")
    )
    want = s.search("home", k=50, must_not="w00001 w00002")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()


def test_queries_stay_arrow_native(corpus_and_index):
    """Search / mget / phrase never materialize the n_terms / n_docs
    Python-object columns: lookup binary-searches the Arrow buffers and
    fetches use take + key-hash binary search (VERDICT r2 items 5-6 —
    the per-actor memory ceiling at 100 TB segment sizes)."""
    from kafka_es_ray.functions.tokenizer import get_analyzer

    df, idx = corpus_and_index
    s = IndexSearcher(idx)
    term = get_analyzer("en").tokenize(df["text"].iloc[0])[0]
    res = s.search(term, k=10)
    assert len(res) > 0
    got = s.get([df["key"].iloc[0], "zzz-missing"])
    assert got["found"].tolist() == [True, False]
    n = s.count(term)
    assert n > 0
    for seg in s.segments:
        assert seg._terms_np is None, "dictionary was materialized by a query"
        assert seg._keys_np is None, "docstore keys were materialized"
        assert seg._langs_np is None
        assert seg._texts_np is None
