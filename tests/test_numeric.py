"""Numeric-mapped fields (cfg.numeric_cols): range filters and
sort-by-field, single-process and distributed, plus merge survival.

Oracle: brute-force pandas over the same corpus — filter/sort the doc
table directly and compare ids exactly.
"""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.merge import merge_index
from kafka_es_ray.query.engine import (
    IndexSearcher,
    run_agg_histogram,
    run_agg_percentiles,
    run_agg_stats,
    run_counts,
    run_queries,
    run_sorted,
)

CFG = EngineConfig(
    num_partitions=4, numeric_cols=("size", "stars"), keyword_cols=("cat",)
)

WORDS = ["alpha", "beta", "gamma", "delta", "omega", "kappa", "sigma", "zeta"]


def _corpus(n=120, seed=7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(3, 9)).tolist())
        for _ in range(n)
    ]
    sizes = rng.integers(10, 5000, size=n).astype(np.float64)
    stars = rng.integers(0, 6, size=n).astype(np.float64)
    stars[rng.random(n) < 0.15] = np.nan  # missing values
    return pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "doc_id": np.arange(1, n + 1, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "size": sizes,
            "stars": stars,
            "cat": rng.choice(["news", "blog", "wiki"], size=n),
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    df = _corpus()
    idx = str(tmp_path_factory.mktemp("numidx"))
    build_index(
        rd.from_pandas(df), idx, CFG,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    return idx, df


def _brute_match(df: pd.DataFrame, terms: list[str]) -> pd.DataFrame:
    hit = df["text"].str.split().apply(lambda t: any(w in t for w in terms))
    return df[hit]


def test_manifest_records_mappings(built):
    from kafka_es_ray.index.segment import read_manifest

    idx, _ = built
    m = read_manifest(idx)["mappings"]
    assert m["numeric_cols"] == ["size", "stars"]
    assert m["keyword_cols"] == ["cat"]
    assert m["index_positions"] is False


def test_range_filter_matches_bruteforce(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    res = s.search("alpha beta", k=1000, filter_range=[("size", 100.0, 900.0)])
    want = _brute_match(df, ["alpha", "beta"])
    want = want[(want["size"] >= 100.0) & (want["size"] <= 900.0)]
    assert set(res["doc_id"]) == set(want["doc_id"])


def test_range_filter_open_bounds_and_nan(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    # open lower bound; NaN stars must never match
    res = s.search("gamma", k=1000, filter_range=[("stars", None, 3.0)])
    want = _brute_match(df, ["gamma"])
    want = want[want["stars"].notna() & (want["stars"] <= 3.0)]
    assert set(res["doc_id"]) == set(want["doc_id"])


def test_range_filter_unknown_field_raises(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    with pytest.raises(ValueError, match="numeric field"):
        s.search("alpha", k=5, filter_range=[("nope", 0.0, 1.0)])


def test_search_sorted_desc_and_ties(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    res = s.search_sorted("alpha beta gamma", "size", k=15)
    want = _brute_match(df, ["alpha", "beta", "gamma"])
    want = want.sort_values(["size", "doc_id"], ascending=[False, True]).head(15)
    assert res["doc_id"].tolist() == want["doc_id"].tolist()
    assert res["sort_val"].tolist() == want["size"].tolist()
    assert res["rank"].tolist() == list(range(1, len(want) + 1))


def test_search_sorted_asc_excludes_nan(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    res = s.search_sorted("omega", "stars", ascending=True, k=8)
    want = _brute_match(df, ["omega"])
    want = want[want["stars"].notna()].sort_values(
        ["stars", "doc_id"], ascending=[True, True]
    ).head(8)
    assert res["doc_id"].tolist() == want["doc_id"].tolist()


def test_search_sorted_with_range_filter(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    res = s.search_sorted(
        "alpha", "size", k=10, filter_range=[("size", 500.0, None)]
    )
    want = _brute_match(df, ["alpha"])
    want = want[want["size"] >= 500.0].sort_values(
        ["size", "doc_id"], ascending=[False, True]
    ).head(10)
    assert res["doc_id"].tolist() == want["doc_id"].tolist()


def test_distributed_range_filter_matches_single(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame(
        {
            "query_id": [0, 1],
            "text": ["alpha beta", "gamma"],
            "k": 12,
            "range_field": ["size", "stars"],
            "range_gte": [100.0, None],
            "range_lte": [900.0, 3.0],
        }
    )
    got = (
        run_queries(queries, idx, CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = []
    for qid, text, fr in [
        (0, "alpha beta", [("size", 100.0, 900.0)]),
        (1, "gamma", [("stars", None, 3.0)]),
    ]:
        r = s.search(text, k=12, filter_range=fr)
        r.insert(0, "query_id", np.int64(qid))
        want.append(r)
    want = pd.concat(want, ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id", "score"]],
        want[["query_id", "rank", "doc_id", "score"]],
    )


def test_distributed_count_with_range(built):
    idx, df = built
    queries = pd.DataFrame(
        {
            "query_id": [0],
            "text": ["alpha"],
            "range_field": ["size"],
            "range_gte": [1000.0],
            "range_lte": [None],
        }
    )
    out = run_counts(queries, idx, CFG)
    want = _brute_match(df, ["alpha"])
    assert out["n_matching"].iloc[0] == int((want["size"] >= 1000.0).sum())


def test_run_sorted_matches_single(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame({"query_id": [0, 1], "text": ["alpha beta", "omega"]})
    got = (
        run_sorted(queries, idx, "size", k=7, cfg=CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = []
    for qid, text in [(0, "alpha beta"), (1, "omega")]:
        r = s.search_sorted(text, "size", k=7)
        r.insert(0, "query_id", np.int64(qid))
        want.append(r)
    want = pd.concat(want, ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id", "sort_val"]],
        want[["query_id", "rank", "doc_id", "sort_val"]],
    )


def test_agg_stats_matches_bruteforce(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    got = s.agg_stats("alpha beta", "stars")
    want = _brute_match(df, ["alpha", "beta"])
    vals = want["stars"].dropna()
    assert got["count"] == len(vals)
    assert got["min"] == vals.min()
    assert got["max"] == vals.max()
    assert got["sum"] == vals.sum()
    assert abs(got["avg"] - vals.mean()) < 1e-9


def test_agg_histogram_matches_bruteforce(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    got = s.agg_histogram("gamma", "size", interval=500.0)
    want = _brute_match(df, ["gamma"])
    buckets = (np.floor(want["size"].to_numpy() / 500.0) * 500.0)
    ub, cnt = np.unique(buckets, return_counts=True)
    assert got["bucket"].tolist() == ub.tolist()
    assert got["n_docs"].tolist() == cnt.tolist()


def test_distributed_stats_and_histogram_match_single(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame({"query_id": [0, 1], "text": ["alpha beta", "omega"]})
    stats = run_agg_stats(queries, idx, "stars", cfg=CFG)
    for qid, text in [(0, "alpha beta"), (1, "omega")]:
        single = s.agg_stats(text, "stars")
        row = stats[stats["query_id"] == qid].iloc[0]
        assert row["n_docs"] == single["count"]
        assert row["min_val"] == single["min"]
        assert row["max_val"] == single["max"]
        assert row["sum_val"] == single["sum"]
    hist = run_agg_histogram(queries, idx, "size", 500.0, cfg=CFG)
    for qid, text in [(0, "alpha beta"), (1, "omega")]:
        single = s.agg_histogram(text, "size", 500.0)
        g = hist[hist["query_id"] == qid]
        assert g["bucket"].tolist() == single["bucket"].tolist()
        assert g["n_docs"].tolist() == single["n_docs"].tolist()


def test_terms_stats_subagg_matches_bruteforce(built):
    from kafka_es_ray.query.engine import run_agg_terms_stats

    idx, df = built
    queries = pd.DataFrame({"query_id": [0], "text": ["alpha beta"]})
    out = run_agg_terms_stats(queries, idx, "cat", "size", cfg=CFG)
    want_docs = _brute_match(df, ["alpha", "beta"])
    want = (
        want_docs[want_docs["size"].notna()]
        .groupby("cat")["size"]
        .agg(["size", "min", "max", "sum"])
        .reset_index()
        .sort_values(["size", "cat"], ascending=[False, True], kind="mergesort")
    )
    assert out["value"].tolist() == want["cat"].tolist()
    assert out["n_docs"].tolist() == want["size"].tolist()
    assert out["min_val"].tolist() == want["min"].tolist()
    assert out["max_val"].tolist() == want["max"].tolist()
    assert out["sum_val"].tolist() == want["sum"].tolist()


def test_percentiles_match_nearest_rank(built):
    idx, df = built
    queries = pd.DataFrame({"query_id": [0, 1], "text": ["alpha beta", "omega"]})
    out = run_agg_percentiles(queries, idx, "size", (25.0, 50.0, 75.0, 99.0), cfg=CFG)
    for qid, text in [(0, "alpha beta"), (1, "omega")]:
        want_docs = _brute_match(df, text.split())
        vals = np.sort(want_docs["size"].dropna().to_numpy())
        for p in (25.0, 50.0, 75.0, 99.0):
            rank = max(1, int(np.ceil(len(vals) * p / 100.0)))
            want_v = float(vals[rank - 1])
            got = out[(out["query_id"] == qid) & (out["pct"] == p)]["value"].iloc[0]
            assert got == want_v, (qid, p)


def test_function_score_matches_bruteforce(built):
    """run_queries with boost_field == re-ranking the full BM25 ranking
    by round6(score * modifier(field * factor)) with NaN -> boost_missing."""
    idx, df = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame(
        {
            "query_id": [0, 1],
            "text": ["alpha beta", "omega"],
            "boost_field": ["size", "stars"],
            "boost_modifier": ["ln1p", "sqrt"],
            "boost_factor": [1.0, 2.0],
            "boost_missing": [1.0, 1.0],
        }
    )
    got = (
        run_queries(queries, idx, CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    fld_of = {0: "size", 1: "stars"}
    mod_of = {0: np.log1p, 1: np.sqrt}
    fac_of = {0: 1.0, 1: 2.0}
    by_doc = df.set_index("doc_id")
    for qid, text in [(0, "alpha beta"), (1, "omega")]:
        full = s.search(text, k=10_000)
        vals = by_doc.loc[full["doc_id"], fld_of[qid]].to_numpy(np.float64)
        vals = np.where(np.isnan(vals), 1.0, vals) * fac_of[qid]
        boosted = np.floor(full["score"].to_numpy() * mod_of[qid](vals) * 1e6 + 0.5) / 1e6
        order = np.lexsort((full["doc_id"].to_numpy(), -boosted))[:10]
        g = got[got["query_id"] == qid]
        assert g["doc_id"].tolist() == full["doc_id"].to_numpy()[order].tolist(), qid
        assert g["score"].tolist() == boosted[order].tolist(), qid


def test_function_score_rejects_unknown_modifier(built):
    idx, _ = built
    q = pd.DataFrame(
        {"query_id": [0], "text": ["alpha"], "boost_field": ["size"],
         "boost_modifier": ["exp"]}
    )
    with pytest.raises(ValueError, match="boost_modifier"):
        run_queries(q, idx, CFG)


def test_rank_feature_matches_bruteforce(built):
    """run_queries with rf_field == re-ranking the full BM25 ranking by
    round6(score + boost * fn(v)), missing/negative values contributing
    0 — saturation and sigmoid covered."""
    idx, df = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame(
        {
            "query_id": [0, 1],
            "text": ["alpha beta", "omega"],
            "rf_field": ["size", "stars"],
            "rf_function": ["saturation", "sigmoid"],
            "rf_pivot": [50.0, 3.0],
            "rf_boost": [2.0, 1.0],
            "rf_exponent": [np.nan, 2.0],
        }
    )
    got = (
        run_queries(queries, idx, CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    by_doc = df.set_index("doc_id")
    for qid, text, fld in [(0, "alpha beta", "size"), (1, "omega", "stars")]:
        full = s.search(text, k=10_000)
        v = by_doc.loc[full["doc_id"], fld].to_numpy(np.float64)
        v = np.where(np.isnan(v) | (v < 0), 0.0, v)
        if qid == 0:
            contrib = 2.0 * (v / (v + 50.0))
        else:
            contrib = (v**2) / (v**2 + 3.0**2)
        boosted = np.floor((full["score"].to_numpy() + contrib) * 1e6 + 0.5) / 1e6
        order = np.lexsort((full["doc_id"].to_numpy(), -boosted))[:10]
        g = got[got["query_id"] == qid]
        assert g["doc_id"].tolist() == full["doc_id"].to_numpy()[order].tolist(), qid
        assert g["score"].tolist() == boosted[order].tolist(), qid


def test_rank_feature_rejects_unknown_function(built):
    idx, _ = built
    q = pd.DataFrame(
        {"query_id": [0], "text": ["alpha"], "rf_field": ["size"],
         "rf_function": ["gauss"]}
    )
    with pytest.raises(ValueError, match="rf_function"):
        run_queries(q, idx, CFG)


def test_script_score_matches_bruteforce(built):
    """run_queries with a script column == re-ranking the full BM25
    ranking by the vectorized whitelisted expression (missing -> 0)."""
    idx, df = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame(
        {
            "query_id": [0],
            "text": ["alpha beta"],
            "script": ["_score * 2 + ln1p(size) - 0.5 * sqrt(stars)"],
        }
    )
    got = (
        run_queries(queries, idx, CFG)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    full = s.search("alpha beta", k=10_000)
    by_doc = df.set_index("doc_id")
    size = np.nan_to_num(by_doc.loc[full["doc_id"], "size"].to_numpy(np.float64))
    stars = np.nan_to_num(by_doc.loc[full["doc_id"], "stars"].to_numpy(np.float64))
    want = np.floor(
        (full["score"].to_numpy() * 2 + np.log1p(size) - 0.5 * np.sqrt(stars))
        * 1e6 + 0.5
    ) / 1e6
    order = np.lexsort((full["doc_id"].to_numpy(), -want))[:10]
    assert got["doc_id"].tolist() == full["doc_id"].to_numpy()[order].tolist()
    assert got["score"].tolist() == want[order].tolist()


def test_script_score_rejects_unsafe_syntax(built):
    idx, _ = built
    for bad in (
        "__import__('os')",
        "_score.attr",
        "open('/etc/passwd')",
        "[1,2][0]",
        "'str'",
        "exp(_score)",
        "min(_score)",  # wrong arity surfaces at eval; syntax ok
    ):
        q = pd.DataFrame({"query_id": [0], "text": ["alpha"], "script": [bad]})
        with pytest.raises((ValueError, TypeError)):
            run_queries(q, idx, CFG).to_pandas()


def test_field_collapse_matches_bruteforce(built):
    from kafka_es_ray.query.engine import run_collapsed

    idx, df = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame({"query_id": [0, 1], "text": ["alpha beta", "omega kappa"]})
    got = (
        run_collapsed(queries, idx, "cat", k=2, cfg=CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    cat_of = dict(zip(df["doc_id"], df["cat"]))
    for qid, text in [(0, "alpha beta"), (1, "omega kappa")]:
        full = s.search(text, k=10_000)
        full = full.assign(cat=[cat_of[d] for d in full["doc_id"]])
        best = full.drop_duplicates("cat", keep="first").head(2)  # full is rank-ordered
        g = got[got["query_id"] == qid]
        assert g["doc_id"].tolist() == best["doc_id"].tolist(), qid
        assert g["score"].tolist() == best["score"].tolist(), qid
        assert g["collapse_val"].tolist() == best["cat"].tolist(), qid


def test_exists_query_counts(built):
    """exists matches docs whose mapped field has a value: NaN numeric
    rows excluded, keyword/lang always present here."""
    from kafka_es_ray.index.segment import Segment
    from kafka_es_ray.query.engine import segment_exists_matching_ids

    idx, df = built
    queries = pd.DataFrame(
        {"query_id": [0, 1, 2], "exists": ["stars", "size", "cat"]}
    )
    got = run_counts(queries, idx, CFG)
    want = {
        0: int(df["stars"].notna().sum()),
        1: len(df),
        2: len(df),
    }
    assert dict(zip(got["query_id"], got["n_matching"])) == want
    assert want[0] < len(df)  # the fixture really has missing stars
    with pytest.raises(ValueError, match="unmapped"):
        segment_exists_matching_ids(Segment.load(idx, 0), "nope")


def test_top_hits_matches_bruteforce(built):
    from kafka_es_ray.query.engine import run_top_hits

    idx, df = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame({"query_id": [0, 1], "text": ["alpha beta", "omega kappa"]})
    got = (
        run_top_hits(queries, idx, "cat", n_hits=3, cfg=CFG)
        .to_pandas()
        .sort_values(["query_id", "value", "rank"])
        .reset_index(drop=True)
    )
    cat_of = dict(zip(df["doc_id"], df["cat"]))
    for qid, text in [(0, "alpha beta"), (1, "omega kappa")]:
        full = s.search(text, k=10_000)
        full = full.assign(cat=[cat_of[d] for d in full["doc_id"]])
        for val, grp in full.groupby("cat"):
            want = grp.head(3)  # full is rank-ordered (score desc, doc asc)
            g = got[(got["query_id"] == qid) & (got["value"] == val)]
            assert g["doc_id"].tolist() == want["doc_id"].tolist(), (qid, val)
            assert g["score"].tolist() == want["score"].tolist(), (qid, val)
            assert g["rank"].tolist() == list(range(1, len(want) + 1))


def test_merge_preserves_numeric_columns(built, tmp_path):
    import shutil

    idx, df = built
    midx = str(tmp_path / "merged")
    shutil.copytree(idx, midx)
    merge_index(midx, merge_factor=4, cfg=CFG)
    s = IndexSearcher(midx, CFG)
    assert len(s.segments) < 4  # merge actually happened
    res = s.search_sorted("alpha beta gamma", "size", k=15)
    want = _brute_match(df, ["alpha", "beta", "gamma"])
    want = want.sort_values(["size", "doc_id"], ascending=[False, True]).head(15)
    assert res["doc_id"].tolist() == want["doc_id"].tolist()
    res2 = s.search("alpha beta", k=1000, filter_range=[("size", 100.0, 900.0)])
    want2 = _brute_match(df, ["alpha", "beta"])
    want2 = want2[(want2["size"] >= 100.0) & (want2["size"] <= 900.0)]
    assert set(res2["doc_id"]) == set(want2["doc_id"])


def test_sorted_search_after_page_chain(built, ray_session):
    """ES sort + search_after deep pagination: chaining pages with the
    (sort_val, doc_id) cursor reproduces the full run_sorted ranking
    exactly, desc and asc, with ranks restarting per page."""
    from kafka_es_ray.query.engine import run_sorted

    idx, docs = built
    q = pd.DataFrame({"query_id": np.int64([0]), "text": ["alpha beta gamma"]})
    for ascending in (False, True):
        full = run_sorted(
            q, idx, "size", ascending=ascending, k=1000, cfg=CFG, concurrency=2
        ).to_pandas().sort_values("rank")
        pages, cursor = [], None
        for _ in range(50):
            pdf = run_sorted(
                q, idx, "size", ascending=ascending, k=4, cfg=CFG,
                concurrency=2, search_after=cursor,
            ).to_pandas()
            if not len(pdf):  # exhausted (Ray drops cols on 0 rows)
                break
            page = pdf.sort_values("rank")
            assert page["rank"].tolist() == list(range(1, len(page) + 1))
            pages.append(page)
            last = page.iloc[-1]
            cursor = (float(last["sort_val"]), int(last["doc_id"]))
        chained = pd.concat(pages, ignore_index=True)
        assert chained["doc_id"].tolist() == full["doc_id"].tolist(), ascending
        assert chained["sort_val"].tolist() == full["sort_val"].tolist()


def test_distance_feature_matches_bruteforce(built):
    """run_queries with dfe_* columns == re-ranking the full BM25 ranking
    by round6(score + boost * pivot/(pivot + |v - origin|)); docs missing
    the field get no contribution (the ES clause doesn't match them)."""
    idx, df = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame(
        {
            "query_id": [0, 1],
            "text": ["alpha beta", "omega"],
            "dfe_field": ["size", "stars"],
            "dfe_origin": [40.0, 2.0],
            "dfe_pivot": [10.0, 1.0],
            "dfe_boost": [3.0, 1.0],
        }
    )
    got = (
        run_queries(queries, idx, CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    by_doc = df.set_index("doc_id")
    for qid, text, fld, origin, pivot, boost in [
        (0, "alpha beta", "size", 40.0, 10.0, 3.0),
        (1, "omega", "stars", 2.0, 1.0, 1.0),
    ]:
        full = s.search(text, k=10_000)
        v = by_doc.loc[full["doc_id"], fld].to_numpy(np.float64)
        contrib = np.where(np.isnan(v), 0.0, pivot / (pivot + np.abs(v - origin)))
        boosted = np.floor((full["score"].to_numpy() + boost * contrib) * 1e6 + 0.5) / 1e6
        order = np.lexsort((full["doc_id"].to_numpy(), -boosted))[:10]
        g = got[got["query_id"] == qid]
        assert g["doc_id"].tolist() == full["doc_id"].to_numpy()[order].tolist(), qid
        assert g["score"].tolist() == boosted[order].tolist(), qid


def test_collapse_inner_hits_matches_bruteforce(built):
    """collapse + inner_hits: group set/order == run_collapsed; each
    group's inner list == the match set's per-value head (rank order)."""
    from kafka_es_ray.query.engine import run_collapsed, run_collapsed_inner_hits

    idx, df = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame({"query_id": [0, 1], "text": ["alpha beta", "omega kappa"]})
    got = (
        run_collapsed_inner_hits(queries, idx, "cat", k=2, n_hits=3, cfg=CFG)
        .to_pandas()
        .sort_values(["query_id", "rank", "inner_rank"])
        .reset_index(drop=True)
    )
    base = (
        run_collapsed(queries, idx, "cat", k=2, cfg=CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # inner_rank=1 rows ARE the plain collapse result (same groups, order)
    heads = got[got["inner_rank"] == 1].reset_index(drop=True)
    assert heads["doc_id"].tolist() == base["doc_id"].tolist()
    assert heads["collapse_val"].tolist() == base["collapse_val"].tolist()
    cat_of = dict(zip(df["doc_id"], df["cat"]))
    for qid, text in [(0, "alpha beta"), (1, "omega kappa")]:
        full = s.search(text, k=10_000)
        full = full.assign(cat=[cat_of[d] for d in full["doc_id"]])
        for val in got[got["query_id"] == qid]["collapse_val"].unique():
            want = full[full["cat"] == val].head(3)
            g = got[(got["query_id"] == qid) & (got["collapse_val"] == val)]
            assert g["doc_id"].tolist() == want["doc_id"].tolist(), (qid, val)
            assert g["inner_rank"].tolist() == list(range(1, len(want) + 1))


def test_top_hits_sorted_by_field(built):
    """ES top_hits `sort` option: per-bucket hits ranked by a numeric
    field in either direction; score column carries the sort value;
    NaN-valued docs excluded."""
    from kafka_es_ray.query.engine import run_top_hits

    idx, df = built
    queries = pd.DataFrame({"query_id": [0], "text": ["alpha beta"]})
    for ascending in (False, True):
        got = (
            run_top_hits(
                queries, idx, "cat", n_hits=3, cfg=CFG,
                sort_field="size", ascending=ascending,
            )
            .to_pandas()
            .sort_values(["value", "rank"])
            .reset_index(drop=True)
        )
        full = _brute_match(df, ["alpha", "beta"])
        full = full[~full["size"].isna()]
        for val, grp in full.groupby("cat"):
            want = grp.sort_values(
                ["size", "doc_id"], ascending=[ascending, True],
                kind="mergesort",
            ).head(3)
            g = got[got["value"] == val]
            assert g["doc_id"].tolist() == want["doc_id"].tolist(), (val, ascending)
            assert g["score"].tolist() == want["size"].tolist(), (val, ascending)


def test_terms_numeric_agg_matches_bruteforce(built):
    """ES terms agg over a numeric field: per-value counts of the match
    set, ES bucket order, size cut; NaN excluded."""
    from kafka_es_ray.query.engine import run_agg_terms_numeric

    idx, df = built
    queries = pd.DataFrame({"query_id": [0], "text": ["alpha beta"]})
    got = run_agg_terms_numeric(queries, idx, "size", size=5, cfg=CFG)
    full = _brute_match(df, ["alpha", "beta"])
    vc = (
        full[~full["size"].isna()].groupby("size").size().reset_index(name="n")
        .sort_values(["n", "size"], ascending=[False, True], kind="mergesort")
        .head(5)
    )
    assert got["value"].tolist() == vc["size"].astype(float).tolist()
    assert got["n_docs"].tolist() == vc["n"].tolist()


def test_decay_functions_match_bruteforce(built):
    """ES function_score decay (gauss / exp / linear, boost_mode=multiply):
    run_queries with decay_* columns == re-ranking the full BM25 ranking by
    round6(score * decay(dist)), dist = max(0, |v - origin| - offset);
    NaN field values keep the base score (neutral 1.0)."""
    idx, df = built
    s = IndexSearcher(idx, CFG)
    by_doc = df.set_index("doc_id")
    for func in ("gauss", "exp", "linear"):
        queries = pd.DataFrame(
            {
                "query_id": [0],
                "text": ["alpha beta"],
                "decay_field": ["size"],
                "decay_function": [func],
                "decay_origin": [1000.0],
                "decay_scale": [800.0],
                "decay_offset": [50.0],
                "decay_decay": [0.5],
            }
        )
        got = (
            run_queries(queries, idx, CFG)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        full = s.search("alpha beta", k=10_000)
        v = by_doc.loc[full["doc_id"], "size"].to_numpy(np.float64)
        dist = np.maximum(np.abs(v - 1000.0) - 50.0, 0.0)
        if func == "gauss":
            mult = np.exp(np.log(0.5) * dist * dist / (800.0 * 800.0))
        elif func == "exp":
            mult = np.exp(np.log(0.5) * dist / 800.0)
        else:
            sc = 800.0 / 0.5
            mult = np.maximum((sc - dist) / sc, 0.0)
        mult = np.where(np.isnan(v), 1.0, mult)
        boosted = np.floor(full["score"].to_numpy() * mult * 1e6 + 0.5) / 1e6
        order = np.lexsort((full["doc_id"].to_numpy(), -boosted))[:10]
        assert got["doc_id"].tolist() == full["doc_id"].to_numpy()[order].tolist(), func
        assert got["score"].tolist() == boosted[order].tolist(), func


def test_decay_rejects_unknown_function(built):
    idx, _ = built
    q = pd.DataFrame(
        {"query_id": [0], "text": ["alpha"], "decay_field": ["size"],
         "decay_function": ["cosine"]}
    )
    with pytest.raises(ValueError, match="decay_function"):
        run_queries(q, idx, CFG)


def test_ip_range_agg_matches_bruteforce(ray_session, tmp_path):
    """run_agg_ip_range == pandas over a derived integer-ip column:
    CIDR masks (masked base + span) and open/closed from-to ranges with
    [from, to) semantics; overlapping ranges counted independently;
    empty ranges kept at 0."""
    import ray.data as rd

    from kafka_es_ray.query.engine import _ip_to_int, run_agg_ip_range

    n = 120
    rng = np.random.default_rng(5)
    texts = [" ".join(rng.choice(WORDS, size=4).tolist()) for _ in range(n)]
    ids = np.arange(1, n + 1, dtype=np.int64)
    ip = (ids * 2654435761) % (1 << 32)
    df = pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "doc_id": ids,
            "text": texts,
            "lang": "en",
            "ip": ip.astype(np.float64),
        }
    )
    cfg = EngineConfig(num_partitions=4, numeric_cols=("ip",))
    idx = str(tmp_path / "ipidx")
    build_index(
        rd.from_pandas(df), idx, cfg,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    ranges = [
        {"mask": "0.0.0.0/1"},
        {"mask": "128.0.0.5/2"},  # non-aligned base must be masked down
        {"from": "64.0.0.0", "to": "192.0.0.0"},
        {"from": "255.255.255.255"},  # empty range stays at 0
    ]
    q = pd.DataFrame({"query_id": [0], "text": ["alpha beta"]})
    got = run_agg_ip_range(q, idx, "ip", ranges, cfg=cfg, concurrency=2)
    hit = df["text"].str.split().apply(lambda t: bool({"alpha", "beta"} & set(t)))
    m_ip = ip[hit.to_numpy()]
    want = {
        "0.0.0.0/1": int((m_ip < (1 << 31)).sum()),
        "128.0.0.5/2": int(((m_ip >= (1 << 31)) & (m_ip < 3 * (1 << 30))).sum()),
        "64.0.0.0-192.0.0.0": int(
            ((m_ip >= _ip_to_int("64.0.0.0")) & (m_ip < _ip_to_int("192.0.0.0"))).sum()
        ),
        "255.255.255.255-*": int((m_ip >= _ip_to_int("255.255.255.255")).sum()),
    }
    assert dict(zip(got["range_key"], got["n_docs"])) == want
    assert (got["query_id"] == 0).all() and len(got) == 4


def test_date_range_agg_matches_bruteforce(ray_session, tmp_path):
    """run_agg_date_range == pandas over an epoch-seconds ts column:
    ISO from/to bounds resolve to UTC epochs with [from, to) semantics,
    either side open, overlap counted independently, empty ranges 0."""
    import ray.data as rd

    from kafka_es_ray.query.engine import _date_to_epoch, run_agg_date_range

    assert _date_to_epoch("2020-03-01") == 1583020800
    assert _date_to_epoch("2020-02-15T12:00:00") == 1581768000
    assert _date_to_epoch(1234) == 1234

    n = 120
    rng = np.random.default_rng(7)
    texts = [" ".join(rng.choice(WORDS, size=4).tolist()) for _ in range(n)]
    ids = np.arange(1, n + 1, dtype=np.int64)
    ts = 1577836800 + (ids % 150) * 86400  # 2020-01-01 .. +149d
    df = pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "doc_id": ids,
            "text": texts,
            "lang": "en",
            "ts": ts.astype(np.float64),
        }
    )
    cfg = EngineConfig(num_partitions=4, numeric_cols=("ts",))
    idx = str(tmp_path / "dridx")
    build_index(
        rd.from_pandas(df), idx, cfg,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    ranges = [
        {"to": "2020-02-01"},
        {"from": "2020-02-01", "to": "2020-04-01"},
        {"from": "2020-01-15T12:00:00", "to": "2020-02-01"},  # overlap
        {"from": "2030-01-01"},  # empty range stays at 0
        {"from": 1580515200, "key": "epoch-from-feb"},  # numeric bound + key
    ]
    q = pd.DataFrame({"query_id": [0], "text": ["alpha beta"]})
    got = run_agg_date_range(q, idx, "ts", ranges, cfg=cfg, concurrency=2)
    hit = df["text"].str.split().apply(lambda t: bool({"alpha", "beta"} & set(t)))
    m = ts[hit.to_numpy()]
    feb1, apr1 = _date_to_epoch("2020-02-01"), _date_to_epoch("2020-04-01")
    jan15 = _date_to_epoch("2020-01-15T12:00:00")
    want = {
        "*-2020-02-01": int((m < feb1).sum()),
        "2020-02-01-2020-04-01": int(((m >= feb1) & (m < apr1)).sum()),
        "2020-01-15T12:00:00-2020-02-01": int(((m >= jan15) & (m < feb1)).sum()),
        "2030-01-01-*": 0,
        "epoch-from-feb": int((m >= 1580515200).sum()),
    }
    assert dict(zip(got["range_key"], got["n_docs"])) == want
    assert (got["query_id"] == 0).all() and len(got) == 5


def test_runtime_field_sort(ray_session, tmp_path):
    """ES runtime-field sort: 'name=expr' on search_sorted and run_sorted
    == brute-force ranking by the expression over docvalues (missing
    inputs read 0.0); whitelist gate rejects non-arithmetic scripts."""
    import ray.data as rd

    from kafka_es_ray.query.engine import IndexSearcher, run_sorted

    n = 80
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "doc_id": np.arange(1, n + 1, dtype=np.int64),
            "text": [" ".join(rng.choice(WORDS, size=4).tolist()) for _ in range(n)],
            "lang": "en",
            "a": rng.integers(0, 50, size=n).astype(np.float64),
            "b": rng.integers(0, 9, size=n).astype(np.float64),
        }
    )
    df.loc[5:9, "b"] = np.nan  # missing inputs read 0.0 in scripts
    cfg = EngineConfig(num_partitions=4, numeric_cols=("a", "b"))
    idx = str(tmp_path / "rtidx")
    build_index(
        rd.from_pandas(df), idx, cfg,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    expr_vals = df["a"].to_numpy() * 2 - df["b"].fillna(0.0).to_numpy() * 5
    hit = df["text"].str.split().apply(lambda t: bool({"alpha", "beta"} & set(t)))
    order = sorted(
        zip(expr_vals[hit.to_numpy()], -df["doc_id"][hit].to_numpy()),
        reverse=True,
    )
    want = [(-d, v) for v, d in order[:10]]

    s = IndexSearcher(idx, cfg)
    got1 = s.search_sorted("alpha beta", "score=a * 2 - b * 5", k=10)
    assert list(zip(got1["doc_id"], got1["sort_val"])) == want

    q = pd.DataFrame({"query_id": [0], "text": ["alpha beta"]})
    got2 = (
        run_sorted(q, idx, "score=a * 2 - b * 5", k=10, cfg=cfg, concurrency=2)
        .to_pandas()
        .sort_values("rank")
    )
    assert list(zip(got2["doc_id"], got2["sort_val"])) == want

    with pytest.raises(ValueError):
        s.search_sorted("alpha", "x=__import__('os')", k=3)
    with pytest.raises(ValueError):
        run_sorted(q, idx, "x=a if a else b", k=3, cfg=cfg)


def test_index_sorting_layout_and_early_termination(ray_session, tmp_path):
    """ES index.sort: value-ordered segment layout (missing last, ties by
    key), sorted queries early-terminate yet match the unsorted index's
    results exactly; incremental apply and merge drop the layout flag;
    external ids reject the setting."""
    import ray.data as rd

    from kafka_es_ray.index.incremental import apply_incremental
    from kafka_es_ray.index.merge import merge_index
    from kafka_es_ray.index.segment import read_manifest
    from kafka_es_ray.query.engine import IndexSearcher, run_sorted

    n = 150
    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "text": [" ".join(rng.choice(WORDS, size=4).tolist()) for _ in range(n)],
            "lang": "en",
            "pop": rng.integers(0, 40, size=n).astype(np.float64),
        }
    )
    df.loc[10:19, "pop"] = np.nan  # missing sorts last in the layout
    sorted_cfg = EngineConfig(
        num_partitions=4, numeric_cols=("pop",), index_sort=("pop", "desc")
    )
    plain_cfg = EngineConfig(num_partitions=4, numeric_cols=("pop",))
    si = str(tmp_path / "sorted")
    pi = str(tmp_path / "plain")
    build_index(rd.from_pandas(df), si, sorted_cfg, html_col=None, ts_col=None)
    build_index(rd.from_pandas(df), pi, plain_cfg, html_col=None, ts_col=None)
    assert read_manifest(si)["mappings"]["index_sort"] == ["pop", "desc"]

    # layout: within every segment ascending doc_id == pop desc, NaN last
    s = IndexSearcher(si, sorted_cfg)
    for seg in s.segments:
        vals = seg.nums_for("pop", seg.doc_ids_store)
        real = vals[~np.isnan(vals)]
        assert (np.diff(real) <= 0).all()
        assert not np.isnan(vals)[: real.size].any()  # NaN strictly last

    # identical answers, sorted vs plain, single and distributed paths
    a = s.search_sorted("alpha beta", "pop", k=7)
    b = IndexSearcher(pi, plain_cfg).search_sorted("alpha beta", "pop", k=7)
    assert list(zip(a["key"], a["sort_val"])) == list(zip(b["key"], b["sort_val"]))
    q = pd.DataFrame({"query_id": [0], "text": ["alpha beta"]})
    da = run_sorted(q, si, "pop", k=7, cfg=sorted_cfg).to_pandas()
    dp = run_sorted(q, pi, "pop", k=7, cfg=plain_cfg).to_pandas()
    assert da["key"].tolist() == dp["key"].tolist()
    assert da["sort_val"].tolist() == dp["sort_val"].tolist()
    # ascending request (layout mismatch direction -> general path) too
    aa = s.search_sorted("alpha beta", "pop", ascending=True, k=7)
    bb = IndexSearcher(pi, plain_cfg).search_sorted(
        "alpha beta", "pop", ascending=True, k=7
    )
    assert aa["key"].tolist() == bb["key"].tolist()

    # incremental apply drops the guarantee
    acts = pd.DataFrame(
        [{"id": "zz", "text": "alpha", "lang": "en", "seq": 1, "op": "index",
          "pop": 99.0}]
    )
    apply_incremental(si, rd.from_pandas(acts), sorted_cfg, key_col="id")
    assert read_manifest(si)["mappings"]["index_sort"] is None

    # merge drops it on a fresh sorted index too
    si2 = str(tmp_path / "sorted2")
    build_index(rd.from_pandas(df), si2, sorted_cfg, html_col=None, ts_col=None)
    merge_index(si2, merge_factor=4, cfg=sorted_cfg)
    assert read_manifest(si2)["mappings"]["index_sort"] is None

    # external ids cannot re-map the layout
    with pytest.raises(Exception, match="index_sort"):
        build_index(
            rd.from_pandas(df.assign(doc_id=np.arange(n, dtype=np.int64))),
            str(tmp_path / "bad"),
            EngineConfig(num_partitions=2, numeric_cols=("pop",),
                         index_sort=("pop", "desc")),
            key_col="url", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
