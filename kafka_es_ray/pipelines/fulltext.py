"""Flagship full-text pipelines.

* ``documents`` table (driver testdata): build an inverted index with the
  engine, run a deterministically-derived query set, return BM25 top-k —
  SQL-oracle-checkable end to end (the oracle recomputes BM25 in DuckDB).
* ``pages`` corpus (input_hint shape, synthesized by fixtures.py): the
  full reference pipeline — html recovery, per-lang analysis, LWW dedup —
  checked in pytest against the brute-force oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_es_ray.runtime import stage_pool

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.functions.tokenizer import get_analyzer
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.engine import IndexSearcher
from kafka_es_ray.sources.parquet import read_table

DOCS_CFG = EngineConfig(num_partitions=8)


def documents_dataset(sf_dir: str, extra_cols: tuple[str, ...] = ()):
    ds = read_table(
        sf_dir, "documents", columns=["doc_id", "text", "lang", *extra_cols]
    )

    def add_key(batch: pa.Table) -> pa.Table:
        key = batch.column("doc_id").cast(pa.string())
        return batch.append_column("key", key)

    return ds.map_batches(add_key, batch_format="pyarrow")


def geo_documents_dataset(sf_dir: str):
    """documents + a deterministic geo_point field ``loc`` mapped onto two
    numeric docstore columns ``loc_lat``/``loc_lon`` (the engine's geo
    storage model — functions/geo.py).  Coordinates derive from doc_id by
    exact integer arithmetic so the DuckDB oracles replay them verbatim:

        loc_lat = (doc_id * 37) % 18001 / 100.0 -  90.0   in [-90,  90]
        loc_lon = (doc_id * 53) % 36001 / 100.0 - 180.0   in [-180, 180]

    0.01-degree resolution, global coverage; every step (int mul/mod,
    int->double cast, double div/sub) is IEEE-exactly reproducible on
    both engines, so no float contract is needed for the coordinates
    themselves."""
    ds = documents_dataset(sf_dir)

    def add_geo(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        lat = ((ids * 37) % 18001).astype(np.float64) / 100.0 - 90.0
        lon = ((ids * 53) % 36001).astype(np.float64) / 100.0 - 180.0
        return batch.append_column("loc_lat", pa.array(lat)).append_column(
            "loc_lon", pa.array(lon)
        )

    return ds.map_batches(add_geo, batch_format="pyarrow")


def build_documents_index(sf_dir: str, index_dir: str, cfg: EngineConfig = DOCS_CFG) -> dict:
    """documents(doc_id,text,lang) -> inverted index.  doc_id is the
    provided external id (no LWW needed: ids are unique)."""
    return build_index(
        documents_dataset(sf_dir),
        index_dir,
        cfg,
        key_col="key",
        text_col="text",
        lang_col="lang",
        html_col=None,
        ts_col=None,
        id_col="doc_id",
    )


def derive_ranked_terms(searcher: IndexSearcher, n_top: int = 8) -> list[str]:
    """Top-n_top corpus terms by (global df desc, term asc) — reproduced
    exactly by the SQL oracles' row_number() derivation.  (Merges the
    per-segment dictionaries; small vocab at test scale — at 100 TB this
    is itself a term_df pipeline over segments.)"""
    df_map: dict[str, int] = {}
    for s in searcher.segments:
        for t, d in zip(s.terms, s.df):
            df_map[t] = df_map.get(t, 0) + int(d)
    return [t for t, _ in sorted(df_map.items(), key=lambda kv: (-kv[1], kv[0]))[:n_top]]


def derive_query_set(searcher: IndexSearcher, n_top: int = 8) -> pd.DataFrame:
    """Deterministic query set from corpus stats: top-n_top terms by
    (df desc, term asc).  Queries: [t1], [t2 t3], [t4 t5 t6],
    [t7 t8], [absent-term]."""
    top = derive_ranked_terms(searcher, n_top)
    qtexts = [
        " ".join(top[0:1]),
        " ".join(top[1:3]),
        " ".join(top[3:6]),
        " ".join(top[6:8]),
        "zzzabsentterm",
    ]
    return pd.DataFrame(
        {
            "query_id": np.arange(len(qtexts), dtype=np.int64),
            "text": qtexts,
            "lang": "en",
            "k": np.int32(10),
        }
    )


def bm25_topk_documents(sf_dir: str, index_dir: str | None = None, k: int = 10) -> pd.DataFrame:
    """End-to-end: build (or reuse) the documents index, derive queries,
    return (query_id, rank, doc_id, score)."""
    own = index_dir is None
    if own:
        index_dir = tempfile.mkdtemp(prefix="kafka_es_ray_docidx_")
    try:
        if not os.path.exists(os.path.join(index_dir, "manifest.json")):
            build_documents_index(sf_dir, index_dir)
        searcher = IndexSearcher(index_dir)
        queries = derive_query_set(searcher)
        res = searcher.search_batch(queries)
        return res[["query_id", "rank", "doc_id", "score"]].reset_index(drop=True)
    finally:
        if own:
            shutil.rmtree(index_dir, ignore_errors=True)


MF_CFG = EngineConfig(num_partitions=8, text_fields=("title", "body"))


def build_documents_mf_index(sf_dir: str, index_dir: str, cfg: EngineConfig = MF_CFG) -> dict:
    """Multi-field documents index: title := source (a short keyword-ish
    text field), body := text — the ES mapped-fields analog for the
    reference's nested JSON sources (JsonConverterTests.kt:110-115)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "key": batch.column("doc_id").cast(pa.string()),
                "title": batch.column("source"),
                "body": batch.column("text"),
                "lang": batch.column("lang"),
            }
        )

    return build_index(
        ds.map_batches(shape, batch_format="pyarrow"),
        index_dir,
        cfg,
        key_col="key",
        text_col="body",
        lang_col="lang",
        html_col=None,
        ts_col=None,
        id_col="doc_id",
    )


def _ranked_field_terms(searcher: IndexSearcher, field: str, n: int) -> list[str]:
    """Top-n UNPREFIXED terms of one field by (df desc, term asc) from the
    segment dictionaries — the multi-field analog of derive_query_set's
    derivation, reproduced exactly by the oracle's row_number() ranking."""
    pref = field + "\x1f"
    df_map: dict[str, int] = {}
    for s in searcher.segments:
        for t, d in zip(s.terms, s.df):
            if t.startswith(pref):
                bare = t[len(pref):]
                df_map[bare] = df_map.get(bare, 0) + int(d)
    return [t for t, _ in sorted(df_map.items(), key=lambda kv: (-kv[1], kv[0]))[:n]]


def multi_match_topk_documents(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """ES multi_match most_fields over the title/body index, DISTRIBUTED
    path (run_queries): four derived queries mixing body-only, title-only
    and cross-field terms; returns (query_id, rank, doc_id, score).
    Derivation rule (oracle-mirrored): body terms b1..b3 and title term t1
    ranked by (field df desc, term asc); queries = [b1], [b1 t1], [t1],
    [b2 b3]."""
    from kafka_es_ray.query.engine import run_queries

    index_dir = tempfile.mkdtemp(prefix="kafka_es_ray_mfidx_")
    try:
        build_documents_mf_index(sf_dir, index_dir)
        searcher = IndexSearcher(index_dir, MF_CFG)
        b1, b2, b3 = _ranked_field_terms(searcher, "body", 3)
        (t1,) = _ranked_field_terms(searcher, "title", 1)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "text": [b1, f"{b1} {t1}", t1, f"{b2} {b3}"],
                "type": "multi_match",
                "fields": "title,body",
                "k": np.int32(k),
            }
        )
        out = run_queries(queries, index_dir, MF_CFG).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"], kind="mergesort")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


class PercolateStage:
    """Actor-pool ES percolator: stored queries are the broadcast small
    side (term->query inverted map built once per actor), documents
    STREAM through — the reverse of search, used for alerting/routing.
    Per batch: one distinct (doc, term) explode + one merge against the
    term->query map + one groupby — no per-(doc, query) Python loop."""

    def __init__(self, plans_ref):
        import ray

        plans = ray.get(plans_ref)  # [(query_id, tuple(terms), require_all)]
        rows = [
            (qid, t, len(terms), require_all)
            for qid, terms, require_all in plans
            for t in terms
        ]
        self.term_map = pd.DataFrame(
            rows, columns=["query_id", "term", "n_terms", "require_all"]
        )
        self.an = get_analyzer("en")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        toks = self.an.tokenize_series(batch["text"])
        n_per = toks.map(len).to_numpy(dtype=np.int64)
        total = int(n_per.sum())
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "query_id": pd.Series([], dtype=np.int64),
            }
        )
        if total == 0 or not len(self.term_map):
            return empty
        flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
        ids = batch["doc_id"].to_numpy(np.int64)
        pairs = pd.DataFrame(
            {"doc_id": np.repeat(ids, n_per), "term": flat}
        ).drop_duplicates()
        hit = pairs.merge(self.term_map, on="term")
        if not len(hit):
            return empty
        g = hit.groupby(["doc_id", "query_id"], as_index=False).agg(
            n_hit=("term", "size"), n_terms=("n_terms", "first"),
            require_all=("require_all", "first"),
        )
        keep = np.where(g["require_all"], g["n_hit"] == g["n_terms"], g["n_hit"] >= 1)
        return g.loc[keep, ["doc_id", "query_id"]].astype(np.int64)


def percolate(docs_ds, queries: pd.DataFrame, lang: str | None = None):
    """Distributed ES percolate: (doc_id, query_id) for every document
    matching a stored query (match semantics: operator or/and over the
    analyzed text; a query with no analyzable terms matches nothing).
    Queries broadcast once via ray.put; the corpus streams."""
    import ray

    plans = []
    for row in queries.itertuples(index=False):
        terms = tuple(sorted(set(get_analyzer(lang).tokenize(row.text))))
        if not terms:
            continue
        require_all = (getattr(row, "operator", None) or "or") == "and"
        plans.append((int(row.query_id), terms, require_all))
    plans_ref = ray.put(plans)
    return docs_ds.map_batches(
        PercolateStage,
        fn_constructor_args=(plans_ref,),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )


def multi_match_boost_topk_documents(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """multi_match most_fields with an ES field boost (title^2): same
    query derivation as multi_match_topk_documents, title scores doubled
    before the sum."""
    from kafka_es_ray.query.engine import run_queries

    index_dir = tempfile.mkdtemp(prefix="kafka_es_ray_mbidx_")
    try:
        build_documents_mf_index(sf_dir, index_dir)
        searcher = IndexSearcher(index_dir, MF_CFG)
        b1, b2, b3 = _ranked_field_terms(searcher, "body", 3)
        (t1,) = _ranked_field_terms(searcher, "title", 1)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "text": [b1, f"{b1} {t1}", t1, f"{b2} {b3}"],
                "type": "multi_match",
                "fields": "title^2,body",
                "k": np.int32(k),
            }
        )
        out = run_queries(queries, index_dir, MF_CFG).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"], kind="mergesort")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def dis_max_topk_documents(sf_dir: str, k: int = 10, tie_breaker: float = 0.3) -> pd.DataFrame:
    """ES dis_max over the title/body index, DISTRIBUTED path: per-field
    BM25, doc score = best field + tie_breaker x the other fields (vs
    multi_match most_fields' sum).  Same query derivation as
    multi_match_topk_documents so the two operators are directly
    comparable; returns (query_id, rank, doc_id, score)."""
    from kafka_es_ray.query.engine import run_queries

    index_dir = tempfile.mkdtemp(prefix="kafka_es_ray_dmidx_")
    try:
        build_documents_mf_index(sf_dir, index_dir)
        searcher = IndexSearcher(index_dir, MF_CFG)
        b1, b2, b3 = _ranked_field_terms(searcher, "body", 3)
        (t1,) = _ranked_field_terms(searcher, "title", 1)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "text": [b1, f"{b1} {t1}", t1, f"{b2} {b3}"],
                "type": "dis_max",
                "fields": "title,body",
                "tie_breaker": tie_breaker,
                "k": np.int32(k),
            }
        )
        out = run_queries(queries, index_dir, MF_CFG).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"], kind="mergesort")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def match_title_topk_documents(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """ES match on ONE mapped field (field="title") over the title/body
    index, DISTRIBUTED path: BM25 with the title field's own df/idf/
    length-norm/avgdl.  Derivation rule (oracle-mirrored): title terms
    t1..t4 ranked by (title df desc, term asc); queries = [t1], [t1 t2],
    [t3], [t2 t4]."""
    from kafka_es_ray.query.engine import run_queries

    index_dir = tempfile.mkdtemp(prefix="kafka_es_ray_mtidx_")
    try:
        build_documents_mf_index(sf_dir, index_dir)
        searcher = IndexSearcher(index_dir, MF_CFG)
        t1, t2, t3, t4 = _ranked_field_terms(searcher, "title", 4)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "text": [t1, f"{t1} {t2}", t3, f"{t2} {t4}"],
                "type": "match",
                "field": "title",
                "k": np.int32(k),
            }
        )
        out = run_queries(queries, index_dir, MF_CFG).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"], kind="mergesort")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def bool_topk_documents(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """ES bool queries over the single-field documents index, DISTRIBUTED
    path: must/should match clauses + minimum_should_match + must_not,
    score = round6(sum of matched clauses' round6'd BM25).  Derivation
    rule (oracle-mirrored, same ranked_terms as bm25_topk): with tN = the
    N-th term by (df desc, term asc),
      q0: must=[t2, t3]                      (two AND'ed clauses)
      q1: must=[t2], should=[t5, t7]         (boost-only should)
      q2: should=[t4, t6], msm=1             (pure should union)
      q3: must=[t3], should=[t5, t8], msm=1, must_not=t1
    """
    from kafka_es_ray.query.engine import run_queries

    index_dir = tempfile.mkdtemp(prefix="kafka_es_ray_boolidx_")
    try:
        build_documents_index(sf_dir, index_dir)
        searcher = IndexSearcher(index_dir)
        t = derive_ranked_terms(searcher, 8)
        queries = pd.DataFrame(
            {
                "query_id": np.arange(4, dtype=np.int64),
                "type": "bool",
                "must": [f"{t[1]}|{t[2]}", t[1], None, t[2]],
                "should": [None, f"{t[4]}|{t[6]}", f"{t[3]}|{t[5]}", f"{t[4]}|{t[7]}"],
                "must_not": [None, None, None, t[0]],
                "msm": pd.array([None, None, 1, 1], dtype="Int64"),
                "k": np.int32(k),
            }
        )
        out = run_queries(queries, index_dir).to_pandas()
        return (
            out[["query_id", "rank", "doc_id", "score"]]
            .sort_values(["query_id", "rank"], kind="mergesort")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def pages_pipeline(n_rows: int = 1000, num_partitions: int = 8, index_dir: str | None = None) -> pd.DataFrame:
    """The reference pipeline end-to-end on the input_hint-shaped corpus:
    synthesize pages -> build index (html recovery, LWW, per-lang
    analysis) -> run the fixture query set -> top-k."""
    import ray.data as rd

    from kafka_es_ray.fixtures import make_pages, make_queries

    own = index_dir is None
    if own:
        index_dir = tempfile.mkdtemp(prefix="kafka_es_ray_pages_")
    try:
        cfg = EngineConfig(num_partitions=num_partitions)
        build_index(rd.from_arrow(make_pages(n_rows)), index_dir, cfg)
        searcher = IndexSearcher(index_dir, cfg)
        res = searcher.search_batch(make_queries(12).to_pandas())
        return res.reset_index(drop=True)
    finally:
        if own:
            shutil.rmtree(index_dir, ignore_errors=True)


def add_index_prefixes(
    ds,
    text_col: str = "text",
    out_col: str = "px",
    min_chars: int = 2,
    max_chars: int = 5,
):
    """ES ``index_prefixes`` (the search_as_you_type building block):
    derive a synthetic text field whose tokens are the edge n-grams
    (prefixes of length ``min_chars``..``max_chars``) of the main
    field's analyzed tokens.  Built as an ordinary mapped text field
    (``cfg.text_fields`` including ``out_col``), so an in-range prefix
    query becomes ONE exact dictionary lookup (O(log V) + a single
    postings list) instead of a dictionary range scan + union — the ES
    index-time/space-for-query-time trade.  Prefixes are deduplicated
    per doc (df semantics are doc counts; prefix tf is meaningless and
    the field is meant for filter/count contexts).  Prefix tokens are
    themselves ascii alnum, so they round-trip the analyzer unchanged.
    One streaming map_batches pass."""
    an = get_analyzer("en")
    lo, hi = int(min_chars), int(max_chars)
    if not (1 <= lo <= hi):
        raise ValueError("index_prefixes: need 1 <= min_chars <= max_chars")

    def add(batch: pd.DataFrame) -> pd.DataFrame:
        toks = an.tokenize_series(batch[text_col])
        batch = batch.copy()
        batch[out_col] = [
            " ".join(
                sorted(
                    {
                        t[:n]
                        for t in ts
                        for n in range(lo, min(len(t), hi) + 1)
                    }
                )
            )
            for ts in toks
        ]
        return batch

    return ds.map_batches(add, batch_format="pandas", batch_size=4096)
