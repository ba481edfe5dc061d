"""Brute-force BM25 oracle — full-scan scoring with NO index.

The correctness anchor (SURVEY §7.0 M0): every index-engine result must be
rank-identical to this.  Mirrors the reference's hermetic mock-transport
goldens (ElasticsearchBulkSenderTests.kt:30-63) — trusted slow path vs
fast production path.

Two forms:
  * ``bruteforce_topk`` — driver-side pandas/numpy for tests (small data).
  * ``bruteforce_topk_ray`` — the same computation as a streaming Ray
    pipeline: pass 1 aggregates corpus stats (N, Σdl, df per query term)
    from per-batch partials; pass 2 scores per batch against broadcast
    stats and keeps per-batch top-k candidates; one tiny merge.  Even the
    oracle never materializes the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kafka_es_ray.functions.tokenizer import get_analyzer
from kafka_es_ray.query.bm25 import B, K1, bm25_idf, bm25_tf_part, round6


def corpus_token_stats(
    docs: pd.DataFrame, text_col: str = "text", lang_col: str | None = "lang"
) -> tuple[pd.Series, np.ndarray]:
    """(token_lists aligned with docs, doc_len)."""
    langs = docs[lang_col] if lang_col and lang_col in docs.columns else pd.Series(["en"] * len(docs), index=docs.index)
    toks = pd.Series([None] * len(docs), dtype=object, index=docs.index)
    for lang in langs.unique():
        mask = langs == lang
        toks[mask] = get_analyzer(lang).tokenize_series(docs.loc[mask, text_col])
    dl = np.array([len(t) for t in toks], dtype=np.int64)
    return toks, dl


def bruteforce_topk(
    docs: pd.DataFrame,
    query_text: str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    key_col: str | None = "key",
    text_col: str = "text",
    lang_col: str | None = "lang",
    query_lang: str | None = None,
    k1: float = K1,
    b: float = B,
) -> pd.DataFrame:
    """Exact full-scan BM25 top-k over a deduped corpus DataFrame."""
    terms = sorted(set(get_analyzer(query_lang).tokenize(query_text)))
    toks, dl = corpus_token_stats(docs, text_col, lang_col)
    n = len(docs)
    avgdl = dl.mean() if n else 1.0
    doc_ids = docs[id_col].to_numpy(dtype=np.int64)

    scores = np.zeros(n, dtype=np.float64)
    any_term = False
    for t in terms:  # ascending term order — determinism contract
        tf = np.array([tok.count(t) for tok in toks], dtype=np.int64)
        df = int((tf > 0).sum())
        if df == 0:
            continue
        any_term = True
        idf = bm25_idf(df, n)
        contrib = idf * bm25_tf_part(tf, dl, avgdl, k1, b)
        contrib[tf == 0] = 0.0
        scores += contrib
    if not any_term:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"), "doc_id": pd.Series([], dtype="int64"), "key": pd.Series([], dtype=object), "score": pd.Series([], dtype="float64")})
    scores = np.asarray(round6(scores))
    hit = scores > 0
    ids_h, sc_h = doc_ids[hit], scores[hit]
    order = np.lexsort((ids_h, -sc_h))[:k]
    out = pd.DataFrame(
        {
            "rank": np.arange(1, order.size + 1, dtype=np.int64),
            "doc_id": ids_h[order],
            "score": sc_h[order],
        }
    )
    if key_col and key_col in docs.columns:
        keys = docs[key_col].to_numpy()[hit]
        out.insert(2, "key", keys[order])
    return out


def bruteforce_topk_ray(
    docs_ds,
    query_text: str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    key_col: str | None = "key",
    text_col: str = "text",
    lang_col: str | None = "lang",
    query_lang: str | None = None,
    k1: float = K1,
    b: float = B,
) -> pd.DataFrame:
    """Streaming full-scan oracle over a Dataset (no index, no corpus
    materialization).  Rank-identical to ``bruteforce_topk``."""
    import ray

    terms = sorted(set(get_analyzer(query_lang).tokenize(query_text)))
    if not terms:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"), "doc_id": pd.Series([], dtype="int64"), "key": pd.Series([], dtype=object), "score": pd.Series([], dtype="float64")})
    terms_arr = np.asarray(terms, dtype=object)

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks, dl = corpus_token_stats(batch, text_col, lang_col)
        dfs = np.zeros(terms_arr.size, dtype=np.int64)
        for i, t in enumerate(terms_arr):
            dfs[i] = sum(t in set(tok) for tok in toks)
        row = {"n": np.int64(len(batch)), "sum_dl": np.int64(dl.sum())}
        for i, t in enumerate(terms_arr):
            row[f"df_{i}"] = dfs[i]
        return pd.DataFrame([row])

    stats = docs_ds.map_batches(stats_partial, batch_format="pandas", batch_size=4096).to_pandas().sum()
    n = int(stats["n"])
    if n == 0:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"), "doc_id": pd.Series([], dtype="int64"), "key": pd.Series([], dtype=object), "score": pd.Series([], dtype="float64")})
    avgdl = float(stats["sum_dl"]) / n
    dfs = np.array([int(stats[f"df_{i}"]) for i in range(terms_arr.size)], dtype=np.int64)
    keep = dfs > 0
    live_terms = [t for t, m in zip(terms, keep) if m]
    if not live_terms:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"), "doc_id": pd.Series([], dtype="int64"), "key": pd.Series([], dtype=object), "score": pd.Series([], dtype="float64")})
    idfs = np.asarray(bm25_idf(dfs[keep], n), dtype=np.float64)
    stats_ref = ray.put((live_terms, idfs, avgdl, n))

    def score_partial(batch: pd.DataFrame) -> pd.DataFrame:
        lt, li, av, _ = ray.get(stats_ref)
        toks, dl = corpus_token_stats(batch, text_col, lang_col)
        scores = np.zeros(len(batch), dtype=np.float64)
        for t, idf in zip(lt, li):  # ascending term order (determinism)
            tf = np.array([tok.count(t) for tok in toks], dtype=np.int64)
            contrib = idf * bm25_tf_part(tf, dl, av, k1, b)
            contrib[tf == 0] = 0.0
            scores += contrib
        scores = np.asarray(round6(scores))
        hit = scores > 0
        out = pd.DataFrame(
            {
                "doc_id": batch[id_col].to_numpy(dtype=np.int64)[hit],
                "score": scores[hit],
            }
        )
        if key_col and key_col in batch.columns:
            out["key"] = batch[key_col].to_numpy()[hit]
        # per-batch partial top-k (keep score ties at the k-th)
        if len(out) > k:
            kth = -np.partition(-out["score"].to_numpy(), k - 1)[k - 1]
            out = out[out["score"] >= kth]
        return out

    partials = docs_ds.map_batches(score_partial, batch_format="pandas", batch_size=4096).to_pandas()
    if partials.empty:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"), "doc_id": pd.Series([], dtype="int64"), "key": pd.Series([], dtype=object), "score": pd.Series([], dtype="float64")})
    ids = partials["doc_id"].to_numpy()
    scores = partials["score"].to_numpy()
    order = np.lexsort((ids, -scores))[:k]
    out = pd.DataFrame(
        {
            "rank": np.arange(1, order.size + 1, dtype=np.int64),
            "doc_id": ids[order],
            "score": scores[order],
        }
    )
    if "key" in partials.columns:
        out.insert(2, "key", partials["key"].to_numpy()[order])
    return out
