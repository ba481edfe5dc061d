"""Brute-force BM25 oracle — full-scan scoring with NO index.

The correctness anchor (SURVEY §7.0 M0): every index-engine result must be
rank-identical to this.  Mirrors the reference's hermetic mock-transport
goldens (ElasticsearchBulkSenderTests.kt:30-63) — trusted slow path vs
fast production path.

Two forms:
  * ``bruteforce_topk`` — driver-side pandas/numpy for tests (small data).
  * ``bruteforce_topk_ray`` — the same computation as a streaming Ray
    pipeline (map_batches partial scores -> merge), demonstrating that
    even the oracle needn't materialize the corpus.
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
        return pd.DataFrame({"rank": [], "doc_id": [], "key": [], "score": []})
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
