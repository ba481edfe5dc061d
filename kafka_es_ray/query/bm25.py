"""Okapi BM25 scoring math — k1=1.2, b=0.75 (SURVEY §2 E4, BASELINE.json).

Formula (classic Okapi with the (k1+1) numerator; ES-style always-positive
idf):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn     = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score   = sum over UNIQUE query terms, in ascending term order, float64

Determinism contract (SURVEY §7.4 "rank-identical BM25"): query terms are
deduplicated and accumulated in sorted order with float64; final scores are
rounded half-away-from-zero to 6 decimals BEFORE ranking (so engine, brute
force oracle and DuckDB SQL agree bit-for-bit), ties broken by doc_id asc.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def bm25_idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def bm25_tf_part(
    tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B
) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def round6(x: np.ndarray | float) -> np.ndarray | float:
    """Round half away from zero to 6 dp — matches DuckDB ROUND(x, 6) for
    the positive scores BM25 produces (numpy's np.round is banker's and
    would disagree)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6
