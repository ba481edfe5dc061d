"""ES ``_rank_eval`` analog: retrieval-quality metrics for a ranked run
against relevance labels — precision@k, recall@k, MRR and binary
NDCG@k per query.

Scale shape: the RUN (top-k per query) and the QRELS (labeled pairs) are
both small by construction — a run is queries x k rows and labels are
human-sized — so the metric arithmetic is plain driver-side numpy; the
expensive parts (producing the run via ``run_queries``, producing labels
via ``percolate``) are the existing distributed operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _round6(x):
    return float(np.floor(float(x) * 1e6 + 0.5) / 1e6)


def rank_eval(run: pd.DataFrame, qrels: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """``run``: (query_id, rank, doc_id) — the ranked result (rank
    1-based; rows beyond ``k`` are ignored).  ``qrels``: (query_id,
    doc_id) — the relevant set (binary labels).  Returns one row per
    query_id appearing in EITHER input: (query_id, n_retrieved, n_relevant,
    precision, recall, mrr, ndcg), metrics rounded to 6dp.

    Definitions (the ES rank_eval metrics, binary gains):
      precision@k = rel_retrieved / retrieved  (0 when nothing retrieved)
      recall@k    = rel_retrieved / n_relevant (0 when no relevant docs)
      MRR         = 1 / rank of the first relevant hit (0 if none)
      NDCG@k      = sum_{hits} 1/log2(rank+1)  /  sum_{i=1..min(k, n_rel)}
                    1/log2(i+1)                (0 when either side empty)
    """
    rel_by_q: dict[int, set] = {}
    for r in qrels.itertuples(index=False):
        rel_by_q.setdefault(int(r.query_id), set()).add(int(r.doc_id))
    run = run[run["rank"] <= k]
    rows = []
    qids = sorted(set(run["query_id"].astype(int)) | set(rel_by_q))
    for qid in qids:
        g = run[run["query_id"] == qid].sort_values("rank")
        rel = rel_by_q.get(qid, set())
        ranks = g["rank"].to_numpy(np.int64)
        hits = np.array([int(d) in rel for d in g["doc_id"]], dtype=bool)
        n_ret = int(len(g))
        n_hit = int(hits.sum())
        precision = n_hit / n_ret if n_ret else 0.0
        recall = n_hit / len(rel) if rel else 0.0
        mrr = 1.0 / float(ranks[hits][0]) if n_hit else 0.0
        dcg = float(np.sum(1.0 / np.log2(ranks[hits] + 1))) if n_hit else 0.0
        n_ideal = min(k, len(rel))
        idcg = (
            float(np.sum(1.0 / np.log2(np.arange(1, n_ideal + 1) + 1)))
            if n_ideal
            else 0.0
        )
        ndcg = dcg / idcg if idcg else 0.0
        rows.append(
            (
                np.int64(qid), np.int64(n_ret), np.int64(len(rel)),
                _round6(precision), _round6(recall), _round6(mrr), _round6(ndcg),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "query_id", "n_retrieved", "n_relevant",
            "precision", "recall", "mrr", "ndcg",
        ],
    ).astype({"query_id": np.int64, "n_retrieved": np.int64, "n_relevant": np.int64})
