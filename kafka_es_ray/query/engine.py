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

import collections
import datetime
import hashlib
import json

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_es_ray.config import DEFAULT, EngineConfig
# the engine-wide seeded sampling hash (rule 1: imported at module top,
# MatchSetStage runs it on workers)
from kafka_es_ray.pipelines.sampling import seeded_hash_mod
from kafka_es_ray.functions.geo import (
    geohash_cells,
    geohash_render,
    geotile_pack,
    geotile_unpack,
    geotile_xy,
    haversine_m,
)
from kafka_es_ray.functions.hashing import route_partition
from kafka_es_ray.runtime import query_pool
from kafka_es_ray.functions.tokenizer import get_analyzer
from kafka_es_ray.index.incremental import _segments_covering
from kafka_es_ray.index.segment import (
    Segment,
    manifest_tombstone_files,
    postings_path,
    read_manifest,
)
from kafka_es_ray.query.bm25 import bm25_idf, bm25_tf_part, round6


# MetricsUpdater-analog counters for the query path (reference
# MetricsUpdater.kt:3-15, Metrics.kt:24-83): updated per run_queries call
# on the driver; per-searcher counters live on IndexSearcher.metrics.
QUERY_METRICS = {
    "query_batches": 0,
    "queries": 0,
    "unique_plans": 0,
    "segments_scheduled": 0,
    "terms_looked_up": 0,
}


class IndexSearcher:
    def __init__(self, index_dir: str, cfg: EngineConfig = DEFAULT):
        self.cfg = cfg
        self.manifest = read_manifest(index_dir)
        self.metrics = {"searches": 0, "postings_decoded": 0, "terms_looked_up": 0}
        self.segments = [
            Segment.load(index_dir, pid, manifest_tombstone_files(self.manifest, pid))
            for pid in self.manifest["parts"]
        ]
        self.n_docs = int(self.manifest["n_docs"])
        self.avgdl = float(self.manifest["avgdl"]) or 1.0
        self.k1 = float(self.manifest.get("k1", cfg.k1))
        self.b = float(self.manifest.get("b", cfg.b))
        # multi-field index (cfg.text_fields at build): per-field avgdl
        self.text_fields = self.manifest.get("text_fields")
        self.avgdl_fields = {
            f: float(v) or 1.0
            for f, v in self.manifest.get("avgdl_fields", {}).items()
        }

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
    def search(
        self,
        text: str,
        lang: str | None = None,
        k: int = 10,
        prune: bool = True,
        operator: str = "or",
        filter_lang: str | None = None,
        fetch: bool = False,
        offset: int = 0,
        highlight: bool = False,
        must_not: str | None = None,
        field: str | None = None,
        filter_range: list[tuple] | None = None,
        filter_kw: list[tuple] | None = None,
        min_score: float | None = None,
        search_after: tuple | None = None,
    ) -> pd.DataFrame:
        """Top-k docs for one query string.  Returns DataFrame
        (rank, doc_id, key, score) with the determinism contract applied.

        ``filter_range``: ES range filter — [(numeric_field, gte, lte)]
        over cfg.numeric_cols docstore columns (None bound = open side;
        missing values never match).

        ``search_after``: ES cursor pagination — (score, doc_id) of the
        last hit of the previous page; only docs strictly after it in
        (score desc, doc_id asc) order are returned, ranks restart at 1.
        Stateless and segment-local (unlike from/size, no deep-page
        blowup: every shard keeps at most k candidates).

        ``field`` (multi-field index only) restricts the match to one
        mapped text field: terms are prefixed, BM25 norms use the field's
        own length + avgdl (ES match on a mapped field).

        ``prune=True`` enables block-max MaxScore pruning (exact — results
        are identical to the exhaustive path, tested): terms whose
        block-max upper bounds cannot lift a doc past the running k-th
        score are demoted to lookup-only, so their (typically huge, common
        -term) posting lists are never union-scored.

        ``highlight=True`` (requires a store_text index) adds a
        ``highlight`` column: a snippet around the first query-term
        occurrence with matches wrapped in <em></em> — the ES highlighter
        analog."""
        decoded_before = sum(s.decoded_postings for s in self.segments)
        try:
            out = self._search(
                text, lang, k, prune, operator, filter_lang, fetch or highlight, offset,
                must_not=must_not, field=field, filter_range=filter_range,
                filter_kw=filter_kw, min_score=min_score,
                search_after=search_after,
            )
            if highlight:
                terms = sorted(set(get_analyzer(lang).tokenize(text)))
                out["highlight"] = [make_snippet(t, terms) for t in out["text"]]
                if not fetch:
                    out = out.drop(columns=["text"])
            return out
        finally:
            self.metrics["searches"] += 1
            self.metrics["postings_decoded"] += (
                sum(s.decoded_postings for s in self.segments) - decoded_before
            )

    def _search(
        self,
        text: str,
        lang: str | None,
        k: int,
        prune: bool,
        operator: str,
        filter_lang: str | None,
        fetch: bool,
        offset: int,
        must_not: str | None = None,
        field: str | None = None,
        filter_range: list[tuple] | None = None,
        filter_kw: list[tuple] | None = None,
        min_score: float | None = None,
        search_after: tuple | None = None,
    ) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
        )
        terms = sorted(set(get_analyzer(lang).tokenize(text)))
        mn_terms = sorted(set(get_analyzer(lang).tokenize(must_not))) if must_not else None
        avgdl_use = self.avgdl
        if field is not None:
            # prefixing preserves sort order (shared prefix)
            terms = [f"{field}\x1f{t}" for t in terms]
            mn_terms = [f"{field}\x1f{t}" for t in mn_terms] if mn_terms else None
            avgdl_use = self.avgdl_fields[field]
        self.metrics["terms_looked_up"] += len(terms)
        if not terms:
            return empty
        df = self.global_df(terms)
        keep = df > 0
        if operator == "and" and not keep.all():
            # ES match operator=and: an analyzed term absent from the
            # corpus means no doc can match all terms
            return empty
        terms = [t for t, m in zip(terms, keep) if m]
        df = df[keep]
        if not terms:
            return empty
        idf = bm25_idf(df, self.n_docs)

        theta: float | None = None
        keff = k + offset  # rank window upper bound (ES from+size)
        cand_ids: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        cand_keys: list[np.ndarray] = []
        for s in self.segments:
            ids, scores = self._score_segment(
                s,
                terms,
                idf,
                theta if prune else None,
                require_all=(operator == "and"),
                filter_lang=filter_lang,
                must_not_terms=mn_terms,
                dl_field=field,
                avgdl=avgdl_use,
                filter_ranges=filter_range,
                filter_kw=filter_kw,
            )
            if search_after is not None and ids.size:
                keep_sa = _after_cursor_mask(ids, scores, search_after)
                ids, scores = ids[keep_sa], scores[keep_sa]
            if min_score is not None and ids.size:
                # ES min_score: hits below the floor are dropped
                keep_ms = scores >= min_score
                ids, scores = ids[keep_ms], scores[keep_ms]
            if ids.size == 0:
                continue
            if ids.size > keff:
                # per-segment top-k heap analog; keep everything tied with
                # the k-th score so the global merge stays exact
                kth = -np.partition(-scores, keff - 1)[keff - 1]
                sel = np.flatnonzero(scores >= kth)
                ids, scores = ids[sel], scores[sel]
            cand_ids.append(ids)
            cand_scores.append(scores)
            cand_keys.append(s.keys_for(ids))
            if prune:
                pool = np.concatenate(cand_scores) if len(cand_scores) > 1 else cand_scores[0]
                if pool.size >= keff:
                    kth_r = -np.partition(-pool, keff - 1)[keff - 1]
                    # safety margin: a doc excluded by the bound must round
                    # strictly below the k-th rounded score
                    theta = float(kth_r) - 2e-6
        if not cand_ids:
            return empty
        ids = np.concatenate(cand_ids)
        scores = np.concatenate(cand_scores)
        keys = np.concatenate(cand_keys)
        # pagination (ES from/size): rank window [offset+1, offset+k];
        # per-segment cut above already used offset+k as the heap bound
        order = np.lexsort((ids, -scores))[offset : offset + k]
        out = pd.DataFrame(
            {
                "rank": np.arange(offset + 1, offset + 1 + order.size, dtype=np.int64),
                "doc_id": ids[order],
                "key": keys[order],
                "score": scores[order],
            }
        )
        if fetch:
            # stored-_source fetch for the FINAL top-k only (never for the
            # full candidate set)
            top = ids[order]
            texts = np.empty(top.size, dtype=object)
            for s in self.segments:
                in_seg = (
                    np.isin(top, s.doc_ids_store) if s.n_docs else np.zeros(top.size, bool)
                )
                if in_seg.any():
                    texts[in_seg] = s.texts_for(top[in_seg])
            out["text"] = texts
        return out

    def _score_segment(
        self,
        s: Segment,
        terms: list[str],
        idf: np.ndarray,
        theta: float | None = None,
        require_all: bool = False,
        filter_lang: str | None = None,
        must_not_terms: list[str] | None = None,
        dl_field: str | None = None,
        avgdl: float | None = None,
        filter_ranges: list[tuple] | None = None,
        filter_kw: list[tuple] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        return score_segment(
            s, terms, idf, self.avgdl if avgdl is None else avgdl, self.k1, self.b,
            theta, require_all=require_all, filter_lang=filter_lang,
            must_not_terms=must_not_terms, dl_field=dl_field,
            filter_ranges=filter_ranges, filter_kw=filter_kw,
        )

    def combined_fields(
        self,
        text: str,
        fields: list[str],
        lang: str | None = None,
        k: int = 10,
    ) -> pd.DataFrame:
        """ES combined_fields (BM25F): the named text fields are scored
        as ONE blended field — tf(t, d) = Σ_f w_f·tf_f(t, d), doc length
        = Σ_f w_f·dl_f(d), idf from the cross-field UNION df, ONE BM25
        per term; score = round6(Σ_t bm25F_t).  ``fields`` takes the ES
        ``title^2`` per-field weight syntax.  Contrast multi_match
        most_fields (per-field BM25 scores summed) — BM25F saturates tf
        ACROSS fields, so a term repeated in many fields cannot dominate.
        Returns (rank, doc_id, key, score), ties doc_id asc."""
        names, weights = [], []
        for f in fields:
            nm, _, w = f.partition("^")
            names.append(nm)
            weights.append(float(w) if w else 1.0)
        for nm in names:
            if nm not in (self.text_fields or ()):
                raise ValueError(
                    f"combined_fields: unmapped text field {nm!r} "
                    f"(index has: {self.text_fields})"
                )
        terms = sorted(set(get_analyzer(lang).tokenize(text)))
        empty = pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
        )
        if not terms:
            return empty
        # global stats: union df per term (per-segment exact unions
        # summed — doc partitions are disjoint), blended avgdl from the
        # manifest per-field sums
        df_u = np.zeros(len(terms), dtype=np.int64)
        for s in self.segments:
            df_u += segment_union_df(s, terms, names)
        keep = df_u > 0
        terms = [t for t, m in zip(terms, keep) if m]
        df_u = df_u[keep]
        if not terms:
            return empty
        # blended avgdl: avg_d Σ_f w_f·dl_f(d) = Σ_f w_f·avgdl_f (the
        # global manifest carries per-field avgdl; per-part manifests
        # carry the raw sums)
        avgdl_c = (
            sum(w * self.avgdl_fields.get(nm, 0.0) for nm, w in zip(names, weights))
            or 1.0
        )
        idf = np.asarray(bm25_idf(df_u, self.n_docs), dtype=np.float64)
        cand_ids, cand_sc, cand_keys = [], [], []
        for s in self.segments:
            ids, sc = score_segment_combined(
                s, terms, names, weights, idf, avgdl_c, self.k1, self.b
            )
            if ids.size == 0:
                continue
            if ids.size > k:
                kth = -np.partition(-sc, k - 1)[k - 1]
                sel = np.flatnonzero(sc >= kth)
                ids, sc = ids[sel], sc[sel]
            cand_ids.append(ids)
            cand_sc.append(sc)
            cand_keys.append(s.keys_for(ids))
        if not cand_ids:
            return empty
        ids = np.concatenate(cand_ids)
        sc = np.concatenate(cand_sc)
        keys = np.concatenate(cand_keys)
        order = np.lexsort((ids, -sc))[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, 1 + order.size, dtype=np.int64),
                "doc_id": ids[order],
                "key": keys[order],
                "score": sc[order],
            }
        )

    def multi_match(
        self,
        text: str,
        fields: list[str],
        lang: str | None = None,
        k: int = 10,
        offset: int = 0,
    ) -> pd.DataFrame:
        """ES multi_match type=most_fields: per-field BM25 (each field's
        own df, idf, length norm and avgdl) SUMMED per doc.  Score
        contract: score = round6(Σ_f round6(bm25_f)) — each field score is
        rounded by score_segment, the sum re-rounded before ranking.

        Exact and pruning-free: per-field MaxScore thresholds cannot bound
        the cross-field SUM, so every field is scored exhaustively; a doc
        lives in exactly ONE segment, so summing inside the segment and
        merging per-segment top-k windows globally is exact."""
        empty = pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
        )
        base_terms = sorted(set(get_analyzer(lang).tokenize(text)))
        self.metrics["searches"] += 1
        if not base_terms:
            return empty
        per_field: list[tuple[str, list[str], np.ndarray]] = []
        for f in fields:
            terms_f = [f"{f}\x1f{t}" for t in base_terms]
            df = self.global_df(terms_f)
            keep = df > 0
            kept = [t for t, m in zip(terms_f, keep) if m]
            if not kept:
                continue
            per_field.append((f, kept, bm25_idf(df[keep], self.n_docs)))
        if not per_field:
            return empty
        keff = k + offset
        cand_ids, cand_scores, cand_keys = [], [], []
        for s in self.segments:
            ids_list, sc_list = [], []
            for f, terms_f, idf in per_field:
                ids, sc = self._score_segment(
                    s, terms_f, idf, None, dl_field=f, avgdl=self.avgdl_fields[f]
                )
                if ids.size:
                    ids_list.append(ids)
                    sc_list.append(sc)
            if not ids_list:
                continue
            all_ids = np.concatenate(ids_list)
            u, inv = np.unique(all_ids, return_inverse=True)
            acc = np.zeros(u.size, dtype=np.float64)
            np.add.at(acc, inv, np.concatenate(sc_list))
            acc = np.asarray(round6(acc))
            if u.size > keff:
                kth = -np.partition(-acc, keff - 1)[keff - 1]
                sel = np.flatnonzero(acc >= kth)
                u, acc = u[sel], acc[sel]
            cand_ids.append(u)
            cand_scores.append(acc)
            cand_keys.append(s.keys_for(u))
        if not cand_ids:
            return empty
        ids = np.concatenate(cand_ids)
        scores = np.concatenate(cand_scores)
        keys = np.concatenate(cand_keys)
        order = np.lexsort((ids, -scores))[offset : offset + k]
        return pd.DataFrame(
            {
                "rank": np.arange(offset + 1, offset + 1 + order.size, dtype=np.int64),
                "doc_id": ids[order],
                "key": keys[order],
                "score": scores[order],
            }
        )

    def search_bool(
        self,
        must: list[str] | tuple[str, ...] = (),
        should: list[str] | tuple[str, ...] = (),
        must_not: str | None = None,
        minimum_should_match: int | None = None,
        lang: str | None = None,
        k: int = 10,
        offset: int = 0,
    ) -> pd.DataFrame:
        """ES bool query: multiple match clauses.  A doc must match EVERY
        ``must`` clause (a clause matches when any of its analyzed terms
        hits — match operator=or), at least ``minimum_should_match`` of
        the ``should`` clauses (ES default: 0 when must clauses exist,
        else 1), and no ``must_not`` term.  Score = round6(Σ over matched
        must+should clauses of round6(clause BM25)) — the multi_match sum
        contract.  Exact and pruning-free (clause thresholds cannot bound
        the cross-clause sum); per-segment sums + global top-k merge stay
        exact because a doc lives in one segment."""
        empty = pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
        )
        self.metrics["searches"] += 1
        plan = self._bool_plan(must, should, must_not, minimum_should_match, lang)
        if plan is None:
            return empty
        keff = k + offset
        cand_ids, cand_scores, cand_keys = [], [], []
        for s in self.segments:
            u, acc = score_segment_bool(
                s, plan["must"], plan["should"], plan["mn_terms"], plan["msm"],
                self.avgdl, self.k1, self.b,
            )
            if u.size == 0:
                continue
            if u.size > keff:
                kth = -np.partition(-acc, keff - 1)[keff - 1]
                sel = np.flatnonzero(acc >= kth)
                u, acc = u[sel], acc[sel]
            cand_ids.append(u)
            cand_scores.append(acc)
            cand_keys.append(s.keys_for(u))
        if not cand_ids:
            return empty
        ids = np.concatenate(cand_ids)
        scores = np.concatenate(cand_scores)
        keys = np.concatenate(cand_keys)
        order = np.lexsort((ids, -scores))[offset : offset + k]
        return pd.DataFrame(
            {
                "rank": np.arange(offset + 1, offset + 1 + order.size, dtype=np.int64),
                "doc_id": ids[order],
                "key": keys[order],
                "score": scores[order],
            }
        )

    def _bool_plan(
        self,
        must,
        should,
        must_not: str | None,
        minimum_should_match: int | None,
        lang: str | None,
    ) -> dict | None:
        """Analyze bool clauses against the global dictionary -> plan dict
        ({"must": [(terms, idf)], "should": [...], "msm", "mn_terms"}) or
        None when the query can match nothing (an all-absent must clause,
        or fewer live should clauses than minimum_should_match with no
        must)."""
        def prep(texts):
            out = []
            for t in texts:
                terms = sorted(set(get_analyzer(lang).tokenize(t)))
                if not terms:
                    out.append(None)
                    continue
                df = self.global_df(terms)
                kept = [x for x, m in zip(terms, df > 0) if m]
                out.append(
                    (kept, np.asarray(bm25_idf(df[df > 0], self.n_docs), dtype=np.float64))
                    if kept
                    else None
                )
            return out
        must_p = prep(must)
        if any(p is None for p in must_p):
            return None  # a must clause that can't match anything
        should_p = [p for p in prep(should) if p is not None]
        msm = minimum_should_match
        if msm is None:
            msm = 0 if must_p else 1  # the ES default
        if not must_p and (not should_p or len(should_p) < msm):
            return None
        if must_p and msm > len(should_p):
            return None
        mn_terms = (
            sorted(set(get_analyzer(lang).tokenize(must_not))) if must_not else None
        )
        return {"must": must_p, "should": should_p, "msm": int(msm), "mn_terms": mn_terms}

    def matching_ids(
        self, text: str, lang: str | None = None, operator: str = "or",
        filter_lang: str | None = None,
    ) -> dict[int, np.ndarray]:
        """ALL live doc ids matching the analyzed query (no top-k cap) —
        the ES _count / delete_by_query match set.  Returns
        {segment_part_id: sorted doc ids}."""
        terms = sorted(set(get_analyzer(lang).tokenize(text)))
        out: dict[int, np.ndarray] = {}
        if not terms:
            return out
        for s in self.segments:
            ids = segment_matching_ids(s, terms, operator == "and", filter_lang)
            if ids.size:
                out[s.part_id] = ids
        return out

    def count(
        self, text: str, lang: str | None = None, operator: str = "or",
        filter_lang: str | None = None,
    ) -> int:
        """ES _count API analog: number of live docs matching the query."""
        return int(sum(ids.size for ids in self.matching_ids(text, lang, operator, filter_lang).values()))

    def explain(self, text: str, key: str, lang: str | None = None) -> pd.DataFrame:
        """ES _explain analog: the per-term BM25 breakdown for one
        (query, document) pair.  Returns DataFrame(term, df, idf, tf, dl,
        tf_part, contribution) over the MATCHED terms (contribution =
        idf * tf_part); accumulating the contributions in ascending term
        order and rounding to 6dp reproduces the doc's search score
        exactly (the determinism contract — asserted in tests).  Empty
        frame when the key is missing/deleted or matches no term."""
        empty = pd.DataFrame(
            {
                "term": pd.Series([], dtype=object),
                "df": pd.Series([], dtype=np.int64),
                "idf": pd.Series([], dtype=np.float64),
                "tf": pd.Series([], dtype=np.int64),
                "dl": pd.Series([], dtype=np.int64),
                "tf_part": pd.Series([], dtype=np.float64),
                "contribution": pd.Series([], dtype=np.float64),
            }
        )
        terms = sorted(set(get_analyzer(lang).tokenize(text)))
        if not terms:
            return empty
        # newest live version of the key across segments (mget rule)
        want = np.asarray([key], dtype=object)
        best: tuple[int, Segment] | None = None
        for s in self.segments:
            rows, _ = s.find_keys(want)
            for r in rows:
                did = int(s.doc_ids_store[r])
                if s.tombstones is not None and s.tombstones.size:
                    p = int(np.searchsorted(s.tombstones, did))
                    if p < s.tombstones.size and int(s.tombstones[p]) == did:
                        continue
                if best is None or did > best[0]:
                    best = (did, s)
        if best is None:
            return empty
        doc_id, seg = best
        df = self.global_df(terms)
        idf = bm25_idf(df, self.n_docs)
        cand = np.array([doc_id], dtype=np.int64)
        rows_out = []
        for i, t in enumerate(terms):
            ti = seg.lookup(t)
            if ti < 0:
                continue
            hit, tf, dl = seg.lookup_postings(ti, cand)
            if not hit[0]:
                continue
            tfp = float(
                bm25_tf_part(
                    tf.astype(np.int64), dl.astype(np.int64),
                    self.avgdl, self.k1, self.b,
                )[0]
            )
            rows_out.append(
                (t, int(df[i]), float(idf[i]), int(tf[0]), int(dl[0]), tfp,
                 float(idf[i]) * tfp)
            )
        if not rows_out:
            return empty
        return pd.DataFrame(
            rows_out,
            columns=["term", "df", "idf", "tf", "dl", "tf_part", "contribution"],
        )

    def field_caps(self) -> pd.DataFrame:
        """ES _field_caps analog: every mapped field with its type and
        capabilities, straight from the manifest's recorded mappings.
        Returns (field, type, searchable, aggregatable) sorted by field."""
        mp = self.manifest.get("mappings", {})
        rows = [("text", "text", True, False), ("lang", "keyword", True, True)]
        for f in mp.get("text_fields") or []:
            rows.append((f, "text", True, False))
        for f in mp.get("keyword_cols") or []:
            rows.append((f, "keyword", True, True))
        for f in mp.get("numeric_cols") or []:
            rows.append((f, "double", True, True))
        out = pd.DataFrame(
            rows, columns=["field", "type", "searchable", "aggregatable"]
        )
        return out.sort_values("field", kind="mergesort").reset_index(drop=True)

    def highlight(
        self, text: str, key: str, *,
        fragment_size: int = 100, num_fragments: int = 3, lang: str | None = None,
    ) -> list[str]:
        """ES multi-fragment highlight for one stored doc: up to
        ``num_fragments`` <em>-marked snippets chosen by distinct-term
        coverage (see make_fragments).  Requires store_text=True; empty
        list when the key is missing/deleted or nothing matches."""
        terms = sorted(set(get_analyzer(lang).tokenize(text)))
        if not terms:
            return []
        want = np.asarray([key], dtype=object)
        best: tuple[int, Segment] | None = None
        for s in self.segments:
            rows, _ = s.find_keys(want)
            for r in rows:
                did = int(s.doc_ids_store[r])
                if s.tombstones is not None and s.tombstones.size:
                    p = int(np.searchsorted(s.tombstones, did))
                    if p < s.tombstones.size and int(s.tombstones[p]) == did:
                        continue
                if best is None or did > best[0]:  # newest live version
                    best = (did, s)
        if best is None:
            return []
        doc_text = best[1].texts_for(np.array([best[0]], dtype=np.int64))[0]
        return make_fragments(
            doc_text or "", terms,
            fragment_size=fragment_size, num_fragments=num_fragments,
        )

    def termvectors(self, key: str, lang: str | None = None) -> pd.DataFrame:
        """ES _termvectors analog: per-term statistics for one stored
        document — term frequency in the doc (re-analyzed from the stored
        _source, the ES realtime path), global document frequency, and
        the term's first position.  Requires store_text=True.  Returns
        DataFrame(term, tf, df, first_pos) sorted by term; empty when the
        key is missing or deleted."""
        empty = pd.DataFrame(
            {
                "term": pd.Series([], dtype=object),
                "tf": pd.Series([], dtype=np.int64),
                "df": pd.Series([], dtype=np.int64),
                "first_pos": pd.Series([], dtype=np.int64),
            }
        )
        want = np.asarray([key], dtype=object)
        best: tuple[int, Segment, int] | None = None
        for s in self.segments:
            rows, _ = s.find_keys(want)
            for r in rows:
                did = int(s.doc_ids_store[r])
                if s.tombstones is not None and s.tombstones.size:
                    p = int(np.searchsorted(s.tombstones, did))
                    if p < s.tombstones.size and int(s.tombstones[p]) == did:
                        continue
                if best is None or did > best[0]:
                    best = (did, s, int(r))
        if best is None:
            return empty
        _, seg, row = best
        text = seg.texts_for(np.array([best[0]], dtype=np.int64))[0]
        lang_d = seg.langs_for(np.array([best[0]], dtype=np.int64))[0]
        toks = get_analyzer(lang if lang is not None else lang_d).tokenize(text or "")
        if not toks:
            return empty
        arr = np.asarray(toks, dtype=object)
        terms, first_idx, tf = np.unique(arr, return_index=True, return_counts=True)
        df = self.global_df(list(terms))
        return pd.DataFrame(
            {
                "term": terms,
                "tf": tf.astype(np.int64),
                "df": df.astype(np.int64),
                "first_pos": first_idx.astype(np.int64),
            }
        )

    def prefix_matching_ids(
        self, prefix: str, filter_lang: str | None = None,
        max_expansions: int | None = None,
    ) -> dict[int, np.ndarray]:
        """ES prefix query match set: docs containing ANY term starting
        with ``prefix`` (sorted-dictionary range expansion).  Returns
        {segment_part_id: sorted doc ids}."""
        out: dict[int, np.ndarray] = {}
        for s in self.segments:
            ids = segment_prefix_matching_ids(
                s, prefix, filter_lang, max_expansions=max_expansions
            )
            if ids.size:
                out[s.part_id] = ids
        return out

    def phrase_prefix_count(
        self, text: str, lang: str | None = None,
        filter_lang: str | None = None, max_expansions: int | None = None,
    ) -> int:
        """ES match_phrase_prefix count (autocomplete): the analyzed
        text's last token is a prefix, earlier tokens must precede it
        adjacently in order.  Requires a positions index."""
        toks = get_analyzer(lang).tokenize(text)
        if not toks:
            return 0
        return int(
            sum(
                segment_phrase_prefix_matching_ids(
                    s, toks[:-1], toks[-1], filter_lang,
                    max_expansions=max_expansions,
                ).size
                for s in self.segments
            )
        )

    def fuzzy_count(self, term: str, filter_lang: str | None = None) -> int:
        """Number of live docs matching an ES fuzzy query (fuzziness=1:
        any dictionary term within edit distance 1 of ``term``)."""
        return int(
            sum(
                segment_fuzzy_matching_ids(s, term, filter_lang).size
                for s in self.segments
            )
        )

    def wildcard_count(
        self, pattern: str, filter_lang: str | None = None,
        max_expansions: int | None = None,
    ) -> int:
        """Number of live docs matching an ES wildcard query (single-`*`
        pre*suf pattern; see segment_wildcard_matching_ids)."""
        return int(
            sum(
                segment_wildcard_matching_ids(
                    s, pattern, filter_lang, max_expansions=max_expansions
                ).size
                for s in self.segments
            )
        )

    def regexp_count(
        self, pattern: str, filter_lang: str | None = None,
        max_expansions: int | None = None,
    ) -> int:
        """Number of live docs matching an ES regexp query (anchored RE2
        dictionary expansion; see segment_regexp_matching_ids)."""
        return int(
            sum(
                segment_regexp_matching_ids(
                    s, pattern, filter_lang, max_expansions=max_expansions
                ).size
                for s in self.segments
            )
        )

    def prefix_count(
        self, prefix: str, filter_lang: str | None = None,
        max_expansions: int | None = None,
    ) -> int:
        """Number of live docs matching an ES prefix query."""
        return int(
            sum(
                ids.size
                for ids in self.prefix_matching_ids(
                    prefix, filter_lang, max_expansions
                ).values()
            )
        )

    def search_sorted(
        self,
        text: str,
        sort_field: str,
        *,
        ascending: bool = False,
        k: int = 10,
        lang: str | None = None,
        operator: str = "or",
        filter_lang: str | None = None,
        filter_range: list[tuple] | None = None,
    ) -> pd.DataFrame:
        """ES sort-by-field: docs matching the analyzed query ranked by a
        numeric docstore field (cfg.numeric_cols) instead of BM25 score —
        the ES ``sort: [{field: order}]`` analog.  Ties break doc_id asc;
        docs with a missing value (NaN) are excluded (documented delta
        from ES's missing:_last — a bounded top-k never reaches them).
        ``sort_field`` may also be an ES runtime field ``"name=expr"``
        (the whitelisted painless-expression subset over mapped numeric
        docvalues; missing inputs read 0.0, so runtime values are never
        NaN-dropped).  Returns (rank, doc_id, key, sort_val)."""
        _, rt_expr = _split_fetch_field(sort_field)
        if rt_expr is not None:
            _script_fields(rt_expr)  # whitelist gate before any segment work
        isort = self.manifest.get("mappings", {}).get("index_sort")
        # ES index-sorting early termination: when the index layout IS
        # this sort (field + direction), ascending doc_id == sort order
        # inside every segment (missing values past every real one), so
        # the per-segment top-k is simply the FIRST k matching docs — no
        # full match-set docvalue gather
        fast = (
            rt_expr is None
            and isort is not None
            and isort[0] == sort_field
            and (isort[1] == "desc") == (not ascending)
        )
        terms = sorted(set(get_analyzer(lang).tokenize(text)))
        empty = pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "sort_val": pd.Series([], dtype=np.float64),
            }
        )
        if not terms:
            return empty
        cand_ids, cand_vals, cand_keys = [], [], []
        for s in self.segments:
            ids = segment_matching_ids(
                s, terms, operator == "and", filter_lang, filter_range
            )
            if ids.size == 0:
                continue
            if fast and ids.size > k:
                ids = ids[:k]  # early termination (layout == sort order)
            vals = (
                _script_values(s, ids, rt_expr)
                if rt_expr is not None
                else s.nums_for(sort_field, ids)
            )
            ok = ~np.isnan(vals)
            ids, vals = ids[ok], vals[ok]
            if ids.size == 0:
                continue
            if ids.size > k:
                # per-segment partial top-k; keep ties with the k-th
                # value so the global merge stays exact
                vv = vals if ascending else -vals
                kth = np.partition(vv, k - 1)[k - 1]
                sel = vv <= kth
                ids, vals = ids[sel], vals[sel]
            cand_ids.append(ids)
            cand_vals.append(vals)
            cand_keys.append(s.keys_for(ids))
        if not cand_ids:
            return empty
        ids = np.concatenate(cand_ids)
        vals = np.concatenate(cand_vals)
        keys = np.concatenate(cand_keys)
        order = np.lexsort((ids, vals if ascending else -vals))[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, 1 + order.size, dtype=np.int64),
                "doc_id": ids[order],
                "key": keys[order],
                "sort_val": vals[order],
            }
        )

    def knn(
        self,
        vec,
        field: str,
        k: int = 10,
        filter_kw: list[tuple] | None = None,
    ) -> pd.DataFrame:
        """Single-process exact kNN over a dense_vector mapped field —
        the in-process mirror of run_knn (same float64 cosine, round6
        before ranking, ties doc_id asc; tombstoned and vectorless docs
        excluded).  Returns (rank, doc_id, key, score)."""
        qv = np.asarray(vec, dtype=np.float64)
        qn = np.linalg.norm(qv)
        qv = qv / (qn if qn else 1.0)
        cand_ids, cand_sc, cand_keys = [], [], []
        for s in self.segments:
            rows, mat = s.vectors_for(field)
            if not rows.size:
                continue
            ids = s.doc_ids_store[rows]
            if s.tombstones is not None and s.tombstones.size and ids.size:
                pos = np.minimum(
                    np.searchsorted(s.tombstones, ids), s.tombstones.size - 1
                )
                alive = s.tombstones[pos] != ids
                ids, mat = ids[alive], mat[alive]
            if filter_kw:
                keep = np.ones(ids.size, dtype=bool)
                for fld, val in filter_kw:
                    got = s.field_for(fld, ids)
                    keep &= (
                        got == val if isinstance(val, str) else np.isin(got, val)
                    )
                ids, mat = ids[keep], mat[keep]
            if not ids.size:
                continue
            m64 = mat.astype(np.float64)
            nrm = np.linalg.norm(m64, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            sims = np.floor((m64 / nrm) @ qv * 1e6 + 0.5) / 1e6
            if ids.size > k:
                kth = -np.partition(-sims, k - 1)[k - 1]
                sel = np.flatnonzero(sims >= kth)
                ids, sims = ids[sel], sims[sel]
            cand_ids.append(ids)
            cand_sc.append(sims)
            cand_keys.append(s.keys_for(ids))
        if not cand_ids:
            return pd.DataFrame(
                {
                    "rank": pd.Series([], dtype=np.int64),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "key": pd.Series([], dtype=object),
                    "score": pd.Series([], dtype=np.float64),
                }
            )
        ids = np.concatenate(cand_ids)
        sc = np.concatenate(cand_sc)
        keys = np.concatenate(cand_keys)
        order = np.lexsort((ids, -sc))[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, 1 + order.size, dtype=np.int64),
                "doc_id": ids[order],
                "key": keys[order],
                "score": sc[order],
            }
        )

    def get(self, keys: list[str]) -> pd.DataFrame:
        """ES _mget analog: fetch live docs by external key (url/_id).
        Returns (key, doc_id, lang, found[, text if store_text]); a key's
        LIVE version is the highest non-tombstoned doc_id holding it.

        The routing invariant (key -> one partition) restricts the scan:
        only segments whose MANIFEST-recorded partition set covers a
        wanted key's partition are touched — point lookups never scan
        the whole index.  (Pruning must use the manifest records, not
        doc_id ranges: indexes built with an external id_col have
        arbitrary ids that carry no partition information.  Docs
        ingested with an explicit routing key different from the doc key
        are not reachable here — same as ES GET without a routing
        parameter.)"""
        want = np.asarray(list(keys), dtype=object)
        P = int(self.manifest.get("num_partitions", 1))
        want_parts = set(int(p) for p in route_partition(want, P))
        pm = self.manifest.get("part_manifests", {})
        best: dict[str, tuple[int, dict]] = {}
        for sid, s in zip(self.manifest["parts"], self.segments):
            m = pm.get(str(sid), {})
            covered = (
                set(int(x) for x in m["partitions"])
                if "partitions" in m
                else {int(m.get("partition", int(sid)))}
            )
            if not (covered & want_parts):
                continue  # no wanted key routes into this segment
            # sorted-key-hash binary search (never an O(n_docs) key scan)
            rows, _ = s.find_keys(want)
            if rows.size == 0:
                continue
            ids = s.doc_ids_store[rows]
            if s.tombstones is not None and s.tombstones.size:
                pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
                alive = s.tombstones[pos] != ids
            else:
                alive = np.ones(ids.size, dtype=bool)
            rows = rows[alive]
            ids = ids[alive]
            ks = s._take_str(s.keys_arr, rows)
            langs = s._take_str(s.langs_arr, rows)
            texts = (
                s._take_str(s.texts_arr, rows)
                if s.texts_arr is not None
                else [None] * ids.size
            )
            for k_, d_, l_, t_ in zip(ks, ids, langs, texts):
                prev = best.get(k_)
                if prev is None or int(d_) > prev[0]:
                    best[k_] = (int(d_), {"lang": l_, "text": t_})
        rows = []
        for k_ in keys:
            b = best.get(k_)
            rows.append(
                {
                    "key": k_,
                    "doc_id": b[0] if b else -1,
                    "lang": b[1]["lang"] if b else None,
                    "found": b is not None,
                    "text": b[1]["text"] if b else None,
                }
            )
        out = pd.DataFrame(rows, columns=["key", "doc_id", "lang", "found", "text"])
        if all(t is None for t in out["text"]):
            out = out.drop(columns=["text"])
        return out.astype({"doc_id": np.int64, "found": bool})

    def search_phrase(
        self,
        text: str,
        lang: str | None = None,
        k: int = 10,
        slop: int = 0,
        field: str | None = None,
    ) -> pd.DataFrame:
        """ES match_phrase analog (slop=0): docs containing the analyzed
        terms at consecutive positions.  Requires an index built with
        cfg.index_positions=True.

        Scoring (Lucene PhraseQuery-shaped, frozen + mirrored by the SQL
        oracle): idf = Σ over phrase positions of bm25_idf(df(term_i))
        (repeats counted); tf = number of phrase occurrences in the doc;
        score = round6(idf * tf_part(tf, dl)); tie-break (score desc,
        doc_id asc).

        ``field`` (multi-field index): the phrase must occur inside that
        mapped field; norms use the field's own length + avgdl."""
        phrase = get_analyzer(lang).tokenize(text)
        avgdl_use = self.avgdl
        if field is not None:
            phrase = [f"{field}\x1f{t}" for t in phrase]
            avgdl_use = self.avgdl_fields[field]
        empty = pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
        )
        if not phrase:
            return empty
        uniq = sorted(set(phrase))
        df = self.global_df(uniq)
        df_map = dict(zip(uniq, df))
        if any(df_map[t] == 0 for t in phrase):
            return empty  # a globally-absent term can't appear in a phrase
        idf_map = dict(zip(uniq, bm25_idf(df, self.n_docs)))
        idf_sum = float(sum(idf_map[t] for t in phrase))

        parts = [
            score_segment_phrase(
                s, phrase, idf_sum, avgdl_use, self.k1, self.b, slop, dl_field=field
            )
            for s in self.segments
        ]
        ids = np.concatenate([p[0] for p in parts]) if parts else np.array([], dtype=np.int64)
        scores = np.concatenate([p[1] for p in parts]) if parts else np.array([])
        if ids.size == 0:
            return empty
        order = np.lexsort((ids, -scores))[:k]
        top = ids[order]
        keys = np.empty(top.size, dtype=object)
        for s in self.segments:
            in_seg = np.isin(top, s.doc_ids_store) if s.n_docs else np.zeros(top.size, bool)
            if in_seg.any():
                keys[in_seg] = s.keys_for(top[in_seg])
        return pd.DataFrame(
            {
                "rank": np.arange(1, top.size + 1, dtype=np.int64),
                "doc_id": top,
                "key": keys,
                "score": scores[order],
            }
        )

    def search_span_near(
        self,
        text: str,
        lang: str | None = None,
        k: int = 10,
        slop: int = 0,
        field: str | None = None,
        first_end: int | None = None,
    ) -> pd.DataFrame:
        """ES span_near with in_order=true (span_term clauses from the
        analyzed text): docs containing the terms in order with total
        gap count <= slop.  ``first_end`` wraps the chain in an ES
        span_first envelope (the span must end before that token
        position).  Requires cfg.index_positions=True.  Scoring follows
        the phrase convention (idf = Σ bm25_idf over clause positions,
        tf = chain-starting anchors); tie-break (score desc, doc_id
        asc)."""
        terms = get_analyzer(lang).tokenize(text)
        avgdl_use = self.avgdl
        if field is not None:
            terms = [f"{field}\x1f{t}" for t in terms]
            avgdl_use = self.avgdl_fields[field]
        empty = pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
        )
        if not terms:
            return empty
        uniq = sorted(set(terms))
        df = self.global_df(uniq)
        df_map = dict(zip(uniq, df))
        if any(df_map[t] == 0 for t in terms):
            return empty
        idf_map = dict(zip(uniq, bm25_idf(df, self.n_docs)))
        idf_sum = float(sum(idf_map[t] for t in terms))
        parts = [
            score_segment_span_near(
                s, terms, idf_sum, avgdl_use, self.k1, self.b, slop,
                dl_field=field, first_end=first_end,
            )
            for s in self.segments
        ]
        ids = np.concatenate([p[0] for p in parts]) if parts else np.array([], dtype=np.int64)
        scores = np.concatenate([p[1] for p in parts]) if parts else np.array([])
        if ids.size == 0:
            return empty
        order = np.lexsort((ids, -scores))[:k]
        top = ids[order]
        keys = np.empty(top.size, dtype=object)
        for s in self.segments:
            in_seg = np.isin(top, s.doc_ids_store) if s.n_docs else np.zeros(top.size, bool)
            if in_seg.any():
                keys[in_seg] = s.keys_for(top[in_seg])
        return pd.DataFrame(
            {
                "rank": np.arange(1, top.size + 1, dtype=np.int64),
                "doc_id": top,
                "key": keys,
                "score": scores[order],
            }
        )

    def search_intervals(
        self,
        text: str,
        lang: str | None = None,
        k: int = 10,
        max_gaps: int = 0,
        field: str | None = None,
    ) -> pd.DataFrame:
        """ES intervals query (all_of, ordered=false, max_gaps): docs
        where some window holds every unique analyzed term, any order,
        with total gaps <= max_gaps.  Requires cfg.index_positions=True.
        Scoring follows the phrase convention (idf = Σ bm25_idf over
        unique terms, tf = valid minimal-window ends); tie-break
        (score desc, doc_id asc)."""
        terms = sorted(set(get_analyzer(lang).tokenize(text)))
        avgdl_use = self.avgdl
        if field is not None:
            terms = [f"{field}\x1f{t}" for t in terms]
            avgdl_use = self.avgdl_fields[field]
        empty = pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
        )
        if not terms:
            return empty
        df = self.global_df(terms)
        df_map = dict(zip(terms, df))
        if any(df_map[t] == 0 for t in terms):
            return empty
        idf_sum = float(sum(bm25_idf(df, self.n_docs)))
        parts = [
            score_segment_intervals(
                s, terms, idf_sum, avgdl_use, self.k1, self.b, max_gaps,
                dl_field=field,
            )
            for s in self.segments
        ]
        ids = np.concatenate([p[0] for p in parts]) if parts else np.array([], dtype=np.int64)
        scores = np.concatenate([p[1] for p in parts]) if parts else np.array([])
        if ids.size == 0:
            return empty
        order = np.lexsort((ids, -scores))[:k]
        top = ids[order]
        keys = np.empty(top.size, dtype=object)
        for s in self.segments:
            in_seg = np.isin(top, s.doc_ids_store) if s.n_docs else np.zeros(top.size, bool)
            if in_seg.any():
                keys[in_seg] = s.keys_for(top[in_seg])
        return pd.DataFrame(
            {
                "rank": np.arange(1, top.size + 1, dtype=np.int64),
                "doc_id": top,
                "key": keys,
                "score": scores[order],
            }
        )

    def agg_terms(
        self, text: str, field: str = "lang", lang: str | None = None,
        operator: str = "or",
    ) -> pd.DataFrame:
        """ES terms-aggregation analog over the query's match set: count
        of matching live docs per value of a docstore keyword field —
        'lang' (built-in) or any cfg.keyword_cols field.  Returns
        (value, n_docs) sorted by (n_docs desc, value asc) — the ES
        bucket order."""
        counts: dict[str, int] = {}
        by_seg = self.matching_ids(text, lang, operator)
        for s in self.segments:
            ids = by_seg.get(s.part_id)
            if ids is None:
                continue
            vals, n = np.unique(s.field_for(field, ids), return_counts=True)
            for v, c in zip(vals, n):
                counts[str(v)] = counts.get(str(v), 0) + int(c)
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return pd.DataFrame(
            {
                "value": pd.Series([k for k, _ in items], dtype=object),
                "n_docs": pd.Series([v for _, v in items], dtype=np.int64),
            }
        )

    def agg_stats(
        self, text: str, field: str, lang: str | None = None,
        operator: str = "or", filter_lang: str | None = None,
    ) -> dict:
        """ES stats aggregation over the query's match set: count / min /
        max / sum / avg of a numeric-mapped field (missing values
        excluded, ES semantics)."""
        terms = sorted(set(get_analyzer(lang).tokenize(text)))
        n, tot, mn, mx = 0, 0.0, np.inf, -np.inf
        for s in self.segments:
            ids = segment_matching_ids(s, terms, operator == "and", filter_lang)
            if ids.size == 0:
                continue
            vals = s.nums_for(field, ids)
            vals = vals[~np.isnan(vals)]
            if vals.size == 0:
                continue
            n += int(vals.size)
            tot += float(vals.sum())
            mn = min(mn, float(vals.min()))
            mx = max(mx, float(vals.max()))
        if n == 0:
            return {"count": 0, "min": None, "max": None, "sum": 0.0, "avg": None}
        return {"count": n, "min": mn, "max": mx, "sum": tot, "avg": tot / n}

    def agg_histogram(
        self, text: str, field: str, interval: float, lang: str | None = None,
        operator: str = "or", filter_lang: str | None = None,
    ) -> pd.DataFrame:
        """ES histogram aggregation: fixed-interval buckets
        (key = floor(val/interval)*interval) over the match set's numeric
        field.  Returns (bucket, n_docs) sorted by bucket asc; empty
        buckets omitted (ES min_doc_count=1)."""
        terms = sorted(set(get_analyzer(lang).tokenize(text)))
        acc: dict[float, int] = {}
        for s in self.segments:
            ids = segment_matching_ids(s, terms, operator == "and", filter_lang)
            if ids.size == 0:
                continue
            vals = s.nums_for(field, ids)
            vals = vals[~np.isnan(vals)]
            if vals.size == 0:
                continue
            buckets = np.floor(vals / interval) * interval
            ub, cnt = np.unique(buckets, return_counts=True)
            for b_, c_ in zip(ub, cnt):
                acc[float(b_)] = acc.get(float(b_), 0) + int(c_)
        return pd.DataFrame(
            {
                "bucket": pd.Series(sorted(acc), dtype=np.float64),
                "n_docs": pd.Series([acc[b_] for b_ in sorted(acc)], dtype=np.int64),
            }
        )

    def search_batch(self, queries: pd.DataFrame, prune: bool = True) -> pd.DataFrame:
        """queries: (query_id, text, lang?, k?) -> stacked top-k rows."""
        out = []
        for row in queries.itertuples(index=False):
            k = int(getattr(row, "k", 10) or 10)
            lang = getattr(row, "lang", None)
            mn = getattr(row, "must_not", None)
            res = self.search(
                row.text,
                lang=lang,
                k=k,
                prune=prune,
                operator=getattr(row, "operator", None) or "or",
                filter_lang=getattr(row, "filter_lang", None),
                must_not=None if (mn is None or (isinstance(mn, float) and pd.isna(mn))) else mn,
            )
            res.insert(0, "query_id", np.int64(row.query_id))
            out.append(res)
        if not out:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int64),
                    "rank": pd.Series([], dtype=np.int64),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "key": pd.Series([], dtype=object),
                    "score": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(out, ignore_index=True)


def make_snippet(text: str, terms: list[str], window: int = 60) -> str:
    """ES-highlighter analog: a snippet of ``text`` around the first
    query-term occurrence, every term occurrence inside the window
    wrapped in <em></em>.  Case-insensitive whole-token matching against
    the analyzer's token alphabet; deterministic."""
    import re as _re

    if not text or not terms:
        return ""
    pat = _re.compile(
        r"(?<![a-z0-9])(" + "|".join(_re.escape(t) for t in sorted(terms)) + r")(?![a-z0-9])",
        _re.IGNORECASE,
    )
    m = pat.search(text)
    if m is None:
        return text[: 2 * window] + ("..." if len(text) > 2 * window else "")
    lo = max(0, m.start() - window)
    hi = min(len(text), m.end() + window)
    snippet = pat.sub(lambda g: f"<em>{g.group(0)}</em>", text[lo:hi])
    return ("..." if lo > 0 else "") + snippet + ("..." if hi < len(text) else "")


def make_fragments(
    text: str, terms: list[str], *, fragment_size: int = 100, num_fragments: int = 3
) -> list[str]:
    """ES multi-fragment highlighter: up to ``num_fragments`` snippets of
    ~``fragment_size`` chars, chosen GREEDILY by distinct-term coverage
    then earliest position (the ES fragment scorer's shape), matches
    wrapped in <em></em>.  Deterministic: candidate windows are anchored
    at match starts; ties break on position."""
    import re as _re

    if not text or not terms:
        return []
    pat = _re.compile(
        r"(?<![a-z0-9])(" + "|".join(_re.escape(t) for t in sorted(set(terms))) + r")(?![a-z0-9])",
        _re.IGNORECASE,
    )
    matches = [(m.start(), m.end(), m.group(0).lower()) for m in pat.finditer(text)]
    if not matches:
        return []
    half = max(1, fragment_size // 2)
    # candidate windows anchored at each match; score = distinct terms inside
    cands = []
    for i, (st_, en_, _t) in enumerate(matches):
        lo = max(0, st_ - half)
        hi = min(len(text), en_ + half)
        inside = {t for s2, e2, t in matches if s2 >= lo and e2 <= hi}
        cands.append((len(inside), -lo, lo, hi))
    chosen: list[tuple[int, int]] = []
    for _score, _neglo, lo, hi in sorted(cands, reverse=True):
        if len(chosen) >= num_fragments:
            break
        if any(not (hi <= c_lo or lo >= c_hi) for c_lo, c_hi in chosen):
            continue  # overlapping an already-chosen fragment
        chosen.append((lo, hi))
    out = []
    for lo, hi in sorted(chosen):
        frag = pat.sub(lambda g: f"<em>{g.group(0)}</em>", text[lo:hi])
        out.append(("..." if lo > 0 else "") + frag + ("..." if hi < len(text) else ""))
    return out


def segment_matching_ids(
    s: Segment,
    terms: list[str],
    require_all: bool = False,
    filter_lang: str | None = None,
    filter_ranges: list[tuple] | None = None,
    filter_kw: list[tuple] | None = None,
    filter_geo: tuple | None = None,
) -> np.ndarray:
    """ALL live doc ids in one segment matching the analyzed terms (no
    top-k cap) — the per-segment unit of the ES _count / terms-agg /
    delete_by_query match set.  Needs no global stats: a term absent from
    this segment simply contributes nothing (or, under AND, empties the
    segment's match set).

    ``filter_geo``: ES geo_distance filter (field, lat0, lon0, dist_m) —
    keeps docs whose {field}_lat/{field}_lon point lies within dist_m
    meters (round6 haversine) of the origin; missing points never match."""
    empty = np.array([], dtype=np.int64)
    if not terms:
        return empty
    tis = [s.lookup(t) for t in terms]
    present = [ti for ti in tis if ti >= 0]
    if not present or (require_all and len(present) < len(terms)):
        return empty
    lists = [s.postings_with_dl(ti)[0] for ti in present]
    if require_all:
        ids = lists[0]
        for lst in lists[1:]:
            ids = ids[np.isin(ids, lst, assume_unique=True)]
    else:
        ids = np.unique(np.concatenate(lists))
    if filter_lang is not None and ids.size:
        ids = ids[s.langs_for(ids) == filter_lang]
    if filter_ranges:
        for fld, lo, hi in filter_ranges:
            if not ids.size:
                break
            vals = s.nums_for(fld, ids)
            keep_r = ~np.isnan(vals)
            if lo is not None:
                keep_r &= vals >= lo
            if hi is not None:
                keep_r &= vals <= hi
            ids = ids[keep_r]
    if filter_kw:
        # ES bool filter term/terms clause ({"term(s)": {kw_field: v}})
        for fld, val in filter_kw:
            if not ids.size:
                break
            got = s.field_for(fld, ids)
            ids = ids[got == val if isinstance(val, str) else np.isin(got, val)]
    if filter_geo is not None and ids.size:
        ids = ids[_geo_keep(s, ids, filter_geo)]
    if s.tombstones is not None and s.tombstones.size and ids.size:
        pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
        ids = ids[s.tombstones[pos] != ids]
    return ids


def _geo_poly_keep(s: Segment, ids: np.ndarray, fp: tuple) -> np.ndarray:
    """Boolean keep-mask for the ES geo_polygon filter over a CONVEX
    polygon: the doc's ({field}_lat, {field}_lon) point must satisfy
    every half-plane test (cross product of each directed edge with the
    point, all matching the polygon's signed-area orientation; boundary
    inclusive).  PLANAR lat/lon arithmetic — the documented contract
    (exact-replicable in SQL), appropriate for region-scale polygons
    away from the antimeridian.  Missing coordinates never match."""
    fld, pts = fp
    lats = s.nums_for(f"{fld}_lat", ids)
    lons = s.nums_for(f"{fld}_lon", ids)
    keep = ~(np.isnan(lats) | np.isnan(lons))
    p = np.asarray(pts, dtype=np.float64)  # (n, 2) as (lat, lon)
    # signed area orientation (shoelace over (lon, lat) as (x, y))
    x, y = p[:, 1], p[:, 0]
    area2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    sign = 1.0 if area2 >= 0 else -1.0
    for i in range(len(p)):
        la1, lo1 = p[i]
        la2, lo2 = p[(i + 1) % len(p)]
        cross = (lo2 - lo1) * (lats - la1) - (la2 - la1) * (lons - lo1)
        keep &= sign * cross >= 0
    return keep


def _geo_keep(s: Segment, ids: np.ndarray, filter_geo: tuple) -> np.ndarray:
    """Boolean keep-mask for the ES geo_distance filter: round6 haversine
    from each doc's ({field}_lat, {field}_lon) point to the origin must
    be <= dist_m; docs missing either coordinate (NaN) never match."""
    fld, lat0, lon0, dist_m = filter_geo
    lats = s.nums_for(f"{fld}_lat", ids)
    lons = s.nums_for(f"{fld}_lon", ids)
    keep = ~(np.isnan(lats) | np.isnan(lons))
    if keep.any():
        d = haversine_m(lats[keep], lons[keep], lat0, lon0)
        sub = np.zeros(ids.size, dtype=bool)
        sub[np.flatnonzero(keep)[d <= float(dist_m)]] = True
        return sub
    return keep


def _geo_distance_vals(
    s: Segment, ids: np.ndarray, fld: str, lat0: float, lon0: float
) -> np.ndarray:
    """Per-doc round6 haversine meters from the geo field to the origin;
    NaN where either coordinate is missing (excluded like any missing
    numeric value) — the virtual field behind the ES geo_distance
    aggregation."""
    lats = s.nums_for(f"{fld}_lat", ids)
    lons = s.nums_for(f"{fld}_lon", ids)
    out = np.full(ids.size, np.nan, dtype=np.float64)
    ok = ~(np.isnan(lats) | np.isnan(lons))
    if ok.any():
        out[ok] = haversine_m(lats[ok], lons[ok], lat0, lon0)
    return out


def _geotile_vals(s: Segment, ids: np.ndarray, fld: str, zoom: int) -> np.ndarray:
    """Per-doc packed geotile cell key (x*2^zoom + y, float64-exact for
    zoom <= 26); NaN where the point is missing — the virtual field
    behind the ES geotile_grid aggregation."""
    lats = s.nums_for(f"{fld}_lat", ids)
    lons = s.nums_for(f"{fld}_lon", ids)
    out = np.full(ids.size, np.nan, dtype=np.float64)
    ok = ~(np.isnan(lats) | np.isnan(lons))
    if ok.any():
        x, y = geotile_xy(lats[ok], lons[ok], zoom)
        out[ok] = geotile_pack(x, y, zoom)
    return out


def _geohash_vals(
    s: Segment, ids: np.ndarray, fld: str, precision: int
) -> np.ndarray:
    """Per-doc packed geohash cell index (float64-exact for precision
    <= 10); NaN where the point is missing — the virtual field behind
    the ES geohash_grid aggregation."""
    lats = s.nums_for(f"{fld}_lat", ids)
    lons = s.nums_for(f"{fld}_lon", ids)
    out = np.full(ids.size, np.nan, dtype=np.float64)
    ok = ~(np.isnan(lats) | np.isnan(lons))
    if ok.any():
        out[ok] = geohash_cells(lats[ok], lons[ok], precision).astype(np.float64)
    return out


def segment_prefix_matching_ids(
    s: Segment,
    prefix: str,
    filter_lang: str | None = None,
    filter_ranges: list[tuple] | None = None,
    max_expansions: int | None = None,
) -> np.ndarray:
    """ES prefix query match set for ONE segment: union of the postings
    of every dictionary term starting with ``prefix`` (two binary
    searches over the sorted term dictionary — never a scan).
    ``max_expansions``: ES's expansion cap (first N terms in dictionary
    order); None = unbounded (ES rewrite=constant_score_blended)."""
    empty = np.array([], dtype=np.int64)
    if not prefix:
        return empty
    lo, hi = s.term_prefix_range(prefix)
    if max_expansions is not None:
        hi = min(hi, lo + max_expansions)
    if hi <= lo:
        return empty
    lists = [s.postings_with_dl(ti)[0] for ti in range(lo, hi)]
    ids = np.unique(np.concatenate(lists))
    if filter_lang is not None and ids.size:
        ids = ids[s.langs_for(ids) == filter_lang]
    if filter_ranges:
        for fld, lo_b, hi_b in filter_ranges:
            if not ids.size:
                break
            vals = s.nums_for(fld, ids)
            keep_r = ~np.isnan(vals)
            if lo_b is not None:
                keep_r &= vals >= lo_b
            if hi_b is not None:
                keep_r &= vals <= hi_b
            ids = ids[keep_r]
    if s.tombstones is not None and s.tombstones.size and ids.size:
        pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
        ids = ids[s.tombstones[pos] != ids]
    return ids


def segment_wildcard_matching_ids(
    s: Segment,
    pattern: str,
    filter_lang: str | None = None,
    filter_ranges: list[tuple] | None = None,
    max_expansions: int | None = None,
) -> np.ndarray:
    """ES wildcard query match set for ONE segment — single-`*` patterns
    `pre*suf`: the dictionary is pruned to the prefix's range (two binary
    searches), then the suffix is checked VECTORIZED (pyarrow ends_with)
    over only that range.  A leading-`*` pattern scans the whole
    dictionary (the ES wildcard anti-pattern — still vectorized, but
    O(n_terms); documented cost).  Terms shorter than |pre|+|suf| cannot
    match (the `*` spans >= 0 chars, never overlapping pre/suf)."""
    import pyarrow.compute as pc

    empty = np.array([], dtype=np.int64)
    if pattern.count("*") != 1:
        # no-star = exact term; multi-star unsupported (reject loudly)
        if "*" not in pattern:
            ti = s.lookup(pattern)
            if ti < 0:
                return empty
            tids = [ti]
        else:
            raise ValueError(f"wildcard supports exactly one '*': {pattern!r}")
    else:
        pre, suf = pattern.split("*", 1)
        lo, hi = s.term_prefix_range(pre) if pre else (0, len(s.terms_arr))
        if hi <= lo:
            return empty
        cand = s.terms_arr.slice(lo, hi - lo)
        keep = np.ones(hi - lo, dtype=bool)
        if suf:
            keep &= pc.ends_with(cand, suf).to_numpy(zero_copy_only=False)
            keep &= (
                pc.binary_length(cand).to_numpy(zero_copy_only=False)
                >= len(pre) + len(suf)
            )
        tids = (np.flatnonzero(keep) + lo).tolist()
        if max_expansions is not None:
            tids = tids[:max_expansions]
    if not tids:
        return empty
    ids = np.unique(np.concatenate([s.postings_with_dl(ti)[0] for ti in tids]))
    if filter_lang is not None and ids.size:
        ids = ids[s.langs_for(ids) == filter_lang]
    if filter_ranges:
        for fld, lo_b, hi_b in filter_ranges:
            if not ids.size:
                break
            vals = s.nums_for(fld, ids)
            keep_r = ~np.isnan(vals)
            if lo_b is not None:
                keep_r &= vals >= lo_b
            if hi_b is not None:
                keep_r &= vals <= hi_b
            ids = ids[keep_r]
    if s.tombstones is not None and s.tombstones.size and ids.size:
        pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
        ids = ids[s.tombstones[pos] != ids]
    return ids


def _regexp_literal_prefix(pattern: str) -> str:
    """Longest literal prefix of a regexp (chars before the first
    metachar; a quantifier right after the last literal char quantifies
    it, so that char is dropped) — the ES/Lucene trick that prunes the
    dictionary scan to a prefix range."""
    meta = set(".^$*+?()[]{}|\\")
    out = []
    i = 0
    while i < len(pattern) and pattern[i] not in meta:
        out.append(pattern[i])
        i += 1
    if i < len(pattern) and pattern[i] in "*+?{" and out:
        out.pop()
    return "".join(out)


def segment_regexp_matching_ids(
    s: Segment,
    pattern: str,
    filter_lang: str | None = None,
    filter_ranges: list[tuple] | None = None,
    max_expansions: int | None = None,
) -> np.ndarray:
    """ES regexp query match set for ONE segment: union of the postings
    of every dictionary term fully matching ``pattern`` (anchored, RE2
    syntax — pyarrow's regex engine; DuckDB's regexp_full_match is also
    RE2, so the SQL oracle shares exact semantics).  The pattern's
    literal prefix prunes the dictionary to a range first; a pattern with
    no literal prefix scans the whole dictionary (the ES anti-pattern —
    still one vectorized kernel, but O(n_terms))."""
    import pyarrow.compute as pc

    empty = np.array([], dtype=np.int64)
    if not pattern:
        return empty
    pre = _regexp_literal_prefix(pattern)
    lo, hi = s.term_prefix_range(pre) if pre else (0, len(s.terms_arr))
    if hi <= lo:
        return empty
    cand = s.terms_arr.slice(lo, hi - lo)
    keep = pc.match_substring_regex(
        cand, f"^(?:{pattern})$"
    ).to_numpy(zero_copy_only=False)
    tids = (np.flatnonzero(keep) + lo).tolist()
    if max_expansions is not None:
        tids = tids[:max_expansions]
    if not tids:
        return empty
    ids = np.unique(np.concatenate([s.postings_with_dl(ti)[0] for ti in tids]))
    if filter_lang is not None and ids.size:
        ids = ids[s.langs_for(ids) == filter_lang]
    if filter_ranges:
        for fld, lo_b, hi_b in filter_ranges:
            if not ids.size:
                break
            vals = s.nums_for(fld, ids)
            keep_r = ~np.isnan(vals)
            if lo_b is not None:
                keep_r &= vals >= lo_b
            if hi_b is not None:
                keep_r &= vals <= hi_b
            ids = ids[keep_r]
    if s.tombstones is not None and s.tombstones.size and ids.size:
        pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
        ids = ids[s.tombstones[pos] != ids]
    return ids


def segment_exists_matching_ids(
    s: Segment,
    field: str,
    filter_lang: str | None = None,
    filter_ranges: list[tuple] | None = None,
) -> np.ndarray:
    """ES exists query match set for ONE segment: docs whose mapped
    ``field`` has a value — numeric fields store NaN for missing, keyword
    fields the empty string (the build's missing-value encodings), lang
    is always present.  Pure docstore-column scan, no postings."""
    import pyarrow.compute as pc

    if field == "lang":
        ids = s.doc_ids_store.copy()
    elif field in s.num_arr:
        ids = s.doc_ids_store[~np.isnan(s.num_arr[field])]
    elif field in s.kw_arr:
        mask = pc.not_equal(s.kw_arr[field], "").to_numpy(zero_copy_only=False)
        ids = s.doc_ids_store[mask]
    else:
        raise ValueError(
            f"exists: unmapped field {field!r} "
            f"(mapped: lang, {sorted(s.kw_arr)}, {sorted(s.num_arr)})"
        )
    if filter_lang is not None and ids.size:
        ids = ids[s.langs_for(ids) == filter_lang]
    if filter_ranges:
        for fld, lo_b, hi_b in filter_ranges:
            if not ids.size:
                break
            vals = s.nums_for(fld, ids)
            keep_r = ~np.isnan(vals)
            if lo_b is not None:
                keep_r &= vals >= lo_b
            if hi_b is not None:
                keep_r &= vals <= hi_b
            ids = ids[keep_r]
    if s.tombstones is not None and s.tombstones.size and ids.size:
        pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
        ids = ids[s.tombstones[pos] != ids]
    return ids


def segment_phrase_prefix_matching_ids(
    s: Segment,
    fixed: list[str],
    prefix: str,
    filter_lang: str | None = None,
    filter_ranges: list[tuple] | None = None,
    max_expansions: int | None = None,
) -> np.ndarray:
    """ES match_phrase_prefix match set for ONE segment: docs where the
    ``fixed`` terms occur adjacently in order, immediately followed by
    ANY dictionary term starting with ``prefix`` (the autocomplete
    query).  Requires a positions index.  Same run-offset gather as
    score_segment_phrase; the last slot is the UNION of the expansion
    terms' (doc, pos) streams (one token per position, so cross-expansion
    keys can't collide)."""
    empty = np.array([], dtype=np.int64)
    if not prefix:
        return empty
    lo, hi = s.term_prefix_range(prefix)
    if max_expansions is not None:
        hi = min(hi, lo + max_expansions)
    if hi <= lo:
        return empty
    exp_tis = list(range(lo, hi))
    uniq = sorted(set(fixed))
    tis = {t: s.lookup(t) for t in uniq}
    if any(ti < 0 for ti in tis.values()):
        return empty
    post = {t: s.postings_with_dl(tis[t]) for t in uniq}
    exp_post = [s.postings_with_dl(ti) for ti in exp_tis]
    cand = (
        post[uniq[0]][0]
        if uniq
        else np.unique(np.concatenate([p[0] for p in exp_post]))
    )
    for t in uniq[1:]:
        cand = cand[np.isin(cand, post[t][0], assume_unique=True)]
    if uniq:  # must also contain at least one expansion term
        in_exp = np.zeros(cand.size, dtype=bool)
        for ids_t, _, _ in exp_post:
            in_exp |= np.isin(cand, ids_t, assume_unique=True)
        cand = cand[in_exp]
    if cand.size and s.tombstones is not None and s.tombstones.size:
        pos_t = np.minimum(np.searchsorted(s.tombstones, cand), s.tombstones.size - 1)
        cand = cand[s.tombstones[pos_t] != cand]
    if cand.size == 0:
        return empty

    L = np.int64(1) << 32
    n_fixed = len(fixed)

    def _gather(ti: int, ids_t, tfs_t, guard: bool) -> tuple[np.ndarray, np.ndarray]:
        flat, run_starts = s.positions_for(ti)
        j = np.searchsorted(ids_t, cand)
        if guard:
            jc = np.minimum(j, ids_t.size - 1)
            ok = (j < ids_t.size) & (ids_t[jc] == cand)
            j = jc[ok]
            docs = np.flatnonzero(ok)
        else:
            docs = np.arange(cand.size, dtype=np.int64)
        lens = tfs_t[j].astype(np.int64)
        total = int(lens.sum())
        run_off = np.zeros(docs.size, dtype=np.int64)
        if docs.size:
            np.cumsum(lens[:-1], out=run_off[1:])
        gather_idx = (
            np.repeat(run_starts[j], lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(run_off, lens)
        )
        doc_rep = np.repeat(docs, lens)
        return doc_rep, flat[gather_idx].astype(np.int64)

    keys_all = []
    for i, t in enumerate(fixed):
        ids_t, tfs_t, _ = post[t]
        doc_rep, p = _gather(tis[t], ids_t, tfs_t, guard=False)
        sp = p - i
        m = sp >= 0
        keys_all.append(doc_rep[m] * L + sp[m])
    exp_keys = []
    for ti, (ids_t, tfs_t, _) in zip(exp_tis, exp_post):
        doc_rep, p = _gather(ti, ids_t, tfs_t, guard=True)
        sp = p - n_fixed
        m = sp >= 0
        exp_keys.append(doc_rep[m] * L + sp[m])
    keys_all.append(
        np.concatenate(exp_keys) if exp_keys else np.array([], dtype=np.int64)
    )
    ka = np.concatenate(keys_all)
    uk, counts = np.unique(ka, return_counts=True)
    anchors = uk[counts == n_fixed + 1]
    if anchors.size == 0:
        return empty
    ids = cand[np.unique((anchors // L).astype(np.int64))]
    if filter_lang is not None and ids.size:
        ids = ids[s.langs_for(ids) == filter_lang]
    if filter_ranges:
        for fld, lo_b, hi_b in filter_ranges:
            if not ids.size:
                break
            vals = s.nums_for(fld, ids)
            keep_r = ~np.isnan(vals)
            if lo_b is not None:
                keep_r &= vals >= lo_b
            if hi_b is not None:
                keep_r &= vals <= hi_b
            ids = ids[keep_r]
    return ids


def _fuzzy_term_indices(s: Segment, term: str) -> list[int]:
    """Dictionary term indices within edit distance <= 1 of ``term``
    (ES fuzziness=1), fully vectorized: candidates are the three length
    bands |term|-1..+1 (edit distance 1 cannot change length by more);
    within a band, dist(q,t) <= 1  <=>  lcp(q,t) + lcs(q,t) >=
    max(|q|,|t|) - 1 (longest common prefix/suffix — the standard
    distance-1 identity), computed as numpy reductions over an (n, L)
    byte matrix sliced zero-copy from the Arrow dictionary buffers.
    Byte-level distance == character-level for the ascii analyzer."""
    import pyarrow.compute as pc

    qb = np.frombuffer(term.encode("utf-8"), dtype=np.uint8)
    lq = qb.size
    if lq == 0:
        return []
    arr = s.terms_arr.combine_chunks() if hasattr(s.terms_arr, "combine_chunks") else s.terms_arr
    lens = pc.binary_length(arr).to_numpy(zero_copy_only=False)
    out: list[int] = []
    for L in (lq - 1, lq, lq + 1):
        if L <= 0:
            continue
        band = np.flatnonzero(lens == L)
        if band.size == 0:
            continue
        sub = arr.take(pa.array(band, type=pa.int64()))
        if isinstance(sub, pa.ChunkedArray):
            sub = sub.combine_chunks()
        # compact take result: data buffer is n*L contiguous bytes
        off_dt = np.int64 if pa.types.is_large_string(sub.type) else np.int32
        off0 = int(np.frombuffer(sub.buffers()[1], dtype=off_dt)[sub.offset])
        data = np.frombuffer(sub.buffers()[2], dtype=np.uint8)
        mat = data[off0 : off0 + band.size * L].reshape(band.size, L)
        m = min(L, lq)
        neq = mat[:, :m] != qb[:m]
        p = np.where(neq.any(axis=1), neq.argmax(axis=1), m)
        neqr = mat[:, ::-1][:, :m] != qb[::-1][:m]
        sfx = np.where(neqr.any(axis=1), neqr.argmax(axis=1), m)
        ok = (p + sfx) >= max(L, lq) - 1
        out.extend(band[ok].tolist())
    return sorted(out)


def _damerau_levenshtein(a: bytes, b: bytes) -> int:
    """Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner; a
    transposed pair may have had an edit applied between its characters
    — 'ca'→'abc' is 2, where the restricted/OSA metric says 3).  Matches
    DuckDB's damerau_levenshtein, the oracle's replay function.  Used
    only on the tiny OSA==3 rim the vectorized band DP cannot decide."""
    la, lb = len(a), len(b)
    inf = la + lb
    # dist with 1-based string indexing and a 2-row sentinel border
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    d[1][1] = 0
    for i in range(1, la + 1):
        d[i + 1][1] = i
    for j in range(1, lb + 1):
        d[1][j + 1] = j
    last_row: dict[int, int] = {}
    for i in range(1, la + 1):
        last_col = 0  # last j where a[i-1] == b[j-1] in this row
        for j in range(1, lb + 1):
            i1 = last_row.get(b[j - 1], 0)
            j1 = last_col
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                last_col = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitute / match
                d[i + 1][j] + 1,  # insert
                d[i][j + 1] + 1,  # delete
                # transpose a[i1-1]..a[i-1] with everything between
                # deleted/inserted (the unrestricted move)
                d[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),
            )
        last_row[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _fuzzy_term_indices_tr1(s: Segment, term: str) -> list[int]:
    """Dictionary term indices within Damerau-Levenshtein distance <= 1
    of ``term`` (ES fuzziness=1 with fuzzy_transpositions=true, the ES
    default): the plain distance-1 set plus same-length candidates that
    differ by exactly one adjacent transposition.  The transposition
    check is vectorized: with p = longest common prefix and sfx =
    longest common suffix, candidate == transpose(term) iff the two
    middle positions are crosswise equal and p + sfx >= L - 2."""
    import pyarrow.compute as pc

    out = set(_fuzzy_term_indices(s, term))
    qb = np.frombuffer(term.encode("utf-8"), dtype=np.uint8)
    lq = qb.size
    if lq < 2:
        return sorted(out)
    arr = s.terms_arr.combine_chunks() if hasattr(s.terms_arr, "combine_chunks") else s.terms_arr
    lens = pc.binary_length(arr).to_numpy(zero_copy_only=False)
    band = np.flatnonzero(lens == lq)
    if band.size == 0:
        return sorted(out)
    sub = arr.take(pa.array(band, type=pa.int64()))
    if isinstance(sub, pa.ChunkedArray):
        sub = sub.combine_chunks()
    off_dt = np.int64 if pa.types.is_large_string(sub.type) else np.int32
    off0 = int(np.frombuffer(sub.buffers()[1], dtype=off_dt)[sub.offset])
    data = np.frombuffer(sub.buffers()[2], dtype=np.uint8)
    mat = data[off0 : off0 + band.size * lq].reshape(band.size, lq)
    neq = mat != qb
    p = np.where(neq.any(axis=1), neq.argmax(axis=1), lq)
    neqr = neq[:, ::-1]
    sfx = np.where(neqr.any(axis=1), neqr.argmax(axis=1), lq)
    # exactly one adjacent swap: mismatch region is the 2 chars at p
    pc_idx = np.minimum(p, lq - 2)
    swap = (
        (p + sfx >= lq - 2)
        & (p <= lq - 2)
        & (np.take_along_axis(mat, pc_idx[:, None], 1)[:, 0] == qb[np.minimum(pc_idx + 1, lq - 1)])
        & (np.take_along_axis(mat, np.minimum(pc_idx + 1, lq - 1)[:, None], 1)[:, 0] == qb[pc_idx])
    )
    out.update(band[swap].tolist())
    return sorted(out)


def _fuzzy_term_indices_k(
    s: Segment, term: str, max_edits: int, transpositions: bool = False
) -> list[int]:
    """Dictionary term indices within edit distance <= ``max_edits`` of
    ``term``.  max_edits=1 uses the vectorized lcp+lcs identity
    (_fuzzy_term_indices); max_edits=2 runs a vectorized Levenshtein DP
    over the 5 length bands |q|-2..+2 — columns iterate (term length,
    <= ~30 for analyzed tokens), rows are numpy vectors over the whole
    band, so cost is O(|q| x L) vector ops per band, never per-candidate
    Python.  Byte-level == char-level for the ascii analyzer.

    ``transpositions=True`` switches the metric to the unrestricted
    Damerau-Levenshtein (the ES/Lucene fuzzy_transpositions default;
    DuckDB damerau_levenshtein replays it): the band DP gains the OSA
    transposition row, and since DL <= 2 implies OSA <= 3 (the only
    inflation is an edit landing between a transposed pair, +1), the
    OSA==3 rim is decided exactly by a per-candidate Lowrance-Wagner
    pass (_damerau_levenshtein) — a handful of strings, never the band."""
    if max_edits <= 1:
        return (
            _fuzzy_term_indices_tr1(s, term)
            if transpositions
            else _fuzzy_term_indices(s, term)
        )
    if max_edits != 2:
        raise ValueError("fuzziness: only 1, 2 or 'auto' supported")
    import pyarrow.compute as pc

    qb = np.frombuffer(term.encode("utf-8"), dtype=np.uint8)
    lq = qb.size
    if lq == 0:
        return []
    arr = s.terms_arr.combine_chunks() if hasattr(s.terms_arr, "combine_chunks") else s.terms_arr
    lens = pc.binary_length(arr).to_numpy(zero_copy_only=False)
    out: list[int] = []
    for L in range(max(1, lq - 2), lq + 3):
        band = np.flatnonzero(lens == L)
        if band.size == 0:
            continue
        sub = arr.take(pa.array(band, type=pa.int64()))
        if isinstance(sub, pa.ChunkedArray):
            sub = sub.combine_chunks()
        off_dt = np.int64 if pa.types.is_large_string(sub.type) else np.int32
        off0 = int(np.frombuffer(sub.buffers()[1], dtype=off_dt)[sub.offset])
        data = np.frombuffer(sub.buffers()[2], dtype=np.uint8)
        mat = data[off0 : off0 + band.size * L].reshape(band.size, L)
        prev = np.broadcast_to(
            np.arange(L + 1, dtype=np.int32), (band.size, L + 1)
        ).copy()
        prev2 = None
        for i in range(1, lq + 1):
            cur = np.empty_like(prev)
            cur[:, 0] = i
            sub_cost = (mat != qb[i - 1]).astype(np.int32)
            for j in range(1, L + 1):
                cur[:, j] = np.minimum(
                    np.minimum(cur[:, j - 1] + 1, prev[:, j] + 1),
                    prev[:, j - 1] + sub_cost[:, j - 1],
                )
                if transpositions and i >= 2 and j >= 2:
                    tr = (mat[:, j - 1] == qb[i - 2]) & (mat[:, j - 2] == qb[i - 1])
                    cur[:, j] = np.where(
                        tr, np.minimum(cur[:, j], prev2[:, j - 2] + 1), cur[:, j]
                    )
            prev2 = prev
            prev = cur
        osa = prev[:, L]
        ok = osa <= 2
        out.extend(band[ok].tolist())
        if transpositions:
            # DL <= 2 implies OSA <= 3; decide the OSA==3 rim exactly
            for bi in band[osa == 3].tolist():
                cand = arr[bi].as_py().encode("utf-8")
                if _damerau_levenshtein(qb.tobytes(), cand) <= 2:
                    out.append(bi)
    return sorted(out)


def auto_fuzziness(term: str) -> int:
    """The ES fuzziness=AUTO rule (AUTO:3,6 defaults): 0 edits for terms
    shorter than 3 chars, 1 for 3..5, 2 for 6+."""
    n = len(term)
    return 0 if n < 3 else (1 if n < 6 else 2)


def segment_fuzzy_matching_ids(
    s: Segment,
    term: str,
    filter_lang: str | None = None,
    filter_ranges: list[tuple] | None = None,
) -> np.ndarray:
    """ES fuzzy query (fuzziness=1) match set for ONE segment: union of
    the postings of every dictionary term within edit distance 1."""
    empty = np.array([], dtype=np.int64)
    tids = _fuzzy_term_indices(s, term)
    if not tids:
        return empty
    ids = np.unique(np.concatenate([s.postings_with_dl(ti)[0] for ti in tids]))
    if filter_lang is not None and ids.size:
        ids = ids[s.langs_for(ids) == filter_lang]
    if filter_ranges:
        for fld, lo_b, hi_b in filter_ranges:
            if not ids.size:
                break
            vals = s.nums_for(fld, ids)
            keep_r = ~np.isnan(vals)
            if lo_b is not None:
                keep_r &= vals >= lo_b
            if hi_b is not None:
                keep_r &= vals <= hi_b
            ids = ids[keep_r]
    if s.tombstones is not None and s.tombstones.size and ids.size:
        pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
        ids = ids[s.tombstones[pos] != ids]
    return ids


def _segment_match_ids_for_plan(s: Segment, q: dict) -> np.ndarray:
    """Match-set dispatch shared by every MatchSet-family stage: term
    match (possibly filtered), prefix expansion, wildcard, fuzzy, or
    phrase-prefix."""
    if q.get("pp_prefix") is not None:
        return segment_phrase_prefix_matching_ids(
            s, q.get("pp_fixed") or [], q["pp_prefix"], q.get("filter_lang"),
            q.get("filter_ranges"), q.get("max_expansions"),
        )
    if q.get("fuzzy") is not None:
        return segment_fuzzy_matching_ids(
            s, q["fuzzy"], q.get("filter_lang"), q.get("filter_ranges")
        )
    if q.get("wildcard") is not None:
        return segment_wildcard_matching_ids(
            s, q["wildcard"], q.get("filter_lang"), q.get("filter_ranges"),
            q.get("max_expansions"),
        )
    if q.get("regexp") is not None:
        return segment_regexp_matching_ids(
            s, q["regexp"], q.get("filter_lang"), q.get("filter_ranges"),
            q.get("max_expansions"),
        )
    if q.get("exists") is not None:
        return segment_exists_matching_ids(
            s, q["exists"], q.get("filter_lang"), q.get("filter_ranges")
        )
    if q.get("prefix") is not None:
        return segment_prefix_matching_ids(
            s, q["prefix"], q.get("filter_lang"), q.get("filter_ranges"),
            q.get("max_expansions"),
        )
    return segment_matching_ids(
        s, q["terms"], q.get("require_all", False), q.get("filter_lang"),
        q.get("filter_ranges"), q.get("filter_kw"), q.get("filter_geo"),
    )


def score_segment_combined(
    s: Segment,
    terms: list[str],
    fields: list[str],
    weights: list[float],
    idf: np.ndarray,
    avgdl_c: float,
    k1: float,
    b: float,
) -> tuple[np.ndarray, np.ndarray]:
    """ES combined_fields (BM25F) scoring of one segment: term freq for
    t in doc d = sum over fields of weight_f x tf_f(t, d), doc length =
    sum of weight_f x dl_f(d), ONE BM25 per term on the blended values
    (idf from the cross-field UNION df, computed globally by the
    caller).  Deterministic: ascending-term accumulation, round6."""
    per_term = []
    cand_parts = []
    for t in terms:
        ids_l, tf_l = [], []
        for f, w in zip(fields, weights):
            ti = s.lookup(f"{f}\x1f{t}")
            if ti >= 0:
                ids_f, tfs_f, _ = s.postings_with_dl(ti)
                ids_l.append(ids_f)
                tf_l.append(w * tfs_f.astype(np.float64))
        if not ids_l:
            per_term.append(None)
            continue
        u, inv = np.unique(np.concatenate(ids_l), return_inverse=True)
        ctf = np.zeros(u.size, dtype=np.float64)
        np.add.at(ctf, inv, np.concatenate(tf_l))
        per_term.append((u, ctf))
        cand_parts.append(u)
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    if not cand_parts:
        return empty
    cand = np.unique(np.concatenate(cand_parts))
    rows = np.searchsorted(s.doc_ids_store, cand)
    dl_c = np.zeros(cand.size, dtype=np.float64)
    for f, w in zip(fields, weights):
        dl_c += w * s.field_dl[f][rows].astype(np.float64)
    acc = np.zeros(cand.size, dtype=np.float64)
    for i, pt in enumerate(per_term):  # ascending-term determinism
        if pt is None:
            continue
        u, ctf = pt
        pos = np.searchsorted(cand, u)
        acc[pos] += idf[i] * bm25_tf_part(ctf, dl_c[pos], avgdl_c, k1, b)
    if s.tombstones is not None and s.tombstones.size and cand.size:
        pos_t = np.minimum(np.searchsorted(s.tombstones, cand), s.tombstones.size - 1)
        alive = s.tombstones[pos_t] != cand
        cand, acc = cand[alive], acc[alive]
    return cand, np.asarray(round6(acc))


def segment_union_df(s: Segment, terms: list[str], fields: list[str]) -> np.ndarray:
    """Per-term cross-field UNION document frequency for ONE segment —
    the df a combined_fields (BM25F) idf needs (per-field dfs overlap,
    so they cannot simply be summed)."""
    out = np.zeros(len(terms), dtype=np.int64)
    for i, t in enumerate(terms):
        ids_l = []
        for f in fields:
            ti = s.lookup(f"{f}\x1f{t}")
            if ti >= 0:
                ids_l.append(s.postings_with_dl(ti)[0])
        if ids_l:
            out[i] = (
                ids_l[0].size if len(ids_l) == 1
                else np.unique(np.concatenate(ids_l)).size
            )
    return out


def _phrase_gather(
    s: Segment, phrase: list[str], dl_field: str | None
) -> tuple[np.ndarray, dict]:
    """Shared positions preamble for the phrase/span kernels: candidate
    docs = intersection of the terms' postings (tombstones excluded);
    ``gathered[t]`` = (doc_rep indexing into cand, position) streams per
    unique term, gathered for the candidates only with run-offset
    arithmetic (no per-candidate Python loop).  Every candidate contains
    every term, so all searchsorted probes hit."""
    uniq = sorted(set(phrase))
    tis = {t: s.lookup(t) for t in uniq}
    none = np.array([], dtype=np.int64)
    if any(ti < 0 for ti in tis.values()):
        return none, {}
    post = {t: s.postings_with_dl(tis[t], dl_field) for t in uniq}
    cand = post[uniq[0]][0]
    for t in uniq[1:]:
        cand = cand[np.isin(cand, post[t][0], assume_unique=True)]
    if cand.size and s.tombstones is not None and s.tombstones.size:
        pos_t = np.minimum(np.searchsorted(s.tombstones, cand), s.tombstones.size - 1)
        cand = cand[s.tombstones[pos_t] != cand]
    if cand.size == 0:
        return none, {}
    pos = {t: s.positions_for(tis[t]) for t in uniq}
    gathered: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in uniq:
        ids_t, tfs_t, _ = post[t]
        j = np.searchsorted(ids_t, cand)
        flat, run_starts = pos[t]
        lens = tfs_t[j].astype(np.int64)
        total = int(lens.sum())
        run_off = np.zeros(cand.size, dtype=np.int64)
        np.cumsum(lens[:-1], out=run_off[1:])
        gather_idx = (
            np.repeat(run_starts[j], lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(run_off, lens)
        )
        doc_rep = np.repeat(np.arange(cand.size, dtype=np.int64), lens)
        gathered[t] = (doc_rep, flat[gather_idx].astype(np.int64))
    return cand, gathered


def score_segment_span_near(
    s: Segment,
    terms: list[str],
    idf_sum: float,
    avgdl: float,
    k1: float,
    b: float,
    slop: int,
    dl_field: str | None = None,
    first_end: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """ES span_near with in_order=true over ONE segment: a doc matches
    when its positions contain an ordered chain p_0 < p_1 < ... <
    p_{m-1} (one position per clause term, strictly increasing) whose
    total gap count (p_last - p_first + 1 - m) <= ``slop``.  tf = number
    of first-term positions starting such a chain; the greedy
    nearest-next chain minimizes p_last for a given anchor, so the
    greedy test is exact per anchor (also for the ``first_end`` cut:
    greedy minimizes the chain end, so if greedy doesn't fit no chain
    does).  ``first_end`` adds the ES span_first envelope: the chain
    must end before token position ``first_end`` (Lucene
    ``span.end() <= end`` with end() = last position + 1).  Scoring
    follows the engine phrase convention (frozen): round6(idf_sum *
    bm25_tf_part(tf, dl)); tombstones excluded by the shared preamble.
    slop=0 degenerates to the strict ordered-adjacency phrase."""
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    cand, gathered = _phrase_gather(s, terms, dl_field)
    if cand.size == 0:
        return empty
    L = np.int64(1) << 32
    d0, p0 = gathered[terms[0]]
    docs = d0
    first = p0.astype(np.int64)
    cur = first
    for t in terms[1:]:
        if docs.size == 0:
            break
        dr, p = gathered[t]
        ek = dr * L + p  # sorted: docs asc, positions asc per doc
        idx = np.searchsorted(ek, docs * L + cur, side="right")
        ok = idx < ek.size
        idxc = np.minimum(idx, ek.size - 1)
        ok &= (ek[idxc] // L) == docs  # the next occurrence is same-doc
        docs, first = docs[ok], first[ok]
        cur = (ek[idxc] % L)[ok]
    if docs.size:
        ok = (cur - first + 1 - len(terms)) <= slop
        if first_end is not None:
            ok &= cur < int(first_end)
        docs = docs[ok]
    if docs.size == 0:
        return empty
    tf_per_doc = np.bincount(docs, minlength=cand.size)
    hit = tf_per_doc > 0
    ids = cand[hit]
    tfs = tf_per_doc[hit].astype(np.float64)
    dls = s.dl_for(ids, dl_field).astype(np.float64)
    scores = np.asarray(round6(idf_sum * bm25_tf_part(tfs, dls, avgdl, k1, b)))
    return ids, scores


def score_segment_intervals(
    s: Segment,
    terms: list[str],
    idf_sum: float,
    avgdl: float,
    k1: float,
    b: float,
    max_gaps: int,
    dl_field: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """ES intervals query (all_of, ordered=false) over ONE segment: a doc
    matches when some window contains >= 1 occurrence of EVERY unique
    term with total gaps (width - n_terms) <= ``max_gaps``, in any
    order.  Exact via minimal-window-per-end: every anchor position p
    (any term's occurrence) yields the minimal covering window ending at
    p — [min over terms of latest-occurrence-<=-p, p]; a cover exists
    iff some anchor's window passes the gap bound (the minimal window's
    end is always an occurrence of one of the terms).  tf = number of
    anchor end positions whose minimal window passes (the engine
    convention, mirroring span_near's chains-per-anchor).  Fully
    vectorized: one searchsorted per term over the shared int64
    (doc, pos) key streams.  Scoring follows the frozen phrase
    convention: round6(idf_sum * bm25_tf_part(tf, dl))."""
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    uniq = sorted(set(terms))
    cand, gathered = _phrase_gather(s, uniq, dl_field)
    if cand.size == 0:
        return empty
    L = np.int64(1) << 32
    n = len(uniq)
    # anchors: every occurrence of every term (a position holds exactly
    # one token, so keys are unique across terms)
    anchor_keys = np.concatenate([gathered[t][0] * L + gathered[t][1] for t in uniq])
    docs_a = anchor_keys // L
    pos_a = anchor_keys % L
    valid = np.ones(anchor_keys.size, dtype=bool)
    min_latest = np.full(anchor_keys.size, np.iinfo(np.int64).max, dtype=np.int64)
    for t in uniq:
        du, pu = gathered[t]
        ek = du * L + pu  # sorted: docs asc, positions asc per doc
        idx = np.searchsorted(ek, anchor_keys, side="right") - 1
        ok = idx >= 0
        idxc = np.maximum(idx, 0)
        ok &= (ek[idxc] // L) == docs_a  # latest-<=-p is same-doc
        valid &= ok
        latest = ek[idxc] % L
        min_latest = np.minimum(
            min_latest, np.where(ok, latest, np.iinfo(np.int64).max)
        )
    valid &= (pos_a - min_latest + 1 - n) <= int(max_gaps)
    if not valid.any():
        return empty
    tf_per_doc = np.bincount(docs_a[valid], minlength=cand.size)
    hit = tf_per_doc > 0
    ids = cand[hit]
    tfs = tf_per_doc[hit].astype(np.float64)
    dls = s.dl_for(ids, dl_field).astype(np.float64)
    scores = np.asarray(round6(idf_sum * bm25_tf_part(tfs, dls, avgdl, k1, b)))
    return ids, scores


def score_segment_span_or(
    s: Segment,
    terms: list[str],
    idf_sum: float,
    avgdl: float,
    k1: float,
    b: float,
    dl_field: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """ES span_or over span_term clauses for ONE segment: a doc matches
    when it contains ANY clause term; matching spans are the union of
    the terms' occurrences, so span freq = Σ clause-term tfs per doc —
    postings only, no position decode.  Scoring follows the frozen
    phrase convention: round6(idf_sum * bm25_tf_part(tf, dl)) with
    idf_sum over the (present) unique clause terms."""
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    ids_all, tf_all = [], []
    for t in sorted(set(terms)):
        ti = s.lookup(t)
        if ti < 0:
            continue
        ids_t, tfs_t, _ = s.postings_with_dl(ti, dl_field)
        ids_all.append(ids_t)
        tf_all.append(tfs_t.astype(np.int64))
    if not ids_all:
        return empty
    ids_c = np.concatenate(ids_all)
    tf_c = np.concatenate(tf_all)
    uids, inv = np.unique(ids_c, return_inverse=True)
    tfs = np.bincount(inv, weights=tf_c)
    if s.tombstones is not None and s.tombstones.size:
        pos_t = np.minimum(np.searchsorted(s.tombstones, uids), s.tombstones.size - 1)
        live = s.tombstones[pos_t] != uids
        uids, tfs = uids[live], tfs[live]
    if uids.size == 0:
        return empty
    dls = s.dl_for(uids, dl_field).astype(np.float64)
    scores = np.asarray(round6(idf_sum * bm25_tf_part(tfs, dls, avgdl, k1, b)))
    return uids, scores


def score_segment_span_not(
    s: Segment,
    include: str,
    exclude: str,
    pre: int,
    post: int,
    idf_inc: float,
    avgdl: float,
    k1: float,
    b: float,
    dl_field: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """ES span_not for ONE segment: occurrences of ``include`` are kept
    unless an ``exclude`` occurrence falls within ``pre`` tokens before
    or ``post`` tokens after (the Lucene pre/post windows; pre=post=0
    keeps everything for distinct single-term spans — they can never
    overlap).  tf = surviving include positions; scoring per the phrase
    convention with the include term's idf.  Vectorized: one run-offset
    position gather per side + one searchsorted window probe."""
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    ti = s.lookup(include)
    if ti < 0:
        return empty
    cand, gathered = _phrase_gather(s, [include], dl_field)
    if cand.size == 0:
        return empty
    d_inc, p_inc = gathered[include]
    te = s.lookup(exclude)
    keep = np.ones(d_inc.size, dtype=bool)
    if te >= 0 and (int(pre) > 0 or int(post) > 0):
        ids_e, tfs_e, _ = s.postings_with_dl(te, dl_field)
        # gather exclude positions for candidate docs that contain it
        j = np.searchsorted(ids_e, cand)
        jc = np.minimum(j, ids_e.size - 1)
        has_e = (ids_e[jc] == cand) if ids_e.size else np.zeros(cand.size, bool)
        if has_e.any():
            flat, run_starts = s.positions_for(te)
            lens = tfs_e[jc[has_e]].astype(np.int64)
            total = int(lens.sum())
            run_off = np.zeros(int(has_e.sum()), dtype=np.int64)
            np.cumsum(lens[:-1], out=run_off[1:])
            gi = (
                np.repeat(run_starts[jc[has_e]], lens)
                + np.arange(total, dtype=np.int64)
                - np.repeat(run_off, lens)
            )
            d_exc = np.repeat(np.flatnonzero(has_e).astype(np.int64), lens)
            p_exc = flat[gi].astype(np.int64)
            L = np.int64(1) << 32
            ek = d_exc * L + p_exc
            lo_key = d_inc * L + np.maximum(p_inc - int(pre), 0)
            hi_key = d_inc * L + (p_inc + int(post))
            lo = np.searchsorted(ek, lo_key, side="left")
            hit = lo < ek.size
            loc = np.minimum(lo, ek.size - 1)
            hit &= ek[loc] <= hi_key
            keep = ~hit
    if not keep.any():
        return empty
    tf_per_doc = np.bincount(d_inc[keep], minlength=cand.size)
    live = tf_per_doc > 0
    ids = cand[live]
    tfs = tf_per_doc[live].astype(np.float64)
    dls = s.dl_for(ids, dl_field).astype(np.float64)
    scores = np.asarray(round6(idf_inc * bm25_tf_part(tfs, dls, avgdl, k1, b)))
    return ids, scores


def score_segment_span_multi(
    s: Segment,
    slots: list[list[str]],
    idf_sum: float,
    avgdl: float,
    k1: float,
    b: float,
    slop: int,
    dl_field: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """ES span_near whose clauses may be span_multi wrappers (prefix /
    multi-term rewrites) for ONE segment: each slot is a SET of terms
    (a span_term slot has one member; a span_multi slot carries its
    dictionary expansion) and a slot's occurrences are the union of its
    members' positions.  A doc matches when an ordered chain p_0 < p_1
    < ... < p_{m-1} (one position per slot, strictly increasing) has
    total gap (p_last - p_first + 1 - m) <= ``slop``; greedy
    nearest-next over the merged per-slot streams minimizes the chain
    end per anchor, so the test stays exact (the span_near argument —
    a union stream is just a position stream).  tf = number of
    first-slot positions starting a chain; scoring per the frozen
    phrase convention round6(idf_sum * bm25_tf_part(tf, dl)) with
    idf_sum accumulated by the caller over every present slot member
    (the span_or convention applied per slot).  Candidates = docs
    holding >= 1 member of EVERY slot, tombstones excluded.  Reference
    parity: kafka-es delegates span_multi to ES/Lucene
    (SpanMultiTermQueryWrapper); the global expansion is the engine's
    deterministic counterpart to Lucene's per-segment rewrite."""
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    present: list[list[tuple[str, int]]] = []
    for slot in slots:
        mem = [(t, s.lookup(t)) for t in slot]
        mem = [(t, ti) for t, ti in mem if ti >= 0]
        if not mem:
            return empty
        present.append(mem)
    post = {
        t: s.postings_with_dl(ti, dl_field)
        for mem in present
        for t, ti in mem
    }
    cand: np.ndarray | None = None
    for mem in present:
        sd = (
            post[mem[0][0]][0]
            if len(mem) == 1
            else np.unique(np.concatenate([post[t][0] for t, _ in mem]))
        )
        cand = sd if cand is None else np.intersect1d(cand, sd, assume_unique=True)
        if cand.size == 0:
            return empty
    if s.tombstones is not None and s.tombstones.size:
        pos_t = np.minimum(np.searchsorted(s.tombstones, cand), s.tombstones.size - 1)
        cand = cand[s.tombstones[pos_t] != cand]
    if cand.size == 0:
        return empty
    L = np.int64(1) << 32
    merged: list[np.ndarray] = []
    for mem in present:
        keys_parts = []
        for t, ti in mem:
            ids_t, tfs_t, _ = post[t]
            j = np.searchsorted(ids_t, cand)
            jc = np.minimum(j, ids_t.size - 1)
            hit = (ids_t[jc] == cand) if ids_t.size else np.zeros(cand.size, bool)
            if not hit.any():
                continue
            flat, run_starts = s.positions_for(ti)
            lens = tfs_t[jc[hit]].astype(np.int64)
            total = int(lens.sum())
            run_off = np.zeros(int(hit.sum()), dtype=np.int64)
            np.cumsum(lens[:-1], out=run_off[1:])
            gi = (
                np.repeat(run_starts[jc[hit]], lens)
                + np.arange(total, dtype=np.int64)
                - np.repeat(run_off, lens)
            )
            doc_rep = np.repeat(np.flatnonzero(hit).astype(np.int64), lens)
            keys_parts.append(doc_rep * L + flat[gi].astype(np.int64))
        if not keys_parts:
            return empty
        keys = np.concatenate(keys_parts)
        keys.sort()  # a position holds one token -> keys unique per doc
        merged.append(keys)
    k0 = merged[0]
    docs = k0 // L
    first = k0 % L
    cur = first
    for ek in merged[1:]:
        if docs.size == 0:
            break
        idx = np.searchsorted(ek, docs * L + cur, side="right")
        ok = idx < ek.size
        idxc = np.minimum(idx, ek.size - 1)
        ok &= (ek[idxc] // L) == docs
        docs, first = docs[ok], first[ok]
        cur = (ek[idxc] % L)[ok]
    if docs.size:
        ok = (cur - first + 1 - len(slots)) <= slop
        docs = docs[ok]
    if docs.size == 0:
        return empty
    tf_per_doc = np.bincount(docs, minlength=cand.size)
    hit = tf_per_doc > 0
    ids = cand[hit]
    tfs = tf_per_doc[hit].astype(np.float64)
    dls = s.dl_for(ids, dl_field).astype(np.float64)
    scores = np.asarray(round6(idf_sum * bm25_tf_part(tfs, dls, avgdl, k1, b)))
    return ids, scores


def score_segment_weighted_terms(
    s: Segment,
    terms: list[str],
    weights: list[float],
    dl_field: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """ES sparse_vector / rank_features-style weighted-term retrieval
    (the learned-sparse ELSER/SPLADE scoring shape) for ONE segment:
    score(d) = round6(Σ_t w_t · tf(t, d)) — the dot product of the query
    weight vector with the doc's stored term frequencies (tf is the doc
    weight; a learned per-doc weight column would slot in identically).
    No idf, no length norm (the sparse-dot contract).  Ascending-term
    accumulation, tombstones excluded, (score desc, doc_id asc) handled
    by the caller."""
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    order = np.argsort(np.asarray(terms, dtype=object), kind="stable")
    ids_all, contrib_all = [], []
    for i in order:
        ti = s.lookup(terms[int(i)])
        if ti < 0:
            continue
        ids_t, tfs_t, _ = s.postings_with_dl(ti, dl_field)
        ids_all.append(ids_t)
        contrib_all.append(float(weights[int(i)]) * tfs_t.astype(np.float64))
    if not ids_all:
        return empty
    ids_c = np.concatenate(ids_all)
    uids, inv = np.unique(ids_c, return_inverse=True)
    acc = np.zeros(uids.size, dtype=np.float64)
    np.add.at(acc, inv, np.concatenate(contrib_all))
    if s.tombstones is not None and s.tombstones.size:
        pos_t = np.minimum(np.searchsorted(s.tombstones, uids), s.tombstones.size - 1)
        live = s.tombstones[pos_t] != uids
        uids, acc = uids[live], acc[live]
    if uids.size == 0:
        return empty
    return uids, np.asarray(round6(acc))


def score_segment_span_contain(
    s: Segment,
    big_terms: list[str],
    little: str,
    idf_sum: float,
    avgdl: float,
    k1: float,
    b: float,
    slop: int,
    mode: str,
    dl_field: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """ES span_containing / span_within for ONE segment.  ``big`` is a
    span_near clause (ordered chain, total gap <= ``slop``); ``little``
    a span_term.  Like Lucene, the big spans enumerated are the minimal
    ones per start position (the greedy nearest-next chain — identical
    to span_near's own enumeration).  mode="containing": matching spans
    are big spans [first, end] that contain a little occurrence
    (first <= q <= end); tf = surviving big spans per doc.
    mode="within": matching spans are little occurrences q inside some
    big span; tf = surviving little occurrences per doc.  Containment
    probes are one searchsorted each — within uses a per-doc running max
    of span ends over the (doc, first)-sorted chains (int64-packed keys
    make the cross-doc cummax safe: earlier docs' ends pack strictly
    below this doc's key range).  Scoring follows the frozen phrase
    convention: round6(idf_sum * bm25_tf_part(tf, dl)) with idf_sum over
    the unique clause terms (big + little)."""
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    gather_terms = list(dict.fromkeys([*big_terms, little]))
    cand, gathered = _phrase_gather(s, gather_terms, dl_field)
    if cand.size == 0:
        return empty
    L = np.int64(1) << 32
    # minimal big spans per start: the span_near greedy chain
    d0, p0 = gathered[big_terms[0]]
    docs = d0
    first = p0.astype(np.int64)
    cur = first
    for t in big_terms[1:]:
        if docs.size == 0:
            break
        dr, p = gathered[t]
        ek = dr * L + p
        idx = np.searchsorted(ek, docs * L + cur, side="right")
        ok = idx < ek.size
        idxc = np.minimum(idx, ek.size - 1)
        ok &= (ek[idxc] // L) == docs
        docs, first = docs[ok], first[ok]
        cur = (ek[idxc] % L)[ok]
    if docs.size:
        ok = (cur - first + 1 - len(big_terms)) <= int(slop)
        docs, first, cur = docs[ok], first[ok], cur[ok]
    if docs.size == 0:
        return empty
    d_l, p_l = gathered[little]
    ek_little = d_l * L + p_l.astype(np.int64)
    if mode == "containing":
        lo = np.searchsorted(ek_little, docs * L + first, side="left")
        hit = lo < ek_little.size
        loc = np.minimum(lo, ek_little.size - 1)
        hit &= ek_little[loc] <= docs * L + cur
        tf_docs = docs[hit]
    else:  # within
        ek_first = docs * L + first  # non-decreasing (doc asc, pos asc)
        cummax_end = np.maximum.accumulate(docs * L + cur)
        idx = np.searchsorted(ek_first, ek_little, side="right") - 1
        hit = idx >= 0
        idxc = np.maximum(idx, 0)
        hit &= cummax_end[idxc] >= ek_little
        tf_docs = d_l[hit]
    if tf_docs.size == 0:
        return empty
    tf_per_doc = np.bincount(tf_docs, minlength=cand.size)
    live = tf_per_doc > 0
    ids = cand[live]
    tfs = tf_per_doc[live].astype(np.float64)
    dls = s.dl_for(ids, dl_field).astype(np.float64)
    scores = np.asarray(round6(idf_sum * bm25_tf_part(tfs, dls, avgdl, k1, b)))
    return ids, scores


def score_segment_phrase(
    s: Segment,
    phrase: list[str],
    idf_sum: float,
    avgdl: float,
    k1: float,
    b: float,
    slop: int = 0,
    dl_field: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Phrase matching + scoring for ONE segment: candidate docs =
    intersection of the phrase terms' postings; with slop=0 a doc matches
    when the per-term position sets, shifted by phrase offset, intersect.

    ``slop`` > 0 uses WINDOW-SLOP semantics (documented simplification of
    Lucene's sloppy phrase): anchor positions come from the first term;
    an anchor matches when every term has an occurrence within ``slop``
    of its expected position.  slop=0 is exactly the strict phrase.
    Tombstoned docs excluded.  Returns (doc_ids, round6 scores).

    Fully vectorized (no per-candidate Python loop — even a common-bigram
    phrase whose candidates ≈ the whole segment runs as a handful of numpy
    passes): candidate docs' position runs are gathered with run-offset
    arithmetic into one (doc, shifted_pos) key stream per phrase element;
    slop=0 anchors are the int64 keys occurring once per element
    (len(phrase) total — position sets are per-doc unique, so the count
    criterion IS the shifted intersection); slop>0 filters the anchor
    keys against each element's key stream by nearest-neighbour distance
    (cross-doc neighbours differ by ≥ 2^32 >> slop, so no per-doc
    boundary handling is needed).

    ``dl_field`` (multi-field index, field-prefixed ``phrase`` terms):
    BM25 norms use that field's length column; a field's tokens occupy a
    contiguous run of the combined position stream, so intra-field
    adjacency (and slop windows) are exactly the field-text positions and
    cross-field sequences can never match (the prefixes differ)."""
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    cand, gathered = _phrase_gather(s, phrase, dl_field)
    if cand.size == 0:
        return empty
    L = np.int64(1) << 32  # doc-key stride; positions are token offsets << 2^32

    if slop == 0:
        # key = doc * 2^32 + (pos - offset); an anchor position matching
        # ALL phrase elements produces exactly len(phrase) equal keys
        keys_all = []
        for i, t in enumerate(phrase):
            doc_rep, p = gathered[t]
            sp = p - i
            m = sp >= 0  # an anchor can never sit before the doc start
            keys_all.append(doc_rep[m] * L + sp[m])
        ka = np.concatenate(keys_all)
        uk, counts = np.unique(ka, return_counts=True)
        anchors = uk[counts == len(phrase)]
    else:
        # anchors = first element's positions; each later element prunes
        # anchors whose nearest same-doc occurrence is farther than slop
        OFF = np.int64(len(phrase))  # keep shifted keys non-negative
        d0, p0 = gathered[phrase[0]]
        anchors = d0 * L + (p0 + OFF)
        for i, t in enumerate(phrase):
            if i == 0 or anchors.size == 0:
                continue
            doc_rep, p = gathered[t]
            ek = doc_rep * L + (p - i + OFF)  # sorted: docs asc, pos asc per doc
            nearest = np.clip(np.searchsorted(ek, anchors), 0, ek.size - 1)
            prev = np.maximum(nearest - 1, 0)
            dist = np.minimum(
                np.abs(ek[nearest] - anchors), np.abs(ek[prev] - anchors)
            )
            anchors = anchors[dist <= slop]
    if anchors.size == 0:
        return empty
    tf_per_doc = np.bincount((anchors // L).astype(np.int64), minlength=cand.size)
    hit = tf_per_doc > 0
    ids = cand[hit]
    tfs = tf_per_doc[hit].astype(np.float64)
    dls = s.dl_for(ids, dl_field).astype(np.float64)
    scores = np.asarray(round6(idf_sum * bm25_tf_part(tfs, dls, avgdl, k1, b)))
    return ids, scores


def score_segment_bool(
    s: Segment,
    must: list[tuple[list[str], np.ndarray]],
    should: list[tuple[list[str], np.ndarray]],
    mn_terms: list[str] | None,
    msm: int,
    avgdl: float,
    k1: float,
    b: float,
    phrases: list[tuple[list[str], float]] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """ES bool query over ONE segment: candidates = docs in every must
    clause's match set, with >= msm should clauses matched, minus
    must_not matches; score = round6(sum of the matched clauses' round6'd
    BM25 scores).  Each clause scores via score_segment (pruning off),
    so tombstone exclusion is inherited.  ``phrases`` (query_string
    quoted clauses): (tokens, idf_sum) pairs scored via
    score_segment_phrase and treated as additional MUST clauses."""
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    res_m = [
        score_segment(s, terms, idf, avgdl, k1, b, None) for terms, idf in must
    ]
    res_m += [
        score_segment_phrase(s, toks, idf_sum, avgdl, k1, b)
        for toks, idf_sum in (phrases or [])
    ]
    if any(ids.size == 0 for ids, _ in res_m):
        return empty
    res_s = [
        score_segment(s, terms, idf, avgdl, k1, b, None) for terms, idf in should
    ]
    if res_m:
        cand = res_m[0][0]
        for ids, _ in res_m[1:]:
            cand = cand[np.isin(cand, ids, assume_unique=True)]
    else:
        cand = np.unique(np.concatenate([ids for ids, _ in res_s])) if res_s else np.array([], dtype=np.int64)
    if cand.size == 0:
        return empty
    if msm > 0 and res_s:
        n_should = np.zeros(cand.size, dtype=np.int64)
        for ids, _ in res_s:
            pos = np.searchsorted(cand, ids)
            pos_c = np.minimum(pos, cand.size - 1)
            hit = cand[pos_c] == ids
            np.add.at(n_should, pos_c[hit], 1)
        cand = cand[n_should >= msm]
        if cand.size == 0:
            return empty
    if mn_terms:
        mn_ids = []
        for t in mn_terms:
            ti = s.lookup(t)
            if ti >= 0:
                mn_ids.append(s.postings(ti)[0])
        if mn_ids:
            cand = cand[~np.isin(cand, np.unique(np.concatenate(mn_ids)), assume_unique=True)]
            if cand.size == 0:
                return empty
    acc = np.zeros(cand.size, dtype=np.float64)
    for ids, sc in res_m + res_s:
        pos = np.searchsorted(cand, ids)
        pos_c = np.minimum(pos, cand.size - 1)
        hit = cand[pos_c] == ids
        acc[pos_c[hit]] += sc[hit]
    return cand, np.asarray(round6(acc))


def _after_cursor_mask(
    ids: np.ndarray, scores: np.ndarray, cursor: tuple
) -> np.ndarray:
    """ES search_after predicate: strictly after (score desc, doc_id
    asc) the cursor.  Scores are round6'd on both sides, so equality
    compares exactly."""
    cs, cd = float(cursor[0]), int(cursor[1])
    return (scores < cs) | ((scores == cs) & (ids > cd))


def score_segment(
    s: Segment,
    terms: list[str],
    idf: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    theta: float | None = None,
    require_all: bool = False,
    filter_lang: str | None = None,
    must_not_terms: list[str] | None = None,
    dl_field: str | None = None,
    filter_ranges: list[tuple] | None = None,
    filter_kw: list[tuple] | None = None,
    filter_geo: tuple | None = None,
    filter_script: str | None = None,
    filter_geo_poly: tuple | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized BM25 scoring of one segment.  With a threshold, MaxScore
    splits terms into essential (union-scored) and non-essential
    (lookup-only): Σ UB(non-essential) < theta, so a doc matching only
    non-essential terms cannot reach the top-k.

    ``require_all`` = ES match operator=and (a doc must contain every
    query term; exact under pruning because a doc with all terms contains
    every essential term, so it is always in the candidate union).
    ``filter_lang`` post-filters by the docstore lang column.
    ``dl_field`` (multi-field index, field-prefixed ``terms``): BM25 norms
    use that field's length column; ``avgdl`` must then be the FIELD's
    average length (manifest avgdl_fields)."""
    tis = [(i, s.lookup(t)) for i, t in enumerate(terms)]
    present = [(i, ti) for i, ti in tis if ti >= 0]
    if not present or (require_all and len(present) < len(terms)):
        return np.array([], dtype=np.int64), np.array([], dtype=np.float64)

    essential = present
    if theta is not None and len(present) > 1:
        ubs = np.array([idf[i] * s.term_score_ub(ti, avgdl, k1, b) for i, ti in present])
        order = np.argsort(ubs, kind="stable")  # ascending UB
        csum = np.cumsum(ubs[order])
        n_nonessential = int(np.searchsorted(csum, theta))  # csum[j] < theta
        if n_nonessential >= len(present):
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        ess_idx = set(order[n_nonessential:].tolist())
        essential = [present[j] for j in sorted(ess_idx)]

    cand = np.unique(
        np.concatenate([s.postings_with_dl(ti, dl_field)[0] for _, ti in essential])
    )
    if cand.size == 0:
        return cand, np.array([], dtype=np.float64)
    ess_set = {ti for _, ti in essential}
    acc = np.zeros(cand.size, dtype=np.float64)
    nmatch = np.zeros(cand.size, dtype=np.int32) if require_all else None
    for i, ti in present:  # ascending term order (determinism contract)
        if ti in ess_set:
            ids, tfs, dl = s.postings_with_dl(ti, dl_field)
            pos = np.searchsorted(cand, ids)
            acc[pos] += idf[i] * bm25_tf_part(tfs, dl, avgdl, k1, b)
            if nmatch is not None:
                nmatch[pos] += 1
        else:
            # non-essential lookup: block-max skip pointers decode only
            # the blocks that can contain candidates (never the whole,
            # typically head-term, posting list)
            hit, tf_h, dl_h = s.lookup_postings(ti, cand, dl_field)
            if hit.any():
                acc[hit] += idf[i] * bm25_tf_part(tf_h, dl_h, avgdl, k1, b)
                if nmatch is not None:
                    nmatch[hit] += 1
    if nmatch is not None:
        full = nmatch == len(terms)
        cand, acc = cand[full], acc[full]
        if cand.size == 0:
            return cand, acc
    if filter_lang is not None:
        keep_lang = s.langs_for(cand) == filter_lang
        cand, acc = cand[keep_lang], acc[keep_lang]
        if cand.size == 0:
            return cand, acc
    if filter_ranges:
        # ES range filter on a numeric-mapped field: gte/lte bounds, NaN
        # (missing) never matches.  Post-scoring like filter_lang: exact
        # under pruning (a filter only removes docs, never lifts one past
        # theta).
        for fld, lo, hi in filter_ranges:
            vals = s.nums_for(fld, cand)
            keep_r = ~np.isnan(vals)
            if lo is not None:
                keep_r &= vals >= lo
            if hi is not None:
                keep_r &= vals <= hi
            cand, acc = cand[keep_r], acc[keep_r]
            if cand.size == 0:
                return cand, acc
    if filter_kw:
        # ES bool filter term/terms clause on a keyword-mapped field
        # ({"term": {field: v}} / {"terms": {field: [v1, ...]}}): filter
        # context — no score contribution, post-scoring like
        # filter_lang/filter_ranges (exact under pruning: a filter only
        # removes docs, so the running theta built from filtered scores
        # never over-prunes)
        for fld, val in filter_kw:
            got = s.field_for(fld, cand)
            keep_f = (
                got == val if isinstance(val, str) else np.isin(got, val)
            )
            cand, acc = cand[keep_f], acc[keep_f]
            if cand.size == 0:
                return cand, acc
    if filter_geo is not None and cand.size:
        # ES geo_distance filter clause: post-scoring like the other
        # filters (exact under pruning — only removes docs)
        keep_g = _geo_keep(s, cand, filter_geo)
        cand, acc = cand[keep_g], acc[keep_g]
        if cand.size == 0:
            return cand, acc
    if filter_geo_poly is not None and cand.size:
        # ES geo_polygon filter clause: convex half-plane tests,
        # post-scoring like filter_geo (exact under pruning)
        keep_p = _geo_poly_keep(s, cand, filter_geo_poly)
        cand, acc = cand[keep_p], acc[keep_p]
        if cand.size == 0:
            return cand, acc
    if filter_script is not None and cand.size:
        # ES `script` query in filter context: whitelisted comparison
        # expression over numeric docvalues — post-scoring like the other
        # filters (exact under pruning: only removes docs)
        keep_s = _script_filter_keep(s, cand, filter_script)
        cand, acc = cand[keep_s], acc[keep_s]
        if cand.size == 0:
            return cand, acc
    if must_not_terms:
        # ES bool must_not: docs containing ANY excluded term are dropped.
        # Filter AFTER scoring (like tombstones): the essential-term
        # scatter requires cand to contain every essential posting.
        excl_lists = []
        for t in must_not_terms:
            ti2 = s.lookup(t)
            if ti2 >= 0:
                excl_lists.append(s.postings_with_dl(ti2)[0])
        if excl_lists:
            excl = np.unique(np.concatenate(excl_lists))
            keep_mn = ~np.isin(cand, excl, assume_unique=True)
            cand, acc = cand[keep_mn], acc[keep_mn]
            if cand.size == 0:
                return cand, acc
    if s.tombstones is not None and s.tombstones.size:
        # deleted-doc mask (ES: deletes hide docs immediately; stats stay
        # stale until merge).  Filter AFTER scoring: the essential-term
        # scatter requires cand to contain every essential posting.
        pos = np.searchsorted(s.tombstones, cand)
        pos_c = np.minimum(pos, s.tombstones.size - 1)
        dead = s.tombstones[pos_c] == cand
        if dead.any():
            cand, acc = cand[~dead], acc[~dead]
    return cand, np.asarray(round6(acc))


class QueryStage:
    """Actor-pool query stage over a queries Dataset — every actor loads
    the WHOLE index.  Right only when the index is small (tests, single
    node); for the scale path see ``run_queries`` below."""

    def __init__(self, index_dir: str, cfg: EngineConfig = DEFAULT):
        self.searcher = IndexSearcher(index_dir, cfg)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return self.searcher.search_batch(batch)


class _SegmentCacheStage:
    """Shared base of the segment-parallel query stages: the DATA axis is
    segments, the query plan is the broadcast small side (ray.put once —
    the M6 broadcast-lookup rule).  Each actor lazily loads and LRU-caches
    only the segments its batches name, so index memory is partitioned
    across the pool instead of replicated per actor — the property that
    lets query throughput scale with the cluster when segments >> actors
    (a 100 TB index can never be loaded whole into one worker).  Without
    the cap every long-lived actor would converge toward holding the WHOLE
    index (Ray Data gives no block->actor affinity)."""

    def __init__(self, index_dir, plan_ref, cfg: EngineConfig):
        from collections import OrderedDict

        import ray

        # str = single index; list = ES multi-index search (/idx1,idx2/_search):
        # batch rows then carry an index_id column selecting the directory
        self.index_dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
        # the driver's multi test is list-ness, NOT target count: a
        # 1-element list (alias over one index, fresh rollover) still
        # merges on an index_id column — the stage must emit it
        self.multi = not isinstance(index_dir, str)
        self.index_dir = self.index_dirs[0]
        self.cfg = cfg
        if plan_ref is not None:
            # None = resident-searcher construction (query/searcher.py):
            # the plan arrives per score() call via _init_payload, while
            # the segment LRU below persists across query batches
            self._init_payload(ray.get(plan_ref))
        self.segments: OrderedDict[tuple, Segment] = OrderedDict()
        self.cache_cap = max(1, cfg.scorer_segment_cache)

    def _init_payload(self, payload) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def _segment(self, pid: int, iid: int = 0) -> Segment:
        seg = self.segments.get((iid, pid))
        if seg is None:
            tm = (
                self.tomb_map[iid]
                if isinstance(self.tomb_map, list)
                else self.tomb_map
            )
            seg = self.segments[(iid, pid)] = Segment.load(
                self.index_dirs[iid], pid, tm.get(str(pid), [])
            )
            while len(self.segments) > self.cache_cap:
                self.segments.popitem(last=False)
        else:
            self.segments.move_to_end((iid, pid))
        return seg


# ES function_score field_value_factor modifiers (ES semantics: `log`
# is base-10; `ln` natural).  Subset of the ES list — the ones that are
# well-defined for non-negative doc metadata.
_FVF_MODIFIERS = {
    "none": lambda v: v,
    "log1p": lambda v: np.log10(1.0 + v),
    "ln1p": lambda v: np.log1p(v),
    "sqrt": np.sqrt,
    "square": np.square,
}


def _apply_fvf(seg: Segment, ids: np.ndarray, scores: np.ndarray, fvf: tuple) -> np.ndarray:
    """function_score field_value_factor, boost_mode=multiply (the ES
    default): score := round6(score * modifier(field * factor)); missing
    field values use the configured neutral."""
    fld, modifier, factor, missing = fvf
    vals = seg.nums_for(fld, ids)
    vals = np.where(np.isnan(vals), float(missing), vals) * float(factor)
    return np.floor(scores * _FVF_MODIFIERS[modifier](vals) * 1e6 + 0.5) / 1e6


_SCRIPT_FUNCS = {
    "ln": np.log,
    "ln1p": np.log1p,
    "log10": np.log10,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "min": np.minimum,
    "max": np.maximum,
}

_SCRIPT_OPS = {
    "Add": np.add, "Sub": np.subtract, "Mult": np.multiply,
    "Div": np.divide, "Pow": np.power,
}


def _script_fields(src: str) -> tuple:
    """Validate an ES script_score expression (the engine's whitelisted
    painless-expression subset: numbers, +-*/ **, unary -, _score, doc
    numeric fields by bare name, and the ln/ln1p/log10/sqrt/abs/min/max
    functions) and return the referenced field names.  Raises ValueError
    on anything outside the whitelist — scripts are data, never eval'd."""
    import ast

    tree = ast.parse(src, mode="eval")
    fields: set[str] = set()

    def walk(node) -> None:
        if isinstance(node, ast.Expression):
            walk(node.body)
        elif isinstance(node, ast.BinOp):
            if type(node.op).__name__ not in _SCRIPT_OPS:
                raise ValueError(f"script_score: operator {type(node.op).__name__}")
            walk(node.left)
            walk(node.right)
        elif isinstance(node, ast.UnaryOp):
            if not isinstance(node.op, (ast.USub, ast.UAdd)):
                raise ValueError("script_score: unary operator")
            walk(node.operand)
        elif isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ValueError("script_score: non-numeric constant")
        elif isinstance(node, ast.Name):
            if node.id != "_score":
                fields.add(node.id)
        elif isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _SCRIPT_FUNCS:
                raise ValueError("script_score: unknown function")
            if node.keywords:
                raise ValueError("script_score: keyword args")
            want_args = 2 if node.func.id in ("min", "max") else 1
            if len(node.args) != want_args:
                raise ValueError(
                    f"script_score: {node.func.id} takes {want_args} args"
                )
            for a in node.args:
                walk(a)
        else:
            raise ValueError(
                f"script_score: unsupported syntax {type(node).__name__}"
            )

    walk(tree)
    return tuple(sorted(fields))


_FILTER_CMP = {
    "Lt": np.less, "LtE": np.less_equal,
    "Gt": np.greater, "GtE": np.greater_equal,
    "Eq": np.equal, "NotEq": np.not_equal,
}


def _script_filter_sides(src: str) -> tuple[str, str, str]:
    """Validate an ES `script` query (filter context) source — the
    whitelisted subset is ``arith CMP arith`` where each side is the
    script_score arithmetic whitelist (no ``_score``: filter context has
    no score) and CMP is one of < <= > >= == != — and return
    (left_src, cmp_name, right_src).  Raises ValueError outside the
    whitelist; scripts are data, never eval'd."""
    import ast

    node = ast.parse(src, mode="eval").body
    if not isinstance(node, ast.Compare) or len(node.ops) != 1:
        raise ValueError("script filter: expected a single comparison")
    cmp_name = type(node.ops[0]).__name__
    if cmp_name not in _FILTER_CMP:
        raise ValueError(f"script filter: comparator {cmp_name}")
    for n in ast.walk(node):
        if isinstance(n, ast.Name) and n.id == "_score":
            raise ValueError("script filter: _score unavailable in filter context")
    left = ast.unparse(node.left)
    right = ast.unparse(node.comparators[0])
    _script_fields(left), _script_fields(right)  # arith whitelist gate
    return left, cmp_name, right


def _script_filter_keep(seg: Segment, ids: np.ndarray, src: str) -> np.ndarray:
    """Boolean keep-mask for the ES script filter: evaluate both arith
    sides vectorized (missing numeric values read as 0.0, the script
    convention here) and compare."""
    left, cmp_name, right = _script_filter_sides(src)
    lv = _script_values(seg, ids, left)
    rv = _script_values(seg, ids, right)
    return np.asarray(_FILTER_CMP[cmp_name](lv, rv), dtype=bool)


def _split_fetch_field(ffld: str) -> tuple[str, str | None]:
    """ES script_fields / runtime fields on the retrieval path: a
    fetch_fields entry ``"name=expr"`` is a per-hit COMPUTED column —
    expr is the same whitelisted painless-expression subset script_score
    uses, evaluated vectorized over mapped numeric doc values and
    round6'd.  A plain entry is the ordinary docvalue fetch."""
    if "=" in ffld:
        name, expr = ffld.split("=", 1)
        return name.strip(), expr.strip()
    return ffld, None


def _apply_script_score(
    seg: Segment, ids: np.ndarray, scores: np.ndarray, src: str
) -> np.ndarray:
    """ES script_score query: score := round6(expr(_score, doc fields))
    evaluated vectorized over the whitelisted AST (missing numeric
    values read as 0.0 — the documented neutral)."""
    import ast

    env = {"_score": scores}
    for f in _script_fields(src):
        env[f] = np.nan_to_num(seg.nums_for(f, ids))

    def ev(node) -> np.ndarray:
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.BinOp):
            return _SCRIPT_OPS[type(node.op).__name__](ev(node.left), ev(node.right))
        if isinstance(node, ast.UnaryOp):
            v = ev(node.operand)
            return -v if isinstance(node.op, ast.USub) else v
        if isinstance(node, ast.Constant):
            return np.float64(node.value)
        if isinstance(node, ast.Name):
            return env[node.id]
        # Call — validated by _script_fields
        return _SCRIPT_FUNCS[node.func.id](*(ev(a) for a in node.args))

    out = np.asarray(ev(ast.parse(src, mode="eval")), dtype=np.float64)
    if out.shape != scores.shape:  # constant-only script broadcasts
        out = np.full_like(scores, float(out))
    return np.floor(out * 1e6 + 0.5) / 1e6


def _script_eval_env(env: dict, src: str, n: int) -> np.ndarray:
    """Vectorized whitelisted-expression eval over a prepared name->array
    env (validate with _script_fields first); constant-only scripts
    broadcast to length ``n``."""
    import ast

    def ev(node) -> np.ndarray:
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.BinOp):
            return _SCRIPT_OPS[type(node.op).__name__](ev(node.left), ev(node.right))
        if isinstance(node, ast.UnaryOp):
            v = ev(node.operand)
            return -v if isinstance(node.op, ast.USub) else v
        if isinstance(node, ast.Constant):
            return np.float64(node.value)
        if isinstance(node, ast.Name):
            return env[node.id]
        return _SCRIPT_FUNCS[node.func.id](*(ev(a) for a in node.args))

    out = np.asarray(ev(ast.parse(src, mode="eval")), dtype=np.float64)
    if out.shape != (n,):  # constant-only script broadcasts
        out = np.full(n, float(out))
    return out


def _script_values(seg: Segment, ids: np.ndarray, src: str) -> np.ndarray:
    """Vectorized whitelisted-expression values per matched doc — the
    scripted_metric MAP phase (no ``_score`` binding, no rounding; the
    reduce decides the final precision).  Missing numeric values read as
    0.0, the documented neutral."""
    env: dict[str, np.ndarray] = {}
    for f in _script_fields(src):
        if f == "_score":
            raise ValueError("scripted_metric: _score is not available in map")
        env[f] = np.nan_to_num(seg.nums_for(f, ids))
    return _script_eval_env(env, src, ids.size)


def _apply_rank_feature(
    seg: Segment, ids: np.ndarray, scores: np.ndarray, rf: tuple
) -> np.ndarray:
    """ES rank_feature query in a bool should context: score :=
    round6(bm25 + boost * fn(v)) over a non-negative numeric feature
    field.  fn is saturation v/(v+pivot) (the ES default), log
    ln(scaling_factor + v), or sigmoid v^e/(v^e + pivot^e).  Missing or
    negative values contribute 0 (ES indexes rank_feature as positive;
    absent feature = no contribution)."""
    fld, fn, pivot, boost, exponent = rf
    v = seg.nums_for(fld, ids)
    v = np.where(np.isnan(v) | (v < 0), 0.0, v)
    if fn == "saturation":
        contrib = v / (v + float(pivot))
    elif fn == "log":
        contrib = np.log(float(pivot) + v)
    else:  # sigmoid
        ve = v ** float(exponent)
        contrib = ve / (ve + float(pivot) ** float(exponent))
    return np.floor((scores + float(boost) * contrib) * 1e6 + 0.5) / 1e6


def _apply_distance_feature(
    seg: Segment, ids: np.ndarray, scores: np.ndarray, dfe: tuple
) -> np.ndarray:
    """ES distance_feature query in a bool should context: score :=
    round6(bm25 + boost * pivot / (pivot + |v - origin|)) over a numeric
    or epoch-seconds date field (the ES date/numeric decay — closer to
    the origin scores higher, exactly pivot/2·boost at distance=pivot).
    Docs missing the field get no contribution (ES: the clause simply
    doesn't match them)."""
    fld, origin, pivot, boost = dfe
    v = seg.nums_for(fld, ids)
    dist = np.abs(v - float(origin))
    contrib = np.where(
        np.isnan(v), 0.0, float(pivot) / (float(pivot) + dist)
    )
    return np.floor((scores + float(boost) * contrib) * 1e6 + 0.5) / 1e6


def _apply_decay(
    seg: Segment, ids: np.ndarray, scores: np.ndarray, dc: tuple
) -> np.ndarray:
    """ES function_score decay functions (gauss / exp / linear,
    boost_mode=multiply): score := round6(bm25 * decay(v)) with
    dist = max(0, |v - origin| - offset) and
      gauss:  exp(ln(decay) * dist^2 / scale^2)
      exp:    exp(ln(decay) * dist / scale)
      linear: max(0, (s - dist) / s),  s = scale / (1 - decay)
    so the multiplier is exactly ``decay`` at distance ``scale`` past the
    offset (the ES contract).  Docs missing the field keep their score
    (neutral multiplier 1.0)."""
    fld, func, origin, scale, offset, decay = dc
    v = seg.nums_for(fld, ids)
    dist = np.maximum(np.abs(v - float(origin)) - float(offset), 0.0)
    if func == "gauss":
        mult = np.exp(np.log(float(decay)) * dist * dist / (float(scale) * float(scale)))
    elif func == "exp":
        mult = np.exp(np.log(float(decay)) * dist / float(scale))
    else:  # linear
        s = float(scale) / (1.0 - float(decay))
        mult = np.maximum((s - dist) / s, 0.0)
    mult = np.where(np.isnan(v), 1.0, mult)
    return np.floor(scores * mult * 1e6 + 0.5) / 1e6


class UnionDfStage(_SegmentCacheStage):
    """Cross-field UNION document frequency per query term — the global
    stats a combined_fields (BM25F) idf needs (per-field dfs overlap, so
    the dictionary-only df pass cannot provide them).  Segment-parallel;
    emits one (term_idx, df_partial) row per (segment, term) — shuffle
    volume is terms x segments, never doc rows."""

    def _init_payload(self, payload) -> None:
        self.terms, self.fields, self.tomb_map = payload

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(len(self.terms), dtype=np.int64)
        iids = (
            batch["index_id"].astype(int).to_numpy()
            if "index_id" in batch.columns
            else np.zeros(len(batch), dtype=np.int64)
        )
        for pid, iid in zip(batch["part_id"].astype(int), iids):
            acc += segment_union_df(
                self._segment(pid, int(iid)), self.terms, self.fields
            )
        return pd.DataFrame(
            {
                "term_idx": np.arange(len(self.terms), dtype=np.int64),
                "df_partial": acc,
            }
        )


def _collect_union_df(
    index_dir,
    part_rows: list[tuple[int, int]],
    terms: list[str],
    fields: list[str],
    tomb_map,
    cfg: EngineConfig,
    concurrency: int,
) -> np.ndarray:
    """Distributed cross-field union df for ``terms`` (BM25F stats
    pass).  ``index_dir`` may be a list (multi-index search: doc
    partitions are disjoint across indexes too, so per-segment unions
    still sum exactly).  Output is terms-sized — tiny — so the driver
    sums it."""
    import ray
    import ray.data as rd

    multi = not isinstance(index_dir, str)
    payload_ref = ray.put((terms, fields, tomb_map))
    shard_df = pd.DataFrame({"part_id": [p for _, p in part_rows]})
    if multi:
        shard_df["index_id"] = [iid for iid, _ in part_rows]
    n_blocks = max(concurrency * 2, len(part_rows) // 4)
    shards = rd.from_pandas(shard_df).repartition(
        max(1, min(n_blocks, len(part_rows)))
    )
    partials = shards.map_batches(
        UnionDfStage,
        fn_constructor_args=(index_dir, payload_ref, cfg),
        batch_format="pandas",
        batch_size=8,
        concurrency=concurrency,
    ).to_pandas()
    out = np.zeros(len(terms), dtype=np.int64)
    if len(partials):
        g = partials.groupby("term_idx")["df_partial"].sum()
        out[g.index.to_numpy()] = g.to_numpy()
    return out


class ShardScorerStage(_SegmentCacheStage):
    """Segment-parallel BM25/phrase scoring (see _SegmentCacheStage)."""

    def _init_payload(self, payload) -> None:
        # plan: list of UNIQUE (terms, idf, k) entries, each carrying the
        # query_ids that share it — identical queries score once per shard
        (self.plan, self.avgdl, self.k1, self.b, self.tomb_map,
         self.fetch_text, *rest) = payload
        self.fetch_fields = rest[0] if rest else ()
        # ES indices_boost (multi-index search): per-index score
        # multiplier, applied before the per-segment cut
        self.indices_boost = rest[1] if len(rest) > 1 else None
        # per-plan top-k score pool seen by THIS actor (descending) — the
        # running MaxScore threshold for later segments
        self._score_pool: dict[int, np.ndarray] = {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        multi = self.multi
        iids = (
            batch["index_id"].astype(int).to_numpy()
            if "index_id" in batch.columns
            else np.zeros(len(batch), dtype=np.int64)
        )
        for pid, iid in zip(batch["part_id"].astype(int), iids):
            # routed plans (ES ?routing=) name their covering segments as
            # (index_id, segment_id) pairs; a batch whose every plan skips
            # never loads the segment at all
            todo = [
                q for q in self.plan
                if q.get("only_sids") is None
                or (int(iid), int(pid)) in q["only_sids"]
            ]
            if not todo:
                continue
            seg = self._segment(pid, int(iid))
            for q in todo:
                # running MaxScore threshold: the k-th best score this
                # actor has already seen for this plan (monotone rising).
                # Exact: a doc pruned here scores < the actor-local k-th
                # <= the global k-th, so it cannot enter the merged
                # top-k.  Margin 2e-6 guards the 6dp rounding boundary.
                pool = self._score_pool.get(q["plan_id"])
                theta = (
                    float(pool[-1]) - 2e-6
                    if pool is not None and pool.size >= q["k"]
                    else None
                )
                if (
                    q.get("fvf") is not None
                    or q.get("rescore")
                    or q.get("rank_feature") is not None
                    or q.get("distance_feature") is not None
                    or q.get("decay") is not None
                    or q.get("script_score") is not None
                ):
                    # function_score / rescore / rank_feature /
                    # distance_feature / script_score: the pool holds
                    # COMBINED scores, so a
                    # BM25 theta would prune docs whose boost could lift
                    # them into the top-k
                    theta = None
                if self.indices_boost is not None:
                    # per-index boosts: the pool holds BOOSTED scores,
                    # an unboosted BM25 bound cannot be compared to it
                    theta = None
                if "intervals" in q:
                    ids, scores = score_segment_intervals(
                        seg, q["intervals"], q["idf_sum"],
                        q.get("avgdl") or self.avgdl, self.k1, self.b,
                        q.get("max_gaps", 0), dl_field=q.get("dl_field"),
                    )
                elif "span_or" in q:
                    ids, scores = score_segment_span_or(
                        seg, q["span_or"], q["idf_sum"],
                        q.get("avgdl") or self.avgdl, self.k1, self.b,
                        dl_field=q.get("dl_field"),
                    )
                elif "span_not" in q:
                    ids, scores = score_segment_span_not(
                        seg, q["span_not"], q["exclude"],
                        q.get("pre", 0), q.get("post", 0), q["idf_sum"],
                        q.get("avgdl") or self.avgdl, self.k1, self.b,
                        dl_field=q.get("dl_field"),
                    )
                elif "wterms" in q:
                    ids, scores = score_segment_weighted_terms(
                        seg, q["wterms"], q["wweights"],
                        dl_field=q.get("dl_field"),
                    )
                elif "span_contain" in q:
                    ids, scores = score_segment_span_contain(
                        seg, q["span_contain"], q["little"], q["idf_sum"],
                        q.get("avgdl") or self.avgdl, self.k1, self.b,
                        q.get("slop", 0), q["mode"], dl_field=q.get("dl_field"),
                    )
                elif "span_multi" in q:
                    ids, scores = score_segment_span_multi(
                        seg, q["span_multi"], q["idf_sum"],
                        q.get("avgdl") or self.avgdl, self.k1, self.b,
                        q.get("slop", 0), dl_field=q.get("dl_field"),
                    )
                elif "span" in q:
                    ids, scores = score_segment_span_near(
                        seg, q["span"], q["idf_sum"],
                        q.get("avgdl") or self.avgdl, self.k1, self.b,
                        q.get("slop", 0), dl_field=q.get("dl_field"),
                        first_end=q.get("first_end"),
                    )
                elif "phrase" in q:
                    ids, scores = score_segment_phrase(
                        seg, q["phrase"], q["idf_sum"],
                        q.get("avgdl") or self.avgdl, self.k1, self.b,
                        q.get("slop", 0), dl_field=q.get("dl_field"),
                    )
                elif "bool" in q:
                    bq = q["bool"]
                    ids, scores = score_segment_bool(
                        seg, bq["must"], bq["should"], bq["mn_terms"], bq["msm"],
                        self.avgdl, self.k1, self.b,
                        phrases=bq.get("phrases"),
                    )
                elif "mm" in q:
                    # multi_match most_fields: per-field BM25 summed per
                    # doc INSIDE the segment (a doc lives in exactly one
                    # segment, so the global merge of per-segment windows
                    # stays exact); pruning off — per-field thresholds
                    # cannot bound the cross-field sum
                    ids_l, sc_l = [], []
                    for pf in q["mm"]:
                        i2, s2 = score_segment(
                            seg, pf["terms"], pf["idf"], pf["avgdl"],
                            self.k1, self.b, None, dl_field=pf["field"],
                        )
                        if i2.size:
                            ids_l.append(i2)
                            sc_l.append(s2 * pf.get("boost", 1.0))
                    if not ids_l:
                        continue
                    ids, inv = np.unique(np.concatenate(ids_l), return_inverse=True)
                    all_sc = np.concatenate(sc_l)
                    acc = np.zeros(ids.size, dtype=np.float64)
                    np.add.at(acc, inv, all_sc)
                    mode, tb = q.get("mm_mode", ("sum", 0.0))
                    if mode == "max":
                        # ES dis_max: best field + tie_breaker x the rest
                        mx = np.zeros(ids.size, dtype=np.float64)
                        np.maximum.at(mx, inv, all_sc)
                        acc = mx + tb * (acc - mx)
                    scores = np.asarray(round6(acc))
                elif "xf" in q:
                    # ES multi_match cross_fields (term-centric): per doc
                    # per TERM the best field's blended-idf BM25 x boost,
                    # summed over terms; pruning off (no single-field UB
                    # bounds the cross-field max)
                    x = q["xf"]
                    term_frames = []
                    for ti, t in enumerate(x["terms"]):
                        ids_t, sc_t = [], []
                        for f, boost in zip(x["fields"], x["boosts"]):
                            i2, s2 = score_segment(
                                seg, [f"{f}\x1f{t}"],
                                np.array([x["idf"][ti]], dtype=np.float64),
                                x["avgdl"][f], self.k1, self.b, None,
                                dl_field=f,
                            )
                            if i2.size:
                                ids_t.append(i2)
                                sc_t.append(s2 * boost)
                        if not ids_t:
                            continue
                        u, inv_t = np.unique(
                            np.concatenate(ids_t), return_inverse=True
                        )
                        mx_t = np.zeros(u.size, dtype=np.float64)
                        np.maximum.at(mx_t, inv_t, np.concatenate(sc_t))
                        term_frames.append((u, mx_t))
                    if not term_frames:
                        continue
                    ids, inv = np.unique(
                        np.concatenate([u for u, _ in term_frames]),
                        return_inverse=True,
                    )
                    acc = np.zeros(ids.size, dtype=np.float64)
                    np.add.at(
                        acc, inv,
                        np.concatenate([m for _, m in term_frames]),
                    )
                    scores = np.asarray(round6(acc))
                elif "cf" in q:
                    # ES combined_fields (BM25F): blended tf/dl across
                    # weighted fields, idf from the broadcast union-df
                    # stats pass; pruning not applicable (no per-term UB
                    # for the blended tf)
                    c = q["cf"]
                    ids, scores = score_segment_combined(
                        seg, q["terms"], c["fields"], c["weights"],
                        c["idf"], c["avgdl_c"], self.k1, self.b,
                    )
                elif "rseed" in q:
                    # ES function_score random_score: deterministic
                    # seeded pseudo-random score per (seed, doc_id) —
                    # reproducible corpus sampling through the query
                    # path.  Contract: (md5_number_lower(f"{seed}:{id}")
                    # % 1e6) / 1e6 — 6dp-exact, DuckDB-replayable (the
                    # sampling-ops md5 contract, pipelines/sampling.py)
                    ids = segment_matching_ids(
                        seg, q["terms"], q.get("require_all", False),
                        q.get("filter_lang"), q.get("filter_ranges"),
                        q.get("filter_kw"),
                    )
                    if ids.size == 0:
                        continue
                    seed_r = q["rseed"]
                    scores = np.array(
                        seeded_hash_mod(ids, 1_000_000, prefix=f"{seed_r}:") / 1e6,
                        dtype=np.float64,
                    )
                elif "idsq" in q:
                    # ES ids query: docs whose external key (_id) is in
                    # the given set, constant score 1.0, ties doc_id asc;
                    # key-hash point lookups, newest live version per key
                    rows_k, _ = seg.find_keys(
                        np.asarray(q["idsq"], dtype=object)
                    )
                    if rows_k.size == 0:
                        continue
                    ids = seg.doc_ids_store[rows_k]
                    if seg.tombstones is not None and seg.tombstones.size:
                        pos_t = np.minimum(
                            np.searchsorted(seg.tombstones, ids),
                            seg.tombstones.size - 1,
                        )
                        alive_k = seg.tombstones[pos_t] != ids
                        rows_k, ids = rows_k[alive_k], ids[alive_k]
                    if ids.size == 0:
                        continue
                    # newest live version per key (the mget LWW rule)
                    kk = seg._take_str(seg.keys_arr, rows_k)
                    df_k = pd.DataFrame({"k": kk, "i": ids})
                    ids = np.sort(
                        df_k.groupby("k")["i"].max().to_numpy(dtype=np.int64)
                    )[: q["k"]]
                    scores = np.full(ids.size, 1.0, dtype=np.float64)
                elif "const" in q:
                    # constant_score: every score ties at the boost, so
                    # the global top-k = the k smallest matching doc_ids;
                    # match sets are sorted, so ids[:k] per shard is
                    # exact and the shuffle stays O(k x shards).  The
                    # match set may come from ANY MatchSet-family source
                    # (terms, prefix, wildcard, fuzzy, regexp, exists) —
                    # the ES constant_score / filter-context rewrite.
                    ids = _segment_match_ids_for_plan(seg, q)[: q["k"]]
                    scores = np.full(ids.size, q["const"], dtype=np.float64)
                elif "mbp" in q:
                    mb = q["mbp"]
                    if mb["terms"]:
                        ids1, sc1 = score_segment(
                            seg, mb["terms"], mb["idf"], self.avgdl,
                            self.k1, self.b, None,
                        )
                    else:
                        ids1 = np.array([], dtype=np.int64)
                        sc1 = np.array([], dtype=np.float64)
                    pids = segment_prefix_matching_ids(seg, mb["prefix"])
                    ids = np.union1d(ids1, pids)
                    if ids.size == 0:
                        continue
                    acc = np.zeros(ids.size, dtype=np.float64)
                    if ids1.size:
                        acc[np.searchsorted(ids, ids1)] += sc1
                    if pids.size:
                        acc[np.searchsorted(ids, pids)] += 1.0
                    scores = np.asarray(round6(acc))
                else:
                    if q.get("neg_terms"):
                        # boosting-query demotion happens after scoring;
                        # keep pruning off (the pool holds demoted scores)
                        theta = None
                    ids, scores = score_segment(
                        seg,
                        q["terms"],
                        q["idf"],
                        q.get("avgdl") or self.avgdl,
                        self.k1,
                        self.b,
                        theta,
                        require_all=q.get("require_all", False),
                        filter_lang=q.get("filter_lang"),
                        must_not_terms=q.get("must_not"),
                        dl_field=q.get("dl_field"),
                        filter_ranges=q.get("filter_ranges"),
                        filter_kw=q.get("filter_kw"),
                        filter_geo=q.get("filter_geo"),
                        filter_script=q.get("filter_script"),
                        filter_geo_poly=q.get("filter_geo_poly"),
                    )
                    if q.get("fvf") is not None and ids.size:
                        scores = _apply_fvf(seg, ids, scores, q["fvf"])
                    if q.get("rank_feature") is not None and ids.size:
                        scores = _apply_rank_feature(
                            seg, ids, scores, q["rank_feature"]
                        )
                    if q.get("distance_feature") is not None and ids.size:
                        scores = _apply_distance_feature(
                            seg, ids, scores, q["distance_feature"]
                        )
                    if q.get("decay") is not None and ids.size:
                        scores = _apply_decay(seg, ids, scores, q["decay"])
                    if q.get("script_score") is not None and ids.size:
                        scores = _apply_script_score(
                            seg, ids, scores, q["script_score"]
                        )
                    rsc = q.get("rescore")
                    if rsc is not None and ids.size:
                        # ES rescore: per-SHARD top-window by base score
                        # (ties kept), combined = round6(qw*base +
                        # rw*phrase); docs outside the window keep their
                        # base score (the ES window contract)
                        win = rsc["window"]
                        if ids.size > win:
                            kth_w = -np.partition(-scores, win - 1)[win - 1]
                            in_w = scores >= kth_w
                        else:
                            in_w = np.ones(ids.size, dtype=bool)
                        p_ids, p_sc = score_segment_phrase(
                            seg, rsc["phrase"], rsc["idf_sum"],
                            self.avgdl, self.k1, self.b,
                        )
                        wids = ids[in_w]
                        add = np.zeros(wids.size, dtype=np.float64)
                        if p_ids.size and wids.size:
                            o = np.argsort(p_ids, kind="stable")
                            p_ids, p_sc = p_ids[o], p_sc[o]
                            pos = np.searchsorted(p_ids, wids)
                            pos_c = np.minimum(pos, p_ids.size - 1)
                            hit = p_ids[pos_c] == wids
                            add[hit] = p_sc[pos_c[hit]]
                        scores = scores.copy()
                        scores[in_w] = (
                            np.floor(
                                (rsc["qw"] * scores[in_w] + rsc["rw"] * add)
                                * 1e6 + 0.5
                            ) / 1e6
                        )
                    if q.get("neg_terms") and ids.size:
                        # ES boosting query: docs matching the negative
                        # query are demoted by negative_boost (relative
                        # order within the demoted set is preserved)
                        neg_lists = []
                        for nt in q["neg_terms"]:
                            nti = seg.lookup(nt)
                            if nti >= 0:
                                neg_lists.append(seg.postings_with_dl(nti)[0])
                        if neg_lists:
                            neg_ids = np.unique(np.concatenate(neg_lists))
                            demote = np.isin(ids, neg_ids, assume_unique=True)
                            scores = np.where(
                                demote,
                                np.floor(scores * q["neg_boost"] * 1e6 + 0.5)
                                / 1e6,
                                scores,
                            )
                    sa = q.get("search_after")
                    if sa is not None and ids.size:
                        keep_sa = _after_cursor_mask(ids, scores, sa)
                        ids, scores = ids[keep_sa], scores[keep_sa]
                if self.indices_boost is not None and ids.size:
                    # ES indices_boost: scores of THIS index scale before
                    # the cut/pool, so the cross-index merge is exact
                    bst = float(self.indices_boost[int(iid)])
                    if bst != 1.0:
                        scores = np.floor(scores * bst * 1e6 + 0.5) / 1e6
                ms = q.get("min_score")
                if ms is not None and ids.size:
                    # ES min_score: hits below the floor never reach the
                    # merge (per-shard exact — removal only)
                    keep_ms = scores >= ms
                    ids, scores = ids[keep_ms], scores[keep_ms]
                if ids.size == 0:
                    continue
                k = q["k"]
                if ids.size > k:
                    kth = -np.partition(-scores, k - 1)[k - 1]
                    sel = np.flatnonzero(scores >= kth)
                    ids, scores = ids[sel], scores[sel]
                merged = np.sort(
                    np.concatenate([pool, scores]) if pool is not None else scores
                )[::-1][:k]
                self._score_pool[q["plan_id"]] = merged
                keys = seg.keys_for(ids)
                # emit per PLAN; repeated queries fan out only after the
                # merge (keeps the shuffle proportional to unique plans)
                cols = {
                    "plan_id": np.int64(q["plan_id"]),
                    "doc_id": ids,
                    "key": keys,
                    "score": scores,
                }
                if multi:
                    cols["index_id"] = np.int64(iid)
                if self.fetch_text:
                    # stored-_source fetch for the per-segment top-k
                    # candidates only (<= k + ties rows, never the match set)
                    cols["text"] = seg.texts_for(ids)
                for ffld in self.fetch_fields:
                    # ES fields/docvalue_fields retrieval: mapped
                    # docstore columns for the candidates only;
                    # "name=expr" = script_fields (computed, round6)
                    name, expr = _split_fetch_field(ffld)
                    if expr is not None:
                        v = _script_values(seg, ids, expr)
                        cols[name] = np.floor(v * 1e6 + 0.5) / 1e6
                    else:
                        cols[name] = (
                            seg.nums_for(name, ids)
                            if name in seg.num_arr
                            else seg.field_for(name, ids)
                        )
                out.append(pd.DataFrame(cols))
        if not out:
            empty = {
                "plan_id": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
            if multi:
                empty["index_id"] = pd.Series([], dtype=np.int64)
            if self.fetch_text:
                empty["text"] = pd.Series([], dtype=object)
            for ffld in self.fetch_fields:
                empty[_split_fetch_field(ffld)[0]] = pd.Series([], dtype=object)
            return pd.DataFrame(empty)
        return pd.concat(out, ignore_index=True)


class MatchSetStage(_SegmentCacheStage):
    """Segment-parallel match-SET evaluation: _count and terms-agg
    partials.  Emits one row per (plan, segment[, field value]) — the
    shuffle volume is plans x segments (x distinct values), never doc
    rows."""

    def _init_payload(self, payload) -> None:
        pay = (*payload, None, None, None)[:6]
        (self.plan, self.tomb_map, self.field, self.shard_size,
         self.terminate_after, self.sample) = pay

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for q in self.plan:
                ids = _segment_match_ids_for_plan(seg, q)
                if ids.size == 0:
                    continue
                if self.sample is not None and ids.size:
                    # ES random_sampler: keep each matched doc iff
                    # md5_number_lower(f"{seed}:{doc_id}") % 1e6 < p*1e6
                    # — the engine-wide sampling md5 contract
                    # (seeded_hash_mod: random to the corpus,
                    # deterministic to reruns/resharding, DuckDB-replayable)
                    seed, keep_mod = self.sample
                    h = seeded_hash_mod(ids, 1_000_000, prefix=f"{seed}:")
                    ids = ids[h < keep_mod]
                    if ids.size == 0:
                        continue
                if self.field is None:  # _count: one partial per segment
                    n_seg = int(ids.size)
                    if self.terminate_after is not None:
                        # ES terminate_after: the shard stops collecting
                        # at the cap; == cap means "maybe more existed"
                        ta = int(self.terminate_after)
                        if n_seg >= ta:
                            out.append((q["plan_id"], 1, "", 1))
                            n_seg = ta
                    out.append((q["plan_id"], 0, "", n_seg))
                else:  # terms agg: per-value partial counts
                    vals, n = np.unique(seg.field_for(self.field, ids), return_counts=True)
                    if self.shard_size is not None and vals.size > int(self.shard_size):
                        # ES shard_size truncation: keep the shard's top
                        # buckets (n desc, value asc); the smallest KEPT
                        # count is this shard's contribution to
                        # doc_count_error_upper_bound (the ES bound),
                        # emitted as a kind=2 error-bound row
                        order = np.lexsort((vals, -n))[: int(self.shard_size)]
                        vals, n = vals[order], n[order]
                        out.append((q["plan_id"], 2, "", int(n.min())))
                    out.extend((q["plan_id"], 0, str(v), int(c)) for v, c in zip(vals, n))
        # ``kind`` keys the row type (0 = value/count partial, 1 =
        # terminate_after flag, 2 = shard_size error bound).  Flags used
        # to ride the value column as "\x00..."-prefixed sentinels —
        # pandas groupby hashes strings as C strings, so "\x00ta"
        # MERGED with "" whenever both landed in one exchange bucket
        # (counts silently inflated, flags lost; round-5 find).  A NUL
        # can never reach pandas group keys.
        return pd.DataFrame(
            out, columns=["plan_id", "kind", "value", "n_partial"]
        ).astype({"plan_id": np.int64, "kind": np.int64, "n_partial": np.int64}) if out else pd.DataFrame(
            {
                "plan_id": pd.Series([], dtype=np.int64),
                "kind": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=object),
                "n_partial": pd.Series([], dtype=np.int64),
            }
        )


def _fixed_interval_secs(unit: str) -> int | None:
    """ES date_histogram fixed_interval grammar ("90s"/"15m"/"6h"/"7d")
    -> seconds, or None when ``unit`` is not a fixed interval."""
    import re as _re

    m = _re.fullmatch(r"(\d+)(s|m|h|d)", unit)
    if not m:
        return None
    return int(m.group(1)) * {"s": 1, "m": 60, "h": 3600, "d": 86400}[m.group(2)]


def _calendar_floor(epoch_s: np.ndarray, unit: str) -> np.ndarray:
    """Calendar bucketing of epoch-second values (ES date_histogram
    calendar_interval): returns the bucket-start epoch seconds.  Weeks
    start Monday (ES/ISO); numpy's epoch-anchored week unit does not.
    ``unit`` may also be an ES fixed_interval ("90s"/"15m"/"6h"/"7d"):
    epoch-anchored fixed-width buckets (the ES fixed_interval anchor)."""
    secs = epoch_s.astype(np.int64)
    fx = _fixed_interval_secs(unit)
    if fx is not None:
        return secs // fx * fx
    if unit == "day":
        return secs // 86400 * 86400
    if unit == "week":
        days = secs // 86400
        # epoch day 0 = Thursday; day 4 (1970-01-05) is the first Monday
        return ((days - 4) // 7 * 7 + 4) * 86400
    if unit == "month":
        months = secs.astype("datetime64[s]").astype("datetime64[M]")
        return months.astype("datetime64[s]").astype(np.int64)
    if unit == "year":
        years = secs.astype("datetime64[s]").astype("datetime64[Y]")
        return years.astype("datetime64[s]").astype(np.int64)
    raise ValueError(f"unsupported calendar interval {unit!r}")


class NumericAggStage(_SegmentCacheStage):
    """Segment-parallel numeric aggregations over match sets.  The
    ``interval`` payload field selects the mode:

    - None -> stats partial (one n/sum/ss/min/max row per plan x segment;
      ss = sum of squares feeds extended_stats variance),
    - 0.0 -> exact per-value counts (percentiles),
    - float -> fixed-interval histogram bucket counts,
    - str ("day"/"week"/"month"/"year") -> ES date_histogram
      calendar_interval over an epoch-seconds numeric field,
    - "missing" -> ES missing aggregation (per plan x segment: count of
      match-set docs whose mapped field has no value; ``sum`` carries
      the match-set size),
    - tuple/list of floats -> ES range aggregation (bucket key = the
      range's lower edge; values below the first edge are dropped, the
      last edge is open-ended — ES explicit-ranges semantics).

    ``field`` may be a (x_field, y_field) pair -> matrix_stats partials
    (n, sx, sy, sxx, syy, sxy packed into sum/sy/ss/syy/sxy), or None
    (doc counts only — composite aggregation).  ``group_field`` (ES
    terms-bucket sub-agg) may be one keyword field or a tuple of fields
    (ES composite sources; the packed "\\x1f" key is split by the
    runner).  ``metric_field`` (histogram modes only) adds an ES sum
    sub-aggregation per bucket — the per-bucket metric the pipeline
    aggregations (derivative / cumulative_sum / bucket_script /
    stats_bucket) consume — into the otherwise-zero ``sum`` column
    (missing metric values contribute 0, the ES sum-agg semantics).
    Shuffle volume is plans x segments (x buckets x groups), never doc
    rows."""

    _COLS = ["plan_id", "bucket", "n", "sum", "mn", "mx", "ss", "sy", "syy", "sxy"]

    def _init_payload(self, payload) -> None:
        pay = (*payload, None, None)[:6]
        (self.plan, self.tomb_map, self.field, self.interval,
         self.group_field, self.metric) = pay

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        pad = (0.0, 0.0, 0.0, 0.0)  # ss, sy, syy, sxy for count-ish rows
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for q in self.plan:
                ids = _segment_match_ids_for_plan(seg, q)
                if ids.size == 0:
                    continue
                if isinstance(self.field, tuple):
                    # matrix_stats: exact cross moments of (x, y); rows
                    # missing either value are excluded (ES pairwise)
                    xs = seg.nums_for(self.field[0], ids)
                    ys = seg.nums_for(self.field[1], ids)
                    ok = ~(np.isnan(xs) | np.isnan(ys))
                    xs, ys = xs[ok], ys[ok]
                    if xs.size == 0:
                        continue
                    rows.append(
                        (
                            q["plan_id"], 0.0, int(xs.size),
                            float(xs.sum()), 0.0, 0.0,
                            float((xs * xs).sum()), float(ys.sum()),
                            float((ys * ys).sum()), float((xs * ys).sum()),
                        )
                    )
                    continue
                if self.interval == "missing":
                    # ES missing aggregation: match-set docs whose mapped
                    # field has no value (numeric NaN / keyword "" — the
                    # exists-query complement in the same one sweep).
                    # ``sum`` carries the match-set size for the reduce.
                    if self.field == "lang":
                        n_miss = 0  # lang is always present
                    elif self.field in seg.num_arr:
                        n_miss = int(np.isnan(seg.nums_for(self.field, ids)).sum())
                    elif self.field in seg.kw_arr:
                        n_miss = int((seg.field_for(self.field, ids) == "").sum())
                    else:
                        raise ValueError(f"missing: unmapped field {self.field!r}")
                    rows.append(
                        (q["plan_id"], 0.0, n_miss, float(ids.size), 0.0, 0.0, *pad)
                    )
                    continue
                if isinstance(self.field, dict):
                    # virtual fields: scripted_metric map expression, or
                    # the geo aggregations' derived per-doc value
                    if "script" in self.field:
                        all_vals = _script_values(seg, ids, self.field["script"])
                    elif "geo_distance" in self.field:
                        gfld, lat0, lon0 = self.field["geo_distance"]
                        all_vals = _geo_distance_vals(seg, ids, gfld, lat0, lon0)
                    elif "geohash" in self.field:
                        gfld, prec = self.field["geohash"]
                        all_vals = _geohash_vals(seg, ids, gfld, int(prec))
                    else:
                        gfld, zoom = self.field["geotile"]
                        all_vals = _geotile_vals(seg, ids, gfld, int(zoom))
                else:
                    all_vals = (
                        seg.nums_for(self.field, ids)
                        if self.field is not None
                        else np.zeros(ids.size, dtype=np.float64)
                    )
                if self.group_field is not None:
                    # terms-bucket sub-agg: one stats partial per
                    # (plan, keyword value) — groups stream as rows
                    valid = np.ones(ids.size, dtype=bool)
                    if isinstance(self.group_field, tuple):
                        cols = []
                        for f in self.group_field:
                            if ":" in f:
                                # composite date_histogram source
                                # "field:unit": calendar-floored epoch,
                                # zero-padded so packed-string order ==
                                # numeric order; docs missing the value
                                # drop out (ES composite skips them)
                                fld, unit = f.split(":", 1)
                                nums = seg.nums_for(fld, ids)
                                ok_f = ~np.isnan(nums)
                                fl = np.zeros(ids.size, dtype=np.int64)
                                if ok_f.any():
                                    fl[ok_f] = _calendar_floor(nums[ok_f], unit)
                                cols.append(
                                    np.array(
                                        [f"{v:012d}" for v in fl], dtype=object
                                    )
                                )
                                valid &= ok_f
                            else:
                                cols.append(seg.field_for(f, ids).astype(object))
                        gv = cols[0]
                        for c in cols[1:]:
                            gv = gv + "\x1f" + c
                        gv = gv.astype(str)
                    else:
                        gv = seg.field_for(self.group_field, ids)
                    ok = valid & ~np.isnan(all_vals)
                    gv, vs = gv[ok], all_vals[ok]
                    for val in np.unique(gv):
                        sub = vs[gv == val]
                        rows.append(
                            (
                                q["plan_id"], str(val), int(sub.size),
                                float(sub.sum()), float(sub.min()), float(sub.max()),
                                *pad,
                            )
                        )
                    continue
                ok = ~np.isnan(all_vals)
                vals = all_vals[ok]
                if vals.size == 0:
                    continue
                met = None
                if self.metric is not None:
                    met = np.nan_to_num(seg.nums_for(self.metric, ids)[ok])
                if isinstance(self.interval, str):  # date_histogram
                    buckets = _calendar_floor(vals, self.interval)
                    ub, inv = np.unique(buckets, return_inverse=True)
                    cnt = np.bincount(inv)
                    sums = (
                        np.bincount(inv, weights=met)
                        if met is not None
                        else np.zeros(ub.size)
                    )
                    rows.extend(
                        (q["plan_id"], float(b_), int(c_), float(s_), 0.0, 0.0, *pad)
                        for b_, c_, s_ in zip(ub, cnt, sums)
                    )
                elif isinstance(self.interval, (list, tuple)):  # range agg
                    edges = np.asarray(self.interval, dtype=np.float64)
                    pos = np.searchsorted(edges, vals, side="right") - 1
                    keep = pos >= 0
                    ub, cnt = np.unique(edges[pos[keep]], return_counts=True)
                    rows.extend(
                        (q["plan_id"], float(b_), int(c_), 0.0, 0.0, 0.0, *pad)
                        for b_, c_ in zip(ub, cnt)
                    )
                elif self.interval == 0.0:  # exact per-VALUE counts
                    # (percentiles agg; value cardinality bounds the
                    # partial size — right for integer-ish metadata)
                    ub, cnt = np.unique(vals, return_counts=True)
                    rows.extend(
                        (q["plan_id"], float(b_), int(c_), 0.0, 0.0, 0.0, *pad)
                        for b_, c_ in zip(ub, cnt)
                    )
                elif self.interval is None:  # stats partial
                    rows.append(
                        (
                            q["plan_id"], 0.0, int(vals.size),
                            float(vals.sum()), float(vals.min()), float(vals.max()),
                            float((vals * vals).sum()), 0.0, 0.0, 0.0,
                        )
                    )
                else:  # histogram partials (dict payload = ES offset)
                    if isinstance(self.interval, dict):
                        _iv = float(self.interval["interval"])
                        _off = float(self.interval.get("offset", 0.0))
                        buckets = np.floor((vals - _off) / _iv) * _iv + _off
                    else:
                        buckets = np.floor(vals / self.interval) * self.interval
                    ub, inv = np.unique(buckets, return_inverse=True)
                    cnt = np.bincount(inv)
                    sums = (
                        np.bincount(inv, weights=met)
                        if met is not None
                        else np.zeros(ub.size)
                    )
                    rows.extend(
                        (q["plan_id"], float(b_), int(c_), float(s_), 0.0, 0.0, *pad)
                        for b_, c_, s_ in zip(ub, cnt, sums)
                    )
        if rows:
            return pd.DataFrame(rows, columns=self._COLS).astype(
                {"plan_id": np.int64, "n": np.int64}
            )
        empty = {
            "plan_id": pd.Series([], dtype=np.int64),
            "bucket": pd.Series(
                [], dtype=object if self.group_field is not None else np.float64
            ),
            "n": pd.Series([], dtype=np.int64),
        }
        for c in self._COLS[3:]:
            empty[c] = pd.Series([], dtype=np.float64)
        return pd.DataFrame(empty)


class SignificantTextStage(_SegmentCacheStage):
    """Segment-parallel ES significant_text collection: re-analyze the
    stored ``_source`` of each plan's matching docs (ES's significant_text
    model — it re-tokenizes _source rather than relying on a forward
    index) and emit per-(plan, term) foreground doc-count partials, plus
    one sentinel row (term='', n = match-set size) per (plan, segment)
    carrying the foreground total.  Shuffle volume is plans x segments x
    fg vocabulary — never doc rows.  Tokenization uses each doc's own
    lang analyzer, mirroring the build, so fg counts are consistent with
    the dictionary's df."""

    def _init_payload(self, payload) -> None:
        self.plan, self.tomb_map, self.sample_cap = payload

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        out = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for q in self.plan:
                ids = _segment_match_ids_for_plan(seg, q)
                if ids.size == 0:
                    continue
                if self.sample_cap is not None and ids.size > self.sample_cap:
                    # ES sampler analog: deterministic shard sample
                    # (ascending doc id); fgN counts the SAMPLE
                    ids = ids[: self.sample_cap]
                texts = seg.texts_for(ids)
                langs = seg.langs_for(ids)
                pieces = []
                for lang in pd.unique(langs):
                    toks = get_analyzer(lang).tokenize_series(
                        pd.Series(texts[langs == lang])
                    )
                    n_per = toks.map(len).to_numpy(dtype=np.int64)
                    total = int(n_per.sum())
                    if total == 0:
                        continue
                    flat = np.fromiter(
                        chain.from_iterable(toks), dtype=object, count=total
                    )
                    d = np.repeat(np.arange(n_per.size, dtype=np.int64), n_per)
                    pairs = pd.DataFrame({"d": d, "t": flat}).drop_duplicates()
                    pieces.append(pairs.groupby("t", sort=False).size())
                cnt = (
                    pd.concat(pieces).groupby(level=0).sum()
                    if len(pieces) > 1
                    else pieces[0] if pieces else None
                )
                if cnt is not None:
                    out.append(
                        pd.DataFrame(
                            {
                                "plan_id": np.int64(q["plan_id"]),
                                "term": cnt.index.to_numpy(dtype=object),
                                "n_partial": cnt.to_numpy(dtype=np.int64),
                            }
                        )
                    )
                # sentinel: fg total for this (plan, segment) — '' cannot
                # collide with a token (the analyzers never emit empties)
                out.append(
                    pd.DataFrame(
                        {
                            "plan_id": [np.int64(q["plan_id"])],
                            "term": [""],
                            "n_partial": [np.int64(ids.size)],
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "plan_id": pd.Series([], dtype=np.int64),
                    "term": pd.Series([], dtype=object),
                    "n_partial": pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(out, ignore_index=True)


class CollapseTopkStage(_SegmentCacheStage):
    """Segment-parallel ES field collapsing: BM25-score the plan's match
    candidates, keep each segment's BEST doc per collapse-field value,
    then the top-k VALUES by that best-doc score.  Exact: if value v's
    global best doc lives in segment S but v is not among S's top-k
    values, S holds k distinct values whose best docs all outscore it, so
    v's group cannot reach the global top-k groups."""

    def _init_payload(self, payload) -> None:
        self.plan, self.avgdl, self.k1, self.b, self.tomb_map, self.field = payload

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for q in self.plan:
                ids, scores = score_segment(
                    seg, q["terms"], q["idf"], self.avgdl, self.k1, self.b,
                    None,
                    require_all=q.get("require_all", False),
                    filter_lang=q.get("filter_lang"),
                    filter_ranges=q.get("filter_ranges"),
                )
                if ids.size == 0:
                    continue
                vals = seg.field_for(self.field, ids)
                # best doc per value: sort (value, -score, doc) and keep firsts
                order = np.lexsort((ids, -scores, vals))
                v_s, i_s, s_s = vals[order], ids[order], scores[order]
                first = np.ones(v_s.size, dtype=bool)
                first[1:] = v_s[1:] != v_s[:-1]
                v_s, i_s, s_s = v_s[first], i_s[first], s_s[first]
                k = q["k"]
                if v_s.size > k:
                    sel = np.lexsort((i_s, -s_s))[:k]
                    v_s, i_s, s_s = v_s[sel], i_s[sel], s_s[sel]
                out.append(
                    pd.DataFrame(
                        {
                            "plan_id": np.int64(q["plan_id"]),
                            "doc_id": i_s,
                            "key": seg.keys_for(i_s),
                            "score": s_s,
                            "collapse_val": v_s,
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "plan_id": pd.Series([], dtype=np.int64),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "key": pd.Series([], dtype=object),
                    "score": pd.Series([], dtype=np.float64),
                    "collapse_val": pd.Series([], dtype=object),
                }
            )
        return pd.concat(out, ignore_index=True)


class TopHitsStage(_SegmentCacheStage):
    """Segment-parallel ES top_hits-inside-terms-agg: BM25-score the
    plan's match set, keep each segment's top-n docs PER bucket value
    (every value kept — the terms agg enumerates all buckets).  Exact:
    a doc in value v's global top-n is in its segment's per-v top-n."""

    def _init_payload(self, payload) -> None:
        (
            self.plan, self.avgdl, self.k1, self.b, self.tomb_map,
            self.field, self.n, *rest,
        ) = payload
        self.sort_field = rest[0] if rest else None
        self.ascending = bool(rest[1]) if len(rest) > 1 else False

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for q in self.plan:
                ids, scores = score_segment(
                    seg, q["terms"], q["idf"], self.avgdl, self.k1, self.b,
                    None,
                    require_all=q.get("require_all", False),
                    filter_lang=q.get("filter_lang"),
                    filter_ranges=q.get("filter_ranges"),
                )
                if ids.size == 0:
                    continue
                emit = scores
                if self.sort_field is not None:
                    # ES top_hits sort: hits ranked by a numeric field
                    # instead of _score; missing (NaN) excluded like the
                    # sort-by-field query; the score column carries the
                    # sort VALUE downstream (the ES hit `sort` array)
                    metric = seg.nums_for(self.sort_field, ids)
                    ok = ~np.isnan(metric)
                    ids, metric = ids[ok], metric[ok]
                    if ids.size == 0:
                        continue
                    emit = metric
                    scores = -metric if self.ascending else metric
                vals = seg.field_for(self.field, ids)
                order = np.lexsort((ids, -scores, vals))
                v_s = vals[order]
                starts = np.ones(v_s.size, dtype=bool)
                starts[1:] = v_s[1:] != v_s[:-1]
                run_id = np.cumsum(starts) - 1
                run_start = np.flatnonzero(starts)
                pos = np.arange(v_s.size) - run_start[run_id]
                keep = pos < self.n
                sel = order[keep]
                out.append(
                    pd.DataFrame(
                        {
                            "plan_id": np.int64(q["plan_id"]),
                            "value": vals[sel],
                            "doc_id": ids[sel],
                            "key": seg.keys_for(ids[sel]),
                            "score": emit[sel],
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "plan_id": pd.Series([], dtype=np.int64),
                    "value": pd.Series([], dtype=object),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "key": pd.Series([], dtype=object),
                    "score": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(out, ignore_index=True)


def run_top_hits(
    queries_ds,
    index_dir: str,
    field: str = "lang",
    *,
    n_hits: int = 3,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    sort_field: str | None = None,
    ascending: bool = False,
):
    """Distributed ES terms-agg + top_hits sub-aggregation: for each
    query's match set, every ``field`` bucket's top-``n_hits`` docs by
    BM25 (score desc, doc_id asc).  Per-segment partials keep n per
    (plan, value), so shuffle volume is plans x segments x values x n —
    never the match set.  Returns Dataset(query_id, value, rank, doc_id,
    key, score).

    ``sort_field`` (the ES top_hits ``sort`` option): rank each bucket's
    hits by a numeric docstore field instead of _score (``ascending``
    picks the direction; ties doc_id asc; missing values excluded) —
    the ``score`` column then carries the sort value (the ES hit sort
    array)."""
    import ray
    import ray.data as rd

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    n_docs = int(manifest["n_docs"])
    avgdl = float(manifest["avgdl"]) or 1.0
    k1 = float(manifest.get("k1", cfg.k1))
    b = float(manifest.get("b", cfg.b))
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "value": pd.Series([], dtype=object),
            "rank": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "key": pd.Series([], dtype=object),
            "score": pd.Series([], dtype=np.float64),
        }
    )
    plan = _scored_match_plans(queries, index_dir, parts, n_docs)
    if not plan:
        return rd.from_pandas(empty)
    plan_ref = ray.put(
        (plan, avgdl, k1, b, manifest.get("tombstones", {}), field, n_hits,
         sort_field, ascending)
    )
    partials = _shards_ds(parts, concurrency).map_batches(
        TopHitsStage,
        fn_constructor_args=(index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (pid_, val), g in bucket.groupby(["plan_id", "value"], sort=True):
            ids = g["doc_id"].to_numpy()
            scores = g["score"].to_numpy()
            rank_key = -scores if sort_field is not None and ascending else scores
            sel = np.lexsort((ids, -rank_key))[:n_hits]
            top = pd.DataFrame(
                {
                    "value": val,
                    "rank": np.arange(1, 1 + sel.size, dtype=np.int64),
                    "doc_id": ids[sel],
                    "key": g["key"].to_numpy()[sel],
                    "score": scores[sel],
                }
            )
            for qid in fanout.get(int(pid_), []):
                out.append(top.assign(query_id=np.int64(qid)))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)[
            ["query_id", "value", "rank", "doc_id", "key", "score"]
        ]

    return bucketed_group_agg(partials, ["plan_id", "value"], merge_bucket)


def run_collapsed_inner_hits(
    queries_ds,
    index_dir: str,
    collapse_field: str,
    *,
    k: int = 10,
    n_hits: int = 3,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
):
    """Distributed ES field collapsing WITH inner_hits: top-``k`` groups
    ranked by their best doc (score desc, doc_id asc), each carrying its
    own top-``n_hits`` docs (the ES inner_hits sub-list, inner_rank
    1..n).  Per-segment partials keep n_hits per (plan, value) for EVERY
    value (TopHitsStage — exact: a group's global top-n doc is in its
    segment's per-value top-n; collapse's per-segment value cut would
    lose inner docs of groups whose best lives elsewhere, so the value
    cut happens only at the merge where every segment's candidates are
    present).  Shuffle volume plans x segments x values x n_hits — bound
    by the keyword field's cardinality, the documented assumption.
    Returns Dataset(query_id, rank, inner_rank, doc_id, key, score,
    collapse_val)."""
    import ray
    import ray.data as rd

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    n_docs = int(manifest["n_docs"])
    avgdl = float(manifest["avgdl"]) or 1.0
    k1 = float(manifest.get("k1", cfg.k1))
    b = float(manifest.get("b", cfg.b))
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "inner_rank": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "key": pd.Series([], dtype=object),
            "score": pd.Series([], dtype=np.float64),
            "collapse_val": pd.Series([], dtype=object),
        }
    )
    plan = _scored_match_plans(queries, index_dir, parts, n_docs)
    if not plan:
        return rd.from_pandas(empty)
    plan_ref = ray.put(
        (plan, avgdl, k1, b, manifest.get("tombstones", {}), collapse_field, n_hits)
    )
    partials = _shards_ds(parts, concurrency).map_batches(
        TopHitsStage,
        fn_constructor_args=(index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid_, g in bucket.groupby("plan_id", sort=False):
            per_val: dict = {}
            for val, gg in g.groupby("value", sort=False):
                ids = gg["doc_id"].to_numpy()
                scores = gg["score"].to_numpy()
                sel = np.lexsort((ids, -scores))[:n_hits]
                per_val[val] = (
                    ids[sel], scores[sel], gg["key"].to_numpy()[sel]
                )
            ranked = sorted(
                per_val, key=lambda v: (-per_val[v][1][0], per_val[v][0][0])
            )[: max(0, int(k))]
            frames = []
            for r, val in enumerate(ranked, 1):
                ids, scores, keys = per_val[val]
                frames.append(
                    pd.DataFrame(
                        {
                            "rank": np.int64(r),
                            "inner_rank": np.arange(1, 1 + ids.size, dtype=np.int64),
                            "doc_id": ids,
                            "key": keys,
                            "score": scores,
                            "collapse_val": val,
                        }
                    )
                )
            if not frames:
                continue
            top = pd.concat(frames, ignore_index=True)
            for qid in fanout.get(int(pid_), []):
                out.append(top.assign(query_id=np.int64(qid)))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "inner_rank", "doc_id", "key", "score",
             "collapse_val"]
        ]

    return bucketed_group_agg(partials, ["plan_id"], merge_bucket)


class SortTopkStage(_SegmentCacheStage):
    """Segment-parallel sort-by-field: per (plan, segment) top-k rows by
    a numeric docstore field.  Shuffle volume is plans x segments x k
    (+ ties), never the match set."""

    def _init_payload(self, payload) -> None:
        (self.plan, self.tomb_map, self.field, self.ascending, self.k,
         *rest) = payload
        self.after = rest[0] if rest else None
        # top_metrics: extra numeric docstore columns returned for the
        # per-segment winners only (met_0, met_1, …)
        self.metrics = rest[1] if len(rest) > 1 else None
        # ES index-sorting early termination (driver-gated: layout ==
        # requested sort, no cursor): first k matching docs per segment
        self.presorted = rest[2] if len(rest) > 2 else False

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for q in self.plan:
                ids = _segment_match_ids_for_plan(seg, q)
                if ids.size == 0:
                    continue
                if self.presorted and ids.size > self.k:
                    ids = ids[: self.k]  # layout == sort order (exact)
                if isinstance(self.field, dict):
                    if "script" in self.field:
                        # ES runtime-field sort: the whitelisted
                        # painless-expression subset evaluated vectorized
                        # over the mapped docvalues (missing inputs read
                        # 0.0 like every script context, so a runtime
                        # value always exists — no NaN drop)
                        vals = _script_values(seg, ids, self.field["script"])
                    else:
                        # ES _geo_distance sort: virtual per-doc round6
                        # arc distance to the origin (same derived field
                        # as the geo_distance aggregation)
                        gfld, lat0, lon0 = self.field["geo_distance"]
                        vals = _geo_distance_vals(seg, ids, gfld, lat0, lon0)
                else:
                    vals = seg.nums_for(self.field, ids)
                ok = ~np.isnan(vals)
                ids, vals = ids[ok], vals[ok]
                if self.after is not None and ids.size:
                    # ES sort search_after: strictly-after predicate in
                    # (sort_val, doc_id asc) order, applied per segment
                    # before the top-k cut
                    av, ad = self.after
                    if self.ascending:
                        keep_sa = (vals > av) | ((vals == av) & (ids > ad))
                    else:
                        keep_sa = (vals < av) | ((vals == av) & (ids > ad))
                    ids, vals = ids[keep_sa], vals[keep_sa]
                if ids.size == 0:
                    continue
                if ids.size > self.k:
                    vv = vals if self.ascending else -vals
                    kth = np.partition(vv, self.k - 1)[self.k - 1]
                    sel = vv <= kth  # keep k-th ties; global merge exact
                    ids, vals = ids[sel], vals[sel]
                frame = pd.DataFrame(
                    {
                        "plan_id": np.int64(q["plan_id"]),
                        "doc_id": ids,
                        "key": seg.keys_for(ids),
                        "sort_val": vals,
                    }
                )
                for i, m in enumerate(self.metrics or ()):
                    frame[f"met_{i}"] = seg.nums_for(m, ids)
                out.append(frame)
        if not out:
            empty = {
                "plan_id": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "sort_val": pd.Series([], dtype=np.float64),
            }
            for i in range(len(self.metrics or ())):
                empty[f"met_{i}"] = pd.Series([], dtype=np.float64)
            return pd.DataFrame(empty)
        return pd.concat(out, ignore_index=True)


class MgetStage(_SegmentCacheStage):
    """Segment-parallel _mget: key-hash binary search per segment (the
    broadcast side is the wanted-key array), emitting live candidate rows
    only — output is O(|keys|), never O(n_docs)."""

    def _init_payload(self, payload) -> None:
        pay = (*payload, ())[:4]
        self.want, self.tomb_map, self.fetch_text, self.fetch_fields = pay

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            rows, _ = seg.find_keys(self.want)
            if rows.size == 0:
                continue
            ids = seg.doc_ids_store[rows]
            if seg.tombstones is not None and seg.tombstones.size:
                pos = np.minimum(
                    np.searchsorted(seg.tombstones, ids), seg.tombstones.size - 1
                )
                alive = seg.tombstones[pos] != ids
                rows, ids = rows[alive], ids[alive]
            if rows.size == 0:
                continue
            cols = {
                "key": seg._take_str(seg.keys_arr, rows),
                "doc_id": ids,
                "lang": seg._take_str(seg.langs_arr, rows),
            }
            if self.fetch_text and seg.texts_arr is not None:
                cols["text"] = seg._take_str(seg.texts_arr, rows)
            elif self.fetch_text:
                cols["text"] = np.full(rows.size, None, dtype=object)
            for f in self.fetch_fields:
                # mapped docvalue retrieval (ES _mget fields): numeric
                # columns come back float64, keyword columns as strings
                cols[f] = (
                    seg.nums_for(f, ids)
                    if f in seg.num_arr
                    else seg.field_for(f, ids)
                )
            out.append(pd.DataFrame(cols))
        if not out:
            empty = {
                "key": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype=np.int64),
                "lang": pd.Series([], dtype=object),
            }
            if self.fetch_text:
                empty["text"] = pd.Series([], dtype=object)
            for f in self.fetch_fields:
                empty[f] = pd.Series([], dtype=object)
            return pd.DataFrame(empty)
        return pd.concat(out, ignore_index=True)


def _shard_df_lookup(index_dir: str, pid: int, terms_arr: np.ndarray) -> np.ndarray:
    """df of the query terms in one segment's dictionary (postings never
    read — columns=['term','df'] only)."""
    import pyarrow.parquet as pq

    t = pq.read_table(postings_path(index_dir, pid), columns=["term", "df"])
    seg_terms = np.asarray(t.column("term").to_pylist(), dtype=object)
    seg_df = t.column("df").to_numpy()
    out = np.zeros(terms_arr.size, dtype=np.int64)
    if seg_terms.size == 0:
        return out
    pos = np.searchsorted(seg_terms, terms_arr)
    pos_c = np.minimum(pos, seg_terms.size - 1)
    hit = seg_terms[pos_c] == terms_arr
    out[hit] = seg_df[pos_c[hit]]
    return out


def _collect_global_stats(index_dir: str, parts: list[int], terms: list[str]):
    """DFS-phase analog: global df for the query terms, summed over the
    segment dictionaries — parallelized over shards via Ray tasks."""
    import ray

    df = np.zeros(len(terms), dtype=np.int64)
    if not terms:
        return df
    terms_arr = np.asarray(terms, dtype=object)
    if len(parts) <= 4:
        for pid in parts:
            df += _shard_df_lookup(index_dir, pid, terms_arr)
        return df
    lookup = ray.remote(num_cpus=1)(_shard_df_lookup)
    refs = [lookup.remote(index_dir, pid, terms_arr) for pid in parts]
    for part_df in ray.get(refs):
        df += part_df
    return df


def _shard_terms_enum(
    index_dir: str, pid: int, prefix: str, size: int
) -> pd.DataFrame:
    """One segment's terms_enum candidates: the first ``size`` dictionary
    terms starting with ``prefix`` (+ their df) — dictionary-only,
    postings never read.  Per-shard cut to ``size`` is lossless for the
    global merge: dictionaries are sorted, so the global top-``size`` is
    a subset of the union of per-shard top-``size`` lists."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(postings_path(index_dir, pid), columns=["term", "df"])
    mask = pc.starts_with(t.column("term"), prefix)
    hit = t.filter(mask).slice(0, size)  # dictionary is term-ascending
    return pd.DataFrame(
        {"term": pd.Series(hit.column("term").to_pylist(), dtype=object),
         "df": hit.column("df").to_numpy(zero_copy_only=False).astype(np.int64)}
    )


def _shard_fuzzy_enum(
    index_dir: str, pid: int, term: str, max_edits: int = 1,
    transpositions: bool = False,
) -> list[str]:
    """One segment's edit-distance-<=``max_edits`` dictionary terms for
    ``term`` — dictionary-only (postings never read); distance 1 via the
    vectorized lcp+lcs identity, distance 2 via the vectorized banded
    Levenshtein (_fuzzy_term_indices_k).  Field-prefixed dictionary
    entries of multi-field indexes are excluded (default-field
    semantics)."""
    import types

    import pyarrow.parquet as pq

    t = pq.read_table(postings_path(index_dir, pid), columns=["term"])
    arr = t.column("term").combine_chunks()
    tids = _fuzzy_term_indices_k(
        types.SimpleNamespace(terms_arr=arr), term, max_edits, transpositions
    )
    return [v for v in (arr[i].as_py() for i in tids) if "\x1f" not in v]


def _shard_prefix_enum(index_dir: str, pid: int, prefix: str) -> list[str]:
    """One segment's dictionary terms starting with ``prefix`` —
    dictionary-only (postings never read), the sorted-range scan used by
    prefix queries.  Field-prefixed dictionary entries of multi-field
    indexes are excluded (default-field semantics)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(postings_path(index_dir, pid), columns=["term"])
    hit = t.filter(pc.starts_with(t.column("term"), prefix))
    return [v for v in hit.column("term").to_pylist() if "\x1f" not in v]


def _global_prefix_expand(dirs: list, manifests: list, prefix: str) -> list[str]:
    """GLOBAL prefix expansion over every segment dictionary —
    deterministic across shard layouts (the span_multi rewrite needs
    one term set for all segments, where Lucene's
    SpanMultiTermQueryWrapper rewrites per segment).  Dictionary-only;
    parallel via raw tasks when the index has many shards."""
    import ray

    jobs = [(d, int(p)) for d, m in zip(dirs, manifests) for p in m["parts"]]
    if len(jobs) <= 4:
        lists = [_shard_prefix_enum(d, p, prefix) for d, p in jobs]
    else:
        enum = ray.remote(num_cpus=1)(_shard_prefix_enum)
        lists = ray.get([enum.remote(d, p, prefix) for d, p in jobs])
    return sorted({t for lst in lists for t in lst})


def _global_fuzzy_expand(
    dirs: list, manifests: list, term: str, max_edits: int = 1,
    transpositions: bool = False,
) -> list[str]:
    """GLOBAL fuzziness expansion of one analyzed term over every
    segment dictionary — deterministic across shard layouts (Lucene
    expands per segment, so ES scores can vary with merges; the global
    set is the frozen engine convention).  ``max_edits`` 0 returns the
    term itself (the AUTO short-term rule).  Dictionary-only; parallel
    via raw tasks when the index has many shards."""
    import ray

    if max_edits <= 0:
        return [term]
    jobs = [
        (d, int(p)) for d, m in zip(dirs, manifests) for p in m["parts"]
    ]
    if len(jobs) <= 4:
        lists = [
            _shard_fuzzy_enum(d, p, term, max_edits, transpositions)
            for d, p in jobs
        ]
    else:
        enum = ray.remote(num_cpus=1)(_shard_fuzzy_enum)
        lists = ray.get(
            [enum.remote(d, p, term, max_edits, transpositions) for d, p in jobs]
        )
    return sorted({t for lst in lists for t in lst})


def run_terms_enum(
    index_dir: str, prefix: str, size: int = 10,
    field: str | None = None, cfg: EngineConfig = DEFAULT,
) -> pd.DataFrame:
    """ES _terms_enum API (autocomplete term discovery): up to ``size``
    index terms starting with ``prefix``, ascending, with global df
    summed over the segment dictionaries.  Dictionary-only and
    segment-parallel (one tiny per-shard candidate list each — postings
    are never read, the exchange is <= shards x size rows).  Like ES,
    counts reflect the segment dictionaries, not tombstone-adjusted live
    docs (ES terms_enum has the same caveat for deleted docs).  ``field``
    scopes to one mapped text field on a multi-field index.  Returns
    (term, df) sorted term asc."""
    import ray

    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    want = f"{field}\x1f{prefix}" if field else prefix
    if len(parts) <= 4:
        frames = [_shard_terms_enum(index_dir, pid, want, int(size)) for pid in parts]
    else:
        enum = ray.remote(num_cpus=1)(_shard_terms_enum)
        frames = ray.get(
            [enum.remote(index_dir, pid, want, int(size)) for pid in parts]
        )
    cand = pd.concat(frames, ignore_index=True)
    if field:  # strip the field tag; plain terms of OTHER fields never match
        cand["term"] = cand["term"].str.slice(len(field) + 1)
    else:  # default field: a field NAME sharing the prefix must not leak
        cand = cand[~cand["term"].str.contains("\x1f", regex=False)]
    out = (
        cand.groupby("term", sort=True)["df"].sum().reset_index()
        .head(int(size))
        .astype({"df": np.int64})
    )
    return out[["term", "df"]]


def open_pit(index_dir: str) -> str:
    """ES point-in-time (POST /<index>/_pit): capture the index view as
    of NOW so later searches are repeatable while writes land.  Segments
    here are immutable and visibility is manifest-gated, so the entire
    PIT state is the manifest snapshot itself — the returned id is a
    self-contained opaque token (zlib+base64 of the manifest JSON, like
    ES's encoded pit_id), no server-side context to keep alive or
    expire.  Contract: the PIT stays valid until a force-merge purges
    the segment files it references (the ES keep_alive analog — merges
    there also wait on open contexts; documented trade-off)."""
    import base64
    import zlib

    manifest = read_manifest(index_dir)
    raw = json.dumps(manifest, sort_keys=True).encode()
    return base64.urlsafe_b64encode(zlib.compress(raw)).decode()


def decode_pit(pit_id: str) -> dict:
    """Decode an `open_pit` token back to its frozen manifest."""
    import base64
    import zlib

    return json.loads(zlib.decompress(base64.urlsafe_b64decode(pit_id)))


# ----------------------------------------------------------------- ES
# shard request cache analog: run_queries results keyed by (index dirs,
# manifest fingerprints, query batch, semantic kwargs).  Results are
# deterministic per the engine contract (identical at any parallelism),
# so caching is exact; a manifest write — build, incremental apply,
# merge, delete — changes the fingerprint and invalidates naturally
# (the ES refresh-invalidates-request-cache rule).
_REQUEST_CACHE: "collections.OrderedDict[tuple, pd.DataFrame]" = (
    collections.OrderedDict()
)
REQUEST_CACHE_CAP = 64
REQUEST_CACHE_STATS = {"hits": 0, "misses": 0}


def _manifest_fingerprints(index_dir) -> tuple:
    import os

    dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
    fps = []
    for d in dirs:
        with open(os.path.join(d, "manifest.json"), "rb") as fh:
            fps.append(hashlib.md5(fh.read()).hexdigest())
    return tuple(fps)


def run_queries_cached(
    queries_ds, index_dir, cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None, **kw,
) -> pd.DataFrame:
    """ES request-cache wrapper over ``run_queries``: returns the merged
    pandas result, served from a driver-side LRU when the SAME query
    batch hits the SAME committed index state.  ``concurrency`` is
    excluded from the key (it cannot change results — the determinism
    contract); every semantic kwarg participates.  Cache entries pin
    only final top-k frames (k rows per query), never corpus data."""
    import dataclasses

    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    dirs = (index_dir,) if isinstance(index_dir, str) else tuple(index_dir)
    qbytes = queries.to_csv(index=False).encode()
    session = kw.pop("session", None)  # an execution vehicle, not a key part
    key = (
        dirs,
        _manifest_fingerprints(index_dir),
        hashlib.md5(qbytes).hexdigest(),
        # cfg carries scoring semantics (k1/b, analyzer version, mapped
        # fields): two calls differing only in cfg MUST miss each other
        repr(sorted(dataclasses.asdict(cfg).items())),
        repr(sorted(kw.items())),
    )
    hit = _REQUEST_CACHE.get(key)
    if hit is not None:
        _REQUEST_CACHE.move_to_end(key)
        REQUEST_CACHE_STATS["hits"] += 1
        return hit.copy()
    REQUEST_CACHE_STATS["misses"] += 1
    out = run_queries(
        queries, index_dir, cfg, concurrency, session=session, **kw
    ).to_pandas()
    # deep-copy both ways: the arrow-backed result is read-only, and a
    # caller mutating its frame must never poison the cached entry
    _REQUEST_CACHE[key] = out.copy(deep=True)
    while len(_REQUEST_CACHE) > REQUEST_CACHE_CAP:
        _REQUEST_CACHE.popitem(last=False)
    return _REQUEST_CACHE[key].copy(deep=True)


def run_queries(
    queries_ds,
    index_dir,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    fetch: bool = False,
    highlight: bool = False,
    fetch_fields: list[str] | None = None,
    pit: str | None = None,
    indices_boost: list[float] | None = None,
    session=None,
):
    """Distributed query execution: segment-parallel scoring + per-query
    merge.  Queries are the small broadcast side; the segment set is the
    Dataset.  Returns Dataset(query_id, rank, doc_id, key, score
    [, text][, highlight][, index_id]).

    ``index_dir`` may be a LIST of index directories — the ES multi-index
    search (`GET /idx1,idx2/_search`): global stats (df, N, avgdl) are
    summed across indexes so scores equal a single combined index; the
    shard Dataset carries (index_id, part_id) rows; results gain an
    ``index_id`` column (the ES ``_index`` field) and ties break
    (score desc, doc_id asc, index_id asc).  Multi-field (text_fields)
    indexes work multi-index too: per-field avgdl is re-averaged over the
    combined doc set from each manifest's stats (Σ avgdl_i·n_i / Σ n_i).

    ``fetch`` / ``highlight`` (require a store_text index) add the stored
    _source / an <em>-snippet for the FINAL top-k only — shards emit text
    for their per-segment top-k candidates, never the match set.

    ``fetch_fields`` (ES ``fields`` / ``docvalue_fields`` retrieval):
    mapped keyword/numeric docstore columns returned alongside each hit
    (one output column per field, top-k rows only).  Uniform across the
    query batch.  An entry ``"name=expr"`` is an ES script_field /
    runtime field: expr (the script_score whitelisted expression subset
    over mapped numeric fields; no ``_score``) evaluated vectorized per
    candidate hit, round6'd."""
    import ray
    import ray.data as rd

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    # reference knob max.in.flight.requests (ElasticsearchSinkConnector.kt:61-62)
    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    if "type" in queries.columns and (queries["type"] == "simple_query_string").any():
        # ES simple_query_string (+term = must, -term = must_not, bare =
        # should, default_operator=or): rewritten to the bool path before
        # term collection — each +/bare token becomes its own clause,
        # msm = 1 when there is no must clause (the ES bool default)
        queries = queries.copy()
        for col in ("must", "should", "must_not", "msm"):
            if col not in queries.columns:
                queries[col] = None
        for i in queries.index[queries["type"] == "simple_query_string"]:
            raw = str(queries.at[i, "text"]).split()
            must_p = [t[1:] for t in raw if t.startswith("+") and len(t) > 1]
            mn_p = [t[1:] for t in raw if t.startswith("-") and len(t) > 1]
            sh_p = [t for t in raw if t[:1] not in "+-"]
            queries.at[i, "must"] = "|".join(must_p) or None
            queries.at[i, "should"] = "|".join(sh_p) or None
            queries.at[i, "must_not"] = " ".join(mn_p) or None
            queries.at[i, "msm"] = 0 if must_p else 1
            queries.at[i, "type"] = "bool"
    if "synonyms" in queries.columns:
        # ES query-time synonym expansion (synonym filter, expand=true,
        # the ES-recommended query-side-only configuration): each
        # analyzed query token found in the per-row rule map pulls its
        # synonyms into the term set — under operator=or that is exactly
        # appending them to the query text (plain OR match over the
        # expanded set; per-term df/idf, NOT Lucene SynonymQuery's
        # blended-df scoring — documented deviation, oracle contract).
        # Rule format: "word=syn1|syn2;word2=syn3"; both sides pass
        # through the row's analyzer.  require_all (operator=and) would
        # demand EVERY synonym — refused loudly.
        queries = queries.copy()
        for i in queries.index:
            raw = queries.at[i, "synonyms"]
            if raw is None or (isinstance(raw, float) and pd.isna(raw)):
                continue
            if str(queries.get("operator", pd.Series(dtype=object)).get(i, "or") or "or").lower() == "and":
                raise ValueError("synonyms: operator=and is not supported")
            an = get_analyzer(
                str(queries.at[i, "lang"]) if "lang" in queries.columns and not pd.isna(queries.at[i, "lang"]) else None
            )
            smap: dict[str, list[str]] = {}
            for rule in str(raw).split(";"):
                if not rule.strip():
                    continue
                lhs, _, rhs = rule.partition("=")
                keys = an.tokenize(lhs)
                vals = [t for part in rhs.split("|") for t in an.tokenize(part)]
                if len(keys) != 1 or not vals:
                    # multi-token lhs would silently key on the first
                    # token — refuse loudly like the other bad shapes
                    raise ValueError(f"synonyms: bad rule {rule!r}")
                smap.setdefault(keys[0], []).extend(vals)
            toks = an.tokenize(str(queries.at[i, "text"]))
            have = set(toks)
            extra = sorted(
                {s for t in toks for s in smap.get(t, ()) if s not in have}
            )
            if extra:
                queries.at[i, "text"] = (
                    str(queries.at[i, "text"]) + " " + " ".join(extra)
                )
    if "type" in queries.columns and (queries["type"] == "wrapper").any():
        # ES wrapper query: the text column carries a base64-encoded
        # JSON inner query, decoded at plan time and rewritten to the
        # equivalent native row (the ES rewrite semantics — wrapper is
        # pure transport).  Supported inner shapes: match, match_phrase
        # (body a string or the ES {"query": ...} object form), each on
        # the default text field or one named field.
        import base64
        import json as _json

        queries = queries.copy()
        if "field" not in queries.columns:
            queries["field"] = None
        if "slop" not in queries.columns:
            queries["slop"] = None
        for i in queries.index[queries["type"] == "wrapper"]:
            try:
                inner = _json.loads(
                    base64.b64decode(str(queries.at[i, "text"])).decode("utf-8")
                )
            except Exception as exc:
                raise ValueError(f"wrapper: undecodable inner query: {exc}") from exc
            if not isinstance(inner, dict) or len(inner) != 1:
                raise ValueError(
                    "wrapper: inner query must be a one-key JSON object"
                )
            ((kind, body),) = inner.items()
            if kind not in ("match", "match_phrase"):
                raise ValueError(
                    f"wrapper: unsupported inner query {kind!r} "
                    "(supported: match, match_phrase)"
                )
            if not isinstance(body, dict) or len(body) != 1:
                raise ValueError("wrapper: inner body must map one field")
            ((fld, spec),) = body.items()
            qtext = spec["query"] if isinstance(spec, dict) else spec
            queries.at[i, "text"] = str(qtext)
            if fld != "text":
                queries.at[i, "field"] = fld
            if isinstance(spec, dict) and "slop" in spec:
                queries.at[i, "slop"] = int(spec["slop"])
            queries.at[i, "type"] = "match" if kind == "match" else "phrase"
    if "type" in queries.columns and (queries["type"] == "query_string").any():
        # ES query_string (Lucene syntax subset): +term/-term/NOT term,
        # AND (all bare terms become must clauses; OR/none = should),
        # "quoted phrases" as must phrase clauses (a negated phrase
        # degrades to must_not terms — documented).  Rewritten to the
        # bool path with a qs_phrases side column pre term collection.
        import re as _re

        queries = queries.copy()
        for col in ("must", "should", "must_not", "msm", "qs_phrases"):
            if col not in queries.columns:
                queries[col] = None
        for i in queries.index[queries["type"] == "query_string"]:
            raw = _re.findall(r'[+-]?"[^"]*"|\S+', str(queries.at[i, "text"]))
            use_and = "AND" in raw
            must_p, sh_p, mn_p, phr_p = [], [], [], []
            pending_not = False
            for t in raw:
                if t in ("AND", "OR"):
                    continue
                if t == "NOT":
                    pending_not = True
                    continue
                neg = pending_not or t.startswith("-")
                pending_not = False
                body = t[1:] if t[:1] in "+-" else t
                if body.startswith('"') and body.endswith('"') and len(body) > 1:
                    inner = body.strip('"')
                    if neg:
                        mn_p.append(inner)
                    else:
                        phr_p.append(inner)
                elif neg:
                    mn_p.append(body)
                elif t.startswith("+") or use_and:
                    must_p.append(body)
                else:
                    sh_p.append(body)
            queries.at[i, "must"] = "|".join(must_p) or None
            queries.at[i, "should"] = "|".join(sh_p) or None
            queries.at[i, "must_not"] = " ".join(mn_p) or None
            queries.at[i, "qs_phrases"] = "|".join(phr_p) or None
            queries.at[i, "msm"] = 0 if (must_p or phr_p) else 1
            queries.at[i, "type"] = "bool"
    multi = not isinstance(index_dir, str)
    dirs = list(index_dir) if multi else [index_dir]
    if session is not None:
        # resident SearcherSession (query/searcher.py): a long-lived
        # scorer pool + cached global term stats replace the per-batch
        # actor-pool spawn and dictionary pass — the reference's
        # once-per-task transport (ElasticsearchSinkTask.kt:179-200).
        if pit is not None:
            session = None  # PIT manifests are frozen; caches track disk
        elif list(session.dirs) != dirs:
            raise ValueError(
                "session was opened on a different index than this call"
            )
        else:
            session.sync()
    if pit is not None:
        # search "as of" the PIT: the frozen manifest replaces the live
        # one — parts, tombstone file lists and global stats all come
        # from the snapshot, so later deltas/deletes stay invisible
        if multi:
            raise ValueError("pit is single-index (open one PIT per index)")
        manifests = [decode_pit(pit)]
    else:
        manifests = [read_manifest(d) for d in dirs]
    manifest = manifests[0]
    # (index_id, part_id) shard rows; single-index keeps the legacy shape
    part_rows = [
        (iid, int(p)) for iid, m in enumerate(manifests) for p in m["parts"]
    ]
    parts = [p for _, p in part_rows]
    n_docs = int(sum(m["n_docs"] for m in manifests))
    sum_dl_total = sum(m["avgdl"] * m["n_docs"] for m in manifests)
    avgdl = (float(sum_dl_total) / n_docs if n_docs else 1.0) or 1.0
    k1 = float(manifest.get("k1", cfg.k1))
    b = float(manifest.get("b", cfg.b))

    if multi:
        # Per-field avgdl over the COMBINED doc set (round-3 verdict #5):
        # each manifest's avgdl_fields[f] is sum_dl_fields[f]/n_docs_i, so
        # the combined average is Σ_i avgdl_i*n_docs_i / Σ_i n_docs_i — a
        # field missing from one index contributes 0 length there, exactly
        # as a combined single index would have recorded it.
        fields_all = {f for m in manifests for f in m.get("avgdl_fields", {})}
        avgdl_fields = {
            f: (
                sum(
                    float(m.get("avgdl_fields", {}).get(f, 0.0)) * int(m["n_docs"])
                    for m in manifests
                )
                / n_docs
                if n_docs
                else 0.0
            )
            for f in fields_all
        }
    else:
        avgdl_fields = manifest.get("avgdl_fields", {})

    def _row_str(row, name: str) -> str | None:
        v = getattr(row, name, None)
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        return str(v)

    if "fuzziness" in queries.columns and queries["fuzziness"].notna().any():
        # ES match with fuzziness=1|2|"auto": each analyzed term expands
        # to its edit-distance dictionary variants (GLOBAL
        # dictionary-only pass — deterministic across shard layouts,
        # where Lucene's per-segment rewrite is not), then the row
        # scores as the bool-OR of the expanded terms, each with its own
        # global df/idf (the ES fuzzy-rewrite-to-bool shape; frozen
        # convention).  "auto" = the ES AUTO:3,6 per-term rule
        # (auto_fuzziness).  An optional boolean ``fuzzy_transpositions``
        # column switches the row's metric to the unrestricted
        # Damerau-Levenshtein (the ES default is true; this engine's
        # frozen default stays plain Levenshtein for compatibility with
        # the earlier fuzzy surface).
        queries = queries.copy()
        fz_cache: dict[tuple, list[str]] = {}
        for i in queries.index[queries["fuzziness"].notna()]:
            raw_fz = queries.at[i, "fuzziness"]
            is_auto = isinstance(raw_fz, str) and raw_fz.lower() == "auto"
            if not is_auto and int(raw_fz) not in (1, 2):
                raise ValueError("match fuzziness: only 1, 2 or 'auto' supported")
            trv = (
                queries.at[i, "fuzzy_transpositions"]
                if "fuzzy_transpositions" in queries.columns
                else None
            )
            tr = bool(trv) and not pd.isna(trv)
            an_f = get_analyzer(
                queries.at[i, "lang"] if "lang" in queries.columns else None
            )
            expanded: set[str] = set()
            for t in an_f.tokenize(str(queries.at[i, "text"])):
                me = auto_fuzziness(t) if is_auto else int(raw_fz)
                if (t, me, tr) not in fz_cache:
                    fz_cache[(t, me, tr)] = _global_fuzzy_expand(
                        dirs, manifests, t, me, tr
                    )
                expanded.update(fz_cache[(t, me, tr)])
            queries.at[i, "text"] = " ".join(sorted(expanded))

    # span_multi rows (span_near whose clauses may be prefix wrappers,
    # marked by a trailing "*"): expand every prefix clause against the
    # GLOBAL dictionary BEFORE the stats pass (the fuzziness pattern) so
    # phase 1 collects dfs for the expanded terms; slot structure is kept
    # aside by query_id and the row text rewritten to the flat term set.
    sm_slots: dict[int, list[list[str]]] = {}
    if "type" in queries.columns and (queries["type"] == "span_multi").any():
        queries = queries.copy()
        px_cache: dict[str, list[str]] = {}
        for i in queries.index[queries["type"] == "span_multi"]:
            an_m = get_analyzer(
                queries.at[i, "lang"] if "lang" in queries.columns else None
            )
            slots: list[list[str]] = []
            for raw in str(queries.at[i, "text"]).split():
                stem_toks = an_m.tokenize(raw[:-1] if raw.endswith("*") else raw)
                if len(stem_toks) != 1:
                    raise ValueError(
                        "span_multi: each clause must analyze to one term"
                    )
                stem = stem_toks[0]
                if raw.endswith("*"):
                    if stem not in px_cache:
                        px_cache[stem] = _global_prefix_expand(
                            dirs, manifests, stem
                        )
                    slots.append(px_cache[stem])
                else:
                    slots.append([stem])
            sm_slots[int(queries.at[i, "query_id"])] = slots
            queries.at[i, "text"] = " ".join(
                sorted({t for sl in slots for t in sl})
            )

    # phase 1: global stats for all query terms (dictionaries only) —
    # field-scoped rows (match field=… / multi_match fields=…) look up the
    # PREFIXED terms, which is what a multi-field dictionary stores
    terms_set: set[str] = set()
    for row in queries.itertuples(index=False):
        an = get_analyzer(getattr(row, "lang", None))
        if (getattr(row, "type", None) or "match") == "bool":
            # bool rows: clause texts live in must/should/must_not columns
            # (+ qs_phrases for query_string quoted clauses)
            for col in ("must", "should", "must_not", "qs_phrases"):
                v = _row_str(row, col)
                if v:
                    for clause in v.split("|"):
                        terms_set.update(an.tokenize(clause))
            continue
        rp_s = _row_str(row, "rescore_phrase")
        if rp_s:
            terms_set.update(an.tokenize(rp_s))
        little_s = _row_str(row, "little")
        if little_s:  # span_containing / span_within little span_term
            terms_set.update(an.tokenize(little_s))
        if (getattr(row, "type", None) or "match") == "weighted_terms":
            # "term:weight" pairs: collect the term parts only
            for pair in str(row.text).split():
                t_raw = pair.rpartition(":")[0]
                if t_raw:
                    terms_set.update(an.tokenize(t_raw))
            continue
        toks = an.tokenize(row.text)
        flds_s = _row_str(row, "fields")
        fld = _row_str(row, "field")
        if (
            (getattr(row, "type", None) or "match")
            in ("multi_match", "dis_max", "cross_fields")
            and flds_s
        ):
            for f in flds_s.split(","):
                f = f.partition("^")[0]  # ES per-field boost syntax: title^2
                terms_set.update(f"{f}\x1f{t}" for t in toks)
        elif fld:
            terms_set.update(f"{fld}\x1f{t}" for t in toks)
        else:
            terms_set.update(toks)
    all_terms = sorted(terms_set)
    if session is not None:
        # resident path: dfs served from the session's per-epoch term
        # cache; only first-seen terms pay a (resident-actor) dictionary
        # pass — repeat batches skip the stats wave entirely
        gdf = session.global_df(all_terms)
    else:
        gdf = np.zeros(len(all_terms), dtype=np.int64)
        for iid, (d, m) in enumerate(zip(dirs, manifests)):
            gdf += _collect_global_stats(d, [int(p) for p in m["parts"]], all_terms)
    df_map = dict(zip(all_terms, gdf))

    # combined_fields (BM25F) rows need cross-field UNION dfs — one
    # segment-parallel stats pass for the whole batch's cf terms (the
    # per-field dictionary dfs overlap and cannot be summed)
    cf_df_map: dict[str, int] = {}
    cf_specs: set[tuple] = set()
    if "type" in queries.columns:
        cf_terms_set: set[str] = set()
        for row in queries[queries["type"] == "combined_fields"].itertuples(
            index=False
        ):
            an_cf = get_analyzer(getattr(row, "lang", None))
            cf_terms_set.update(an_cf.tokenize(row.text))
            flds_cf = _row_str(row, "fields")
            if not flds_cf:
                raise ValueError("combined_fields rows need a fields column")
            cf_specs.add(
                tuple(f.partition("^")[0] for f in flds_cf.split(","))
            )
        if cf_terms_set:
            cf_fields_all = sorted({f for spec in cf_specs for f in spec})
            for f in cf_fields_all:
                if not any(f in (m.get("text_fields") or ()) for m in manifests):
                    raise ValueError(
                        f"combined_fields: unmapped text field {f!r}"
                    )
            cf_terms = sorted(cf_terms_set)
            cf_tomb = (
                [m.get("tombstones", {}) for m in manifests]
                if multi
                else manifest.get("tombstones", {})
            )
            # one union-df pass per distinct field set (one in the common
            # case); multi-index works unchanged — doc partitions are
            # disjoint across indexes, so per-segment unions sum exactly
            for spec in cf_specs:
                dfu = _collect_union_df(
                    index_dir, part_rows, cf_terms, list(spec),
                    cf_tomb, cfg, concurrency,
                )
                cf_df_map.update(
                    {(spec, t): int(d) for t, d in zip(cf_terms, dfu)}
                )

    # dedupe identical (terms, k) plans — repeated queries score once per
    # shard and fan the result out to every query_id sharing the plan
    plan_by_key: dict[tuple, dict] = {}
    for row in queries.itertuples(index=False):
        lang_q = getattr(row, "lang", None)
        k = int(getattr(row, "k", 10) or 10)
        if (getattr(row, "type", None) or "match") == "span_or":
            # ES span_or over span_term clauses: union of occurrences,
            # globally-absent clause terms dropped (or semantics)
            so_terms = sorted(
                t for t in set(get_analyzer(lang_q).tokenize(row.text))
                if df_map.get(t, 0) > 0
            )
            if not so_terms:
                continue
            idf_sum = float(
                sum(
                    bm25_idf(np.array([df_map[t]], dtype=np.int64), n_docs)[0]
                    for t in so_terms
                )
            )
            key = ("span_or", tuple(so_terms), k)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "span_or": so_terms,
                    "hl_terms": so_terms,
                    "idf_sum": idf_sum,
                    "k": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if (getattr(row, "type", None) or "match") == "span_not":
            # ES span_not: include occurrences surviving the exclude
            # pre/post windows; text = include, exclude column = exclude
            sn_toks = get_analyzer(lang_q).tokenize(row.text)
            exc_raw = _row_str(row, "exclude")
            exc_toks = get_analyzer(lang_q).tokenize(exc_raw) if exc_raw else []
            if len(sn_toks) != 1 or len(exc_toks) != 1:
                raise ValueError(
                    "span_not: exactly one include term (text) and one "
                    "exclude term (exclude column) are supported"
                )
            inc, exc = sn_toks[0], exc_toks[0]
            if df_map.get(inc, 0) == 0:
                continue
            idf_inc = float(
                bm25_idf(np.array([df_map[inc]], dtype=np.int64), n_docs)[0]
            )
            pre_w = int(getattr(row, "pre", 0) or 0)
            post_w = int(getattr(row, "post", 0) or 0)
            key = ("span_not", inc, exc, pre_w, post_w, k)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "span_not": inc,
                    "exclude": exc,
                    "pre": pre_w,
                    "post": post_w,
                    "hl_terms": [inc],
                    "idf_sum": idf_inc,
                    "k": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if (getattr(row, "type", None) or "match") == "intervals":
            # ES intervals query (all_of, ordered=false, max_gaps):
            # unordered minimal-cover window over the unique terms;
            # field-scoped like phrase
            iv_terms = sorted(set(get_analyzer(lang_q).tokenize(row.text)))
            iv_raw = iv_terms
            iv_fld = _row_str(row, "field")
            if iv_fld:
                iv_terms = [f"{iv_fld}\x1f{t}" for t in iv_terms]
            if not iv_terms or any(df_map.get(t, 0) == 0 for t in iv_terms):
                continue
            idf_sum = float(
                sum(
                    bm25_idf(np.array([df_map[t]], dtype=np.int64), n_docs)[0]
                    for t in iv_terms
                )
            )
            mg = int(getattr(row, "max_gaps", 0) or 0)
            key = ("intervals", tuple(iv_terms), k, mg)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "intervals": iv_terms,
                    "hl_terms": iv_raw,
                    "idf_sum": idf_sum,
                    "k": k,
                    "max_gaps": mg,
                    "dl_field": iv_fld,
                    "avgdl": (
                        (float(avgdl_fields.get(iv_fld, 0)) or 1.0) if iv_fld else None
                    ),
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if (getattr(row, "type", None) or "match") == "weighted_terms":
            # ES sparse_vector / rank_features weighted-term retrieval:
            # row.text = space-separated "term:weight" pairs
            pairs = []
            for pair in str(row.text).split():
                t_raw, sep, w_raw = pair.rpartition(":")
                if not sep or not t_raw:
                    raise ValueError(
                        "weighted_terms: space-separated 'term:weight' pairs required"
                    )
                toks_w = get_analyzer(lang_q).tokenize(t_raw)
                if len(toks_w) != 1:
                    raise ValueError(
                        f"weighted_terms: {t_raw!r} must analyze to exactly one token"
                    )
                pairs.append((toks_w[0], float(w_raw)))
            pairs = sorted((t, w) for t, w in pairs if df_map.get(t, 0) > 0)
            if not pairs:
                continue
            key = ("weighted_terms", tuple(pairs), k)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "wterms": [t for t, _ in pairs],
                    "wweights": [w for _, w in pairs],
                    "hl_terms": [t for t, _ in pairs],
                    "k": k,
                    "dl_field": None,
                    "avgdl": None,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if (getattr(row, "type", None) or "match") in ("span_containing", "span_within"):
            # ES span_containing / span_within: big = span_near clause
            # (row.text, ordered, slop), little = span_term (row.little)
            mode = "containing" if row.type == "span_containing" else "within"
            big_terms = get_analyzer(lang_q).tokenize(row.text)
            little_toks = get_analyzer(lang_q).tokenize(
                str(getattr(row, "little", "") or "")
            )
            if len(little_toks) != 1:
                raise ValueError(
                    "span_containing/span_within: exactly one little "
                    f"span_term required, got {little_toks!r}"
                )
            little = little_toks[0]
            if (
                not big_terms
                or any(df_map.get(t, 0) == 0 for t in big_terms)
                or df_map.get(little, 0) == 0
            ):
                continue
            uniq_sc = sorted(set([*big_terms, little]))
            idf_sum = float(
                sum(
                    bm25_idf(np.array([df_map[t]], dtype=np.int64), n_docs)[0]
                    for t in uniq_sc
                )
            )
            slop = int(getattr(row, "slop", 0) or 0)
            key = ("span_contain", mode, tuple(big_terms), little, k, slop)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "span_contain": big_terms,
                    "little": little,
                    "mode": mode,
                    "hl_terms": uniq_sc,
                    "idf_sum": idf_sum,
                    "k": k,
                    "slop": slop,
                    "dl_field": None,
                    "avgdl": None,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if (getattr(row, "type", None) or "match") == "span_multi":
            # ES span_near over span_term / span_multi(prefix) clauses:
            # slots were globally expanded in the pre-pass; idf_sum =
            # Σ over slots Σ idf(present members) (the span_or
            # convention applied per slot — frozen engine rule)
            slots = sm_slots.get(int(row.query_id), [])
            slots = [[t for t in sl if df_map.get(t, 0) > 0] for sl in slots]
            if not slots or any(not sl for sl in slots):
                continue  # an empty slot can never match
            idf_sum = float(
                sum(
                    bm25_idf(np.array([df_map[t]], dtype=np.int64), n_docs)[0]
                    for sl in slots
                    for t in sl
                )
            )
            slop = int(getattr(row, "slop", 0) or 0)
            key = ("span_multi", tuple(tuple(sl) for sl in slots), k, slop)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "span_multi": slots,
                    "hl_terms": sorted({t for sl in slots for t in sl}),
                    "idf_sum": idf_sum,
                    "k": k,
                    "slop": slop,
                    "dl_field": None,
                    "avgdl": None,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if (getattr(row, "type", None) or "match") == "span_near":
            # ES span_near (in_order=true, span_term clauses): ordered
            # chain with total gap <= slop; field-scoped like phrase
            sp_terms = get_analyzer(lang_q).tokenize(row.text)
            sp_raw = sp_terms
            sp_fld = _row_str(row, "field")
            if sp_fld:
                sp_terms = [f"{sp_fld}\x1f{t}" for t in sp_terms]
            if not sp_terms or any(df_map.get(t, 0) == 0 for t in sp_terms):
                continue
            idf_sum = float(
                sum(
                    bm25_idf(np.array([df_map[t]], dtype=np.int64), n_docs)[0]
                    for t in sp_terms
                )
            )
            slop = int(getattr(row, "slop", 0) or 0)
            fe_raw = getattr(row, "first_end", None)
            try:
                fe = None if fe_raw is None or pd.isna(fe_raw) else int(fe_raw)
            except (TypeError, ValueError):
                fe = None
            key = ("span", tuple(sp_terms), k, slop, fe)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "span": sp_terms,
                    "first_end": fe,
                    "hl_terms": sorted(set(sp_raw)),
                    "idf_sum": idf_sum,
                    "k": k,
                    "slop": slop,
                    "dl_field": sp_fld,
                    "avgdl": (
                        (float(avgdl_fields.get(sp_fld, 0)) or 1.0) if sp_fld else None
                    ),
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if (getattr(row, "type", None) or "match") == "phrase":
            # distributed match_phrase: ordered terms, repeats kept;
            # field-scoped rows (multi-field index) prefix the terms and
            # use the field's norms (intra-field positions are contiguous
            # in the combined stream, so adjacency is field-text-exact)
            phrase = get_analyzer(lang_q).tokenize(row.text)
            p_raw = phrase
            p_fld = _row_str(row, "field")
            if p_fld:
                phrase = [f"{p_fld}\x1f{t}" for t in phrase]
            if not phrase or any(df_map.get(t, 0) == 0 for t in phrase):
                continue
            idf_sum = float(
                sum(
                    bm25_idf(np.array([df_map[t]], dtype=np.int64), n_docs)[0]
                    for t in phrase
                )
            )
            slop = int(getattr(row, "slop", 0) or 0)
            key = ("phrase", tuple(phrase), k, slop)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "phrase": phrase,
                    "hl_terms": sorted(set(p_raw)),
                    "idf_sum": idf_sum,
                    "k": k,
                    "slop": slop,
                    "dl_field": p_fld,
                    "avgdl": (
                        (float(avgdl_fields.get(p_fld, 0)) or 1.0) if p_fld else None
                    ),
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if (getattr(row, "type", None) or "match") == "bool":
            # ES bool query: must/should = "|"-separated match clauses,
            # msm = minimum_should_match (ES default 0 with must, else 1)
            an_q = get_analyzer(lang_q)

            def _clauses(v: str | None) -> list[tuple[list[str], np.ndarray]] | None:
                """None = a must clause can never match (absent terms)."""
                out = []
                for clause in (v.split("|") if v else []):
                    terms_c = sorted(set(an_q.tokenize(clause)))
                    if not terms_c:
                        out.append(None)
                        continue
                    kept = [t for t in terms_c if df_map.get(t, 0) > 0]
                    if not kept:
                        out.append(None)
                        continue
                    idf_c = bm25_idf(
                        np.array([df_map[t] for t in kept], dtype=np.int64), n_docs
                    )
                    out.append((kept, np.asarray(idf_c, dtype=np.float64)))
                return out
            must_p = _clauses(_row_str(row, "must"))
            if any(p is None for p in must_p):
                continue
            should_p = [p for p in _clauses(_row_str(row, "should")) if p is not None]
            # query_string quoted clauses: must phrases (ordered tokens,
            # repeats kept); a globally-absent term means the plan can
            # never match (same rule as a dead must clause)
            qs_v = _row_str(row, "qs_phrases")
            phr_p = []
            dead_phrase = False
            for ptext in (qs_v.split("|") if qs_v else []):
                p_toks = an_q.tokenize(ptext)
                if not p_toks or any(df_map.get(t, 0) == 0 for t in p_toks):
                    dead_phrase = True
                    break
                p_idf = float(
                    sum(
                        bm25_idf(np.array([df_map[t]], dtype=np.int64), n_docs)[0]
                        for t in p_toks
                    )
                )
                phr_p.append((p_toks, p_idf))
            if dead_phrase:
                continue
            msm_raw = getattr(row, "msm", None)
            try:
                msm_missing = msm_raw is None or bool(pd.isna(msm_raw))
            except (TypeError, ValueError):
                msm_missing = False
            msm = (0 if (must_p or phr_p) else 1) if msm_missing else int(msm_raw)
            if not must_p and not phr_p and (not should_p or len(should_p) < msm):
                continue
            if (must_p or phr_p) and msm > len(should_p):
                continue
            mn_v = _row_str(row, "must_not")
            mn_terms_b = sorted(set(an_q.tokenize(mn_v))) if mn_v else None
            offset = int(getattr(row, "offset", 0) or 0)
            key = (
                "bool",
                tuple(tuple(c[0]) for c in must_p),
                tuple(tuple(c[0]) for c in should_p),
                tuple(mn_terms_b) if mn_terms_b else None,
                msm, k, offset,
                tuple(tuple(p[0]) for p in phr_p) or None,
            )
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "bool": {
                        "must": must_p,
                        "should": should_p,
                        "mn_terms": mn_terms_b,
                        "msm": msm,
                        "phrases": phr_p or None,
                    },
                    "hl_terms": sorted(
                        {t for c in must_p + should_p for t in c[0]}
                        | {t for p in phr_p for t in p[0]}
                    ),
                    "k": k + offset,
                    "offset": offset,
                    "size": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        qtype_row = getattr(row, "type", None) or "match"
        if qtype_row == "terms_set":
            # ES terms_set: docs matching >= msm of the given terms;
            # score = sum of the matched terms' BM25 — exactly a bool
            # query of single-term should clauses
            # (minimum_should_match_field inlined as the msm column)
            an_ts = get_analyzer(lang_q)
            kept_ts = [
                t for t in sorted(set(an_ts.tokenize(row.text)))
                if df_map.get(t, 0) > 0
            ]
            msm_ts_raw = getattr(row, "msm", None)
            try:
                ts_missing = msm_ts_raw is None or bool(pd.isna(msm_ts_raw))
            except (TypeError, ValueError):
                ts_missing = False
            msm_ts = 1 if ts_missing else int(msm_ts_raw)
            if not kept_ts or len(kept_ts) < msm_ts:
                continue
            key = ("terms_set", tuple(kept_ts), msm_ts, k)
            entry = plan_by_key.get(key)
            if entry is None:
                should_ts = [
                    (
                        [t],
                        np.asarray(
                            bm25_idf(
                                np.array([df_map[t]], dtype=np.int64), n_docs
                            ),
                            dtype=np.float64,
                        ),
                    )
                    for t in kept_ts
                ]
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "bool": {
                        "must": [], "should": should_ts,
                        "mn_terms": None, "msm": msm_ts,
                    },
                    "hl_terms": kept_ts,
                    "k": k, "offset": 0, "size": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if qtype_row == "combined_fields":
            # ES combined_fields (BM25F): blended-field BM25, idf from
            # the union-df stats pass above
            flds_cf = _row_str(row, "fields")
            names_cf, weights_cf = [], []
            for f in flds_cf.split(","):
                nm, _, w = f.partition("^")
                names_cf.append(nm)
                weights_cf.append(float(w) if w else 1.0)
            spec_cf = tuple(names_cf)
            terms_cf = [
                t for t in sorted(set(get_analyzer(lang_q).tokenize(row.text)))
                if cf_df_map.get((spec_cf, t), 0) > 0
            ]
            if not terms_cf:
                continue
            key = ("cf", tuple(terms_cf), flds_cf, k)
            entry = plan_by_key.get(key)
            if entry is None:
                dfu_cf = np.array(
                    [cf_df_map[(spec_cf, t)] for t in terms_cf], dtype=np.int64
                )
                avgdl_c = (
                    sum(
                        w * float(avgdl_fields.get(nm, 0.0))
                        for nm, w in zip(names_cf, weights_cf)
                    )
                    or 1.0
                )
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "cf": {
                        "fields": names_cf,
                        "weights": weights_cf,
                        "idf": np.asarray(
                            bm25_idf(dfu_cf, n_docs), dtype=np.float64
                        ),
                        "avgdl_c": avgdl_c,
                    },
                    "terms": terms_cf,
                    "hl_terms": terms_cf,
                    "k": k, "offset": 0, "size": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if qtype_row == "random_score":
            # ES function_score random_score over a filter-context match
            an_r = get_analyzer(lang_q)
            kept_r2 = [
                t for t in sorted(set(an_r.tokenize(row.text)))
                if df_map.get(t, 0) > 0
            ]
            if not kept_r2:
                continue
            seed_r = _row_str(row, "seed") or "0"
            key = ("rscore", tuple(kept_r2), seed_r, k)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "rseed": seed_r,
                    "terms": kept_r2,
                    "hl_terms": kept_r2,
                    "k": k, "offset": 0, "size": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if qtype_row == "ids":
            # ES ids query: text column carries |-separated external keys
            keys_q = tuple(sorted({s for s in str(row.text).split("|") if s}))
            if not keys_q:
                continue
            key = ("idsq", keys_q, k)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "idsq": list(keys_q),
                    "terms": [],
                    "hl_terms": [],
                    "k": k, "offset": 0, "size": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if qtype_row == "constant_score":
            # ES constant_score: filter-context match, score = boost for
            # every matching doc (no BM25).  All scores tie, so the
            # global top-k is the k smallest matching doc_ids — each
            # shard emits only its first k match ids.  The filter may be
            # a match (text), or any expansion query via a
            # prefix/wildcard/fuzzy/regexp/exists column.
            boost_raw0 = getattr(row, "boost", None)
            boost0 = (
                1.0
                if boost_raw0 is None
                or (isinstance(boost_raw0, float) and pd.isna(boost_raw0))
                else float(boost_raw0)
            )
            exp_col = next(
                (
                    c
                    for c in ("prefix", "wildcard", "fuzzy", "regexp", "exists")
                    if _row_str(row, c) is not None
                ),
                None,
            )
            if exp_col is not None:
                val_e = _row_str(row, exp_col)
                key = ("const", exp_col, val_e, boost0, k)
                entry = plan_by_key.get(key)
                if entry is None:
                    entry = plan_by_key[key] = {
                        "query_ids": [],
                        "const": boost0,
                        exp_col: val_e,
                        "terms": [],
                        "hl_terms": [],
                        "k": k, "offset": 0, "size": k,
                    }
                entry["query_ids"].append(int(row.query_id))
                continue
            kept_cs = [
                t for t in sorted(set(get_analyzer(lang_q).tokenize(row.text)))
                if df_map.get(t, 0) > 0
            ]
            if not kept_cs:
                continue
            boost_raw = getattr(row, "boost", None)
            boost = (
                1.0
                if boost_raw is None
                or (isinstance(boost_raw, float) and pd.isna(boost_raw))
                else float(boost_raw)
            )
            key = ("const", tuple(kept_cs), boost, k)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "const": boost,
                    "terms": kept_cs,
                    "hl_terms": kept_cs,
                    "k": k, "offset": 0, "size": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if qtype_row == "boosting":
            # ES boosting query: positive = a match query scored BM25;
            # docs also matching the negative query keep their relative
            # order but are demoted by negative_boost (score x nb,
            # round6'd — ES multiplies the positive score)
            an_b = get_analyzer(lang_q)
            kept_b = [
                t for t in sorted(set(an_b.tokenize(row.text)))
                if df_map.get(t, 0) > 0
            ]
            if not kept_b:
                continue
            neg_raw = _row_str(row, "negative")
            neg_terms = sorted(set(an_b.tokenize(neg_raw))) if neg_raw else []
            nb_raw = getattr(row, "negative_boost", None)
            nb = (
                0.5
                if nb_raw is None
                or (isinstance(nb_raw, float) and pd.isna(nb_raw))
                else float(nb_raw)
            )
            key = ("boosting", tuple(kept_b), tuple(neg_terms), nb, k)
            entry = plan_by_key.get(key)
            if entry is None:
                idf_b = bm25_idf(
                    np.array([df_map[t] for t in kept_b], dtype=np.int64), n_docs
                )
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "terms": kept_b,
                    "idf": np.asarray(idf_b, dtype=np.float64),
                    "neg_terms": neg_terms,
                    "neg_boost": nb,
                    "hl_terms": kept_b,
                    "k": k, "offset": 0, "size": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if qtype_row == "match_bool_prefix":
            # ES match_bool_prefix: the final token matches as a prefix,
            # the complete tokens as a bool should of term queries.  The
            # prefix clause scores 1.0 per matching doc (the ES
            # constant_score multi-term rewrite); the complete terms
            # score BM25; per-doc score = round6(sum).
            an_m = get_analyzer(lang_q)
            toks_mbp = an_m.tokenize(row.text)
            if not toks_mbp:
                continue
            prefix_mbp = toks_mbp[-1]
            kept_r = [
                t for t in sorted(set(toks_mbp[:-1])) if df_map.get(t, 0) > 0
            ]
            key = ("mbp", tuple(kept_r), prefix_mbp, k)
            entry = plan_by_key.get(key)
            if entry is None:
                idf_r = bm25_idf(
                    np.array([df_map[t] for t in kept_r], dtype=np.int64), n_docs
                )
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "mbp": {
                        "terms": kept_r,
                        "idf": np.asarray(idf_r, dtype=np.float64),
                        "prefix": prefix_mbp,
                    },
                    "hl_terms": sorted(set(toks_mbp)),
                    "k": k, "offset": 0, "size": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        base_terms = sorted(set(get_analyzer(lang_q).tokenize(row.text)))
        offset = int(getattr(row, "offset", 0) or 0)  # ES from/size
        flds_s = _row_str(row, "fields")
        if (getattr(row, "type", None) or "match") == "cross_fields" and flds_s:
            # ES multi_match type=cross_fields: TERM-centric blending —
            # each query term is one clause whose idf comes from the
            # BLENDED df (max over the fields' dfs — the Lucene
            # BlendedTermQuery convention, frozen) and whose per-doc
            # contribution is the best field's idf·tf_part·boost; the
            # doc score = round6(Σ over terms).  Contrast most_fields
            # (field-centric sum) and combined_fields (blended tf/BM25F).
            fields_x, boosts_x = [], []
            for f in flds_s.split(","):
                f, _, b_s = f.partition("^")
                fields_x.append(f)
                boosts_x.append(float(b_s) if b_s else 1.0)
            terms_x, idf_x = [], []
            for t in base_terms:
                bdf = max(
                    (df_map.get(f"{f}\x1f{t}", 0) for f in fields_x),
                    default=0,
                )
                if bdf > 0:
                    terms_x.append(t)
                    idf_x.append(
                        float(
                            bm25_idf(np.array([bdf], dtype=np.int64), n_docs)[0]
                        )
                    )
            if not terms_x:
                continue
            key = ("xf", tuple(terms_x), tuple(fields_x), tuple(boosts_x), k, offset)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "xf": {
                        "fields": fields_x,
                        "boosts": boosts_x,
                        "terms": terms_x,
                        "idf": idf_x,
                        "avgdl": {
                            f: float(avgdl_fields.get(f, 0)) or 1.0
                            for f in fields_x
                        },
                    },
                    "hl_terms": base_terms,
                    "k": k + offset,
                    "offset": offset,
                    "size": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        if (getattr(row, "type", None) or "match") in ("multi_match", "dis_max") and flds_s:
            # ES multi_match most_fields: per-field BM25 summed per doc
            # (see IndexSearcher.multi_match for the exactness argument).
            # dis_max instead takes the BEST field's score + tie_breaker x
            # the other fields' scores (the ES dis_max combiner).
            if (getattr(row, "type", None) or "match") == "dis_max":
                tb_raw = getattr(row, "tie_breaker", None)
                tb = (
                    0.0
                    if tb_raw is None or (isinstance(tb_raw, float) and pd.isna(tb_raw))
                    else float(tb_raw)
                )
                mm_mode = ("max", tb)
            else:
                mm_mode = ("sum", 0.0)
            per_field = []
            for f in flds_s.split(","):
                # ES per-field boost syntax ("title^2"): the field's
                # round6'd BM25 is multiplied by the boost before the
                # cross-field combine (sum or dis_max)
                f, _, b_s = f.partition("^")
                boost = float(b_s) if b_s else 1.0
                kept = [
                    f"{f}\x1f{t}" for t in base_terms if df_map.get(f"{f}\x1f{t}", 0) > 0
                ]
                if not kept:
                    continue
                idf_f = bm25_idf(
                    np.array([df_map[t] for t in kept], dtype=np.int64), n_docs
                )
                per_field.append(
                    {
                        "field": f,
                        "terms": kept,
                        "idf": np.asarray(idf_f, dtype=np.float64),
                        "avgdl": float(avgdl_fields.get(f, 0)) or 1.0,
                        "boost": boost,
                    }
                )
            if not per_field:
                continue
            key = (
                "mm",
                tuple((tuple(p["terms"]), p["boost"]) for p in per_field),
                k, offset, mm_mode,
            )
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "mm": per_field,
                    "mm_mode": mm_mode,
                    "hl_terms": base_terms,
                    "k": k + offset,
                    "offset": offset,
                    "size": k,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        fld = _row_str(row, "field")
        all_q_terms = (
            [f"{fld}\x1f{t}" for t in base_terms] if fld else base_terms
        )
        require_all = (getattr(row, "operator", None) or "or") == "and"
        terms = [t for t in all_q_terms if df_map.get(t, 0) > 0]
        if not terms:
            continue
        if require_all and len(terms) < len(all_q_terms):
            continue  # a globally-absent term under AND matches nothing
        filter_lang = getattr(row, "filter_lang", None)
        mn_raw = getattr(row, "must_not", None)
        if mn_raw is None or (isinstance(mn_raw, float) and pd.isna(mn_raw)):
            mn_terms = None
        else:
            mn_base = sorted(set(get_analyzer(lang_q).tokenize(str(mn_raw))))
            if fld:
                mn_base = [f"{fld}\x1f{t}" for t in mn_base]
            mn_terms = tuple(mn_base) or None
        fr = _row_filter_ranges(row)
        bbox = _row_filter_geo_bbox(row)
        if bbox is not None:  # geo_bounding_box == two range filters
            fr = (tuple(fr) if fr else ()) + bbox
        fg = _row_filter_geo(row)
        fgp = _row_filter_geo_poly(row)
        fkw = _row_filter_kw(row)
        ms_raw = getattr(row, "min_score", None)
        ms = (
            None
            if ms_raw is None or (isinstance(ms_raw, float) and pd.isna(ms_raw))
            else float(ms_raw)
        )

        def _num_or(name: str, default: float) -> float:
            v = getattr(row, name, None)
            if v is None or (isinstance(v, float) and pd.isna(v)):
                return default
            return float(v)

        rp = _row_str(row, "rescore_phrase")
        resc = None
        if rp:
            # ES rescore (phrase rescorer): the per-shard top-window hits
            # get score = round6(query_weight*base + rescore_weight*phrase)
            rp_toks = get_analyzer(lang_q).tokenize(rp)
            if rp_toks and all(df_map.get(t, 0) > 0 for t in rp_toks):
                r_idf = float(
                    sum(
                        bm25_idf(np.array([df_map[t]], dtype=np.int64), n_docs)[0]
                        for t in rp_toks
                    )
                )
                resc = (
                    tuple(rp_toks), r_idf,
                    int(_num_or("rescore_window", 100)),
                    _num_or("query_weight", 1.0),
                    _num_or("rescore_weight", 1.0),
                )
            # a rescore query with a globally-absent term matches nothing:
            # ES leaves the base scores unchanged (resc stays None)
        sa_raw = getattr(row, "after_score", None)
        if sa_raw is None or (isinstance(sa_raw, float) and pd.isna(sa_raw)):
            sa = None
        else:
            sa = (float(sa_raw), int(getattr(row, "after_doc", -1)))
        route = _row_str(row, "routing")
        if route is not None:
            # ES routed search (?routing=R): only the shard owning R's
            # partition is scheduled for this plan — fan-out drops from
            # all segments to the covering set (manifest-recorded for
            # merged segments).  Multi-index: ES hashes the routing key
            # per index (each index has its own shard count), so the
            # covering set is computed per manifest and keyed (iid, sid).
            only_sids = frozenset(
                (iid, int(sid))
                for iid, m in enumerate(manifests)
                for sid in _segments_covering(
                    m,
                    int(route_partition(
                        np.asarray([route], dtype=object),
                        int(m.get("num_partitions", 1)),
                    )[0]),
                )
            )
        else:
            only_sids = None
        bf = _row_str(row, "boost_field")
        if bf is not None:
            # ES function_score field_value_factor columns: boost_field,
            # boost_modifier (default ln1p), boost_factor (default 1),
            # boost_missing (default 1 — the neutral for multiply)
            mod = _row_str(row, "boost_modifier") or "ln1p"
            if mod not in _FVF_MODIFIERS:
                raise ValueError(
                    f"unsupported boost_modifier {mod!r} "
                    f"(supported: {sorted(_FVF_MODIFIERS)})"
                )
            def _bnum(name: str) -> float:
                v = getattr(row, name, None)
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    return 1.0
                return float(v)

            fvf = (bf, mod, _bnum("boost_factor"), _bnum("boost_missing"))
        else:
            fvf = None
        rff = _row_str(row, "rf_field")
        if rff is not None:
            # ES rank_feature query columns: rf_field, rf_function
            # (saturation default / log / sigmoid), rf_pivot (saturation
            # pivot or log scaling_factor), rf_boost, rf_exponent
            rfn = _row_str(row, "rf_function") or "saturation"
            if rfn not in ("saturation", "log", "sigmoid"):
                raise ValueError(
                    f"unsupported rf_function {rfn!r} "
                    "(supported: saturation, log, sigmoid)"
                )
            rf = (
                rff, rfn, _num_or("rf_pivot", 1.0),
                _num_or("rf_boost", 1.0), _num_or("rf_exponent", 2.0),
            )
        else:
            rf = None
        dfef = _row_str(row, "dfe_field")
        if dfef is not None:
            # ES distance_feature query columns: dfe_field, dfe_origin,
            # dfe_pivot, dfe_boost
            dfe = (
                dfef, _num_or("dfe_origin", 0.0), _num_or("dfe_pivot", 1.0),
                _num_or("dfe_boost", 1.0),
            )
        else:
            dfe = None
        dcf = _row_str(row, "decay_field")
        if dcf is not None:
            # ES function_score decay columns: decay_field,
            # decay_function (gauss default / exp / linear), decay_origin,
            # decay_scale, decay_offset, decay_decay (the multiplier at
            # distance=scale past the offset, default 0.5)
            dfn = _row_str(row, "decay_function") or "gauss"
            if dfn not in ("gauss", "exp", "linear"):
                raise ValueError(
                    f"unsupported decay_function {dfn!r} "
                    "(supported: gauss, exp, linear)"
                )
            dc = (
                dcf, dfn, _num_or("decay_origin", 0.0),
                _num_or("decay_scale", 1.0), _num_or("decay_offset", 0.0),
                _num_or("decay_decay", 0.5),
            )
        else:
            dc = None
        scr = _row_str(row, "script")
        if scr is not None:
            _script_fields(scr)  # syntax/whitelist gate at plan time
        fscr = _row_str(row, "filter_script")
        if fscr is not None:
            _script_filter_sides(fscr)  # comparison-whitelist gate
        key = (
            tuple(terms), k, require_all, filter_lang, offset, mn_terms, fld,
            fr, fkw, fg, fgp, ms, resc, sa, fvf, rf, dfe, dc, scr, fscr,
            only_sids,
        )
        entry = plan_by_key.get(key)
        if entry is None:
            idf = bm25_idf(np.array([df_map[t] for t in terms], dtype=np.int64), n_docs)
            entry = plan_by_key[key] = {
                "query_ids": [],
                "terms": terms,
                "filter_ranges": list(fr) if fr else None,
                "filter_kw": list(fkw) if fkw else None,
                "filter_geo": fg,
                "filter_geo_poly": fgp,
                "min_score": ms,
                "rescore": (
                    {
                        "phrase": list(resc[0]),
                        "idf_sum": resc[1],
                        "window": resc[2],
                        "qw": resc[3],
                        "rw": resc[4],
                    }
                    if resc
                    else None
                ),
                "search_after": sa,
                "fvf": fvf,
                "rank_feature": rf,
                "distance_feature": dfe,
                "decay": dc,
                "script_score": scr,
                "filter_script": fscr,
                "only_sids": only_sids,
                "hl_terms": base_terms,
                "idf": np.asarray(idf, dtype=np.float64),
                "k": k + offset,  # shards keep the whole rank window
                "offset": offset,
                "size": k,
                "require_all": require_all,
                "filter_lang": filter_lang,
                "must_not": list(mn_terms) if mn_terms else None,
                "dl_field": fld,
                "avgdl": (float(avgdl_fields.get(fld, 0)) or 1.0) if fld else None,
            }
        entry["query_ids"].append(int(row.query_id))
    plan = list(plan_by_key.values())
    if not plan:  # every query analyzed to nothing / absent terms only
        empty0 = {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "key": pd.Series([], dtype=object),
            "score": pd.Series([], dtype=np.float64),
        }
        if fetch:
            empty0["text"] = pd.Series([], dtype=object)
        if highlight:
            empty0["highlight"] = pd.Series([], dtype=object)
        for ffld in fetch_fields or ():
            empty0[_split_fetch_field(ffld)[0]] = pd.Series([], dtype=object)
        # an arrow block keeps the column schema through to_pandas();
        # from_pandas on a 0-row frame surfaces as a schema-less dataset
        return rd.from_arrow(
            pa.Table.from_pandas(pd.DataFrame(empty0), preserve_index=False)
        )
    for pid_, q in enumerate(plan):
        q["plan_id"] = pid_
    QUERY_METRICS["query_batches"] += 1
    QUERY_METRICS["queries"] += len(queries)
    QUERY_METRICS["unique_plans"] += len(plan)
    QUERY_METRICS["segments_scheduled"] += len(parts)
    QUERY_METRICS["terms_looked_up"] += len(all_terms)
    tomb = (
        [m.get("tombstones", {}) for m in manifests]
        if multi
        else manifest.get("tombstones", {})
    )
    if indices_boost is not None and len(indices_boost) != len(dirs):
        raise ValueError(
            "indices_boost needs one multiplier per index "
            f"({len(indices_boost)} given, {len(dirs)} indexes)"
        )
    payload = (
        plan, avgdl, k1, b, tomb, fetch or highlight,
        tuple(fetch_fields or ()),
        [float(x) for x in indices_boost] if indices_boost is not None else None,
    )
    k_map = {q["plan_id"]: q["k"] for q in plan}
    window_map = {
        q["plan_id"]: (q.get("offset", 0), q.get("size", q["k"])) for q in plan
    }
    fanout_map = {q["plan_id"]: q["query_ids"] for q in plan}
    terms_map = {
        q["plan_id"]: sorted(
            set(q.get("hl_terms") or q.get("phrase") or q["terms"])
        )
        for q in plan
    }

    n_blocks = max(concurrency * 2, len(parts) // 4)
    shard_df = pd.DataFrame({"part_id": parts})
    if multi:
        shard_df["index_id"] = [iid for iid, _ in part_rows]
    partials = None
    if session is None:
        plan_ref = ray.put(payload)
        shards = rd.from_pandas(shard_df).repartition(min(n_blocks, len(parts)))
        partials = shards.map_batches(
            ShardScorerStage,
            fn_constructor_args=(dirs if multi else index_dir, plan_ref, cfg),
            batch_format="pandas",
            batch_size=4,
            concurrency=concurrency,
        )

    out_cols = ["query_id", "rank", "doc_id", "key", "score"]
    if multi:
        out_cols.append("index_id")
    if fetch:
        out_cols.append("text")
    if highlight:
        out_cols.append("highlight")
    out_cols.extend(_split_fetch_field(f)[0] for f in fetch_fields or ())

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid_, g in bucket.groupby("plan_id", sort=False):
            off, size = window_map.get(int(pid_), (0, k_map.get(int(pid_), 10)))
            ids = g["doc_id"].to_numpy()
            scores = g["score"].to_numpy()
            if multi:
                # ES multi-index tie-break: score desc, doc_id asc,
                # index_id asc (doc ids may collide across indexes)
                iid_col = g["index_id"].to_numpy()
                order = np.lexsort((iid_col, ids, -scores))[off : off + size]
            else:
                order = np.lexsort((ids, -scores))[off : off + size]
            top = pd.DataFrame(
                {
                    "rank": np.arange(off + 1, off + 1 + order.size, dtype=np.int64),
                    "doc_id": ids[order],
                    "key": g["key"].to_numpy()[order],
                    "score": scores[order],
                }
            )
            if multi:
                top["index_id"] = iid_col[order]
            if fetch or highlight:
                texts = g["text"].to_numpy()[order]
                if highlight:
                    terms = terms_map.get(int(pid_), [])
                    top["highlight"] = [make_snippet(t, terms) for t in texts]
                if fetch:
                    top["text"] = texts
            for ffld in fetch_fields or ():
                name = _split_fetch_field(ffld)[0]
                top[name] = g[name].to_numpy()[order]
            # fan the merged plan result out to every query sharing it —
            # one C-speed iloc take per plan (a per-qid .assign copy
            # measured as half the resident warm-batch wall time)
            qids = fanout_map.get(int(pid_), [])
            if not qids:
                continue
            k_rows = len(top)
            if len(qids) == 1:
                top["query_id"] = np.int64(qids[0])
                out.append(top)
            else:
                rep = top.iloc[
                    np.tile(np.arange(k_rows), len(qids))
                ].reset_index(drop=True)
                rep["query_id"] = np.repeat(
                    np.asarray(qids, dtype=np.int64), k_rows
                )
                out.append(rep)
        if not out:
            empty = {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
            for c in out_cols[5:]:
                empty[c] = pd.Series(
                    [], dtype=np.int64 if c == "index_id" else object
                )
            return pd.DataFrame(empty)
        return pd.concat(out, ignore_index=True)[out_cols]

    if session is not None:
        # resident path: per-shard partials come straight back from the
        # held scorer pool and merge driver-side.  Merge volume is
        # O(plans x shards x k) rank-window rows — the ES coordinating-
        # node contract — never corpus-scale, so a driver merge is the
        # scale-correct shape for a serving deployment.
        merged = session.score_merge(shard_df, payload, merge_bucket)
        return rd.from_arrow(
            pa.Table.from_pandas(merged, preserve_index=False)
        )
    return bucketed_group_agg(partials, ["plan_id"], merge_bucket)


def _shards_ds(parts: list[int], concurrency: int):
    import pandas as pd
    import ray.data as rd

    n_blocks = max(concurrency * 2, len(parts) // 4)
    return rd.from_pandas(pd.DataFrame({"part_id": parts})).repartition(
        max(1, min(n_blocks, len(parts)))
    )


def _row_filter_ranges(row) -> tuple | None:
    """Optional per-query range filter from queries-DataFrame columns
    ``range_field`` / ``range_gte`` / ``range_lte`` -> ((field, lo, hi),)
    or None.  NaN bound = open side."""
    fld = getattr(row, "range_field", None)
    if fld is None or (isinstance(fld, float) and pd.isna(fld)):
        return None

    def _num(name):
        v = getattr(row, name, None)
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        return float(v)

    return ((str(fld), _num("range_gte"), _num("range_lte")),)


def _row_filter_geo(row) -> tuple | None:
    """Optional ES geo_distance filter from queries-DataFrame columns
    ``geo_field`` / ``geo_lat`` / ``geo_lon`` / ``geo_distance_m`` ->
    (field, lat0, lon0, dist_m) or None — the ES bool filter clause
    {"geo_distance": {"distance": "...", field: {"lat":…, "lon":…}}}."""
    fld = getattr(row, "geo_field", None)
    if fld is None or (isinstance(fld, float) and pd.isna(fld)):
        return None
    return (
        str(fld),
        float(row.geo_lat),
        float(row.geo_lon),
        float(row.geo_distance_m),
    )


def _row_filter_geo_poly(row) -> tuple | None:
    """Optional ES geo_polygon filter from queries-DataFrame columns
    ``geo_poly_field`` + ``geo_poly_pts`` ("lat:lon|lat:lon|..." — a
    CONVEX polygon, >= 3 vertices) -> (field, ((lat, lon), ...)) or
    None.  Convexity is the documented contract (half-plane tests)."""
    fld = getattr(row, "geo_poly_field", None)
    if fld is None or (isinstance(fld, float) and pd.isna(fld)):
        return None
    pts = []
    for part in str(row.geo_poly_pts).split("|"):
        la, _, lo = part.partition(":")
        pts.append((float(la), float(lo)))
    if len(pts) < 3:
        raise ValueError("geo_polygon: need >= 3 vertices")
    return (str(fld), tuple(pts))


def _row_filter_geo_bbox(row) -> tuple | None:
    """Optional ES geo_bounding_box filter from queries-DataFrame columns
    ``geo_bbox_field`` + ``geo_bbox_top/left/bottom/right`` — the ES
    rewrite is exactly two numeric range filters over the mapped lat/lon
    columns (no antimeridian crossing: left <= right required), so the
    result plugs into ``filter_ranges``."""
    fld = getattr(row, "geo_bbox_field", None)
    if fld is None or (isinstance(fld, float) and pd.isna(fld)):
        return None
    left, right = float(row.geo_bbox_left), float(row.geo_bbox_right)
    if left > right:
        raise ValueError("geo_bounding_box: antimeridian crossing unsupported")
    return (
        (f"{fld}_lat", float(row.geo_bbox_bottom), float(row.geo_bbox_top)),
        (f"{fld}_lon", left, right),
    )


def _row_filter_kw(row) -> tuple | None:
    """Optional per-query keyword term(s) filter from queries-DataFrame
    columns ``kw_field`` / ``kw_value`` -> ((field, (v1, ...)),) or None
    — the ES bool filter clause {"term": {kw_field: v}} / {"terms":
    {kw_field: [v1, ...]}} (filter context: pure match-set restriction,
    no score contribution).  ``kw_value`` takes ``|``-separated
    alternatives for the terms (membership) form."""
    fld = getattr(row, "kw_field", None)
    if fld is None or (isinstance(fld, float) and pd.isna(fld)):
        return None
    val = getattr(row, "kw_value", None)
    if val is None or (isinstance(val, float) and pd.isna(val)):
        return None
    return ((str(fld), tuple(sorted(str(val).split("|")))),)


def _scored_match_plans(
    queries: pd.DataFrame, index_dir: str, parts: list[int], n_docs: int
) -> list[dict]:
    """Deduped SCORED match plans (terms + idf + filters, plan_id
    assigned) for the collapse / top_hits family — the plain-match subset
    of run_queries' planner, with the dictionary-only global-df pass
    included."""
    terms_set: set[str] = set()
    for row in queries.itertuples(index=False):
        terms_set.update(get_analyzer(getattr(row, "lang", None)).tokenize(row.text))
    all_terms = sorted(terms_set)
    df_map = dict(zip(all_terms, _collect_global_stats(index_dir, parts, all_terms)))
    plan_by_key: dict[tuple, dict] = {}
    for row in queries.itertuples(index=False):
        lang_q = getattr(row, "lang", None)
        base_terms = sorted(set(get_analyzer(lang_q).tokenize(row.text)))
        require_all = (getattr(row, "operator", None) or "or") == "and"
        terms = [t for t in base_terms if df_map.get(t, 0) > 0]
        if not terms or (require_all and len(terms) < len(base_terms)):
            continue
        filter_lang = getattr(row, "filter_lang", None)
        fr = _row_filter_ranges(row)
        key = (tuple(terms), require_all, filter_lang, fr)
        entry = plan_by_key.get(key)
        if entry is None:
            idf = bm25_idf(np.array([df_map[t] for t in terms], dtype=np.int64), n_docs)
            entry = plan_by_key[key] = {
                "query_ids": [],
                "terms": terms,
                "idf": np.asarray(idf, dtype=np.float64),
                "require_all": require_all,
                "filter_lang": filter_lang,
                "filter_ranges": list(fr) if fr else None,
            }
        entry["query_ids"].append(int(row.query_id))
    plan = list(plan_by_key.values())
    for pid_, q in enumerate(plan):
        q["plan_id"] = pid_
    return plan


def _match_set_plans(queries: pd.DataFrame) -> list[dict]:
    """Deduped match-set plans for _count / terms-agg: unique
    (terms, require_all, filter_lang) entries carrying their query_ids.
    Needs NO global-stats pass — segment_matching_ids handles per-segment
    term absence exactly."""
    plan_by_key: dict[tuple, dict] = {}
    for row in queries.itertuples(index=False):
        lang_q = getattr(row, "lang", None)
        filter_lang = getattr(row, "filter_lang", None)
        fr = _row_filter_ranges(row)
        pp = getattr(row, "phrase_prefix", None)
        if pp is not None and not (isinstance(pp, float) and pd.isna(pp)):
            # ES match_phrase_prefix row: analyze; last token is a prefix
            toks_pp = get_analyzer(lang_q).tokenize(str(pp))
            if not toks_pp:
                continue
            key = ("__pp__", tuple(toks_pp), filter_lang, fr)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "pp_fixed": toks_pp[:-1],
                    "pp_prefix": toks_pp[-1],
                    "filter_lang": filter_lang,
                    "filter_ranges": list(fr) if fr else None,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        fz = getattr(row, "fuzzy", None)
        if fz is not None and not (isinstance(fz, float) and pd.isna(fz)):
            # ES fuzzy query row: edit-distance-1 dictionary expansion
            key = ("__fuzzy__", str(fz), filter_lang, fr)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "fuzzy": str(fz),
                    "filter_lang": filter_lang,
                    "filter_ranges": list(fr) if fr else None,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        wc = getattr(row, "wildcard", None)
        if wc is not None and not (isinstance(wc, float) and pd.isna(wc)):
            # ES wildcard query row: pre*suf dictionary expansion
            key = ("__wildcard__", str(wc), filter_lang, fr)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "wildcard": str(wc),
                    "filter_lang": filter_lang,
                    "filter_ranges": list(fr) if fr else None,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        rex = getattr(row, "regexp", None)
        if rex is not None and not (isinstance(rex, float) and pd.isna(rex)):
            # ES regexp query row: anchored RE2 dictionary expansion
            key = ("__regexp__", str(rex), filter_lang, fr)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "regexp": str(rex),
                    "filter_lang": filter_lang,
                    "filter_ranges": list(fr) if fr else None,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        ex = getattr(row, "exists", None)
        if ex is not None and not (isinstance(ex, float) and pd.isna(ex)):
            # ES exists query row: docstore missing-value scan
            key = ("__exists__", str(ex), filter_lang, fr)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "exists": str(ex),
                    "filter_lang": filter_lang,
                    "filter_ranges": list(fr) if fr else None,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        pfx = getattr(row, "prefix", None)
        if pfx is not None and not (isinstance(pfx, float) and pd.isna(pfx)):
            # ES prefix query row: dictionary-range expansion, no analysis
            key = ("__prefix__", str(pfx), filter_lang, fr)
            entry = plan_by_key.get(key)
            if entry is None:
                entry = plan_by_key[key] = {
                    "query_ids": [],
                    "prefix": str(pfx),
                    "filter_lang": filter_lang,
                    "filter_ranges": list(fr) if fr else None,
                }
            entry["query_ids"].append(int(row.query_id))
            continue
        terms = sorted(set(get_analyzer(lang_q).tokenize(row.text)))
        fld_ms = getattr(row, "field", None)
        if fld_ms is not None and not (
            isinstance(fld_ms, float) and pd.isna(fld_ms)
        ):
            # field-scoped match over a mapped text field (field-prefixed
            # dictionary terms — e.g. the index_prefixes subfield)
            terms = [f"{fld_ms}\x1f{t}" for t in terms]
        require_all = (getattr(row, "operator", None) or "or") == "and"
        fkw = _row_filter_kw(row)
        key = (tuple(terms), require_all, filter_lang, fr, fkw)
        entry = plan_by_key.get(key)
        if entry is None:
            entry = plan_by_key[key] = {
                "query_ids": [],
                "terms": terms,
                "require_all": require_all,
                "filter_lang": filter_lang,
                "filter_ranges": list(fr) if fr else None,
                "filter_kw": list(fkw) if fkw else None,
            }
        entry["query_ids"].append(int(row.query_id))
    plan = list(plan_by_key.values())
    for pid_, q in enumerate(plan):
        q["plan_id"] = pid_
    return plan


def _run_match_set(
    queries_ds, index_dir: str, field: str | None, cfg: EngineConfig,
    concurrency: int | None, shard_size: int | None = None,
    terminate_after: int | None = None, sample: tuple | None = None,
    session=None,
) -> tuple[pd.DataFrame, list[dict]]:
    """Shared distributed driver for _count (field=None) and terms agg:
    segments as the Dataset, plans broadcast, per-(plan[,value]) partial
    counts summed in a bucketed merge.  ``shard_size`` truncates each
    segment's bucket list (ES terms shard_size; adds kind=2 error-bound
    rows; terminate_after flags are kind=1).  Returns (summed partials,
    plan)."""
    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    if session is not None:
        # resident MatchSet path (query/searcher.py): single-index only
        if list(session.dirs) != [index_dir]:
            raise ValueError(
                "session was opened on a different index than this call"
            )
        session.sync()
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    plan = _match_set_plans(queries)
    if not plan:
        return pd.DataFrame({"plan_id": [], "kind": [], "value": [], "n": []}), plan
    payload = (
        plan, manifest.get("tombstones", {}), field, shard_size,
        terminate_after, sample,
    )

    def sum_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["plan_id", "kind", "value"], as_index=False).agg(
            n=("n_partial", "sum")
        )
        return g.astype({"plan_id": np.int64, "kind": np.int64, "n": np.int64})

    if session is not None:
        summed = session.match_merge(
            pd.DataFrame({"part_id": parts}), payload, sum_bucket
        )
        return summed, plan
    plan_ref = ray.put(payload)
    partials = _shards_ds(parts, concurrency).map_batches(
        MatchSetStage,
        fn_constructor_args=(index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )
    summed = bucketed_group_agg(
        partials, ["plan_id", "kind", "value"], sum_bucket
    ).to_pandas()
    return summed, plan


def run_counts(
    queries_ds, index_dir: str, cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None, terminate_after: int | None = None,
    session=None,
) -> pd.DataFrame:
    """Distributed ES _count: (query_id, n_matching) for every input
    query (0 when nothing matches).  The match-set evaluation runs
    segment-parallel through the LRU-capped MatchSetStage pool; only one
    count row per (plan, segment) ever reaches the merge.

    ``terminate_after``: the ES per-shard early-termination cap — each
    segment contributes at most this many matches (a shard that reaches
    the cap stops counting, so a contribution == cap means possibly
    more).  Adds a ``terminated_early`` bool column (true when ANY
    segment hit the cap, the ES response flag).  The capping happens on
    the per-(plan, segment) partial rows — semantically identical to
    in-shard early exit; the full count is never exchanged."""
    summed, plan = _run_match_set(
        queries_ds, index_dir, None, cfg, concurrency,
        terminate_after=terminate_after, session=session,
    )
    by_plan: dict[int, int] = {}
    term_by_plan: dict[int, bool] = {}
    if len(summed):
        counts = summed[summed["kind"] == 0]
        by_plan = counts.groupby("plan_id")["n"].sum().to_dict()
        flags = summed[summed["kind"] == 1]
        term_by_plan = (flags.groupby("plan_id")["n"].sum() > 0).to_dict()
    rows = [
        {
            "query_id": qid,
            "n_matching": int(by_plan.get(q["plan_id"], 0)),
            "terminated_early": bool(term_by_plan.get(q["plan_id"], False)),
        }
        for q in plan
        for qid in q["query_ids"]
    ]
    out = (
        pd.DataFrame(rows, columns=["query_id", "n_matching", "terminated_early"])
        .sort_values("query_id")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_matching": np.int64})
    )
    if terminate_after is None:
        out = out.drop(columns=["terminated_early"])
    return out


def run_agg_terms(
    queries_ds,
    index_dir: str,
    field: str = "lang",
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    size: int | None = None,
    shard_size: int | None = None,
    order: str = "count",
    include: str | None = None,
    exclude: str | None = None,
    missing: str | None = None,
    partition: tuple | None = None,
    min_doc_count: int = 1,
    session=None,
) -> pd.DataFrame:
    """Distributed ES terms aggregation over each query's match set:
    (query_id, value, n_docs) in ES bucket order (n_docs desc, value
    asc).  ``field`` is 'lang' or any cfg.keyword_cols field stored at
    build time.  ``size`` truncates the final bucket list per query (the
    ES size parameter); ``shard_size`` additionally truncates each
    SEGMENT's candidate list before the exchange — the ES approximation
    that bounds shuffle volume at any value cardinality — and adds the
    exact ES ``doc_count_error_upper_bound`` column (Σ over truncated
    segments of their smallest kept count; 0 when nothing was cut).
    ``order``: the ES terms order param — "count" ({"_count": "desc"},
    the default) or "key" ({"_key": "asc"}); the size cut happens in the
    chosen order, like ES.

    ``include`` / ``exclude``: the ES value-filter options — anchored
    RE2-compatible regexes keeping / dropping bucket VALUES, applied
    before ordering and the ``size`` cut.  (Applied at the merge over
    the already-bounded bucket frame; under ``shard_size`` the error
    bound is computed pre-filter — conservative.)  ``missing``: docs
    whose field is unmapped/empty (the engine's "" encoding) bucket
    under this value instead of being dropped (the ES missing param).

    ``partition`` = (p, num_partitions): the ES terms-partitioning pager
    (``include: {partition, num_partitions}``) — keep only values whose
    hash lands in partition p, so huge value spaces page in bounded
    slices.  Hash = the engine-wide md5 sampling contract
    (seeded_hash_mod; DuckDB replay md5_number_lower(value) % n).
    ``min_doc_count`` (ES default 1) drops buckets with fewer docs,
    applied after the missing/include/exclude rewrites like ES."""
    import re as _re

    if order not in ("count", "key"):
        raise ValueError(f"terms order must be 'count' or 'key', got {order!r}")
    inc_re = _re.compile(include) if include is not None else None
    exc_re = _re.compile(exclude) if exclude is not None else None
    summed, plan = _run_match_set(
        queries_ds, index_dir, field, cfg, concurrency, shard_size=shard_size,
        session=session,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    out = []
    if len(summed):
        for pid_, g in summed.groupby("plan_id", sort=True):
            is_bound = g["kind"] == 2
            bound = int(g[is_bound]["n"].sum())
            g = g[~is_bound]
            if missing is not None:
                g = g.copy()
                g.loc[g["value"] == "", "value"] = missing
                g = g.groupby("value", as_index=False, sort=False)["n"].sum()
                g["plan_id"] = int(pid_)
            if inc_re is not None:
                g = g[[bool(inc_re.fullmatch(v)) for v in g["value"]]]
            if exc_re is not None:
                g = g[[not exc_re.fullmatch(v) for v in g["value"]]]
            if partition is not None and len(g):
                p, np_ = int(partition[0]), int(partition[1])
                g = g[
                    seeded_hash_mod(g["value"].to_numpy(), np_) == p
                ]
            if min_doc_count > 1:
                g = g[g["n"] >= int(min_doc_count)]
            if order == "key":
                g = g.sort_values("value", kind="mergesort")
            else:
                g = g.sort_values(
                    ["n", "value"], ascending=[False, True], kind="mergesort"
                )
            if size is not None:
                g = g.head(int(size))
            for qid in fanout.get(int(pid_), []):
                frame = {
                    "query_id": np.int64(qid),
                    "value": g["value"].to_numpy(),
                    "n_docs": g["n"].to_numpy(),
                }
                if shard_size is not None:
                    frame["doc_count_error_upper_bound"] = np.int64(bound)
                out.append(pd.DataFrame(frame))
    if not out:
        empty = {
            "query_id": pd.Series([], dtype=np.int64),
            "value": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
        }
        if shard_size is not None:
            empty["doc_count_error_upper_bound"] = pd.Series([], dtype=np.int64)
        return pd.DataFrame(empty)
    return (
        pd.concat(out, ignore_index=True)
        .sort_values("query_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_docs": np.int64})
    )


def run_agg_random_sampler(
    queries_ds, index_dir: str, field: str,
    probability: float = 0.3, seed: int = 42,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
    session=None,
) -> pd.DataFrame:
    """ES random_sampler aggregation: the terms sub-agg runs over a
    random ``probability`` sample of each query's match set, counts
    scaled back by 1/p.  Sampling is per-doc deterministic —
    ``md5_number_lower(f"{seed}:{doc_id}") % 1e6 < p*1e6`` (the engine
    sampling contract: reproducible across reruns and shard layouts,
    where ES's is not; DuckDB-replayable) and happens INSIDE the
    per-segment sweep, so only sampled-value partials leave the shard.
    Returns (query_id, value, n_sampled, n_scaled) in bucket order
    (n_sampled desc, value asc); n_scaled = round6(n_sampled / p)."""
    if not (0.0 < probability <= 1.0):
        raise ValueError("random_sampler: probability must be in (0, 1]")
    keep_mod = int(round(probability * 1_000_000))
    summed, plan = _run_match_set(
        queries_ds, index_dir, field, cfg, concurrency,
        sample=(int(seed), keep_mod), session=session,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    out = []
    if len(summed):
        for pid_, g in summed.groupby("plan_id", sort=True):
            g = g.sort_values(
                ["n", "value"], ascending=[False, True], kind="mergesort"
            )
            for qid in fanout.get(int(pid_), []):
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "value": g["value"].to_numpy(),
                            "n_sampled": g["n"].to_numpy(np.int64),
                            "n_scaled": round6(
                                g["n"].to_numpy(np.float64) / probability
                            ),
                        }
                    )
                )
    if not out:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=object),
                "n_sampled": pd.Series([], dtype=np.int64),
                "n_scaled": pd.Series([], dtype=np.float64),
            }
        )
    return (
        pd.concat(out, ignore_index=True)
        .sort_values("query_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_sampled": np.int64})
    )


def run_agg_filters(
    queries_ds, index_dir: str, field: str, named: dict,
    other_bucket: bool = True,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES filters aggregation with named term-filter buckets: per query,
    the match-set doc count under each named ``{bucket_name: field
    value}`` filter, plus the ES ``other_bucket`` (docs matching none of
    the named filters — ES key ``_other_``).  Zero-count named buckets
    ARE emitted (ES filters always returns every named bucket).  Reuses
    the one terms-agg partial sweep (per-keyword-value counts), so the
    exchange stays plans x segments x values.  Returns (query_id,
    bucket, n_docs) sorted (query_id, bucket)."""
    summed, plan = _run_match_set(queries_ds, index_dir, field, cfg, concurrency)
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    names = sorted(named)
    out = []
    for q in plan:
        pid_ = q["plan_id"]
        g = summed[summed["plan_id"] == pid_] if len(summed) else summed
        counts = (
            dict(zip(g["value"], g["n"].astype(np.int64))) if len(g) else {}
        )
        total = int(sum(counts.values()))
        rows = [(nm, int(counts.get(named[nm], 0))) for nm in names]
        if other_bucket:
            rows.append(("_other_", total - sum(n for _, n in rows)))
        for qid in fanout.get(int(pid_), []):
            for nm, n in rows:
                out.append((np.int64(qid), nm, np.int64(n)))
    res = pd.DataFrame(out, columns=["query_id", "bucket", "n_docs"])
    return (
        res.sort_values(["query_id", "bucket"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_docs": np.int64})
    )


def _run_numeric_agg(
    queries_ds, index_dir: str, field, interval,
    cfg: EngineConfig, concurrency: int | None, group_field=None,
    metric_field=None,
) -> tuple[pd.DataFrame, list[dict]]:
    """Shared distributed driver for stats / histogram / date_histogram /
    range / matrix-stats / composite aggregations (mode selection
    documented on NumericAggStage).  Returns (partials, plan); partials
    rows = plans x segments (x buckets) — never doc rows."""
    import ray

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    plan = _match_set_plans(queries)
    if not plan:
        return pd.DataFrame({c: [] for c in NumericAggStage._COLS}), plan
    plan_ref = ray.put(
        (plan, manifest.get("tombstones", {}), field, interval, group_field,
         metric_field)
    )
    partials = (
        _shards_ds(parts, concurrency)
        .map_batches(
            NumericAggStage,
            fn_constructor_args=(index_dir, plan_ref, cfg),
            batch_format="pandas",
            batch_size=4,
            concurrency=concurrency,
        )
        .to_pandas()  # plans x segments (x buckets) rows — tiny by design
    )
    return partials, plan


def run_agg_stats(
    queries_ds, index_dir: str, field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES stats aggregation: (query_id, n_docs, min_val,
    max_val, sum_val, avg_val) of a numeric-mapped field over each
    query's match set (missing values excluded).  Queries with an empty
    match set are omitted (ES returns null stats)."""
    partials, plan = _run_numeric_agg(queries_ds, index_dir, field, None, cfg, concurrency)
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = partials.groupby("plan_id", sort=True).agg(
            n=("n", "sum"), s=("sum", "sum"), mn=("mn", "min"), mx=("mx", "max")
        )
        for pid_, r in g.iterrows():
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    {
                        "query_id": np.int64(qid),
                        "n_docs": np.int64(r["n"]),
                        "min_val": float(r["mn"]),
                        "max_val": float(r["mx"]),
                        "sum_val": float(r["s"]),
                        "avg_val": float(round6(np.array([r["s"] / r["n"]]))[0]),
                    }
                )
    out = pd.DataFrame(
        rows, columns=["query_id", "n_docs", "min_val", "max_val", "sum_val", "avg_val"]
    )
    return out.sort_values("query_id", kind="mergesort").reset_index(drop=True).astype(
        {"query_id": np.int64, "n_docs": np.int64}
    )


def run_agg_histogram(
    queries_ds, index_dir: str, field: str, interval: float,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
    offset: float = 0.0, min_doc_count: int = 1,
    extended_bounds: tuple | None = None,
) -> pd.DataFrame:
    """Distributed ES histogram aggregation: fixed-interval bucket counts
    (key = floor((val - offset)/interval)*interval + offset) per query.
    Returns (query_id, bucket, n_docs) sorted bucket asc; empty buckets
    omitted under the default min_doc_count=1.

    ``offset`` shifts every bucket boundary (the ES histogram offset
    option; applied in-shard so partials stay mergeable by key).
    ``min_doc_count=0`` emits empty buckets between the min and max
    observed keys — a pure driver reduce over the already-merged bucket
    frame, like the date_histogram gap filling.  ``extended_bounds``
    = (lo, hi) widens that fill range regardless of observed data (ES
    semantics: only meaningful with min_doc_count=0; bounds snap to
    bucket keys containing them)."""
    iv = float(interval)
    payload = {"interval": iv, "offset": float(offset)} if offset else iv
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, field, payload, cfg, concurrency
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            keys = gg["bucket"].to_numpy(np.float64)
            cnts = gg["n"].to_numpy(np.int64)
            if int(min_doc_count) == 0 and keys.size:
                lo, hi = keys.min(), keys.max()
                if extended_bounds is not None:
                    blo, bhi = extended_bounds
                    snap = lambda v: np.floor((v - offset) / iv) * iv + offset
                    lo = min(lo, snap(float(blo)))
                    hi = max(hi, snap(float(bhi)))
                full = lo + iv * np.arange(
                    0, int(np.floor((hi - lo) / iv + 0.5)) + 1, dtype=np.float64
                )
                filled = np.zeros(full.size, dtype=np.int64)
                pos = np.searchsorted(full, keys)
                # snap fp drift: keys are exact multiples by construction
                filled[np.minimum(pos, full.size - 1)] = cnts
                keys, cnts = full, filled
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "bucket": keys,
                            "n_docs": cnts,
                        }
                    )
                )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "bucket": pd.Series([], dtype=np.float64),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["query_id", "bucket"], kind="mergesort")
        .reset_index(drop=True)
    )


def run_agg_terms_stats(
    queries_ds, index_dir: str, group_field: str, metric_field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES sub-aggregation: a terms bucket over ``group_field``
    with a nested stats metric over ``metric_field`` per bucket — the
    canonical `aggs: {terms: {...}, aggs: {stats: {...}}}` shape.
    Returns (query_id, value, n_docs, min_val, max_val, sum_val, avg_val)
    in ES bucket order (n_docs desc, value asc); docs with a missing
    metric value are excluded (ES stats semantics)."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, metric_field, None, cfg, concurrency,
        group_field=group_field,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = partials.groupby(["plan_id", "bucket"], as_index=False).agg(
            n=("n", "sum"), s=("sum", "sum"), mn=("mn", "min"), mx=("mx", "max")
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            gg = gg.sort_values(
                ["n", "bucket"], ascending=[False, True], kind="mergesort"
            )
            for qid in fanout.get(int(pid_), []):
                for r in gg.itertuples(index=False):
                    rows.append(
                        {
                            "query_id": np.int64(qid),
                            "value": str(r.bucket),
                            "n_docs": np.int64(r.n),
                            "min_val": float(r.mn),
                            "max_val": float(r.mx),
                            "sum_val": float(r.s),
                            "avg_val": float(round6(np.array([r.s / r.n]))[0]),
                        }
                    )
    out = pd.DataFrame(
        rows,
        columns=["query_id", "value", "n_docs", "min_val", "max_val", "sum_val", "avg_val"],
    )
    return out.sort_values(
        ["query_id"], kind="mergesort"
    ).reset_index(drop=True).astype({"query_id": np.int64, "n_docs": np.int64})


def run_agg_terms_numeric(
    queries_ds, index_dir: str, field: str, size: int | None = None,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES terms aggregation over a NUMERIC field (ES terms
    works on any mapped field; keyword fields go through run_agg_terms):
    per-value doc counts from the per-value partial mode (shuffle =
    plans x segments x distinct values — right for integer-ish doc
    metadata), ES bucket order (n_docs desc, value asc), optional
    ``size`` cut.  Missing (NaN) values never bucket.  Returns
    (query_id, value, n_docs)."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, field, 0.0, cfg, concurrency
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            gg = gg.sort_values(
                ["n", "bucket"], ascending=[False, True], kind="mergesort"
            )
            if size is not None:
                gg = gg.head(int(size))
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "value": gg["bucket"].to_numpy(np.float64),
                            "n_docs": gg["n"].to_numpy(np.int64),
                        }
                    )
                )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=np.float64),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["query_id", "n_docs", "value"],
                     ascending=[True, False, True], kind="mergesort")
        .reset_index(drop=True)
    )


def run_agg_percentiles(
    queries_ds, index_dir: str, field: str, percentiles=(25.0, 50.0, 75.0, 99.0),
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES percentiles aggregation — EXACT via per-value
    count partials (shuffle = plans x segments x distinct values; right
    when the numeric field is integer-ish doc metadata, the common ES
    case — for unbounded-cardinality doubles use run_agg_histogram).
    Nearest-rank definition (rank = ceil(n*p/100), 1-based) == DuckDB
    quantile_disc, ES percentiles with tdigest would interpolate.
    Returns (query_id, pct, value) sorted."""
    partials, plan = _run_numeric_agg(queries_ds, index_dir, field, 0.0, cfg, concurrency)
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            vals = gg["bucket"].to_numpy(np.float64)  # ascending (sorted groupby)
            cum = gg["n"].to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            for p in percentiles:
                rank = max(1, int(np.ceil(n * float(p) / 100.0)))
                v = float(vals[int(np.searchsorted(cum, rank))])
                for qid in fanout.get(int(pid_), []):
                    rows.append((np.int64(qid), float(p), v))
    out = pd.DataFrame(rows, columns=["query_id", "pct", "value"])
    return (
        out.sort_values(["query_id", "pct"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "pct": np.float64, "value": np.float64})
    )


def run_agg_percentile_ranks(
    queries_ds, index_dir: str, field: str, values=(200.0, 500.0, 900.0),
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES percentile_ranks aggregation — EXACT (the inverse
    of run_agg_percentiles, same per-value count partials): for each
    requested value v, the percent of the query's match-set field values
    <= v (ES tdigest would interpolate; exact == DuckDB
    ``100.0 * count(*) FILTER (WHERE x <= v) / count(*)``).  Queries
    with an empty match set are omitted.  Returns (query_id, value, pct)
    sorted."""
    partials, plan = _run_numeric_agg(queries_ds, index_dir, field, 0.0, cfg, concurrency)
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            vals = gg["bucket"].to_numpy(np.float64)  # ascending
            cum = gg["n"].to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            for v in values:
                idx = int(np.searchsorted(vals, float(v), side="right")) - 1
                c = int(cum[idx]) if idx >= 0 else 0
                pct = float(round6(np.array([100.0 * c / n]))[0])
                for qid in fanout.get(int(pid_), []):
                    rows.append((np.int64(qid), float(v), pct))
    out = pd.DataFrame(rows, columns=["query_id", "value", "pct"])
    return (
        out.sort_values(["query_id", "value"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "value": np.float64, "pct": np.float64})
    )


def _agglomerate_1d(
    vals: np.ndarray, counts: np.ndarray, buckets: int
) -> list[tuple[float, float, float, int]]:
    """Deterministic 1-D agglomerative clustering: start one cluster per
    distinct value, repeatedly merge the ADJACENT pair with the smallest
    weighted-centroid gap (ties: leftmost) until `buckets` remain.
    Returns [(min, max, centroid, count)] ascending."""
    mins, maxs = list(vals), list(vals)
    sums = [v * c for v, c in zip(vals, counts.astype(np.float64))]
    ns = list(counts.astype(np.int64))
    while len(ns) > buckets:
        cents = [s / n for s, n in zip(sums, ns)]
        gaps = np.diff(np.asarray(cents))
        i = int(np.argmin(gaps))  # argmin takes the FIRST minimum: leftmost
        mins[i : i + 2] = [mins[i]]
        maxs[i : i + 2] = [maxs[i + 1]]
        sums[i : i + 2] = [sums[i] + sums[i + 1]]
        ns[i : i + 2] = [ns[i] + ns[i + 1]]
    return [
        (float(mn), float(mx), float(s / n), int(n))
        for mn, mx, s, n in zip(mins, maxs, sums, ns)
    ]


def run_agg_variable_width_histogram(
    queries_ds, index_dir: str, field: str, buckets: int = 5,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES variable_width_histogram aggregation — the same
    exact per-value count partials as percentiles (ONE segment sweep,
    shuffle = plans x segments x distinct values), clustered on the
    driver by deterministic 1-D agglomerative merging (adjacent smallest
    weighted-centroid gap, leftmost tie-break).  ES's collector is an
    approximate streaming clusterer whose buckets depend on shard visit
    order; this engine trades that for a deterministic exact-partials
    spec (documented deviation — same output contract: ordered,
    non-overlapping buckets with min/max/centroid/doc_count).  Returns
    (query_id, bucket, min, max, centroid, doc_count); centroid round6.
    Queries whose match set is empty are omitted."""
    partials, plan = _run_numeric_agg(queries_ds, index_dir, field, 0.0, cfg, concurrency)
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            vals = gg["bucket"].to_numpy(np.float64)  # ascending
            counts = gg["n"].to_numpy(np.int64)
            clusters = _agglomerate_1d(vals, counts, buckets)
            for b, (mn, mx, cent, n) in enumerate(clusters):
                cent6 = float(round6(np.array([cent]))[0])
                for qid in fanout.get(int(pid_), []):
                    rows.append((np.int64(qid), np.int64(b), mn, mx, cent6, n))
    out = pd.DataFrame(
        rows, columns=["query_id", "bucket", "min", "max", "centroid", "doc_count"]
    )
    return (
        out.sort_values(["query_id", "bucket"], kind="mergesort")
        .reset_index(drop=True)
        .astype(
            {
                "query_id": np.int64, "bucket": np.int64, "min": np.float64,
                "max": np.float64, "centroid": np.float64,
                "doc_count": np.int64,
            }
        )
    )


def run_agg_extended_stats(
    queries_ds, index_dir: str, field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES extended_stats aggregation: stats plus
    sum_of_squares / population variance / std_deviation per query match
    set.  Variance uses the exact-sum formula (n*ss - s^2)/n^2 — with
    integer-valued fields both partial sums are exact in float64, so the
    SQL oracle (same formula over exact sums) matches to the last bit."""
    partials, plan = _run_numeric_agg(queries_ds, index_dir, field, None, cfg, concurrency)
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = partials.groupby("plan_id", sort=True).agg(
            n=("n", "sum"), s=("sum", "sum"), ss=("ss", "sum"),
            mn=("mn", "min"), mx=("mx", "max"),
        )
        for pid_, r in g.iterrows():
            n, s, ss = float(r["n"]), float(r["s"]), float(r["ss"])
            var = (n * ss - s * s) / (n * n)
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    {
                        "query_id": np.int64(qid),
                        "n_docs": np.int64(r["n"]),
                        "min_val": float(r["mn"]),
                        "max_val": float(r["mx"]),
                        "sum_val": s,
                        "avg_val": float(round6(np.array([s / n]))[0]),
                        "sum_sq": ss,
                        "variance": float(round6(np.array([var]))[0]),
                        "std_dev": float(round6(np.array([np.sqrt(var)]))[0]),
                    }
                )
    out = pd.DataFrame(
        rows,
        columns=["query_id", "n_docs", "min_val", "max_val", "sum_val",
                 "avg_val", "sum_sq", "variance", "std_dev"],
    )
    return out.sort_values("query_id", kind="mergesort").reset_index(drop=True).astype(
        {"query_id": np.int64, "n_docs": np.int64}
    )


def _calendar_buckets_between(lo: int, hi: int, unit: str) -> np.ndarray:
    """Every calendar bucket start in [lo, hi] (both already floored) —
    the ES empty-bucket enumeration for min_doc_count=0 gap filling."""
    fx = _fixed_interval_secs(unit)
    if fx is not None:
        return np.arange(lo, hi + 1, fx, dtype=np.int64)
    if unit == "day":
        return np.arange(lo, hi + 1, 86400, dtype=np.int64)
    if unit == "week":
        return np.arange(lo, hi + 1, 604800, dtype=np.int64)
    if unit in ("month", "year"):
        u = "M" if unit == "month" else "Y"
        a = np.datetime64(int(lo), "s").astype(f"datetime64[{u}]")
        b = np.datetime64(int(hi), "s").astype(f"datetime64[{u}]")
        return (
            np.arange(a, b + np.timedelta64(1, u))
            .astype("datetime64[s]").astype(np.int64)
        )
    raise ValueError(f"unsupported calendar interval {unit!r}")


def run_agg_date_histogram(
    queries_ds, index_dir: str, field: str, calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
    min_doc_count: int = 1,
) -> pd.DataFrame:
    """Distributed ES date_histogram aggregation (calendar_interval =
    day/week/month/year) over an epoch-seconds numeric field: bucket key
    = the bucket-start epoch seconds (ES returns epoch millis; seconds
    here since the field is seconds).  Weeks start Monday (ISO/ES).

    ``min_doc_count``: 1 (default here) omits empty buckets; 0 emits
    every calendar bucket between each query's first and last non-empty
    bucket with n_docs=0 — the ES date_histogram default (gap filling;
    the enumeration happens on the driver over the already-tiny bucket
    frame, exactly where ES's reduce phase creates them)."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, field, str(calendar_interval), cfg, concurrency
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            buckets = gg["bucket"].to_numpy(np.int64)
            counts = gg["n"].to_numpy(np.int64)
            if int(min_doc_count) == 0 and buckets.size:
                full = _calendar_buckets_between(
                    int(buckets.min()), int(buckets.max()),
                    str(calendar_interval),
                )
                filled = np.zeros(full.size, dtype=np.int64)
                filled[np.searchsorted(full, buckets)] = counts
                buckets, counts = full, filled
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "bucket_ts": buckets,
                            "n_docs": counts,
                        }
                    )
                )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "bucket_ts": pd.Series([], dtype=np.int64),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["query_id", "bucket_ts"], kind="mergesort")
        .reset_index(drop=True)
    )


def run_agg_range(
    queries_ds, index_dir: str, field: str, edges,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES range aggregation with explicit bucket edges:
    bucket key = the range's lower edge ("from"); values below the first
    edge fall in no range (ES explicit-ranges semantics), the last range
    is open-ended.  Empty ranges omitted."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, field, tuple(float(e) for e in edges), cfg, concurrency
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "range_from": gg["bucket"].to_numpy(np.float64),
                            "n_docs": gg["n"].to_numpy(np.int64),
                        }
                    )
                )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "range_from": pd.Series([], dtype=np.float64),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["query_id", "range_from"], kind="mergesort")
        .reset_index(drop=True)
    )


def _ip_to_int(s: str) -> int:
    """Dotted-quad IPv4 -> uint32 (validated)."""
    parts = s.split(".")
    if len(parts) != 4:
        raise ValueError(f"bad IPv4 address {s!r}")
    v = 0
    for p in parts:
        o = int(p)
        if not 0 <= o <= 255:
            raise ValueError(f"bad IPv4 octet in {s!r}")
        v = (v << 8) | o
    return v


def _ip_range_bounds(r: dict) -> tuple[str, int, int]:
    """One ES ip_range entry -> (bucket key, lo, hi) with [lo, hi)
    semantics: either {"mask": "a.b.c.d/p"} (bounds = the masked network
    span, key = the mask string — the ES CIDR form) or {"from": ...,
    "to": ...} dotted quads (either side open, key = "from-to" with '*'
    for an open side — the ES explicit form)."""
    if "mask" in r:
        net, p = r["mask"].split("/")
        p = int(p)
        if not 0 <= p <= 32:
            raise ValueError(f"bad CIDR prefix in {r['mask']!r}")
        span = 1 << (32 - p)
        base = _ip_to_int(net) & ~(span - 1) & 0xFFFFFFFF
        return r["mask"], base, base + span
    lo = _ip_to_int(r["from"]) if r.get("from") else 0
    hi = _ip_to_int(r["to"]) if r.get("to") else 1 << 32
    key = f"{r.get('from') or '*'}-{r.get('to') or '*'}"
    return key, lo, hi


def run_agg_ip_range(
    queries_ds, index_dir: str, field: str, ranges,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES ip_range aggregation: doc counts of each query's
    match set inside explicit IP ranges — CIDR ``mask`` entries or
    ``from``/``to`` dotted quads with the ES [from, to) contract.  The
    engine's ip mapping is a numeric docstore column holding the integer
    address, so [from, to) is the exact closed docvalues filter
    [from, to-1] (addresses are integers).  Ranges may overlap (each is
    counted independently, like ES): every (query, range) pair becomes
    one count plan through the shared MatchSet sweep — identical plans
    dedupe, shuffle volume is plans x segments scalars.  All ranges are
    returned, including empty ones (doc_count 0, the ES behavior).
    Returns (query_id, range_key, n_docs)."""
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    bounds = [_ip_range_bounds(r) for r in ranges]
    nr = len(bounds)
    if nr == 0:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "range_key": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    rows = []
    for row in queries.itertuples(index=False):
        d = row._asdict()
        for ri, (key, lo, hi) in enumerate(bounds):
            e = dict(d)
            e["query_id"] = int(d["query_id"]) * nr + ri
            e["range_field"] = field
            e["range_gte"] = float(lo)
            e["range_lte"] = float(hi - 1)
            rows.append(e)
    expanded = pd.DataFrame(rows)
    counts = run_counts(expanded, index_dir, cfg, concurrency)
    out = pd.DataFrame(
        {
            "query_id": (counts["query_id"].to_numpy(np.int64) // nr),
            "range_key": [
                bounds[int(q) % nr][0] for q in counts["query_id"].to_numpy()
            ],
            "n_docs": counts["n_matching"].to_numpy(np.int64),
        }
    )
    return (
        out.sort_values(["query_id", "range_key"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_docs": np.int64})
    )


def _date_to_epoch(v) -> int:
    """ES date expression -> epoch seconds (UTC).  Numbers pass through
    as epoch seconds; strings parse as ISO ``YYYY-MM-DD`` or
    ``YYYY-MM-DDTHH:MM:SS`` in UTC — the engine's date mapping is an
    epoch-seconds numeric docstore column, so every date bound reduces
    to an integer comparison (the ES date_range resolution model)."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return int(v)
    s = str(v)
    fmt = "%Y-%m-%dT%H:%M:%S" if "T" in s else "%Y-%m-%d"
    dt = datetime.datetime.strptime(s, fmt).replace(tzinfo=datetime.timezone.utc)
    return int(dt.timestamp())


# open-side sentinels for date_range bounds: far outside any plausible
# epoch-seconds value, exactly representable as float64
_DATE_OPEN_LO = -(1 << 60)
_DATE_OPEN_HI = 1 << 60


def _date_range_bounds(r: dict) -> tuple[str, int, int]:
    """One ES date_range entry -> (bucket key, lo, hi) with the ES
    [from, to) contract: either side open; key = the given expressions
    joined as "from-to" with '*' for an open side (or the entry's
    explicit ``key``)."""
    lo = _date_to_epoch(r["from"]) if r.get("from") is not None else _DATE_OPEN_LO
    hi = _date_to_epoch(r["to"]) if r.get("to") is not None else _DATE_OPEN_HI
    key = r.get("key") or (
        f"{r.get('from') if r.get('from') is not None else '*'}-"
        f"{r.get('to') if r.get('to') is not None else '*'}"
    )
    return str(key), lo, hi


def run_agg_date_range(
    queries_ds, index_dir: str, field: str, ranges,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES date_range aggregation: doc counts of each query's
    match set inside explicit date ranges — ``from``/``to`` as ISO date
    strings or epoch seconds, the ES [from, to) contract, either side
    open (reference: the ES date_range agg; the engine's date mapping is
    an epoch-seconds numeric docstore column like date_histogram's, so
    [from, to) is the exact closed docvalues filter [from, to-1]).
    Ranges may overlap (each counted independently); every range is
    returned including empty ones (doc_count 0).  Every (query, range)
    pair becomes one count plan through the shared MatchSet sweep —
    identical plans dedupe, shuffle volume is plans x segments scalars.
    Returns (query_id, range_key, n_docs)."""
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    bounds = [_date_range_bounds(r) for r in ranges]
    nr = len(bounds)
    if nr == 0:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "range_key": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    rows = []
    for row in queries.itertuples(index=False):
        d = row._asdict()
        for ri, (key, lo, hi) in enumerate(bounds):
            e = dict(d)
            e["query_id"] = int(d["query_id"]) * nr + ri
            e["range_field"] = field
            e["range_gte"] = float(lo)
            e["range_lte"] = float(hi - 1)
            rows.append(e)
    expanded = pd.DataFrame(rows)
    counts = run_counts(expanded, index_dir, cfg, concurrency)
    out = pd.DataFrame(
        {
            "query_id": (counts["query_id"].to_numpy(np.int64) // nr),
            "range_key": [
                bounds[int(q) % nr][0] for q in counts["query_id"].to_numpy()
            ],
            "n_docs": counts["n_matching"].to_numpy(np.int64),
        }
    )
    return (
        out.sort_values(["query_id", "range_key"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_docs": np.int64})
    )


def run_agg_geo_distance(
    queries_ds, index_dir: str, field: str, origin_lat: float, origin_lon: float,
    edges_m, cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES geo_distance aggregation: ring bucket counts by
    round6 haversine meters from the origin to each matched doc's
    ``{field}_lat``/``{field}_lon`` point (ES arc distance, mean earth
    radius 6371008.7714 m).  Same explicit-edges semantics as the range
    aggregation: bucket key = the ring's lower edge, values below the
    first edge fall in no ring, the last ring is open-ended, empty rings
    and docs missing the point are omitted.  One NumericAggStage sweep —
    shuffle volume is plans x segments x rings, never doc rows."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir,
        {"geo_distance": (str(field), float(origin_lat), float(origin_lon))},
        tuple(float(e) for e in edges_m), cfg, concurrency,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "ring_from": gg["bucket"].to_numpy(np.float64),
                            "n_docs": gg["n"].to_numpy(np.int64),
                        }
                    )
                )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "ring_from": pd.Series([], dtype=np.float64),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["query_id", "ring_from"], kind="mergesort")
        .reset_index(drop=True)
    )


def run_agg_geotile_grid(
    queries_ds, index_dir: str, field: str, zoom: int, size: int = 10,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES geotile_grid aggregation: top-``size`` web-mercator
    map-tile cells ("z/x/y") by doc count per query's match set.  Per
    segment: exact per-cell counts of the packed tile key (cell count at
    one zoom bounds the partial size like the percentiles value-count
    mode); driver reduce sums cells and cuts deterministically by
    (count desc, x asc, y asc).  Docs missing the point are omitted."""
    zoom = int(zoom)
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, {"geotile": (str(field), zoom)}, 0.0, cfg,
        concurrency,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            gg = gg.sort_values(
                ["n", "bucket"], ascending=[False, True], kind="mergesort"
            ).head(int(size))
            x, y = geotile_unpack(gg["bucket"].to_numpy(np.float64), zoom)
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "tile": [f"{zoom}/{xi}/{yi}" for xi, yi in zip(x, y)],
                            "n_docs": gg["n"].to_numpy(np.int64),
                        }
                    )
                )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "tile": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["query_id", "n_docs", "tile"], ascending=[True, False, True], kind="mergesort")
        .reset_index(drop=True)
    )


def run_agg_geohash_grid(
    queries_ds, index_dir: str, field: str, precision: int, size: int = 10,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES geohash_grid aggregation: top-``size`` geohash
    cells (base32, ``precision`` chars) by doc count per query's match
    set.  Per segment: exact per-cell counts of the packed interleaved
    cell index; driver reduce sums cells and cuts deterministically by
    (count desc, cell asc) — the base32 alphabet is ascending, so the
    integer order IS the geohash string order.  Docs missing the point
    are omitted."""
    precision = int(precision)
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, {"geohash": (str(field), precision)}, 0.0,
        cfg, concurrency,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            gg = gg.sort_values(
                ["n", "bucket"], ascending=[False, True], kind="mergesort"
            ).head(int(size))
            cells = geohash_render(
                gg["bucket"].to_numpy(np.float64).astype(np.int64), precision
            )
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "cell": cells,
                            "n_docs": gg["n"].to_numpy(np.int64),
                        }
                    )
                )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "cell": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(
            ["query_id", "n_docs", "cell"], ascending=[True, False, True],
            kind="mergesort",
        )
        .reset_index(drop=True)
    )


def run_agg_geo_centroid(
    queries_ds, index_dir: str, field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES geo_centroid aggregation: arithmetic mean of the
    matched docs' (lat, lon) points per query (the ES planar centroid),
    round6 per the float contract.  Rides the matrix-stats partial mode
    (pairwise exclusion of docs missing either coordinate), so one sweep
    yields exact sums; queries with no located docs are omitted."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, (f"{field}_lat", f"{field}_lon"), None, cfg,
        concurrency,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = partials.groupby("plan_id", sort=True).agg(
            n=("n", "sum"), slat=("sum", "sum"), slon=("sy", "sum")
        )
        for pid_, r in g.iterrows():
            if r["n"] == 0:
                continue
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    {
                        "query_id": np.int64(qid),
                        "centroid_lat": float(round6(np.array([r["slat"] / r["n"]]))[0]),
                        "centroid_lon": float(round6(np.array([r["slon"] / r["n"]]))[0]),
                        "n_docs": np.int64(r["n"]),
                    }
                )
    out = pd.DataFrame(
        rows, columns=["query_id", "centroid_lat", "centroid_lon", "n_docs"]
    )
    return out.sort_values("query_id", kind="mergesort").reset_index(drop=True).astype(
        {"query_id": np.int64, "n_docs": np.int64}
    )


def run_agg_geo_bounds(
    queries_ds, index_dir: str, field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES geo_bounds aggregation: the tightest lat/lon box
    around each query's matched points — top = max lat, bottom = min lat,
    left = min lon, right = max lon (no antimeridian wrapping, the ES
    default).  Two stats-partial sweeps (lat then lon) reusing the
    existing NumericAggStage min/max machinery; exact, no float repair
    needed.  Queries with no located docs are omitted."""
    out = None
    for ax, (lo_col, hi_col) in (
        ("lat", ("bottom", "top")), ("lon", ("left", "right")),
    ):
        partials, plan = _run_numeric_agg(
            queries_ds, index_dir, f"{field}_{ax}", None, cfg, concurrency
        )
        fanout = {q["plan_id"]: q["query_ids"] for q in plan}
        rows = []
        if len(partials):
            g = partials.groupby("plan_id", sort=True).agg(
                mn=("mn", "min"), mx=("mx", "max")
            )
            for pid_, r in g.iterrows():
                for qid in fanout.get(int(pid_), []):
                    rows.append(
                        {
                            "query_id": np.int64(qid),
                            lo_col: float(r["mn"]),
                            hi_col: float(r["mx"]),
                        }
                    )
        part = pd.DataFrame(rows, columns=["query_id", lo_col, hi_col])
        out = part if out is None else out.merge(part, on="query_id", how="inner")
    out = out[["query_id", "top", "left", "bottom", "right"]]
    return out.sort_values("query_id", kind="mergesort").reset_index(drop=True).astype(
        {"query_id": np.int64}
    )


class GeoLineStage(_SegmentCacheStage):
    """Segment-parallel ES geo_line collection: each (plan, segment)
    emits the ``size`` smallest matching doc ids with their (lat, lon)
    docvalues — a doc outside its own segment's first ``size`` cannot be
    in the global first ``size``, so the merge is exact.  Docs missing
    either coordinate are skipped (the ES geo_point missing rule).
    Shuffle volume is plans x segments x size rows, never match sets."""

    def _init_payload(self, payload) -> None:
        self.plan, self.tomb_map, self.lat_f, self.lon_f, self.size = payload

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for q in self.plan:
                ids = np.sort(_segment_match_ids_for_plan(seg, q))
                if ids.size == 0:
                    continue
                lat = seg.nums_for(self.lat_f, ids)
                lon = seg.nums_for(self.lon_f, ids)
                ok = ~(np.isnan(lat) | np.isnan(lon))
                ids, lat, lon = ids[ok][: self.size], lat[ok][: self.size], lon[ok][: self.size]
                if ids.size == 0:
                    continue
                out.append(
                    pd.DataFrame(
                        {
                            "plan_id": np.int64(q["plan_id"]),
                            "doc_id": ids.astype(np.int64),
                            "lat": lat,
                            "lon": lon,
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "plan_id": pd.Series([], dtype=np.int64),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "lat": pd.Series([], dtype=np.float64),
                    "lon": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(out, ignore_index=True)


def run_geo_line(
    queries_ds,
    index_dir: str,
    field: str,
    *,
    size: int = 20,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES geo_line aggregation: the track of each query's
    first ``size`` matching docs' geo points, ordered by doc id (the
    engine's sort key — ES orders by a sort field; doc ids are the
    engine's stable ingestion order).  One GeoLineStage sweep + one
    bucketed per-plan merge; coordinates round6.  Returns one row per
    line vertex: (query_id, seq, doc_id, lat, lon)."""
    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "seq": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "lat": pd.Series([], dtype=np.float64),
            "lon": pd.Series([], dtype=np.float64),
        }
    )
    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    plan = _match_set_plans(queries)
    if not plan:
        return empty
    plan_ref = ray.put(
        (plan, manifest.get("tombstones", {}), f"{field}_lat", f"{field}_lon", int(size))
    )
    partials = _shards_ds(parts, concurrency).map_batches(
        GeoLineStage,
        fn_constructor_args=(index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid_, g in bucket.groupby("plan_id", sort=False):
            g = g.sort_values("doc_id", kind="mergesort").head(size)
            out.append(
                pd.DataFrame(
                    {
                        "plan_id": np.int64(pid_),
                        "seq": np.arange(len(g), dtype=np.int64),
                        "doc_id": g["doc_id"].to_numpy(np.int64),
                        "lat": round6(g["lat"].to_numpy(np.float64)),
                        "lon": round6(g["lon"].to_numpy(np.float64)),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "plan_id": pd.Series([], dtype=np.int64),
                    "seq": pd.Series([], dtype=np.int64),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "lat": pd.Series([], dtype=np.float64),
                    "lon": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(out, ignore_index=True)

    merged = bucketed_group_agg(partials, ["plan_id"], merge_bucket).to_pandas()
    if not len(merged):
        return empty
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    out = []
    for pid_, g in merged.groupby("plan_id", sort=True):
        g = g.sort_values("seq", kind="mergesort")
        for qid in fanout.get(int(pid_), []):
            out.append(g.assign(query_id=np.int64(qid)))
    if not out:
        return empty
    return (
        pd.concat(out, ignore_index=True)[["query_id", "seq", "doc_id", "lat", "lon"]]
        .sort_values(["query_id", "seq"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "seq": np.int64, "doc_id": np.int64})
    )


def run_agg_matrix_stats(
    queries_ds, index_dir: str, fields: tuple,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES matrix_stats aggregation over a numeric field pair:
    per query match set, exact cross moments combine to population
    means / variances / covariance / Pearson correlation.  Docs missing
    either value are excluded.  All derived floats use the exact-sum
    formulas so an integer-field SQL oracle matches bit-for-bit."""
    x_f, y_f = fields
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, (str(x_f), str(y_f)), None, cfg, concurrency
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = partials.groupby("plan_id", sort=True).agg(
            n=("n", "sum"), sx=("sum", "sum"), sxx=("ss", "sum"),
            sy=("sy", "sum"), syy=("syy", "sum"), sxy=("sxy", "sum"),
        )
        for pid_, r in g.iterrows():
            n = float(r["n"])
            sx, sy = float(r["sx"]), float(r["sy"])
            sxx, syy, sxy = float(r["sxx"]), float(r["syy"]), float(r["sxy"])
            var_x = (n * sxx - sx * sx) / (n * n)
            var_y = (n * syy - sy * sy) / (n * n)
            cov = (n * sxy - sx * sy) / (n * n)
            denom = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
            corr = (n * sxy - sx * sy) / denom if denom > 0 else 0.0
            r6 = lambda v: float(round6(np.array([v]))[0])
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    {
                        "query_id": np.int64(qid),
                        "n_docs": np.int64(r["n"]),
                        "mean_x": r6(sx / n),
                        "mean_y": r6(sy / n),
                        "var_x": r6(var_x),
                        "var_y": r6(var_y),
                        "covariance": r6(cov),
                        "correlation": r6(corr),
                    }
                )
    out = pd.DataFrame(
        rows,
        columns=["query_id", "n_docs", "mean_x", "mean_y", "var_x", "var_y",
                 "covariance", "correlation"],
    )
    return out.sort_values("query_id", kind="mergesort").reset_index(drop=True).astype(
        {"query_id": np.int64, "n_docs": np.int64}
    )


def run_agg_composite(
    queries_ds, index_dir: str, fields, size: int = 10, after=None,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES composite aggregation: doc counts per multi-source
    keyword key tuple, ordered by key ascending, paged ``size`` buckets
    at a time with an exclusive ``after`` key tuple (the ES after_key
    cursor).  Partials are (plan, packed key) counts per segment — the
    packed \\x1f separator sorts below every printable char, so packed
    string order == tuple order.

    A source may also be a date_histogram: ``"field:unit"`` (unit =
    day/week/month/year) buckets the numeric epoch-seconds field by
    calendar floor; its output column is named ``field_unit`` (int64
    bucket-start epochs), and its ``after`` component is the epoch
    int."""
    fields = tuple(str(f) for f in fields)

    def _fmt(f: str, v) -> str:
        return f"{int(v):012d}" if ":" in f else str(v)

    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, None, None, cfg, concurrency,
        group_field=fields,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    after_key = (
        "\x1f".join(_fmt(f, v) for f, v in zip(fields, after))
        if after is not None
        else None
    )
    out_names = [f.replace(":", "_") for f in fields]
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            gg = gg.sort_values("bucket", kind="mergesort")
            if after_key is not None:
                gg = gg[gg["bucket"] > after_key]
            gg = gg.head(int(size))
            parts_cols = list(zip(*(b.split("\x1f") for b in gg["bucket"])))
            for qid in fanout.get(int(pid_), []):
                frame = {"query_id": np.full(len(gg), qid, dtype=np.int64)}
                for i, (f, name) in enumerate(zip(fields, out_names)):
                    vals_i = list(parts_cols[i]) if parts_cols else []
                    if ":" in f:  # date source: unpack padded epoch ints
                        frame[name] = np.array(
                            [int(v) for v in vals_i], dtype=np.int64
                        )
                    else:
                        frame[name] = vals_i
                frame["n_docs"] = gg["n"].to_numpy(np.int64)
                rows.append(pd.DataFrame(frame))
    if not rows:
        empty = {"query_id": pd.Series([], dtype=np.int64)}
        for f, name in zip(fields, out_names):
            empty[name] = pd.Series(
                [], dtype=np.int64 if ":" in f else object
            )
        empty["n_docs"] = pd.Series([], dtype=np.int64)
        return pd.DataFrame(empty)
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["query_id", *out_names], kind="mergesort")
        .reset_index(drop=True)
    )


def run_agg_adjacency_matrix(
    queries_ds, index_dir: str, filters: dict,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES adjacency_matrix aggregation: per query, doc counts for each
    named filter and each pairwise intersection (ES bucket key
    ``a&b``, names sorted).  ``filters`` maps name -> (keyword_field,
    value); the fields span the composite sources, so the one composite
    partial sweep (plans x segments x distinct key tuples) feeds every
    matrix cell at the driver reduce.  Like ES, zero-count buckets are
    omitted.  Returns (query_id, bucket, n_docs) sorted."""
    fields = tuple(sorted({f for f, _ in filters.values()}))
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, None, None, cfg, concurrency,
        group_field=fields,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    names = sorted(filters)
    fidx = {f: i for i, f in enumerate(fields)}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            keys = [b.split("\x1f") for b in gg["bucket"]]
            ns = gg["n"].to_numpy(np.int64)
            match = {
                nm: np.array(
                    [k[fidx[filters[nm][0]]] == str(filters[nm][1]) for k in keys],
                    dtype=bool,
                )
                for nm in names
            }
            cells = []
            for i, a in enumerate(names):
                cells.append((a, int(ns[match[a]].sum())))
                for b in names[i + 1 :]:
                    cells.append((f"{a}&{b}", int(ns[match[a] & match[b]].sum())))
            for qid in fanout.get(int(pid_), []):
                for bucket, n in cells:
                    if n > 0:
                        rows.append((np.int64(qid), bucket, np.int64(n)))
    out = pd.DataFrame(rows, columns=["query_id", "bucket", "n_docs"])
    return (
        out.sort_values(["query_id", "bucket"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_docs": np.int64})
    )


def _bucket_value_frame(
    queries_ds, index_dir: str, field: str, metric_field: str,
    calendar_interval: str, cfg: EngineConfig, concurrency: int | None,
) -> pd.DataFrame:
    """Reduced date_histogram buckets with an ES sum sub-aggregation:
    (query_id, bucket_ts, n_docs, value) sorted bucket asc — the input
    every ES pipeline aggregation consumes.  One distributed
    NumericAggStage sweep; the pipeline step itself then runs on the
    driver over the already-tiny bucket frame, exactly where ES runs
    pipeline aggs (the coordinating node's reduce phase)."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, field, str(calendar_interval), cfg,
        concurrency, metric_field=metric_field,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)
            .agg(n=("n", "sum"), s=("sum", "sum"))
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "bucket_ts": gg["bucket"].to_numpy(np.int64),
                            "n_docs": gg["n"].to_numpy(np.int64),
                            "value": gg["s"].to_numpy(np.float64),
                        }
                    )
                )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "bucket_ts": pd.Series([], dtype=np.int64),
                "n_docs": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=np.float64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["query_id", "bucket_ts"], kind="mergesort")
        .reset_index(drop=True)
    )


def run_agg_cumulative_sum(
    queries_ds, index_dir: str, field: str, metric_field: str,
    calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES cumulative_sum pipeline aggregation (buckets_path = the sum
    sub-agg) over a date_histogram: running total per query in bucket
    order.  Returns (query_id, bucket_ts, value, cumulative); both
    round6'd AFTER the raw float64 accumulation (the oracle's
    SUM() OVER (ORDER BY bucket) does the same)."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    f["cumulative"] = f.groupby("query_id")["value"].cumsum()
    f["value"] = round6(f["value"].to_numpy(np.float64))
    f["cumulative"] = round6(f["cumulative"].to_numpy(np.float64))
    return f[["query_id", "bucket_ts", "value", "cumulative"]]


def run_agg_derivative(
    queries_ds, index_dir: str, field: str, metric_field: str,
    calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES derivative pipeline aggregation: per-bucket change of the sum
    sub-agg vs the previous bucket.  The first bucket of each query
    emits no derivative (ES omits it).  Returns (query_id, bucket_ts,
    value, deriv)."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    f["deriv"] = f.groupby("query_id")["value"].diff()
    f = f[f["deriv"].notna()].reset_index(drop=True)
    f["value"] = round6(f["value"].to_numpy(np.float64))
    f["deriv"] = round6(f["deriv"].to_numpy(np.float64))
    return f[["query_id", "bucket_ts", "value", "deriv"]]


def run_agg_bucket_script(
    queries_ds, index_dir: str, field: str, metric_field: str,
    calendar_interval: str = "month", min_docs: int = 1,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES bucket_script + bucket_selector pipeline aggregations: a
    per-bucket computed metric avg_val = value / _count (bucket_script
    over buckets_path {s: the sum sub-agg, c: _count}), with buckets
    failing ``_count >= min_docs`` dropped (bucket_selector).  Returns
    (query_id, bucket_ts, n_docs, value, avg_val)."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    f = f[f["n_docs"] >= int(min_docs)].reset_index(drop=True)
    f["avg_val"] = round6(
        f["value"].to_numpy(np.float64) / f["n_docs"].to_numpy(np.float64)
    )
    f["value"] = round6(f["value"].to_numpy(np.float64))
    return f[["query_id", "bucket_ts", "n_docs", "value", "avg_val"]]


def run_agg_stats_bucket(
    queries_ds, index_dir: str, field: str, metric_field: str,
    calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES stats_bucket sibling pipeline aggregation: stats over the
    per-bucket sums of a date_histogram — one row per query:
    (query_id, n_buckets, min_val, max_val, sum_val, avg_val).  Covers
    the min_bucket / max_bucket / sum_bucket / avg_bucket family (each
    is one column of this result)."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    if not len(f):
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "n_buckets": pd.Series([], dtype=np.int64),
                "min_val": pd.Series([], dtype=np.float64),
                "max_val": pd.Series([], dtype=np.float64),
                "sum_val": pd.Series([], dtype=np.float64),
                "avg_val": pd.Series([], dtype=np.float64),
            }
        )
    g = (
        f.groupby("query_id", sort=True)
        .agg(
            n_buckets=("value", "size"),
            min_val=("value", "min"),
            max_val=("value", "max"),
            sum_val=("value", "sum"),
        )
        .reset_index()
    )
    g["avg_val"] = round6(
        g["sum_val"].to_numpy(np.float64) / g["n_buckets"].to_numpy(np.float64)
    )
    for c in ("min_val", "max_val", "sum_val"):
        g[c] = round6(g[c].to_numpy(np.float64))
    return g.astype({"query_id": np.int64, "n_buckets": np.int64})


def run_agg_extended_stats_bucket(
    queries_ds, index_dir: str, field: str, metric_field: str,
    calendar_interval: str = "month", sigma: float = 2.0,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES extended_stats_bucket sibling pipeline aggregation: stats_bucket
    plus sum_of_squares / POPULATION variance / std_deviation and the
    ±sigma std bounds over the per-bucket sum sub-agg values (ES uses
    population variance, ddof=0).  Float64 accumulation, round6 on
    output.  Returns one row per query."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    cols = ("n_buckets", "min_val", "max_val", "sum_val", "avg_val",
            "sum_sq", "variance", "std_dev", "std_upper", "std_lower")
    if not len(f):
        out = {"query_id": pd.Series([], dtype=np.int64)}
        out.update({c: pd.Series([], dtype=np.float64) for c in cols})
        out["n_buckets"] = pd.Series([], dtype=np.int64)
        return pd.DataFrame(out)
    rows = []
    for qid, g in f.groupby("query_id", sort=True):  # few queries: driver reduce
        v = g["value"].to_numpy(np.float64)
        mean = v.sum() / v.size
        var = float(np.mean((v - mean) ** 2))  # population, the ES rule
        std = float(np.sqrt(var))
        rows.append(
            (int(qid), v.size, v.min(), v.max(), v.sum(), mean,
             float((v * v).sum()), var, std,
             mean + sigma * std, mean - sigma * std)
        )
    out = pd.DataFrame(rows, columns=["query_id", *cols])
    for c in cols[1:]:
        out[c] = round6(out[c].to_numpy(np.float64))
    return out.astype({"query_id": np.int64, "n_buckets": np.int64})


def run_agg_percentiles_bucket(
    queries_ds, index_dir: str, field: str, metric_field: str,
    percents: tuple = (25.0, 50.0, 75.0, 99.0),
    calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES percentiles_bucket sibling pipeline aggregation: per query,
    the nearest-rank percentile of the per-bucket sum sub-agg values —
    index = round(p/100 * (n-1)) into the SORTED value list, no
    interpolation (PercentilesBucketPipelineAggregator semantics; ES
    picks an actual bucket value).  round6 after selection; rounding is
    half-away-from-zero on the index (np.floor(x + 0.5)) to stay
    engine/SQL-identical.  Returns (query_id, percent, value)."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    if not len(f):
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "percent": pd.Series([], dtype=np.float64),
                "value": pd.Series([], dtype=np.float64),
            }
        )
    rows = []
    for qid, g in f.groupby("query_id", sort=True):  # few queries: driver reduce
        vs = np.sort(g["value"].to_numpy(np.float64))
        for p in percents:
            idx = int(np.floor(float(p) / 100.0 * (vs.size - 1) + 0.5))
            rows.append((int(qid), float(p), float(vs[idx])))
    out = pd.DataFrame(rows, columns=["query_id", "percent", "value"])
    out["value"] = round6(out["value"].to_numpy(np.float64))
    return out.astype({"query_id": np.int64})


def run_agg_moving_percentiles(
    queries_ds, index_dir: str, field: str, metric_field: str,
    window: int = 3, percent: float = 50.0, calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES moving_percentiles pipeline aggregation (shift=1 so the window
    INCLUDES the current bucket, like moving_fn): the percentile of the
    sum sub-agg values inside the trailing ``window`` buckets per query.
    ES feeds a TDigest; over the handful of exact bucket values in the
    window this engine computes the nearest-rank selection used by
    percentiles_bucket (index = round(p/100 * (n-1)) into the sorted
    window, half-away rounding) — exact, deterministic, oracle-friendly.
    Leading buckets use whatever part of the window exists.  Returns
    (query_id, bucket_ts, value, moving_pct), round6 after selection."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    w = max(1, int(window))
    p = float(percent)

    def _trailing_pct(s: pd.Series) -> pd.Series:
        v = s.to_numpy(np.float64)
        out = np.empty(len(v))
        for i in range(len(v)):  # buckets per query are few by design
            win = np.sort(v[max(0, i - w + 1) : i + 1])
            out[i] = win[int(np.floor(p / 100.0 * (win.size - 1) + 0.5))]
        return pd.Series(out, index=s.index)

    f["moving_pct"] = f.groupby("query_id")["value"].transform(_trailing_pct)
    f["value"] = round6(f["value"].to_numpy(np.float64))
    f["moving_pct"] = round6(f["moving_pct"].to_numpy(np.float64))
    return f[["query_id", "bucket_ts", "value", "moving_pct"]]


def run_agg_extremum_bucket(
    queries_ds, index_dir: str, field: str, metric_field: str,
    mode: str = "max", calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES max_bucket / min_bucket sibling pipeline aggregations: the
    extremum of the per-bucket sum sub-agg per query, with the KEYS of
    every bucket attaining it (ES returns a keys array on ties) — one
    row per (query_id, attaining bucket_ts).  Comparison on raw float64,
    round6 on output.  Returns (query_id, bucket_ts, value)."""
    if mode not in ("max", "min"):
        raise ValueError(f"mode must be 'max' or 'min', got {mode!r}")
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    if not len(f):
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "bucket_ts": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=np.float64),
            }
        )
    ext = f.groupby("query_id")["value"].transform(mode)
    out = f[f["value"] == ext].reset_index(drop=True)
    out["value"] = round6(out["value"].to_numpy(np.float64))
    return out[["query_id", "bucket_ts", "value"]]


def run_agg_fold_bucket(
    queries_ds, index_dir: str, field: str, metric_field: str,
    stat: str = "avg", calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES avg_bucket / sum_bucket sibling pipeline aggregations: one
    scalar per query folding the per-bucket sum sub-agg values of the
    date_histogram — mean or sum over the NON-EMPTY buckets (the ES
    gap_policy=skip default).  Accumulation in bucket_ts ascending order
    (the frame is already so sorted), round6 on output.
    Returns (query_id, value)."""
    if stat not in ("avg", "sum"):
        raise ValueError(f"stat must be 'avg' or 'sum', got {stat!r}")
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    if not len(f):
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=np.float64),
            }
        )
    g = f.groupby("query_id", as_index=False)["value"].agg(
        "mean" if stat == "avg" else "sum"
    )
    g["value"] = round6(g["value"].to_numpy(np.float64))
    return g.astype({"query_id": np.int64}).sort_values("query_id").reset_index(drop=True)


def run_agg_bucket_correlation(
    queries_ds, index_dir: str, field: str, indicator_fn,
    calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES bucket_correlation pipeline aggregation (the aggregations-ML
    sibling agg, simplified to its published Pearson core): correlation
    between each query's per-bucket date_histogram doc counts and an
    indicator value derived from the bucket key.  ``indicator_fn`` maps
    the int64 bucket_ts array -> the indicator vector (the ES
    ``indicator.expectations`` analog, keyed by bucket so alignment is
    deterministic at any shard layout).  One distributed bucket-count
    sweep; the correlation is a driver-side reduce over the tiny bucket
    frame.  Exact integer moment sums (counts and indicators are ints)
    feed one double formula — r = (n*Sxy - Sx*Sy) /
    sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)) — so both engines agree
    bit-for-bit before the 6dp round.  Queries with fewer than 2 buckets
    or zero variance on either side are omitted (ES returns null).
    Returns (query_id, correlation)."""
    b = run_agg_date_histogram(
        queries_ds, index_dir, field, calendar_interval, cfg, concurrency
    )
    rows = []
    if len(b):
        for qid, g in b.groupby("query_id", sort=True):
            n = g["n_docs"].to_numpy(np.int64)
            x = np.asarray(
                indicator_fn(g["bucket_ts"].to_numpy(np.int64)), dtype=np.int64
            )
            k = len(n)
            if k < 2:
                continue
            sx, sy = int(x.sum()), int(n.sum())
            sxx = int((x * x).sum())
            syy = int((n * n).sum())
            sxy = int((x * n).sum())
            den_sq = (k * sxx - sx * sx) * (k * syy - sy * sy)
            if den_sq <= 0:
                continue
            r = float(k * sxy - sx * sy) / float(np.sqrt(float(den_sq)))
            # sign-aware 6dp half-away round (round6 is positive-only;
            # DuckDB ROUND is half away from zero for either sign)
            r6 = float(np.sign(r) * round6(np.float64(abs(r))))
            rows.append((int(qid), r6))
    return pd.DataFrame(rows, columns=["query_id", "correlation"]).astype(
        {"query_id": np.int64, "correlation": np.float64}
    )


def run_agg_bucket_count_ks_test(
    queries_ds, index_dir: str, field: str, calendar_interval: str = "month",
    fractions=None,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES bucket_count_ks_test pipeline aggregation (two-sided statistic
    only): the Kolmogorov-Smirnov distance between each query's
    empirical bucket-count CDF over the date_histogram buckets (in
    bucket_ts order) and a reference CDF — ``fractions`` (one weight per
    bucket, normalized) or the ES default uniform fractions.  One
    distributed bucket-count sweep + a driver reduce over the tiny
    frame; each CDF point is a single integer/integer double division so
    both engines agree bit-for-bit before the 6dp round.
    Returns (query_id, ks_stat)."""
    b = run_agg_date_histogram(
        queries_ds, index_dir, field, calendar_interval, cfg, concurrency
    )
    rows = []
    if len(b):
        for qid, g in b.groupby("query_id", sort=True):
            n = g["n_docs"].to_numpy(np.int64)
            k = len(n)
            tot = int(n.sum())
            if k == 0 or tot == 0:
                continue
            ecdf = np.cumsum(n).astype(np.float64) / float(tot)
            if fractions is None:
                ref = np.arange(1, k + 1, dtype=np.float64) / float(k)
            else:
                f = np.asarray(fractions, dtype=np.float64)
                if len(f) != k:
                    raise ValueError(
                        f"fractions length {len(f)} != bucket count {k}"
                    )
                ref = np.cumsum(f) / f.sum()
            d = float(np.abs(ecdf - ref).max())
            rows.append((int(qid), float(round6(np.float64(d)))))
    return pd.DataFrame(rows, columns=["query_id", "ks_stat"]).astype(
        {"query_id": np.int64, "ks_stat": np.float64}
    )


def run_agg_change_point(
    queries_ds, index_dir: str, field: str, calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES change_point pipeline aggregation (the aggregations-ML sibling
    agg), deterministic subset of its published detectors over each
    query's date_histogram bucket counts (bucket_ts order):

    - ``spike`` / ``dip``: the bucket whose count deviates most from the
      out-of-bucket mean, when that deviation exceeds 3 out-of-bucket
      standard deviations (the classic z-test shape);
    - ``step_change``: the split minimizing SSE_left + SSE_right, when
      it removes >= 50% of the total SSE (CUSUM-style single change
      point) — reported bucket = the first bucket of the right side;
    - ``stationary`` otherwise (bucket_ts = -1).

    Spike/dip wins over step_change when both fire (a single outlier
    also splits well).  All driver-side over the tiny bucket frame; one
    distributed bucket-count sweep.  Queries need >= 4 buckets (ES
    requires a minimum window; fewer -> stationary).
    Returns (query_id, change_type, bucket_ts)."""
    b = run_agg_date_histogram(
        queries_ds, index_dir, field, calendar_interval, cfg, concurrency,
        min_doc_count=0,
    )
    rows = []
    if len(b):
        for qid, g in b.groupby("query_id", sort=True):
            n = g["n_docs"].to_numpy(np.float64)
            ts = g["bucket_ts"].to_numpy(np.int64)
            k = len(n)
            if k < 4:
                rows.append((int(qid), "stationary", -1))
                continue
            total = n.sum()
            # spike/dip: leave-one-out z-score per bucket
            best_z, best_i = 0.0, -1
            for i in range(k):
                rest = np.delete(n, i)
                sd = rest.std()
                if sd == 0.0:
                    # zero out-of-bucket variance: any deviation is an
                    # infinite z, signed by its direction
                    diff = n[i] - rest.mean()
                    z = 0.0 if diff == 0.0 else np.copysign(np.inf, diff)
                else:
                    z = (n[i] - rest.mean()) / sd
                if abs(z) > abs(best_z):
                    best_z, best_i = z, i
            if abs(best_z) >= 3.0:
                rows.append(
                    (
                        int(qid),
                        "spike" if best_z > 0 else "dip",
                        int(ts[best_i]),
                    )
                )
                continue
            # step_change: best single split by SSE reduction
            sse_total = float(((n - n.mean()) ** 2).sum())
            best_sse, best_s = np.inf, -1
            for s in range(1, k):
                l, r = n[:s], n[s:]
                sse = float(((l - l.mean()) ** 2).sum()) + float(
                    ((r - r.mean()) ** 2).sum()
                )
                if sse < best_sse:
                    best_sse, best_s = sse, s
            if sse_total > 0 and best_sse <= 0.5 * sse_total:
                rows.append((int(qid), "step_change", int(ts[best_s])))
            else:
                rows.append((int(qid), "stationary", -1))
    out = pd.DataFrame(rows, columns=["query_id", "change_type", "bucket_ts"])
    return out.astype({"query_id": np.int64, "bucket_ts": np.int64})


def run_agg_moving_fn(
    queries_ds, index_dir: str, field: str, metric_field: str,
    window: int = 3, calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES moving_fn pipeline aggregation (MovingFunctions.unweightedAvg
    with the window positioned to INCLUDE the current bucket, i.e.
    shift=1): trailing mean of the sum sub-agg over the last ``window``
    date_histogram buckets per query; leading buckets average whatever
    is available (== SQL ``AVG(x) OVER (ROWS BETWEEN window-1 PRECEDING
    AND CURRENT ROW)``).  Returns (query_id, bucket_ts, value, moving),
    both round6'd after the raw float64 window arithmetic."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    w = max(1, int(window))

    def _trailing_mean(s: pd.Series) -> pd.Series:
        v = s.to_numpy(np.float64)
        out = np.empty(len(v))
        for i in range(len(v)):  # buckets per query are few by design
            lo = max(0, i - w + 1)
            out[i] = v[lo : i + 1].sum() / (i + 1 - lo)
        return pd.Series(out, index=s.index)

    f["moving"] = f.groupby("query_id")["value"].transform(_trailing_mean)
    f["value"] = round6(f["value"].to_numpy(np.float64))
    f["moving"] = round6(f["moving"].to_numpy(np.float64))
    return f[["query_id", "bucket_ts", "value", "moving"]]


def run_agg_serial_diff(
    queries_ds, index_dir: str, field: str, metric_field: str,
    lag: int = 2, calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES serial_diff pipeline aggregation: per-bucket change of the sum
    sub-agg vs the bucket ``lag`` positions earlier (derivative is the
    lag=1 special case).  The first ``lag`` buckets of each query emit
    nothing (ES omits them).  Returns (query_id, bucket_ts, value,
    sdiff)."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    f["sdiff"] = f.groupby("query_id")["value"].diff(int(lag))
    f = f[f["sdiff"].notna()].reset_index(drop=True)
    f["value"] = round6(f["value"].to_numpy(np.float64))
    f["sdiff"] = round6(f["sdiff"].to_numpy(np.float64))
    return f[["query_id", "bucket_ts", "value", "sdiff"]]


def run_agg_auto_date_histogram(
    queries_ds, index_dir: str, field: str, target_buckets: int = 10,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES auto_date_histogram: pick the smallest calendar interval from
    (day, week, month, year) whose bucket count fits ``target_buckets``,
    per query.  One DAY-granularity NumericAggStage sweep; coarser
    intervals are EXACT roll-ups of the day buckets (every calendar unit
    is a union of days), so interval selection and re-bucketing happen
    on the driver over the tiny day frame — no second cluster pass.
    Falls back to 'year' when even years overflow (the ES
    largest-interval rule).  Returns (query_id, interval, bucket_ts,
    n_docs) sorted."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, field, "day", cfg, concurrency
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            days = gg["bucket"].to_numpy(np.float64)
            ns = gg["n"].to_numpy(np.int64)
            chosen, buckets = "year", _calendar_floor(days, "year")
            for iv in ("day", "week", "month", "year"):
                rolled = _calendar_floor(days, iv)
                if np.unique(rolled).size <= int(target_buckets):
                    chosen, buckets = iv, rolled
                    break
            ub, inv = np.unique(buckets, return_inverse=True)
            cnt = np.bincount(inv, weights=ns).astype(np.int64)
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "interval": chosen,
                            "bucket_ts": ub.astype(np.int64),
                            "n_docs": cnt,
                        }
                    )
                )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "interval": pd.Series([], dtype=object),
                "bucket_ts": pd.Series([], dtype=np.int64),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["query_id", "bucket_ts"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "bucket_ts": np.int64, "n_docs": np.int64})
    )


def run_agg_bucket_sort(
    queries_ds, index_dir: str, field: str, metric_field: str,
    size: int = 3, calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES bucket_sort pipeline aggregation: re-rank the date_histogram
    buckets by the sum sub-agg (value desc, ties bucket_ts asc) and keep
    only the top ``size`` buckets per query — the ES sort + size
    truncation at the coordinating-node reduce.  Returns (query_id,
    bucket_ts, n_docs, value); value round6'd after the cut."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    f = (
        f.sort_values(
            ["query_id", "value", "bucket_ts"],
            ascending=[True, False, True], kind="mergesort",
        )
        .groupby("query_id", sort=True)
        .head(max(0, int(size)))
        .reset_index(drop=True)
    )
    f["value"] = round6(f["value"].to_numpy(np.float64))
    return f[["query_id", "bucket_ts", "n_docs", "value"]]


def run_agg_normalize(
    queries_ds, index_dir: str, field: str, metric_field: str,
    method: str = "percent_of_sum", calendar_interval: str = "month",
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES normalize pipeline aggregation over the sum sub-agg of a
    date_histogram: ``percent_of_sum`` (value / per-query bucket total)
    or ``rescale_0_1`` ((value-min)/(max-min); a single-bucket or
    constant query normalizes to 0.0, the ES degenerate-range rule).
    Returns (query_id, bucket_ts, value, normalized), both round6'd
    after the raw float64 arithmetic."""
    f = _bucket_value_frame(
        queries_ds, index_dir, field, metric_field, calendar_interval, cfg, concurrency
    )
    v = f["value"].to_numpy(np.float64)
    if method == "percent_of_sum":
        tot = f.groupby("query_id")["value"].transform("sum").to_numpy(np.float64)
        norm = np.divide(v, tot, out=np.zeros_like(v), where=tot != 0)
    elif method == "rescale_0_1":
        mn = f.groupby("query_id")["value"].transform("min").to_numpy(np.float64)
        mx = f.groupby("query_id")["value"].transform("max").to_numpy(np.float64)
        rng_ = mx - mn
        norm = np.divide(v - mn, rng_, out=np.zeros_like(v), where=rng_ != 0)
    else:
        raise ValueError(f"unknown normalize method: {method!r}")
    f["normalized"] = round6(norm)
    f["value"] = round6(v)
    return f[["query_id", "bucket_ts", "value", "normalized"]]


def run_agg_weighted_avg(
    queries_ds, index_dir: str, value_field: str, weight_field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES weighted_avg aggregation: sum(value*weight)/sum(weight) over
    each query's match set.  Reuses the matrix-stats cross-moment
    partials (sxy = Σ v·w, sy = Σ w) — one NumericAggStage sweep, rows
    missing either field excluded (pairwise, the documented analog of
    ES's skip-missing-value rule).  Returns (query_id, n_docs,
    weighted_avg) with the ratio round6'd after exact float64 sums;
    queries whose match set has no complete pair are omitted."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, (value_field, weight_field), None, cfg, concurrency
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = partials.groupby("plan_id", sort=True).agg(
            n=("n", "sum"), sw=("sy", "sum"), svw=("sxy", "sum")
        )
        for pid_, r in g.iterrows():
            if r["sw"] == 0.0:
                continue  # zero total weight: ES returns null — omit
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    {
                        "query_id": np.int64(qid),
                        "n_docs": np.int64(r["n"]),
                        "weighted_avg": float(
                            round6(np.array([r["svw"] / r["sw"]]))[0]
                        ),
                    }
                )
    out = pd.DataFrame(rows, columns=["query_id", "n_docs", "weighted_avg"])
    return (
        out.sort_values("query_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_docs": np.int64})
    )


def run_agg_missing(
    queries_ds, index_dir: str, field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES missing aggregation: per query, the number of match-set docs
    whose mapped ``field`` has no value (numeric NaN / keyword "" — the
    exists-query complement).  One NumericAggStage sweep in 'missing'
    mode.  Returns (query_id, n_missing, n_docs); queries with an empty
    match set are omitted (ES returns a 0 bucket over 0 docs)."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, field, "missing", cfg, concurrency
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = partials.groupby("plan_id", sort=True).agg(
            miss=("n", "sum"), tot=("sum", "sum")
        )
        for pid_, r in g.iterrows():
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    (np.int64(qid), np.int64(r["miss"]), np.int64(r["tot"]))
                )
    out = pd.DataFrame(rows, columns=["query_id", "n_missing", "n_docs"])
    return (
        out.sort_values("query_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_missing": np.int64, "n_docs": np.int64})
    )


def run_agg_value_count(
    queries_ds, index_dir: str, field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES value_count aggregation: number of extracted field values per
    query's match set (missing excluded) — the n of the stats partial as
    its own ES API.  Returns (query_id, n_values)."""
    partials, plan = _run_numeric_agg(queries_ds, index_dir, field, None, cfg, concurrency)
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = partials.groupby("plan_id", sort=True)["n"].sum()
        for pid_, n in g.items():
            for qid in fanout.get(int(pid_), []):
                rows.append((np.int64(qid), np.int64(n)))
    out = pd.DataFrame(rows, columns=["query_id", "n_values"])
    return (
        out.sort_values("query_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_values": np.int64})
    )


def _weighted_nearest_rank(vals: np.ndarray, counts: np.ndarray, p: float) -> float:
    """Nearest-rank percentile over a (sorted value, count) histogram —
    the exact definition run_agg_percentiles uses (== DuckDB
    quantile_disc)."""
    cum = counts.cumsum()
    rank = max(1, int(np.ceil(int(cum[-1]) * p / 100.0)))
    return float(vals[int(np.searchsorted(cum, rank))])


def run_agg_median_absolute_deviation(
    queries_ds, index_dir: str, field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES median_absolute_deviation aggregation — EXACT via the same
    per-value count partials as percentiles (ES uses tdigest): median m
    of the match-set values, then the median of |v - m|, both
    nearest-rank (== DuckDB quantile_disc at 0.5).  The deviation
    distribution is re-derived from the (value, count) histogram on the
    driver — no second cluster pass.  Returns (query_id, median, mad)."""
    partials, plan = _run_numeric_agg(queries_ds, index_dir, field, 0.0, cfg, concurrency)
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            vals = gg["bucket"].to_numpy(np.float64)  # ascending
            cnt = gg["n"].to_numpy(np.int64)
            med = _weighted_nearest_rank(vals, cnt, 50.0)
            dev = np.abs(vals - med)
            order = np.argsort(dev, kind="stable")
            mad = _weighted_nearest_rank(dev[order], cnt[order], 50.0)
            for qid in fanout.get(int(pid_), []):
                rows.append((np.int64(qid), med, mad))
    out = pd.DataFrame(rows, columns=["query_id", "median", "mad"])
    return (
        out.sort_values("query_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "median": np.float64, "mad": np.float64})
    )


def run_agg_t_test(
    queries_ds, index_dir: str, field: str, pairs,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES t_test aggregation (type=heteroscedastic, i.e. Welch): compares
    the ``field`` populations of two filter queries a and b per pair.
    One stats-partial sweep serves every query (n/sum/ss per plan x
    segment — never doc rows); the driver derives sample variance via
    the exact-sum formula v = (ss - s*s/n)/(n-1), then
    t = (mean_a - mean_b)/sqrt(va/na + vb/nb) and the Welch-Satterthwaite
    dof.  ES reports the two-tailed p-value (needs the regularized
    incomplete beta — not SQL-reproducible); this exposes the exact
    t statistic and dof instead so a DuckDB oracle can replay it
    bit-for-bit before the 6dp round.  Pairs where either side has n < 2
    are omitted (ES returns null).  Returns (query_a, query_b, t_value,
    dof) sorted."""
    partials, plan = _run_numeric_agg(queries_ds, index_dir, field, None, cfg, concurrency)
    moments: dict[int, tuple] = {}
    if len(partials):
        g = partials.groupby("plan_id", sort=True).agg(
            n=("n", "sum"), s=("sum", "sum"), ss=("ss", "sum")
        )
        for q in plan:
            if int(q["plan_id"]) in g.index:
                r = g.loc[int(q["plan_id"])]
                for qid in q["query_ids"]:
                    moments[int(qid)] = (float(r["n"]), float(r["s"]), float(r["ss"]))
    rows = []
    for qa, qb in pairs:
        ma_, mb_ = moments.get(int(qa)), moments.get(int(qb))
        if ma_ is None or mb_ is None or ma_[0] < 2 or mb_[0] < 2:
            continue
        (na, sa, ssa), (nb, sb, ssb) = ma_, mb_
        mean_a, mean_b = sa / na, sb / nb
        va = (ssa - sa * sa / na) / (na - 1.0)
        vb = (ssb - sb * sb / nb) / (nb - 1.0)
        se2 = va / na + vb / nb
        if se2 <= 0:
            continue
        t = (mean_a - mean_b) / np.sqrt(se2)
        dof = se2 * se2 / (
            (va / na) ** 2 / (na - 1.0) + (vb / nb) ** 2 / (nb - 1.0)
        )
        r6 = lambda v: float(round6(np.array([v]))[0])
        rows.append((np.int64(qa), np.int64(qb), r6(t), r6(dof)))
    out = pd.DataFrame(rows, columns=["query_a", "query_b", "t_value", "dof"])
    return (
        out.sort_values(["query_a", "query_b"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_a": np.int64, "query_b": np.int64,
                 "t_value": np.float64, "dof": np.float64})
    )


def run_agg_boxplot(
    queries_ds, index_dir: str, field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES boxplot aggregation — EXACT via the same per-value count
    partials as percentiles (ES uses tdigest; the exact flavor is what a
    SQL oracle can replay): min/max, nearest-rank q1/q2/q3, and the ES
    whiskers — lower = smallest value >= q1 - 1.5*IQR, upper = largest
    value <= q3 + 1.5*IQR (ES boxplot docs' whisker definition).  Queries
    with an empty match set are omitted.  Returns one row per query."""
    partials, plan = _run_numeric_agg(queries_ds, index_dir, field, 0.0, cfg, concurrency)
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            vals = gg["bucket"].to_numpy(np.float64)  # ascending
            cnt = gg["n"].to_numpy(np.int64)
            q1 = _weighted_nearest_rank(vals, cnt, 25.0)
            q2 = _weighted_nearest_rank(vals, cnt, 50.0)
            q3 = _weighted_nearest_rank(vals, cnt, 75.0)
            iqr = q3 - q1
            lo_fence, hi_fence = q1 - 1.5 * iqr, q3 + 1.5 * iqr
            inside = vals[(vals >= lo_fence) & (vals <= hi_fence)]
            lower = float(inside[0]) if inside.size else float(vals[0])
            upper = float(inside[-1]) if inside.size else float(vals[-1])
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    (np.int64(qid), float(vals[0]), float(vals[-1]),
                     q1, q2, q3, lower, upper)
                )
    out = pd.DataFrame(
        rows,
        columns=["query_id", "min_val", "max_val", "q1", "q2", "q3",
                 "lower_whisker", "upper_whisker"],
    )
    return (
        out.sort_values("query_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64})
    )


def run_agg_scripted_metric(
    queries_ds, index_dir: str, script: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES scripted_metric aggregation, whitelisted-expression subset:
    map = the vectorized expression over each matched doc's numeric
    docstore fields (the same frozen AST whitelist as script_score),
    combine = per-segment sum, reduce = sum of the combine partials —
    the canonical map/combine/reduce sum shape.  One stats-partial sweep
    (the expression value rides the ``sum``/``mn``/``mx`` columns), so
    the exchange stays plans x segments.  Returns (query_id, n_docs,
    value, min_val, max_val) with value/min/max round6."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, {"script": str(script)}, None, cfg, concurrency
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = partials.groupby("plan_id", sort=True).agg(
            n=("n", "sum"), s=("sum", "sum"), mn=("mn", "min"), mx=("mx", "max")
        )
        r6 = lambda v: float(round6(np.array([v]))[0])
        for pid_, r in g.iterrows():
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    (np.int64(qid), np.int64(r["n"]), r6(r["s"]),
                     r6(r["mn"]), r6(r["mx"]))
                )
    out = pd.DataFrame(
        rows, columns=["query_id", "n_docs", "value", "min_val", "max_val"]
    )
    return (
        out.sort_values("query_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_docs": np.int64})
    )


def run_agg_rate(
    queries_ds, index_dir: str, field: str, calendar_interval: str = "month",
    unit: str = "day", metric_field: str | None = None,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES rate aggregation inside a date_histogram: per calendar bucket,
    rate = (sum of ``metric_field``, or the doc count when None) divided
    by the bucket's length in ``unit`` — month buckets divide by that
    month's actual day count (the ES rate unit-conversion semantics),
    week buckets by 7, day buckets by 24 for unit=hour.  One
    date-histogram partial sweep (the ``sum`` column carries the metric).
    Returns (query_id, bucket_ts, n_docs, rate) with rate round6."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, field, str(calendar_interval), cfg, concurrency,
        metric_field=metric_field,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)
            .agg(n=("n", "sum"), s=("sum", "sum"))
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            bts = gg["bucket"].to_numpy(np.int64)
            if calendar_interval == "month" and unit == "day":
                per = pd.PeriodIndex(
                    pd.to_datetime(bts, unit="s"), freq="M"
                ).days_in_month.to_numpy(np.float64)
            elif calendar_interval == "week" and unit == "day":
                per = np.full(bts.size, 7.0)
            elif calendar_interval == "day" and unit == "hour":
                per = np.full(bts.size, 24.0)
            elif calendar_interval == unit:
                per = np.ones(bts.size, dtype=np.float64)
            else:
                raise ValueError(
                    f"unsupported rate conversion {calendar_interval!r} -> {unit!r}"
                )
            val = (
                gg["s"].to_numpy(np.float64)
                if metric_field is not None
                else gg["n"].to_numpy(np.float64)
            )
            rate = round6(val / per)
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "bucket_ts": bts,
                            "n_docs": gg["n"].to_numpy(np.int64),
                            "rate": np.asarray(rate, dtype=np.float64),
                        }
                    )
                )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "bucket_ts": pd.Series([], dtype=np.int64),
                "n_docs": pd.Series([], dtype=np.int64),
                "rate": pd.Series([], dtype=np.float64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["query_id", "bucket_ts"], kind="mergesort")
        .reset_index(drop=True)
    )


def run_agg_sampler(
    queries_ds, index_dir: str, group_field: str, shard_size: int = 100,
    diversify_field: str | None = None, max_docs_per_value: int | None = None,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES sampler / diversified_sampler aggregation with a terms
    sub-agg: the sub-aggregation runs over only the ``shard_size``
    best-scoring docs per query.  This is the DETERMINISTIC GLOBAL
    flavor — sample = top shard_size by (score desc, doc_id asc) over
    the whole index — where ES samples per shard (shard-layout-dependent
    results); the deterministic flavor is what a SQL oracle can replay
    and what a resharded 100-TB corpus keeps stable.  diversified_sampler:
    ``diversify_field`` + ``max_docs_per_value`` keep only the first
    ``max_docs_per_value`` sample docs per field value in rank order
    (the ES de-bias semantics).  The sample (k rows per query, never the
    match set) is the only thing that leaves the cluster; the terms
    sub-agg reduces driver-side over <= shard_size rows per query.
    Returns (query_id, value, n_docs) in ES bucket order (n desc, value
    asc)."""
    queries = (
        queries_ds.to_pandas()
        if hasattr(queries_ds, "to_pandas")
        else queries_ds.copy()
    )
    queries["k"] = int(shard_size)
    fields = [group_field] + (
        [diversify_field] if diversify_field and diversify_field != group_field else []
    )
    hits = run_queries(
        queries, index_dir, cfg, concurrency, fetch_fields=fields
    ).to_pandas()
    rows = []
    if len(hits):
        for qid, g in hits.groupby("query_id", sort=True):
            g = g.sort_values("rank", kind="mergesort")
            if diversify_field is not None and max_docs_per_value is not None:
                g = g[g.groupby(diversify_field).cumcount() < int(max_docs_per_value)]
            vc = g.groupby(group_field).size().reset_index(name="n")
            vc = vc.sort_values(
                ["n", group_field], ascending=[False, True], kind="mergesort"
            )
            rows.append(
                pd.DataFrame(
                    {
                        "query_id": np.int64(qid),
                        "value": vc[group_field].to_numpy(),
                        "n_docs": vc["n"].to_numpy(np.int64),
                    }
                )
            )
    if not rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    return (
        pd.concat(rows, ignore_index=True)
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_docs": np.int64})
    )


def run_multi_terms(
    queries_ds, index_dir: str, fields: tuple,
    size: int = 10,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES multi_terms aggregation: terms buckets keyed by a TUPLE of
    keyword fields, ES bucket order (n_docs desc, key asc), top ``size``
    per query.  Same composite partial sweep as run_agg_composite (the
    packed key), different reduce order — composite pages by key,
    multi_terms ranks by count.  Returns (query_id, one column per
    field, n_docs)."""
    partials, plan = _run_numeric_agg(
        queries_ds, index_dir, None, None, cfg, concurrency,
        group_field=tuple(fields),
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    out = []
    if len(partials):
        g = (
            partials.groupby(["plan_id", "bucket"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for pid_, gg in g.groupby("plan_id", sort=True):
            gg = gg.sort_values(
                ["n", "bucket"], ascending=[False, True], kind="mergesort"
            ).head(max(0, int(size)))
            keys = gg["bucket"].astype(str).str.split("\x1f", expand=True)
            for qid in fanout.get(int(pid_), []):
                f = pd.DataFrame({"query_id": np.int64(qid)}, index=gg.index)
                for i, name in enumerate(fields):
                    f[name] = keys[i].to_numpy()
                f["n_docs"] = gg["n"].to_numpy(np.int64)
                out.append(f)
    cols = ["query_id", *fields, "n_docs"]
    if not out:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                **{f: pd.Series([], dtype=object) for f in fields},
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )[cols]
    return (
        pd.concat(out, ignore_index=True)[cols]
        .sort_values("query_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_docs": np.int64})
    )


def run_string_stats(
    queries_ds, index_dir: str, field: str,
    cfg: EngineConfig = DEFAULT, concurrency: int | None = None,
) -> pd.DataFrame:
    """ES string_stats aggregation over a keyword field: value count,
    min/max/avg length and the Shannon entropy (base 2) of the character
    distribution across all values of each query's match set.  Rides the
    one terms-agg partial sweep — the (value, n) histogram per plan is
    exact and small, so lengths and char frequencies are re-derived at
    the driver reduce, never shipping doc rows.  Missing values (the ""
    keyword encoding) are excluded like ES.  Returns (query_id,
    n_values, min_len, max_len, avg_len, entropy)."""
    from collections import Counter

    summed, plan = _run_match_set(queries_ds, index_dir, field, cfg, concurrency)
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    rows = []
    if len(summed):
        summed = summed[summed["value"].astype(str) != ""]
        for pid_, g in summed.groupby("plan_id", sort=True):
            vals = g["value"].astype(str).to_numpy()
            ns = g["n"].to_numpy(np.int64)
            if not vals.size:
                continue
            lens = np.array([len(v) for v in vals], dtype=np.int64)
            n_total = int(ns.sum())
            chars: Counter = Counter()
            for v, n in zip(vals, ns):
                for c, k in Counter(v).items():
                    chars[c] += k * int(n)
            total_chars = sum(chars.values())
            ent = 0.0
            if total_chars:
                p = np.array(sorted(chars.values()), dtype=np.float64) / total_chars
                ent = float(-(p * np.log2(p)).sum())
            for qid in fanout.get(int(pid_), []):
                rows.append(
                    {
                        "query_id": np.int64(qid),
                        "n_values": np.int64(n_total),
                        "min_len": np.int64(lens.min()),
                        "max_len": np.int64(lens.max()),
                        "avg_len": float(
                            round6(np.array([(lens * ns).sum() / n_total]))[0]
                        ),
                        "entropy": float(round6(np.array([ent]))[0]),
                    }
                )
    out = pd.DataFrame(
        rows,
        columns=["query_id", "n_values", "min_len", "max_len", "avg_len", "entropy"],
    )
    return (
        out.sort_values("query_id", kind="mergesort")
        .reset_index(drop=True)
        .astype(
            {
                "query_id": np.int64, "n_values": np.int64,
                "min_len": np.int64, "max_len": np.int64,
            }
        )
    )


def _collect_fg_bg_counts(
    queries_ds, index_dir: str, cfg: EngineConfig, concurrency: int | None,
    sample_cap: int | None,
):
    """Shared two-pass collection for significant_text / rare_terms:
    SignificantTextStage fg partials summed per (plan, term) + the
    candidate terms' global df from the dictionary-only stats pass.
    Returns (cand DataFrame(plan_id, term, n), fg_totals {plan: n},
    bg_map {term: df}, plan, n_total) — or (None, ...) when there is
    nothing to aggregate."""
    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    n_total = int(manifest["n_docs"])
    plan = _match_set_plans(queries)
    if not plan or n_total == 0:
        return None, {}, {}, plan, n_total
    plan_ref = ray.put((plan, manifest.get("tombstones", {}), sample_cap))
    partials = _shards_ds(parts, concurrency).map_batches(
        SignificantTextStage,
        fn_constructor_args=(index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )

    def sum_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["plan_id", "term"], as_index=False).agg(n=("n_partial", "sum"))
        return g.astype({"plan_id": np.int64, "n": np.int64})

    summed = bucketed_group_agg(partials, ["plan_id", "term"], sum_bucket).to_pandas()
    if not len(summed):
        return None, {}, {}, plan, n_total
    fg_totals = summed[summed["term"] == ""].groupby("plan_id")["n"].sum().to_dict()
    cand = summed[summed["term"] != ""]
    all_terms = sorted(set(cand["term"]))
    bg_df = _collect_global_stats(index_dir, parts, all_terms)
    return cand, fg_totals, dict(zip(all_terms, bg_df)), plan, n_total


def _significance_scores(
    fgc: np.ndarray, bgc: np.ndarray, fg_n: int, n_total: int, heuristic: str
) -> np.ndarray:
    """round6'd significance scores over the background-is-superset 2x2
    contingency — shared by significant_terms and significant_text
    (formulas documented on run_significant_terms)."""
    sp = fgc / float(fg_n)
    pp = bgc / float(n_total)
    if heuristic == "jlh":
        raw = (sp - pp) * (sp / pp)
    else:
        a = fgc.astype(np.float64)
        b_ = float(fg_n) - a
        c = bgc.astype(np.float64) - a
        d = float(n_total - fg_n) - c
        nn = float(n_total)
        if heuristic == "chi_square":
            den = (a + b_) * (c + d) * (a + c) * (b_ + d)
            raw = np.where(
                den > 0,
                nn * (a * d - b_ * c) ** 2 / np.where(den > 0, den, 1.0),
                0.0,
            )
        elif heuristic == "mutual_information":
            raw = np.zeros(a.size)
            for pij, pi, pj in (
                (a, a + b_, a + c), (b_, a + b_, b_ + d),
                (c, c + d, a + c), (d, c + d, b_ + d),
            ):
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = (pij / nn) * np.log2(pij * nn / (pi * pj))
                raw += np.where(pij > 0, t, 0.0)
        elif heuristic == "percentage":
            raw = a / bgc.astype(np.float64)
        else:
            raise ValueError(f"unknown significance heuristic {heuristic!r}")
    return np.floor(raw * 1e6 + 0.5) / 1e6


def run_significant_terms(
    queries_ds,
    index_dir: str,
    field: str = "lang",
    *,
    k: int = 10,
    min_doc_count: int = 3,
    heuristic: str = "jlh",
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    background_filter: dict | None = None,
) -> pd.DataFrame:
    """Distributed ES significant_terms over a KEYWORD field (the
    structured sibling of significant_text): per query, the field values
    disproportionately frequent in the match set vs the whole index,
    scored with the same exact integer significance cut.  Foreground
    counts are the ordinary terms-agg partials; background counts come
    from one match-all pass over the same stage (`exists lang` matches
    every live doc).  Returns (query_id, rank, value, fg_count, bg_count,
    score).

    ``background_filter`` (the ES option): a query-row spec (column ->
    value, e.g. {"text": "..."} or {"kw_field": ..., "kw_value": ...})
    restricting the BACKGROUND set to its match set instead of the whole
    index — focus significance against a narrower baseline.  Like ES,
    the foreground should be a subset of the filtered background for the
    superset contingency to stay meaningful (caller's contract).

    ``heuristic`` — the ES significance_heuristic choices over the
    background-is-superset 2x2 contingency (a=fg term, b=fg other,
    c=bg-only term, d=bg-only other; N=n_total):
    - "jlh" (ES default): (sp - pp) * (sp / pp)
    - "chi_square": N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) — the standard
      2x2 statistic (include_negatives handled by the positive cut)
    - "mutual_information": Σ_cells p_ij * log2(p_ij / (p_i* p_*j)),
      empty cells contribute 0 (Manning et al., the ES formula)
    - "percentage": a / bg_count (the ES percentage heuristic)
    All round6'd before ranking; ties value asc."""
    if heuristic not in ("jlh", "chi_square", "mutual_information", "percentage"):
        raise ValueError(f"unknown significance heuristic {heuristic!r}")
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "value": pd.Series([], dtype=object),
            "fg_count": pd.Series([], dtype=np.int64),
            "bg_count": pd.Series([], dtype=np.int64),
            "score": pd.Series([], dtype=np.float64),
        }
    )
    fg, plan = _run_match_set(queries_ds, index_dir, field, cfg, concurrency)
    if not len(fg):
        return empty
    bg_row = (
        {k: [v] for k, v in background_filter.items()}
        if background_filter
        else {"exists": ["lang"]}
    )
    bg_df, _ = _run_match_set(
        pd.DataFrame({"query_id": [0], **bg_row}),
        index_dir, field, cfg, concurrency,
    )
    bg_map = dict(zip(bg_df["value"], bg_df["n"].astype(int)))
    n_total = int(sum(bg_map.values()))
    if n_total == 0:
        return empty
    fg_totals = fg.groupby("plan_id")["n"].sum().to_dict()
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    out = []
    for pid_, g in fg.groupby("plan_id", sort=True):
        fg_n = int(fg_totals[pid_])
        vals = g["value"].to_numpy(dtype=object)
        fgc = g["n"].to_numpy(np.int64)
        bgc = np.array([bg_map[v] for v in vals], dtype=np.int64)
        keep = (fgc >= min_doc_count) & (fgc * n_total > bgc * fg_n)
        if not keep.any():
            continue
        vals, fgc, bgc = vals[keep], fgc[keep], bgc[keep]
        score = _significance_scores(fgc, bgc, fg_n, n_total, heuristic)
        order = np.lexsort((vals, -score))[:k]
        top = pd.DataFrame(
            {
                "rank": np.arange(1, 1 + order.size, dtype=np.int64),
                "value": vals[order],
                "fg_count": fgc[order],
                "bg_count": bgc[order],
                "score": score[order],
            }
        )
        for qid in fanout.get(int(pid_), []):
            out.append(top.assign(query_id=np.int64(qid)))
    if not out:
        return empty
    return (
        pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "value", "fg_count", "bg_count", "score"]
        ]
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64})
    )


def run_rare_terms(
    queries_ds,
    index_dir: str,
    *,
    k: int = 10,
    max_doc_count: int = 5,
    min_fg_count: int = 1,
    sample_cap: int | None = None,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES rare_terms aggregation: terms appearing in a
    query's match set whose GLOBAL df <= ``max_doc_count`` — the
    long-tail bucket ES orders rarest-first.  Same two segment-parallel
    passes as significant_text (stored-_source re-analysis + dictionary
    df gather); rank order (bg df asc, term asc).  Requires
    cfg.store_text=True.  Returns (query_id, rank, term, fg_count,
    bg_count)."""
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "term": pd.Series([], dtype=object),
            "fg_count": pd.Series([], dtype=np.int64),
            "bg_count": pd.Series([], dtype=np.int64),
        }
    )
    cand, _, bg_map, plan, _ = _collect_fg_bg_counts(
        queries_ds, index_dir, cfg, concurrency, sample_cap
    )
    if cand is None:
        return empty
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    out = []
    for pid_, g in cand.groupby("plan_id", sort=True):
        fg = g["n"].to_numpy(np.int64)
        terms = g["term"].to_numpy(dtype=object)
        bg = np.array([bg_map[t] for t in terms], dtype=np.int64)
        keep = (bg <= max_doc_count) & (fg >= min_fg_count)
        if not keep.any():
            continue
        fg, bg, terms = fg[keep], bg[keep], terms[keep]
        order = np.lexsort((terms, bg))[:k]
        top = pd.DataFrame(
            {
                "rank": np.arange(1, 1 + order.size, dtype=np.int64),
                "term": terms[order],
                "fg_count": fg[order],
                "bg_count": bg[order],
            }
        )
        for qid in fanout.get(int(pid_), []):
            out.append(top.assign(query_id=np.int64(qid)))
    if not out:
        return empty
    return (
        pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "term", "fg_count", "bg_count"]
        ]
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64})
    )


def run_significant_text(
    queries_ds,
    index_dir: str,
    *,
    k: int = 10,
    min_doc_count: int = 3,
    sample_cap: int | None = None,
    heuristic: str = "jlh",
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES significant_text aggregation: for each query's
    match set (the FOREGROUND), the top-k terms whose foreground document
    frequency is disproportionately high versus the whole index (the
    BACKGROUND), scored with Lucene's JLH heuristic
    ``(fg% - bg%) * (fg% / bg%)`` — the ES default significance score.

    Two passes, both segment-parallel: (1) SignificantTextStage
    re-analyzes the stored _source of matching docs and emits
    per-(plan, term) fg counts; (2) the candidate terms' background df
    comes from the dictionary-only global-stats pass (the same DFS-phase
    used for scoring), so no postings are decoded for the background.
    Background stats include tombstoned docs until a merge purges them —
    ES visibility semantics.  ``min_doc_count`` (ES default 3) prunes
    rare-term noise; ``sample_cap`` (ES sampler analog) bounds the
    re-analyzed docs per (plan, segment) — exact when None.  The cut is
    decided with an exact integer cross-multiplication (fg*N > bg*fgN),
    never a float compare.  Requires cfg.store_text=True at build time.
    Returns (query_id, rank, term, fg_count, bg_count, score)."""
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "term": pd.Series([], dtype=object),
            "fg_count": pd.Series([], dtype=np.int64),
            "bg_count": pd.Series([], dtype=np.int64),
            "score": pd.Series([], dtype=np.float64),
        }
    )
    cand, fg_totals, bg_map, plan, n_total = _collect_fg_bg_counts(
        queries_ds, index_dir, cfg, concurrency, sample_cap
    )
    if cand is None:
        return empty
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    out = []
    for pid_, g in cand.groupby("plan_id", sort=True):
        fg_n = int(fg_totals.get(pid_, 0))
        if fg_n == 0:
            continue
        fg = g["n"].to_numpy(np.int64)
        terms = g["term"].to_numpy(dtype=object)
        bg = np.array([bg_map[t] for t in terms], dtype=np.int64)
        # exact integer significance cut: fg% > bg%  <=>  fg*N > bg*fgN
        keep = (fg >= min_doc_count) & (fg * n_total > bg * fg_n)
        if not keep.any():
            continue
        fg, bg, terms = fg[keep], bg[keep], terms[keep]
        # ``heuristic``: the same significance_heuristic options as
        # run_significant_terms (jlh default; chi_square /
        # mutual_information / percentage over the superset contingency)
        score = _significance_scores(fg, bg, fg_n, n_total, heuristic)
        order = np.lexsort((terms, -score))[:k]
        top = pd.DataFrame(
            {
                "rank": np.arange(1, 1 + order.size, dtype=np.int64),
                "term": terms[order],
                "fg_count": fg[order],
                "bg_count": bg[order],
                "score": score[order],
            }
        )
        for qid in fanout.get(int(pid_), []):
            out.append(top.assign(query_id=np.int64(qid)))
    if not out:
        return empty
    return (
        pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "term", "fg_count", "bg_count", "score"]
        ]
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "rank": np.int64, "fg_count": np.int64, "bg_count": np.int64})
    )


class CategorizeTextStage(_SegmentCacheStage):
    """Segment-parallel ES categorize_text collection: re-analyze the
    stored ``_source`` of each plan's matching docs and emit per-(plan,
    category) doc-count partials.  The engine's frozen categorization
    contract (a deterministic analog of ES's drain-style log grouping,
    reference API /_search categorize_text agg): a doc's category key is
    its first ``max_tokens`` analyzer tokens that contain no digit,
    joined by single spaces — digit-bearing tokens (ids, timestamps,
    counters) are the variable parts ES's categorizer masks out.  Docs
    with no digit-free tokens are uncategorizable and skipped.  Shuffle
    volume is plans x segments x distinct categories — never doc rows."""

    def _init_payload(self, payload) -> None:
        self.plan, self.tomb_map, self.max_tokens = payload

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        out = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for q in self.plan:
                ids = _segment_match_ids_for_plan(seg, q)
                if ids.size == 0:
                    continue
                texts = seg.texts_for(ids)
                langs = seg.langs_for(ids)
                pieces = []
                for lang in pd.unique(langs):
                    toks = get_analyzer(lang).tokenize_series(
                        pd.Series(texts[langs == lang])
                    )
                    n_per = toks.map(len).to_numpy(dtype=np.int64)
                    total = int(n_per.sum())
                    if total == 0:
                        continue
                    flat = pd.Series(
                        np.fromiter(
                            chain.from_iterable(toks), dtype=object, count=total
                        )
                    )
                    d = np.repeat(np.arange(n_per.size, dtype=np.int64), n_per)
                    keep = ~flat.str.contains(r"[0-9]", regex=True)
                    kept = pd.DataFrame({"d": d[keep.to_numpy()], "t": flat[keep]})
                    if not len(kept):
                        continue
                    kept = kept[kept.groupby("d").cumcount() < self.max_tokens]
                    cats = kept.groupby("d", sort=False)["t"].agg(" ".join)
                    pieces.append(cats.value_counts())
                if pieces:
                    cnt = (
                        pd.concat(pieces).groupby(level=0).sum()
                        if len(pieces) > 1
                        else pieces[0]
                    )
                    out.append(
                        pd.DataFrame(
                            {
                                "plan_id": np.int64(q["plan_id"]),
                                "category": cnt.index.to_numpy(dtype=object),
                                "n_partial": cnt.to_numpy(dtype=np.int64),
                            }
                        )
                    )
        if not out:
            return pd.DataFrame(
                {
                    "plan_id": pd.Series([], dtype=np.int64),
                    "category": pd.Series([], dtype=object),
                    "n_partial": pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(out, ignore_index=True)


def run_categorize_text(
    queries_ds,
    index_dir: str,
    *,
    size: int = 10,
    max_tokens: int = 5,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES categorize_text aggregation: group each query's
    matching docs into text categories (CategorizeTextStage's frozen
    digit-masked first-``max_tokens``-tokens key) and return the top
    ``size`` categories per query by (doc_count desc, category asc).
    Two stages: segment-parallel re-analysis partials, then one bucketed
    (plan, category) exchange — the driver only ever sees category
    counts.  Requires cfg.store_text=True at build time.
    Returns (query_id, rank, category, doc_count)."""
    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "category": pd.Series([], dtype=object),
            "doc_count": pd.Series([], dtype=np.int64),
        }
    )
    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    plan = _match_set_plans(queries)
    if not plan:
        return empty
    plan_ref = ray.put((plan, manifest.get("tombstones", {}), int(max_tokens)))
    partials = _shards_ds(parts, concurrency).map_batches(
        CategorizeTextStage,
        fn_constructor_args=(index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )

    def sum_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["plan_id", "category"], as_index=False).agg(
            n=("n_partial", "sum")
        )
        return g.astype({"plan_id": np.int64, "n": np.int64})

    summed = bucketed_group_agg(
        partials, ["plan_id", "category"], sum_bucket
    ).to_pandas()
    if not len(summed):
        return empty
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    out = []
    for pid_, g in summed.groupby("plan_id", sort=True):
        cats = g["category"].to_numpy(dtype=object)
        n = g["n"].to_numpy(np.int64)
        order = np.lexsort((cats, -n))[:size]
        top = pd.DataFrame(
            {
                "rank": np.arange(1, 1 + order.size, dtype=np.int64),
                "category": cats[order],
                "doc_count": n[order],
            }
        )
        for qid in fanout.get(int(pid_), []):
            out.append(top.assign(query_id=np.int64(qid)))
    if not out:
        return empty
    return (
        pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "category", "doc_count"]
        ]
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "rank": np.int64, "doc_count": np.int64})
    )


class TermSuggestStage(_SegmentCacheStage):
    """Segment-parallel ES term-suggester partials: per probe, the
    segment's edit-distance<=1 dictionary candidates with their segment
    df.  Summing partials over segments yields each candidate's GLOBAL
    df: the distance test doesn't depend on the segment, so every segment
    whose dictionary holds a candidate emits it.  ``mode='prefix'``
    expands a sorted-dictionary prefix range instead (the ES completion
    suggester: autocomplete candidates ranked by frequency)."""

    def _init_payload(self, payload) -> None:
        self.probes, self.tomb_map, self.mode = (
            payload if len(payload) == 3 else (*payload, "fuzzy")
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for qi, probe in enumerate(self.probes):
                if self.mode == "prefix":
                    lo, hi = seg.term_prefix_range(probe) if probe else (0, 0)
                    tis = list(range(lo, hi))
                else:
                    tis = _fuzzy_term_indices(seg, probe)
                if not tis:
                    continue
                idx = np.asarray(tis, dtype=np.int64)
                cands = seg.terms_arr.take(pa.array(idx)).to_pylist()
                for c, d in zip(cands, seg.df[idx]):
                    rows.append((np.int64(qi), c, np.int64(d)))
        return pd.DataFrame(
            rows, columns=["query_id", "suggestion", "df_partial"]
        ).astype({"query_id": np.int64, "df_partial": np.int64}) if rows else pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "suggestion": pd.Series([], dtype=object),
                "df_partial": pd.Series([], dtype=np.int64),
            }
        )


def run_term_suggest(
    probes,
    index_dir: str,
    *,
    k: int = 5,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    suggest_mode: str = "always",
) -> pd.DataFrame:
    """Distributed ES term suggester (did-you-mean): for each probe
    string, the top-k dictionary terms within edit distance 1 ranked by
    global document frequency (freq desc, term asc — ES
    suggest_mode=always sorted by frequency), the probe itself excluded.
    Returns (query_id, rank, suggestion, freq) with query_id = probe
    position.

    ``suggest_mode`` (the ES option): "always" (default here);
    "popular" keeps only candidates with global df strictly greater
    than the probe's own df; "missing" suggests only when the probe is
    absent from the index entirely (the ES default) — present probes
    yield no rows."""
    if suggest_mode not in ("always", "popular", "missing"):
        raise ValueError(f"suggest_mode: {suggest_mode!r}")
    return _run_suggest(
        probes, index_dir, "fuzzy", k, cfg, concurrency, suggest_mode
    )


def run_completion_suggest(
    prefixes,
    index_dir: str,
    *,
    k: int = 5,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES completion suggester (autocomplete): for each
    prefix, the top-k dictionary terms starting with it ranked by global
    df (freq desc, term asc).  Expansion = two binary searches over each
    sorted segment dictionary; an exact match IS a completion (kept).
    Returns (query_id, rank, suggestion, freq)."""
    return _run_suggest(prefixes, index_dir, "prefix", k, cfg, concurrency)


def _run_suggest(
    probes, index_dir: str, mode: str, k: int,
    cfg: EngineConfig, concurrency: int | None,
    suggest_mode: str = "always",
) -> pd.DataFrame:
    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    probes = [str(p) for p in probes]
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "suggestion": pd.Series([], dtype=object),
            "freq": pd.Series([], dtype=np.int64),
        }
    )
    if not probes:
        return empty
    plan_ref = ray.put((probes, manifest.get("tombstones", {}), mode))
    partials = _shards_ds(parts, concurrency).map_batches(
        TermSuggestStage,
        fn_constructor_args=(index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )

    def sum_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["query_id", "suggestion"], as_index=False).agg(
            freq=("df_partial", "sum")
        )
        return g.astype({"query_id": np.int64, "freq": np.int64})

    summed = bucketed_group_agg(
        partials, ["query_id", "suggestion"], sum_bucket
    ).to_pandas()
    if not len(summed):  # no candidates anywhere (schema-less empty frame)
        return empty
    out = []
    for qi, g in summed.groupby("query_id", sort=True):
        if mode == "fuzzy":  # did-you-mean never suggests the probe itself
            probe_freq = int(
                g.loc[g["suggestion"] == probes[int(qi)], "freq"].sum()
            )
            g = g[g["suggestion"] != probes[int(qi)]]
            if suggest_mode == "missing" and probe_freq > 0:
                continue  # ES: a known term gets no suggestions
            if suggest_mode == "popular":
                g = g[g["freq"] > probe_freq]
        if not len(g):
            continue
        sug = g["suggestion"].to_numpy(dtype=object)
        freq = g["freq"].to_numpy(np.int64)
        sel = np.lexsort((sug, -freq))[:k]
        out.append(
            pd.DataFrame(
                {
                    "query_id": np.int64(qi),
                    "rank": np.arange(1, 1 + sel.size, dtype=np.int64),
                    "suggestion": sug[sel],
                    "freq": freq[sel],
                }
            )
        )
    if not out:
        return empty
    return pd.concat(out, ignore_index=True)


def run_phrase_suggest(
    texts,
    index_dir: str,
    *,
    k: int = 3,
    gen_size: int = 5,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES phrase suggester (did-you-mean over whole inputs):
    per analyzed token, the direct generator proposes dictionary terms
    within edit distance <= 1 (the token itself included when indexed),
    keeping the top ``gen_size`` per slot by global df (df desc, term
    asc); candidate phrases = the slot cross-product, scored with a
    smoothed unigram language model score = round6(Σ ln((df+1)/(N+1)))
    (ES uses a Laplace-smoothed n-gram model; unigram is this engine's
    documented flavor), the unchanged input excluded.  One
    TermSuggestStage sweep covers every token of every input; the
    cross-product runs on the driver over gen_size^n_tokens tiny rows.
    A token with no candidates anywhere kills its input (ES returns no
    suggestion when a position has no generator output).  Returns
    (query_id, rank, suggestion, score) with query_id = input position,
    ranked (score desc, suggestion asc)."""
    from itertools import product

    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    an = get_analyzer(None)
    tok_lists = [an.tokenize(str(t)) for t in texts]
    probes = sorted({t for toks in tok_lists for t in toks})
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    n_docs = int(manifest["n_docs"])
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "suggestion": pd.Series([], dtype=object),
            "score": pd.Series([], dtype=np.float64),
        }
    )
    if not probes:
        return empty
    plan_ref = ray.put((probes, manifest.get("tombstones", {}), "fuzzy"))
    partials = _shards_ds(parts, concurrency).map_batches(
        TermSuggestStage,
        fn_constructor_args=(index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )

    def sum_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["query_id", "suggestion"], as_index=False).agg(
            freq=("df_partial", "sum")
        )
        return g.astype({"query_id": np.int64, "freq": np.int64})

    summed = bucketed_group_agg(
        partials, ["query_id", "suggestion"], sum_bucket
    ).to_pandas()
    cand_of: dict[str, list[tuple[str, int]]] = {}
    if len(summed):
        for qi, g in summed.groupby("query_id", sort=True):
            sug = g["suggestion"].to_numpy(dtype=object)
            freq = g["freq"].to_numpy(np.int64)
            sel = np.lexsort((sug, -freq))[: max(1, int(gen_size))]
            cand_of[probes[int(qi)]] = [
                (str(sug[j]), int(freq[j])) for j in sel
            ]
    out = []
    for qid, toks in enumerate(tok_lists):
        if not toks or any(t not in cand_of for t in toks):
            continue
        orig = " ".join(toks)
        scored: list[tuple[float, str]] = []
        for combo in product(*(cand_of[t] for t in toks)):
            phrase = " ".join(c[0] for c in combo)
            if phrase == orig:
                continue
            raw = float(
                sum(np.log((c[1] + 1.0) / (n_docs + 1.0)) for c in combo)
            )
            scored.append((float(round6(np.array([raw]))[0]), phrase))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (sc, phrase) in enumerate(scored[: int(k)], start=1):
            out.append((np.int64(qid), np.int64(rank), phrase, sc))
    if not out:
        return empty
    return pd.DataFrame(
        out, columns=["query_id", "rank", "suggestion", "score"]
    ).astype({"query_id": np.int64, "rank": np.int64, "score": np.float64})


class CardinalityAggStage(_SegmentCacheStage):
    """Segment-parallel ES cardinality-agg partials (approximate path):
    one HLL register block per (plan, segment) — the ES cardinality
    aggregation IS HLL, and registers max-merge, so shuffle volume is
    plans x segments x 2^p bytes regardless of field cardinality."""

    def _init_payload(self, payload) -> None:
        self.plan, self.tomb_map, self.field, self.p = payload

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from kafka_es_ray.pipelines.sketches import _hll_build

        rows = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for q in self.plan:
                ids = _segment_match_ids_for_plan(seg, q)
                if ids.size == 0:
                    continue
                regs = _hll_build(seg.field_for(self.field, ids), self.p)
                rows.append((np.int64(q["plan_id"]), regs.tobytes()))
        return pd.DataFrame(rows, columns=["plan_id", "regs"]).astype(
            {"plan_id": np.int64}
        ) if rows else pd.DataFrame(
            {
                "plan_id": pd.Series([], dtype=np.int64),
                "regs": pd.Series([], dtype=object),
            }
        )


def run_agg_cardinality(
    queries_ds,
    index_dir: str,
    field: str = "lang",
    *,
    exact: bool = False,
    precision: int = 12,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES cardinality aggregation: distinct ``field`` values
    per query's match set.  ``exact=False`` (the ES semantics) merges
    per-(plan, segment) HLL registers — constant shuffle volume at any
    cardinality; ``exact=True`` counts the distinct values from the
    terms-agg partial rows (right for low-cardinality keyword fields and
    for SQL-oracle parity).  Returns (query_id, n_distinct)."""
    import ray

    if exact:
        summed, plan = _run_match_set(queries_ds, index_dir, field, cfg, concurrency)
        by_plan = (
            summed.groupby("plan_id")["value"].nunique().to_dict()
            if len(summed)
            else {}
        )
    else:
        concurrency = concurrency or cfg.query_concurrency or query_pool()
        queries = (
            queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
        )
        manifest = read_manifest(index_dir)
        parts = [int(p) for p in manifest["parts"]]
        plan = _match_set_plans(queries)
        if not plan:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int64),
                    "n_distinct": pd.Series([], dtype=np.int64),
                }
            )
        plan_ref = ray.put(
            (plan, manifest.get("tombstones", {}), field, precision)
        )
        partials = (
            _shards_ds(parts, concurrency)
            .map_batches(
                CardinalityAggStage,
                fn_constructor_args=(index_dir, plan_ref, cfg),
                batch_format="pandas",
                batch_size=4,
                concurrency=concurrency,
            )
            .to_pandas()  # plans x segments rows of 2^p bytes — bounded
        )
        from kafka_es_ray.pipelines.sketches import _hll_estimate

        by_plan = {}
        for pid_, g in partials.groupby("plan_id", sort=True):
            regs = np.maximum.reduce(
                [np.frombuffer(b, dtype=np.uint8) for b in g["regs"]]
            )
            by_plan[int(pid_)] = int(round(_hll_estimate(regs)))
    rows = [
        {"query_id": qid, "n_distinct": int(by_plan.get(q["plan_id"], 0))}
        for q in plan
        for qid in q["query_ids"]
    ]
    return (
        pd.DataFrame(rows, columns=["query_id", "n_distinct"])
        .sort_values("query_id")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "n_distinct": np.int64})
    )


def run_collapsed(
    queries_ds,
    index_dir: str,
    collapse_field: str,
    *,
    k: int = 10,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
):
    """Distributed ES field collapsing: BM25 top-k GROUPS — at most one
    (the best) doc per ``collapse_field`` value, groups ranked by their
    best doc's (score desc, doc_id asc).  Match queries (operator or/and,
    filter_lang, range filters); see CollapseTopkStage for the exactness
    argument.  Returns Dataset(query_id, rank, doc_id, key, score,
    collapse_val)."""
    import ray
    import ray.data as rd

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    n_docs = int(manifest["n_docs"])
    avgdl = float(manifest["avgdl"]) or 1.0
    k1 = float(manifest.get("k1", cfg.k1))
    b = float(manifest.get("b", cfg.b))

    plan = _scored_match_plans(queries, index_dir, parts, n_docs)
    for q in plan:
        q["k"] = k  # CollapseTopkStage's per-segment value cut
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "key": pd.Series([], dtype=object),
            "score": pd.Series([], dtype=np.float64),
            "collapse_val": pd.Series([], dtype=object),
        }
    )
    if not plan:
        return rd.from_pandas(empty)
    plan_ref = ray.put(
        (plan, avgdl, k1, b, manifest.get("tombstones", {}), collapse_field)
    )
    partials = _shards_ds(parts, concurrency).map_batches(
        CollapseTopkStage,
        fn_constructor_args=(index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid_, g in bucket.groupby("plan_id", sort=False):
            ids = g["doc_id"].to_numpy()
            scores = g["score"].to_numpy()
            vals = g["collapse_val"].to_numpy()
            order = np.lexsort((ids, -scores, vals))
            v_s = vals[order]
            first = np.ones(v_s.size, dtype=bool)
            first[1:] = v_s[1:] != v_s[:-1]
            ids_f = ids[order][first]
            sc_f = scores[order][first]
            keys_f = g["key"].to_numpy()[order][first]
            v_f = v_s[first]
            sel = np.lexsort((ids_f, -sc_f))[:k]
            top = pd.DataFrame(
                {
                    "rank": np.arange(1, 1 + sel.size, dtype=np.int64),
                    "doc_id": ids_f[sel],
                    "key": keys_f[sel],
                    "score": sc_f[sel],
                    "collapse_val": v_f[sel],
                }
            )
            for qid in fanout.get(int(pid_), []):
                out.append(top.assign(query_id=np.int64(qid)))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "doc_id", "key", "score", "collapse_val"]
        ]

    return bucketed_group_agg(partials, ["plan_id"], merge_bucket)


class KnnStage(_SegmentCacheStage):
    """Segment-parallel EXACT kNN over a dense_vector docstore field (the
    ES knn search / script_score cosineSimilarity semantics, exact
    because every live vectored doc is scored — num_candidates = all).
    One matmul per (segment, batch) covers every query plan; emits each
    plan's per-segment top-k by round6'd cosine (ties kept, so the
    bucketed merge is exact)."""

    def _init_payload(self, payload) -> None:
        self.plan, self.tomb_map, self.field, *rest = payload
        self.similarity = rest[0] if rest else "cosine"
        # float64 throughout (storage is float32): matches the DuckDB
        # CAST(... AS DOUBLE[]) oracle contract (CLAUDE.md rule 4) and
        # the pipelines/ann.py precedent
        qm = np.stack([q["vec"] for q in self.plan]).astype(np.float64)
        if self.similarity == "cosine":
            qn = np.linalg.norm(qm, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            qm = qm / qn
        self.qmat = qm  # (n_plans x dim)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        multi = self.multi
        iids = (
            batch["index_id"].astype(int).to_numpy()
            if "index_id" in batch.columns
            else np.zeros(len(batch), dtype=np.int64)
        )
        for pid, iid in zip(batch["part_id"].astype(int), iids):
            seg = self._segment(pid, int(iid))
            rows, mat = seg.vectors_for(self.field)
            if not rows.size:
                continue
            ids = seg.doc_ids_store[rows]
            if seg.tombstones is not None and seg.tombstones.size and ids.size:
                pos = np.minimum(
                    np.searchsorted(seg.tombstones, ids), seg.tombstones.size - 1
                )
                alive = seg.tombstones[pos] != ids
                ids, mat = ids[alive], mat[alive]
            if not ids.size:
                continue
            mat64 = mat.astype(np.float64)
            if self.similarity == "cosine":
                nrm = np.linalg.norm(mat64, axis=1, keepdims=True)
                nrm[nrm == 0] = 1.0
                sims = (mat64 / nrm) @ self.qmat.T  # (n_docs x n_plans)
            elif self.similarity == "dot_product":
                sims = mat64 @ self.qmat.T  # raw inner product
            elif self.similarity == "l2_norm":
                # ES l2_norm knn score: 1 / (1 + ||v - q||^2)
                d2 = (
                    (mat64 * mat64).sum(axis=1, keepdims=True)
                    - 2.0 * (mat64 @ self.qmat.T)
                    + (self.qmat * self.qmat).sum(axis=1)[None, :]
                )
                sims = 1.0 / (1.0 + np.maximum(d2, 0.0))
            else:
                raise ValueError(
                    f"unsupported knn similarity {self.similarity!r}"
                )
            for j, q in enumerate(self.plan):
                keep = np.ones(ids.size, dtype=bool)
                for fld, val in q.get("filter_kw") or ():
                    got = seg.field_for(fld, ids)
                    keep &= got == val if isinstance(val, str) else np.isin(got, val)
                for fld, lo, hi in q.get("filter_ranges") or ():
                    vals_f = seg.nums_for(fld, ids)
                    keep &= ~np.isnan(vals_f)
                    if lo is not None:
                        keep &= vals_f >= lo
                    if hi is not None:
                        keep &= vals_f <= hi
                rows_j = np.flatnonzero(keep)
                if not rows_j.size:
                    continue
                sr = np.floor(
                    sims[rows_j, j] * 1e6 + 0.5
                ) / 1e6  # round6 BEFORE the cut so ties survive the merge
                k = q["k"]
                if sr.size > k:
                    kth = -np.partition(-sr, k - 1)[k - 1]
                    sel = np.flatnonzero(sr >= kth)
                else:
                    sel = np.arange(sr.size)
                hit_ids = ids[rows_j[sel]]
                cols = {
                    "plan_id": np.int64(q["plan_id"]),
                    "doc_id": hit_ids,
                    "key": seg.keys_for(hit_ids),
                    "score": sr[sel],
                }
                if multi:
                    cols["index_id"] = np.int64(iid)
                out.append(pd.DataFrame(cols))
        if not out:
            empty = {
                "plan_id": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
            if multi:
                empty["index_id"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(empty)
        return pd.concat(out, ignore_index=True)


def run_knn(
    queries_ds,
    index_dir,
    field: str,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    similarity: str = "cosine",
    min_similarity: float | None = None,
):
    """Distributed ES kNN search over a dense_vector mapped field
    (cfg.vector_cols): each query row carries ``query_id``, ``vec`` (a
    list/array of floats) and optional ``k``.  EXACT cosine ranking —
    every live vectored doc is scored (the ES script_score / exact-knn
    contract; the ANN scale paths live in pipelines/ann.py).
    ``similarity``: "cosine" (default, score = round6(cosine)),
    "dot_product" (raw inner product) or "l2_norm" (ES transform
    1/(1 + ||v-q||^2)) — the ES dense_vector similarity options; all
    round6'd before the per-segment cut.  ``min_similarity``: the ES knn
    ``similarity`` threshold — hits scoring below it are dropped at the
    final merge (applied on the round6'd score; a query may return fewer
    than k hits, like ES).  Returns
    Dataset(query_id, rank, doc_id, key, score) with score = round6(cosine)
    and ties broken doc_id asc.  Segments are the Dataset, the query
    matrix the broadcast side; shuffle volume = plans x segments x k."""
    import ray
    import ray.data as rd

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    # multi-index kNN (GET /idx1,idx2/_search with a knn clause): cosine
    # needs no global stats, so the only cross-index concern is the
    # doc_id tie-break — (score desc, doc_id asc, index_id asc)
    multi = not isinstance(index_dir, str)
    dirs = list(index_dir) if multi else [index_dir]
    manifests = [read_manifest(d) for d in dirs]
    part_rows = [
        (iid, int(p)) for iid, m in enumerate(manifests) for p in m["parts"]
    ]
    plan_by_key: dict[tuple, dict] = {}
    for row in queries.itertuples(index=False):
        v = np.asarray(row.vec, dtype=np.float32)
        k = int(getattr(row, "k", 10) or 10)
        # ES knn filter clause: PRE-filter — the top-k is computed among
        # matching docs only (kw_field/kw_value + range_* query columns)
        fkw = _row_filter_kw(row)
        fr = _row_filter_ranges(row)
        key = (v.tobytes(), k, fkw, fr)
        entry = plan_by_key.get(key)
        if entry is None:
            entry = plan_by_key[key] = {
                "query_ids": [],
                "vec": v,
                "k": k,
                "filter_kw": list(fkw) if fkw else None,
                "filter_ranges": list(fr) if fr else None,
            }
        entry["query_ids"].append(int(row.query_id))
    plan = list(plan_by_key.values())
    if not plan:
        return rd.from_arrow(
            pa.Table.from_pandas(
                pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype=np.int64),
                        "rank": pd.Series([], dtype=np.int64),
                        "doc_id": pd.Series([], dtype=np.int64),
                        "key": pd.Series([], dtype=object),
                        "score": pd.Series([], dtype=np.float64),
                    }
                ),
                preserve_index=False,
            )
        )
    for pid_, q in enumerate(plan):
        q["plan_id"] = pid_
    tomb = [m.get("tombstones", {}) for m in manifests] if multi else manifests[0].get("tombstones", {})
    plan_ref = ray.put((plan, tomb, field, similarity))
    n_blocks = max(concurrency * 2, len(part_rows) // 4)
    shard_df = pd.DataFrame({"part_id": [p for _, p in part_rows]})
    if multi:
        shard_df["index_id"] = [iid for iid, _ in part_rows]
    shards = rd.from_pandas(shard_df).repartition(
        max(1, min(n_blocks, len(part_rows)))
    )
    partials = shards.map_batches(
        KnnStage,
        fn_constructor_args=(dirs if multi else index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )
    k_map = {q["plan_id"]: q["k"] for q in plan}
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}

    out_cols = ["query_id", "rank", "doc_id", "key", "score"]
    if multi:
        out_cols.append("index_id")

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid_, g in bucket.groupby("plan_id", sort=False):
            k = k_map.get(int(pid_), 10)
            if min_similarity is not None:
                g = g[g["score"] >= float(min_similarity)]
                if not len(g):
                    continue
            ids = g["doc_id"].to_numpy()
            sc = g["score"].to_numpy()
            if multi:
                iid_col = g["index_id"].to_numpy()
                order = np.lexsort((iid_col, ids, -sc))[:k]
            else:
                order = np.lexsort((ids, -sc))[:k]
            top = pd.DataFrame(
                {
                    "rank": np.arange(1, 1 + order.size, dtype=np.int64),
                    "doc_id": ids[order],
                    "key": g["key"].to_numpy()[order],
                    "score": sc[order],
                }
            )
            if multi:
                top["index_id"] = iid_col[order]
            for qid in fanout.get(int(pid_), []):
                out.append(top.assign(query_id=np.int64(qid)))
        if not out:
            empty = {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
            if multi:
                empty["index_id"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(empty)
        return pd.concat(out, ignore_index=True)[out_cols]

    return bucketed_group_agg(partials, ["plan_id"], merge_bucket)


def run_rrf(
    queries_ds,
    index_dir: str,
    field: str,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    rank_window: int = 100,
    rank_constant: int = 60,
):
    """ES hybrid search via reciprocal rank fusion (the ES ``rrf``
    retriever): each query row carries ``text`` (BM25 retriever) and
    ``vec`` (kNN retriever over a dense_vector field); both retrievers
    run distributed to depth ``rank_window``, then fuse as
    score = round6(sum over retrievers of 1/(rank_constant + rank)).
    The fusion itself is driver-side BY DESIGN: its input is
    2 x rank_window rows per unique query — never corpus-scale.
    Returns (query_id, rank, doc_id, score), ties doc_id asc."""
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    k_out = (
        queries.set_index("query_id")["k"].astype(int).to_dict()
        if "k" in queries.columns
        else {}
    )
    text_q = queries[[c for c in ("query_id", "text", "lang") if c in queries.columns]]
    text_q = text_q.assign(k=np.int32(rank_window))
    bm = run_queries(text_q, index_dir, cfg, concurrency).to_pandas()
    knn_q = queries[["query_id", "vec"]].assign(k=np.int32(rank_window))
    kn = run_knn(knn_q, index_dir, field, cfg, concurrency).to_pandas()
    # multi-index: doc ids may collide across indexes, so fusion keys
    # include index_id whenever the retrievers carry it
    with_iid = all("index_id" in df.columns for df in (bm, kn) if len(df))
    parts = []
    for df in (bm, kn):
        if len(df):
            cols = {
                "query_id": df["query_id"].astype(np.int64),
                "doc_id": df["doc_id"].astype(np.int64),
                "rrf": 1.0 / (rank_constant + df["rank"].astype(np.float64)),
            }
            if with_iid:
                cols["index_id"] = df["index_id"].astype(np.int64)
            parts.append(pd.DataFrame(cols))
    if not parts:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.float64),
            }
        )
    gkeys = ["query_id", "doc_id"] + (["index_id"] if with_iid else [])
    fused = (
        pd.concat(parts, ignore_index=True)
        .groupby(gkeys, as_index=False)["rrf"]
        .sum()
    )
    fused["score"] = np.floor(fused["rrf"].to_numpy() * 1e6 + 0.5) / 1e6
    out = []
    for qid, g in fused.groupby("query_id", sort=True):
        k = int(k_out.get(int(qid), 10))
        if with_iid:
            order = np.lexsort(
                (g["index_id"].to_numpy(), g["doc_id"].to_numpy(),
                 -g["score"].to_numpy())
            )[:k]
        else:
            order = np.lexsort(
                (g["doc_id"].to_numpy(), -g["score"].to_numpy())
            )[:k]
        cols = {
            "query_id": np.int64(qid),
            "rank": np.arange(1, 1 + order.size, dtype=np.int64),
            "doc_id": g["doc_id"].to_numpy()[order],
            "score": g["score"].to_numpy()[order],
        }
        if with_iid:
            cols["index_id"] = g["index_id"].to_numpy()[order]
        out.append(pd.DataFrame(cols))
    return pd.concat(out, ignore_index=True)


def run_linear(
    queries_ds,
    index_dir: str,
    field: str,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    rank_window: int = 100,
    weights: tuple = (1.0, 1.0),
    normalizer: str = "minmax",
):
    """ES hybrid search via the ``linear`` retriever: each query row
    carries ``text`` (BM25 retriever) and ``vec`` (kNN retriever over a
    dense_vector field); both run distributed to depth ``rank_window``,
    then fuse as score = round6(Σ weight_i · norm_i(score_i)) where
    ``minmax`` normalizes each retriever's round6'd window scores per
    query to [0, 1] ((s - min) / (max - min); a degenerate window where
    max == min normalizes to 1.0 — every retrieved doc is a full-weight
    hit — the frozen engine convention, replayed by the SQL oracle) and
    ``none`` passes raw scores.  A doc absent from a retriever's window
    contributes 0 for that retriever (the ES linear-retriever rule).
    Fusion is driver-side BY DESIGN: input is 2 x rank_window rows per
    unique query, never corpus-scale.  Returns (query_id, rank, doc_id,
    score), ties doc_id asc (and index_id asc under multi-index)."""
    if normalizer not in ("minmax", "none"):
        raise ValueError(f"linear retriever normalizer: {normalizer!r}")
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    k_out = (
        queries.set_index("query_id")["k"].astype(int).to_dict()
        if "k" in queries.columns
        else {}
    )
    text_q = queries[[c for c in ("query_id", "text", "lang") if c in queries.columns]]
    text_q = text_q.assign(k=np.int32(rank_window))
    bm = run_queries(text_q, index_dir, cfg, concurrency).to_pandas()
    knn_q = queries[["query_id", "vec"]].assign(k=np.int32(rank_window))
    kn = run_knn(knn_q, index_dir, field, cfg, concurrency).to_pandas()
    with_iid = all("index_id" in df.columns for df in (bm, kn) if len(df))
    parts = []
    for df, w in ((bm, float(weights[0])), (kn, float(weights[1]))):
        if not len(df):
            continue
        sc = df["score"].to_numpy(np.float64)
        if normalizer == "minmax":
            grp = df.groupby("query_id")["score"]
            mn = grp.transform("min").to_numpy(np.float64)
            mx = grp.transform("max").to_numpy(np.float64)
            rng = mx - mn
            norm = np.where(rng > 0, (sc - mn) / np.where(rng > 0, rng, 1.0), 1.0)
        else:
            norm = sc
        cols = {
            "query_id": df["query_id"].astype(np.int64),
            "doc_id": df["doc_id"].astype(np.int64),
            "contrib": w * norm,
        }
        if with_iid:
            cols["index_id"] = df["index_id"].astype(np.int64)
        parts.append(pd.DataFrame(cols))
    if not parts:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.float64),
            }
        )
    gkeys = ["query_id", "doc_id"] + (["index_id"] if with_iid else [])
    fused = (
        pd.concat(parts, ignore_index=True)
        .groupby(gkeys, as_index=False)["contrib"]
        .sum()
    )
    fused["score"] = np.floor(fused["contrib"].to_numpy() * 1e6 + 0.5) / 1e6
    out = []
    for qid, g in fused.groupby("query_id", sort=True):
        k = int(k_out.get(int(qid), 10))
        if with_iid:
            order = np.lexsort(
                (g["index_id"].to_numpy(), g["doc_id"].to_numpy(),
                 -g["score"].to_numpy())
            )[:k]
        else:
            order = np.lexsort(
                (g["doc_id"].to_numpy(), -g["score"].to_numpy())
            )[:k]
        cols = {
            "query_id": np.int64(qid),
            "rank": np.arange(1, 1 + order.size, dtype=np.int64),
            "doc_id": g["doc_id"].to_numpy()[order],
            "score": g["score"].to_numpy()[order],
        }
        if with_iid:
            cols["index_id"] = g["index_id"].to_numpy()[order]
        out.append(pd.DataFrame(cols))
    return pd.concat(out, ignore_index=True)


def _rank_cut(frame: pd.DataFrame, depth_of) -> pd.DataFrame:
    """(query_id, doc_id, score) -> ranked top-depth per query with the
    engine tie-break (score desc, doc_id asc); ``depth_of(qid)`` gives
    each query's cut."""
    out = []
    for qid, g in frame.groupby("query_id", sort=True):
        ids = g["doc_id"].to_numpy(np.int64)
        sc = g["score"].to_numpy(np.float64)
        order = np.lexsort((ids, -sc))[: int(depth_of(int(qid)))]
        out.append(
            pd.DataFrame(
                {
                    "query_id": np.int64(qid),
                    "rank": np.arange(1, order.size + 1, dtype=np.int64),
                    "doc_id": ids[order],
                    "score": sc[order],
                }
            )
        )
    if not out:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.float64),
            }
        )
    return pd.concat(out, ignore_index=True)


def run_retriever(
    queries_ds,
    index_dir,
    spec: dict,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """ES retriever TREE (the modern ``retriever`` search body): evaluate
    an arbitrary nested spec of retrievers —

    - ``{"standard": {}}`` — BM25 over each query row's ``text``;
    - ``{"knn": {"field": f}}`` — exact kNN over each row's ``vec``;
    - ``{"rrf": {"retrievers": [...], "rank_window_size": W,
      "rank_constant": C}}`` — reciprocal rank fusion over ANY number of
      child retrievers (generalizes run_rrf's fixed text+vec pair;
      children may themselves be rrf/linear trees);
    - ``{"linear": {"retrievers": [{"retriever": spec, "weight": w},
      ...], "rank_window_size": W, "normalizer": "minmax"|"none"}}`` —
      weighted normalized fusion with run_linear's frozen conventions
      (per-query minmax over each child's round6'd window scores,
      degenerate window -> 1.0, absent doc contributes 0).

    Leaves run DISTRIBUTED (run_queries / run_knn); every fusion is
    driver-side BY DESIGN — its input is (children x rank_window) rows
    per unique query, never corpus-scale.  Rank/tie contract matches the
    other retrievers: round6 score desc, doc_id asc.  Returns
    (query_id, rank, doc_id, score) cut to each query row's ``k``
    (default 10)."""
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    k_out = (
        queries.set_index("query_id")["k"].astype(int).to_dict()
        if "k" in queries.columns
        else {}
    )

    def ev(node: dict, depth: int) -> pd.DataFrame:
        if "standard" in node:
            q = queries[
                [c for c in ("query_id", "text", "lang") if c in queries.columns]
            ].assign(k=np.int32(depth))
            out = run_queries(q, index_dir, cfg, concurrency).to_pandas()
            return out[["query_id", "rank", "doc_id", "score"]]
        if "knn" in node:
            q = queries[["query_id", "vec"]].assign(k=np.int32(depth))
            out = run_knn(
                q, index_dir, node["knn"]["field"], cfg, concurrency
            ).to_pandas()
            return out[["query_id", "rank", "doc_id", "score"]]
        if "rrf" in node:
            n = node["rrf"]
            w = int(n.get("rank_window_size", 100))
            c = int(n.get("rank_constant", 60))
            kids = [ev(r, w) for r in n["retrievers"]]
            contrib = pd.concat(
                [k.assign(score=1.0 / (c + k["rank"].to_numpy(np.float64)))
                 for k in kids],
                ignore_index=True,
            )
            g = contrib.groupby(["query_id", "doc_id"], as_index=False)["score"].sum()
            g["score"] = round6(g["score"].to_numpy(np.float64))
            return _rank_cut(g, lambda q_: depth)
        if "linear" in node:
            n = node["linear"]
            w = int(n.get("rank_window_size", 100))
            norm = n.get("normalizer", "minmax")
            if norm not in ("minmax", "none"):
                raise ValueError(f"linear retriever normalizer: {norm!r}")
            parts = []
            for ent in n["retrievers"]:
                kid = ev(ent["retriever"], w)
                wt = float(ent.get("weight", 1.0))
                if norm == "minmax" and len(kid):
                    def mm(s: pd.Series) -> pd.Series:
                        v = s.to_numpy(np.float64)
                        lo, hi = v.min(), v.max()
                        if hi == lo:
                            # degenerate window -> every retrieved doc a
                            # full-weight hit (run_linear's frozen rule)
                            return pd.Series(np.ones_like(v), index=s.index)
                        return pd.Series((v - lo) / (hi - lo), index=s.index)

                    kid = kid.assign(
                        score=kid.groupby("query_id")["score"].transform(mm)
                    )
                parts.append(kid.assign(score=kid["score"] * wt))
            g = (
                pd.concat(parts, ignore_index=True)
                .groupby(["query_id", "doc_id"], as_index=False)["score"].sum()
            )
            g["score"] = round6(g["score"].to_numpy(np.float64))
            return _rank_cut(g, lambda q_: depth)
        raise ValueError(f"unknown retriever node: {sorted(node)!r}")

    top = ev(spec, max([*k_out.values(), 10]))
    return _rank_cut(
        top.rename(columns={})[["query_id", "doc_id", "score"]],
        lambda q_: k_out.get(q_, 10),
    )


def run_sorted(
    queries_ds,
    index_dir: str,
    field: str,
    *,
    ascending: bool = False,
    k: int = 10,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    search_after: tuple | None = None,
):
    """Distributed ES sort-by-field: each query's match set ranked by a
    numeric docstore field (cfg.numeric_cols) instead of BM25 — segments
    as the Dataset, deduped match plans broadcast, per-segment partial
    top-k merged in a bucketed exchange.  Missing values (NaN) excluded.
    Returns Dataset(query_id, rank, doc_id, key, sort_val) with ties
    broken doc_id asc.

    ``search_after``: ES sort cursor — (sort_val, doc_id) of the previous
    page's last hit; only docs strictly after it in (sort_val asc/desc,
    doc_id asc) order are returned and ranks restart at 1.  Stateless
    deep pagination: shards apply the cursor BEFORE their top-k cut, so
    page depth never grows the shuffle.

    ``field`` may also be an ES runtime field — ``"name=expr"`` or
    ``{"script": expr}`` (the whitelisted painless-expression subset
    over mapped numeric docvalues, evaluated vectorized in-shard;
    missing inputs read 0.0) — the ES runtime_mappings sort."""
    import ray
    import ray.data as rd

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    if isinstance(field, str) and "=" in field:
        _, _rt = _split_fetch_field(field)
        _script_fields(_rt)  # whitelist gate on the driver
        field = {"script": _rt}

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    plan = _match_set_plans(queries)
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "key": pd.Series([], dtype=object),
            "sort_val": pd.Series([], dtype=np.float64),
        }
    )
    if not plan:
        return rd.from_pandas(empty)
    plan_ref = ray.put(
        (
            plan, manifest.get("tombstones", {}), field, ascending, k,
            search_after, None,
            # index-sorting early termination: layout == requested sort,
            # plain field, no cursor (the cursor filter must precede the
            # cut to stay exact)
            bool(
                isinstance(field, str)
                and search_after is None
                and (_is := manifest.get("mappings", {}).get("index_sort"))
                and _is[0] == field
                and (_is[1] == "desc") == (not ascending)
            ),
        )
    )
    partials = _shards_ds(parts, concurrency).map_batches(
        SortTopkStage,
        fn_constructor_args=(index_dir, plan_ref, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid_, g in bucket.groupby("plan_id", sort=False):
            ids = g["doc_id"].to_numpy()
            vals = g["sort_val"].to_numpy()
            order = np.lexsort((ids, vals if ascending else -vals))[:k]
            top = pd.DataFrame(
                {
                    "rank": np.arange(1, 1 + order.size, dtype=np.int64),
                    "doc_id": ids[order],
                    "key": g["key"].to_numpy()[order],
                    "sort_val": vals[order],
                }
            )
            for qid in fanout.get(int(pid_), []):
                out.append(top.assign(query_id=np.int64(qid)))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "doc_id", "key", "sort_val"]
        ]

    return bucketed_group_agg(partials, ["plan_id"], merge_bucket)


def run_top_metrics(
    queries_ds,
    index_dir: str,
    sort_field: str,
    metric_fields: tuple,
    *,
    ascending: bool = False,
    n: int = 1,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """ES top_metrics aggregation: the ``metric_fields`` values of each
    query's top-``n`` match-set docs ranked by ``sort_field``.  Same
    SortTopkStage sweep as run_sorted with the metric columns gathered
    for the per-segment winners only — shuffle = plans x segments x n,
    the metric fetch never touches the match set.  Returns (query_id,
    rank, sort_val, <one column per metric field>); ties doc_id asc."""
    import ray

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    queries = queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    plan = _match_set_plans(queries)
    met_cols = list(metric_fields)
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "sort_val": pd.Series([], dtype=np.float64),
            **{m: pd.Series([], dtype=np.float64) for m in met_cols},
        }
    )
    if not plan:
        return empty
    plan_ref = ray.put(
        (plan, manifest.get("tombstones", {}), sort_field, ascending, int(n),
         None, tuple(metric_fields))
    )
    partials = (
        _shards_ds(parts, concurrency)
        .map_batches(
            SortTopkStage,
            fn_constructor_args=(index_dir, plan_ref, cfg),
            batch_format="pandas",
            batch_size=4,
            concurrency=concurrency,
        )
        .to_pandas()  # plans x segments x n rows — tiny by design
    )
    fanout = {q["plan_id"]: q["query_ids"] for q in plan}
    out = []
    if len(partials):
        for pid_, g in partials.groupby("plan_id", sort=True):
            ids = g["doc_id"].to_numpy()
            vals = g["sort_val"].to_numpy()
            order = np.lexsort((ids, vals if ascending else -vals))[: int(n)]
            top = pd.DataFrame(
                {
                    "rank": np.arange(1, 1 + order.size, dtype=np.int64),
                    "sort_val": vals[order],
                    **{
                        m: g[f"met_{i}"].to_numpy()[order]
                        for i, m in enumerate(met_cols)
                    },
                }
            )
            for qid in fanout.get(int(pid_), []):
                out.append(top.assign(query_id=np.int64(qid)))
    if not out:
        return empty
    return (
        pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "sort_val", *met_cols]
        ]
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "rank": np.int64})
    )


def run_pinned(
    queries_ds,
    index_dir: str,
    *,
    k: int = 10,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """ES pinned query: each query row's ``pinned`` column ("|"-separated
    external keys, promotion order) is surfaced above the organic BM25
    ranking.  Pinned hits take ranks 1..p with the ES-style constant
    descending scores (round6(1_000_000 - position)); organic hits follow
    with their BM25 scores, pinned keys excluded (ES dedup), until ``k``
    total.  Missing/deleted pinned keys are skipped.  Exact: the organic
    pass keeps k + max_pins per query, so the post-exclusion cut is
    always contained.  Two distributed passes (run_queries + one mget for
    pin resolution — the pin list is small by contract).  Returns
    (query_id, rank, doc_id, key, score)."""
    queries = (
        queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    ).copy()
    pins_of = {
        int(r.query_id): [p for p in str(r.pinned).split("|") if p]
        if getattr(r, "pinned", None) is not None
        and not (isinstance(r.pinned, float) and pd.isna(r.pinned))
        else []
        for r in queries.itertuples(index=False)
    }
    max_pins = max((len(v) for v in pins_of.values()), default=0)
    organic_q = queries.drop(columns=["pinned"], errors="ignore")
    organic_q["k"] = int(k) + max_pins
    organic = run_queries(organic_q, index_dir, cfg, concurrency).to_pandas()
    all_pins = sorted({p for v in pins_of.values() for p in v})
    live: dict[str, int] = {}
    if all_pins:
        got = run_mget(all_pins, index_dir, cfg, concurrency)
        for r in got.itertuples(index=False):
            if bool(r.found):
                live[r.key] = int(r.doc_id)
    rows = []
    for qid, pins in pins_of.items():
        pinned_live = [p for p in pins if p in live]
        excl = set(pinned_live)
        for pos, p in enumerate(pinned_live[: int(k)]):
            rows.append(
                (np.int64(qid), np.int64(pos + 1), np.int64(live[p]), p,
                 float(1_000_000 - pos))
            )
        rank = len(pinned_live[: int(k)])
        og = organic[organic["query_id"] == qid]
        for r in og.itertuples(index=False):
            if rank >= int(k):
                break
            if r.key in excl:
                continue
            rank += 1
            rows.append(
                (np.int64(qid), np.int64(rank), np.int64(r.doc_id), r.key,
                 float(r.score))
            )
    out = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "key", "score"])
    return (
        out.sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"query_id": np.int64, "rank": np.int64, "doc_id": np.int64})
    )


def run_more_like_this(
    keys,
    index_dir: str,
    *,
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    unlike: list | None = None,
) -> pd.DataFrame:
    """ES more_like_this (like=[ids]): fetch each source doc's stored
    _source (distributed mget), select its top tf-idf query terms
    (per-doc tf >= min_term_freq, global df >= min_doc_freq; weight =
    round6(tf * bm25_idf), top max_query_terms by weight desc, term asc
    — the ES interestingness selection with this engine's idf), then run
    the or-match BM25 query EXCLUDING the source doc (ES include=false).
    Exact: shards keep k+1 so the top-k-minus-source is always contained.
    query_id = position of the source key in ``keys``; sources that are
    missing or yield no eligible terms produce no rows.  Requires
    store_text=True at build time.  Returns
    (query_id, rank, doc_id, key, score).

    ``unlike`` (the ES negative-example option): keys whose docs define
    an exclusion vocabulary — the union of their analyzed terms is
    removed from every source's candidate set BEFORE the tf/df cuts
    (frozen simplification of ES's negative interestingness model,
    replayed by the SQL oracle)."""
    got = run_mget(list(keys), index_dir, cfg, concurrency, fetch=True)
    unlike_terms: set[str] = set()
    if unlike:
        neg = run_mget(list(unlike), index_dir, cfg, concurrency, fetch=True)
        for r in neg.itertuples(index=False):
            if r.found and r.text:
                unlike_terms.update(get_analyzer(r.lang).tokenize(r.text))
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    n_docs = int(manifest["n_docs"])
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "key": pd.Series([], dtype=object),
            "score": pd.Series([], dtype=np.float64),
        }
    )
    per_src: list[tuple | None] = []
    term_pool: set[str] = set()
    for r in got.itertuples(index=False):
        if not r.found or not r.text:
            per_src.append(None)
            continue
        toks = get_analyzer(r.lang).tokenize(r.text)
        if not toks:
            per_src.append(None)
            continue
        terms, tf = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        keep = tf >= min_term_freq
        if unlike_terms:
            keep &= np.array(
                [t not in unlike_terms for t in terms], dtype=bool
            )
        per_src.append((r.key, r.lang, terms[keep], tf[keep].astype(np.int64)))
        term_pool.update(terms[keep].tolist())
    all_terms = sorted(term_pool)
    gdf = _collect_global_stats(index_dir, parts, all_terms)
    df_map = dict(zip(all_terms, gdf))
    qrows, src_by_qid = [], {}
    for qid, src in enumerate(per_src):
        if src is None:
            continue
        key_, lang_, terms, tf = src
        dfv = np.array([df_map.get(t, 0) for t in terms], dtype=np.int64)
        m = dfv >= min_doc_freq
        if not m.any():
            continue
        terms, tf = terms[m], tf[m]
        w = np.floor(tf * np.asarray(bm25_idf(dfv[m], n_docs)) * 1e6 + 0.5) / 1e6
        order = np.lexsort((terms, -w))[:max_query_terms]
        qrows.append(
            {
                "query_id": qid,
                "text": " ".join(sorted(terms[order].tolist())),
                "lang": lang_,
                "k": k + 1,  # headroom for dropping the source doc
            }
        )
        src_by_qid[qid] = key_
    if not qrows:
        return empty
    res = run_queries(pd.DataFrame(qrows), index_dir, cfg, concurrency).to_pandas()
    out = []
    for qid, g in res.groupby("query_id", sort=True):
        g = g.sort_values("rank", kind="mergesort")
        g = g[g["key"] != src_by_qid[int(qid)]].head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        out.append(g[["query_id", "rank", "doc_id", "key", "score"]])
    if not out:
        return empty
    return pd.concat(out, ignore_index=True).astype(
        {"query_id": np.int64, "rank": np.int64, "doc_id": np.int64}
    )


def run_mtermvectors(
    keys: list[str],
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES _mtermvectors: batch termvectors — one routed
    _mget fetches each key's stored _source (the ES realtime path), the
    driver re-analyzes, and global dfs come from ONE dictionary-only
    stats pass over the union of the docs' terms (no postings decoded).
    Missing/deleted keys contribute no rows (the ES found=false entry).
    Requires a store_text build.  Returns (key, term, tf, df, first_pos)
    sorted (key, term)."""
    empty = pd.DataFrame(
        {
            "key": pd.Series([], dtype=object),
            "term": pd.Series([], dtype=object),
            "tf": pd.Series([], dtype=np.int64),
            "df": pd.Series([], dtype=np.int64),
            "first_pos": pd.Series([], dtype=np.int64),
        }
    )
    got = run_mget(list(keys), index_dir, cfg, concurrency, fetch=True)
    got = got[got["found"]]
    per_doc = []
    all_terms: set[str] = set()
    for key, text, lang_d in zip(got["key"], got["text"], got["lang"]):
        toks = get_analyzer(lang_d).tokenize(text or "")
        if not toks:
            continue
        arr = np.asarray(toks, dtype=object)
        terms, first_idx, tf = np.unique(arr, return_index=True, return_counts=True)
        per_doc.append((key, terms, first_idx, tf))
        all_terms.update(terms)
    if not per_doc:
        return empty
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    terms_sorted = sorted(all_terms)
    df_map = dict(
        zip(terms_sorted, _collect_global_stats(index_dir, parts, terms_sorted))
    )
    rows = [
        pd.DataFrame(
            {
                "key": key,
                "term": terms,
                "tf": tf.astype(np.int64),
                "df": np.array([int(df_map[t]) for t in terms], dtype=np.int64),
                "first_pos": first_idx.astype(np.int64),
            }
        )
        for key, terms, first_idx, tf in per_doc
    ]
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["key", "term"], kind="mergesort")
        .reset_index(drop=True)
    )


def run_mget(
    keys: list[str],
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    fetch: bool = False,
    fetch_fields: list[str] | None = None,
) -> pd.DataFrame:
    """Distributed ES _mget: point lookups via per-segment key-hash
    binary search.  Only segments whose manifest covers a wanted key's
    routing partition are scheduled; each emits O(|keys|) candidate rows;
    the driver keeps the newest live version per key (result size is
    bounded by |keys| by construction).  ``fetch_fields`` adds mapped
    keyword/numeric docstore columns per hit (the ES _mget
    ``_source``-includes / docvalue fields form); missing keys get None."""
    import ray

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    ff = list(fetch_fields or ())
    want = np.asarray(list(keys), dtype=object)
    manifest = read_manifest(index_dir)
    P = int(manifest.get("num_partitions", 1))
    want_parts = set(int(p) for p in route_partition(want, P)) if want.size else set()
    touched = []
    for sid_str, pm in manifest["part_manifests"].items():
        covered = (
            set(int(x) for x in pm["partitions"])
            if "partitions" in pm
            else {int(pm.get("partition", int(sid_str)))}
        )
        if covered & want_parts:
            touched.append(int(sid_str))
    cols = ["key", "doc_id", "lang", "found"] + (["text"] if fetch else []) + ff
    if not touched or want.size == 0:
        base = pd.DataFrame(
            {"key": want, "doc_id": np.int64(-1), "lang": None, "found": False}
        )
        if fetch:
            base["text"] = None
        for f in ff:
            base[f] = None
        return base[cols].astype({"doc_id": np.int64, "found": bool})
    plan_ref = ray.put((want, manifest.get("tombstones", {}), fetch, tuple(ff)))
    cand = (
        _shards_ds(sorted(touched), concurrency)
        .map_batches(
            MgetStage,
            fn_constructor_args=(index_dir, plan_ref, cfg),
            batch_format="pandas",
            batch_size=4,
            concurrency=concurrency,
        )
        .to_pandas()  # O(|keys|) rows by construction — never O(n_docs)
    )
    best: dict[str, tuple[int, dict]] = {}
    for r in cand.itertuples(index=False):
        prev = best.get(r.key)
        if prev is None or int(r.doc_id) > prev[0]:
            extra = {f: getattr(r, f, None) for f in ff}
            best[r.key] = (
                int(r.doc_id),
                {"lang": r.lang, "text": getattr(r, "text", None), **extra},
            )
    rows = []
    for k_ in keys:
        b_ = best.get(k_)
        rows.append(
            {
                "key": k_,
                "doc_id": b_[0] if b_ else -1,
                "lang": b_[1]["lang"] if b_ else None,
                "found": b_ is not None,
                "text": b_[1]["text"] if b_ else None,
                **{f: (b_[1][f] if b_ else None) for f in ff},
            }
        )
    out = pd.DataFrame(rows)
    return out[cols].astype({"doc_id": np.int64, "found": bool})


class ExplainStage(_SegmentCacheStage):
    """Segment-parallel ES _explain collection: the broadcast side is
    the requested (query_id, doc_id) pairs grouped by term; each segment
    emits (query_id, doc_id, term, tf, dl) rows for the requested docs
    whose postings it holds.  A live doc's postings exist in exactly one
    non-tombstoned segment, so the union over shards is the complete
    per-term breakdown; output is O(|requests| x |terms|), never
    O(n_docs)."""

    def _init_payload(self, payload) -> None:
        # term -> (doc_ids np.int64 array, query_ids np.int64 array)
        self.by_term, self.tomb_map = payload

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        q_out, d_out, t_out, tf_out, dl_out = [], [], [], [], []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(pid)
            for term, (want, qids) in self.by_term.items():
                ti = seg.lookup(term)
                if ti < 0:
                    continue
                ids, tfs, dl = seg.postings_with_dl(ti)
                pos = np.searchsorted(ids, want)
                pos_c = np.minimum(pos, ids.size - 1)
                hit = ids[pos_c] == want
                if seg.tombstones is not None and seg.tombstones.size:
                    tp = np.minimum(
                        np.searchsorted(seg.tombstones, want),
                        seg.tombstones.size - 1,
                    )
                    hit &= seg.tombstones[tp] != want
                if not hit.any():
                    continue
                q_out.append(qids[hit])
                d_out.append(want[hit])
                t_out.extend([term] * int(hit.sum()))
                tf_out.append(tfs[pos_c[hit]])
                dl_out.append(dl[pos_c[hit]])
        if not q_out:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int64),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "term": pd.Series([], dtype=object),
                    "tf": pd.Series([], dtype=np.int64),
                    "dl": pd.Series([], dtype=np.float64),
                }
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(q_out).astype(np.int64),
                "doc_id": np.concatenate(d_out).astype(np.int64),
                "term": np.asarray(t_out, dtype=object),
                "tf": np.concatenate(tf_out).astype(np.int64),
                "dl": np.concatenate(dl_out).astype(np.float64),
            }
        )


def run_validate(
    queries_ds, index_dir, cfg: EngineConfig = DEFAULT
) -> pd.DataFrame:
    """ES _validate/query: per query row, whether the engine accepts it
    (syntax + whitelist + shape checks), with the error message for
    invalid ones.  Invalid rows fail AT PLAN TIME (before any stage
    launches); valid rows cost one minimal k=1 probe — slightly stronger
    than the ES contract, which only parses.  Each row is probed in
    isolation so one bad query can't mask the others.  Returns
    (query_id, valid, error)."""
    queries = (
        queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    )
    rows = []
    for i in range(len(queries)):
        row = queries.iloc[[i]]
        qid = int(row["query_id"].iloc[0])
        try:
            # k=0-style cheap probe: reuse the full planner by running
            # the plan-building prefix of run_queries via a 1-row call
            # with size 1; planning errors raise before any stage runs
            run_queries(row.assign(k=np.int32(1)), index_dir, cfg, concurrency=1)
            rows.append((qid, True, ""))
        except (ValueError, KeyError, TypeError) as exc:
            rows.append((qid, False, str(exc)))
    return pd.DataFrame(rows, columns=["query_id", "valid", "error"]).astype(
        {"query_id": np.int64, "valid": bool}
    )


def run_explain(
    pairs: pd.DataFrame,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Distributed ES _explain (GET /<index>/_explain/<id>): the BM25
    score breakdown of each requested (query_id, doc_id, text) pair.
    Phase 1 collects global df for the query terms (dictionary-only DFS
    pass, like run_queries); the segment sweep emits tf/dl per matched
    term; the driver computes contribution = round6(idf * tf_part) with
    the SAME float64 arithmetic as score_segment, so summing the raw
    contributions per pair reproduces the hit's round6'd score.
    Returns (query_id, doc_id, term, df, tf, contribution) sorted; terms
    the doc does not contain are omitted (ES explain lists matched
    sub-scorers only)."""
    import ray

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    n_docs = int(manifest["n_docs"])
    avgdl = float(manifest["avgdl"]) or 1.0
    k1 = float(manifest.get("k1", cfg.k1))
    b = float(manifest.get("b", cfg.b))

    terms_of: list[tuple[int, int, list[str]]] = []
    terms_set: set[str] = set()
    for row in pairs.itertuples(index=False):
        an = get_analyzer(getattr(row, "lang", None))
        toks = sorted(set(an.tokenize(row.text)))
        terms_of.append((int(row.query_id), int(row.doc_id), toks))
        terms_set.update(toks)
    all_terms = sorted(terms_set)
    gdf = _collect_global_stats(index_dir, parts, all_terms)
    df_map = dict(zip(all_terms, gdf))

    by_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    acc: dict[str, tuple[list, list]] = {}
    for qid, did, toks in terms_of:
        for t in toks:
            if df_map.get(t, 0) <= 0:
                continue  # absent terms can never match (no explain row)
            docs, qids = acc.setdefault(t, ([], []))
            docs.append(did)
            qids.append(qid)
    for t, (docs, qids) in acc.items():
        by_term[t] = (
            np.asarray(docs, dtype=np.int64),
            np.asarray(qids, dtype=np.int64),
        )
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "term": pd.Series([], dtype=object),
            "df": pd.Series([], dtype=np.int64),
            "tf": pd.Series([], dtype=np.int64),
            "contribution": pd.Series([], dtype=np.float64),
        }
    )
    if not by_term:
        return empty
    plan_ref = ray.put((by_term, manifest.get("tombstones", {})))
    hits = (
        _shards_ds(parts, concurrency)
        .map_batches(
            ExplainStage,
            fn_constructor_args=(index_dir, plan_ref, cfg),
            batch_format="pandas",
            batch_size=4,
            concurrency=concurrency,
        )
        .to_pandas()  # O(|pairs| x |terms|) rows by construction
    )
    if not len(hits):
        return empty
    dfv = hits["term"].map(df_map).to_numpy(np.int64)
    idf = np.asarray(bm25_idf(dfv, n_docs), dtype=np.float64)
    tf_part = bm25_tf_part(
        hits["tf"].to_numpy(np.float64), hits["dl"].to_numpy(np.float64),
        avgdl, k1, b,
    )
    out = pd.DataFrame(
        {
            "query_id": hits["query_id"].to_numpy(np.int64),
            "doc_id": hits["doc_id"].to_numpy(np.int64),
            "term": hits["term"],
            "df": dfv,
            "tf": hits["tf"].to_numpy(np.int64),
            "contribution": round6(idf * tf_part),
        }
    )
    return (
        out.sort_values(["query_id", "doc_id", "term"], kind="mergesort")
        .reset_index(drop=True)
    )


def run_scroll(
    queries,
    index_dir,
    page_size: int = 100,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    max_pages: int = 10_000,
):
    """ES scroll / deep pagination: EVERY match of each query, fetched
    in (score desc, doc_id asc) order as repeated distributed
    ``run_queries`` passes, each resuming from the previous page's last
    (score, doc_id) search_after cursor — the ES-recommended deep
    pagination (scroll contexts are deprecated in favour of
    search_after + PIT; segments here are immutable, so the snapshot is
    consistent like a scroll context by construction).  Queries drop
    out of the broadcast plan as they exhaust, so late pages fan out
    only the still-live plans.  Returns (query_id, rank, doc_id, key,
    score) with a GLOBAL rank."""
    live = (
        queries.to_pandas() if hasattr(queries, "to_pandas") else queries
    ).copy().reset_index(drop=True)
    live["k"] = np.int32(page_size)
    live = live.drop(columns=["after_score", "after_doc"], errors="ignore")
    base_rank = {int(q): 0 for q in live["query_id"]}
    pages: list[pd.DataFrame] = []
    for _ in range(max_pages):
        if not len(live):
            break
        out = run_queries(live, index_dir, cfg, concurrency).to_pandas()
        if not len(out):
            break
        out = out.copy()
        out["rank"] = (
            out["rank"].to_numpy(np.int64)
            + out["query_id"].map(base_rank).to_numpy(np.int64)
        )
        pages.append(out)
        page_n = out.groupby("query_id").size()
        cont = page_n[page_n >= page_size].index
        live = live[live["query_id"].isin(cont)].reset_index(drop=True)
        if not len(live):
            break
        last = out.loc[out.groupby("query_id")["rank"].idxmax()].set_index(
            "query_id"
        )
        live["after_score"] = live["query_id"].map(last["score"])
        live["after_doc"] = live["query_id"].map(last["doc_id"]).astype(np.int64)
        for qid in cont:
            base_rank[int(qid)] = int(last.loc[qid, "rank"])
    if not pages:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
        )
    return (
        pd.concat(pages, ignore_index=True)
        .sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
    )


def run_sliced_scroll(
    queries,
    index_dir,
    slice_max: int,
    page_size: int = 100,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
):
    """ES sliced scroll (``slice: {id, max}`` on ``/_search?scroll``):
    the match set is partitioned into ``slice_max`` disjoint slices by a
    hash of the doc id and each slice is ranked independently — ES uses
    this so N clients can export a big result set in parallel.  Here the
    scroll itself is already distributed, so the Ray-right shape is ONE
    distributed scan partitioned afterwards (N slices = one scroll, not
    ``max`` repeated scrolls over the same postings).  Slice membership
    uses the repo-wide oracle hash contract (shared with
    pipelines/sampling and SimHash): ``int.from_bytes(md5(str(doc_id))
    [8:16], 'little') % max`` == DuckDB ``md5_number_lower(doc_id::
    VARCHAR) % max`` — reproducible across runs, cluster sizes and
    partitionings.  Returns (query_id, slice_id, rank, doc_id, key,
    score) with rank LOCAL to the (query, slice)."""
    import hashlib

    out = run_scroll(queries, index_dir, page_size, cfg, concurrency)
    if not len(out):
        out = out.copy()
        out["slice_id"] = pd.Series([], dtype=np.int64)
        return out
    out = out.copy()
    out["slice_id"] = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(int(d)).encode()).digest()[8:16], "little")
            % slice_max
            for d in out["doc_id"]
        ),
        dtype=np.int64,
        count=len(out),
    )
    # global rank is already (score desc, doc_id asc) per query; the
    # slice-local rank is its order restricted to the slice
    out = out.sort_values(["query_id", "rank"], kind="mergesort")
    out["rank"] = out.groupby(["query_id", "slice_id"], sort=False).cumcount() + 1
    cols = ["query_id", "slice_id", "rank", "doc_id", "key", "score"]
    return out[cols].sort_values(["query_id", "slice_id", "rank"]).reset_index(
        drop=True
    )
