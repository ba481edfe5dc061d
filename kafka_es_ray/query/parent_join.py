"""ES parent-child joins (`join` field type + `has_child` /
`has_parent` queries): parents and children live in the SAME index and
the child's routing is its parent id, so every family is co-located on
one shard — ES evaluates the join shard-locally, never across shards.

This engine keeps exactly that contract: build the union corpus with
``routing_col=<parent key>`` plus two keyword fields — a join-name
discriminator and the child's ``parent_key`` — and both queries run as
ONE segment-parallel sweep with NO exchange: each segment filters its
own children, counts per parent (or filters its parents and selects
their children), and emits final rows.  At 100 TB the shuffle cost of
this "join" is zero by construction; the partitioning assumption
(routing = parent key at build time) is the documented requirement,
same as ES.

Filters use the engine's standard per-query shapes: ``{"kw": [(field,
value-or-tuple), ...], "range": [(field, lo, hi), ...]}`` over mapped
keyword/numeric docstore columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kafka_es_ray.config import DEFAULT, EngineConfig
from kafka_es_ray.index.segment import postings_path, read_manifest
from kafka_es_ray.query.bm25 import bm25_idf, round6
from kafka_es_ray.query.engine import _SegmentCacheStage, score_segment
from kafka_es_ray.runtime import query_pool


def _live_ids(seg) -> np.ndarray:
    ids = seg.doc_ids_store
    if seg.tombstones is not None and seg.tombstones.size and ids.size:
        pos = np.minimum(
            np.searchsorted(seg.tombstones, ids), seg.tombstones.size - 1
        )
        ids = ids[seg.tombstones[pos] != ids]
    return ids


def _apply_filter(seg, ids: np.ndarray, filt: dict) -> np.ndarray:
    keep = np.ones(ids.size, dtype=bool)
    for fld, val in filt.get("kw", ()):
        got = seg.field_for(fld, ids)
        keep &= got == val if isinstance(val, str) else np.isin(got, list(val))
    for fld, lo, hi in filt.get("range", ()):
        v = seg.nums_for(fld, ids)
        keep &= ~np.isnan(v)
        if lo is not None:
            keep &= v >= lo
        if hi is not None:
            keep &= v <= hi
    return ids[keep]


class ParentJoinStage(_SegmentCacheStage):
    """One shard-local pass per segment; emits FINAL result rows (the
    co-location contract means no cross-segment merge exists)."""

    def _init_payload(self, payload) -> None:
        (
            self.tomb_map,
            self.mode,
            self.join_field,
            self.parent_key_field,
            self.parent_type,
            self.child_type,
            self.filt,
            self.min_children,
            *rest,
        ) = payload
        self.agg_field = rest[0] if rest else None
        self.inner_n = (
            int(rest[1]) if len(rest) > 1 and rest[1] is not None else 3
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(int(pid))
            ids = _live_ids(seg)
            if not ids.size:
                continue
            jn = seg.field_for(self.join_field, ids)
            child_ids = ids[jn == self.child_type]
            parent_ids = ids[jn == self.parent_type]
            if self.mode == "has_child":
                hit_children = _apply_filter(seg, child_ids, self.filt)
                if not hit_children.size:
                    continue
                pk = seg.field_for(self.parent_key_field, hit_children)
                uniq, counts = np.unique(pk, return_counts=True)
                keep_u = counts >= self.min_children
                uniq, counts = uniq[keep_u], counts[keep_u]
                if not uniq.size:
                    continue
                pkeys = seg.keys_for(parent_ids)
                # vectorized membership + count gather: uniq is sorted
                # (np.unique), so searchsorted doubles as the lookup
                pos = np.searchsorted(uniq, pkeys)
                pos_c = np.minimum(pos, uniq.size - 1)
                mask = uniq[pos_c] == pkeys
                out.append(
                    pd.DataFrame(
                        {
                            "key": pkeys[mask],
                            "n_children": counts[pos_c[mask]].astype(np.int64),
                        }
                    )
                )
            elif self.mode == "children_terms":
                # ES `children` aggregation with a terms sub-agg: per
                # segment, bucket-count a child keyword field over the
                # children of filter-matched parents; emits (value, n)
                # PARTIALS — the driver merge is |distinct values| rows
                hit_parents = _apply_filter(seg, parent_ids, self.filt)
                if not hit_parents.size or not child_ids.size:
                    continue
                pset = np.unique(seg.keys_for(hit_parents))
                pk = seg.field_for(self.parent_key_field, child_ids)
                pos = np.minimum(np.searchsorted(pset, pk), pset.size - 1)
                mask = pset[pos] == pk
                if not mask.any():
                    continue
                vals = seg.field_for(self.agg_field, child_ids[mask])
                uniq, counts = np.unique(vals, return_counts=True)
                out.append(
                    pd.DataFrame(
                        {"value": uniq, "n": counts.astype(np.int64)}
                    )
                )
            elif self.mode == "has_child_inner":
                # ES has_child with inner_hits: each matched parent plus
                # its first inner_n matching children (child key asc —
                # filter context has no scores, so key order is the
                # deterministic ES tie rule here); shard-local like
                # has_child (co-location contract)
                hit_children = _apply_filter(seg, child_ids, self.filt)
                if not hit_children.size:
                    continue
                pk = seg.field_for(self.parent_key_field, hit_children)
                ck = seg.keys_for(hit_children)
                order = np.lexsort((ck, pk))
                pk_s, ck_s = pk[order], ck[order]
                first = np.ones(pk_s.size, dtype=bool)
                first[1:] = pk_s[1:] != pk_s[:-1]
                starts = np.flatnonzero(first)
                run_id = np.cumsum(first) - 1
                pos = np.arange(pk_s.size) - starts[run_id]
                keep = pos < self.inner_n
                out.append(
                    pd.DataFrame(
                        {
                            "key": pk_s[keep],
                            "child_key": ck_s[keep],
                            "inner_rank": (pos[keep] + 1).astype(np.int64),
                        }
                    )
                )
            elif self.mode == "parent_terms":
                # ES `parent` aggregation with a terms sub-agg: bucket a
                # PARENT keyword field over parents having >= 1 child
                # matching the filter (each parent counted once); emits
                # (value, n) partials like children_terms
                hit_children = _apply_filter(seg, child_ids, self.filt)
                if not hit_children.size or not parent_ids.size:
                    continue
                pset = np.unique(
                    seg.field_for(self.parent_key_field, hit_children)
                )
                pkeys = seg.keys_for(parent_ids)
                pos = np.minimum(np.searchsorted(pset, pkeys), pset.size - 1)
                mask = pset[pos] == pkeys
                if not mask.any():
                    continue
                vals = seg.field_for(self.agg_field, parent_ids[mask])
                uniq, counts = np.unique(vals, return_counts=True)
                out.append(
                    pd.DataFrame(
                        {"value": uniq, "n": counts.astype(np.int64)}
                    )
                )
            else:  # has_parent: children whose parent matches the filter
                hit_parents = _apply_filter(seg, parent_ids, self.filt)
                if not hit_parents.size or not child_ids.size:
                    continue
                pset = np.unique(seg.keys_for(hit_parents))
                pk = seg.field_for(self.parent_key_field, child_ids)
                pos = np.minimum(np.searchsorted(pset, pk), pset.size - 1)
                mask = pset[pos] == pk
                if not mask.any():
                    continue
                out.append(
                    pd.DataFrame(
                        {
                            "key": seg.keys_for(child_ids[mask]),
                            "parent": pk[mask],
                        }
                    )
                )
        if not out:
            if self.mode == "has_child":
                cols = {"key": pd.Series([], dtype=object),
                        "n_children": pd.Series([], dtype=np.int64)}
            elif self.mode == "has_child_inner":
                cols = {"key": pd.Series([], dtype=object),
                        "child_key": pd.Series([], dtype=object),
                        "inner_rank": pd.Series([], dtype=np.int64)}
            elif self.mode in ("children_terms", "parent_terms"):
                cols = {"value": pd.Series([], dtype=object),
                        "n": pd.Series([], dtype=np.int64)}
            else:
                cols = {"key": pd.Series([], dtype=object),
                        "parent": pd.Series([], dtype=object)}
            return pd.DataFrame(cols)
        return pd.concat(out, ignore_index=True)


def _run(
    mode: str,
    index_dir: str,
    filt: dict,
    cfg: EngineConfig,
    concurrency: int | None,
    *,
    join_field: str = "join_name",
    parent_key_field: str = "parent_key",
    parent_type: str = "parent",
    child_type: str = "child",
    min_children: int = 1,
    agg_field: str | None = None,
    inner_n: int = 3,
):
    import ray
    import ray.data as rd

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    payload = ray.put(
        (
            manifest.get("tombstones", {}),
            mode,
            join_field,
            parent_key_field,
            parent_type,
            child_type,
            filt,
            int(min_children),
            agg_field,
            int(inner_n),
        )
    )
    shards = rd.from_pandas(pd.DataFrame({"part_id": parts})).repartition(
        max(1, min(len(parts), concurrency * 2))
    )
    return shards.map_batches(
        ParentJoinStage,
        fn_constructor_args=(index_dir, payload, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    )


def run_has_child(
    index_dir: str,
    child_filter: dict,
    min_children: int = 1,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    **kw,
):
    """ES has_child (filter context): parent docs with >= min_children
    children matching the filter.  Returns Dataset(key, n_children) —
    n_children is the matched-children count (the ES inner-hits total).
    Requires the build-time co-location contract (module header)."""
    return _run(
        "has_child", index_dir, child_filter, cfg, concurrency,
        min_children=min_children, **kw,
    )


def run_has_parent(
    index_dir: str,
    parent_filter: dict,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    **kw,
):
    """ES has_parent (filter context): child docs whose parent matches
    the filter.  Returns Dataset(key, parent)."""
    return _run("has_parent", index_dir, parent_filter, cfg, concurrency, **kw)


def run_children_terms_agg(
    index_dir: str,
    parent_filter: dict,
    child_field: str,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    **kw,
):
    """ES `children` aggregation with a terms sub-agg: bucket-count
    ``child_field`` over the children of filter-matched parents.  One
    shard-local sweep emitting (value, n) partials — the exchange is
    |segments x distinct values|, never child rows.  Returns a pandas
    DataFrame (value, n) sorted (n desc, value asc), the ES terms-agg
    order."""
    ds = _run(
        "children_terms", index_dir, parent_filter, cfg, concurrency,
        agg_field=child_field, **kw,
    )
    return _terms_merge(ds)


def run_has_child_inner_hits(
    index_dir: str,
    child_filter: dict,
    n_hits: int = 3,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    **kw,
):
    """ES has_child with inner_hits: each parent having >= 1 matching
    child, paired with its first ``n_hits`` matching children (child key
    asc — the deterministic order in filter context).  Shard-local (the
    co-location contract).  Returns Dataset(key, child_key,
    inner_rank)."""
    return _run(
        "has_child_inner", index_dir, child_filter, cfg, concurrency,
        inner_n=n_hits, **kw,
    )


def run_parent_terms_agg(
    index_dir: str,
    child_filter: dict,
    parent_field: str,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    **kw,
):
    """ES `parent` aggregation with a terms sub-agg: bucket-count
    ``parent_field`` over the parents having >= 1 child matching the
    filter (the child→parent join direction; each parent counted once,
    the ES parent-agg doc_count rule).  Shard-local (value, n) partials
    like run_children_terms_agg.  Returns (value, n) sorted (n desc,
    value asc)."""
    ds = _run(
        "parent_terms", index_dir, child_filter, cfg, concurrency,
        agg_field=parent_field, **kw,
    )
    return _terms_merge(ds)


class NestedTopkStage(_SegmentCacheStage):
    """ES `nested` query (Lucene block join): nested objects are indexed
    as separate co-located docs (here: rows with routing = root key —
    the physical analog of Lucene's parent-block adjacency), the inner
    query BM25-scores the nested docs, and each root's score is
    score_mode(matching children).  Because a root's nested docs all
    live in ONE segment (the co-location contract), per-root combined
    scores are FINAL shard-locally: each segment emits its own top-k
    roots (+ their inner hits) and the driver merge sees only
    segments x k rows — never the match set.  Reference semantics:
    ES nested query / inner_hits (score_mode avg|sum|max|min|none)."""

    def _init_payload(self, payload) -> None:
        (
            self.tomb_map,
            self.terms,
            self.idf,
            self.avgdl,
            self.k1,
            self.b,
            self.score_mode,
            self.k,
            self.filt,
            self.inner_n,
            self.join_field,
            self.parent_key_field,
            self.child_type,
        ) = payload

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pid in batch["part_id"].astype(int):
            seg = self._segment(int(pid))
            ids, scores = score_segment(
                seg, self.terms, self.idf, self.avgdl, self.k1, self.b,
                theta=None,
            )
            if not ids.size:
                continue
            # the nested query matches nested docs only (roots carrying
            # the same terms in their own fields are never inner hits)
            jn = seg.field_for(self.join_field, ids)
            keep = jn == self.child_type
            ids, scores = ids[keep], scores[keep]
            if self.filt and ids.size:
                keep = np.ones(ids.size, dtype=bool)
                for fld, val in self.filt.get("kw", ()):
                    got = seg.field_for(fld, ids)
                    keep &= (
                        got == val
                        if isinstance(val, str)
                        else np.isin(got, list(val))
                    )
                for fld, lo, hi in self.filt.get("range", ()):
                    v = seg.nums_for(fld, ids)
                    keep &= ~np.isnan(v)
                    if lo is not None:
                        keep &= v >= lo
                    if hi is not None:
                        keep &= v <= hi
                ids, scores = ids[keep], scores[keep]
            if not ids.size:
                continue
            pk = seg.field_for(self.parent_key_field, ids)
            ck = seg.keys_for(ids)
            # combine per root in ascending (root, child doc_id) order —
            # the deterministic accumulation contract
            order = np.lexsort((ids, pk))
            pk_s, ck_s, sc_s = pk[order], ck[order], scores[order]
            first = np.ones(pk_s.size, dtype=bool)
            first[1:] = pk_s[1:] != pk_s[:-1]
            starts = np.flatnonzero(first)
            counts = np.diff(np.append(starts, pk_s.size))
            if self.score_mode == "sum":
                comb = np.add.reduceat(sc_s, starts)
            elif self.score_mode == "max":
                comb = np.maximum.reduceat(sc_s, starts)
            elif self.score_mode == "min":
                comb = np.minimum.reduceat(sc_s, starts)
            elif self.score_mode == "avg":
                comb = np.add.reduceat(sc_s, starts) / counts
            elif self.score_mode == "none":
                comb = np.zeros(starts.size, dtype=np.float64)
            else:
                raise ValueError(f"nested score_mode: {self.score_mode!r}")
            comb = round6(comb)
            roots = pk_s[starts]
            # segment-local top-k roots (score desc, key asc) — final
            # per-root scores, so the global cut only merges partials
            cut = np.lexsort((roots, -comb))[: self.k]
            top_roots = roots[cut]
            run_id = np.cumsum(first) - 1
            root_rank = {r: i for i, r in enumerate(top_roots)}
            member = np.isin(pk_s, top_roots)
            # inner hits: per kept root, top inner_n children by
            # (child score desc, child key asc), round6 before ranking
            ch_sc = round6(sc_s[member])
            ch_key = ck_s[member]
            ch_root = pk_s[member]
            o2 = np.lexsort((ch_key, -ch_sc, ch_root))
            r_s, k_s, s_s = ch_root[o2], ch_key[o2], ch_sc[o2]
            f2 = np.ones(r_s.size, dtype=bool)
            f2[1:] = r_s[1:] != r_s[:-1]
            st2 = np.flatnonzero(f2)
            rid2 = np.cumsum(f2) - 1
            pos2 = np.arange(r_s.size) - st2[rid2]
            keep2 = pos2 < self.inner_n
            comb_by_root = dict(zip(roots[cut], comb[cut]))
            n_by_root = dict(zip(roots, counts))
            out.append(
                pd.DataFrame(
                    {
                        "key": r_s[keep2],
                        "score": [comb_by_root[r] for r in r_s[keep2]],
                        "n_matched": [
                            int(n_by_root[r]) for r in r_s[keep2]
                        ],
                        "child_key": k_s[keep2],
                        "child_score": s_s[keep2],
                        "inner_rank": (pos2[keep2] + 1).astype(np.int64),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "key": pd.Series([], dtype=object),
                    "score": pd.Series([], dtype=np.float64),
                    "n_matched": pd.Series([], dtype=np.int64),
                    "child_key": pd.Series([], dtype=object),
                    "child_score": pd.Series([], dtype=np.float64),
                    "inner_rank": pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(out, ignore_index=True)


def _shard_term_df(index_dir: str, pid: int, terms: list[str]) -> np.ndarray:
    """Dictionary-only global-df partial for one segment: binary search
    each query term in the sorted term column (postings never read)."""
    import pyarrow.parquet as pq

    t = pq.read_table(postings_path(index_dir, pid), columns=["term", "df"])
    tarr = t.column("term").to_pandas().to_numpy()
    dfarr = t.column("df").to_numpy()
    out = np.zeros(len(terms), dtype=np.int64)
    for i, term in enumerate(terms):
        j = int(np.searchsorted(tarr, term))
        if j < tarr.size and tarr[j] == term:
            out[i] = int(dfarr[j])
    return out


def run_nested(
    index_dir: str,
    text: str,
    score_mode: str = "avg",
    k: int = 10,
    inner_n: int = 3,
    child_filter: dict | None = None,
    cfg: EngineConfig = DEFAULT,
    concurrency: int | None = None,
    *,
    join_field: str = "join_name",
    parent_key_field: str = "parent_key",
    child_type: str = "child",
) -> pd.DataFrame:
    """ES `nested` query with inner_hits: BM25-match the nested docs
    (rows with ``join_field == child_type``, co-located with their root
    by routing — the Lucene block-join layout), combine matching child
    scores per root with ``score_mode`` (avg|sum|max|min|none), rank
    roots (score desc, key asc) and return the global top-``k`` with up
    to ``inner_n`` inner hits each.

    Global stats follow the engine convention (N and avgdl over ALL live
    docs of the index — roots included; exact global df via one
    dictionary-only pass).  score_mode=none is ES filter-context nested:
    every matching root scores 0 and ranks by key asc.

    Returns DataFrame (rank, key, score, n_matched, inner_rank,
    child_key, child_score) — one row per inner hit of a top-k root."""
    import ray
    import ray.data as rd

    from kafka_es_ray.functions.tokenizer import get_analyzer

    concurrency = concurrency or cfg.query_concurrency or query_pool()
    manifest = read_manifest(index_dir)
    parts = [int(p) for p in manifest["parts"]]
    terms = sorted(set(get_analyzer(None).tokenize(text)))
    if not terms:
        return pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
                "n_matched": pd.Series([], dtype=np.int64),
                "inner_rank": pd.Series([], dtype=np.int64),
                "child_key": pd.Series([], dtype=object),
                "child_score": pd.Series([], dtype=np.float64),
            }
        )
    # exact global df: one dictionary-only partial per segment
    if len(parts) <= 4:
        partials = [_shard_term_df(index_dir, p, terms) for p in parts]
    else:
        dfjob = ray.remote(num_cpus=1)(_shard_term_df)
        partials = ray.get(
            [dfjob.remote(index_dir, p, terms) for p in parts]
        )
    df = np.sum(partials, axis=0)
    n_docs = int(manifest["n_docs"])
    idf = np.asarray(bm25_idf(df, n_docs), dtype=np.float64)
    avgdl = float(manifest["avgdl"]) or 1.0
    payload = ray.put(
        (
            manifest.get("tombstones", {}),
            terms,
            idf,
            avgdl,
            float(manifest.get("k1", cfg.k1)),
            float(manifest.get("b", cfg.b)),
            score_mode,
            int(k),
            child_filter or {},
            int(inner_n),
            join_field,
            parent_key_field,
            child_type,
        )
    )
    shards = rd.from_pandas(pd.DataFrame({"part_id": parts})).repartition(
        max(1, min(len(parts), concurrency * 2))
    )
    got = shards.map_batches(
        NestedTopkStage,
        fn_constructor_args=(index_dir, payload, cfg),
        batch_format="pandas",
        batch_size=4,
        concurrency=concurrency,
    ).to_pandas()
    if not len(got):
        return pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
                "n_matched": pd.Series([], dtype=np.int64),
                "inner_rank": pd.Series([], dtype=np.int64),
                "child_key": pd.Series([], dtype=object),
                "child_score": pd.Series([], dtype=np.float64),
            }
        )
    # global cut: segments x k partials, per-root rows are final
    heads = got.drop_duplicates("key")[["key", "score"]]
    heads = heads.sort_values(
        ["score", "key"], ascending=[False, True], kind="mergesort"
    ).head(int(k))
    heads = heads.assign(rank=np.arange(1, len(heads) + 1, dtype=np.int64))
    out = got.merge(heads[["key", "rank"]], on="key", how="inner")
    out = out.sort_values(["rank", "inner_rank"], kind="mergesort")
    return out[
        ["rank", "key", "score", "n_matched", "inner_rank", "child_key",
         "child_score"]
    ].reset_index(drop=True)


def _terms_merge(ds) -> pd.DataFrame:
    """Driver reduce of shard-local (value, n) terms partials: sum per
    value, ES terms order (n desc, value asc)."""
    df = ds.to_pandas()
    if not len(df):
        return pd.DataFrame(
            {"value": pd.Series([], dtype=object),
             "n": pd.Series([], dtype=np.int64)}
        )
    out = df.groupby("value", sort=False)["n"].sum().reset_index()
    return (
        out.sort_values(["n", "value"], ascending=[False, True])
        .reset_index(drop=True)
        .astype({"n": np.int64})
    )
