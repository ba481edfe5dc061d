"""Segment merge — the ES/Lucene segment-merge analog (SURVEY §2 E3:
"segment build + merge").

Because doc partitions own disjoint, ORDERED doc_id ranges
(doc_id = part_id * stride + rank), merging segments of parts p1 < p2 < ...
never interleaves postings: a merged term's posting list is the
concatenation of the parts' lists in part order, still sorted by doc_id.
Merge is therefore a linear pass — no re-sort, no re-encode of the delta
gaps except the single boundary gap between runs.

Runs as a Ray pipeline: one task per merge group (map_batches over the
group table), each writing one merged segment atomically.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_es_ray.config import DEFAULT, EngineConfig
from kafka_es_ray.functions.codec import varint_decode, varint_encode_with_offsets
from kafka_es_ray.index import segment as seg
from kafka_es_ray.index.build import _encode_positions_column, _large_binary_from_slices

# NOTE: no lazy kafka_es_ray imports inside functions that run on Ray
# workers — by-value pickling ships the function code, but a runtime
# import statement would still need the module importable on the worker.
from kafka_es_ray.index.segment import Segment, read_manifest, write_manifest


def merge_segment_group(index_dir: str, part_ids: list[int], out_part_id: int, cfg: EngineConfig) -> dict:
    """Merge several segments into one (driver- or task-side callable)."""
    assert out_part_id not in set(part_ids), "merged id must not collide with an input segment id"
    part_ids = sorted(part_ids)
    manifest = read_manifest(index_dir)
    segs = [
        Segment.load(index_dir, p, seg.manifest_tombstone_files(manifest, p))
        for p in part_ids
    ]
    # order by doc_id range, not segment id: delta segments carry ids inside
    # their partition's stride range, so range-order != creation order.
    # Ranges are disjoint by construction (partition strides + alloc bases).
    segs = sorted(
        (s for s in segs if s.n_docs > 0), key=lambda s: int(s.doc_ids_store[0])
    )

    def _alive_mask(s: Segment, ids: np.ndarray) -> np.ndarray:
        if s.tombstones is None or s.tombstones.size == 0 or ids.size == 0:
            return np.ones(ids.size, dtype=bool)
        pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
        return s.tombstones[pos] != ids

    # docstore: concat then order by doc_id.  Partition-level segments have
    # disjoint ascending ranges (linear concat would suffice), but MERGED
    # segments span partitions, so a later delta segment INTERLEAVES with
    # them (its partition's stride range sits inside the merged range) — a
    # second-generation merge therefore needs a real sort.  Merge PURGES
    # tombstoned docs — the ES semantic that makes deletes permanent.
    ds_alive = [_alive_mask(s, s.doc_ids_store) for s in segs]
    doc_ids = (
        np.concatenate([s.doc_ids_store[m] for s, m in zip(segs, ds_alive)])
        if segs
        else np.array([], dtype=np.int64)
    )
    ds_order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[ds_order]
    assert doc_ids.size == 0 or (np.diff(doc_ids) > 0).all(), "doc_ids must be globally unique"
    doc_len = np.concatenate([s.doc_len[m] for s, m in zip(segs, ds_alive)]).astype(np.int64)[ds_order]
    keys = np.concatenate([s.keys[m] for s, m in zip(segs, ds_alive)])[ds_order]
    key_hash = (
        np.concatenate([s.key_hash[m] for s, m in zip(segs, ds_alive)]).astype(np.uint64)[ds_order]
        if segs
        else np.array([], dtype=np.uint64)
    )
    langs = np.concatenate([s.langs[m] for s, m in zip(segs, ds_alive)])[ds_order]
    texts = None
    if all(s.texts is not None for s in segs):
        texts = np.concatenate([s.texts[m] for s, m in zip(segs, ds_alive)])[ds_order]
    # keyword columns present in EVERY input segment survive the merge
    kw_fields = sorted(set.intersection(*[set(s.kw_arr) for s in segs])) if segs else []
    kw_merged = {
        f: np.concatenate(
            [
                np.asarray(s.kw_arr[f].to_pylist(), dtype=object)[m]
                for s, m in zip(segs, ds_alive)
            ]
        )[ds_order]
        for f in kw_fields
    }
    # per-field length columns (multi-field index) survive the same way
    fl_fields = sorted(set.intersection(*[set(s.field_dl) for s in segs])) if segs else []
    fl_merged = {
        f: np.concatenate([s.field_dl[f][m] for s, m in zip(segs, ds_alive)]).astype(
            np.int64
        )[ds_order]
        for f in fl_fields
    }

    # union of dictionaries
    all_terms = np.unique(np.concatenate([s.terms for s in segs]))
    n_terms = all_terms.size
    dfs = np.zeros(n_terms, dtype=np.int64)
    want_pos = bool(segs) and all(s.positions_enc is not None for s in segs)
    p_ids_parts: list[np.ndarray] = []
    p_tfs_parts: list[np.ndarray] = []
    term_of_posting: list[np.ndarray] = []
    pos_parts: list[np.ndarray] = []
    for s in segs:
        pos = np.searchsorted(all_terms, s.terms)
        # decode the WHOLE segment in one vectorized pass (a per-term
        # decode loop measured ~10x slower): concatenated varint streams,
        # then per-run cumsum reset to recover absolute doc ids
        seg_df = s.df.astype(np.int64)
        run_starts = np.zeros(seg_df.size, dtype=np.int64)
        np.cumsum(seg_df[:-1], out=run_starts[1:])
        gaps = varint_decode(
            seg.binary_column_view(s.doc_ids_enc), int(seg_df.sum())
        ).astype(np.int64)
        tfs_all = varint_decode(
            seg.binary_column_view(s.tfs_enc), int(seg_df.sum())
        ).astype(np.int64)
        csum = np.cumsum(gaps)
        base = np.repeat(csum[run_starts] - gaps[run_starts], seg_df)
        ids_all = csum - base
        term_all = np.repeat(pos, seg_df)
        alive = _alive_mask(s, ids_all)
        if want_pos:
            # position runs follow their posting (tf positions per run)
            pg = varint_decode(
                seg.binary_column_view(s.positions_enc), int(tfs_all.sum())
            ).astype(np.int64)
            prun = np.zeros(tfs_all.size, dtype=np.int64)
            np.cumsum(tfs_all[:-1], out=prun[1:])
            pcs = np.cumsum(pg)
            pbase = np.repeat(pcs[prun] - pg[prun], tfs_all)
            pos_abs = pcs - pbase
            pos_parts.append(pos_abs[np.repeat(alive, tfs_all)])
        ids_all, tfs_all, term_all = ids_all[alive], tfs_all[alive], term_all[alive]
        if ids_all.size == 0:
            continue
        dfs += np.bincount(term_all, minlength=n_terms).astype(np.int64)
        p_ids_parts.append(ids_all)
        p_tfs_parts.append(tfs_all)
        term_of_posting.append(term_all)
    # terms whose postings were fully purged are dropped from the dictionary
    live_terms = dfs > 0
    if not live_terms.all():
        remap = np.cumsum(live_terms) - 1
        term_of_posting = [remap[t] for t in term_of_posting]
        all_terms = all_terms[live_terms]
        dfs = dfs[live_terms]
        n_terms = all_terms.size
    flat_pos = None
    if p_ids_parts:
        flat_ids = np.concatenate(p_ids_parts)
        flat_tfs = np.concatenate(p_tfs_parts)
        flat_term = np.concatenate(term_of_posting)
        # sort by (term, doc_id): input segments may interleave doc ranges
        # (merged segments span partitions; deltas sit inside them), so a
        # stable by-term sort is not enough on second-generation merges
        order = np.lexsort((flat_ids, flat_term))
        if want_pos:
            # permute position RUNS (ragged, tf-length) with their postings
            pflat = np.concatenate(pos_parts) if pos_parts else np.array([], dtype=np.int64)
            old_starts = np.zeros(flat_tfs.size, dtype=np.int64)
            np.cumsum(flat_tfs[:-1], out=old_starts[1:])
            new_lens = flat_tfs[order]
            new_starts = np.zeros(new_lens.size, dtype=np.int64)
            np.cumsum(new_lens[:-1], out=new_starts[1:])
            intra = np.arange(int(new_lens.sum()), dtype=np.int64) - np.repeat(new_starts, new_lens)
            flat_pos = pflat[np.repeat(old_starts[order], new_lens) + intra]
        flat_ids, flat_tfs, flat_term = flat_ids[order], flat_tfs[order], flat_term[order]
    else:
        flat_ids = np.array([], dtype=np.int64)
        flat_tfs = np.array([], dtype=np.int64)
        flat_term = np.array([], dtype=np.int64)
        if want_pos:
            flat_pos = np.array([], dtype=np.int64)

    n_postings = flat_ids.size
    term_starts = np.searchsorted(flat_term, np.arange(n_terms))
    term_ends = (
        np.concatenate([term_starts[1:], [n_postings]]) if n_terms else term_starts
    )
    gaps = flat_ids.copy()
    if n_postings:
        gaps[1:] -= flat_ids[:-1]
        gaps[term_starts] = flat_ids[term_starts]
    id_buf, id_off = varint_encode_with_offsets(gaps.astype(np.uint64))
    tf_buf, tf_off = varint_encode_with_offsets(flat_tfs.astype(np.uint64))

    B = cfg.block_size
    run_lens = term_ends - term_starts
    nb = (run_lens + B - 1) // B
    first_block = np.concatenate([[0], np.cumsum(nb)])
    binner = np.arange(int(first_block[-1]), dtype=np.int64) - np.repeat(first_block[:-1], nb)
    block_start = np.repeat(term_starts, nb) + binner * B
    block_end = np.minimum(block_start + B, np.repeat(term_ends, nb))
    if n_postings:
        if fl_fields:
            # multi-field: block-min-dl from each prefixed term's OWN field
            # (same rule as the build — keeps MaxScore bounds exact-safe)
            fmap = {f: i for i, f in enumerate(fl_fields)}
            f_of_term = np.fromiter(
                (fmap[t.split("\x1f", 1)[0]] for t in all_terms),
                dtype=np.int64,
                count=n_terms,
            )
            dl_stack = np.stack([fl_merged[f] for f in fl_fields])
            term_of_p = np.repeat(np.arange(n_terms, dtype=np.int64), run_lens)
            dl_at = dl_stack[f_of_term[term_of_p], np.searchsorted(doc_ids, flat_ids)]
        else:
            dl_at = doc_len[np.searchsorted(doc_ids, flat_ids)]
        bmax_tf = np.maximum.reduceat(flat_tfs, block_start).astype(np.uint32)
        bmin_dl = np.minimum.reduceat(dl_at, block_start).astype(np.uint32)
        blast = flat_ids[block_end - 1].astype(np.uint64)
        term_of_block = np.repeat(np.arange(n_terms, dtype=np.int64), nb)
        bid_off = (id_off[block_start] - id_off[term_starts[term_of_block]]).astype(np.uint32)
        btf_off = (tf_off[block_start] - tf_off[term_starts[term_of_block]]).astype(np.uint32)
    else:
        bmax_tf = np.array([], dtype=np.uint32)
        bmin_dl = np.array([], dtype=np.uint32)
        blast = np.array([], dtype=np.uint64)
        bid_off = np.array([], dtype=np.uint32)
        btf_off = np.array([], dtype=np.uint32)

    cols = {
        "term": pa.array(all_terms, type=pa.string()),
        "df": pa.array(dfs, type=pa.int64()),
        "doc_ids": _large_binary_from_slices(id_buf, id_off[np.concatenate([term_starts, [n_postings]])]),
        "tfs": _large_binary_from_slices(tf_buf, tf_off[np.concatenate([term_starts, [n_postings]])]),
        "block_max_tf": _large_binary_from_slices(bmax_tf.tobytes(), first_block * 4),
        "block_min_dl": _large_binary_from_slices(bmin_dl.tobytes(), first_block * 4),
        "block_last_doc": _large_binary_from_slices(blast.tobytes(), first_block * 8),
        "block_id_boff": _large_binary_from_slices(bid_off.tobytes(), first_block * 4),
        "block_tf_boff": _large_binary_from_slices(btf_off.tobytes(), first_block * 4),
    }
    if flat_pos is not None:
        cols["positions"] = _encode_positions_column(flat_pos, flat_tfs, term_starts, n_postings)
    postings_table = pa.table(cols)
    store_cols = {
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "key": pa.array(keys, type=pa.string()),
        "key_hash": pa.array(key_hash, type=pa.uint64()),
        "doc_len": pa.array(doc_len, type=pa.int32()),
        "lang": pa.array(langs, type=pa.string()),
    }
    if texts is not None:
        store_cols["text"] = pa.array(texts, type=pa.string())
    for f, vals in kw_merged.items():
        store_cols[f"kw_{f}"] = pa.array(vals, type=pa.string())
    for f, vals in fl_merged.items():
        store_cols[f"fl_{f}"] = pa.array(vals, type=pa.int32())
    docstore_table = pa.table(store_cols)
    seg.atomic_write_table(
        postings_table, seg.postings_path(index_dir, out_part_id),
        retries=cfg.write_retries, retry_delay_s=cfg.write_retry_delay_s,
    )
    seg.atomic_write_table(
        docstore_table, seg.docstore_path(index_dir, out_part_id),
        retries=cfg.write_retries, retry_delay_s=cfg.write_retry_delay_s,
    )
    covered: set[int] = set()
    for p in part_ids:
        pm = manifest["part_manifests"].get(str(p), {})
        if "partitions" in pm:
            covered.update(int(x) for x in pm["partitions"])
        else:
            covered.add(int(pm.get("partition", p)))
    manifest_out = {
        "part_id": out_part_id,
        "format_version": seg.FORMAT_VERSION,
        "merged_from": part_ids,
        # routing partitions whose docs this merged segment may hold —
        # lets the incremental path touch only covering segments instead
        # of every merged segment for every partition
        "partitions": sorted(covered),
        "n_docs": int(doc_ids.size),
        "sum_dl": int(doc_len.sum()),
        "n_terms": int(n_terms),
        "n_postings": int(n_postings),
        "content_hash": 0,
        "files": [
            os.path.basename(seg.postings_path(index_dir, out_part_id)),
            os.path.basename(seg.docstore_path(index_dir, out_part_id)),
        ],
    }
    if fl_fields:
        manifest_out["sum_dl_fields"] = {
            f: int(fl_merged[f].sum()) for f in fl_fields
        }
    seg.atomic_write_json(manifest_out, seg.part_manifest_path(index_dir, out_part_id))
    return manifest_out


def merge_index(index_dir: str, merge_factor: int = 4, cfg: EngineConfig = DEFAULT) -> dict:
    """Compact an index: merge every ``merge_factor`` adjacent partitions
    into one segment (Ray-parallel, one task per group), update the global
    manifest.  Old part files are removed after the new manifest commits."""
    import ray.data as rd

    manifest = read_manifest(index_dir)
    parts = sorted(int(p) for p in manifest["parts"])
    groups = [parts[i : i + merge_factor] for i in range(0, len(parts), merge_factor)]
    # merged ids come from the SAME monotonic counter delta segments use:
    # a fixed base (the old 100000+i scheme) collides with the previous
    # merge's output ids on a second merge, and the post-commit cleanup
    # would then delete the freshly written files the new manifest names.
    id_base = max(
        [int(manifest.get("next_segment_id", 0)), 100000] + [p + 1 for p in parts]
    )
    out_ids = [id_base + i for i in range(len(groups))]
    assert not (set(out_ids) & set(parts))
    plan = pd.DataFrame(
        {
            "group_id": range(len(groups)),
            "part_ids": [json.dumps(g) for g in groups],
            "out_part_id": out_ids,
        }
    )

    def do_merge(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in batch.itertuples(index=False):
            m = merge_segment_group(index_dir, json.loads(r.part_ids), int(r.out_part_id), cfg)
            rows.append({"out_part_id": int(r.out_part_id), "manifest": json.dumps(m)})
        return pd.DataFrame(rows)

    out = (
        rd.from_pandas(plan)
        .repartition(len(groups))
        .map_batches(do_merge, batch_format="pandas", batch_size=1)
        .take_all()
    )
    new_parts = {int(r["out_part_id"]): json.loads(r["manifest"]) for r in out}
    n_docs = sum(m["n_docs"] for m in new_parts.values())
    sum_dl = sum(m["sum_dl"] for m in new_parts.values())
    # preserve the per-partition rank-allocation counters: after the merge
    # the pre-merge part manifests are gone, so a later delta segment's
    # rank_base MUST come from this map or doc_id ranges would collide
    # with live docs inside the merged segments.
    # (legacy fallback: manifests predating the alloc map — ranks allocated
    # per partition = sum of its non-merged segments' n_docs)
    derived: dict[str, int] = {}
    for sid_str, m in manifest["part_manifests"].items():
        if "merged_from" not in m:
            p = str(m.get("partition", sid_str))
            derived[p] = derived.get(p, 0) + int(m["n_docs"])
    alloc = {**derived, **manifest.get("alloc", {})}
    merged_manifest = {
        **manifest,
        "parts": sorted(new_parts),
        "part_manifests": {str(p): new_parts[p] for p in sorted(new_parts)},
        # merge purged tombstoned docs -> stats now reflect live docs only
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        # multi-field: merge purged tombstoned docs, so per-field avgdl is
        # recomputed from the merged segments' per-field sums
        **(
            {
                "avgdl_fields": {
                    f: (
                        sum(
                            m.get("sum_dl_fields", {}).get(f, 0)
                            for m in new_parts.values()
                        )
                        / n_docs
                        if n_docs
                        else 0.0
                    )
                    for f in manifest["text_fields"]
                }
            }
            if "text_fields" in manifest
            else {}
        ),
        "alloc": alloc,
        "next_segment_id": id_base + len(groups),
        "tombstones": {},
        "n_tombstoned": 0,
    }
    write_manifest(index_dir, merged_manifest)
    # old segments removed only after the new manifest is the commit point
    old_tomb_files = [
        os.path.join(index_dir, os.path.basename(f))
        for files in manifest.get("tombstones", {}).values()
        for f in files
    ]
    for p in parts:
        for path in (
            seg.postings_path(index_dir, p),
            seg.docstore_path(index_dir, p),
            seg.part_manifest_path(index_dir, p),
            seg.tombstones_path(index_dir, p),
        ):
            if os.path.exists(path):
                os.remove(path)
    for path in old_tomb_files:
        if os.path.exists(path):
            os.remove(path)
    return merged_manifest
