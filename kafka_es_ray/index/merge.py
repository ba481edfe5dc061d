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


def _bin_view(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 data, int64 offsets) of a (Large)Binary column — value
    i is data[off[i]:off[i+1]].  Zero-copy."""
    arr = seg._combined(col)
    bufs = arr.buffers()
    width = 8 if pa.types.is_large_binary(arr.type) else 4
    odt = np.int64 if width == 8 else np.int32
    off = np.frombuffer(bufs[1], dtype=odt, count=len(arr) + 1, offset=arr.offset * width).astype(
        np.int64
    )
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data, off


def _first_varints(data: np.ndarray, off: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of the FIRST varint of each slice (the absolute
    first-doc gap of each term's posting stream).  Returns (values uint64,
    byte lengths int64)."""
    starts = off[:-1]
    n = starts.size
    if n == 0:
        return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
    idx = np.minimum(starts[:, None] + np.arange(10, dtype=np.int64), data.size - 1)
    m = data[idx]  # (n, 10)
    ln = (((m & 0x80) == 0).argmax(axis=1) + 1).astype(np.int64)
    take = np.arange(10) < ln[:, None]
    vals = ((m & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * np.arange(10, dtype=np.uint64))) * take
    return vals.sum(axis=1, dtype=np.uint64), ln


def _ragged_scatter(
    out: np.ndarray,
    dst_starts: np.ndarray,
    src: np.ndarray,
    src_starts: np.ndarray,
    lens: np.ndarray,
) -> None:
    """Copy ragged byte runs src[src_starts[i] : +lens[i]] to
    out[dst_starts[i] : +lens[i]] in one vectorized gather/scatter."""
    total = int(lens.sum())
    if total == 0:
        return
    run_off = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=run_off[1:])
    rel = np.arange(total, dtype=np.int64) - np.repeat(run_off, lens)
    out[np.repeat(dst_starts, lens) + rel] = src[np.repeat(src_starts, lens) + rel]


def _fast_merge_group(
    index_dir: str, part_ids: list[int], out_part_id: int, cfg: EngineConfig, manifest: dict
) -> dict | None:
    """Byte-level concat merge — the linear pass the doc_id-range layout
    promises: when no input segment carries tombstones and the (sorted)
    segments' doc_id ranges are disjoint, a merged term's posting stream
    is the byte CONCATENATION of the inputs' per-term streams with ONLY
    the boundary gap re-encoded (first varint of every non-first run
    becomes first_doc - prev_run_last_doc).  tfs / positions / block-max
    arrays concatenate unchanged (positions re-anchor per posting run;
    selective block decode re-anchors on the previous block's last doc,
    which IS the patched-gap invariant); per-block byte offsets shift by
    the preceding runs' byte lengths.  No posting is varint-decoded or
    re-encoded — O(stream bytes) memcpy-style gathers instead of
    decode+sort+encode — so merge cost is I/O-shaped at any scale.

    Returns None when the preconditions fail (tombstones present,
    interleaved doc ranges from delta segments, v1 format, or schema
    mismatch) — the caller then runs the decode path."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    for p in part_ids:
        if seg.manifest_tombstone_files(manifest, p):
            return None
    pairs = []
    for p in sorted(part_ids):
        pt = pq.read_table(seg.postings_path(index_dir, p))
        st = pq.read_table(seg.docstore_path(index_dir, p))
        if st.num_rows:
            pairs.append((pt, st))
    if not pairs:
        return None
    pairs.sort(key=lambda ps: ps[1].column("doc_id")[0].as_py())
    names0 = list(pairs[0][0].schema.names)
    snames0 = list(pairs[0][1].schema.names)
    if "block_id_boff" not in names0:  # v1 segments: no per-block offsets
        return None
    for pt, st in pairs[1:]:
        if list(pt.schema.names) != names0 or list(st.schema.names) != snames0:
            return None
    for (_, a), (_, b) in zip(pairs, pairs[1:]):
        if a.column("doc_id")[-1].as_py() >= b.column("doc_id")[0].as_py():
            return None  # interleaved ranges (delta segments): need re-sort
    has_pos = "positions" in names0
    S = len(pairs)

    # ---- dictionary union (UTF-8 byte order == the build's sort order) ----
    term_arrs = [seg._combined(pt.column("term")) for pt, _ in pairs]
    all_terms_arr = pc.unique(pa.concat_arrays(term_arrs))
    all_terms_arr = all_terms_arr.take(pc.array_sort_indices(all_terms_arr))
    n_terms = len(all_terms_arr)
    tpos = [
        pc.index_in(t, value_set=all_terms_arr).to_numpy().astype(np.int64)
        for t in term_arrs
    ]
    dfs = np.zeros(n_terms, dtype=np.int64)
    for tp, (pt, _) in zip(tpos, pairs):
        np.add.at(dfs, tp, pt.column("df").to_numpy().astype(np.int64))

    # ---- per-(segment, term) contribution table, sorted (term, seg) ----
    views = {
        name: [_bin_view(pt.column(name)) for pt, _ in pairs]
        for name in (
            "doc_ids",
            "tfs",
            "block_max_tf",
            "block_min_dl",
            "block_last_doc",
            "block_id_boff",
            "block_tf_boff",
        )
        + (("positions",) if has_pos else ())
    }
    fv = [_first_varints(*views["doc_ids"][s]) for s in range(S)]
    # last doc of each term's stream in each segment = last uint64 of its
    # block_last_doc slice (no posting decode needed)
    last_doc = []
    for s in range(S):
        bdata, boff = views["block_last_doc"][s]
        idx = (boff[1:] - 8)[:, None] + np.arange(8, dtype=np.int64)
        last_doc.append(np.ascontiguousarray(bdata[idx]).view(np.uint64).ravel())

    contrib_term = np.concatenate(tpos)
    contrib_seg = np.concatenate(
        [np.full(tp.size, s, dtype=np.int64) for s, tp in enumerate(tpos)]
    )
    contrib_idx = np.concatenate([np.arange(tp.size, dtype=np.int64) for tp in tpos])
    order_c = np.lexsort((contrib_seg, contrib_term))
    ct = contrib_term[order_c]
    cs = contrib_seg[order_c]
    ci = contrib_idx[order_c]
    nC = ct.size
    is_first = np.ones(nC, dtype=bool)
    is_first[1:] = ct[1:] != ct[:-1]

    def per_contrib(per_seg: list[np.ndarray]) -> np.ndarray:
        return np.concatenate(per_seg)[order_c]

    first_val_c = per_contrib([fv[s][0] for s in range(S)]).astype(np.int64)
    flen_c = per_contrib([fv[s][1] for s in range(S)])
    lastdoc_c = per_contrib(last_doc).astype(np.int64)
    prev_last_c = np.concatenate([[0], lastdoc_c[:-1]])
    patched = (first_val_c - prev_last_c)[~is_first]
    assert patched.size == 0 or (patched > 0).all(), "runs must ascend across segments"
    patch_data_b, patch_off = varint_encode_with_offsets(patched.astype(np.uint64))
    patch_data = np.frombuffer(patch_data_b, dtype=np.uint8)
    patch_len_c = np.zeros(nC, dtype=np.int64)
    patch_len_c[~is_first] = np.diff(patch_off)
    patch_start_c = np.zeros(nC, dtype=np.int64)
    patch_start_c[~is_first] = patch_off[:-1]

    def slice_bounds(name: str) -> tuple[np.ndarray, np.ndarray]:
        starts = per_contrib([views[name][s][1][:-1] for s in range(S)])
        lens = per_contrib([np.diff(views[name][s][1]) for s in range(S)])
        return starts, lens

    def concat_column(name: str, cut_first: bool = False) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Concatenate per-term slices across segments (optionally
        replacing each non-first run's first varint with its patch).
        Returns (flat out bytes, per-term offsets, per-contrib out starts)."""
        starts, lens = slice_bounds(name)
        cut = np.where(cut_first & ~is_first, flen_c, 0)
        add = np.where(cut_first & ~is_first, patch_len_c, 0)
        out_len = lens - cut + add
        out_start = np.zeros(nC, dtype=np.int64)
        np.cumsum(out_len[:-1], out=out_start[1:])
        total = int(out_len.sum())
        out = np.empty(total, dtype=np.uint8)
        if cut_first:
            sel = ~is_first
            _ragged_scatter(
                out, out_start[sel], patch_data, patch_start_c[sel], patch_len_c[sel]
            )
        for s in range(S):
            m = cs == s
            _ragged_scatter(
                out,
                out_start[m] + add[m],
                views[name][s][0],
                starts[m] + cut[m],
                lens[m] - cut[m],
            )
        term_bounds = np.concatenate([out_start[is_first], [total]])
        return out, term_bounds, out_start

    id_out, id_bounds, id_start_c = concat_column("doc_ids", cut_first=True)
    tf_out, tf_bounds, tf_start_c = concat_column("tfs")
    col_out = {
        name: concat_column(name)[:2]
        for name in ("block_max_tf", "block_min_dl", "block_last_doc")
    }
    if has_pos:
        col_out["positions"] = concat_column("positions")[:2]

    # ---- per-block byte offsets: shift by preceding runs' bytes; blocks
    # past a patched first varint also shift by (patch - original) ----
    def shifted_boff(name: str, stream_start_c: np.ndarray, delta_c: np.ndarray):
        starts, lens = slice_bounds(name)
        out_len = lens
        out_start = np.zeros(nC, dtype=np.int64)
        np.cumsum(out_len[:-1], out=out_start[1:])
        total = int(out_len.sum())
        out = np.empty(total, dtype=np.uint8)
        for s in range(S):
            m = cs == s
            _ragged_scatter(out, out_start[m], views[name][s][0], starts[m], lens[m])
        vals = out.view(np.uint32).astype(np.int64)
        n_blocks_c = (lens // 4).astype(np.int64)
        # shift of run r within its term = out-stream start of run r minus
        # the term's stream start (monotone out starts -> max-accumulate)
        term_stream_start = np.maximum.accumulate(np.where(is_first, stream_start_c, 0))
        shift_c = stream_start_c - term_stream_start
        rep_shift = np.repeat(shift_c, n_blocks_c)
        rep_delta = np.repeat(delta_c, n_blocks_c)
        # vals still hold the ORIGINAL within-run offsets here; a block
        # whose original offset is 0 starts at the (possibly patched)
        # first varint, so the patch length delta applies only past it
        vals += rep_shift + np.where(vals > 0, rep_delta, 0)
        term_bounds = np.concatenate([out_start[is_first], [total]])
        return vals.astype(np.uint32).view(np.uint8), term_bounds

    delta_id_c = np.where(is_first, 0, patch_len_c - flen_c)
    bid_out, bid_bounds = shifted_boff("block_id_boff", id_start_c, delta_id_c)
    btf_out, btf_bounds = shifted_boff("block_tf_boff", tf_start_c, np.zeros(nC, dtype=np.int64))

    cols = {
        "term": all_terms_arr.cast(pa.string()),
        "df": pa.array(dfs, type=pa.int64()),
        "doc_ids": _large_binary_from_slices(id_out.tobytes(), id_bounds),
        "tfs": _large_binary_from_slices(tf_out.tobytes(), tf_bounds),
        "block_max_tf": _large_binary_from_slices(
            col_out["block_max_tf"][0].tobytes(), col_out["block_max_tf"][1]
        ),
        "block_min_dl": _large_binary_from_slices(
            col_out["block_min_dl"][0].tobytes(), col_out["block_min_dl"][1]
        ),
        "block_last_doc": _large_binary_from_slices(
            col_out["block_last_doc"][0].tobytes(), col_out["block_last_doc"][1]
        ),
        "block_id_boff": _large_binary_from_slices(bid_out.tobytes(), bid_bounds),
        "block_tf_boff": _large_binary_from_slices(btf_out.tobytes(), btf_bounds),
    }
    if has_pos:
        cols["positions"] = _large_binary_from_slices(
            col_out["positions"][0].tobytes(), col_out["positions"][1]
        )
    postings_table = pa.table(cols)
    docstore_table = pa.concat_tables([st for _, st in pairs]).combine_chunks()
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
    doc_len_col = docstore_table.column("doc_len").to_numpy()
    manifest_out = {
        "part_id": out_part_id,
        "format_version": seg.FORMAT_VERSION,
        "merged_from": sorted(part_ids),
        "partitions": sorted(covered),
        "n_docs": int(docstore_table.num_rows),
        "sum_dl": int(doc_len_col.sum()),
        "n_terms": int(n_terms),
        "n_postings": int(dfs.sum()),
        "content_hash": 0,
        "files": [
            os.path.basename(seg.postings_path(index_dir, out_part_id)),
            os.path.basename(seg.docstore_path(index_dir, out_part_id)),
        ],
    }
    fl_fields = [n[3:] for n in snames0 if n.startswith("fl_")]
    if fl_fields:
        manifest_out["sum_dl_fields"] = {
            f: int(docstore_table.column(f"fl_{f}").to_numpy().sum()) for f in fl_fields
        }
    seg.atomic_write_json(manifest_out, seg.part_manifest_path(index_dir, out_part_id))
    return manifest_out


def merge_segment_group(index_dir: str, part_ids: list[int], out_part_id: int, cfg: EngineConfig) -> dict:
    """Merge several segments into one (driver- or task-side callable).

    Tries the byte-concat fast path first (_fast_merge_group — the
    no-tombstone / disjoint-range common case, e.g. force-merge right
    after a build); falls back to the full decode+re-sort+re-encode pass
    when deletes must be purged or delta segments interleave ranges."""
    assert out_part_id not in set(part_ids), "merged id must not collide with an input segment id"
    part_ids = sorted(part_ids)
    manifest = read_manifest(index_dir)
    fast = _fast_merge_group(index_dir, part_ids, out_part_id, cfg, manifest)
    if fast is not None:
        return fast
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
    # numeric-mapped fields survive the same way (float64, NaN = missing)
    num_fields = sorted(set.intersection(*[set(s.num_arr) for s in segs])) if segs else []
    num_merged = {
        f: np.concatenate([s.num_arr[f][m] for s, m in zip(segs, ds_alive)]).astype(
            np.float64
        )[ds_order]
        for f in num_fields
    }
    # dense-vector columns survive the same way (arrow list take/concat,
    # no per-row Python)
    vec_fields = sorted(set.intersection(*[set(s.vec_arr) for s in segs])) if segs else []
    vec_merged = {}
    for f in vec_fields:
        parts_a = [
            s.vec_arr[f].take(pa.array(np.flatnonzero(m), type=pa.int64()))
            for s, m in zip(segs, ds_alive)
        ]
        vec_merged[f] = pa.concat_arrays(parts_a).take(
            pa.array(ds_order, type=pa.int64())
        )
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
    for f, vals in num_merged.items():
        store_cols[f"num_{f}"] = pa.array(vals, type=pa.float64())
    for f, vals in fl_merged.items():
        store_cols[f"fl_{f}"] = pa.array(vals, type=pa.int32())
    for f, vals in vec_merged.items():
        store_cols[f"vec_{f}"] = vals
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
    if len(groups) != len(parts) and merged_manifest.get("mappings", {}).get("index_sort"):
        # a merged segment concatenates partitions in doc_id
        # (partition-major) order, so its rows are no longer globally
        # value-ordered: drop the sorted-layout guarantee
        merged_manifest["mappings"] = {
            **merged_manifest["mappings"], "index_sort": None
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


def auto_merge(index_dir: str, max_segments: int = 8, cfg: EngineConfig = DEFAULT) -> dict:
    """ES tiered merge-policy analog (Lucene TieredMergePolicy /
    segments_per_tier — the background compaction the reference's ES
    cluster runs between bulk batches): a NO-OP while the index holds at
    most ``max_segments`` live segments; above that, merge the SMALLEST
    segments (by live doc count) into one so the live count drops back
    to ``max_segments``.  Big segments are never rewritten — merge cost
    is proportional to bytes rewritten, so compaction always picks the
    small tail of delta segments incremental ingestion accumulates.

    One merge group per call (call from an ingestion loop after each
    apply — the ES scheduler shape); partial manifest rewrite: untouched
    segments keep their records, the group's tombstoned docs are purged,
    remaining tombstone stats are recomputed from the surviving files.
    Returns {"merged": 0} or {"merged": k, "out_part_id": id}."""
    manifest = read_manifest(index_dir)
    parts = sorted(int(p) for p in manifest["parts"])
    if len(parts) <= int(max_segments):
        return {"merged": 0, "parts": len(parts)}
    pms = manifest["part_manifests"]
    by_size = sorted(parts, key=lambda p: (int(pms[str(p)]["n_docs"]), p))
    group = sorted(by_size[: len(parts) - int(max_segments) + 1])
    id_base = max(
        [int(manifest.get("next_segment_id", 0)), 100000] + [p + 1 for p in parts]
    )
    out_id = id_base
    new_m = merge_segment_group(index_dir, group, out_id, cfg)
    grouped = set(group)
    new_pms = {str(p): pms[str(p)] for p in parts if p not in grouped}
    new_pms[str(out_id)] = new_m
    new_parts = sorted(int(p) for p in new_pms)
    n_docs = sum(int(m["n_docs"]) for m in new_pms.values())
    sum_dl = sum(m["sum_dl"] for m in new_pms.values())
    # rank-allocation counters preserved exactly as merge_index does
    derived: dict[str, int] = {}
    for sid_str, m in pms.items():
        if "merged_from" not in m:
            p = str(m.get("partition", sid_str))
            derived[p] = derived.get(p, 0) + int(m["n_docs"])
    alloc = {**derived, **manifest.get("alloc", {})}
    # tombstones of merged segments were purged by the rewrite; survivors
    # keep theirs, and the stat is recomputed from the surviving files
    tombs = {
        k: v
        for k, v in manifest.get("tombstones", {}).items()
        if int(k) not in grouped
    }
    n_tomb = 0
    for files in tombs.values():
        for f in files:
            path = os.path.join(index_dir, os.path.basename(f))
            if os.path.exists(path):
                with open(path) as fh:
                    n_tomb += len(json.load(fh))
    merged_manifest = {
        **manifest,
        "parts": new_parts,
        "part_manifests": new_pms,
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        **(
            {
                "avgdl_fields": {
                    f: (
                        sum(m.get("sum_dl_fields", {}).get(f, 0) for m in new_pms.values())
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
        "next_segment_id": out_id + 1,
        "tombstones": tombs,
        "n_tombstoned": n_tomb,
    }
    if merged_manifest.get("mappings", {}).get("index_sort"):
        # same partition-major caveat as merge_index (see above)
        merged_manifest["mappings"] = {
            **merged_manifest["mappings"], "index_sort": None
        }
    write_manifest(index_dir, merged_manifest)
    old_tomb_files = [
        os.path.join(index_dir, os.path.basename(f))
        for k, files in manifest.get("tombstones", {}).items()
        if int(k) in grouped
        for f in files
    ]
    for p in group:
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
    return {"merged": len(group), "out_part_id": out_id, "parts": len(new_parts)}
