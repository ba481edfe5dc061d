"""Index build — the Ray-Data-first pipeline (SURVEY §7.1 M1-M3, §7.3).

    read_parquet(corpus)
      -> map_batches(ExtractStage, actor pool)        # html->text, project, route
      -> groupby(part_id).map_groups(build_segment)   # THE one shuffle
      -> small manifest rows -> driver -> manifest.json

Design notes (scale):
  * ONE all-to-all exchange total.  The corpus is hash-partitioned by
    routing key (routing ?? url — the reference router precedence,
    ElasticsearchSinkTask.kt:209-212); everything downstream (LWW dedup,
    doc_id assignment, tokenize, postings build, segment write) is
    partition-local.  There is NO global groupby(term): each partition
    owns a doc_id range and builds its own complete term dictionary, the
    ES shard model.  Head-term skew therefore cannot produce a hot
    reducer — a frequent term's postings are split evenly across all
    partitions by construction (doc-partitioned postings ARE the salted
    term groups of SURVEY §7.3, with salt == doc partition and the final
    concat implicit in per-segment query + merge).
  * `html` (potentially MBs per row) is dropped in the extract stage
    BEFORE the shuffle (SURVEY §7.4 wide-binary rule).
  * doc_id = part_id * PART_STRIDE + local_rank: deterministic under any
    parallelism and any resume point, with no global prefix-sum barrier.
  * Each partition writes its files atomically and its own manifest last;
    a resumed build skips partitions whose manifest verifies (the
    offset-commit checkpoint analog, ElasticsearchSinkTask.kt:312-332).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_es_ray.config import DEFAULT, EngineConfig
from kafka_es_ray.functions.codec import varint_encode_with_offsets
from kafka_es_ray.functions.hashing import route_partition, stable_hash64
from kafka_es_ray.functions.textproc import fill_text_from_html
from kafka_es_ray.functions.tokenizer import ANALYZER_VERSION, get_analyzer
from kafka_es_ray.index import segment as seg


class ExtractStage:
    """Stateful extract/validate/route stage (actor pool).

    Reference analogs: converter + preprocess chain run per record before
    routing (JsonConverter.kt:42-76, ElasticsearchSinkTask.kt:282-299);
    stateful setup done once per worker like the reflectively-loaded proto
    parser (ProtobufSerde.kt:26-73)."""

    def __init__(
        self,
        num_partitions: int,
        key_col: str,
        text_col: str,
        html_col: str | None,
        routing_col: str | None,
        keep_cols: tuple[str, ...],
    ):
        self.num_partitions = num_partitions
        self.key_col = key_col
        self.text_col = text_col
        self.html_col = html_col
        self.routing_col = routing_col
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array | np.ndarray] = {}
        text = batch.column(self.text_col).to_numpy(zero_copy_only=False)
        if self.html_col is not None and self.html_col in batch.schema.names:
            html = batch.column(self.html_col).to_numpy(zero_copy_only=False)
            text = fill_text_from_html(text, html)
        cols[self.text_col] = pa.array(text, type=pa.string())
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        # router key precedence: routing ?? key (ElasticsearchSinkTask.kt:209-212).
        # Null detection must be pd.isna-based: a numeric/empty routing
        # parquet column yields float NaN, which `is not None` would treat
        # as a valid key and send every such row to one partition.
        route_keys = keys
        if self.routing_col is not None and self.routing_col in batch.schema.names:
            routing = batch.column(self.routing_col).to_numpy(zero_copy_only=False)
            route_keys = np.where(pd.isna(routing), keys, routing)
        for c in self.keep_cols:
            if c != self.text_col and c in batch.schema.names:
                cols[c] = batch.column(c)
        cols["part_id"] = pa.array(
            route_partition(route_keys, self.num_partitions), type=pa.int32()
        )
        return pa.table(cols)


def _postings_from_tokens(
    token_lists, doc_ids: np.ndarray, want_positions: bool = False
):
    """Vectorized (term, doc_id, tf) construction for one partition.

    ``token_lists``: pd.Series of token lists OR a pa.(Large)ListArray of
    strings.  Returns (uniq_terms asc, term_code_sorted, posting_doc_ids,
    posting_tfs, doc_len) where postings are sorted by (term, doc_id).
    ``doc_ids`` must be ascending (callers sort the partition first).

    The flatten + vocabulary step runs ARROW-NATIVE (list_flatten +
    dictionary_encode, both C kernels): measured 2.2x faster than the
    previous pandas-factorize path, and — more important at 32-way
    parallelism — it allocates no per-token Python objects, the main
    memory-bandwidth contention source in the group stage."""
    import pyarrow.compute as pc

    if not isinstance(token_lists, (pa.ListArray, pa.LargeListArray, pa.ChunkedArray)):
        vals = list(token_lists)
        elem_type = pa.string()
        for lst in vals:
            if lst:
                elem_type = pa.binary() if isinstance(lst[0], bytes) else pa.string()
                break
        token_lists = pa.array(vals, type=pa.list_(elem_type))
    if isinstance(token_lists, pa.ChunkedArray):
        token_lists = token_lists.combine_chunks()
    offs = token_lists.offsets.to_numpy()
    lens = np.diff(offs - offs[0]).astype(np.int64)
    n_docs = doc_ids.size
    if lens.sum() == 0:
        e = np.array([], dtype=np.int64)
        out = (np.array([], dtype=object), e, e, e, lens)
        return out + (e,) if want_positions else out
    flat = pc.list_flatten(token_lists)
    d = pc.dictionary_encode(flat)
    codes = d.indices.to_numpy().astype(np.int64)
    vocab = d.dictionary.to_pandas().to_numpy(dtype=object)  # |vocab| values only
    if vocab.size and isinstance(vocab[0], bytes):
        # bytes fast path: decode the VOCABULARY (not the token stream);
        # sorting happens on the decoded strings so dictionary order is
        # byte-identical to the str path (determinism contract)
        vocab = np.array([v.decode("utf-8") for v in vocab], dtype=object)
    order = np.argsort(vocab, kind="stable")
    rank = np.empty(order.size, dtype=np.int64)
    rank[order] = np.arange(order.size)
    uniq_terms = vocab[order]
    all_doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    # (term, doc) pair counting in one pass; term-major key so the result
    # comes out sorted by (term_code, doc_idx) == (term, doc_id)
    key = rank[codes] * n_docs + all_doc_idx
    uk, tf = np.unique(key, return_counts=True)
    term_code = uk // n_docs
    doc_idx = uk % n_docs
    out = (uniq_terms, term_code, doc_ids[doc_idx], tf.astype(np.int64), lens)
    if not want_positions:
        return out
    # token positions per (term, doc) posting: stable sort of the flat
    # token stream by (term, doc) keeps each posting's positions in
    # document order; runs align with the np.unique group order above
    order = np.argsort(key, kind="stable")
    doc_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=doc_starts[1:])
    tok_pos = np.arange(codes.size, dtype=np.int64) - np.repeat(doc_starts, lens)
    return out + (tok_pos[order],)


def _tokenize_multi_field(
    g: pd.DataFrame, fields: tuple[str, ...], langs: pd.Series
) -> tuple[pa.LargeListArray, dict[str, np.ndarray]]:
    """Multi-field tokenize: each field's tokens are prefixed with
    '{field}\\x1f' ARROW-side (binary_join_element_wise — no per-token
    Python objects) and the per-field lists interleave into ONE combined
    list per doc, field-declaration order inside each doc.  A field's
    tokens stay contiguous, so intra-field position deltas survive in the
    combined stream and phrase matching on prefixed terms needs no
    position surgery (cross-field adjacency can't false-match: the
    prefixes differ).  Returns (combined list array, {field: token
    counts per doc})."""
    import pyarrow.compute as pc

    n = len(g)
    flats: list[pa.Array] = []
    field_dls: dict[str, np.ndarray] = {}
    for f in fields:
        texts_f = (
            g[f].reset_index(drop=True).fillna("")
            if f in g.columns
            else pd.Series([""] * n, dtype=object)
        )
        tok = pd.Series([None] * n, dtype=object)
        for lang in langs.unique():
            mask = (langs == lang).to_numpy()
            tok[mask] = get_analyzer(lang).tokenize_series_bytes(texts_f[mask])
        arr = pa.array(list(tok), type=pa.list_(pa.binary()))
        offs = arr.offsets.to_numpy().astype(np.int64)
        field_dls[f] = np.diff(offs - offs[0]).astype(np.int64)
        flat = pc.list_flatten(arr)
        flats.append(
            pc.binary_join_element_wise(
                pa.scalar((f + "\x1f").encode()), flat, pa.scalar(b"")
            )
        )
    doc_of = np.concatenate(
        [np.repeat(np.arange(n, dtype=np.int64), field_dls[f]) for f in fields]
    )
    frank = np.concatenate(
        [np.full(int(field_dls[f].sum()), fi, dtype=np.int64) for fi, f in enumerate(fields)]
    )
    # stable by (doc, field): within a (doc, field) run the original token
    # order — i.e. document order — is preserved
    order = np.lexsort((frank, doc_of))
    all_flat = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in flats])
    combined_flat = all_flat.take(pa.array(order, type=pa.int64()))
    total_lens = np.sum([field_dls[f] for f in fields], axis=0).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total_lens, out=offsets[1:])
    return (
        pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), combined_flat.cast(pa.binary())
        ),
        field_dls,
    )


def _encode_positions_column(
    positions_flat: np.ndarray, p_tfs: np.ndarray, term_starts: np.ndarray, n_postings: int
) -> pa.Array:
    """Positions stream -> one large_binary blob per term: per-posting
    runs (run p has tf[p] positions), delta+varint encoded with the gap
    reset at each run's first position (same scheme as doc_ids)."""
    run_starts = np.zeros(n_postings, dtype=np.int64)
    if n_postings:
        np.cumsum(p_tfs[:-1], out=run_starts[1:])
    pgaps = positions_flat.copy()
    if positions_flat.size:
        pgaps[1:] -= positions_flat[:-1]
        pgaps[run_starts] = positions_flat[run_starts]
    pos_buf, pos_off = varint_encode_with_offsets(pgaps.astype(np.uint64))
    cum_tf = np.zeros(n_postings + 1, dtype=np.int64)
    np.cumsum(p_tfs, out=cum_tf[1:])
    term_bounds = pos_off[cum_tf[np.concatenate([term_starts, [n_postings]])]]
    return _large_binary_from_slices(pos_buf, term_bounds)


def _large_binary_from_slices(buf: bytes, byte_offsets: np.ndarray) -> pa.Array:
    """Zero-copy pa.large_binary column from one contiguous buffer + int64
    offsets — avoids materializing per-term Python bytes objects."""
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        byte_offsets.size - 1,
        [None, pa.py_buffer(byte_offsets.astype(np.int64).tobytes()), pa.py_buffer(buf)],
    )


def build_segment_for_group(
    g: pd.DataFrame,
    index_dir: str,
    cfg: EngineConfig,
    key_col: str,
    text_col: str,
    lang_col: str | None,
    ts_col: str | None,
    seq_col: str | None,
    id_col: str | None,
    op_col: str | None,
    segment_id: int | None = None,
    rank_base: int = 0,
) -> pd.DataFrame:
    """Build + atomically write ONE segment from one partition's rows.

    Partition-local semantics, in order:
      1. last-write-wins per key by (ts, seq) desc — the per-doc-id upsert
         the reference relies on ES for (SURVEY §2 E1; ordering carried as
         explicit seq, stronger than Kafka offset order, SURVEY §4).
      2. delete tombstones drop the doc (BulkAction.Delete, BulkAction.kt:55-67).
      3. deterministic doc_id (id_col if given, else part-ranked).
      4. per-lang tokenize -> postings -> delta+varint encode + block-max.
    """
    part_id = int(g["part_id"].iloc[0])
    if segment_id is None:
        segment_id = part_id
    t0 = time.time()

    # 1-2. LWW + tombstones
    sort_cols, asc = [key_col], [True]
    for c in (ts_col, seq_col):
        if c is not None and c in g.columns:
            sort_cols.append(c)
            asc.append(False)
    g = g.sort_values(sort_cols, ascending=asc, kind="mergesort")
    n_input = len(g)
    g = g.drop_duplicates(key_col, keep="first")
    if op_col is not None and op_col in g.columns:
        g = g[g[op_col] != "delete"]

    # 3. deterministic doc ids
    if id_col is not None:
        if cfg.index_sort is not None:
            raise ValueError(
                "index_sort requires internal ids (external id_col fixes "
                "doc ids and cannot re-map the layout)"
            )
        g = g.sort_values(id_col, kind="mergesort")
        doc_ids = g[id_col].to_numpy(dtype=np.int64)
    else:
        if cfg.index_sort is not None:
            # ES index.sort: value-ordered layout (missing last, ties by
            # key) BEFORE rank assignment -> ascending doc_id == sort
            # order within the segment (the early-termination contract)
            fld, order = cfg.index_sort
            sv = pd.to_numeric(g[fld], errors="coerce")
            g = (
                g.assign(_isort=sv)
                .sort_values(
                    ["_isort", key_col],
                    ascending=[order != "desc", True],
                    kind="mergesort",
                    na_position="last",
                )
                .drop(columns="_isort")
            )
        else:
            g = g.sort_values(key_col, kind="mergesort")
        doc_ids = part_id * cfg.part_stride + rank_base + np.arange(len(g), dtype=np.int64)
    keys = g[key_col].to_numpy()
    texts = g[text_col].reset_index(drop=True)
    langs = (
        g[lang_col].reset_index(drop=True)
        if lang_col is not None and lang_col in g.columns
        else pd.Series(["en"] * len(g))
    )

    # 4. tokenize per lang (analyzer chain per SURVEY §2 E6) — bytes fast
    # path: tokens stay UTF-8 bytes until the (small) vocabulary decode
    field_dls: dict[str, np.ndarray] | None = None
    if cfg.text_fields:
        token_lists, field_dls = _tokenize_multi_field(g, cfg.text_fields, langs)
    else:
        token_lists = pd.Series([None] * len(g), dtype=object)
        for lang in langs.unique():
            mask = (langs == lang).to_numpy()
            an = get_analyzer(lang)
            token_lists[mask] = an.tokenize_series_bytes(texts[mask])

    res = _postings_from_tokens(token_lists, doc_ids, want_positions=cfg.index_positions)
    uniq_terms, term_code, p_ids, p_tfs, doc_len = res[:5]
    positions_flat = res[5] if cfg.index_positions else None
    n_terms = uniq_terms.size
    n_postings = p_ids.size

    # per-term delta gaps with resets at term boundaries (vectorized)
    term_starts = np.searchsorted(term_code, np.arange(n_terms, dtype=np.int64))
    # n_terms == 0 (a partition of all-empty docs) must yield EMPTY ends,
    # not [0] — the block grid below broadcasts ends against starts
    term_ends = (
        np.concatenate([term_starts[1:], [n_postings]]) if n_terms else term_starts
    )
    gaps = p_ids.copy()
    gaps[1:] -= p_ids[:-1]
    gaps[term_starts] = p_ids[term_starts]
    id_buf, id_off = varint_encode_with_offsets(gaps.astype(np.uint64))
    tf_buf, tf_off = varint_encode_with_offsets(p_tfs.astype(np.uint64))

    # block-max metadata: contiguous block grid over the posting arrays
    B = cfg.block_size
    run_lens = term_ends - term_starts
    nb = (run_lens + B - 1) // B
    first_block = np.concatenate([[0], np.cumsum(nb)])
    total_blocks = int(first_block[-1])
    binner = np.arange(total_blocks, dtype=np.int64) - np.repeat(first_block[:-1], nb)
    block_start = np.repeat(term_starts, nb) + binner * B
    block_end = np.minimum(block_start + B, np.repeat(term_ends, nb))
    if n_postings:
        if field_dls is not None:
            # multi-field: a prefixed term's block-min-dl must come from
            # the posting's OWN field length or the MaxScore upper bound
            # (decreasing in dl) would under-estimate and prune true hits
            fmap = {f: i for i, f in enumerate(cfg.text_fields)}
            f_of_term = np.fromiter(
                (fmap[t.split("\x1f", 1)[0]] for t in uniq_terms),
                dtype=np.int64,
                count=n_terms,
            )
            dl_stack = np.stack([field_dls[f] for f in cfg.text_fields]).astype(np.int64)
            term_of_posting = np.repeat(np.arange(n_terms, dtype=np.int64), run_lens)
            dl_at = dl_stack[f_of_term[term_of_posting], np.searchsorted(doc_ids, p_ids)]
        else:
            dl_at = doc_len[np.searchsorted(doc_ids, p_ids)]
        bmax_tf = np.maximum.reduceat(p_tfs, block_start).astype(np.uint32)
        bmin_dl = np.minimum.reduceat(dl_at, block_start).astype(np.uint32)
        blast = p_ids[block_end - 1].astype(np.uint64)
        # per-block BYTE offsets into the term's varint blobs (format v2):
        # enable selective per-block decode at query time (skip pointers
        # without these would name blocks we cannot seek to)
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
        "term": pa.array(uniq_terms, type=pa.string()),
        "df": pa.array(run_lens, type=pa.int64()),
        "doc_ids": _large_binary_from_slices(id_buf, id_off[np.concatenate([term_starts, [n_postings]])]),
        "tfs": _large_binary_from_slices(tf_buf, tf_off[np.concatenate([term_starts, [n_postings]])]),
        "block_max_tf": _large_binary_from_slices(bmax_tf.tobytes(), first_block * 4),
        "block_min_dl": _large_binary_from_slices(bmin_dl.tobytes(), first_block * 4),
        "block_last_doc": _large_binary_from_slices(blast.tobytes(), first_block * 8),
        "block_id_boff": _large_binary_from_slices(bid_off.tobytes(), first_block * 4),
        "block_tf_boff": _large_binary_from_slices(btf_off.tobytes(), first_block * 4),
    }
    if positions_flat is not None:
        cols["positions"] = _encode_positions_column(
            positions_flat, p_tfs, term_starts, n_postings
        )
    postings_table = pa.table(cols)
    key_hashes = stable_hash64(keys) if len(keys) else np.array([], dtype=np.uint64)
    store_cols = {
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "key": pa.array(keys, type=pa.string()),
        # sorted-key mget support: point lookups binary-search the hash
        # instead of scanning the key column (engine.get / distributed mget)
        "key_hash": pa.array(key_hashes, type=pa.uint64()),
        "doc_len": pa.array(doc_len, type=pa.int32()),
        "lang": pa.array(langs.to_numpy(), type=pa.string()),
    }
    for kw in cfg.keyword_cols:
        # ES keyword-mapped field: stored as a docstore string column for
        # terms aggregations; missing input column -> empty-string bucket
        vals = (
            g[kw].astype(str).to_numpy()
            if kw in g.columns
            else np.full(len(g), "", dtype=object)
        )
        store_cols[f"kw_{kw}"] = pa.array(vals, type=pa.string())
    for nf in cfg.numeric_cols:
        # ES numeric-mapped field: float64 docstore column for range
        # filters and sort-by-field; missing column / unparsable -> NaN
        # (ES missing-value semantics: excluded by ranges and sorts last)
        nvals = (
            pd.to_numeric(g[nf], errors="coerce").to_numpy(dtype=np.float64)
            if nf in g.columns
            else np.full(len(g), np.nan, dtype=np.float64)
        )
        store_cols[f"num_{nf}"] = pa.array(nvals, type=pa.float64())
    for vf in cfg.vector_cols:
        # ES dense_vector mapped field: list<float32> docstore column for
        # exact kNN; missing column / null -> null row (never a kNN hit)
        if vf in g.columns:
            vvals = [
                None
                if v is None or (isinstance(v, float) and pd.isna(v))
                else np.asarray(v, dtype=np.float32)
                for v in g[vf]
            ]
        else:
            vvals = [None] * len(g)
        store_cols[f"vec_{vf}"] = pa.array(vvals, type=pa.list_(pa.float32()))
    if field_dls is not None:
        # per-field token counts (ES per-field norms): BM25 on a prefixed
        # term divides by ITS field's length, not the doc total
        for f in cfg.text_fields:
            store_cols[f"fl_{f}"] = pa.array(field_dls[f], type=pa.int32())
    if cfg.store_text:
        # ES _source stored field: docstore carries the doc text
        store_cols["text"] = pa.array(texts.to_numpy(), type=pa.string())
    docstore_table = pa.table(store_cols)
    seg.atomic_write_table(
        postings_table, seg.postings_path(index_dir, segment_id),
        retries=cfg.write_retries, retry_delay_s=cfg.write_retry_delay_s,
    )
    seg.atomic_write_table(
        docstore_table, seg.docstore_path(index_dir, segment_id),
        retries=cfg.write_retries, retry_delay_s=cfg.write_retry_delay_s,
    )

    content_hash = int(np.bitwise_xor.reduce(key_hashes)) if len(keys) else 0
    manifest = {
        "part_id": segment_id,
        "partition": part_id,
        "format_version": seg.FORMAT_VERSION,
        "analyzer_version": ANALYZER_VERSION,
        "n_input_rows": int(n_input),
        "n_docs": int(len(keys)),
        "sum_dl": int(doc_len.sum()),
        "n_terms": int(n_terms),
        "n_postings": int(n_postings),
        "content_hash": content_hash,
        "files": [
            os.path.basename(seg.postings_path(index_dir, segment_id)),
            os.path.basename(seg.docstore_path(index_dir, segment_id)),
        ],
        "build_secs": round(time.time() - t0, 3),
    }
    if field_dls is not None:
        manifest["sum_dl_fields"] = {f: int(field_dls[f].sum()) for f in cfg.text_fields}
    # per-partition manifest written LAST = the commit point (D9 analog)
    seg.atomic_write_json(
        manifest, seg.part_manifest_path(index_dir, segment_id),
        retries=cfg.write_retries, retry_delay_s=cfg.write_retry_delay_s,
    )
    return pd.DataFrame({"part_id": [segment_id], "manifest": [json.dumps(manifest)]})


def _existing_created_at(index_dir: str) -> float | None:
    """created_at of an already-committed manifest.json, if any."""
    try:
        with open(os.path.join(index_dir, "manifest.json")) as f:
            return json.load(f).get("created_at")
    except (OSError, ValueError):
        return None


def _completed_parts(index_dir: str, num_partitions: int) -> dict[int, dict]:
    """Partitions whose manifest verifies (files exist) — resume set."""
    done: dict[int, dict] = {}
    for pid in range(num_partitions):
        mp = seg.part_manifest_path(index_dir, pid)
        if not os.path.exists(mp):
            continue
        try:
            with open(mp) as f:
                m = json.load(f)
            if all(os.path.exists(os.path.join(index_dir, fn)) for fn in m["files"]):
                done[pid] = m
        except (json.JSONDecodeError, KeyError):
            continue
    return done


def build_index(
    ds,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    *,
    key_col: str = "url",
    text_col: str = "text",
    lang_col: str | None = "lang",
    html_col: str | None = "html",
    ts_col: str | None = "warc_ts",
    seq_col: str | None = None,
    id_col: str | None = None,
    routing_col: str | None = None,
    op_col: str | None = None,
    resume: bool = False,
) -> dict:
    """Build the full inverted index from a ray.data.Dataset; returns the
    global manifest (also written to {index_dir}/manifest.json).

    ``id_col`` (external ids): ids must be unique int64.  Keep them
    below ``cfg.part_stride`` (2^36 by default): incremental updates
    allocate delta doc ids at ``part * stride + rank`` and the
    newest-live-version rule is "highest doc_id wins", so an external id
    above the stride could outrank its own later update."""
    os.makedirs(index_dir, exist_ok=True)
    done = _completed_parts(index_dir, cfg.num_partitions) if resume else {}

    keep = [c for c in (key_col, lang_col, ts_col, seq_col, id_col, routing_col, op_col) if c]
    keep += [c for c in cfg.keyword_cols if c not in keep]
    keep += [c for c in cfg.numeric_cols if c not in keep]
    keep += [c for c in cfg.vector_cols if c not in keep]
    keep += [c for c in (cfg.text_fields or ()) if c not in keep]
    stage = ExtractStage(
        num_partitions=cfg.num_partitions,
        key_col=key_col,
        text_col=text_col,
        html_col=html_col,
        routing_col=routing_col,
        keep_cols=tuple(keep),
    )
    # extract runs as a task pool; unbounded by default so the pre-shuffle
    # phase can use every CPU (the groupby barrier means nothing else runs
    # concurrently with extract — capping it just idles cores)
    ds2 = ds.map_batches(
        stage,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.extract_concurrency,
    )
    if done:
        done_ids = set(done)
        ds2 = ds2.map_batches(
            lambda t: t.filter(
                ~np.isin(t.column("part_id").to_numpy(), np.array(sorted(done_ids)))
            ),
            batch_format="pyarrow",
        )

    def _build(g: pd.DataFrame) -> pd.DataFrame:
        return build_segment_for_group(
            g, index_dir, cfg, key_col, text_col, lang_col, ts_col, seq_col, id_col, op_col
        )

    out = ds2.groupby("part_id").map_groups(_build, batch_format="pandas")
    part_manifests = {int(r["part_id"]): json.loads(r["manifest"]) for r in out.take_all()}
    part_manifests.update(done)

    parts = sorted(part_manifests)
    n_docs = sum(m["n_docs"] for m in part_manifests.values())
    sum_dl = sum(m["sum_dl"] for m in part_manifests.values())
    # per-run metrics rollup — the MetricsUpdater counters analog
    # (reference MetricsUpdater.kt:3-15, Metrics.kt:24-83): totals per
    # build recorded in the manifest instead of a Prometheus registry
    metrics = {
        "input_rows": sum(m.get("n_input_rows", m["n_docs"]) for m in part_manifests.values()),
        "docs_indexed": n_docs,
        "postings": sum(m["n_postings"] for m in part_manifests.values()),
        "terms": sum(m["n_terms"] for m in part_manifests.values()),
        "partitions_built": len(parts) - len(done),
        "partitions_resumed": len(done),
        "group_build_secs_sum": round(sum(m.get("build_secs", 0) or 0 for m in part_manifests.values()), 3),
    }
    manifest = {
        "format_version": seg.FORMAT_VERSION,
        "analyzer_version": ANALYZER_VERSION,
        "num_partitions": cfg.num_partitions,
        # index creation wall-clock (the ES creation_date setting) — the
        # rollover max_age condition reads this; only a RESUMED build
        # keeps the original date (ES preserves creation_date); a fresh
        # rebuild into the same dir is a new index
        "created_at": (
            (resume and _existing_created_at(index_dir)) or round(time.time(), 3)
        ),
        "parts": parts,
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        "k1": cfg.k1,
        "b": cfg.b,
        # id mode: external ids (id_col) carry NO partition information —
        # doc_id-range partition tests are invalid on such indexes (the
        # incremental apply + point lookups read this flag); `routed`
        # records whether a routing_col (≠ key) decided partitions
        "external_ids": id_col is not None,
        "routed": routing_col is not None,
        # ES index mappings analog: the field schema lives WITH the index
        # so a searcher needs no out-of-band cfg (segments self-describe
        # via column prefixes; this is the declarative record)
        "mappings": {
            "keyword_cols": list(cfg.keyword_cols),
            "numeric_cols": list(cfg.numeric_cols),
            "vector_cols": list(cfg.vector_cols),
            "text_fields": list(cfg.text_fields or ()),
            "index_positions": bool(cfg.index_positions),
            "store_text": bool(cfg.store_text),
            # ES index.sort record: searchers detect the sorted layout
            "index_sort": list(cfg.index_sort) if cfg.index_sort else None,
        },
        "metrics": metrics,
        "part_manifests": {str(p): part_manifests[p] for p in parts},
        # multi-field stats (cfg.text_fields): per-field avgdl for the
        # per-field BM25 norm at query time
        **(
            {
                "text_fields": list(cfg.text_fields),
                "avgdl_fields": {
                    f: (
                        sum(
                            m.get("sum_dl_fields", {}).get(f, 0)
                            for m in part_manifests.values()
                        )
                        / n_docs
                        if n_docs
                        else 0.0
                    )
                    for f in cfg.text_fields
                },
            }
            if cfg.text_fields
            else {}
        ),
        # per-partition doc_id rank allocation counters: partition p has
        # allocated local ranks [0, alloc[p]).  Written at build time so
        # later merges can drop per-partition manifests without losing the
        # disjoint-range invariant that delta segments depend on.
        "alloc": {
            str(m.get("partition", p)): int(m["n_docs"])
            for p, m in part_manifests.items()
        },
    }
    seg.write_manifest(index_dir, manifest)
    return manifest
