"""Segment format: the on-disk unit of the inverted index.

One segment per doc partition ("shard") — the ES-segment analog the
reference sink feeds via /_bulk (reference ElasticsearchBulkSender.kt:100-243;
SURVEY §1.2 segment row).  A segment is two parquet files plus a JSON
manifest, written atomically (tmp + rename) so a partial write is never
visible — the manifest is the visibility point, the `refresh=true` analog
(reference ElasticsearchBulkSender.kt:109-118, SURVEY §2 E5):

  postings-{part:05d}.parquet
      term: string (ascending — binary-searchable dictionary)
      df: int64                    docs containing term (within segment)
      doc_ids: binary              delta + varint, sorted ascending
      tfs: binary                  varint
      block_max_tf: binary         uint32 LE per 128-posting block  |
      block_min_dl: binary         uint32 LE per block              | block-max
      block_last_doc: binary       uint64 LE per block (skip ptrs)  | metadata

  docstore-{part:05d}.parquet
      doc_id: int64, key: string (url), doc_len: int32, lang: string

  part-{part:05d}.manifest.json    lineage + stats + content hash

Block-max bound: BM25's tf term  tf/(tf + k1*(1-b+b*dl/avgdl))  is
increasing in tf and decreasing in dl, so  f(block_max_tf, block_min_dl)
is an exact-safe upper bound per block for any global avgdl — usable for
block-max WAND pruning without knowing avgdl at build time.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from kafka_es_ray.functions.codec import delta_decode, varint_decode
from kafka_es_ray.functions.hashing import stable_hash64

# v2: postings table gains block_id_boff / block_tf_boff (per-block BYTE
# offsets into each term's varint blobs) — the seekable half of the skip
# pointers, enabling selective per-block decode at query time.
FORMAT_VERSION = 2


def _combined(col) -> pa.Array:
    """pq column (ChunkedArray) -> one contiguous Array."""
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def binary_column_view(arr) -> np.ndarray:
    """Zero-copy uint8 view of ALL values of a (Large)Binary column,
    concatenated — the whole-segment varint stream for vectorized decode
    (merge path).  No per-term Python bytes objects are created."""
    arr = _combined(arr)
    bufs = arr.buffers()
    width = 8 if pa.types.is_large_binary(arr.type) else 4
    odt = np.int64 if width == 8 else np.int32
    off = np.frombuffer(bufs[1], dtype=odt, count=len(arr) + 1, offset=arr.offset * width)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data[off[0] : off[-1]]


def postings_path(index_dir: str, part_id: int) -> str:
    return os.path.join(index_dir, f"postings-{part_id:05d}.parquet")


def docstore_path(index_dir: str, part_id: int) -> str:
    return os.path.join(index_dir, f"docstore-{part_id:05d}.parquet")


def part_manifest_path(index_dir: str, part_id: int) -> str:
    return os.path.join(index_dir, f"part-{part_id:05d}.manifest.json")


def tombstones_path(index_dir: str, part_id: int) -> str:
    return os.path.join(index_dir, f"tombstones-{part_id:05d}.json")


def gen_tombstones_path(index_dir: str, part_id: int, gen: int) -> str:
    """Generation-suffixed tombstone file: one per (segment, apply run).
    Visibility is manifest-gated — only files listed under the manifest's
    ``tombstones[sid]`` are applied at load (crash-safety: a file written
    by an apply that never committed stays invisible)."""
    return os.path.join(index_dir, f"tombstones-{part_id:05d}.g{gen:06d}.json")


def manifest_tombstone_files(manifest: dict, part_id: int) -> list[str]:
    """The manifest-listed tombstone files for one segment (may be [])."""
    return manifest.get("tombstones", {}).get(str(part_id), [])


def _with_retries(fn, retries: int, delay_s: float):
    """In-actor write retry with backoff — the reference writer's retry
    loop (Actors.kt:236-259: retryDelay doubling up to a cap).  Local-FS
    writes fail rarely; transient errors (NFS blips, ENOSPC races) get
    ``retries`` more attempts with doubling delay."""
    import time as _time

    attempt = 0
    while True:
        try:
            return fn()
        except OSError:
            if attempt >= retries:
                raise
            _time.sleep(delay_s * (2**attempt))
            attempt += 1


def atomic_write_table(
    table: pa.Table,
    path: str,
    compression: str = "zstd",
    retries: int = 3,
    retry_delay_s: float = 0.1,
) -> None:
    """Write-to-tmp + rename — a failed task never leaves a readable
    partial file (resumability, SURVEY §4 checkpoint row)."""

    def _write():
        tmp = path + ".tmp"
        pq.write_table(table, tmp, compression=compression)
        os.replace(tmp, path)

    _with_retries(_write, retries, retry_delay_s)


def atomic_write_json(obj, path: str, retries: int = 3, retry_delay_s: float = 0.1) -> None:
    def _write():
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, sort_keys=True)
        os.replace(tmp, path)

    _with_retries(_write, retries, retry_delay_s)


@dataclass
class Segment:
    """In-memory view of one segment, loaded once per query actor
    (the stateful-setup analog of the reference's reflected proto parser,
    ProtobufSerde.kt:26-73).

    The dictionary and docstore string columns stay ARROW-NATIVE at load:
    no n_terms/n_docs Python-object materialization.  Term lookup is a
    byte-wise binary search over the Arrow string buffers (UTF-8 byte
    order == code-point order == the build's sort order); key/lang/text
    fetches Arrow-`take` only the requested rows.  The numpy object views
    (``.terms``/``.keys``/``.langs``/``.texts``) are lazy cached
    properties for the whole-segment consumers (merge, tests)."""

    part_id: int
    terms_arr: pa.Array      # string, ascending
    df: np.ndarray           # int64
    # Arrow-backed LAZY columns: one contiguous (Large)Binary array each;
    # a term's blob is sliced out only when that term is actually looked
    # up (loading a segment never materializes n_terms Python objects)
    doc_ids_enc: pa.Array    # varint delta gaps per term
    tfs_enc: pa.Array
    block_max_tf_enc: pa.Array   # uint32 LE per block
    block_min_dl_enc: pa.Array
    block_last_doc_enc: pa.Array
    block_id_boff_enc: pa.Array | None   # uint32 LE per block (format v2)
    block_tf_boff_enc: pa.Array | None
    positions_enc: pa.Array | None       # per-term delta+varint position runs (cfg.index_positions)
    doc_base: int            # doc ids in docstore are arbitrary; base/dense see below
    doc_ids_store: np.ndarray   # int64, ascending
    doc_len: np.ndarray      # int32 aligned with doc_ids_store
    keys_arr: pa.Array       # string (urls) aligned with doc_ids_store
    langs_arr: pa.Array      # string, aligned with doc_ids_store
    texts_arr: pa.Array | None  # stored _source text when cfg.store_text
    key_hash: np.ndarray     # uint64 stable_hash64(key), aligned (sorted-key mget)
    kw_arr: dict             # extra keyword columns {field: pa.Array} (cfg.keyword_cols)
    # numeric-mapped fields {field: float64 ndarray aligned with
    # doc_ids_store} (cfg.numeric_cols) — range filters + sort-by-field;
    # plain numpy (8 B/doc, no PyObjects) so vectorized compares are free
    num_arr: dict            # {field: np.ndarray}
    # dense-vector fields {field: pa.ListArray of float32 aligned with
    # doc_ids_store} (cfg.vector_cols) — exact kNN; matrix materialized
    # lazily per field (vectors_for) and cached on the instance
    vec_arr: dict            # {field: pa.Array}
    # multi-field per-field token counts {field: int64 array aligned with
    # doc_ids_store} (cfg.text_fields) — BM25 norms for prefixed terms
    field_dl: dict           # {field: np.ndarray}
    n_docs: int
    sum_dl: int
    # deleted-but-not-yet-merged doc ids (sorted; the Lucene deleted-docs
    # bitmap analog).  Stats (df, N, avgdl) still include them until a
    # merge purges — faithful to ES visibility semantics.
    tombstones: np.ndarray = None  # type: ignore[assignment]

    @classmethod
    def load(
        cls, index_dir: str, part_id: int, tombstone_files: list[str] | None = None
    ) -> "Segment":
        """``tombstone_files``: the manifest-listed tombstone file names for
        this segment (visibility is MANIFEST-GATED — a tombstone file written
        by a crashed apply that never committed its manifest must stay
        invisible, else deletes become visible before their replacement delta
        segment).  ``None`` = legacy fallback: read the unsuffixed
        tombstones-{part}.json if present (pre-gating format)."""
        pt = pq.read_table(postings_path(index_dir, part_id))
        dt = pq.read_table(docstore_path(index_dir, part_id))
        dead: set[int] = set()
        if tombstone_files is None:
            tpath = tombstones_path(index_dir, part_id)
            if os.path.exists(tpath):
                with open(tpath) as f:
                    dead.update(json.load(f))
        else:
            for fname in tombstone_files:
                with open(os.path.join(index_dir, os.path.basename(fname))) as f:
                    dead.update(json.load(f))
        tombstones = np.array(sorted(dead), dtype=np.int64)
        doc_ids_store = dt.column("doc_id").to_numpy()
        doc_len = dt.column("doc_len").to_numpy()
        has_boff = "block_id_boff" in pt.schema.names  # format v2
        keys_arr = _combined(dt.column("key"))
        if "key_hash" in dt.schema.names:
            key_hash = dt.column("key_hash").to_numpy().astype(np.uint64)
        else:
            # legacy segment (pre key_hash column): hash the keys once at
            # load — materializes the key column, acceptable legacy cost
            key_hash = (
                stable_hash64(np.asarray(keys_arr.to_pylist(), dtype=object))
                if len(keys_arr)
                else np.array([], dtype=np.uint64)
            )
        return cls(
            part_id=part_id,
            terms_arr=_combined(pt.column("term")),
            df=pt.column("df").to_numpy(),
            doc_ids_enc=_combined(pt.column("doc_ids")),
            tfs_enc=_combined(pt.column("tfs")),
            block_max_tf_enc=_combined(pt.column("block_max_tf")),
            block_min_dl_enc=_combined(pt.column("block_min_dl")),
            block_last_doc_enc=_combined(pt.column("block_last_doc")),
            block_id_boff_enc=_combined(pt.column("block_id_boff")) if has_boff else None,
            block_tf_boff_enc=_combined(pt.column("block_tf_boff")) if has_boff else None,
            positions_enc=(
                _combined(pt.column("positions")) if "positions" in pt.schema.names else None
            ),
            doc_base=int(doc_ids_store[0]) if doc_ids_store.size else 0,
            doc_ids_store=doc_ids_store,
            doc_len=doc_len.astype(np.int64),
            keys_arr=keys_arr,
            langs_arr=_combined(dt.column("lang")),
            texts_arr=(
                _combined(dt.column("text")) if "text" in dt.schema.names else None
            ),
            key_hash=key_hash,
            kw_arr={
                n[3:]: _combined(dt.column(n))
                for n in dt.schema.names
                if n.startswith("kw_")
            },
            num_arr={
                n[4:]: dt.column(n).to_numpy().astype(np.float64)
                for n in dt.schema.names
                if n.startswith("num_")
            },
            vec_arr={
                n[4:]: _combined(dt.column(n))
                for n in dt.schema.names
                if n.startswith("vec_")
            },
            field_dl={
                n[3:]: dt.column(n).to_numpy().astype(np.int64)
                for n in dt.schema.names
                if n.startswith("fl_")
            },
            n_docs=dt.num_rows,
            sum_dl=int(doc_len.sum()),
            tombstones=tombstones,
        )

    def __post_init__(self):
        # decoded-postings LRU: a query actor serves many queries; hot
        # (typically head) terms decode once per actor, not once per query
        # (stateful-worker amortization, the reference's parser-built-once
        # rule ProtobufSerde.kt:26-73).  Cap bounds memory.
        from collections import OrderedDict

        self._cache: OrderedDict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = OrderedDict()
        self._cache_postings = 0
        self._cache_cap = 20_000_000  # decoded postings entries per segment
        self._ub_cache: dict[int, float] = {}
        # observability: total postings decoded by this segment object
        # (tests assert skip pointers actually reduce decode work)
        self.decoded_postings = 0
        # lazy numpy materializations (merge/tests only; queries never
        # trigger these) + lazy sorted-key-hash order for mget
        self._terms_np: np.ndarray | None = None
        self._keys_np: np.ndarray | None = None
        self._langs_np: np.ndarray | None = None
        self._texts_np: np.ndarray | None = None
        self._term_view: tuple[np.ndarray, np.ndarray] | None = None
        self._kh_order: np.ndarray | None = None

    # ---- lazy whole-column numpy views (merge path / tests) ----
    @property
    def terms(self) -> np.ndarray:
        if self._terms_np is None:
            self._terms_np = np.asarray(self.terms_arr.to_pylist(), dtype=object)
        return self._terms_np

    @property
    def keys(self) -> np.ndarray:
        if self._keys_np is None:
            self._keys_np = np.asarray(self.keys_arr.to_pylist(), dtype=object)
        return self._keys_np

    @property
    def langs(self) -> np.ndarray:
        if self._langs_np is None:
            self._langs_np = np.asarray(self.langs_arr.to_pylist(), dtype=object)
        return self._langs_np

    @property
    def texts(self) -> np.ndarray | None:
        if self.texts_arr is None:
            return None
        if self._texts_np is None:
            self._texts_np = np.asarray(self.texts_arr.to_pylist(), dtype=object)
        return self._texts_np

    def _string_view(self, arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(offsets, uint8 data) zero-copy view of an Arrow string array."""
        bufs = arr.buffers()
        width = 8 if pa.types.is_large_string(arr.type) else 4
        odt = np.int64 if width == 8 else np.int32
        off = np.frombuffer(
            bufs[1], dtype=odt, count=len(arr) + 1, offset=arr.offset * width
        ).astype(np.int64)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.array([], dtype=np.uint8)
        )
        return off, data

    def lookup(self, term: str) -> int:
        """Dictionary binary search -> term index, or -1.  Runs directly
        over the Arrow string buffers (UTF-8 byte order == code-point
        order == the build's sort order) — no dictionary
        materialization."""
        if self._terms_np is not None:  # already materialized (merge path)
            i = int(np.searchsorted(self._terms_np, term))
            if i < self._terms_np.size and self._terms_np[i] == term:
                return i
            return -1
        lo = self._term_lower_bound(term.encode("utf-8"))
        if lo < len(self.terms_arr):
            off, data = self._term_view
            if data[off[lo] : off[lo + 1]].tobytes() == term.encode("utf-8"):
                return lo
        return -1

    def _term_lower_bound(self, tb: bytes) -> int:
        """First dictionary index whose term >= tb (byte order == the
        build's sort order) — shared by exact lookup and prefix ranges."""
        if self._term_view is None:
            self._term_view = self._string_view(self.terms_arr)
        off, data = self._term_view
        lo, hi = 0, len(self.terms_arr)
        while lo < hi:
            mid = (lo + hi) // 2
            if data[off[mid] : off[mid + 1]].tobytes() < tb:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def term_prefix_range(self, prefix: str) -> tuple[int, int]:
        """Dictionary index range [lo, hi) of terms starting with
        ``prefix`` (ES prefix-query expansion unit).  The sorted
        dictionary makes this two binary searches; hi's probe is the
        prefix's byte-successor (increment last non-0xff byte)."""
        pb = prefix.encode("utf-8")
        if self._terms_np is not None:  # merge path: numpy object array
            lo = int(np.searchsorted(self._terms_np, prefix))
            hi = int(np.searchsorted(self._terms_np, prefix + chr(0x10FFFF)))
            return lo, hi
        lo = self._term_lower_bound(pb)
        q = bytearray(pb)
        while q and q[-1] == 0xFF:
            q.pop()
        if not q:
            return lo, len(self.terms_arr)
        q[-1] += 1
        return lo, self._term_lower_bound(bytes(q))

    def find_keys(self, want: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Docstore rows whose key is in ``want`` (object array) — the
        sorted-key-hash point lookup for mget: binary search the uint64
        key hashes, then verify the (few) candidate rows' actual keys via
        Arrow take.  Returns (row_idx, want_idx) pairs.  O(|want| log n)
        instead of an O(n_docs) full key scan."""
        if want.size == 0 or self.n_docs == 0:
            return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
        if self._kh_order is None:
            self._kh_order = np.argsort(self.key_hash, kind="stable")
        order = self._kh_order
        sorted_kh = self.key_hash[order]
        wh = stable_hash64(want)
        lo = np.searchsorted(sorted_kh, wh, side="left")
        hi = np.searchsorted(sorted_kh, wh, side="right")
        n_cand = hi - lo
        if n_cand.sum() == 0:
            return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
        want_idx = np.repeat(np.arange(want.size, dtype=np.int64), n_cand)
        starts = np.zeros(want.size, dtype=np.int64)
        np.cumsum(n_cand[:-1], out=starts[1:])
        rel = np.arange(int(n_cand.sum()), dtype=np.int64) - np.repeat(starts, n_cand)
        rows = order[np.repeat(lo, n_cand) + rel]
        # hash-collision guard: verify the candidates' actual keys
        cand_keys = np.asarray(
            self.keys_arr.take(pa.array(rows, type=pa.int64())).to_pylist(), dtype=object
        )
        ok = cand_keys == want[want_idx]
        return rows[ok], want_idx[ok]

    def postings(self, ti: int) -> tuple[np.ndarray, np.ndarray]:
        ids, tfs, _ = self.postings_with_dl(ti)
        return ids, tfs

    def postings_with_dl(
        self, ti: int, field: str | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, dl) decoded, LRU-cached per actor.  ``field``
        (multi-field index, prefixed term) picks that field's length
        column as dl."""
        ck = ti if field is None else (ti, field)
        hit = self._cache.get(ck)
        if hit is not None:
            self._cache.move_to_end(ck)
            return hit
        n = int(self.df[ti])
        ids = delta_decode(self.doc_ids_enc[ti].as_py(), n)
        tfs = varint_decode(self.tfs_enc[ti].as_py(), n).astype(np.int64)
        dl = self.dl_for(ids, field)
        self.decoded_postings += n
        entry = (ids, tfs, dl)
        self._cache[ck] = entry
        self._cache_postings += n
        while self._cache_postings > self._cache_cap and len(self._cache) > 1:
            _, (old_ids, _, _) = self._cache.popitem(last=False)
            self._cache_postings -= old_ids.size
        return entry

    def positions_for(self, ti: int) -> tuple[np.ndarray, np.ndarray]:
        """(flat_positions, run_starts) for term ``ti`` — run p (aligned
        with the p-th posting of postings_with_dl) holds tf[p] ascending
        token positions.  Requires an index built with
        cfg.index_positions=True."""
        if self.positions_enc is None:
            raise ValueError(
                "index was built without index_positions=True (phrase queries need positions)"
            )
        _, tfs, _ = self.postings_with_dl(ti)
        total = int(tfs.sum())
        gaps = varint_decode(self.positions_enc[ti].as_py(), total).astype(np.int64)
        run_starts = np.zeros(tfs.size, dtype=np.int64)
        if tfs.size:
            np.cumsum(tfs[:-1], out=run_starts[1:])
        csum = np.cumsum(gaps)
        base = np.repeat(csum[run_starts] - gaps[run_starts], tfs)
        return csum - base, run_starts

    def block_meta(self, ti: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(block_max_tf, block_min_dl, block_last_doc) for one term —
        the block-max arrays written at build time."""
        return (
            np.frombuffer(self.block_max_tf_enc[ti].as_py(), dtype=np.uint32),
            np.frombuffer(self.block_min_dl_enc[ti].as_py(), dtype=np.uint32),
            np.frombuffer(self.block_last_doc_enc[ti].as_py(), dtype=np.uint64),
        )

    def lookup_postings(
        self, ti: int, cand: np.ndarray, field: str | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Membership probe of ``cand`` (sorted doc ids) against term
        ``ti``'s postings WITHOUT decoding the whole list: block-last-doc
        skip pointers name the single block that can contain each
        candidate; per-block byte offsets (format v2) let us decode only
        those blocks.  Returns (hit mask over cand, tf[hit], dl[hit]).
        Exact: a block's gaps re-anchor on the previous block's last doc,
        so selective decode reconstructs absolute ids.

        Falls back to the full (cached) decode when the term is already
        cached, when most blocks are needed anyway, or on v1 segments."""
        blast = np.frombuffer(self.block_last_doc_enc[ti].as_py(), dtype=np.uint64).astype(
            np.int64
        )
        n_blocks = blast.size
        cached = self._cache.get(ti if field is None else (ti, field))
        # which block could contain each candidate (first block whose
        # last doc >= cand); out-of-range candidates match no block
        bidx = np.searchsorted(blast, cand)
        valid = bidx < n_blocks
        blocks = np.unique(bidx[valid])
        use_full = (
            cached is not None
            or self.block_id_boff_enc is None
            or n_blocks == 0
            or blocks.size * 2 >= n_blocks  # selective wouldn't save much
        )
        if use_full:
            ids, tfs, dl = self.postings_with_dl(ti, field)
            pos = np.searchsorted(ids, cand)
            pos_c = np.minimum(pos, ids.size - 1)
            hit = ids[pos_c] == cand
            ph = pos_c[hit]
            return hit, tfs[ph], dl[ph]

        id_blob = self.doc_ids_enc[ti].as_py()
        tf_blob = self.tfs_enc[ti].as_py()
        id_boff = np.frombuffer(self.block_id_boff_enc[ti].as_py(), dtype=np.uint32).astype(
            np.int64
        )
        tf_boff = np.frombuffer(self.block_tf_boff_enc[ti].as_py(), dtype=np.uint32).astype(
            np.int64
        )
        id_end = np.concatenate([id_boff[1:], [len(id_blob)]])
        tf_end = np.concatenate([tf_boff[1:], [len(tf_blob)]])
        id_buf = b"".join(id_blob[id_boff[b] : id_end[b]] for b in blocks)
        tf_buf = b"".join(tf_blob[tf_boff[b] : tf_end[b]] for b in blocks)
        # per-block posting counts = varint terminator bytes per byte run
        raw = np.frombuffer(id_buf, dtype=np.uint8)
        is_term = (raw & 0x80) == 0
        lens = (id_end[blocks] - id_boff[blocks]).astype(np.int64)
        run_byte_starts = np.zeros(blocks.size, dtype=np.int64)
        np.cumsum(lens[:-1], out=run_byte_starts[1:])
        counts = np.add.reduceat(is_term.astype(np.int64), run_byte_starts)
        total = int(counts.sum())
        gaps = varint_decode(raw, total).astype(np.int64)
        tfs_sel = varint_decode(tf_buf, total).astype(np.int64)
        self.decoded_postings += total
        # re-anchor each run: absolute id = prev block's last doc + cumsum
        run_starts = np.zeros(blocks.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=run_starts[1:])
        anchors = np.where(blocks > 0, blast[np.maximum(blocks - 1, 0)], 0)
        csum = np.cumsum(gaps)
        base = np.repeat(csum[run_starts] - gaps[run_starts] - anchors, counts)
        ids_sel = csum - base
        pos = np.searchsorted(ids_sel, cand)
        pos_c = np.minimum(pos, ids_sel.size - 1) if ids_sel.size else pos * 0
        hit = (ids_sel[pos_c] == cand) if ids_sel.size else np.zeros(cand.size, dtype=bool)
        ph = pos_c[hit]
        return hit, tfs_sel[ph], self.dl_for(ids_sel[ph], field)

    def term_score_ub(self, ti: int, avgdl: float, k1: float, b: float) -> float:
        """Exact-safe per-term upper bound of the BM25 tf-part within this
        segment: max over blocks of f(block_max_tf, block_min_dl).  f is
        increasing in tf and decreasing in dl, so this dominates every
        posting's true tf-part for ANY avgdl (see index/segment.py header).
        Cached per term."""
        hit = self._ub_cache.get(ti)
        if hit is not None:
            return hit
        btf, bdl, _ = self.block_meta(ti)
        if btf.size == 0:
            ub = 0.0
        else:
            tf = btf.astype(np.float64)
            dl = bdl.astype(np.float64)
            ub = float(np.max(tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))))
        self._ub_cache[ti] = ub
        return ub

    def dl_for(self, doc_ids: np.ndarray, field: str | None = None) -> np.ndarray:
        """doc_len lookup; doc ids within a segment are dense-sortable so
        this is a searchsorted over the docstore ids.  ``field`` selects a
        per-field length column (multi-field index)."""
        idx = np.searchsorted(self.doc_ids_store, doc_ids)
        return (self.doc_len if field is None else self.field_dl[field])[idx]

    def _take_str(self, arr: pa.Array, idx: np.ndarray) -> np.ndarray:
        """Fetch only the requested rows of a string column (Arrow take);
        the whole column is never materialized unless a lazy property
        already did it (merge path)."""
        return np.asarray(
            arr.take(pa.array(idx, type=pa.int64())).to_pylist(), dtype=object
        )

    def keys_for(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.doc_ids_store, doc_ids)
        if self._keys_np is not None:
            return self._keys_np[idx]
        return self._take_str(self.keys_arr, idx)

    def langs_for(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.doc_ids_store, doc_ids)
        if self._langs_np is not None:
            return self._langs_np[idx]
        return self._take_str(self.langs_arr, idx)

    def nums_for(self, field: str, doc_ids: np.ndarray) -> np.ndarray:
        """Numeric-field fetch (cfg.numeric_cols) for range filters /
        sort-by-field; NaN = missing."""
        if field not in self.num_arr:
            raise ValueError(
                f"unsupported numeric field {field!r} "
                f"(docstore has: {sorted(self.num_arr) or 'none'})"
            )
        idx = np.searchsorted(self.doc_ids_store, doc_ids)
        return self.num_arr[field][idx]

    def field_for(self, field: str, doc_ids: np.ndarray) -> np.ndarray:
        """Docstore keyword-field fetch for a terms aggregation: 'lang'
        (built-in) or any cfg.keyword_cols field stored at build time."""
        if field == "lang":
            return self.langs_for(doc_ids)
        if field not in self.kw_arr:
            raise ValueError(
                f"unsupported aggregation field {field!r} "
                f"(docstore has: lang{', ' if self.kw_arr else ''}"
                f"{', '.join(sorted(self.kw_arr))})"
            )
        idx = np.searchsorted(self.doc_ids_store, doc_ids)
        return self._take_str(self.kw_arr[field], idx)

    def vectors_for(self, field: str) -> tuple[np.ndarray, np.ndarray]:
        """Dense-vector matrix for a mapped field: (rows, matrix) where
        ``rows`` indexes doc_ids_store rows holding a non-null vector and
        ``matrix`` is float32 (len(rows) x dim).  Constant dim enforced
        (the ES dense_vector mapping contract).  Cached per field — a
        query actor serves many kNN batches per segment."""
        import pyarrow.compute as pc

        if field not in self.vec_arr:
            raise ValueError(
                f"unmapped dense_vector field {field!r} "
                f"(docstore has: {sorted(self.vec_arr) or 'none'})"
            )
        cache = self.__dict__.setdefault("_vec_cache", {})
        if field not in cache:
            arr = self.vec_arr[field]
            valid = ~np.asarray(arr.is_null())
            rows = np.flatnonzero(valid)
            if rows.size:
                taken = arr.take(pa.array(rows, type=pa.int64()))
                lens = np.unique(
                    pc.list_value_length(taken).to_numpy(zero_copy_only=False)
                )
                if lens.size != 1:
                    raise ValueError(
                        f"dense_vector field {field!r} has ragged dims {lens}"
                    )
                flat = np.asarray(taken.flatten(), dtype=np.float32)
                mat = flat.reshape(rows.size, int(lens[0]))
            else:
                mat = np.zeros((0, 0), dtype=np.float32)
            cache[field] = (rows, mat)
        return cache[field]

    def texts_for(self, doc_ids: np.ndarray) -> np.ndarray:
        """Stored _source fetch; requires the index was built with
        cfg.store_text=True."""
        if self.texts_arr is None:
            raise ValueError("index was built without store_text=True")
        idx = np.searchsorted(self.doc_ids_store, doc_ids)
        if self._texts_np is not None:
            return self._texts_np[idx]
        return self._take_str(self.texts_arr, idx)


def read_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def write_manifest(index_dir: str, manifest: dict) -> None:
    atomic_write_json(manifest, os.path.join(index_dir, "manifest.json"))
