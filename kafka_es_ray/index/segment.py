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

FORMAT_VERSION = 1


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
    ProtobufSerde.kt:26-73)."""

    part_id: int
    terms: np.ndarray        # object array, ascending
    df: np.ndarray           # int64
    doc_ids_enc: list        # bytes per term
    tfs_enc: list
    block_max_tf_enc: list   # bytes per term (uint32 LE per block)
    block_min_dl_enc: list
    block_last_doc_enc: list
    doc_base: int            # doc ids in docstore are arbitrary; base/dense see below
    doc_ids_store: np.ndarray   # int64, ascending
    doc_len: np.ndarray      # int32 aligned with doc_ids_store
    keys: np.ndarray         # object (urls) aligned with doc_ids_store
    langs: np.ndarray        # object, aligned with doc_ids_store
    texts: np.ndarray | None  # stored _source text when cfg.store_text
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
        return cls(
            part_id=part_id,
            terms=np.asarray(pt.column("term").to_pylist(), dtype=object),
            df=pt.column("df").to_numpy(),
            doc_ids_enc=pt.column("doc_ids").to_pylist(),
            tfs_enc=pt.column("tfs").to_pylist(),
            block_max_tf_enc=pt.column("block_max_tf").to_pylist(),
            block_min_dl_enc=pt.column("block_min_dl").to_pylist(),
            block_last_doc_enc=pt.column("block_last_doc").to_pylist(),
            doc_base=int(doc_ids_store[0]) if doc_ids_store.size else 0,
            doc_ids_store=doc_ids_store,
            doc_len=doc_len.astype(np.int64),
            keys=np.asarray(dt.column("key").to_pylist(), dtype=object),
            langs=np.asarray(dt.column("lang").to_pylist(), dtype=object),
            texts=(
                np.asarray(dt.column("text").to_pylist(), dtype=object)
                if "text" in dt.schema.names
                else None
            ),
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

    def lookup(self, term: str) -> int:
        """Dictionary binary search -> term index, or -1."""
        i = int(np.searchsorted(self.terms, term))
        if i < self.terms.size and self.terms[i] == term:
            return i
        return -1

    def postings(self, ti: int) -> tuple[np.ndarray, np.ndarray]:
        ids, tfs, _ = self.postings_with_dl(ti)
        return ids, tfs

    def postings_with_dl(self, ti: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, dl) decoded, LRU-cached per actor."""
        hit = self._cache.get(ti)
        if hit is not None:
            self._cache.move_to_end(ti)
            return hit
        n = int(self.df[ti])
        ids = delta_decode(self.doc_ids_enc[ti], n)
        tfs = varint_decode(self.tfs_enc[ti], n).astype(np.int64)
        dl = self.dl_for(ids)
        entry = (ids, tfs, dl)
        self._cache[ti] = entry
        self._cache_postings += n
        while self._cache_postings > self._cache_cap and len(self._cache) > 1:
            _, (old_ids, _, _) = self._cache.popitem(last=False)
            self._cache_postings -= old_ids.size
        return entry

    def block_meta(self, ti: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(block_max_tf, block_min_dl, block_last_doc) for one term —
        the block-max arrays written at build time."""
        return (
            np.frombuffer(self.block_max_tf_enc[ti], dtype=np.uint32),
            np.frombuffer(self.block_min_dl_enc[ti], dtype=np.uint32),
            np.frombuffer(self.block_last_doc_enc[ti], dtype=np.uint64),
        )

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

    def dl_for(self, doc_ids: np.ndarray) -> np.ndarray:
        """doc_len lookup; doc ids within a segment are dense-sortable so
        this is a searchsorted over the docstore ids."""
        idx = np.searchsorted(self.doc_ids_store, doc_ids)
        return self.doc_len[idx]

    def keys_for(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.doc_ids_store, doc_ids)
        return self.keys[idx]

    def langs_for(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.doc_ids_store, doc_ids)
        return self.langs[idx]

    def texts_for(self, doc_ids: np.ndarray) -> np.ndarray:
        """Stored _source fetch; requires the index was built with
        cfg.store_text=True."""
        if self.texts is None:
            raise ValueError("index was built without store_text=True")
        idx = np.searchsorted(self.doc_ids_store, doc_ids)
        return self.texts[idx]


def read_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def write_manifest(index_dir: str, manifest: dict) -> None:
    atomic_write_json(manifest, os.path.join(index_dir, "manifest.json"))
