"""Incremental index updates — delta segments + tombstones.

The reference sink runs FOREVER against a live index: every put() batch
upserts/deletes docs by _id and ES makes them visible at the next refresh
(ElasticsearchSinkTask.kt:256-280, refresh E5).  Batch-Ray translation,
faithful to the ES/Lucene model:

  * a new action batch becomes one DELTA SEGMENT per touched routing
    partition (never a rebuild of existing segments);
  * every key written or deleted tombstones its previous doc_id (found by
    a partition-local docstore lookup — the routing invariant guarantees
    a key's older versions live only in that partition's segments);
  * tombstoned docs disappear from results immediately; corpus stats stay
    stale until ``merge_index`` purges them — exactly ES visibility;
  * manifest update is the commit point ('refresh').

doc_id allocation: partition p's ranks continue from the manifest's
``alloc`` counter (gen-0 builds allocate [0, n_docs)), so delta doc ids
stay inside p's stride range, disjoint and ascending across generations.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from kafka_es_ray.config import DEFAULT, EngineConfig
from kafka_es_ray.functions.hashing import route_partition
from kafka_es_ray.index import segment as seg
from kafka_es_ray.index.build import build_segment_for_group
from kafka_es_ray.index.segment import read_manifest, write_manifest

DELTA_ID_BASE = 200000


def _segments_covering(manifest: dict, part: int) -> list[int]:
    """Segment ids that may hold docs of routing partition ``part``."""
    out = []
    for sid_str, m in manifest["part_manifests"].items():
        sid = int(sid_str)
        if "merged_from" in m:
            out.append(sid)  # merged segments may span partitions
        elif int(m.get("partition", sid)) == part:
            out.append(sid)
    return out


def _alloc_of(manifest: dict, part: int) -> int:
    alloc = manifest.get("alloc", {})
    if str(part) in alloc:
        return int(alloc[str(part)])
    # gen-0 fallback: ranks allocated == n_docs of the partition's segment
    m = manifest["part_manifests"].get(str(part))
    return int(m["n_docs"]) if m else 0


def apply_incremental(
    index_dir: str,
    docs_ds,
    cfg: EngineConfig = DEFAULT,
    *,
    key_col: str = "id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    seq_col: str | None = "seq",
    op_col: str | None = "op",
    routing_col: str | None = "routing",
) -> dict:
    """Apply a resolved doc/op batch to an existing index.

    ``docs_ds``: Dataset of rows (key, text, lang?, seq?, op?) where op
    'delete' rows tombstone the key and other rows upsert it.  Returns the
    updated global manifest."""
    manifest = read_manifest(index_dir)
    P = int(manifest["num_partitions"])
    stride = cfg.part_stride
    next_sid = int(manifest.get("next_segment_id", DELTA_ID_BASE))

    df = docs_ds.to_pandas() if hasattr(docs_ds, "to_pandas") else docs_ds.copy()
    if routing_col and routing_col in df.columns:
        rk = df[routing_col].where(~df[routing_col].isna(), df[key_col])
    else:
        rk = df[key_col]
    df = df.assign(part_id=route_partition(rk.to_numpy(), P))

    new_part_manifests: dict[int, dict] = {}
    tombstones_by_seg: dict[int, set[int]] = {}
    alloc_updates: dict[int, int] = {}
    seg_partition: dict[int, int] = {}

    for part, g in df.groupby("part_id"):
        part = int(part)
        affected_keys = set(g[key_col].astype(str))
        # partition-local lookup: old doc ids for every touched key
        for sid in _segments_covering(manifest, part):
            dt = pq.read_table(seg.docstore_path(index_dir, sid), columns=["doc_id", "key"])
            keys_arr = np.asarray(dt.column("key").to_pylist(), dtype=object)
            ids_arr = dt.column("doc_id").to_numpy()
            in_part = (ids_arr >= part * stride) & (ids_arr < (part + 1) * stride)
            hit = in_part & np.isin(keys_arr, list(affected_keys))
            if hit.any():
                tombstones_by_seg.setdefault(sid, set()).update(int(x) for x in ids_arr[hit])

        live = g if op_col is None or op_col not in g.columns else g[g[op_col] != "delete"]
        if len(live):
            sid = next_sid
            next_sid += 1
            rank_base = _alloc_of(manifest, part)
            out = build_segment_for_group(
                live.assign(part_id=part),
                index_dir,
                cfg,
                key_col,
                text_col,
                lang_col,
                None,
                seq_col if seq_col in g.columns else None,
                None,
                None,
                segment_id=sid,
                rank_base=rank_base,
            )
            m = json.loads(out["manifest"].iloc[0])
            new_part_manifests[sid] = m
            seg_partition[sid] = part
            alloc_updates[part] = rank_base + m["n_docs"]

    # write tombstone files (merged with any existing) BEFORE the manifest
    # commit so a crash leaves either the old manifest (tombstones ignored
    # for unknown segs is harmless) or the full update
    for sid, dead in tombstones_by_seg.items():
        tpath = seg.tombstones_path(index_dir, sid)
        if os.path.exists(tpath):
            with open(tpath) as f:
                dead |= set(json.load(f))
        seg.atomic_write_json(sorted(dead), tpath)

    pm = dict(manifest["part_manifests"])
    for sid, m in new_part_manifests.items():
        pm[str(sid)] = m
    parts = sorted(int(s) for s in pm)
    # ES semantics: stats include tombstoned docs until merge
    n_docs = sum(m["n_docs"] for m in pm.values())
    sum_dl = sum(m["sum_dl"] for m in pm.values())
    alloc = dict(manifest.get("alloc", {}))
    for part in range(P):
        alloc.setdefault(str(part), _alloc_of(manifest, part))
    for part, n in alloc_updates.items():
        alloc[str(part)] = n
    new_manifest = {
        **manifest,
        "parts": parts,
        "part_manifests": pm,
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        "alloc": alloc,
        "next_segment_id": next_sid,
        "tombstoned_docs": sorted(
            {d for s in tombstones_by_seg.values() for d in s}
            | set(manifest.get("tombstoned_docs", []))
        ),
    }
    write_manifest(index_dir, new_manifest)  # the 'refresh' commit point
    return new_manifest
