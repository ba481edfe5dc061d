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
  * tombstone visibility is MANIFEST-GATED: each apply writes
    generation-suffixed tombstone files and lists them in the manifest;
    a crash after the file write but before the manifest commit leaves
    the files invisible (no delete-without-replacement window);
  * corpus stats stay stale until ``merge_index`` purges tombstoned docs
    — exactly ES visibility;
  * manifest update is the commit point ('refresh').

Scale shape: the per-partition work (docstore lookup, orphan-update
resolution, delta-segment build) runs as ``groupby(part_id).map_groups``
Ray tasks — the same ONE-shuffle shape as the full build; the driver only
unions tombstone id sets and commits the manifest.

doc_id allocation: partition p's ranks continue from the manifest's
``alloc`` counter (gen-0 builds allocate [0, n_docs)), so delta doc ids
stay inside p's stride range, disjoint and ascending across generations.
Delta segment ids are the deterministic function ``next_segment_id +
part_id`` (each apply reserves num_partitions ids), so a crashed-and-
retried apply rebuilds byte-identical segments under the same names.
"""

from __future__ import annotations

import json
import os
from dataclasses import replace

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
            # merged segments record their covered partition set; only
            # touch the ones that can hold this partition's docs (legacy
            # merged manifests without the list are scanned conservatively)
            parts_ = m.get("partitions")
            if parts_ is None or part in parts_:
                out.append(sid)
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


def _apply_one_partition(
    g: pd.DataFrame,
    index_dir: str,
    manifest: dict,
    cfg: EngineConfig,
    key_col: str,
    text_col: str,
    lang_col: str | None,
    seq_col: str | None,
    op_col: str | None,
    next_sid: int,
) -> pd.DataFrame:
    """One routing partition's delta: docstore lookup (old doc ids to
    tombstone + stored text for orphan updates), delta-segment build.
    Returns small rows: kind in {'manifest','tombstones','metrics'}."""
    part = int(g["part_id"].iloc[0])
    stride = cfg.part_stride
    affected_keys = set(g[key_col].astype(str))

    has_updates = bool(
        op_col
        and op_col in g.columns
        and ((g[op_col] == "update") | (g[op_col] == "upsert")).any()
    )
    tombstones: set[int] = set()
    dead_by_seg: dict[int, list[int]] = {}
    # live (non-tombstoned) versions of affected keys, for orphan-update
    # resolution: existence (ES document_missing check) tracked always,
    # stored text only when the docstore carries it (store_text=True)
    live_key_ids: dict[str, int] = {}          # key -> newest live doc_id
    stored_text: dict[str, tuple[int, str]] = {}  # key -> (doc_id, text)
    for sid in _segments_covering(manifest, part):
        # previously-tombstoned ids of THIS segment (manifest-listed gen
        # files, loaded worker-side — the driver never materializes a
        # global tombstone id set)
        already_dead: set[int] = set()
        for fname in seg.manifest_tombstone_files(manifest, sid):
            with open(os.path.join(index_dir, os.path.basename(fname))) as f:
                already_dead.update(json.load(f))
        cols = ["doc_id", "key"]
        dpath = seg.docstore_path(index_dir, sid)
        has_text = has_updates and "text" in pq.read_schema(dpath).names
        if has_text:
            cols.append("text")
        dt = pq.read_table(dpath, columns=cols)
        keys_arr = np.asarray(dt.column("key").to_pylist(), dtype=object)
        ids_arr = dt.column("doc_id").to_numpy()
        # which of this segment's docs belong to routing partition `part`?
        # Internal strided ids encode it; EXTERNAL ids (id_col builds)
        # carry no partition information, so the doc_id-range test is
        # invalid there (it silently no-ops every delete outside part 0)
        m_seg = manifest["part_manifests"].get(str(sid), {})
        multi_part = len(m_seg.get("partitions", [sid])) > 1
        if not manifest.get("external_ids", False):
            in_part = (ids_arr >= part * stride) & (ids_arr < (part + 1) * stride)
        elif not multi_part:
            # unmerged segment: every doc IS this partition's by build
            in_part = np.ones(ids_arr.size, dtype=bool)
        elif not manifest.get("routed", False):
            # merged multi-partition segment, key-routed build: recompute
            # the routing of the stored keys
            from kafka_es_ray.functions.hashing import route_partition

            in_part = (
                route_partition(keys_arr, int(manifest["num_partitions"]))
                == part
            )
        else:
            # merged + external ids + custom routing: the routing value is
            # not stored, so fall back to key identity across the covered
            # set (exact unless the same key was deliberately routed to
            # several partitions — outside the engine's LWW key contract)
            in_part = np.ones(ids_arr.size, dtype=bool)
        hit = in_part & np.isin(keys_arr, np.asarray(list(affected_keys), dtype=object))
        if not hit.any():
            continue
        # tombstone only FRESH ids (already-dead ones are already hidden);
        # keeps gen files minimal and the tombstone count exact
        fresh = sorted(int(x) for x in ids_arr[hit] if int(x) not in already_dead)
        if fresh:
            dead_by_seg[sid] = fresh
            tombstones.update(fresh)
        if has_updates:
            texts_hit = (
                np.asarray(dt.column("text").to_pylist(), dtype=object)[hit]
                if has_text
                else None
            )
            for j, (did, k) in enumerate(zip(ids_arr[hit], keys_arr[hit])):
                did = int(did)
                if did in already_dead:
                    continue  # an older, already-deleted version
                ks = str(k)
                if did >= live_key_ids.get(ks, -1):
                    live_key_ids[ks] = did
                    if texts_hit is not None:
                        stored_text[ks] = (did, texts_hit[j])

    orphan_dropped = 0
    if op_col is not None and op_col in g.columns:
        ops = g[op_col]
        upd = g[(ops == "update") | (ops == "upsert")].reset_index(drop=True)
        if len(upd):
            # resolve partial updates against the stored doc: a null patch
            # text inherits the live stored text (ES doc-merge into
            # _source); an update whose key is absent from the index is
            # ES's document_missing error -> dropped + counted; a null
            # patch on an index built without store_text cannot be
            # reconstructed -> also dropped + counted
            resolved_pos: list[int] = []
            new_texts: list[str] = []
            for i, (k, t, o) in enumerate(
                zip(upd[key_col].astype(str), upd[text_col], upd[op_col])
            ):
                if k not in live_key_ids:
                    if o == "upsert":
                        # ES doc_as_upsert: missing doc -> insert the patch
                        new_texts.append("" if pd.isna(t) else t)
                        resolved_pos.append(i)
                    else:
                        orphan_dropped += 1
                    continue
                if pd.isna(t):
                    hit2 = stored_text.get(k)
                    if hit2 is None:
                        orphan_dropped += 1
                        continue
                    new_texts.append(hit2[1])
                else:
                    new_texts.append(t)
                resolved_pos.append(i)
            upd = upd.iloc[resolved_pos].assign(**{text_col: new_texts, op_col: "index"})
        live = pd.concat([g[(ops != "delete") & (ops != "update") & (ops != "upsert")], upd])
        if seq_col and seq_col in live.columns:
            live = live.sort_values(seq_col, kind="mergesort")
    else:
        live = g

    out_rows = []
    if len(live):
        sid = next_sid + part  # deterministic under retry
        rank_base = _alloc_of(manifest, part)
        built = build_segment_for_group(
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
        m = json.loads(built["manifest"].iloc[0])
        out_rows.append(
            {
                "kind": "manifest",
                "part": part,
                "sid": sid,
                "payload": json.dumps(m),
            }
        )
    for sid2, dead in dead_by_seg.items():
        out_rows.append(
            {"kind": "tombstones", "part": part, "sid": sid2, "payload": json.dumps(sorted(dead))}
        )
    out_rows.append(
        {
            "kind": "metrics",
            "part": part,
            "sid": -1,
            "payload": json.dumps(
                {
                    "rows": int(len(g)),
                    "tombstones": len(tombstones),
                    "segments_touched": len(dead_by_seg),
                    "orphan_updates_dropped": orphan_dropped,
                }
            ),
        }
    )
    return pd.DataFrame(out_rows, columns=["kind", "part", "sid", "payload"])


def delete_by_query(
    index_dir: str,
    text: str,
    cfg: EngineConfig = DEFAULT,
    *,
    lang: str | None = None,
    operator: str = "or",
    filter_lang: str | None = None,
) -> dict:
    """ES _delete_by_query analog: tombstone every live doc matching the
    analyzed query.  Ray-parallel per segment (each task decodes only the
    query terms' postings and writes its own generation-gated tombstone
    file); the driver only commits the manifest.  Stats stay stale until
    ``merge_index`` purges — ES visibility semantics."""
    import ray.data as rd

    from kafka_es_ray.functions.tokenizer import get_analyzer
    from kafka_es_ray.index.segment import Segment, manifest_tombstone_files

    manifest = read_manifest(index_dir)
    gen = int(manifest.get("gen", 0)) + 1
    terms = sorted(set(get_analyzer(lang).tokenize(text)))

    def per_segment(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for sid in batch["sid"].astype(int):
            s = Segment.load(index_dir, sid, manifest_tombstone_files(manifest, sid))
            tis = [s.lookup(t) for t in terms]
            present = [ti for ti in tis if ti >= 0]
            if not present or (operator == "and" and len(present) < len(terms)):
                continue
            lists = [s.postings_with_dl(ti)[0] for ti in present]
            if operator == "and":
                ids = lists[0]
                for lst in lists[1:]:
                    ids = ids[np.isin(ids, lst, assume_unique=True)]
            else:
                ids = np.unique(np.concatenate(lists))
            if filter_lang is not None and ids.size:
                ids = ids[s.langs_for(ids) == filter_lang]
            if s.tombstones is not None and s.tombstones.size and ids.size:
                pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
                ids = ids[s.tombstones[pos] != ids]
            if ids.size == 0:
                continue
            tpath = seg.gen_tombstones_path(index_dir, sid, gen)
            seg.atomic_write_json(
                [int(x) for x in ids], tpath, cfg.write_retries, cfg.write_retry_delay_s
            )
            rows.append({"sid": int(sid), "fname": os.path.basename(tpath), "n": int(ids.size)})
        return pd.DataFrame(rows, columns=["sid", "fname", "n"])

    parts = [int(p) for p in manifest["parts"]]
    plan = rd.from_pandas(pd.DataFrame({"sid": parts})).repartition(max(1, len(parts) // 2))
    out = plan.map_batches(per_segment, batch_format="pandas").take_all()

    tomb_map = {k: list(v) for k, v in manifest.get("tombstones", {}).items()}
    deleted = 0
    for r in out:
        if r["fname"] not in tomb_map.setdefault(str(r["sid"]), []):
            tomb_map[str(r["sid"])].append(r["fname"])
        deleted += int(r["n"])
    new_manifest = {
        **manifest,
        "gen": gen,
        "tombstones": tomb_map,
        "n_tombstoned": int(manifest.get("n_tombstoned", 0)) + deleted,
        "last_delete_by_query": {"query": text, "deleted": deleted},
    }
    write_manifest(index_dir, new_manifest)  # commit point
    return new_manifest


def update_by_query(
    index_dir: str,
    text: str,
    set_fields: dict,
    cfg: EngineConfig = DEFAULT,
    *,
    lang: str | None = None,
    operator: str = "or",
    filter_lang: str | None = None,
    set_scripts: dict | None = None,
) -> dict:
    """ES _update_by_query analog (the ``ctx._source.<field> = <value>``
    script subset): every live doc matching the analyzed query is
    re-ingested with the field overrides applied — read the stored
    _source, apply, reindex through the incremental path (new delta
    segment; the old version tombstoned by the upsert), which is exactly
    the ES update loop.  ``set_fields`` keys must be cfg keyword/numeric
    mapped fields.  Requires store_text=True.  Segment-parallel: each
    task decodes only the query terms' postings and emits its matching
    docs as rows; nothing materializes on the driver.

    ``set_scripts``: the scripted-update subset — {numeric_field:
    whitelisted arithmetic expr} (the script_score expression whitelist,
    e.g. ``"stars * 2 + 1"``), evaluated vectorized over the doc's OLD
    numeric docvalues (``ctx._source.f = expr(old fields)``); validated
    at call time, applied per segment.  A field may appear in either
    set_fields or set_scripts, not both."""
    import ray.data as rd

    from kafka_es_ray.functions.tokenizer import get_analyzer
    from kafka_es_ray.index.segment import Segment, manifest_tombstone_files

    manifest = read_manifest(index_dir)
    # field mappings come from the manifest (what the index actually
    # stores), falling back to cfg for pre-mappings indexes; the delta
    # build below must also be told to store them
    mp = manifest.get("mappings", {})
    kw_cols = tuple(mp.get("keyword_cols") or cfg.keyword_cols)
    num_cols = tuple(mp.get("numeric_cols") or cfg.numeric_cols)
    cfg = replace(cfg, keyword_cols=kw_cols, numeric_cols=num_cols,
                  store_text=bool(mp.get("store_text", cfg.store_text)))
    known = set(kw_cols) | set(num_cols)
    unknown = set(set_fields) - known
    if unknown:
        raise ValueError(
            f"set_fields {sorted(unknown)} are not mapped keyword/numeric fields "
            f"(mapped: {sorted(known) or 'none'})"
        )
    set_scripts = dict(set_scripts or {})
    if set_scripts:
        from kafka_es_ray.query.engine import _script_fields

        bad = set(set_scripts) - set(num_cols)
        if bad:
            raise ValueError(
                f"set_scripts targets {sorted(bad)} are not mapped numeric fields"
            )
        both = set(set_scripts) & set(set_fields)
        if both:
            raise ValueError(f"{sorted(both)} in both set_fields and set_scripts")
        for fld, expr in set_scripts.items():
            refs = _script_fields(str(expr))  # whitelist gate at call time
            missing = set(refs) - set(num_cols)
            if missing:
                raise ValueError(
                    f"set_scripts[{fld}] reads unmapped numeric fields {sorted(missing)}"
                )
    from kafka_es_ray.query.engine import _script_values as _eval_script

    terms = sorted(set(get_analyzer(lang).tokenize(text)))

    def per_segment(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for sid in batch["sid"].astype(int):
            s = Segment.load(index_dir, sid, manifest_tombstone_files(manifest, sid))
            tis = [s.lookup(t) for t in terms]
            present = [ti for ti in tis if ti >= 0]
            if not present or (operator == "and" and len(present) < len(terms)):
                continue
            lists = [s.postings_with_dl(ti)[0] for ti in present]
            if operator == "and":
                ids = lists[0]
                for lst in lists[1:]:
                    ids = ids[np.isin(ids, lst, assume_unique=True)]
            else:
                ids = np.unique(np.concatenate(lists))
            if filter_lang is not None and ids.size:
                ids = ids[s.langs_for(ids) == filter_lang]
            if s.tombstones is not None and s.tombstones.size and ids.size:
                pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
                ids = ids[s.tombstones[pos] != ids]
            if ids.size == 0:
                continue
            row = {
                "key": s.keys_for(ids),
                "text": s.texts_for(ids),
                "lang": s.langs_for(ids),
            }
            for kw in cfg.keyword_cols:
                row[kw] = (
                    np.full(ids.size, str(set_fields[kw]), dtype=object)
                    if kw in set_fields
                    else s.field_for(kw, ids)
                )
            for nf in cfg.numeric_cols:
                if nf in set_fields:
                    row[nf] = np.full(ids.size, float(set_fields[nf]), dtype=np.float64)
                elif nf in set_scripts:
                    # scripted update: expr over the OLD numeric values
                    # (_script_values captured driver-side — CLAUDE.md
                    # rule 1: no import statements inside worker fns)
                    row[nf] = _eval_script(s, ids, str(set_scripts[nf]))
                else:
                    row[nf] = s.nums_for(nf, ids)
            rows.append(pd.DataFrame(row))
        if not rows:
            cols = ["key", "text", "lang", *cfg.keyword_cols, *cfg.numeric_cols]
            return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
        return pd.concat(rows, ignore_index=True)

    parts = [int(p) for p in manifest["parts"]]
    docs = (
        rd.from_pandas(pd.DataFrame({"sid": parts}))
        .repartition(max(1, len(parts) // 2))
        .map_batches(per_segment, batch_format="pandas")
    )
    return apply_incremental(
        index_dir, docs, cfg,
        key_col="key", text_col="text", lang_col="lang", seq_col=None, op_col=None,
    )


def export_by_query(
    index_dir: str,
    text: str,
    out_dir: str,
    cfg: EngineConfig = DEFAULT,
    *,
    lang: str | None = None,
    operator: str = "or",
    filter_lang: str | None = None,
):
    """Corpus-subset extraction (the ES scroll-and-dump pattern done
    right): every live doc matching the analyzed query streams out as
    partitioned parquet — per-segment match + stored-_source fetch, each
    task writes its own file (resumable output rule; nothing funnels
    through the driver).  Requires store_text=True.  Returns the lazy
    Dataset (already written)."""
    import ray.data as rd

    from kafka_es_ray.functions.tokenizer import get_analyzer
    from kafka_es_ray.index.segment import Segment, manifest_tombstone_files

    manifest = read_manifest(index_dir)
    terms = sorted(set(get_analyzer(lang).tokenize(text)))

    def per_segment(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for sid in batch["sid"].astype(int):
            s = Segment.load(index_dir, sid, manifest_tombstone_files(manifest, sid))
            tis = [s.lookup(t) for t in terms]
            present = [ti for ti in tis if ti >= 0]
            if not present or (operator == "and" and len(present) < len(terms)):
                continue
            lists = [s.postings_with_dl(ti)[0] for ti in present]
            if operator == "and":
                ids = lists[0]
                for lst in lists[1:]:
                    ids = ids[np.isin(ids, lst, assume_unique=True)]
            else:
                ids = np.unique(np.concatenate(lists))
            if filter_lang is not None and ids.size:
                ids = ids[s.langs_for(ids) == filter_lang]
            if s.tombstones is not None and s.tombstones.size and ids.size:
                pos = np.minimum(np.searchsorted(s.tombstones, ids), s.tombstones.size - 1)
                ids = ids[s.tombstones[pos] != ids]
            if ids.size == 0:
                continue
            rows.append(
                pd.DataFrame(
                    {
                        "key": s.keys_for(ids),
                        "text": s.texts_for(ids),
                        "lang": s.langs_for(ids),
                    }
                )
            )
        if not rows:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in ("key", "text", "lang")}
            )
        return pd.concat(rows, ignore_index=True)

    parts = [int(p) for p in manifest["parts"]]
    ds = (
        rd.from_pandas(pd.DataFrame({"sid": parts}))
        .repartition(max(1, len(parts) // 2))
        .map_batches(per_segment, batch_format="pandas")
    )
    ds.write_parquet(out_dir)
    return ds


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

    ``docs_ds``: Dataset (or DataFrame) of rows (key, text, lang?, seq?,
    op?) where op 'delete' rows tombstone the key, 'update' rows partial-
    merge into the stored doc, and other rows upsert it.  Returns the
    updated global manifest.  Runs Ray-parallel per routing partition; the
    delta never materializes on the driver."""
    import ray.data as rd

    manifest = read_manifest(index_dir)
    P = int(manifest["num_partitions"])
    next_sid = int(manifest.get("next_segment_id", DELTA_ID_BASE))
    gen = int(manifest.get("gen", 0)) + 1

    if not hasattr(docs_ds, "map_batches"):
        docs_ds = rd.from_pandas(docs_ds.reset_index(drop=True))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        if routing_col and routing_col in batch.columns:
            rk = batch[routing_col].where(~batch[routing_col].isna(), batch[key_col])
        else:
            rk = batch[key_col]
        return batch.assign(part_id=route_partition(rk.to_numpy(), P))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return _apply_one_partition(
            g, index_dir, manifest, cfg, key_col, text_col, lang_col, seq_col, op_col, next_sid
        )

    out = (
        docs_ds.map_batches(add_part, batch_format="pandas")
        .groupby("part_id")
        .map_groups(per_part, batch_format="pandas")
        .take_all()
    )

    new_part_manifests: dict[int, dict] = {}
    seg_partition: dict[int, int] = {}
    alloc_updates: dict[int, int] = {}
    tombstones_by_seg: dict[int, set[int]] = {}
    metrics = {"rows": 0, "tombstones": 0, "segments_touched": 0, "orphan_updates_dropped": 0}
    for r in out:
        payload = json.loads(r["payload"])
        if r["kind"] == "manifest":
            sid, part = int(r["sid"]), int(r["part"])
            new_part_manifests[sid] = payload
            seg_partition[sid] = part
            alloc_updates[part] = _alloc_of(manifest, part) + payload["n_docs"]
        elif r["kind"] == "tombstones":
            tombstones_by_seg.setdefault(int(r["sid"]), set()).update(payload)
        else:
            for k in metrics:
                metrics[k] += payload.get(k, 0)

    # write generation-suffixed tombstone files; they become VISIBLE only
    # via the manifest listing below (crash between here and the manifest
    # commit leaves them correctly invisible)
    tomb_map: dict[str, list[str]] = {
        k: list(v) for k, v in manifest.get("tombstones", {}).items()
    }
    for sid, dead in tombstones_by_seg.items():
        tpath = seg.gen_tombstones_path(index_dir, sid, gen)
        seg.atomic_write_json(
            sorted(dead), tpath, cfg.write_retries, cfg.write_retry_delay_s
        )
        fname = os.path.basename(tpath)
        if fname not in tomb_map.setdefault(str(sid), []):
            tomb_map[str(sid)].append(fname)

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
    prev_metrics = manifest.get("apply_metrics", {})
    mappings_out = dict(manifest.get("mappings", {}))
    if new_part_manifests and mappings_out.get("index_sort"):
        # delta segments are id-ordered, not value-ordered: the sorted
        # layout guarantee (and its early-termination fast path) ends at
        # the first incremental apply — the ES index.sort + updates
        # caveat; a force-merge rebuild can restore it
        mappings_out["index_sort"] = None
    new_manifest = {
        **manifest,
        "mappings": mappings_out,
        "parts": parts,
        "part_manifests": pm,
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        # multi-field: per-field avgdl tracks delta segments the same way
        **(
            {
                "avgdl_fields": {
                    f: (
                        sum(m.get("sum_dl_fields", {}).get(f, 0) for m in pm.values())
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
        # each apply reserves P segment ids (sid = next_sid + part), so a
        # retried apply regenerates identical ids and file names
        "next_segment_id": next_sid + P,
        "gen": gen,
        "tombstones": tomb_map,
        # COUNT only: the id lists live in the per-segment gen files (a
        # global id list in the manifest would grow with every delete)
        "n_tombstoned": int(manifest.get("n_tombstoned", 0))
        + sum(len(v) for v in tombstones_by_seg.values()),
        # MetricsUpdater-analog counters for the incremental path
        # (reference MetricsUpdater.kt:3-15): cumulative across applies
        "apply_metrics": {
            k: int(prev_metrics.get(k, 0)) + v for k, v in metrics.items()
        },
    }
    write_manifest(index_dir, new_manifest)  # the 'refresh' commit point
    return new_manifest
