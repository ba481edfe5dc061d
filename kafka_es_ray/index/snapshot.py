"""Snapshot / restore / integrity-verify for an index directory — the ES
snapshot-API analog (`PUT _snapshot`, `POST _restore`), built on the
engine's manifest-is-the-commit-point rule: a snapshot copies every file
the manifest references FIRST and writes `manifest.json` LAST, so a
snapshot directory is itself a valid, openable index and a torn copy is
simply invisible (no manifest -> no index).

Scale note: snapshotting is per-segment-file copy work and embarrassingly
parallel; at cluster scale the copies would be dispatched as Ray tasks
against shared storage.  Locally shutil suffices and keeps the commit
ordering obvious.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq

from kafka_es_ray.index.segment import (
    Segment,
    docstore_path,
    manifest_tombstone_files,
    part_manifest_path,
    postings_path,
    read_manifest,
)


def _manifest_files(index_dir: str, manifest: dict) -> list[str]:
    """Every file the manifest references, relative names."""
    files: list[str] = []
    for part in manifest["parts"]:
        pid = int(part)
        files.append(os.path.basename(postings_path(index_dir, pid)))
        files.append(os.path.basename(docstore_path(index_dir, pid)))
        pm = part_manifest_path(index_dir, pid)
        if os.path.exists(pm):
            files.append(os.path.basename(pm))
        for t in manifest_tombstone_files(manifest, pid):
            files.append(os.path.basename(t))
    return files


def snapshot_index(index_dir: str, snap_dir: str) -> dict:
    """Copy the index's committed state into ``snap_dir``.  Data files
    copy first, ``manifest.json`` last (the commit point), so a reader
    never observes a half-snapshot as an index.  Returns
    {n_files, bytes, n_docs}."""
    manifest = read_manifest(index_dir)
    os.makedirs(snap_dir, exist_ok=True)
    total = 0
    files = _manifest_files(index_dir, manifest)
    for f in files:
        src = os.path.join(index_dir, f)
        shutil.copy2(src, os.path.join(snap_dir, f))
        total += os.path.getsize(src)
    with open(os.path.join(snap_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    return {"n_files": len(files) + 1, "bytes": total, "n_docs": int(manifest["n_docs"])}


def restore_index(snap_dir: str, dest_dir: str) -> dict:
    """Materialize a snapshot as a fresh index directory (same
    copy-data-first / manifest-last ordering).  The restored dir serves
    exactly the snapshot's committed state regardless of what happened to
    the source index afterwards (tested)."""
    return snapshot_index(snap_dir, dest_dir)


def verify_index(index_dir: str, sample_terms: int = 3) -> dict:
    """Integrity check (the ES `_recovery`/checksum analog): every
    manifest-referenced file exists; per segment the docstore doc ids are
    strictly ascending, the dictionary is sorted, df matches the decoded
    posting length for ``sample_terms`` probe terms (first/middle/last),
    and the summed docstore rows equal the manifest's n_docs.  Returns
    {ok, n_docs, n_parts, problems}."""
    problems: list[str] = []
    manifest = read_manifest(index_dir)
    for f in _manifest_files(index_dir, manifest):
        if not os.path.exists(os.path.join(index_dir, f)):
            problems.append(f"missing file: {f}")
    n_docs = 0
    if not problems:
        for part in manifest["parts"]:
            pid = int(part)
            seg = Segment.load(index_dir, pid, manifest_tombstone_files(manifest, pid))
            n_docs += seg.n_docs
            ids = seg.doc_ids_store
            if ids.size and not (np.diff(ids) > 0).all():
                problems.append(f"part {pid}: docstore doc ids not strictly ascending")
            nt = len(seg.terms_arr)
            if nt > 1:
                t0 = seg.terms_arr.to_pylist()
                if t0 != sorted(t0):
                    problems.append(f"part {pid}: dictionary not sorted")
            for ti in sorted({0, nt // 2, nt - 1} if nt else set()):
                pids_, tfs = seg.postings(ti)
                if pids_.size != int(seg.df[ti]):
                    problems.append(
                        f"part {pid} term {ti}: df {int(seg.df[ti])} != decoded {pids_.size}"
                    )
                if pids_.size and not (np.diff(pids_) > 0).all():
                    problems.append(f"part {pid} term {ti}: postings not ascending")
        if n_docs != int(manifest["n_docs"]):
            problems.append(
                f"manifest n_docs {manifest['n_docs']} != summed docstores {n_docs}"
            )
        # docstore row counts cross-checked against parquet metadata
        for part in manifest["parts"]:
            pid = int(part)
            meta_rows = pq.read_metadata(docstore_path(index_dir, pid)).num_rows
            pm_path = part_manifest_path(index_dir, pid)
            if os.path.exists(pm_path):
                with open(pm_path) as fh:
                    pm = json.load(fh)
                if int(pm.get("n_docs", meta_rows)) != meta_rows:
                    problems.append(
                        f"part {pid}: part-manifest n_docs {pm.get('n_docs')} "
                        f"!= docstore rows {meta_rows}"
                    )
    return {
        "ok": not problems,
        "n_docs": n_docs,
        "n_parts": len(manifest["parts"]),
        "problems": problems,
    }
