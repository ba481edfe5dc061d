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


# --------------------------- incremental snapshot repository (ES analog)


def _file_md5(path: str) -> str:
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def snapshot_to_repo(index_dir: str, repo_dir: str, name: str) -> dict:
    """Incremental snapshot into a repository (the ES snapshot model:
    one repo holds many named snapshots; segment files unchanged since a
    previous snapshot are NOT copied again).  Layout:
    ``repo/files/<md5>`` content-addressed blobs shared across
    snapshots, ``repo/snapshots/<name>.json`` = {manifest, file->hash
    map} written LAST (the commit point — a torn snapshot is invisible).
    Content addressing makes reuse exact (never name/mtime heuristics),
    and identical files across DIFFERENT indexes dedupe too.
    Returns {n_files, n_copied, bytes_copied, bytes_reused}."""
    manifest = read_manifest(index_dir)
    blob_dir = os.path.join(repo_dir, "files")
    snap_meta_dir = os.path.join(repo_dir, "snapshots")
    os.makedirs(blob_dir, exist_ok=True)
    os.makedirs(snap_meta_dir, exist_ok=True)
    files = _manifest_files(index_dir, manifest)
    mapping: dict[str, str] = {}
    copied = reused = b_copied = b_reused = 0
    for f in files:
        src = os.path.join(index_dir, f)
        digest = _file_md5(src)
        mapping[f] = digest
        blob = os.path.join(blob_dir, digest)
        size = os.path.getsize(src)
        if os.path.exists(blob):
            reused += 1
            b_reused += size
        else:
            tmp = blob + ".tmp"
            shutil.copy2(src, tmp)
            os.replace(tmp, blob)  # atomic publish
            copied += 1
            b_copied += size
    meta = {"manifest": manifest, "files": mapping}
    tmp = os.path.join(snap_meta_dir, f"{name}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(snap_meta_dir, f"{name}.json"))
    return {
        "n_files": len(files), "n_copied": copied, "n_reused": reused,
        "bytes_copied": b_copied, "bytes_reused": b_reused,
    }


def list_snapshots(repo_dir: str) -> list[dict]:
    """Named snapshots in the repo with doc counts (ES GET _snapshot)."""
    d = os.path.join(repo_dir, "snapshots")
    out = []
    for fn in sorted(os.listdir(d)) if os.path.isdir(d) else []:
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as fh:
                meta = json.load(fh)
            out.append(
                {
                    "name": fn[:-5],
                    "n_docs": int(meta["manifest"]["n_docs"]),
                    "n_files": len(meta["files"]),
                }
            )
    return out


def restore_from_repo(repo_dir: str, name: str, dest_dir: str) -> dict:
    """Materialize a named snapshot as a fresh index dir (data first,
    manifest last)."""
    with open(os.path.join(repo_dir, "snapshots", f"{name}.json")) as fh:
        meta = json.load(fh)
    os.makedirs(dest_dir, exist_ok=True)
    for f, digest in meta["files"].items():
        shutil.copy2(os.path.join(repo_dir, "files", digest), os.path.join(dest_dir, f))
    with open(os.path.join(dest_dir, "manifest.json"), "w") as fh:
        json.dump(meta["manifest"], fh)
    return {"n_files": len(meta["files"]) + 1, "n_docs": int(meta["manifest"]["n_docs"])}


def delete_snapshot(repo_dir: str, name: str) -> dict:
    """Drop a named snapshot and garbage-collect blobs no OTHER snapshot
    references (the ES delete-then-prune semantics).  Metadata is removed
    FIRST so a crash between the two steps only leaks blobs (safe), never
    breaks a surviving snapshot."""
    meta_path = os.path.join(repo_dir, "snapshots", f"{name}.json")
    with open(meta_path) as fh:
        dropped = set(json.load(fh)["files"].values())
    os.remove(meta_path)
    still = set()
    for s in list_snapshots(repo_dir):
        with open(os.path.join(repo_dir, "snapshots", f"{s['name']}.json")) as fh:
            still.update(json.load(fh)["files"].values())
    pruned = 0
    for digest in dropped - still:
        p = os.path.join(repo_dir, "files", digest)
        if os.path.exists(p):
            os.remove(p)
            pruned += 1
    return {"deleted": name, "blobs_pruned": pruned}


def slm_tick(repo_dir: str, keep_last: int) -> dict:
    """Snapshot-lifecycle retention (the ES SLM policy analog): keep the
    ``keep_last`` newest snapshots by name order (names sort
    chronologically under the ES date-math naming convention this repo's
    callers use), delete the rest — each delete prunes only blobs no
    surviving snapshot references."""
    snaps = [s["name"] for s in list_snapshots(repo_dir)]
    drop = snaps[: max(0, len(snaps) - int(keep_last))]
    pruned = 0
    for name in drop:
        pruned += delete_snapshot(repo_dir, name)["blobs_pruned"]
    return {"deleted": drop, "blobs_pruned": pruned}


def verify_repo(repo_dir: str) -> dict:
    """Repository integrity check (the ES verify-repository analog +
    content audit): every blob referenced by any snapshot must exist and
    its md5 must equal its content-address name (bit-rot / torn-write
    detection the commit ordering cannot catch).  Returns
    {ok, n_snapshots, n_blobs, problems}."""
    problems: list[str] = []
    referenced: set[str] = set()
    snaps = list_snapshots(repo_dir)
    for s in snaps:
        with open(os.path.join(repo_dir, "snapshots", f"{s['name']}.json")) as fh:
            referenced.update(json.load(fh)["files"].values())
    for digest in sorted(referenced):
        p = os.path.join(repo_dir, "files", digest)
        if not os.path.exists(p):
            problems.append(f"missing blob: {digest}")
        elif _file_md5(p) != digest:
            problems.append(f"corrupt blob: {digest}")
    return {
        "ok": not problems,
        "n_snapshots": len(snaps),
        "n_blobs": len(referenced),
        "problems": problems,
    }
