"""Snapshot / restore / verify-integrity (ES snapshot-API analog):
a snapshot is itself a valid index serving the committed state at copy
time, immune to later mutations of the source; verify_index flags real
corruption."""

import json
import shutil

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.snapshot import restore_index, snapshot_index, verify_index
from kafka_es_ray.query.engine import IndexSearcher

CFG = EngineConfig(num_partitions=4)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    rng = np.random.default_rng(3)
    words = ["red", "green", "blue", "cyan", "teal", "plum"]
    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(60)],
            "text": [" ".join(rng.choice(words, size=5).tolist()) for _ in range(60)],
            "lang": "en",
        }
    )
    idx = str(tmp_path_factory.mktemp("snapidx"))
    build_index(rd.from_pandas(docs), idx, CFG, html_col=None, ts_col=None)
    return idx


def test_snapshot_serves_frozen_state(built, tmp_path):
    from kafka_es_ray.index.incremental import apply_incremental

    snap = str(tmp_path / "snap")
    rep = snapshot_index(built, snap)
    assert rep["n_docs"] == 60 and rep["n_files"] > 1
    before = IndexSearcher(built, CFG).search("red green", k=100)
    # mutate the SOURCE after the snapshot: delete some matching docs
    delta = pd.DataFrame(
        {"id": before["key"].head(5), "text": [None] * 5, "lang": ["en"] * 5,
         "op": ["delete"] * 5}
    )
    apply_incremental(built, delta, CFG, key_col="id")
    after_src = IndexSearcher(built, CFG).search("red green", k=100)
    assert len(after_src) < len(before)
    # the snapshot still serves the pre-delete state, and restores cleanly
    from_snap = IndexSearcher(snap, CFG).search("red green", k=100)
    pd.testing.assert_frame_equal(from_snap, before)
    dest = str(tmp_path / "restored")
    restore_index(snap, dest)
    pd.testing.assert_frame_equal(IndexSearcher(dest, CFG).search("red green", k=100), before)


def test_verify_index_clean_and_corrupted(built, tmp_path):
    rep = verify_index(built)
    assert rep["ok"], rep["problems"]
    assert rep["n_docs"] == 60 and rep["n_parts"] == 4
    # corrupt a copy: drop a docstore file -> missing-file problem
    broken = str(tmp_path / "broken")
    snapshot_index(built, broken)
    import os

    victim = next(f for f in os.listdir(broken) if f.startswith("docstore-"))
    os.remove(os.path.join(broken, victim))
    rep2 = verify_index(broken)
    assert not rep2["ok"] and any("missing file" in p for p in rep2["problems"])
    # corrupt the manifest's doc count -> count mismatch problem
    broken2 = str(tmp_path / "broken2")
    snapshot_index(built, broken2)
    mpath = os.path.join(broken2, "manifest.json")
    m = json.load(open(mpath))
    m["n_docs"] = 999
    json.dump(m, open(mpath, "w"))
    rep3 = verify_index(broken2)
    assert not rep3["ok"] and any("n_docs" in p for p in rep3["problems"])


def test_snapshot_cli(built, tmp_path):
    import subprocess
    import sys

    snap = str(tmp_path / "clisnap")
    r = subprocess.run(
        [sys.executable, "-m", "kafka_es_ray.cli", "snapshot", "--index", built, "--dest", snap],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout.strip().splitlines()[-1])["n_docs"] == 60
    r2 = subprocess.run(
        [sys.executable, "-m", "kafka_es_ray.cli", "verify", "--index", snap],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr
    assert json.loads(r2.stdout.strip().splitlines()[-1])["ok"]


def test_incremental_snapshot_repo(ray_session, tmp_path):
    """Repository snapshots: generation 2 reuses every unchanged segment
    blob; both generations restore to their exact frozen states; delete
    prunes only unreferenced blobs."""
    import os

    import ray.data as rd

    from kafka_es_ray.index.incremental import apply_incremental
    from kafka_es_ray.index.snapshot import (
        delete_snapshot,
        list_snapshots,
        restore_from_repo,
        snapshot_to_repo,
    )

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(40)],
            "text": ["opal onyx"] * 40,
            "lang": "en",
        }
    )
    idx = str(tmp_path / "idx")
    build_index(rd.from_pandas(docs), idx, CFG, html_col=None, ts_col=None)
    repo = str(tmp_path / "repo")

    r1 = snapshot_to_repo(idx, repo, "gen1")
    assert r1["n_copied"] == r1["n_files"] and r1["n_reused"] == 0

    # delta batch -> only the new delta files should copy in gen2
    actions = pd.DataFrame(
        [{"id": "new1", "text": "jade onyx", "lang": "en", "seq": 1, "op": "index"}]
    )
    apply_incremental(idx, rd.from_pandas(actions), CFG, key_col="id")
    r2 = snapshot_to_repo(idx, repo, "gen2")
    assert r2["n_reused"] >= r1["n_files"]  # every gen1 segment blob reused
    assert 0 < r2["n_copied"] < r2["n_files"]

    names = [s["name"] for s in list_snapshots(repo)]
    assert names == ["gen1", "gen2"]

    d1 = str(tmp_path / "r1")
    d2 = str(tmp_path / "r2")
    restore_from_repo(repo, "gen1", d1)
    restore_from_repo(repo, "gen2", d2)
    assert len(IndexSearcher(d1, CFG).search("onyx", k=100)) == 40
    assert len(IndexSearcher(d2, CFG).search("onyx", k=100)) == 41
    assert len(IndexSearcher(d1, CFG).search("jade", k=100)) == 0
    assert len(IndexSearcher(d2, CFG).search("jade", k=100)) == 1

    # delete gen1: shared blobs survive (gen2 still restores), others pruned
    out = delete_snapshot(repo, "gen1")
    assert out["blobs_pruned"] == 0  # gen2 references every gen1 blob here
    d3 = str(tmp_path / "r3")
    restore_from_repo(repo, "gen2", d3)
    assert len(IndexSearcher(d3, CFG).search("jade", k=100)) == 1
    # delete gen2 -> repo empties
    out2 = delete_snapshot(repo, "gen2")
    assert out2["blobs_pruned"] == r2["n_files"] - 0
    assert list_snapshots(repo) == []
    assert os.listdir(os.path.join(repo, "files")) == []


def test_slm_retention(ray_session, tmp_path):
    """slm_tick keeps the newest N snapshots; shared blobs survive while
    any referencing snapshot remains."""
    import ray.data as rd

    from kafka_es_ray.index.snapshot import (
        list_snapshots,
        slm_tick,
        snapshot_to_repo,
    )

    docs = pd.DataFrame(
        {"url": [f"u{i}" for i in range(10)], "text": ["agate"] * 10, "lang": "en"}
    )
    idx = str(tmp_path / "idx")
    build_index(rd.from_pandas(docs), idx, CFG, html_col=None, ts_col=None)
    repo = str(tmp_path / "repo")
    for name in ("2020-01-01", "2020-01-02", "2020-01-03"):
        snapshot_to_repo(idx, repo, name)
    out = slm_tick(repo, keep_last=1)
    assert out["deleted"] == ["2020-01-01", "2020-01-02"]
    assert out["blobs_pruned"] == 0  # identical content still referenced
    assert [s["name"] for s in list_snapshots(repo)] == ["2020-01-03"]


def test_verify_repo_detects_corruption(ray_session, tmp_path):
    import os

    import ray.data as rd

    from kafka_es_ray.index.snapshot import snapshot_to_repo, verify_repo

    docs = pd.DataFrame(
        {"url": [f"u{i}" for i in range(8)], "text": ["beryl"] * 8, "lang": "en"}
    )
    idx = str(tmp_path / "idx")
    build_index(rd.from_pandas(docs), idx, CFG, html_col=None, ts_col=None)
    repo = str(tmp_path / "repo")
    snapshot_to_repo(idx, repo, "s1")
    rep = verify_repo(repo)
    assert rep["ok"] and rep["n_snapshots"] == 1 and rep["n_blobs"] > 0

    # flip a byte in one blob -> corrupt; remove another -> missing
    blobs = sorted(os.listdir(os.path.join(repo, "files")))
    p0 = os.path.join(repo, "files", blobs[0])
    data = bytearray(open(p0, "rb").read())
    data[0] ^= 0xFF
    open(p0, "wb").write(bytes(data))
    os.remove(os.path.join(repo, "files", blobs[1]))
    rep2 = verify_repo(repo)
    assert not rep2["ok"]
    kinds = {pr.split(":")[0] for pr in rep2["problems"]}
    assert kinds == {"corrupt blob", "missing blob"}
