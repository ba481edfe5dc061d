"""Directory-tailing micro-batch ingestion (the Kafka-consumer analog):
offset ledger, at-least-once replay safety, ordered application,
visibility after each commit."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.engine import IndexSearcher
from kafka_es_ray.sources.stream import follow_directory, pending_files, read_ledger

CFG = EngineConfig(num_partitions=4)


@pytest.fixture()
def base_index(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(40)],
            "text": ["alpha beta"] * 20 + ["gamma delta"] * 20,
            "lang": ["en"] * 40,
        }
    )
    idx = str(tmp_path / "idx")
    build_index(rd.from_pandas(df), idx, CFG, html_col=None, ts_col=None)
    return idx


def _drop(d: str, name: str, rows: list[dict]) -> None:
    pq.write_table(pa.Table.from_pylist(rows), os.path.join(d, name))


def test_follow_applies_in_order_and_commits_ledger(base_index, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    _drop(str(inbox), "b-0001.parquet", [
        {"id": "u1", "text": "alpha omega", "lang": "en", "seq": 1, "op": "index"},
        {"id": "n1", "text": "omega omega", "lang": "en", "seq": 1, "op": "index"},
    ])
    _drop(str(inbox), "b-0002.parquet", [
        {"id": "u1", "text": "omega zeta", "lang": "en", "seq": 2, "op": "index"},
        {"id": "u2", "text": "x", "lang": "en", "seq": 2, "op": "delete"},
    ])
    out = follow_directory(
        str(inbox), base_index, CFG, poll_s=0.05, idle_stop_s=0.2
    )
    assert out["files_applied"] == 2
    ledger = read_ledger(base_index)
    assert [e["file"] for e in ledger["consumed"]] == [
        "b-0001.parquet", "b-0002.parquet"
    ]
    s = IndexSearcher(base_index, CFG)
    # u1's LATEST version (seq 2, file order) wins; u2 deleted; n1 new
    assert s.count("zeta") == 1
    assert s.count("omega") == 2  # u1 (zeta omega) + n1
    got = s.get(["u1", "u2", "n1"])
    assert got.set_index("key")["found"].to_dict() == {
        "u1": True, "u2": False, "n1": True
    }


def test_rerun_skips_consumed_and_applies_only_new(base_index, tmp_path):
    inbox = tmp_path / "inbox2"
    inbox.mkdir()
    _drop(str(inbox), "c-0001.parquet", [
        {"id": "k1", "text": "kappa", "lang": "en", "seq": 1, "op": "index"},
    ])
    out1 = follow_directory(str(inbox), base_index, CFG, poll_s=0.05, max_batches=1)
    assert out1["files_applied"] == 1
    # nothing pending now; a rerun applies zero files
    assert pending_files(str(inbox), base_index) == []
    out2 = follow_directory(
        str(inbox), base_index, CFG, poll_s=0.05, idle_stop_s=0.15
    )
    assert out2["files_applied"] == 0
    # drop one more; only it applies
    _drop(str(inbox), "c-0002.parquet", [
        {"id": "k2", "text": "kappa kappa", "lang": "en", "seq": 1, "op": "index"},
    ])
    out3 = follow_directory(str(inbox), base_index, CFG, poll_s=0.05, max_batches=1)
    assert out3["files_applied"] == 1
    assert IndexSearcher(base_index, CFG).count("kappa") == 2


def test_replay_after_lost_ledger_entry_is_idempotent(base_index, tmp_path):
    """Crash between apply and ledger commit -> the file replays; the
    index must land in the same state (delta ids deterministic, LWW/seq
    resolution idempotent)."""
    inbox = tmp_path / "inbox3"
    inbox.mkdir()
    _drop(str(inbox), "d-0001.parquet", [
        {"id": "r1", "text": "rho sigma", "lang": "en", "seq": 1, "op": "index"},
    ])
    follow_directory(str(inbox), base_index, CFG, poll_s=0.05, max_batches=1)
    n_before = IndexSearcher(base_index, CFG).count("rho")
    # simulate the crash: forget the ledger entry and re-consume
    ledger = read_ledger(base_index)
    ledger["consumed"] = [e for e in ledger["consumed"] if e["file"] != "d-0001.parquet"]
    with open(os.path.join(base_index, "ingest_ledger.json"), "w") as f:
        json.dump(ledger, f)
    follow_directory(str(inbox), base_index, CFG, poll_s=0.05, max_batches=1)
    s = IndexSearcher(base_index, CFG)
    assert s.count("rho") == n_before == 1
    assert s.get(["r1"])["found"].iloc[0]


def test_metrics_endpoint_scrapeable_during_follow(base_index, tmp_path):
    """S6 analog: counters are scrapeable over HTTP WHILE the follow loop
    runs (reference Metrics.kt:24-83 / MetricsUpdater.kt:3-15), in both
    Prometheus text and JSON renderings."""
    import threading
    import time
    import urllib.request

    from kafka_es_ray.metrics import MetricsServer

    inbox = tmp_path / "inbox_m"
    inbox.mkdir()
    _drop(str(inbox), "m-0001.parquet", [
        {"id": "mm1", "text": "mu nu", "lang": "en", "seq": 1, "op": "index"},
    ])
    ms = MetricsServer()
    port = ms.start()
    try:
        th = threading.Thread(
            target=follow_directory,
            args=(str(inbox), base_index, CFG),
            kwargs={"poll_s": 0.05, "idle_stop_s": 3.0, "metrics": ms, "max_batches": 2},
            daemon=True,
        )
        th.start()
        # scrape LIVE until the first apply lands
        deadline = time.monotonic() + 30
        snap = {}
        while time.monotonic() < deadline:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics.json") as r:
                snap = json.loads(r.read())
            if snap.get("files_applied") == 1:
                break
            time.sleep(0.05)
        assert snap.get("files_applied") == 1
        assert snap.get("last_gen", 0) >= 1
        assert snap.get("last_apply_seconds", -1) >= 0
        assert th.is_alive()  # loop still following: a live scrape, not post-mortem
        # second file applies after the scrape; loop exits via max_batches
        _drop(str(inbox), "m-0002.parquet", [
            {"id": "mm2", "text": "xi omicron", "lang": "en", "seq": 1, "op": "index"},
        ])
        th.join(60)
        assert not th.is_alive()
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            text = r.read().decode()
        assert "kafka_es_files_applied 2" in text
        assert "# TYPE kafka_es_files_applied gauge" in text
    finally:
        ms.stop()


def test_watchdog_restarts_hung_apply(base_index, tmp_path):
    """WatchDog analog (reference WatchDog.kt:13-126): an apply that
    stalls past the TTL is restarted; the retry applies cleanly (replay
    idempotence) and the restart is counted."""
    import time

    from kafka_es_ray.index.incremental import apply_incremental

    inbox = tmp_path / "inbox_w"
    inbox.mkdir()
    _drop(str(inbox), "w-0001.parquet", [
        {"id": "w1", "text": "phi chi", "lang": "en", "seq": 1, "op": "index"},
    ])
    calls = {"n": 0}

    def flaky_apply(index_dir, ds, cfg, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            time.sleep(30)  # simulated stuck batch (daemon thread, abandoned)
        return apply_incremental(index_dir, ds, cfg, **kw)

    out = follow_directory(
        str(inbox), base_index, CFG, poll_s=0.05, max_batches=1,
        watchdog_ttl_s=1.0, watchdog_max_restarts=2, _apply_fn=flaky_apply,
    )
    assert out["files_applied"] == 1
    assert out["watchdog_restarts"] == 1
    assert out["quarantined"] == []
    assert IndexSearcher(base_index, CFG).count("phi") == 1
    assert [e["file"] for e in read_ledger(base_index)["consumed"]][-1] == "w-0001.parquet"


def test_watchdog_quarantines_poison_file(base_index, tmp_path):
    """A file whose apply NEVER finishes is quarantined after
    max_restarts strikes (error-classification rule D10) and the stream
    moves on to the next file instead of wedging."""
    import time

    from kafka_es_ray.index.incremental import apply_incremental

    inbox = tmp_path / "inbox_q"
    inbox.mkdir()
    _drop(str(inbox), "q-0001.parquet", [
        {"id": "poison", "text": "bad", "lang": "en", "seq": 1, "op": "index"},
    ])
    _drop(str(inbox), "q-0002.parquet", [
        {"id": "ok1", "text": "psi psi", "lang": "en", "seq": 1, "op": "index"},
    ])

    def poison_apply(index_dir, ds, cfg, **kw):
        if "poison" in set(ds.to_pandas()["id"]):
            time.sleep(30)
        return apply_incremental(index_dir, ds, cfg, **kw)

    out = follow_directory(
        str(inbox), base_index, CFG, poll_s=0.05, idle_stop_s=0.5,
        # TTL must be >> a legitimate apply on a degraded host (CLAUDE.md
        # rule 5: this VM swings 2-3x) while << the 30 s poison sleep —
        # 1.0 s made the healthy q-0002 apply a coin-flip quarantine
        watchdog_ttl_s=4.0, watchdog_max_restarts=1, _apply_fn=poison_apply,
    )
    assert out["quarantined"] == ["q-0001.parquet"]
    assert out["files_applied"] == 1
    entries = {e["file"]: e for e in read_ledger(base_index)["consumed"]}
    assert entries["q-0001.parquet"].get("error") == "watchdog_quarantined"
    assert "gen" in entries["q-0002.parquet"]
    assert IndexSearcher(base_index, CFG).count("psi") == 1
    # quarantined file never re-pends
    assert pending_files(str(inbox), base_index) == []


def test_follow_auto_merge_compacts_deltas(base_index, tmp_path):
    """follow with auto_merge_max_segments: delta segments accumulated by
    micro-batches are compacted between applies (the ES background-merge
    scheduler shape); results stay visible and the ledger is intact."""
    from kafka_es_ray.index.segment import read_manifest
    from kafka_es_ray.query.engine import IndexSearcher

    inbox = tmp_path / "inbox2"
    inbox.mkdir()
    for i in range(4):
        _drop(str(inbox), f"c-{i:04d}.parquet", [
            {"id": f"m{i}", "text": f"mergeword{i} alpha", "lang": "en",
             "seq": i + 1, "op": "index"},
        ])
    base_parts = len(read_manifest(base_index)["parts"])
    out = follow_directory(
        str(inbox), base_index, CFG, poll_s=0.05, idle_stop_s=0.2,
        auto_merge_max_segments=base_parts + 1,
    )
    assert out["files_applied"] == 4
    assert out["auto_merges"] >= 1
    m = read_manifest(base_index)
    assert len(m["parts"]) <= base_parts + 1
    s = IndexSearcher(base_index, CFG)
    for i in range(4):
        assert len(s.search(f"mergeword{i}")) == 1, i


def test_follow_percolate_alerts(base_index, tmp_path):
    """follow with alert_queries: every applied doc percolates against
    the registered queries (or/and semantics), matches append to
    alerts.jsonl with (file, key, query_id); deletes never alert."""
    inbox = tmp_path / "inbox3"
    inbox.mkdir()
    _drop(str(inbox), "a-0001.parquet", [
        {"id": "w1", "text": "fraud alert signal", "lang": "en",
         "seq": 1, "op": "index"},
        {"id": "w2", "text": "calm ordinary text", "lang": "en",
         "seq": 1, "op": "index"},
    ])
    _drop(str(inbox), "a-0002.parquet", [
        {"id": "w3", "text": "fraud only", "lang": "en", "seq": 2, "op": "index"},
        {"id": "w1", "text": "x", "lang": "en", "seq": 3, "op": "delete"},
    ])
    alerts = pd.DataFrame(
        {
            "query_id": [0, 1],
            "text": ["fraud signal", "fraud signal"],
            "operator": ["or", "and"],
        }
    )
    out = follow_directory(
        str(inbox), base_index, CFG, poll_s=0.05, idle_stop_s=0.2,
        alert_queries=alerts,
    )
    # or-query hits w1 (both terms), w3 (fraud); and-query hits only w1
    assert out["alerts_total"] == 3
    lines = [json.loads(ln) for ln in
             open(os.path.join(base_index, "alerts.jsonl"))]
    got = {(e["key"], e["query_id"]) for e in lines}
    assert got == {("w1", 0), ("w3", 0), ("w1", 1)}
    assert all(e["file"].startswith("a-000") for e in lines)
