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
