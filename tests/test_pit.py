"""ES point-in-time search: a PIT freezes the manifest view — searches
with the pit id ignore later incremental deletes/upserts; the id is a
self-contained token (no server-side context)."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.incremental import apply_incremental
from kafka_es_ray.query.engine import decode_pit, open_pit, run_queries

CFG = EngineConfig(num_partitions=4)


@pytest.fixture()
def idx(ray_session, tmp_path):
    import ray.data as rd

    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(30)],
            "text": [f"red gold w{i % 5}" for i in range(30)],
            "lang": ["en"] * 30,
        }
    )
    d = str(tmp_path / "pitidx")
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    return d


def _q():
    return pd.DataFrame(
        {"query_id": np.int64([0]), "text": ["red gold"], "lang": "en",
         "k": np.int32(50)}
    )


def test_pit_roundtrip_and_freeze(idx):
    pit = open_pit(idx)
    assert isinstance(pit, str) and decode_pit(pit)["n_docs"] == 30
    before = run_queries(_q(), idx, CFG, pit=pit).to_pandas()
    upd = pd.DataFrame(
        {
            "url": ["d0", "new1", "new2"],
            "text": [None, "red gold red gold red gold", "red gold stuffing"],
            "lang": "en",
            "op": ["delete", "index", "index"],
        }
    )
    apply_incremental(idx, upd, CFG, key_col="url", seq_col=None)
    pit_view = run_queries(_q(), idx, CFG, pit=pit).to_pandas()
    live_view = run_queries(_q(), idx, CFG).to_pandas()
    # PIT search repeats the pre-update result exactly
    pd.testing.assert_frame_equal(before, pit_view)
    # the live view saw the mutation: one delete, two adds
    assert len(live_view) == len(before) + 1
    assert set(before["doc_id"]) - set(live_view["doc_id"])  # deleted doc


def test_pit_rejects_multi_index(idx):
    pit = open_pit(idx)
    with pytest.raises(ValueError):
        run_queries(_q(), [idx, idx], CFG, pit=pit)
