"""Index build: manifest invariants, LWW dedup, determinism across
parallelism, resume-from-manifest (SURVEY §5 transfer list)."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.fixtures import make_pages
from kafka_es_ray.index.build import build_index, build_segment_for_group
from kafka_es_ray.index.segment import Segment, read_manifest

CFG = EngineConfig(num_partitions=4)


@pytest.fixture(scope="module")
def built(ray_session, pages_small, tmp_path_factory):
    import ray.data as rd

    idx = str(tmp_path_factory.mktemp("idx"))
    m = build_index(rd.from_arrow(pages_small), idx, CFG)
    return idx, m


def test_manifest_stats(built, pages_small):
    idx, m = built
    n_unique_urls = len(set(pages_small.column("url").to_pylist()))
    assert m["n_docs"] == n_unique_urls  # LWW dedup: one doc per url
    assert m["parts"] == sorted(m["parts"])
    assert m["avgdl"] == m["sum_dl"] / m["n_docs"]
    per_part = sum(pm["n_docs"] for pm in m["part_manifests"].values())
    assert per_part == m["n_docs"]


def test_segments_load_and_sorted(built):
    idx, m = built
    for pid in m["parts"]:
        s = Segment.load(idx, pid)
        assert (np.diff(s.doc_ids_store) > 0).all()
        terms = s.terms.tolist()
        assert terms == sorted(terms)
        # postings decode: doc ids strictly ascending, df matches
        for ti in range(0, s.terms.size, max(1, s.terms.size // 17)):
            ids, tfs = s.postings(ti)
            assert ids.size == s.df[ti] == tfs.size
            assert (np.diff(ids) > 0).all()
            assert (tfs >= 1).all()
            # every posting doc exists in the docstore
            assert np.isin(ids, s.doc_ids_store).all()


def test_lww_picks_latest(built, pages_small):
    """For a duplicated url the indexed doc_len must match the row with
    the max warc_ts (reference E1 upsert: last write wins per _id)."""
    idx, m = built
    df = pages_small.to_pandas()
    dups = df[df.duplicated("url", keep=False)]
    assert len(dups) > 0
    winner = dups.sort_values("warc_ts").groupby("url").tail(1).iloc[0]
    from kafka_es_ray.functions.textproc import extract_text
    from kafka_es_ray.functions.tokenizer import get_analyzer

    text = winner["text"] if winner["text"] is not None else extract_text(winner["html"])
    expect_dl = len(get_analyzer(winner["lang"]).tokenize(text))
    for pid in m["parts"]:
        s = Segment.load(idx, pid)
        hit = np.flatnonzero(s.keys == winner["url"])
        if hit.size:
            assert int(s.doc_len[hit[0]]) == expect_dl
            return
    raise AssertionError("winner url not found in any segment")


def test_deterministic_across_parallelism(ray_session, pages_small, tmp_path):
    """Same corpus at different block layouts -> byte-identical postings
    and manifests (FIXTURES.md §4 determinism/resume)."""
    import ray.data as rd

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(rd.from_arrow(pages_small), a, CFG)
    build_index(rd.from_arrow(pages_small).repartition(7), b, CFG)
    ma, mb = read_manifest(a), read_manifest(b)
    strip = lambda pm: {k: {**v, "build_secs": None} for k, v in pm.items()}
    assert strip(ma["part_manifests"]) == strip(mb["part_manifests"])
    for pid in ma["parts"]:
        sa, sb = Segment.load(a, pid), Segment.load(b, pid)
        assert sa.terms.tolist() == sb.terms.tolist()
        assert sa.doc_ids_store.tolist() == sb.doc_ids_store.tolist()
        assert sa.doc_ids_enc == sb.doc_ids_enc
        assert sa.tfs_enc == sb.tfs_enc


def test_resume_skips_completed(ray_session, pages_small, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "idx")
    m1 = build_index(rd.from_arrow(pages_small), idx, CFG)
    # sabotage one partition: delete its manifest (simulates a crash
    # between file write and commit point)
    victim = m1["parts"][0]
    os.remove(os.path.join(idx, f"part-{victim:05d}.manifest.json"))
    stamp = {}
    for pid in m1["parts"][1:]:
        p = os.path.join(idx, f"postings-{pid:05d}.parquet")
        stamp[pid] = os.stat(p).st_mtime_ns
    m2 = build_index(rd.from_arrow(pages_small), idx, CFG, resume=True)
    assert m2["n_docs"] == m1["n_docs"]
    assert m2["part_manifests"][str(victim)]["n_docs"] == m1["part_manifests"][str(victim)]["n_docs"]
    # completed partitions were NOT rebuilt
    for pid, t in stamp.items():
        p = os.path.join(idx, f"postings-{pid:05d}.parquet")
        assert os.stat(p).st_mtime_ns == t


def test_segment_group_builder_pure(tmp_path):
    """build_segment_for_group is a pure function of its group (unit
    level, no Ray)."""
    g = pd.DataFrame(
        {
            "url": ["u/b", "u/a", "u/a"],
            "warc_ts": pd.to_datetime(["2025-01-02", "2025-01-01", "2025-01-03"]),
            "text": ["beta beta alpha", "old text", "alpha gamma"],
            "lang": ["en", "en", "en"],
            "part_id": [3, 3, 3],
        }
    )
    out = build_segment_for_group(
        g, str(tmp_path), CFG, "url", "text", "lang", "warc_ts", None, None, None
    )
    m = json.loads(out["manifest"].iloc[0])
    assert m["n_docs"] == 2  # u/a deduped to the 2025-01-03 crawl
    s = Segment.load(str(tmp_path), 3)
    assert s.keys.tolist() == ["u/a", "u/b"]  # sorted by key
    assert s.doc_len.tolist() == [2, 3]
    ti = s.lookup("alpha")
    ids, tfs = s.postings(ti)
    assert ids.tolist() == s.doc_ids_store.tolist()  # alpha in both docs
    assert tfs.tolist() == [1, 1]
    assert s.lookup("old") == -1  # loser text is not indexed


def test_atomic_write_retries_transient_failure(tmp_path, monkeypatch):
    """The writer retry loop (reference Actors.kt:236-259 analog): a
    transient FS error is retried with backoff; the file lands intact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_es_ray.index import segment as seg

    calls = {"n": 0}
    real = pq.write_table

    def flaky(table, path, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected transient failure")
        return real(table, path, **kw)

    monkeypatch.setattr(pq, "write_table", flaky)
    t = pa.table({"x": [1, 2, 3]})
    path = str(tmp_path / "out.parquet")
    seg.atomic_write_table(t, path, retries=2, retry_delay_s=0.001)
    assert calls["n"] == 2
    assert pq.read_table(path).num_rows == 3


def test_routing_nan_falls_back_to_key(ray_session, tmp_path):
    """A null routing column (float NaN from parquet) must fall back to
    the key column per the reference router precedence — not treat NaN as
    one hot routing key sending every row to a single partition."""
    import pandas as pd
    import ray.data as rd

    n = 200
    docs = pd.DataFrame(
        {
            "url": [f"https://e.x/{i}" for i in range(n)],
            "text": ["alpha beta"] * n,
            "lang": ["en"] * n,
            "routing": pd.Series([None] * n, dtype="float64"),  # all-null numeric
        }
    )
    cfg = EngineConfig(num_partitions=8)
    idx = str(tmp_path / "nanroute")
    m = build_index(
        rd.from_pandas(docs), idx, cfg, html_col=None, ts_col=None, routing_col="routing"
    )
    # NaN-as-key would put all 200 docs in ONE partition
    sizes = [pm["n_docs"] for pm in m["part_manifests"].values()]
    assert max(sizes) < n
    assert sum(sizes) == n
