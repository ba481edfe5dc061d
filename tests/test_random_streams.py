"""Randomized robustness: seeded random action streams and corpora,
checked against independent oracles (the reference repeats its
concurrency e2e 1000x for races, ElasticsearchSinkTaskTests.kt:58-100;
we sweep randomized inputs instead — determinism makes races moot)."""

import json

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.stages.actions import resolve_actions


def _indep_merge(old, patch):
    # independent recursive merge (deliberately re-implemented)
    if not isinstance(patch, dict) or not isinstance(old, dict):
        return patch
    r = {}
    for k in set(old) | set(patch):
        if k in patch and k in old:
            r[k] = _indep_merge(old[k], patch[k])
        elif k in patch:
            r[k] = patch[k]
        else:
            r[k] = old[k]
    return r


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_action_streams_vs_state_machine(ray_session, seed):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = 400
    ids = [f"d{int(i)}" for i in rng.integers(0, 40, n)]
    ops = rng.choice(["index", "create", "update", "delete"], n, p=[0.4, 0.15, 0.3, 0.15])
    rows = []
    for s, (op, did) in enumerate(zip(ops, ids)):
        src = None
        if op in ("index", "create"):
            src = json.dumps({"v": s, "nest": {"a": int(s % 3)}}, separators=(",", ":"))
        elif op == "update":
            body = {"doc": {"nest": {"b": int(s % 5)}}} if s % 2 else {"v": -s}
            src = json.dumps(body, separators=(",", ":"))
        rows.append({"op": op, "id": did, "index": "t", "routing": None, "seq": s, "source": src, "error": None})
    df = pd.DataFrame(rows)

    out = resolve_actions(rd.from_pandas(df)).to_pandas()

    # independent dict state machine
    state: dict = {}
    for r in rows:
        key = r["id"]
        if r["op"] == "index":
            state[key] = json.loads(r["source"])
        elif r["op"] == "create":
            state.setdefault(key, json.loads(r["source"]))
        elif r["op"] == "update":
            if key in state:
                p = json.loads(r["source"])
                p = p.get("doc", p)
                state[key] = _indep_merge(state[key], p)
        elif r["op"] == "delete":
            state.pop(key, None)
    assert sorted(out["id"]) == sorted(state)
    got = {r["id"]: json.loads(r["source"]) for r in out.to_dict("records")}
    assert got == state


@pytest.mark.parametrize("seed", [11, 12])
def test_random_corpus_rank_identity(ray_session, seed, tmp_path):
    """Random tiny corpora: engine must stay rank-identical to the
    brute-force oracle regardless of content shape."""
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.bruteforce import bruteforce_topk
    from kafka_es_ray.query.engine import IndexSearcher

    rng = np.random.default_rng(seed)
    vocab = np.array([f"t{i}" for i in range(30)] + ["x"], dtype=object)
    n = 120
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40))) for _ in range(n)]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "key": [f"k{i}" for i in range(n)],
            "text": texts,
            "lang": "en",
        }
    )
    cfg = EngineConfig(num_partitions=3)
    idx = str(tmp_path / f"r{seed}")
    build_index(
        rd.from_pandas(df),
        idx,
        cfg,
        key_col="key",
        html_col=None,
        ts_col=None,
        id_col="doc_id",
    )
    s = IndexSearcher(idx, cfg)
    for q in ["t1", "t1 t2 t3", "x t29", "absenterm", "t0 t0 t0"]:
        eng = s.search(q, k=15)
        ora = bruteforce_topk(df, q, k=15)
        assert eng["doc_id"].tolist() == ora["doc_id"].tolist(), q
        assert eng["score"].tolist() == ora["score"].tolist(), q
