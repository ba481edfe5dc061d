"""ES kNN search over a dense_vector mapped field (cfg.vector_cols):
exact cosine ranking per segment (the ES script_score / exact-knn
contract), numpy float64 oracle, missing-vector and tombstone exclusion,
vector columns surviving the decode merge."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.incremental import apply_incremental
from kafka_es_ray.index.merge import merge_index
from kafka_es_ray.query.engine import IndexSearcher, run_knn

CFG = EngineConfig(num_partitions=4, vector_cols=("emb",))
N, DIM = 60, 8
RNG = np.random.default_rng(41)
VECS = RNG.normal(size=(N, DIM)).astype(np.float32)
MISSING = 5  # this doc has no vector and must never be a kNN hit


@pytest.fixture(scope="module")
def knn_index(ray_session, tmp_path_factory):
    import ray.data as rd

    emb = [v.tolist() for v in VECS]
    emb[MISSING] = None
    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(N)],
            "text": ["alpha beta"] * N,
            "lang": ["en"] * N,
            "emb": emb,
        }
    )
    d = str(tmp_path_factory.mktemp("knnidx"))
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    return d


def _id_map(d: str) -> dict[str, int]:
    s = IndexSearcher(d, CFG)
    return {
        k: int(did)
        for seg in s.segments
        for did, k in zip(seg.doc_ids_store, seg.keys)
    }


def _oracle(d: str, qv: np.ndarray, k: int, excluded: set[int]) -> list[tuple]:
    ids = _id_map(d)
    v64 = VECS.astype(np.float64)
    vn = v64 / np.linalg.norm(v64, axis=1, keepdims=True)
    sims = vn @ (qv.astype(np.float64) / np.linalg.norm(qv))
    r6 = np.floor(sims * 1e6 + 0.5) / 1e6
    cand = [(ids[f"d{i}"], r6[i]) for i in range(N) if i not in excluded]
    return sorted(cand, key=lambda t: (-t[1], t[0]))[:k]


def test_knn_matches_numpy_oracle(knn_index, ray_session):
    q = pd.DataFrame(
        {
            "query_id": np.int64([0, 1, 2]),
            "vec": [VECS[0].tolist(), VECS[7].tolist(), VECS[0].tolist()],
            "k": np.int32(5),
        }
    )
    out = run_knn(q, knn_index, "emb", CFG, concurrency=2).to_pandas()
    for qid, qv in [(0, VECS[0]), (1, VECS[7]), (2, VECS[0])]:
        want = _oracle(knn_index, qv, 5, {MISSING})
        g = out[out["query_id"] == qid].sort_values("rank")
        assert list(zip(g["doc_id"], g["score"])) == want, qid
    # identical query vectors dedupe into one plan but fan out to both ids
    g0 = out[out["query_id"] == 0].reset_index(drop=True)
    g2 = out[out["query_id"] == 2].reset_index(drop=True)
    assert g0["doc_id"].tolist() == g2["doc_id"].tolist()
    # the self-vector is its own nearest neighbor at sim 1.0
    assert g0.iloc[0]["score"] == 1.0


def test_knn_unmapped_field_raises(knn_index, ray_session):
    q = pd.DataFrame(
        {"query_id": np.int64([0]), "vec": [VECS[0].tolist()], "k": np.int32(3)}
    )
    with pytest.raises(Exception):
        run_knn(q, knn_index, "nope", CFG, concurrency=2).to_pandas()


def test_knn_tombstone_and_decode_merge(knn_index, ray_session, tmp_path):
    import shutil

    d = str(tmp_path / "knn_merge")
    shutil.copytree(knn_index, d)
    # delete the current top hit for query VECS[7]; it must disappear
    top = _oracle(d, VECS[7], 1, {MISSING})[0][0]
    inv = {v: k for k, v in _id_map(d).items()}
    victim_key = inv[top]
    delta = pd.DataFrame(
        {
            "id": [victim_key],
            "text": [None],
            "lang": ["en"],
            "op": ["delete"],
        }
    )
    apply_incremental(d, delta, CFG, key_col="id")
    victim_i = int(victim_key[1:])
    q = pd.DataFrame(
        {"query_id": np.int64([0]), "vec": [VECS[7].tolist()], "k": np.int32(5)}
    )
    out = run_knn(q, d, "emb", CFG, concurrency=2).to_pandas().sort_values("rank")
    want = _oracle(d, VECS[7], 5, {MISSING, victim_i})
    assert list(zip(out["doc_id"], out["score"])) == want
    assert top not in set(out["doc_id"])
    # tombstones force the DECODE merge path; vectors must survive it
    merge_index(d, 4)
    out2 = run_knn(q, d, "emb", CFG, concurrency=2).to_pandas().sort_values("rank")
    assert out2["score"].tolist() == out["score"].tolist()
    # keys are stable across the merge even though doc ids may re-base
    inv2 = {v: k for k, v in _id_map(d).items()}
    assert [inv2[i] for i in out2["doc_id"]] == [inv[i] for i in out["doc_id"]]


def test_rrf_hybrid_fuses_retrievers(knn_index, ray_session):
    """ES RRF hybrid search: fused score = round6(1/(rc+bm25_rank) +
    1/(rc+knn_rank)), composed from the two independently rank-verified
    retrievers; a doc found by only one retriever gets that term alone."""
    from kafka_es_ray.query.engine import run_knn, run_queries, run_rrf

    rc, win = 60, 15
    q = pd.DataFrame(
        {
            "query_id": np.int64([0]),
            "text": ["alpha"],
            "vec": [VECS[3].tolist()],
            "k": np.int32(10),
        }
    )
    bm = run_queries(
        q[["query_id", "text"]].assign(k=np.int32(win)), knn_index, CFG,
        concurrency=2,
    ).to_pandas()
    kn = run_knn(
        q[["query_id", "vec"]].assign(k=np.int32(win)), knn_index, "emb", CFG,
        concurrency=2,
    ).to_pandas()
    exp = {}
    for df in (bm, kn):
        for d, r in zip(df["doc_id"], df["rank"]):
            exp[d] = exp.get(d, 0.0) + 1.0 / (rc + r)
    exp = {d: float(np.floor(s * 1e6 + 0.5) / 1e6) for d, s in exp.items()}
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = run_rrf(
        q, knn_index, "emb", CFG, concurrency=2, rank_window=win,
        rank_constant=rc,
    )
    assert list(zip(out["doc_id"], out["score"])) == want
    # both retrievers contributed: the fused top doc's score exceeds the
    # max single-retriever term
    assert out["score"].iloc[0] > 1.0 / (rc + 1)


def test_knn_prefilter(ray_session, tmp_path_factory):
    """ES knn filter clause: the top-k is computed among FILTERED docs
    only (pre-filter, not post-filter) — a filtered-out nearer neighbor
    must not shrink the result below k."""
    import ray.data as rd

    emb = [v.tolist() for v in VECS]
    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(N)],
            "text": ["alpha"] * N,
            "lang": ["en"] * N,
            "grp": ["a" if i % 2 else "b" for i in range(N)],
            "emb": emb,
        }
    )
    cfg = EngineConfig(
        num_partitions=4, vector_cols=("emb",), keyword_cols=("grp",)
    )
    d = str(tmp_path_factory.mktemp("knnfidx"))
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    q = pd.DataFrame(
        {
            "query_id": np.int64([0]),
            "vec": [VECS[0].tolist()],
            "kw_field": ["grp"],
            "kw_value": ["a"],
            "k": np.int32(8),
        }
    )
    out = run_knn(q, d, "emb", cfg, concurrency=2).to_pandas().sort_values("rank")
    ids = {
        k: int(v)
        for seg in IndexSearcher(d, cfg).segments
        for v, k in zip(seg.doc_ids_store, seg.keys)
    }
    v64 = VECS.astype(np.float64)
    vn = v64 / np.linalg.norm(v64, axis=1, keepdims=True)
    sims = vn @ (v64[0] / np.linalg.norm(v64[0]))
    r6 = np.floor(sims * 1e6 + 0.5) / 1e6
    cand = [(ids[f"d{i}"], r6[i]) for i in range(N) if i % 2]  # grp == "a"
    want = sorted(cand, key=lambda t: (-t[1], t[0]))[:8]
    assert list(zip(out["doc_id"], out["score"])) == want
    assert len(out) == 8  # pre-filter: still k results from the filtered set
    # doc 0 (grp b, the self-match at sim 1.0) must be excluded
    assert ids["d0"] not in set(out["doc_id"])


def test_searcher_knn_matches_distributed(knn_index, ray_session):
    """IndexSearcher.knn (single-process) == run_knn (distributed),
    including the filter clause path."""
    s = IndexSearcher(knn_index, CFG)
    local = s.knn(VECS[2].tolist(), "emb", k=7)
    q = pd.DataFrame(
        {"query_id": np.int64([0]), "vec": [VECS[2].tolist()], "k": np.int32(7)}
    )
    dist = run_knn(q, knn_index, "emb", CFG, concurrency=2).to_pandas()
    dist = dist.sort_values("rank")
    assert local["doc_id"].tolist() == dist["doc_id"].tolist()
    assert local["score"].tolist() == dist["score"].tolist()
    assert local["key"].tolist()  # keys resolved


def test_knn_multi_index_equals_combined(ray_session, tmp_path_factory):
    """Multi-index kNN (GET /idx_a,idx_b/_search knn): searching the
    corpus split across two indexes returns the same neighbors (by key)
    as the combined single index — cosine needs no cross-index stats."""
    import ray.data as rd

    from kafka_es_ray.query.engine import run_knn

    cfg = EngineConfig(num_partitions=2, vector_cols=("emb",))
    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(N)],
            "text": ["alpha"] * N,
            "lang": ["en"] * N,
            "emb": [v.tolist() for v in VECS],
        }
    )
    base = tmp_path_factory.mktemp("knnmulti")
    d_all = str(base / "all")
    d_even = str(base / "even")
    d_odd = str(base / "odd")
    build_index(rd.from_pandas(docs), d_all, cfg, html_col=None, ts_col=None)
    build_index(
        rd.from_pandas(docs[docs.index % 2 == 0]), d_even, cfg,
        html_col=None, ts_col=None,
    )
    build_index(
        rd.from_pandas(docs[docs.index % 2 == 1]), d_odd, cfg,
        html_col=None, ts_col=None,
    )
    q = pd.DataFrame(
        {"query_id": np.int64([0]), "vec": [VECS[4].tolist()], "k": np.int32(8)}
    )
    one = run_knn(q, d_all, "emb", cfg, concurrency=2).to_pandas()
    two = run_knn(q, [d_even, d_odd], "emb", cfg, concurrency=2).to_pandas()
    assert "index_id" in two.columns
    key_all = {
        int(v): k for s in IndexSearcher(d_all, cfg).segments
        for v, k in zip(s.doc_ids_store, s.keys)
    }
    key_e = {
        (0, int(v)): k for s in IndexSearcher(d_even, cfg).segments
        for v, k in zip(s.doc_ids_store, s.keys)
    }
    key_o = {
        (1, int(v)): k for s in IndexSearcher(d_odd, cfg).segments
        for v, k in zip(s.doc_ids_store, s.keys)
    }
    keys_one = [key_all[i] for i in one.sort_values("rank")["doc_id"]]
    two_s = two.sort_values("rank")
    keys_two = [
        {**key_e, **key_o}[(int(i), int(d))]
        for i, d in zip(two_s["index_id"], two_s["doc_id"])
    ]
    assert keys_one == keys_two
    assert one.sort_values("rank")["score"].tolist() == two_s["score"].tolist()


def test_rrf_multi_index(ray_session, tmp_path_factory):
    """RRF over a multi-index pair: fusion keys include index_id (doc
    ids may collide across indexes) and the fused ranking by key equals
    the combined single index's."""
    import ray.data as rd

    from kafka_es_ray.query.engine import run_rrf

    cfg = EngineConfig(num_partitions=2, vector_cols=("emb",))
    rng2 = np.random.default_rng(7)
    texts = [
        " ".join(rng2.choice(["alpha", "beta", "gamma"], size=4)) for _ in range(N)
    ]
    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(N)],
            "text": texts,
            "lang": ["en"] * N,
            "emb": [v.tolist() for v in VECS],
        }
    )
    base = tmp_path_factory.mktemp("rrfmulti")
    d_all, d_e, d_o = str(base / "all"), str(base / "e"), str(base / "o")
    build_index(rd.from_pandas(docs), d_all, cfg, html_col=None, ts_col=None)
    build_index(rd.from_pandas(docs[docs.index % 2 == 0]), d_e, cfg, html_col=None, ts_col=None)
    build_index(rd.from_pandas(docs[docs.index % 2 == 1]), d_o, cfg, html_col=None, ts_col=None)
    q = pd.DataFrame(
        {
            "query_id": np.int64([0]),
            "text": ["alpha beta"],
            "vec": [VECS[9].tolist()],
            "k": np.int32(8),
        }
    )
    one = run_rrf(q, d_all, "emb", cfg, concurrency=2, rank_window=12)
    two = run_rrf(q, [d_e, d_o], "emb", cfg, concurrency=2, rank_window=12)
    assert "index_id" in two.columns
    key_all = {
        int(v): k for s in IndexSearcher(d_all, cfg).segments
        for v, k in zip(s.doc_ids_store, s.keys)
    }
    kmap = {}
    for iid, d in ((0, d_e), (1, d_o)):
        for s in IndexSearcher(d, cfg).segments:
            for v, k in zip(s.doc_ids_store, s.keys):
                kmap[(iid, int(v))] = k
    keys_one = [key_all[i] for i in one["doc_id"]]
    keys_two = [kmap[(int(i), int(d))] for i, d in zip(two["index_id"], two["doc_id"])]
    # scores agree position-by-position; key identity must agree within
    # each tie group ABOVE the k-th score (fused ties break on the
    # layout's own doc ids, so boundary-tie membership may differ)
    assert one["score"].tolist() == two["score"].tolist()
    cutoff = one["score"].iloc[-1]
    g1, g2 = {}, {}
    for ks, df_, acc in ((keys_one, one, g1), (keys_two, two, g2)):
        for k2, s2 in zip(ks, df_["score"]):
            if s2 > cutoff:
                acc.setdefault(s2, set()).add(k2)
    assert g1 == g2


def test_knn_incremental_vector_visible(knn_index, ray_session, tmp_path):
    """A vectored doc added through the incremental delta path becomes a
    kNN hit (delta segments store vec_ columns like the base build)."""
    import shutil

    d = str(tmp_path / "knn_inc")
    shutil.copytree(knn_index, d)
    newv = (VECS[0] + 0.001).tolist()
    delta = pd.DataFrame(
        {
            "id": ["new1"],
            "text": ["alpha"],
            "lang": ["en"],
            "emb": [newv],
            "seq": [1],
            "op": ["index"],
        }
    )
    apply_incremental(d, delta, CFG, key_col="id")
    q = pd.DataFrame(
        {"query_id": np.int64([0]), "vec": [VECS[0].tolist()], "k": np.int32(3)}
    )
    out = run_knn(q, d, "emb", CFG, concurrency=2).to_pandas()
    assert "new1" in set(out["key"])


def test_knn_dot_and_l2_similarities(knn_index, ray_session):
    """ES dense_vector similarity options: dot_product = raw inner
    product, l2_norm = 1/(1 + ||v-q||^2) — both round6'd, numpy float64
    oracle; ranking differs from cosine when magnitudes vary."""
    ids = _id_map(knn_index)
    q = pd.DataFrame(
        {"query_id": np.int64([0]), "vec": [VECS[1].tolist()], "k": np.int32(6)}
    )
    v64 = VECS.astype(np.float64)
    qv = v64[1]
    for sim_name, fn in (
        ("dot_product", lambda m: m @ qv),
        ("l2_norm", lambda m: 1.0 / (1.0 + ((m - qv) ** 2).sum(axis=1))),
    ):
        out = run_knn(
            q, knn_index, "emb", CFG, concurrency=2, similarity=sim_name
        ).to_pandas().sort_values("rank")
        raw = fn(v64)
        r6 = np.floor(raw * 1e6 + 0.5) / 1e6
        cand = [(ids[f"d{i}"], r6[i]) for i in range(N) if i != MISSING]
        want = sorted(cand, key=lambda t: (-t[1], t[0]))[:6]
        got = list(zip(out["doc_id"], out["score"]))
        assert got == want, sim_name
    with pytest.raises(Exception):
        run_knn(
            q, knn_index, "emb", CFG, concurrency=2, similarity="nope"
        ).to_pandas()


def test_knn_prefilter_kw(ray_session, tmp_path):
    """ES knn `filter` clause is a PRE-filter: top-k is computed among
    matching docs only, and equals the numpy oracle restricted to the
    filtered group (not a post-cut of the unfiltered top-k)."""
    import ray.data as rd

    cfg = EngineConfig(
        num_partitions=4, vector_cols=("emb",), keyword_cols=("src",)
    )
    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(N)],
            "text": ["alpha beta"] * N,
            "lang": ["en"] * N,
            "src": [f"s{i % 3}" for i in range(N)],
            "emb": [v.tolist() for v in VECS],
        }
    )
    d = str(tmp_path / "knn_filt")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    q = pd.DataFrame(
        {
            "query_id": np.int64([0, 1]),
            "vec": [VECS[0].tolist(), VECS[0].tolist()],
            "k": np.int32(5),
            "kw_field": ["src", None],
            "kw_value": ["s1", None],
        }
    )
    out = run_knn(q, d, "emb", cfg, concurrency=2).to_pandas()
    not_s1 = {i for i in range(N) if i % 3 != 1}
    want = _oracle(d, VECS[0], 5, not_s1)
    g = out[out["query_id"] == 0].sort_values("rank")
    assert list(zip(g["doc_id"], g["score"])) == want
    # unfiltered companion differs (pre-filter, not post-cut) and the
    # filtered hits are a strict subset of the s1 group
    g1 = out[out["query_id"] == 1].sort_values("rank")
    assert g1["doc_id"].tolist() != g["doc_id"].tolist()
    ids = _id_map(d)
    s1_ids = {ids[f"d{i}"] for i in range(N) if i % 3 == 1}
    assert set(g["doc_id"]) <= s1_ids


def test_knn_min_similarity_cutoff(knn_index, ray_session):
    """min_similarity drops hits below the round6'd cosine threshold;
    the kept prefix equals the unfiltered ranking's prefix; a cutoff
    above every score returns nothing (typed empty)."""
    from kafka_es_ray.query.engine import run_knn

    q = pd.DataFrame({"query_id": [0], "vec": [VECS[0].tolist()], "k": 50})
    full = run_knn(q, knn_index, "emb", CFG).to_pandas().sort_values("rank")
    thr = float(full["score"].iloc[len(full) // 2])  # median score
    cut = run_knn(
        q, knn_index, "emb", CFG, min_similarity=thr
    ).to_pandas().sort_values("rank")
    want = full[full["score"] >= thr]
    assert cut["doc_id"].tolist() == want["doc_id"].tolist()
    assert cut["rank"].tolist() == list(range(1, len(want) + 1))
    assert 0 < len(cut) < len(full)
    nothing = run_knn(q, knn_index, "emb", CFG, min_similarity=2.0)
    assert nothing.count() == 0


def test_linear_hybrid_minmax_fusion(knn_index, ray_session):
    """ES linear retriever: fused score = round6(w1*minmax(bm25) +
    w2*minmax(cosine)) over each retriever's window, composed from the
    two independently rank-verified retrievers; absent docs contribute
    0 for that retriever; normalizer='none' passes raw scores."""
    from kafka_es_ray.query.engine import run_knn, run_linear, run_queries

    win, w1, w2 = 15, 2.0, 0.5
    q = pd.DataFrame(
        {
            "query_id": np.int64([0]),
            "text": ["alpha"],
            "vec": [VECS[3].tolist()],
            "k": np.int32(10),
        }
    )
    bm = run_queries(
        q[["query_id", "text"]].assign(k=np.int32(win)), knn_index, CFG,
        concurrency=2,
    ).to_pandas()
    kn = run_knn(
        q[["query_id", "vec"]].assign(k=np.int32(win)), knn_index, "emb", CFG,
        concurrency=2,
    ).to_pandas()

    def norm(df):
        s = df["score"].to_numpy(np.float64)
        if s.size == 0:
            return {}
        mn, mx = s.min(), s.max()
        n = np.ones_like(s) if mx == mn else (s - mn) / (mx - mn)
        return dict(zip(df["doc_id"], n))

    exp = {}
    for df, w in ((bm, w1), (kn, w2)):
        for d, nv in norm(df).items():
            exp[d] = exp.get(d, 0.0) + w * nv
    exp = {d: float(np.floor(s * 1e6 + 0.5) / 1e6) for d, s in exp.items()}
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = run_linear(
        q, knn_index, "emb", CFG, concurrency=2, rank_window=win,
        weights=(w1, w2),
    )
    assert list(zip(out["doc_id"], out["score"])) == want
    # each retriever's window top scores exactly w_i after minmax: the
    # fused max is <= w1 + w2 and > max(w1, w2) only when some doc tops
    # both windows — sanity-bound the range
    assert 0.0 < out["score"].iloc[0] <= w1 + w2 + 1e-9
    # normalizer="none": fused = round6(w1*bm + w2*cos) raw
    exp2 = {}
    for df, w in ((bm, w1), (kn, w2)):
        for d, s in zip(df["doc_id"], df["score"]):
            exp2[d] = exp2.get(d, 0.0) + w * float(s)
    exp2 = {d: float(np.floor(s * 1e6 + 0.5) / 1e6) for d, s in exp2.items()}
    want2 = sorted(exp2.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out2 = run_linear(
        q, knn_index, "emb", CFG, concurrency=2, rank_window=win,
        weights=(w1, w2), normalizer="none",
    )
    assert list(zip(out2["doc_id"], out2["score"])) == want2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="normalizer"):
        run_linear(q, knn_index, "emb", CFG, normalizer="zscore")


def test_retriever_tree_equivalences(knn_index, ray_session):
    """run_retriever: the rrf tree over [standard, knn] reproduces
    run_rrf; the linear tree reproduces run_linear; an N-ary nested tree
    evaluates (generalization beyond the fixed pairs); unknown nodes and
    bad normalizers raise."""
    from kafka_es_ray.query.engine import (
        run_linear,
        run_retriever,
        run_rrf,
    )

    d = knn_index
    q = pd.DataFrame(
        {
            "query_id": np.int64([0, 1]),
            "text": ["alpha beta", "alpha"],
            "vec": [VECS[3].tolist(), VECS[7].tolist()],
            "k": np.int32(8),
        }
    )
    spec_rrf = {
        "rrf": {
            "retrievers": [{"standard": {}}, {"knn": {"field": "emb"}}],
            "rank_window_size": 15,
            "rank_constant": 60,
        }
    }
    got = run_retriever(q, d, spec_rrf, CFG, concurrency=2)
    want = run_rrf(q, d, "emb", CFG, concurrency=2, rank_window=15)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want[["query_id", "rank", "doc_id", "score"]].reset_index(drop=True),
    )

    spec_lin = {
        "linear": {
            "retrievers": [
                {"retriever": {"standard": {}}, "weight": 2.0},
                {"retriever": {"knn": {"field": "emb"}}, "weight": 0.5},
            ],
            "rank_window_size": 15,
            "normalizer": "minmax",
        }
    }
    got_l = run_retriever(q, d, spec_lin, CFG, concurrency=2)
    want_l = run_linear(
        q, d, "emb", CFG, concurrency=2, rank_window=15, weights=(2.0, 0.5)
    )
    pd.testing.assert_frame_equal(
        got_l.reset_index(drop=True),
        want_l[["query_id", "rank", "doc_id", "score"]].reset_index(drop=True),
    )

    # nested N-ary tree: rrf over [standard, knn, rrf([standard, knn])]
    nested = {
        "rrf": {
            "retrievers": [
                {"standard": {}},
                {"knn": {"field": "emb"}},
                spec_rrf,
            ],
            "rank_window_size": 10,
            "rank_constant": 10,
        }
    }
    out = run_retriever(q, d, nested, CFG, concurrency=2)
    assert set(out["query_id"]) == {0, 1}
    assert (out.groupby("query_id")["rank"].max() <= 8).all()
    assert (out["score"] > 0).all()

    with pytest.raises(ValueError, match="unknown retriever"):
        run_retriever(q, d, {"mystery": {}}, CFG)
    with pytest.raises(ValueError, match="normalizer"):
        run_retriever(
            q, d,
            {"linear": {"retrievers": [{"retriever": {"standard": {}}}],
                        "normalizer": "zscore"}},
            CFG,
        )
