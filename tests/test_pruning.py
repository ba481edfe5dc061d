"""Block-max MaxScore pruning must be EXACT: pruned results identical to
the exhaustive path and the brute-force oracle (SURVEY §7.4: 'WAND pruning
must be provably score-safe ... so ranks match the exhaustive oracle')."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.fixtures import make_queries
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.engine import IndexSearcher

CFG = EngineConfig(num_partitions=4)


@pytest.fixture(scope="module")
def idx(ray_session, pages_small, tmp_path_factory):
    import ray.data as rd

    d = str(tmp_path_factory.mktemp("pidx"))
    build_index(rd.from_arrow(pages_small), d, CFG)
    return d


def test_pruned_identical_to_exhaustive(idx):
    s = IndexSearcher(idx, CFG)
    qs = make_queries(24).to_pandas()
    # mix in adversarial queries: one rare + one ubiquitous template term
    extra = pd.DataFrame(
        {
            "query_id": [100, 101, 102],
            "text": ["w09871 home", "w00001 about 2025", "home about example"],
            "lang": ["en"] * 3,
            "k": np.int32([10, 10, 100]),
        }
    )
    qs = pd.concat([qs, extra], ignore_index=True)
    a = s.search_batch(qs, prune=True)
    b = s.search_batch(qs, prune=False)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_term_ub_dominates_true_scores(idx):
    """The stored block-max bound must dominate every true tf-part."""
    from kafka_es_ray.query.bm25 import bm25_tf_part

    s = IndexSearcher(idx, CFG)
    seg = s.segments[0]
    for ti in range(0, seg.terms.size, max(1, seg.terms.size // 23)):
        ids, tfs, dl = seg.postings_with_dl(ti)
        ub = seg.term_score_ub(ti, s.avgdl, s.k1, s.b)
        true = bm25_tf_part(tfs, dl, s.avgdl, s.k1, s.b)
        assert (true <= ub + 1e-12).all()


def test_block_meta_shapes(idx):
    s = IndexSearcher(idx, CFG)
    seg = s.segments[0]
    B = CFG.block_size
    for ti in range(0, seg.terms.size, max(1, seg.terms.size // 17)):
        btf, bdl, blast = seg.block_meta(ti)
        n = int(seg.df[ti])
        nb = (n + B - 1) // B
        assert btf.size == bdl.size == blast.size == nb
        ids, tfs, _ = seg.postings_with_dl(ti)
        assert blast[-1] == ids[-1]  # skip pointer ends at last doc
        assert btf.max() == tfs.max()


def test_selective_block_decode_exact_and_skips(ray_session, tmp_path):
    """Skip-pointer path (format v2 block byte offsets): probing a huge
    head-term posting list for a few candidates must decode only the
    touched blocks — and produce exactly the same hits as a full decode."""
    import ray.data as rd

    from kafka_es_ray.index.segment import Segment

    n = 4000
    # every doc has head term; doc i also has a rare marker every 512 docs
    texts = ["headterm " + (f"rare{i//512} " if i % 512 == 0 else "") + f"w{i}" for i in range(n)]
    docs = pd.DataFrame(
        {
            "url": [f"https://e.x/{i:06d}" for i in range(n)],
            "text": texts,
            "lang": ["en"] * n,
        }
    )
    cfg = EngineConfig(num_partitions=1, block_size=128)
    d = str(tmp_path / "skew")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    seg = Segment.load(d, 0)
    ti = seg.lookup("headterm")
    assert ti >= 0 and int(seg.df[ti]) == n

    # candidates: 5 scattered docs
    cand = seg.doc_ids_store[np.array([0, 777, 1500, 2222, 3999])]
    before = seg.decoded_postings
    hit, tfs, dl = seg.lookup_postings(ti, np.sort(cand))
    decoded_selective = seg.decoded_postings - before
    assert hit.all() and tfs.size == 5
    # must have decoded far fewer than the full n-posting list
    assert decoded_selective <= 5 * 128
    assert decoded_selective < n // 4

    # exactness vs full decode on a fresh segment object
    seg2 = Segment.load(d, 0)
    ids_full, tfs_full, dl_full = seg2.postings_with_dl(ti)
    pos = np.searchsorted(ids_full, np.sort(cand))
    assert (ids_full[pos] == np.sort(cand)).all()
    assert (tfs_full[pos] == tfs).all()
    assert (dl_full[pos] == dl).all()


def test_shard_scorer_running_theta_rank_identical(ray_session, pages_small, tmp_path):
    """The distributed path's per-actor running MaxScore threshold must
    not change results vs the single-searcher exhaustive path."""
    import ray.data as rd

    from kafka_es_ray.query.engine import run_queries

    d = str(tmp_path / "rtheta")
    build_index(rd.from_arrow(pages_small), d, CFG)
    s = IndexSearcher(d, CFG)
    qs = make_queries(16).to_pandas()
    want = s.search_batch(qs, prune=False)
    got = (
        run_queries(rd.from_pandas(qs), d, CFG, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id", "score"]],
        want[["query_id", "rank", "doc_id", "score"]],
    )
