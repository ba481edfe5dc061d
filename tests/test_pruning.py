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
