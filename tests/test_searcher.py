"""Resident query service (query/searcher.py): a held scorer pool +
cached global stats reused across batches must be ROW-IDENTICAL to the
per-batch run_queries path (determinism contract), invalidate on any
manifest commit, and serve multi-index sessions.  Reference analog: the
once-per-task transport (ElasticsearchSinkTask.kt:179-200)."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.incremental import apply_incremental
from kafka_es_ray.query.engine import run_queries
from kafka_es_ray.query.searcher import SearcherSession

CFG = EngineConfig(
    num_partitions=4,
    index_positions=True,
    store_text=True,
    numeric_cols=("stars",),
)

WORDS = ["ruby", "opal", "onyx", "jade", "pearl", "amber", "topaz", "agate"]


def _corpus(n=120, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(2, 8)).tolist())
        for _ in range(n)
    ]
    return pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "text": texts,
            "lang": "en",
            "stars": rng.integers(0, 6, size=n).astype(np.int64),
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    idx = str(tmp_path_factory.mktemp("resident") / "idx")
    build_index(
        rd.from_pandas(_corpus()), idx, CFG,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
    )
    return idx


def _mixed_batch() -> pd.DataFrame:
    rows = [
        dict(query_id=0, text="ruby opal", k=10),
        dict(query_id=1, text="jade", k=5),
        dict(query_id=2, text="pearl amber onyx", k=15),
        dict(query_id=3, text="ruby opal", k=10),  # dedup-plan twin of 0
        dict(query_id=4, text="opal jade", k=8, type="phrase"),
        dict(query_id=5, text="topaz", k=10, type="bool", must="topaz",
             should="ruby", msm=0),
        dict(query_id=6, text="agate", k=10, range_field="stars",
             range_gte=2, range_lte=4),
    ]
    df = pd.DataFrame(rows)
    df["lang"] = "en"
    return df


def _frames_equal(a, b):
    a = a.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_parity_and_warm_repeat(built):
    qs = _mixed_batch()
    base = run_queries(qs, built, CFG)
    with SearcherSession(built, CFG, pool=3) as sess:
        _frames_equal(base, sess.search(qs))
        # second batch: pool + df cache warm, identical rows
        _frames_equal(base, sess.search(qs))
        assert sess.stats["batches"] == 2
        assert sess.stats["df_cache_hits"] > 0
        # fetch + highlight through the session
        qf = pd.DataFrame(
            {"query_id": [0], "text": ["ruby opal"], "lang": ["en"], "k": [5]}
        )
        _frames_equal(
            run_queries(qf, built, CFG, fetch=True, highlight=True),
            sess.search(qf, fetch=True, highlight=True),
        )


def test_session_wrong_index_refused(built, tmp_path_factory):
    with SearcherSession(built, CFG, pool=2) as sess:
        with pytest.raises(ValueError, match="different index"):
            run_queries(
                _mixed_batch(), [built, built], CFG, session=sess
            )


def test_empty_plan_through_session(built):
    with SearcherSession(built, CFG, pool=2) as sess:
        r = sess.search(
            pd.DataFrame(
                {"query_id": [0], "text": ["zzznope"], "lang": ["en"], "k": [5]}
            )
        )
        assert r.count() == 0


def test_manifest_invalidation_sees_commits(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "inval")
    build_index(
        rd.from_pandas(_corpus(60)), idx, CFG,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
    )
    q = pd.DataFrame(
        {"query_id": [0], "text": ["zircon"], "lang": ["en"], "k": [10]}
    )
    sess = SearcherSession(idx, CFG, pool=2)
    try:
        assert sess.search(q).count() == 0
        delta = pd.DataFrame(
            {
                "url": ["new1", "new2"],
                "text": ["zircon gleams", "zircon and ruby"],
                "lang": ["en", "en"],
                "seq": np.array([1, 2], dtype=np.int64),
            }
        )
        apply_incremental(idx, rd.from_pandas(delta), CFG, key_col="url")
        got = sess.search(q).to_pandas()
        assert sess.stats["invalidations"] == 1
        assert sorted(got["key"]) == ["new1", "new2"]
        _frames_equal(run_queries(q, idx, CFG), sess.search(q))
    finally:
        sess.close()


def test_multi_index_session_parity(ray_session, tmp_path):
    import ray.data as rd

    df = _corpus(80, seed=3)
    dirs = []
    for name, part in [("a", df.iloc[::2]), ("b", df.iloc[1::2])]:
        d = str(tmp_path / name)
        build_index(
            rd.from_pandas(part.reset_index(drop=True)), d, CFG,
            key_col="url", lang_col="lang", html_col=None, ts_col=None,
        )
        dirs.append(d)
    qs = _mixed_batch()
    base = run_queries(qs, dirs, CFG)
    with SearcherSession(dirs, CFG, pool=2) as sess:
        _frames_equal(base, sess.search(qs))
        _frames_equal(base, sess.search(qs))


def test_warm_preloads_all_segments(built):
    with SearcherSession(built, CFG, pool=2) as sess:
        n = sess.warm()
        assert n == 4  # one segment per build partition
        _frames_equal(
            run_queries(_mixed_batch(), built, CFG),
            sess.search(_mixed_batch()),
        )


def test_request_cache_keys_on_cfg(built):
    """ADVICE r4 (medium): two calls differing only in cfg must MISS
    each other (cfg carries scoring semantics), and a repeat with the
    SAME cfg must hit."""
    from kafka_es_ray.query.engine import (
        REQUEST_CACHE_STATS,
        run_queries_cached,
    )

    q = pd.DataFrame(
        {"query_id": [0], "text": ["ruby opal"], "lang": ["en"], "k": [5]}
    )
    cfg2 = EngineConfig(
        num_partitions=4, index_positions=True, store_text=True,
        numeric_cols=("stars",), k1=0.4,
    )
    m0, h0 = REQUEST_CACHE_STATS["misses"], REQUEST_CACHE_STATS["hits"]
    run_queries_cached(q, built, CFG)
    run_queries_cached(q, built, cfg2)  # differs only in cfg -> miss
    run_queries_cached(q, built, CFG)  # same cfg -> hit
    assert REQUEST_CACHE_STATS["misses"] == m0 + 2
    assert REQUEST_CACHE_STATS["hits"] == h0 + 1


def test_resident_matchset_family_parity(built):
    """_count / terms agg / random_sampler through the resident session
    are row-identical to the per-batch path, warm batches included; the
    MatchSet stage shares the scorer pool's segment LRU."""
    from kafka_es_ray.query.engine import (
        run_agg_random_sampler,
        run_agg_terms,
        run_counts,
    )

    q = pd.DataFrame(
        {
            "query_id": np.arange(3, dtype=np.int64),
            "text": ["ruby", "opal jade", "zzznope"],
        }
    )
    base_c = run_counts(q, built, CFG, terminate_after=7)
    base_a = run_agg_terms(q, built, "lang", CFG)
    base_s = run_agg_random_sampler(
        q, built, "lang", probability=0.5, seed=9, cfg=CFG
    )
    with SearcherSession(built, CFG, pool=2) as sess:
        for _ in range(2):  # second pass serves from warm actors
            pd.testing.assert_frame_equal(
                base_c.reset_index(drop=True),
                sess.count(q, terminate_after=7).reset_index(drop=True),
            )
            pd.testing.assert_frame_equal(
                base_a.reset_index(drop=True),
                sess.agg_terms(q, "lang").reset_index(drop=True),
            )
            pd.testing.assert_frame_equal(
                base_s.reset_index(drop=True),
                run_agg_random_sampler(
                    q, built, "lang", probability=0.5, seed=9, cfg=CFG,
                    session=sess,
                ).reset_index(drop=True),
            )
        # mixed use on one session: scoring + counting share segments
        _frames_equal(
            run_queries(_mixed_batch(), built, CFG),
            sess.search(_mixed_batch()),
        )


def test_resident_count_sees_commits(ray_session, tmp_path):
    import ray.data as rd

    from kafka_es_ray.query.engine import run_counts

    idx = str(tmp_path / "cinval")
    build_index(
        rd.from_pandas(_corpus(50)), idx, CFG,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
    )
    q = pd.DataFrame({"query_id": [0], "text": ["zircon"]})
    with SearcherSession(idx, CFG, pool=2) as sess:
        assert sess.count(q)["n_matching"].tolist() == [0]
        delta = pd.DataFrame(
            {
                "url": ["n1", "n2", "n3"],
                "text": ["zircon a", "zircon b", "zircon c"],
                "lang": "en",
                "seq": np.arange(3, dtype=np.int64),
            }
        )
        apply_incremental(idx, rd.from_pandas(delta), CFG, key_col="url")
        assert sess.count(q)["n_matching"].tolist() == [3]
        pd.testing.assert_frame_equal(
            run_counts(q, idx, CFG).reset_index(drop=True),
            sess.count(q).reset_index(drop=True),
        )
