"""ES multi-index search (GET /idx1,idx2/_search): global stats summed
across indexes.  Oracle: a single combined index over the union corpus —
scores and ranking must be identical (df/N/avgdl sums are the same)."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.engine import run_queries

CFG = EngineConfig(num_partitions=4)

WORDS = ["ruby", "opal", "onyx", "jade", "pearl", "amber", "topaz"]


def _corpus(n=80, seed=5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(2, 8)).tolist())
        for _ in range(n)
    ]
    return pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "doc_id": np.arange(1, n + 1, dtype=np.int64),
            "text": texts,
            "lang": "en",
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    df = _corpus()
    base = tmp_path_factory.mktemp("midx")
    dirs = {}
    for name, part in [
        ("even", df[df["doc_id"] % 2 == 0]),
        ("odd", df[df["doc_id"] % 2 == 1]),
        ("all", df),
    ]:
        d = str(base / name)
        build_index(
            rd.from_pandas(part.reset_index(drop=True)), d, CFG,
            key_col="url", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        dirs[name] = d
    return dirs


def test_multi_index_equals_combined_index(built):
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["ruby opal", "jade", "pearl amber onyx"],
            "k": 15,
        }
    )
    combined = (
        run_queries(queries, built["all"], CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    multi = (
        run_queries(queries, [built["even"], built["odd"]], CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert "index_id" in multi.columns
    pd.testing.assert_frame_equal(
        multi[["query_id", "rank", "doc_id", "score"]],
        combined[["query_id", "rank", "doc_id", "score"]],
    )
    # index_id is consistent with the split (even docs -> index 0)
    assert (
        (multi["doc_id"] % 2 == 0) == (multi["index_id"] == 0)
    ).all()


def test_doc_id_collision_tiebreaks_by_index(built, ray_session, tmp_path_factory):
    import ray.data as rd

    base = tmp_path_factory.mktemp("collide")
    dirs = []
    for i in range(2):
        one = pd.DataFrame(
            {
                "url": [f"dup{i}"],
                "doc_id": np.array([7], dtype=np.int64),
                "text": ["ruby ruby opal"],
                "lang": ["en"],
            }
        )
        d = str(base / f"i{i}")
        build_index(
            rd.from_pandas(one), d, CFG,
            key_col="url", lang_col="lang", html_col=None, ts_col=None,
            id_col="doc_id",
        )
        dirs.append(d)
    queries = pd.DataFrame({"query_id": [0], "text": ["ruby"], "k": 5})
    out = (
        run_queries(queries, dirs, CFG)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [7, 7]
    assert out["score"].iloc[0] == out["score"].iloc[1]
    assert out["index_id"].tolist() == [0, 1]  # tie-break index_id asc


MF_CFG = EngineConfig(num_partitions=4, text_fields=("title", "body"))


def _mf_corpus(n=80, seed=9) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = _corpus(n, seed)
    return df.rename(columns={"text": "body"}).assign(
        title=[" ".join(rng.choice(WORDS, size=2).tolist()) for _ in range(n)]
    )


def test_multifield_multi_index_equals_combined(ray_session, tmp_path_factory):
    """Round-4: multi-index search over MULTI-FIELD (text_fields) indexes —
    the per-field avgdl merged from each manifest (Σ avgdl_i*n_i / Σ n_i)
    must make a 2-index search score-identical to the combined index, for
    multi_match, dis_max and field-scoped match queries."""
    import ray.data as rd

    df = _mf_corpus()
    base = tmp_path_factory.mktemp("mfmidx")
    dirs = {}
    for name, part in [
        ("even", df[df["doc_id"] % 2 == 0]),
        ("odd", df[df["doc_id"] % 2 == 1]),
        ("all", df),
    ]:
        d = str(base / name)
        build_index(
            rd.from_pandas(part.reset_index(drop=True)), d, MF_CFG,
            key_col="url", text_col="body", lang_col="lang", html_col=None,
            ts_col=None, id_col="doc_id",
        )
        dirs[name] = d
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "text": ["ruby opal", "jade pearl", "onyx", "amber topaz"],
            "type": ["multi_match", "dis_max", "match", "multi_match"],
            "fields": ["title,body", "title^2,body", None, "body"],
            "field": [None, None, "title", None],
            "tie_breaker": [None, 0.3, None, None],
            "k": np.int32(20),
        }
    )
    combined = (
        run_queries(queries, dirs["all"], MF_CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    multi = (
        run_queries(queries, [dirs["even"], dirs["odd"]], MF_CFG)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(combined) > 0
    pd.testing.assert_frame_equal(
        multi[["query_id", "rank", "doc_id", "score"]],
        combined[["query_id", "rank", "doc_id", "score"]],
    )
