"""ES search_after cursor pagination: stateless deep paging in
(score desc, doc_id asc) order.  Oracle: contiguous slices of one big
search."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.engine import IndexSearcher, run_queries

CFG = EngineConfig(num_partitions=4)

WORDS = ["red", "green", "blue", "cyan", "teal", "plum", "gold", "jade"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 90
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(2, 8)).tolist())
        for _ in range(n)
    ]
    # a block of identical docs -> identical scores (tie-break coverage)
    texts[40:52] = ["red gold red"] * 12
    df = pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "doc_id": np.arange(1, n + 1, dtype=np.int64),
            "text": texts,
            "lang": "en",
        }
    )
    idx = str(tmp_path_factory.mktemp("saidx"))
    build_index(
        rd.from_pandas(df), idx, CFG,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    return idx


def test_paging_covers_full_ranking(built):
    s = IndexSearcher(built, CFG)
    full = s.search("red gold", k=1000)
    pages, cursor = [], None
    for _ in range(30):
        page = s.search("red gold", k=7, search_after=cursor)
        if page.empty:
            break
        pages.append(page)
        cursor = (float(page["score"].iloc[-1]), int(page["doc_id"].iloc[-1]))
    got = pd.concat(pages, ignore_index=True)
    assert got["doc_id"].tolist() == full["doc_id"].tolist()
    assert got["score"].tolist() == full["score"].tolist()


def test_cursor_mid_tie_is_strictly_after(built):
    s = IndexSearcher(built, CFG)
    full = s.search("red gold", k=1000)
    # pick a cursor inside the identical-score block
    ties = full[full.duplicated("score", keep=False)]
    assert len(ties) >= 3, "fixture must produce score ties"
    row = ties.iloc[1]
    after = s.search(
        "red gold", k=1000,
        search_after=(float(row["score"]), int(row["doc_id"])),
    )
    want = full[full["rank"] > int(row["rank"])]
    assert after["doc_id"].tolist() == want["doc_id"].tolist()
    assert after["rank"].tolist() == list(range(1, len(want) + 1))


def test_distributed_search_after_matches_single(built):
    s = IndexSearcher(built, CFG)
    first = s.search("red gold", k=10)
    cursor = (float(first["score"].iloc[-1]), int(first["doc_id"].iloc[-1]))
    queries = pd.DataFrame(
        {
            "query_id": [0],
            "text": ["red gold"],
            "k": 10,
            "after_score": [cursor[0]],
            "after_doc": [cursor[1]],
        }
    )
    got = (
        run_queries(queries, built, CFG)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want = s.search("red gold", k=10, search_after=cursor)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()
