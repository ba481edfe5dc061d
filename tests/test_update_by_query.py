"""ES _update_by_query analog: matching docs re-ingested with field
overrides via the incremental path; non-matching docs untouched; the
text/ranking unchanged (only mapped fields change)."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.incremental import update_by_query
from kafka_es_ray.query.engine import IndexSearcher

CFG = EngineConfig(
    num_partitions=4, store_text=True, keyword_cols=("tier",), numeric_cols=("stars",)
)


@pytest.fixture()
def built(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(9)
    words = ["mint", "sage", "dill", "basil", "thyme"]
    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(50)],
            "text": [" ".join(rng.choice(words, size=5).tolist()) for _ in range(50)],
            "lang": "en",
            "tier": "bronze",
            "stars": rng.integers(0, 5, size=50).astype(np.float64),
        }
    )
    idx = str(tmp_path / "ubqidx")
    build_index(rd.from_pandas(docs), idx, CFG, html_col=None, ts_col=None)
    return idx, docs


def test_update_by_query_sets_fields(built, ray_session):
    idx, docs = built
    s0 = IndexSearcher(idx, CFG)
    manifest = update_by_query(idx, "mint", {"tier": "gold", "stars": 9.0}, CFG)
    assert manifest["gen"] >= 1
    s = IndexSearcher(idx, CFG)
    hits = s.search("mint", k=100)
    match_keys = set(hits["key"])
    assert match_keys  # fixture guarantees matches
    # every matching doc now sorts with stars=9 and aggregates as gold
    sorted_hits = s.search_sorted("mint", "stars", k=100)
    assert (sorted_hits["sort_val"] == 9.0).all()
    agg = s.agg_terms("mint", field="tier")
    assert dict(zip(agg["value"], agg["n_docs"])) == {"gold": len(match_keys)}
    # non-matching docs keep their original fields
    others = s.search("sage", k=100)
    untouched = [k for k in others["key"] if k not in match_keys]
    if untouched:
        agg2 = s.agg_terms("sage", field="tier")
        assert agg2.set_index("value")["n_docs"].get("bronze", 0) == len(untouched)
    # ranking identical pre/post (text unchanged; stats include the
    # tombstoned old versions, so scores shift only via df/N growth —
    # assert the doc SET is stable instead of exact scores)
    assert set(s.search("mint", k=100)["key"]) == set(s0.search("mint", k=100)["key"])


def test_update_by_query_rejects_unmapped_field(built, ray_session):
    idx, _ = built
    with pytest.raises(ValueError, match="not mapped"):
        update_by_query(idx, "mint", {"nope": 1}, CFG)


def test_export_by_query(built, ray_session, tmp_path):
    import pyarrow.parquet as pq

    from kafka_es_ray.index.incremental import export_by_query

    idx, docs = built
    out = str(tmp_path / "export")
    export_by_query(idx, "mint", out, CFG)
    import glob

    files = glob.glob(f"{out}/*.parquet")
    assert files
    got = pq.read_table(files).to_pandas().sort_values("key").reset_index(drop=True)
    want = docs[docs["text"].str.split().map(lambda t: "mint" in t)]
    assert set(got["key"]) == set(want["url"])
    assert dict(zip(got["key"], got["text"])) == dict(zip(want["url"], want["text"]))


def test_update_by_query_scripted(built, ray_session):
    """Scripted-update subset: ctx._source.stars = expr(old numerics),
    vectorized per segment; validation rejects keyword targets, unmapped
    reads, _score-style names and field collisions."""
    idx, docs = built
    s0 = IndexSearcher(idx, CFG)
    before = s0.search_sorted("mint", "stars", k=100)
    old = dict(zip(before["key"], before["sort_val"]))
    update_by_query(idx, "mint", {}, CFG, set_scripts={"stars": "stars * 2 + 1"})
    s = IndexSearcher(idx, CFG)
    after = s.search_sorted("mint", "stars", k=100)
    assert set(after["key"]) == set(old)
    for k, v in zip(after["key"], after["sort_val"]):
        assert v == old[k] * 2 + 1, k
    with pytest.raises(ValueError, match="not mapped numeric"):
        update_by_query(idx, "mint", {}, CFG, set_scripts={"tier": "1"})
    with pytest.raises(ValueError, match="unmapped numeric"):
        update_by_query(idx, "mint", {}, CFG, set_scripts={"stars": "nope + 1"})
    with pytest.raises(ValueError, match="both"):
        update_by_query(
            idx, "mint", {"stars": 1.0}, CFG, set_scripts={"stars": "stars"}
        )
    with pytest.raises(ValueError):
        update_by_query(
            idx, "mint", {}, CFG, set_scripts={"stars": "__import__('os')"}
        )
