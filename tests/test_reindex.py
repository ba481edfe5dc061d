"""ES _reindex analog: rebuild from stored _source under a new config —
live docs only, fresh doc ids, same ranking; new settings (positions,
partition count) take effect."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.reindex import reindex
from kafka_es_ray.query.engine import IndexSearcher

SRC_CFG = EngineConfig(num_partitions=4, store_text=True, keyword_cols=("src",))


@pytest.fixture(scope="module")
def src_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from kafka_es_ray.index.incremental import apply_incremental

    rng = np.random.default_rng(17)
    words = ["ruby", "topaz", "opal", "quartz", "agate", "jade"]
    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(80)],
            "text": [" ".join(rng.choice(words, size=6).tolist()) for _ in range(80)],
            "lang": "en",
            "src": rng.choice(["a", "b"], size=80),
        }
    )
    idx = str(tmp_path_factory.mktemp("reidx_src"))
    build_index(rd.from_pandas(docs), idx, SRC_CFG, html_col=None, ts_col=None)
    # delete 10 docs so the reindex must drop tombstoned rows
    delta = pd.DataFrame(
        {"id": [f"u{i}" for i in range(10)], "text": [None] * 10,
         "lang": ["en"] * 10, "op": ["delete"] * 10}
    )
    apply_incremental(idx, delta, SRC_CFG, key_col="id")
    return idx, docs


def test_reindex_preserves_ranking_drops_deleted(src_index, ray_session, tmp_path):
    import ray.data as rd

    idx, docs = src_index
    dest = str(tmp_path / "dest")
    cfg2 = EngineConfig(
        num_partitions=7, store_text=True, index_positions=True, keyword_cols=("src",)
    )
    manifest = reindex(idx, dest, cfg2)
    assert manifest["n_docs"] == 70  # live docs only
    # ground truth: a FRESH index over exactly the live docs — reindex
    # purges tombstones, so its stats (df/N/avgdl) are the live corpus's,
    # not the source's deleted-inclusive ones (ES post-merge semantics)
    ref = str(tmp_path / "ref")
    build_index(
        rd.from_pandas(docs[~docs["url"].isin({f"u{i}" for i in range(10)})]),
        ref, cfg2, html_col=None, ts_col=None,
    )
    s_ref = IndexSearcher(ref, cfg2)
    s_new = IndexSearcher(dest, cfg2)
    for q in ("ruby topaz", "jade", "quartz agate opal"):
        a = s_ref.search(q, k=100)
        b = s_new.search(q, k=100)
        # doc ids are fresh, but (key, score) ranking is identical
        assert list(zip(a["key"], a["score"])) == list(zip(b["key"], b["score"])), q
    assert not set(f"u{i}" for i in range(10)) & set(s_new.search("ruby", k=100)["key"])
    # the NEW config's features work: positions -> phrase queries
    hits = s_new.search_phrase("ruby topaz", k=5)
    assert {"rank", "doc_id", "key", "score"} <= set(hits.columns)
    # keyword mapping carried over: terms agg on src
    agg = s_new.agg_terms("ruby", field="src")
    assert set(agg["value"]) <= {"a", "b"} and agg["n_docs"].sum() > 0


def test_filtered_reindex_keeps_only_matches(src_index, ray_session, tmp_path):
    """reindex(query=...) == the ES source.query corpus-curation path:
    only live docs matching the query land in the destination."""
    import ray.data as rd

    idx, docs = src_index
    dest = str(tmp_path / "filtered")
    cfg2 = EngineConfig(num_partitions=3, store_text=True)
    manifest = reindex(idx, dest, cfg2, query="ruby")
    deleted = {f"u{i}" for i in range(10)}
    want_keys = {
        u for u, t in zip(docs["url"], docs["text"])
        if u not in deleted and "ruby" in t.split()
    }
    assert manifest["n_docs"] == len(want_keys)
    s = IndexSearcher(dest, cfg2)
    got_keys = set(s.search("ruby", k=1000)["key"])
    assert got_keys == want_keys
    # docs that matched only other terms are gone
    assert all(k in want_keys for k in s.search("jade", k=1000)["key"])


def test_reindex_requires_stored_source(ray_session, tmp_path):
    import ray.data as rd

    docs = pd.DataFrame({"url": ["u0"], "text": ["hello"], "lang": ["en"]})
    idx = str(tmp_path / "nosrc")
    build_index(rd.from_pandas(docs), idx, EngineConfig(num_partitions=1),
                html_col=None, ts_col=None)
    with pytest.raises(ValueError, match="store_text"):
        reindex(idx, str(tmp_path / "dest2"))


def test_reindex_with_script(ray_session, tmp_path):
    """ES _reindex with script: numeric fields recomputed from the OLD
    source values inside the streaming rebuild; unknown targets/reads
    and non-whitelisted exprs are refused at call time."""
    import ray.data as rd

    cfg = EngineConfig(
        num_partitions=2, store_text=True, numeric_cols=("stars", "views")
    )
    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(30)],
            "text": ["opal jade"] * 30,
            "lang": "en",
            "stars": np.arange(30, dtype=np.float64),
            "views": np.full(30, 10.0),
        }
    )
    src = str(tmp_path / "src")
    build_index(rd.from_pandas(docs), src, cfg, html_col=None, ts_col=None)
    dest = str(tmp_path / "dest")
    reindex(
        src, dest, cfg,
        set_scripts={"stars": "stars * views + 1", "views": "sqrt(views)"},
    )
    s = IndexSearcher(dest, cfg)
    out = s.search_sorted("opal", "stars", k=100)
    want = {f"u{i}": i * 10.0 + 1 for i in range(30)}
    assert dict(zip(out["key"], out["sort_val"])) == want
    out2 = s.search_sorted("opal", "views", k=100)
    assert (out2["sort_val"].to_numpy() == np.sqrt(10.0)).all()
    with pytest.raises(ValueError, match="not numeric"):
        reindex(src, str(tmp_path / "d2"), cfg, set_scripts={"nope": "1"})
    with pytest.raises(ValueError, match="not numeric"):
        reindex(src, str(tmp_path / "d3"), cfg, set_scripts={"stars": "zz + 1"})
    with pytest.raises(ValueError):
        reindex(src, str(tmp_path / "d4"), cfg, set_scripts={"stars": "open('x')"})
