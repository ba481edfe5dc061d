"""Index aliases (ES _aliases analog): atomic registry, swap semantics,
multi-index resolution feeding run_queries."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.aliases import add_alias, list_aliases, remove_alias, resolve
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.engine import run_queries

CFG = EngineConfig(num_partitions=2)


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    import ray.data as rd

    rng = np.random.default_rng(31)
    words = ["iron", "gold", "tin", "lead", "zinc"]
    dirs = []
    for j in range(2):
        docs = pd.DataFrame(
            {
                "url": [f"i{j}-u{i}" for i in range(30)],
                "text": [" ".join(rng.choice(words, size=4).tolist()) for _ in range(30)],
                "lang": "en",
            }
        )
        d = str(tmp_path_factory.mktemp(f"alidx{j}"))
        build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
        dirs.append(d)
    return dirs


def test_alias_crud_and_swap(two_indexes, tmp_path):
    reg = str(tmp_path / "aliases.json")
    d1, d2 = two_indexes
    add_alias(reg, "logs", [d1])
    assert resolve(reg, "logs") == [d1]
    add_alias(reg, "logs", [d2])  # the zero-downtime swap: one atomic write
    assert resolve(reg, "logs") == [d2]
    add_alias(reg, "all-logs", [d1, d2])
    assert set(list_aliases(reg)) == {"logs", "all-logs"}
    remove_alias(reg, "logs")
    assert set(list_aliases(reg)) == {"all-logs"}
    # plain dirs pass through; junk rejected
    assert resolve(reg, d1) == [d1]
    with pytest.raises(ValueError, match="unknown alias"):
        resolve(reg, "nope")
    with pytest.raises(ValueError, match="manifest"):
        add_alias(reg, "bad", [str(tmp_path)])


def test_rollover_flow(two_indexes, tmp_path, ray_session):
    """_rollover: under the threshold nothing happens; over it, a fresh
    empty write index is created and the alias repoints atomically;
    ingestion lands in the new generation and alias reads span both."""
    from kafka_es_ray.index.aliases import rollover
    from kafka_es_ray.index.incremental import apply_incremental
    from kafka_es_ray.index.segment import read_manifest

    reg = str(tmp_path / "aliases.json")
    d1, _ = two_indexes  # 30 docs
    add_alias(reg, "stream", [d1])
    r = rollover(reg, "stream", str(tmp_path / "gen1"), max_docs=1000, cfg=CFG)
    assert not r["rolled"] and resolve(reg, "stream") == [d1]
    r2 = rollover(reg, "stream", str(tmp_path / "gen1"), max_docs=10, cfg=CFG)
    assert r2["rolled"] and r2["n_docs"] == 30
    targets = resolve(reg, "stream")
    assert targets == [d1, str(tmp_path / "gen1")]
    assert read_manifest(targets[-1])["n_docs"] == 0
    # ingest into the new write generation; alias reads span both
    delta = pd.DataFrame(
        {"id": ["fresh-1", "fresh-2"], "text": ["iron fresh doc", "gold fresh doc"],
         "lang": ["en", "en"], "op": ["index", "index"]}
    )
    apply_incremental(targets[-1], delta, CFG, key_col="id")
    q = pd.DataFrame({"query_id": [0], "text": ["fresh"], "k": [10]})
    hits = run_queries(q, resolve(reg, "stream")).to_pandas()
    assert set(hits["key"]) == {"fresh-1", "fresh-2"}
    assert set(hits["index_id"]) == {1}
    old = run_queries(pd.DataFrame({"query_id": [0], "text": ["iron"], "k": [50]}),
                      resolve(reg, "stream")).to_pandas()
    assert 0 in set(old["index_id"])  # old generation still served


def test_alias_multi_index_query(two_indexes, tmp_path, ray_session):
    reg = str(tmp_path / "aliases.json")
    d1, d2 = two_indexes
    add_alias(reg, "all-logs", [d1, d2])
    q = pd.DataFrame({"query_id": [0], "text": ["iron gold"], "k": [10]})
    via_alias = run_queries(q, resolve(reg, "all-logs")).to_pandas()
    direct = run_queries(q, [d1, d2]).to_pandas()
    pd.testing.assert_frame_equal(via_alias, direct)
    assert {0, 1} == set(via_alias["index_id"])  # hits from both indexes


def test_rollover_age_and_size_conditions(two_indexes, tmp_path, ray_session):
    """max_age_s reads the manifest created_at; max_size_bytes walks the
    index dir; ANY condition triggers; no condition at all is refused."""
    import json
    import os

    from kafka_es_ray.index.aliases import rollover

    reg = str(tmp_path / "aliases2.json")
    _, d2 = two_indexes
    add_alias(reg, "aged", [d2])
    with pytest.raises(ValueError, match="need max_docs"):
        rollover(reg, "aged", str(tmp_path / "g1"), cfg=CFG)
    # young + small: nothing rolls
    r = rollover(
        reg, "aged", str(tmp_path / "g1"),
        max_age_s=3600.0, max_size_bytes=1 << 40, cfg=CFG,
    )
    assert not r["rolled"] and r["age_s"] < 3600 and r["size_bytes"] > 0
    # age the index by editing created_at back two hours
    mp = os.path.join(d2, "manifest.json")
    m = json.load(open(mp))
    m["created_at"] -= 7200
    json.dump(m, open(mp, "w"))
    r2 = rollover(reg, "aged", str(tmp_path / "g1"), max_age_s=3600.0, cfg=CFG)
    assert r2["rolled"] and resolve(reg, "aged")[-1] == str(tmp_path / "g1")
    # size condition alone triggers on a tiny threshold
    add_alias(reg, "fat", [d2])
    r3 = rollover(reg, "fat", str(tmp_path / "g2"), max_size_bytes=1, cfg=CFG)
    assert r3["rolled"] and r3["size_bytes"] >= 1


def test_index_templates(two_indexes, tmp_path, ray_session):
    """_index_template analog: glob match, priority tie-break, settings
    become the new rollover generation's EngineConfig; unknown settings
    refused; '_' alias names reserved."""
    from kafka_es_ray.index.aliases import (
        delete_template,
        list_templates,
        match_template,
        put_template,
        rollover,
        template_config,
    )
    from kafka_es_ray.index.segment import read_manifest

    reg = str(tmp_path / "reg.json")
    put_template(reg, "logs", "logs-*", {"num_partitions": 3, "store_text": True})
    put_template(reg, "logs-hot", "logs-hot-*",
                 {"num_partitions": 5, "keyword_cols": ["site"]}, priority=10)
    assert set(list_templates(reg)) == {"logs", "logs-hot"}
    assert match_template(reg, "metrics-1") is None
    assert match_template(reg, "logs-1")["settings"]["num_partitions"] == 3
    # higher priority wins where both patterns match
    assert match_template(reg, "logs-hot-7")["settings"]["num_partitions"] == 5
    cfg = template_config(reg, "logs-hot-7")
    assert cfg.num_partitions == 5 and cfg.keyword_cols == ("site",)
    with pytest.raises(ValueError, match="unknown template settings"):
        put_template(reg, "bad", "x-*", {"nope": 1})
    with pytest.raises(ValueError, match="may not start with '_'"):
        add_alias(reg, "_templates", [two_indexes[0]])
    # rollover picks the template for the new generation's name
    d1, _ = two_indexes
    add_alias(reg, "stream2", [d1])
    r = rollover(reg, "stream2", str(tmp_path / "logs-hot-001"), max_docs=1)
    assert r["rolled"]
    m = read_manifest(str(tmp_path / "logs-hot-001"))
    assert m["num_partitions"] == 5
    assert m["mappings"]["keyword_cols"] == ["site"]
    # aliases listing keeps hiding the template section
    assert "_templates" not in list_aliases(reg)


def test_filtered_alias(ray_session, tmp_path):
    """ES filtered alias: searches through it implicitly apply the
    stored lang term filter — resolve_full round-trip, CLI query path,
    rollover preserves the filter, legacy list form coexists."""
    import ray.data as rd

    from kafka_es_ray.index.aliases import resolve_full, rollover
    from kafka_es_ray.query.engine import IndexSearcher

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(40)],
            "text": ["silver copper"] * 40,
            "lang": ["en"] * 25 + ["de"] * 15,
        }
    )
    d = str(tmp_path / "fidx")
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    reg = str(tmp_path / "aliases.json")
    add_alias(reg, "plain", [d])
    add_alias(reg, "german", [d], filter_lang="de")

    assert resolve_full(reg, "plain") == ([d], None)
    assert resolve_full(reg, "german") == ([d], "de")
    assert resolve(reg, "german") == [d]  # legacy accessor still works
    assert list_aliases(reg)["german"]["filter_lang"] == "de"

    # search semantics: the filter is the alias's contract
    s = IndexSearcher(d, CFG)
    dirs, fl = resolve_full(reg, "german")
    hits = s.search("silver", k=100, filter_lang=fl)
    assert len(hits) == 15

    # distributed path: filter_lang query column
    q = pd.DataFrame(
        {"query_id": [0], "text": ["silver"], "k": [100], "filter_lang": [fl]}
    )
    out = run_queries(q, dirs).to_pandas()
    assert len(out) == 15

    # rollover keeps the filter on the repointed alias
    new_dir = str(tmp_path / "fidx-g2")
    r = rollover(reg, "german", new_dir, max_docs=1, cfg=CFG)
    assert r["rolled"]
    dirs2, fl2 = resolve_full(reg, "german")
    assert fl2 == "de" and dirs2 == [d, new_dir]


def test_filtered_alias_conflicting_cli_filter_refused(ray_session, tmp_path, capsys):
    """Round-4 advice: ES ANDs the alias filter with query filters, so
    an explicit --filter-lang that differs from the alias's lang is the
    empty intersection — refused loudly instead of letting the flag
    silently bypass the alias filter.  An equal value is accepted."""
    import ray.data as rd

    from kafka_es_ray.cli import main

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(20)],
            "text": ["silver copper"] * 20,
            "lang": ["en"] * 12 + ["de"] * 8,
        }
    )
    d = str(tmp_path / "cidx")
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    reg = str(tmp_path / "aliases.json")
    add_alias(reg, "german", [d], filter_lang="de")

    with pytest.raises(SystemExit, match="contradicts alias filter"):
        main(
            ["query", "--index", "german", "--registry", reg,
             "--text", "silver", "--filter-lang", "en"]
        )
    # equal value collapses to one filter and works
    assert main(
        ["query", "--index", "german", "--registry", reg,
         "--text", "silver", "--filter-lang", "de", "-k", "100"]
    ) == 0
    out = capsys.readouterr().out
    assert out.count("u1") >= 1


def test_ilm_tick_lifecycle(ray_session, tmp_path):
    """ilm_tick composes the lifecycle: rollover when the write index is
    full, warm generations auto-merged, oldest generations dropped past
    retention with the alias repointed BEFORE deletion."""
    import os

    import ray.data as rd

    from kafka_es_ray.index.aliases import ilm_tick, resolve_full
    from kafka_es_ray.index.segment import read_manifest

    cfg = EngineConfig(num_partitions=4)
    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(40)],
            "text": ["cobalt nickel"] * 40,
            "lang": "en",
        }
    )
    d0 = str(tmp_path / "gen0")
    build_index(rd.from_pandas(docs), d0, cfg, html_col=None, ts_col=None)
    reg = str(tmp_path / "reg.json")
    add_alias(reg, "stream", [d0], filter_lang="en")
    gen_dir = lambda g: str(tmp_path / f"gen{g}")  # noqa: E731

    # tick 1: write index over max_docs -> rollover to gen1
    out = ilm_tick(reg, "stream", gen_dir, max_docs=10, cfg=cfg)
    assert out["rolled"] and out["deleted"] == []
    targets, fl = resolve_full(reg, "stream")
    assert fl == "en" and len(targets) == 2

    # tick 2: gen0 (now warm, 4 segments) merges to 1; nothing rolls
    # (gen1 is empty) and nothing is deleted at retention 2
    out2 = ilm_tick(
        reg, "stream", gen_dir, max_docs=10,
        merge_max_segments=1, retention_generations=2, cfg=cfg,
    )
    assert not out2["rolled"]
    assert out2["merged"].get(targets[0]) == 4
    assert len(read_manifest(targets[0])["parts"]) == 1
    assert out2["deleted"] == []

    # force two more generations, then retention 2 drops the oldest
    for g in (2, 3):
        build_index(
            rd.from_pandas(docs.assign(url=docs["url"] + f"-g{g}")),
            gen_dir(g), cfg, html_col=None, ts_col=None,
        )
    add_alias(reg, "stream", [*resolve_full(reg, "stream")[0], gen_dir(2), gen_dir(3)],
              filter_lang="en")
    out3 = ilm_tick(reg, "stream", gen_dir, retention_generations=2, cfg=cfg)
    assert out3["deleted"] == [os.path.abspath(d0), os.path.abspath(gen_dir(1))]
    targets3, fl3 = resolve_full(reg, "stream")
    assert fl3 == "en"
    assert targets3 == [os.path.abspath(gen_dir(2)), os.path.abspath(gen_dir(3))]
    assert not os.path.exists(d0)
