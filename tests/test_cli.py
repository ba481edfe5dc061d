"""Runner CLI (python -m kafka_es_ray) driven in-process: build, count,
query (match/phrase/highlight), delete-by-query, merge, apply.  The CLI
must never shut down a Ray session it did not start (the pytest session
fixture owns it here)."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_es_ray.cli import main


@pytest.fixture()
def corpus_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    t = pa.table(
        {
            "url": [f"u{i}" for i in range(60)],
            "text": [
                ("quick brown fox " if i % 5 == 0 else "plain filler words ") + f"w{i}"
                for i in range(60)
            ],
            "lang": ["en"] * 60,
        }
    )
    pq.write_table(t, str(d / "d.parquet"))
    return str(d)


def test_cli_end_to_end(ray_session, corpus_dir, tmp_path, capsys):
    import ray

    idx = str(tmp_path / "idx")
    assert main(
        ["build", "--input", corpus_dir, "--index", idx, "--num-partitions", "4",
         "--store-text", "--index-positions"]
    ) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_docs"] == 60
    assert ray.is_initialized()  # CLI must NOT kill the fixture's session

    assert main(["count", "--index", idx, "--text", "quick"]) == 0
    assert capsys.readouterr().out.strip() == "12"

    assert main(["query", "--index", idx, "--text", "quick brown fox", "--phrase", "-k", "3"]) == 0
    out = capsys.readouterr().out
    assert "rank" in out and "u5" in out  # deterministic top hit

    assert main(["query", "--index", idx, "--text", "quick", "--highlight", "-k", "1"]) == 0
    assert "<em>quick</em>" in capsys.readouterr().out

    # dictionary-expansion counts (prefix / wildcard / fuzzy)
    assert main(["count", "--index", idx, "--prefix", "qui"]) == 0
    assert capsys.readouterr().out.strip() == "12"
    assert main(["count", "--index", idx, "--wildcard", "q*ck"]) == 0
    assert capsys.readouterr().out.strip() == "12"
    assert main(["count", "--index", idx, "--fuzzy", "quicj"]) == 0
    assert capsys.readouterr().out.strip() == "12"

    # search_after paging: page 2 of k=1 equals rank-2 of k=2
    assert main(["query", "--index", idx, "--text", "quick", "-k", "2"]) == 0
    lines = [l.split() for l in capsys.readouterr().out.strip().splitlines()[1:]]
    (r1, r2) = lines
    assert main(
        ["query", "--index", idx, "--text", "quick", "-k", "1",
         "--search-after", f"{r1[3]}:{r1[1]}"]
    ) == 0
    page2 = capsys.readouterr().out.strip().splitlines()[1].split()
    assert page2[1] == r2[1]  # same doc_id as rank 2

    # apply a delta (upsert one doc), then delete-by-query + merge
    delta = tmp_path / "delta"
    delta.mkdir()
    pq.write_table(
        pa.table({"id": ["u1"], "text": ["quick brown fox extra"], "lang": ["en"]}),
        str(delta / "d.parquet"),
    )
    assert main(["apply", "--input", str(delta), "--index", idx, "--key-col", "id"]) == 0
    applied = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert applied["apply_metrics"]["rows"] >= 1

    assert main(["count", "--index", idx, "--text", "quick"]) == 0
    assert capsys.readouterr().out.strip() == "13"

    assert main(["analyze", "--text", "The Quick-Fox!"]) == 0
    az = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert az == {"analyzer": "ascii_v1", "tokens": ["the", "quick", "fox"]}

    assert main(["delete-by-query", "--index", idx, "--text", "quick"]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["deleted"] == 13

    assert main(["merge", "--index", idx, "--merge-factor", "8"]) == 0
    merged = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert merged["n_docs"] == 47  # 61 entries - old u1 version - 13 quick-docs

    assert ray.is_initialized()


def test_cli_new_api_subcommands(ray_session, corpus_dir, tmp_path, capsys):
    idx = str(tmp_path / "idx2")
    assert main(
        ["build", "--input", corpus_dir, "--index", idx, "--num-partitions", "2"]
    ) == 0
    capsys.readouterr()

    assert main(["cat-indices", "--indexes", idx]) == 0
    out = capsys.readouterr().out
    assert "docs_count" in out and "60" in out

    assert main(["cat-segments", "--indexes", idx]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.strip().splitlines() if l.strip()]
    assert "size_bytes" in lines[0] and "partitions" in lines[0]
    assert len(lines) == 3  # header + one row per base segment
    assert all("base" in l for l in lines[1:])

    tmpl = '{"query": {"match": {"text": "{{q}}"}}, "size": {{k}}{{^k}}3{{/k}}}'
    assert main(
        ["search-template", "--index", idx, "--template", tmpl,
         "--params", '{"q": "quick brown"}']
    ) == 0
    out = capsys.readouterr().out
    assert "rank" in out and "u10" in out  # score ties break doc_id asc
    assert len(out.strip().splitlines()) == 4  # header + size default 3

    bodies = json.dumps(
        [{"query": {"match": {"text": "quick"}}, "size": 2},
         {"query": {"match": {"text": "plain"}}, "size": 1}]
    )
    assert main(["msearch", "--index", idx, "--bodies", bodies]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.strip().splitlines()[1:] if l.strip()]
    assert len(lines) == 3  # 2 hits for body 0, 1 for body 1
