"""Corpus format ingestion + NDJSON bulk export round trip."""

import json
import os

import pandas as pd

from kafka_es_ray.sources.corpus import read_corpus, write_actions_ndjson
from kafka_es_ray.stages.actions import parse_record


def test_read_corpus_json_and_csv(ray_session, tmp_path):
    df = pd.DataFrame({"url": ["u1", "u2"], "text": ["alpha beta", "gamma"], "lang": ["en", "de"]})
    jpath = str(tmp_path / "c.json")
    df.to_json(jpath, orient="records", lines=True)
    ds = read_corpus(jpath, format="json", columns=["url", "text"])
    out = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert out["text"].tolist() == ["alpha beta", "gamma"]
    assert list(out.columns) == ["url", "text"]

    cpath = str(tmp_path / "c.csv")
    df.to_csv(cpath, index=False)
    out2 = read_corpus(cpath, format="csv").to_pandas()
    assert len(out2) == 2


def test_write_actions_ndjson_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    actions = pd.DataFrame(
        [
            {"op": "index", "id": "a", "index": "t", "routing": None, "source": '{"x":1}'},
            {"op": "delete", "id": "b", "index": "t", "routing": "r9", "source": None},
        ]
    )
    out_dir = str(tmp_path / "nd")
    results = write_actions_ndjson(rd.from_pandas(actions), out_dir, num_files=1)
    assert results["n_actions"].sum() == 2
    path = results["path"].iloc[0]
    assert os.path.exists(path) and path.endswith(".ndjson")
    lines = open(path).read().splitlines()
    # ES wire format: meta line (+ source line for non-delete)
    assert json.loads(lines[0]) == {"index": {"_id": "a", "_index": "t"}}
    assert json.loads(lines[1]) == {"x": 1}
    assert json.loads(lines[2]) == {"delete": {"_id": "b", "_index": "t", "routing": "r9"}}
    # and it parses back through the converter
    back = parse_record(lines[2], None)
    assert back[0]["op"] == "delete" and back[0]["routing"] == "r9"
