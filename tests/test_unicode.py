"""Language-aware analysis end-to-end with REAL non-ASCII content (E6):
unicode analyzers through build + search, rank-identical to the oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.bruteforce import bruteforce_topk
from kafka_es_ray.query.engine import IndexSearcher

DOCS = [
    ("https://d.example/1", "Die schnelle braune Füchsin springt über den faulen Hund", "de"),
    ("https://d.example/2", "Größe und Straße sind schöne Wörter der Sprache", "de"),
    ("https://d.example/3", "Привіт світе це тестовий документ українською мовою", "uk"),
    ("https://d.example/4", "Ще один документ зі словом світе і словом мовою", "uk"),
    ("https://d.example/5", "Le renard brun saute par-dessus le chien paresseux", "fr"),
    ("https://d.example/6", "plain english document with the word fox inside", "en"),
    ("https://d.example/7", "another english document nothing special here", "en"),
]


def _table():
    return pa.table(
        {
            "url": pa.array([d[0] for d in DOCS]),
            "warc_ts": pa.array([1000 + i for i in range(len(DOCS))], type=pa.timestamp("us")),
            "html": pa.array([None] * len(DOCS), type=pa.binary()),
            "text": pa.array([d[1] for d in DOCS]),
            "lang": pa.array([d[2] for d in DOCS]),
        }
    )


def test_unicode_build_and_search(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "uidx")
    cfg = EngineConfig(num_partitions=3)
    m = build_index(rd.from_arrow(_table()), idx, cfg)
    assert m["n_docs"] == len(DOCS)
    s = IndexSearcher(idx, cfg)

    # unicode terms are first-class dictionary entries
    assert set(s.search("світе", lang="uk")["key"]) == {
        "https://d.example/3",
        "https://d.example/4",
    }
    assert set(s.search("straße", lang="de")["key"]) == {"https://d.example/2"}
    assert set(s.search("FÜCHSIN", lang="de")["key"]) == {"https://d.example/1"}  # lowercased
    assert len(s.search("fuchsin", lang="de")) == 0  # ü is not u

    # rank-identical vs the brute-force oracle on a multi-term query
    corpus = pd.DataFrame(
        {
            "key": [d[0] for d in DOCS],
            "text": [d[1] for d in DOCS],
            "lang": [d[2] for d in DOCS],
        }
    )
    # map engine doc ids by key
    key_to_id = {}
    for seg in s.segments:
        for did, k in zip(seg.doc_ids_store, seg.keys):
            key_to_id[k] = int(did)
    corpus["doc_id"] = corpus["key"].map(key_to_id).astype(np.int64)
    for q, lang in [("документ мовою", "uk"), ("le chien", "fr"), ("document the", "en")]:
        eng = s.search(q, lang=lang, k=5)
        ora = bruteforce_topk(corpus, q, k=5, query_lang=lang)
        assert eng["doc_id"].tolist() == ora["doc_id"].tolist(), q
        assert eng["score"].tolist() == ora["score"].tolist(), q
