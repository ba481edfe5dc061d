"""Streaming (Ray) brute-force oracle must be rank-identical to the
driver-side oracle AND to the index engine — three independent paths,
one answer (SURVEY §7.0: oracle-first methodology)."""

import pandas as pd
import pytest

from kafka_es_ray.query.bruteforce import bruteforce_topk, bruteforce_topk_ray


def test_three_way_rank_identity(ray_session):
    import ray.data as rd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.fixtures import make_pages, make_queries
    from kafka_es_ray.functions.hashing import route_partition
    from kafka_es_ray.functions.textproc import fill_text_from_html
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import IndexSearcher

    cfg = EngineConfig(num_partitions=4)
    pages = make_pages(600)
    df = pages.to_pandas()
    df = df.sort_values(["url", "warc_ts"], ascending=[True, False]).drop_duplicates("url")
    df["text"] = fill_text_from_html(df["text"].to_numpy(), df["html"].to_numpy())
    df["part_id"] = route_partition(df["url"].to_numpy(), cfg.num_partitions)
    df = df.sort_values(["part_id", "url"])
    df["doc_id"] = df.groupby("part_id").cumcount() + df["part_id"].astype("int64") * cfg.part_stride
    df = df.rename(columns={"url": "key"})[["doc_id", "key", "text", "lang"]]

    import tempfile

    idx = tempfile.mkdtemp(prefix="bf3_")
    build_index(rd.from_arrow(pages), idx, cfg)
    s = IndexSearcher(idx, cfg)

    corpus_ds = rd.from_pandas(df).repartition(3)
    for row in make_queries(6).to_pandas().itertuples(index=False):
        a = bruteforce_topk(df, row.text, k=int(row.k), query_lang=row.lang)
        b = bruteforce_topk_ray(corpus_ds, row.text, k=int(row.k), query_lang=row.lang)
        c = s.search(row.text, lang=row.lang, k=int(row.k))
        assert a["doc_id"].tolist() == b["doc_id"].tolist() == c["doc_id"].tolist(), row.text
        assert a["score"].tolist() == b["score"].tolist() == c["score"].tolist(), row.text
