"""Corpus sources beyond parquet + the NDJSON bulk export sink.

The reference consumes JSON or protobuf Kafka records (JsonConverter.kt,
ProtobufConverter.kt) and emits NDJSON bulk bodies over HTTP
(BulkRequest.kt:16-47, content type application/x-ndjson).  Here:

  * ``read_corpus`` — parquet / json(l) / csv ingestion with column
    pruning where the format supports it;
  * ``write_actions_ndjson`` — distributed export of an actions Dataset
    in the exact ES /_bulk wire format, one atomically-written part file
    per task plus per-file result rows (the BulkActionResult analog,
    ElasticsearchBulkSender.kt:30-49): a drop-in way to replay this
    engine's doc stream into a real ES.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from kafka_es_ray.functions.hashing import stable_hash64
from kafka_es_ray.stages.actions import serialize_bulk


def read_corpus(path: str, format: str = "parquet", columns: list[str] | None = None):
    import ray.data as rd

    if format == "parquet":
        return rd.read_parquet(path, columns=columns)
    if format == "warc":
        # raw crawl archives (.warc/.warc.gz): (url, warc_ts, html, text)
        from kafka_es_ray.sources.warc import read_warc

        ds = read_warc(path)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    if format in ("json", "ndjson", "jsonl"):
        ds = rd.read_json(path)
    elif format == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"unsupported corpus format {format!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_actions_ndjson(actions_ds, out_dir: str, num_files: int = 16):
    """Actions Dataset -> {out_dir}/part-{hash}.ndjson (atomic), returns a
    small DataFrame of per-file results (path, n_actions, n_bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_part(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame({"path": [], "n_actions": [], "n_bytes": []})
        body = serialize_bulk(batch)
        name = f"part-{int(stable_hash64([body])[0]):016x}.ndjson"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(body)
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "path": [path],
                "n_actions": [np.int64(len(batch))],
                "n_bytes": [np.int64(len(body))],
            }
        )

    return (
        actions_ds.repartition(num_files)
        .map_batches(write_part, batch_format="pandas", batch_size=1 << 30)
        .to_pandas()
    )
