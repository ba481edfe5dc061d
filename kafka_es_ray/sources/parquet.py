"""Parquet source helpers — prune at the read (columns + row filters).

The reference's source is the Kafka consumer feeding SinkRecord batches
(ElasticsearchSinkTask.kt:256-280); ours is ray.data.read_parquet with
column pruning so only needed columns leave storage."""

from __future__ import annotations

import os


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs):
    import ray.data as rd

    return rd.read_parquet(table_path(sf_dir, name), columns=columns, **kwargs)
