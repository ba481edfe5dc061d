"""Stable, vectorized 64-bit hashing for routing / partitioning.

The reference routes records to writers with JVM ``hashCode`` of the routing
key: ``groupIx = (router(elem) & 0x7FFF_FFFF) % nOut`` (reference
Actors.kt:66, key choice ElasticsearchSinkTask.kt:209-212).  We need the
same property — same key always lands in the same partition — but stable
across *processes and machines* (Python's builtin ``hash`` is salted by
PYTHONHASHSEED, so it is banned here).

``pandas.util.hash_array`` is a deterministic, vectorized 64-bit hash
(fixed internal key), suitable for string/object and numeric arrays alike.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def stable_hash64(values) -> np.ndarray:
    """Deterministic uint64 hash of an array-like of strings/bytes/ints."""
    arr = np.asarray(values, dtype=object) if not isinstance(values, np.ndarray) else values
    if arr.dtype.kind in ("i", "u", "f"):
        return pd.util.hash_array(arr)
    return pd.util.hash_array(arr.astype(object), categorize=False)


def route_partition(keys, num_partitions: int) -> np.ndarray:
    """Partition assignment: ``hash(key) mod n`` — the RoutingActor rule
    (reference Actors.kt:66) with a process-stable hash.

    Returns int32 partition ids in ``[0, num_partitions)``.
    """
    return (stable_hash64(keys) % np.uint64(num_partitions)).astype(np.int32)
