"""Codec round-trip goldens (FIXTURES.md §4): single doc, gaps of 1 and
~2^31, tf=1 vs tf>>1, block-boundary lengths 127/128/129 — the boundary-
value analog of the reference's Int.MIN/MAX routing tests
(ActorsTests.kt:35-43)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_es_ray.functions.codec import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


def roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr), arr.size).tolist() == arr.tolist()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_boundaries():
    roundtrip([0])
    roundtrip([127, 128, 129])
    roundtrip([(1 << 7) - 1, 1 << 7, (1 << 14) - 1, 1 << 14])
    roundtrip([(1 << 31) - 1, 1 << 31, (1 << 63) - 1, (1 << 64) - 1])


def test_varint_known_bytes():
    # golden: LEB128 of 300 = [0xAC, 0x02]
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_encode(np.array([1], dtype=np.uint64)) == b"\x01"


def test_delta_single_doc():
    ids = np.array([123456789], dtype=np.int64)
    assert delta_decode(delta_encode(ids), 1).tolist() == ids.tolist()


def test_delta_gap_one_and_huge():
    ids = np.array([0, 1, 2, 3, 2**31 + 3], dtype=np.int64)
    assert delta_decode(delta_encode(ids), ids.size).tolist() == ids.tolist()


def test_delta_block_boundaries():
    for n in (127, 128, 129, 1000):
        ids = np.cumsum(np.arange(1, n + 1, dtype=np.int64))
        assert delta_decode(delta_encode(ids), n).tolist() == ids.tolist()


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 3], dtype=np.int64))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300))
def test_varint_roundtrip_property(vals):
    roundtrip(vals)


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
def test_delta_roundtrip_property(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert delta_decode(delta_encode(arr), arr.size).tolist() == arr.tolist()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=50), st.integers(min_value=-100, max_value=100)),
        min_size=1,
        max_size=500,
    )
)
def test_bucketed_group_agg_property(kv_pairs):
    """bucketed_group_agg must equal a plain pandas groupby for any key
    distribution (the core shuffle helper — property-tested)."""
    import pandas as pd

    from kafka_es_ray.stages.shuffle import _bucket_of

    df = pd.DataFrame(kv_pairs, columns=["k", "v"]).astype({"k": "int64", "v": "int64"})
    # simulate the bucketed path without Ray: bucket, per-bucket agg, concat
    b = _bucket_of(df, ["k"], 7)
    parts = []
    for bucket_id in sorted(set(b)):
        sub = df[b == bucket_id]
        parts.append(sub.groupby("k", as_index=False)["v"].sum())
    got = pd.concat(parts, ignore_index=True).sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False)["v"].sum().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
