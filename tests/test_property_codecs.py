"""Hypothesis property tests for the wire/storage codecs added in round
2: proto3 wire round-trips, positions encode/decode, selective block
decode vs full decode on arbitrary posting shapes."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_es_ray.functions.protowire import ProtoMessageType

MSG = ProtoMessageType(
    "t.Prop",
    {
        1: ("a", "int32"),
        2: ("b", "int64"),
        3: ("c", "uint64"),
        4: ("s", "string"),
        5: ("by", "bytes"),
        6: ("f", "bool"),
    },
)


@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    b=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    c=st.integers(min_value=0, max_value=2**64 - 1),
    s=st.text(max_size=80),
    by=st.binary(max_size=80),
    f=st.booleans(),
)
def test_proto_wire_roundtrip(a, b, c, s, by, f):
    vals = {"a": a, "b": b, "c": c, "s": s, "by": by, "f": f}
    assert MSG.decode(MSG.encode(vals)) == vals


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=1, max_size=200))
def test_proto_decoder_never_hangs_or_overreads(data):
    """Arbitrary bytes either decode to a dict or raise ValueError —
    never crash with an unexpected exception type."""
    try:
        out = MSG.decode(data)
        assert isinstance(out, dict)
    except ValueError:
        pass


@settings(max_examples=50, deadline=None)
@given(
    lists=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "e1", "zz"]), max_size=30),
        min_size=1,
        max_size=20,
    )
)
def test_positions_roundtrip_via_segment(lists, tmp_path_factory):
    """Build a positions-indexed segment from arbitrary token lists; every
    term's decoded position runs must equal the brute-force positions."""
    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_segment_for_group
    from kafka_es_ray.index.segment import Segment

    d = str(tmp_path_factory.mktemp("prop"))
    cfg = EngineConfig(num_partitions=1, index_positions=True, block_size=4)
    g = pd.DataFrame(
        {
            "part_id": 0,
            "url": [f"u{i:04d}" for i in range(len(lists))],
            "text": [" ".join(ts) for ts in lists],
            "lang": "en",
        }
    )
    build_segment_for_group(g, d, cfg, "url", "text", "lang", None, None, None, None)
    s = Segment.load(d, 0)
    # brute-force oracle: positions of term t in doc (docs sorted by url)
    docs = sorted(zip(g["url"], lists))
    for ti in range(s.terms.size):
        term = s.terms[ti]
        ids, tfs, _ = s.postings_with_dl(ti)
        flat, run_starts = s.positions_for(ti)
        for j, did in enumerate(ids):
            run = flat[run_starts[j] : run_starts[j] + int(tfs[j])]
            rank = int(did)  # part 0, rank_base 0 -> doc_id == local rank
            want = [i for i, t in enumerate(docs[rank][1]) if t == term]
            assert run.tolist() == want, (term, did)


@settings(max_examples=50, deadline=None)
@given(
    df=st.integers(min_value=1, max_value=300),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_selective_block_decode_property(df, seed, tmp_path_factory):
    """lookup_postings over random candidates == full-decode membership,
    for arbitrary posting-list lengths and block shapes."""
    import pandas as pd

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_segment_for_group
    from kafka_es_ray.index.segment import Segment

    rng = np.random.default_rng(seed)
    d = str(tmp_path_factory.mktemp("sel"))
    cfg = EngineConfig(num_partitions=1, block_size=8)
    n = df + 20
    texts = ["common" if i < df else "rare" for i in range(n)]
    g = pd.DataFrame(
        {"part_id": 0, "url": [f"u{i:05d}" for i in range(n)], "text": texts, "lang": "en"}
    )
    build_segment_for_group(g, d, cfg, "url", "text", "lang", None, None, None, None)
    s = Segment.load(d, 0)
    ti = s.lookup("common")
    cand = np.unique(rng.integers(0, n + 5, size=min(10, n)))  # some miss
    hit, tfs, dl = s.lookup_postings(ti, cand.astype(np.int64))
    s2 = Segment.load(d, 0)
    ids_full, tfs_full, dl_full = s2.postings_with_dl(ti)
    want_hit = np.isin(cand, ids_full)
    assert np.array_equal(hit, want_hit)
    pos = np.searchsorted(ids_full, cand[hit])
    assert np.array_equal(tfs, tfs_full[pos])
    assert np.array_equal(dl, dl_full[pos])


@given(
    st.lists(st.binary(min_size=0, max_size=300), min_size=0, max_size=20)
)
@settings(max_examples=60, deadline=None)
def test_kfv_container_roundtrip_property(frames):
    from kafka_es_ray.functions import mediacodec as mc

    assert mc.decode_kfv(mc.encode_kfv(frames)) == frames


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=25),
    st.integers(min_value=1, max_value=25),
)
@settings(max_examples=60, deadline=None)
def test_resize_nearest_properties(h, w, oh, ow):
    """Output shape exact; every output pixel is SOME input pixel (the
    nearest-neighbor invariant); identity when shape unchanged."""
    from kafka_es_ray.functions import mediacodec as mc

    rng = np.random.default_rng(h * 1000 + w * 37 + oh + ow)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = mc.resize_nearest(img, oh, ow)
    assert out.shape == (oh, ow)
    assert set(np.unique(out)) <= set(np.unique(img))
    assert np.array_equal(mc.resize_nearest(img, h, w), img)
