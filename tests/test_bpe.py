"""Trained BPE subword tokenizer (functions/bpe.py + the text_ops
distributed encode): Sennrich-style merge learning on the classic
worked example, deterministic ties, memoized distributed encoding,
partition invariance."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.functions.bpe import END, BpeEncoder, encode_word, train_bpe


def test_train_bpe_classic_example():
    # Sennrich et al. §3.2 shape: {low:5, lower:2, newest:6, widest:3}
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(counts, 4)
    # most frequent pair: ('e','s') with 6+3=9, then ('es','t') 9,
    # then ('est','') 9, then ('l','o') 7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")


def test_train_bpe_tie_break_deterministic():
    # "ab" and "cd" both occur twice: lexicographic pair asc wins
    merges = train_bpe({"ab": 2, "cd": 2}, 1)
    assert merges[0] == ("a", "b")


def test_encode_word_applies_rank_order():
    merges = train_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 10)
    enc = BpeEncoder(merges)
    assert "".join(enc.encode("newest")) == "newest" + END  # fully merged
    assert enc.count("newest") < len("newest") + 1
    # unseen word: falls back to characters + learned sub-merges only
    ranks = enc.ranks
    assert encode_word("zzz", ranks) == ("z", "z", "z", END)
    # memo works (same object back)
    assert enc.encode("newest") is enc.encode("newest")
    # stop-at-no-merge: empty ranks -> chars
    assert encode_word("ab", {}) == ("a", "b", END)


def test_bpe_pipeline_distributed(ray_session):
    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import bpe_token_counts, bpe_train_sample

    rng = np.random.default_rng(5)
    words = ["lowest", "lower", "newest", "widest", "low", "wide", "new"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "text": [
                " ".join(rng.choice(words, size=rng.integers(3, 9)).tolist())
                for _ in range(400)
            ],
        }
    )
    merges = bpe_train_sample(rd.from_pandas(docs), num_merges=50, sample_mod=2)
    assert merges  # learned something
    # training is sample-deterministic: same input, different partitioning
    merges2 = bpe_train_sample(
        rd.from_pandas(docs).repartition(7), num_merges=50, sample_mod=2
    )
    assert merges == merges2
    got = (
        bpe_token_counts(rd.from_pandas(docs), merges)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # serial reference
    enc = BpeEncoder(merges)
    want = [
        sum(enc.count(w) for w in t.split()) for t in docs["text"]
    ]
    assert got["n_bpe_tokens"].tolist() == want
    assert (got["n_bpe_tokens"] <= got["n_tokens"].to_numpy() * 7).all()
    # partition invariance of the encode
    again = (
        bpe_token_counts(rd.from_pandas(docs).repartition(9), merges)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)


def test_bpe_properties_hypothesis():
    """Property: for ANY trained merge table, encoding is lossless
    (concatenation == word + END), deterministic, and never longer than
    chars+1."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.text(alphabet="abcd", min_size=1, max_size=8)

    @settings(max_examples=200, deadline=None)
    @given(
        counts=st.dictionaries(words, st.integers(1, 9), min_size=1, max_size=12),
        n_merges=st.integers(0, 30),
        probe=words,
    )
    def check(counts, n_merges, probe):
        merges = train_bpe(counts, n_merges)
        enc = BpeEncoder(merges)
        sym = enc.encode(probe)
        assert "".join(sym) == probe + END
        assert 1 <= len(sym) <= len(probe) + 1
        assert enc.encode(probe) == encode_word(probe, enc.ranks)

    check()
