"""Tokenizer goldens — frozen analyzer chain v1 (SURVEY §7.4: any change
is a breaking analyzer version)."""

import pandas as pd

from kafka_es_ray.functions.tokenizer import get_analyzer, token_counts


def test_ascii_golden():
    a = get_analyzer("en")
    assert a.tokenize("Hello, World! 123 foo_bar") == ["hello", "world", "123", "foo", "bar"]
    assert a.tokenize("") == []
    assert a.tokenize(None) == []


def test_unicode_golden():
    a = get_analyzer("de")
    assert a.tokenize("Größe—Straße 42") == ["größe", "straße", "42"]
    a_uk = get_analyzer("uk")
    assert a_uk.tokenize("Привіт, світе!") == ["привіт", "світе"]


def test_default_fallback():
    assert get_analyzer("xx").name == "ascii_v1"
    assert get_analyzer(None).name == "ascii_v1"


def test_series_matches_scalar():
    a = get_analyzer("en")
    s = pd.Series(["The quick brown fox", None, "a-b_c d"])
    out = a.tokenize_series(s).tolist()
    assert out == [a.tokenize("The quick brown fox"), [], a.tokenize("a-b_c d")]


def test_token_counts_sorted():
    terms, tf = token_counts(["b", "a", "b", "c", "b"])
    assert terms.tolist() == ["a", "b", "c"]
    assert tf.tolist() == [1, 3, 1]


def test_duckdb_parity():
    """The SQL oracles tokenize with regexp_split_to_array(lower(text),
    '[^a-z0-9]+') — must match analyzer ascii_v1 exactly."""
    import duckdb

    texts = ["Hello, World! 123 foo_bar", "the fast key order", "a--b  c", ""]
    a = get_analyzer("en")
    con = duckdb.connect()
    for t in texts:
        (sql_tokens,) = con.execute(
            "select list_filter(regexp_split_to_array(lower(?), '[^a-z0-9]+'), x -> x <> '')",
            [t],
        ).fetchone()
        assert sql_tokens == a.tokenize(t), t


def test_bytes_fast_path_token_parity():
    """tokenize_series_bytes must produce the SAME token sequences as the
    frozen str chain (analyzer v1), UTF-8-decoded — across ascii, unicode,
    digits, punctuation, empty and None."""
    import pandas as pd

    texts = pd.Series(
        [
            "Hello, World! 123 foo_bar",
            "",
            None,
            "Ünïcödé text – naïve café ABC09",
            "a" * 5 + "  multiple   spaces\tand\nnewlines",
            "ALLCAPS lower 0x1f mixed42id",
        ]
    )
    for lang in ("en", "de"):
        an = get_analyzer(lang)
        want = an.tokenize_series(texts.fillna("")).tolist()
        got = [[t.decode("utf-8") for t in ts] for ts in an.tokenize_series_bytes(texts)]
        assert got == want, lang
