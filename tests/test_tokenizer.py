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


def test_english_minimal_stem_goldens():
    """Lucene EnglishMinimalStemmer reference behavior (plural-only)."""
    from kafka_es_ray.functions.tokenizer import english_minimal_stem as stem

    cases = {
        # plain plural drop
        "cats": "cat", "houses": "house", "dogs": "dog", "queries": "query",
        # 'ss' / 'us' endings kept
        "miss": "miss", "glass": "glass", "bus": "bus", "corpus": "corpus",
        # ...ies -> ...y unless a/e precedes the i
        "movies": "movy", "ties": "ty", "dies": "dy", "ies": "ies",
        # [iaou]es kept (goes, dies-at-len-3 handled above)
        "goes": "goes", "dues": "dues",
        # too short / non-s
        "as": "as", "is": "is", "s": "s", "run": "run", "": "",
        # e before s but consonant at -3: drop s
        "makes": "make", "races": "race",
    }
    for w, want in cases.items():
        assert stem(w) == want, w


def test_filtered_analyzer_paths_agree():
    """en_stop / en_min_stem: the scalar, series and bytes paths emit
    identical token streams; stopwords vanish; stems apply."""
    import pandas as pd

    texts = pd.Series(
        [
            "The cats and the dogs are in THE houses",
            "it was a dark night; they will not stop",
            "", None, "Movies and queries of glass buses",
        ]
    )
    for lang in ("en_stop", "en_min_stem"):
        an = get_analyzer(lang)
        scalar = [an.tokenize(t or "") for t in texts]
        series = an.tokenize_series(texts.fillna("")).tolist()
        byts = [
            [t.decode("utf-8") for t in ts]
            for ts in an.tokenize_series_bytes(texts)
        ]
        assert scalar == series == byts, lang
    stop_toks = get_analyzer("en_stop").tokenize(
        "The cats and the dogs are in THE houses"
    )
    assert stop_toks == ["cats", "dogs", "houses"]
    stem_toks = get_analyzer("en_min_stem").tokenize(
        "the cats are in the houses with movies"
    )
    assert stem_toks == ["the", "cat", "are", "in", "the", "house", "with", "movy"]


def test_stem_duckdb_case_parity():
    """The SQL oracle's stemmer CASE expression replays
    english_minimal_stem byte-for-byte over a word battery."""
    import duckdb

    import __ray_entry__ as entrymod
    from kafka_es_ray.functions.tokenizer import english_minimal_stem

    words = [
        "cats", "houses", "movies", "ties", "dies", "goes", "dues", "miss",
        "bus", "as", "s", "", "makes", "queries", "aies", "eies", "oies",
        "xies", "abcs", "abcss", "abcus", "ies", "es", "ssss", "aes", "oes",
        "ues", "yes", "res", "nes",
    ]
    con = duckdb.connect()
    got = con.execute(
        "SELECT list_transform($1::VARCHAR[], x -> "
        + entrymod._STEM_CASE.replace("\n", " ")
        + ")",
        [words],
    ).fetchone()[0]
    assert got == [english_minimal_stem(w) for w in words]
