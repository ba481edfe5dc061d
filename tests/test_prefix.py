"""ES prefix queries: sorted-dictionary range expansion, match sets,
counts — single-process and distributed.  Oracle: brute-force pandas
startswith over the same corpus."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.segment import Segment
from kafka_es_ray.query.engine import IndexSearcher, run_counts

CFG = EngineConfig(num_partitions=4)

WORDS = [
    "apple", "apply", "appraise", "apt", "banana", "band", "bandit",
    "cat", "catalog", "category", "dog", "dogma",
]


def _corpus(n=100, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(2, 7)).tolist())
        for _ in range(n)
    ]
    return pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "doc_id": np.arange(1, n + 1, dtype=np.int64),
            "text": texts,
            "lang": np.where(np.arange(n) % 3 == 0, "de", "en"),
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    df = _corpus()
    idx = str(tmp_path_factory.mktemp("pfxidx"))
    build_index(
        rd.from_pandas(df), idx, CFG,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    return idx, df


def _brute_prefix(df: pd.DataFrame, prefix: str) -> pd.DataFrame:
    hit = df["text"].str.split().apply(
        lambda t: any(w.startswith(prefix) for w in t)
    )
    return df[hit]


def test_term_prefix_range_matches_scan(built):
    idx, _ = built
    for pid in range(CFG.num_partitions):
        s = Segment.load(idx, pid)
        terms = [t.as_py() for t in s.terms_arr]
        for p in ["ap", "app", "b", "cat", "dogm", "zz", "", "a"]:
            lo, hi = s.term_prefix_range(p)
            want = [i for i, t in enumerate(terms) if t.startswith(p)]
            assert list(range(lo, hi)) == want, (p, pid)


def test_prefix_count_matches_bruteforce(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    for p in ["ap", "band", "cat", "d", "zz"]:
        assert s.prefix_count(p) == len(_brute_prefix(df, p)), p


def test_prefix_with_filter_lang(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    want = _brute_prefix(df, "app")
    want = want[want["lang"] == "de"]
    assert s.prefix_count("app", filter_lang="de") == len(want)


def test_prefix_max_expansions_caps_terms(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    # cap=1 expands only the first dictionary term per segment ("apple")
    capped = s.prefix_count("app", max_expansions=1)
    full = s.prefix_count("app")
    assert capped <= full
    assert capped >= len(_brute_prefix(df, "apple")) and capped > 0


def test_distributed_prefix_count_matches_single(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame(
        {"query_id": [0, 1, 2], "prefix": ["ap", "cat", "zz"]}
    )
    out = run_counts(queries, idx, CFG)
    got = dict(zip(out["query_id"], out["n_matching"]))
    assert got[0] == s.prefix_count("ap")
    assert got[1] == s.prefix_count("cat")
    assert got.get(2, 0) == 0


def _brute_wildcard(df: pd.DataFrame, pre: str, suf: str) -> pd.DataFrame:
    hit = df["text"].str.split().apply(
        lambda t: any(
            w.startswith(pre) and w.endswith(suf) and len(w) >= len(pre) + len(suf)
            for w in t
        )
    )
    return df[hit]


def test_wildcard_count_matches_bruteforce(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    for pat, pre, suf in [
        ("ap*e", "ap", "e"),       # apple, appraise
        ("ca*", "ca", ""),         # pure prefix
        ("*og", "", "og"),         # leading star: dictionary scan
        ("b*d", "b", "d"),         # band
        ("zz*q", "zz", "q"),       # no match
    ]:
        assert s.wildcard_count(pat) == len(_brute_wildcard(df, pre, suf)), pat


def test_wildcard_exact_and_errors(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    # no star = exact term lookup
    assert s.wildcard_count("banana") == len(_brute_wildcard(df, "banana", ""))
    with pytest.raises(ValueError, match="exactly one"):
        s.wildcard_count("a*b*c")


def test_distributed_wildcard_matches_single(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame({"query_id": [0, 1], "wildcard": ["ap*e", "*og"]})
    out = run_counts(queries, idx, CFG)
    got = dict(zip(out["query_id"], out["n_matching"]))
    assert got[0] == s.wildcard_count("ap*e")
    assert got[1] == s.wildcard_count("*og")


def test_regexp_count_matches_bruteforce(built):
    import re

    idx, df = built
    s = IndexSearcher(idx, CFG)
    for pat in [
        "ap.*e",            # apple, appraise
        "ca(t|talog)",      # alternation
        "do[gm]+a?",        # char class + quantifiers
        ".*og",             # no literal prefix: full dictionary scan
        "band(it)?",        # optional group
        "zzz+",             # no match
        "apple",            # pure literal
    ]:
        rx = re.compile(f"^(?:{pat})$")
        want = int(
            df["text"].str.split().apply(
                lambda t: any(rx.match(w) for w in t)
            ).sum()
        )
        assert s.regexp_count(pat) == want, pat


def test_regexp_literal_prefix_extraction():
    from kafka_es_ray.query.engine import _regexp_literal_prefix

    assert _regexp_literal_prefix("apple") == "apple"
    assert _regexp_literal_prefix("ap.*e") == "ap"
    assert _regexp_literal_prefix("abc*") == "ab"      # '*' quantifies 'c'
    assert _regexp_literal_prefix("abc+d") == "ab"
    assert _regexp_literal_prefix("abc?") == "ab"
    assert _regexp_literal_prefix("abc{2}") == "ab"
    assert _regexp_literal_prefix(".*og") == ""
    assert _regexp_literal_prefix("(ab)c") == ""
    assert _regexp_literal_prefix("a\\d") == "a"


def test_distributed_regexp_matches_single(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame({"query_id": [0, 1], "regexp": ["ap.*e", ".*og"]})
    out = run_counts(queries, idx, CFG)
    got = dict(zip(out["query_id"], out["n_matching"]))
    assert got[0] == s.regexp_count("ap.*e")
    assert got[1] == s.regexp_count(".*og")


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_term_suggest_matches_bruteforce(built):
    """run_term_suggest == vocabulary terms within edit distance 1 of the
    probe (probe excluded), ranked by (global df desc, term asc)."""
    from kafka_es_ray.query.engine import run_term_suggest

    idx, df = built
    # global df from the raw corpus
    tok_sets = [set(t.split()) for t in df["text"]]
    vocab: dict[str, int] = {}
    for ts in tok_sets:
        for w in ts:
            vocab[w] = vocab.get(w, 0) + 1
    probes = ["aple", "cat", "bandit", "zzz"]
    got = run_term_suggest(probes, idx, k=5, cfg=CFG)
    for qi, p in enumerate(probes):
        cands = [(w, c) for w, c in vocab.items() if w != p and _lev(w, p) <= 1]
        cands.sort(key=lambda t: (-t[1], t[0]))
        want = cands[:5]
        g = got[got["query_id"] == qi]
        assert list(zip(g["suggestion"], g["freq"])) == want, p
        assert g["rank"].tolist() == list(range(1, len(want) + 1))


def test_suggest_no_candidates_returns_empty(built):
    """A probe with no distance-1 / prefix candidates yields an empty
    typed frame, not a crash (regression: empty partial schema)."""
    from kafka_es_ray.query.engine import run_completion_suggest, run_term_suggest

    idx, _ = built
    for fn in (run_term_suggest, run_completion_suggest):
        out = fn(["zzqqxx"], idx, cfg=CFG)
        assert len(out) == 0
        assert list(out.columns) == ["query_id", "rank", "suggestion", "freq"]


def test_phrase_suggest_matches_bruteforce(built):
    """run_phrase_suggest == cross-product of per-slot distance<=1
    generators (top-5 by df), unigram-LM scored, input excluded."""
    from itertools import product as _product

    from kafka_es_ray.query.engine import run_phrase_suggest

    idx, df = built
    tok_sets = [set(t.split()) for t in df["text"]]
    vocab: dict[str, int] = {}
    for ts in tok_sets:
        for w in ts:
            vocab[w] = vocab.get(w, 0) + 1
    n = len(df)
    text = "aple cat"
    got = run_phrase_suggest([text], idx, k=3, gen_size=5, cfg=CFG)
    slots = []
    for p in text.split():
        cands = [(w, c) for w, c in vocab.items() if _lev(w, p) <= 1]
        cands.sort(key=lambda t: (-t[1], t[0]))
        slots.append(cands[:5])
    want = []
    for combo in _product(*slots):
        phrase = " ".join(w for w, _ in combo)
        if phrase == text:
            continue
        raw = sum(np.log((c + 1.0) / (n + 1.0)) for _, c in combo)
        want.append((float(np.floor(raw * 1e6 + 0.5) / 1e6), phrase))
    want.sort(key=lambda t: (-t[0], t[1]))
    assert list(zip(got["suggestion"], got["score"])) == [
        (p, s) for s, p in want[:3]
    ]
    # an input token with no generator output kills the suggestion
    assert len(run_phrase_suggest(["zzqqxx cat"], idx, cfg=CFG)) == 0
    # empty input text: no crash, typed empty frame
    out = run_phrase_suggest([""], idx, cfg=CFG)
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "rank", "suggestion", "score"]


def test_completion_suggest_matches_bruteforce(built):
    """run_completion_suggest == vocabulary terms with the prefix, ranked
    (global df desc, term asc); exact matches are kept as completions."""
    from kafka_es_ray.query.engine import run_completion_suggest

    idx, df = built
    tok_sets = [set(t.split()) for t in df["text"]]
    vocab: dict[str, int] = {}
    for ts in tok_sets:
        for w in ts:
            vocab[w] = vocab.get(w, 0) + 1
    prefixes = ["ap", "cat", "do", "zz", "banana"]
    got = run_completion_suggest(prefixes, idx, k=4, cfg=CFG)
    for qi, p in enumerate(prefixes):
        cands = [(w, c) for w, c in vocab.items() if w.startswith(p)]
        cands.sort(key=lambda t: (-t[1], t[0]))
        want = cands[:4]
        g = got[got["query_id"] == qi]
        assert list(zip(g["suggestion"], g["freq"])) == want, p


def test_fuzzy_term_expansion_matches_levenshtein(built):
    from kafka_es_ray.query.engine import _fuzzy_term_indices

    idx, _ = built
    probes = [
        "apple", "aple", "apples", "cat", "cats", "dog", "dogs", "banc",
        "ab", "ba", "bandit", "bandits", "xandit", "a", "z", "catalogue",
        "aaple", "dpple", "appl", "pple",
    ]
    for pid in range(CFG.num_partitions):
        s = Segment.load(idx, pid)
        terms = [t.as_py() for t in s.terms_arr]
        for q in probes:
            got = _fuzzy_term_indices(s, q)
            want = [i for i, t in enumerate(terms) if _lev(q, t) <= 1]
            assert got == want, (q, pid, [terms[i] for i in got], [terms[i] for i in want])


def test_fuzzy_count_matches_bruteforce(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    vocab = sorted({w for t in df["text"] for w in t.split()})
    for q in ["apple", "cats", "banc", "dogs", "zzz"]:
        near = {t for t in vocab if _lev(q, t) <= 1}
        hit = df["text"].str.split().apply(lambda t: any(w in near for w in t))
        assert s.fuzzy_count(q) == int(hit.sum()), q


def test_distributed_fuzzy_matches_single(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame({"query_id": [0, 1], "fuzzy": ["apple", "cats"]})
    out = run_counts(queries, idx, CFG)
    got = dict(zip(out["query_id"], out["n_matching"]))
    assert got[0] == s.fuzzy_count("apple")
    assert got[1] == s.fuzzy_count("cats")


def test_mixed_match_and_prefix_plans(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame(
        {
            "query_id": [0, 1],
            "text": ["banana", None],
            "prefix": [None, "dog"],
        }
    )
    out = run_counts(queries, idx, CFG)
    got = dict(zip(out["query_id"], out["n_matching"]))
    assert got[0] == s.count("banana")
    assert got[1] == s.prefix_count("dog")


def test_fuzzy2_term_expansion_matches_levenshtein(built):
    from kafka_es_ray.query.engine import _fuzzy_term_indices_k, auto_fuzziness

    idx, _ = built
    probes = [
        "apple", "aple", "ale", "cat", "ct", "dg", "banct", "xyndit",
        "a", "catalogxy", "ppl", "banditss", "dppl",
    ]
    for pid in range(CFG.num_partitions):
        s = Segment.load(idx, pid)
        terms = [t.as_py() for t in s.terms_arr]
        for q in probes:
            got = _fuzzy_term_indices_k(s, q, 2)
            want = [i for i, t in enumerate(terms) if _lev(q, t) <= 2]
            assert got == want, (q, pid)
            # distance-1 path stays the strict subset
            got1 = _fuzzy_term_indices_k(s, q, 1)
            assert set(got1) <= set(got), q
    # the ES AUTO:3,6 rule
    assert auto_fuzziness("ab") == 0
    assert auto_fuzziness("abc") == 1 and auto_fuzziness("abcde") == 1
    assert auto_fuzziness("abcdef") == 2
    import pytest as _pytest
    with _pytest.raises(ValueError, match="only 1, 2"):
        _fuzzy_term_indices_k(Segment.load(idx, 0), "apple", 3)


def test_fuzzy_banded_dp_hypothesis():
    """Property: the vectorized banded Levenshtein matches a reference
    edit-distance over arbitrary small dictionaries and probes, at both
    supported distances."""
    import types

    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_es_ray.query.engine import _fuzzy_term_indices_k

    word = st.text(alphabet="abz", min_size=1, max_size=7)

    @settings(max_examples=150, deadline=None)
    @given(vocab=st.lists(word, min_size=1, max_size=15, unique=True), probe=word)
    def check(vocab, probe):
        vocab = sorted(vocab)
        seg = types.SimpleNamespace(terms_arr=pa.array(vocab))
        for k in (1, 2):
            got = _fuzzy_term_indices_k(seg, probe, k)
            want = [i for i, t in enumerate(vocab) if _lev(probe, t) <= k]
            assert got == want, (probe, k, vocab)

    check()


def test_fuzzy_transpositions_matches_damerau():
    """Property: fuzzy_transpositions=true expansion == the unrestricted
    Damerau-Levenshtein (an adjacent swap costs 1; an edit may land
    BETWEEN a transposed pair — 'ca'→'abc' is 2, OSA says 3), at both
    supported distances, via the reference Lowrance-Wagner metric."""
    import types

    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_es_ray.query.engine import (
        _damerau_levenshtein,
        _fuzzy_term_indices_k,
    )

    # reference sanity pins (unrestricted, not OSA)
    dl = lambda a, b: _damerau_levenshtein(a.encode(), b.encode())
    assert dl("ca", "abc") == 2
    assert dl("abcd", "acbd") == 1
    assert dl("fox", "ofx") == 1
    assert dl("abcdef", "bacdfe") == 2

    word = st.text(alphabet="abz", min_size=1, max_size=7)

    @settings(max_examples=150, deadline=None)
    @given(vocab=st.lists(word, min_size=1, max_size=15, unique=True), probe=word)
    def check(vocab, probe):
        vocab = sorted(vocab)
        seg = types.SimpleNamespace(terms_arr=pa.array(vocab))
        for k in (1, 2):
            got = _fuzzy_term_indices_k(seg, probe, k, transpositions=True)
            want = [i for i, t in enumerate(vocab) if dl(probe, t) <= k]
            assert got == want, (probe, k, vocab)
            # plain-Levenshtein set is always a subset
            plain = _fuzzy_term_indices_k(seg, probe, k)
            assert set(plain) <= set(got), (probe, k, vocab)

    check()


def test_match_fuzzy_transpositions_distributed(built):
    """match fuzziness=1 with fuzzy_transpositions=true expands an
    adjacent-swap probe back to the original term (the plain distance-1
    Levenshtein cannot express a swap), and the distributed path scores
    the expanded set."""
    import pandas as pd

    from kafka_es_ray.query.engine import (
        _global_fuzzy_expand,
        read_manifest,
        run_queries,
    )

    idx, _ = built
    s = Segment.load(idx, 0)
    term = next(
        t.as_py()
        for t in s.terms_arr
        if len(t.as_py()) >= 4 and t.as_py()[1] != t.as_py()[2]
    )
    probe = term[:1] + term[2] + term[1] + term[3:]  # swap chars 1,2
    assert probe != term
    man = read_manifest(idx)
    with_tr = _global_fuzzy_expand([idx], [man], probe, 1, True)
    plain = _global_fuzzy_expand([idx], [man], probe, 1, False)
    assert term in with_tr and term not in plain
    assert set(plain) <= set(with_tr)
    # end-to-end: the rewritten row ranks docs of the expanded set
    q = pd.DataFrame(
        {
            "query_id": np.array([0], dtype=np.int64),
            "text": [probe],
            "fuzziness": np.array([1], dtype=np.int64),
            "fuzzy_transpositions": [True],
        }
    )
    got = run_queries(q, idx).to_pandas()
    assert len(got) > 0
    hit_ids = set()
    for pid in range(CFG.num_partitions):
        seg = Segment.load(idx, pid)
        for t in with_tr:
            ti = seg.lookup(t)
            if ti is not None and ti >= 0:
                hit_ids.update(seg.postings_with_dl(ti)[0].tolist())
    assert set(got["doc_id"].tolist()) <= hit_ids


def test_index_prefixes_equals_dictionary_scan(ray_session, tmp_path_factory):
    """ES index_prefixes: counting via ONE exact term lookup on the px
    subfield == the dictionary range-scan prefix count, for every
    in-range prefix length; out-of-range lengths are absent from px."""
    import ray.data as rd

    from kafka_es_ray.pipelines.fulltext import add_index_prefixes
    from kafka_es_ray.query.engine import run_counts

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "key": [str(i) for i in range(6)],
            "text": [
                "banana band bandit",
                "banana split",
                "bandage box",
                "cat nap",
                "ban hammer",
                "bandana",
            ],
            "lang": "en",
        }
    )
    cfg = EngineConfig(num_partitions=2, text_fields=("body", "px"))
    ds = add_index_prefixes(
        rd.from_pandas(docs), text_col="text", out_col="px",
        min_chars=2, max_chars=5,
    ).map_batches(
        lambda b: b.rename(columns={"text": "body"}), batch_format="pandas"
    )
    d = str(tmp_path_factory.mktemp("px") / "idx")
    build_index(
        ds, d, cfg, key_col="key", text_col="body", lang_col="lang",
        html_col=None, ts_col=None, id_col="doc_id",
    )
    probes = ["ba", "ban", "band", "banda", "ca", "zz"]
    q = pd.DataFrame(
        {
            "query_id": np.arange(len(probes), dtype=np.int64),
            "text": probes,
            "field": "px",
        }
    )
    got = run_counts(q, d, cfg).sort_values("query_id")

    def brute(p):
        return sum(
            any(t.startswith(p) for t in txt.split()) for txt in docs["text"]
        )

    assert got["n_matching"].tolist() == [brute(p) for p in probes]
    # a 6-char probe is beyond max_chars: px cannot answer it (0 hits
    # even though a longer token exists) — the documented range contract
    q6 = pd.DataFrame({"query_id": [0], "text": ["bandan"], "field": "px"})
    assert run_counts(q6, d, cfg)["n_matching"].tolist() == [0]


def test_term_suggest_modes(built):
    """suggest_mode: popular keeps only candidates beating the probe's
    own global df; missing yields nothing for a known term and behaves
    like always for an absent probe."""
    from kafka_es_ray.query.engine import run_term_suggest

    idx, df = built
    vocab: dict[str, int] = {}
    for t in df["text"]:
        for w in set(t.split()):
            vocab[w] = vocab.get(w, 0) + 1
    # "cat" is a real (frequent) term with distance-1 neighbors
    probe = "cat"
    always = run_term_suggest([probe], idx, k=10, cfg=CFG)
    popular = run_term_suggest(
        [probe], idx, k=10, cfg=CFG, suggest_mode="popular"
    )
    pf = vocab[probe]
    want_pop = sorted(
        [(w, c) for w, c in vocab.items()
         if w != probe and _lev(w, probe) <= 1 and c > pf],
        key=lambda t: (-t[1], t[0]),
    )
    assert list(zip(popular["suggestion"], popular["freq"])) == want_pop
    assert set(popular["suggestion"]) <= set(always["suggestion"])
    # missing: known probe -> no rows; absent probe -> same as always
    missing_known = run_term_suggest(
        [probe], idx, k=10, cfg=CFG, suggest_mode="missing"
    )
    assert len(missing_known) == 0
    absent = "aple"
    assert vocab.get(absent) is None
    m_abs = run_term_suggest([absent], idx, k=10, cfg=CFG, suggest_mode="missing")
    a_abs = run_term_suggest([absent], idx, k=10, cfg=CFG)
    assert m_abs.equals(a_abs) and len(m_abs) > 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="suggest_mode"):
        run_term_suggest([probe], idx, cfg=CFG, suggest_mode="nope")


def test_terms_partition_pages_cover_disjointly(built):
    """terms partitioning: the 3 pages are disjoint, their union is the
    full bucket list, and membership follows the md5 contract."""
    import hashlib

    from kafka_es_ray.query.engine import run_agg_terms

    idx, _ = built
    q = pd.DataFrame({"query_id": [0], "text": ["banana band bandit cat"]})
    full = run_agg_terms(q, idx, field="lang", cfg=CFG)
    pages = [
        run_agg_terms(q, idx, field="lang", cfg=CFG, partition=(p, 3))
        for p in range(3)
    ]
    seen = pd.concat(pages, ignore_index=True)
    assert sorted(seen["value"]) == sorted(full["value"])
    assert seen["n_docs"].sum() == full["n_docs"].sum()
    for p, pg in enumerate(pages):
        for v in pg["value"]:
            h = int.from_bytes(
                hashlib.md5(str(v).encode()).digest()[8:16], "little"
            )
            assert h % 3 == p, (v, p)
