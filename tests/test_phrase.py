"""Phrase queries (ES match_phrase analog, slop=0) over an index built
with positions (cfg.index_positions=True) — checked against an
independent brute-force phrase scorer, across merges and deltas."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.functions.tokenizer import get_analyzer
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.merge import merge_index
from kafka_es_ray.query.bm25 import bm25_idf, bm25_tf_part, round6
from kafka_es_ray.query.engine import IndexSearcher

CFG = EngineConfig(num_partitions=4, index_positions=True)


def _phrase_oracle(docs: pd.DataFrame, text: str, k: int = 10) -> pd.DataFrame:
    """Brute-force phrase scorer mirroring the engine's frozen spec."""
    an = get_analyzer("en")
    phrase = an.tokenize(text)
    toks = [an.tokenize(t) for t in docs["text"]]
    n = len(docs)
    dfs = {
        t: sum(t in set(tt) for tt in toks) for t in set(phrase)
    }
    if any(dfs[t] == 0 for t in phrase):
        return pd.DataFrame(columns=["doc_id", "score"])
    idf_sum = float(
        sum(bm25_idf(np.array([dfs[t]]), n)[0] for t in phrase)
    )
    avgdl = np.mean([len(tt) for tt in toks]) or 1.0
    rows = []
    for did, tt in zip(docs["oracle_doc_id"], toks):
        tf = sum(
            1
            for i in range(len(tt) - len(phrase) + 1)
            if tt[i : i + len(phrase)] == phrase
        )
        if tf:
            score = round6(idf_sum * bm25_tf_part(np.array([tf], dtype=float), np.array([len(tt)], dtype=float), avgdl, 1.2, 0.75))[0]
            rows.append({"doc_id": int(did), "score": float(score)})
    out = pd.DataFrame(rows, columns=["doc_id", "score"])
    return out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k).reset_index(drop=True)


@pytest.fixture(scope="module")
def phrase_corpus():
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(120):
        words = list(rng.choice(vocab, size=rng.integers(5, 25)))
        if i % 4 == 0:
            words[1:1] = ["quick", "brown", "fox"]
        if i % 10 == 0:
            words += ["quick", "brown", "fox", "quick", "brown", "fox"]
        if i % 7 == 0:
            words += ["brown", "quick"]  # reversed: must NOT match
        texts.append(" ".join(words))
    return pd.DataFrame(
        {
            "url": [f"https://p.x/{i:04d}" for i in range(120)],
            "text": texts,
            "lang": ["en"] * 120,
        }
    )


@pytest.fixture(scope="module")
def phrase_index(ray_session, phrase_corpus, tmp_path_factory):
    import ray.data as rd

    d = str(tmp_path_factory.mktemp("phrx"))
    build_index(rd.from_pandas(phrase_corpus), d, CFG, html_col=None, ts_col=None)
    return d


def _with_engine_ids(corpus: pd.DataFrame, searcher: IndexSearcher) -> pd.DataFrame:
    key_to_id = {}
    for s in searcher.segments:
        for did, key in zip(s.doc_ids_store, s.keys):
            key_to_id[key] = int(did)
    return corpus.assign(oracle_doc_id=corpus["url"].map(key_to_id))


def test_phrase_matches_oracle(phrase_index, phrase_corpus):
    s = IndexSearcher(phrase_index, CFG)
    docs = _with_engine_ids(phrase_corpus, s)
    for q in ["quick brown fox", "quick brown", "brown fox", "quick"]:
        got = s.search_phrase(q, k=50)
        want = _phrase_oracle(docs, q, k=50)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), q
        assert got["score"].tolist() == want["score"].tolist(), q
    # reversed order never matches as a phrase unless truly adjacent
    rev = s.search_phrase("fox brown", k=100)
    oracle_rev = _phrase_oracle(docs, "fox brown", k=100)
    assert got is not None and rev["doc_id"].tolist() == oracle_rev["doc_id"].tolist()


def test_phrase_absent_and_empty(phrase_index):
    s = IndexSearcher(phrase_index, CFG)
    assert len(s.search_phrase("quick zzznope")) == 0
    assert len(s.search_phrase("")) == 0


def test_phrase_survives_merge(ray_session, phrase_index, phrase_corpus, tmp_path):
    import shutil

    d = str(tmp_path / "phm")
    shutil.copytree(phrase_index, d)
    s = IndexSearcher(d, CFG)
    before = s.search_phrase("quick brown fox", k=50)
    merge_index(d, merge_factor=4, cfg=CFG)
    after = IndexSearcher(d, CFG).search_phrase("quick brown fox", k=50)
    pd.testing.assert_frame_equal(before, after)


def test_phrase_requires_positions(ray_session, phrase_corpus, tmp_path):
    import ray.data as rd

    d = str(tmp_path / "nopos")
    build_index(
        rd.from_pandas(phrase_corpus), d, EngineConfig(num_partitions=2),
        html_col=None, ts_col=None,
    )
    s = IndexSearcher(d)
    with pytest.raises(ValueError, match="index_positions"):
        s.search_phrase("quick brown")


def test_phrase_incremental_delta(ray_session, phrase_corpus, tmp_path):
    """Delta segments inherit positions; phrase finds new docs and not
    tombstoned ones."""
    import ray.data as rd

    from kafka_es_ray.index.incremental import apply_incremental

    d = str(tmp_path / "phd")
    build_index(rd.from_pandas(phrase_corpus), d, CFG, html_col=None, ts_col=None)
    delta = pd.DataFrame(
        {
            "url": ["https://p.x/0000", "https://p.x/new"],
            "text": ["totally different now", "the quick brown fox jumps"],
            "lang": ["en", "en"],
        }
    )
    apply_incremental(d, delta, CFG, key_col="url")
    s = IndexSearcher(d, CFG)
    res = s.search_phrase("quick brown fox", k=200)
    assert "https://p.x/new" in set(res["key"])
    assert "https://p.x/0000" not in set(res["key"])  # replaced version has no phrase


def test_distributed_phrase_rank_identical(ray_session, phrase_index, phrase_corpus):
    """run_queries with type='phrase' rows must match the single-searcher
    phrase path exactly (and mixed match+phrase batches work)."""
    import ray.data as rd

    from kafka_es_ray.query.engine import run_queries

    s = IndexSearcher(phrase_index, CFG)
    qs = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["quick brown fox", "quick brown", "quick"],
            "lang": ["en"] * 3,
            "k": np.int32([20, 20, 20]),
            "type": ["phrase", "phrase", "match"],
        }
    )
    out = (
        run_queries(rd.from_pandas(qs), phrase_index, CFG, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    for qid, text, qtype in zip(qs["query_id"], qs["text"], qs["type"]):
        got = out[out["query_id"] == qid]
        want = (
            s.search_phrase(text, k=20) if qtype == "phrase" else s.search(text, k=20)
        )
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), (qid, text)
        assert got["score"].tolist() == want["score"].tolist(), (qid, text)


def test_phrase_slop(ray_session, tmp_path):
    """Window-slop phrase: slop=0 strict; slop=1 tolerates one inserted
    token; reversed-within-slop also matches (documented window
    semantics); far-apart terms never match."""
    import ray.data as rd

    docs = pd.DataFrame(
        {
            "url": ["exact", "gap1", "gap3", "far"],
            "text": [
                "alpha beta end",
                "alpha x beta end",
                "alpha x y z beta end",
                "alpha " + "pad " * 30 + "beta",
            ],
            "lang": ["en"] * 4,
        }
    )
    d = str(tmp_path / "slop")
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    s = IndexSearcher(d, CFG)
    assert set(s.search_phrase("alpha beta", k=10)["key"]) == {"exact"}
    assert set(s.search_phrase("alpha beta", k=10, slop=1)["key"]) == {"exact", "gap1"}
    assert set(s.search_phrase("alpha beta", k=10, slop=3)["key"]) == {"exact", "gap1", "gap3"}
    assert "far" not in set(s.search_phrase("alpha beta", k=10, slop=5)["key"])

    # distributed path honors slop
    from kafka_es_ray.query.engine import run_queries

    qs = pd.DataFrame(
        {
            "query_id": [0],
            "text": ["alpha beta"],
            "lang": ["en"],
            "k": np.int32([10]),
            "type": ["phrase"],
            "slop": np.int32([1]),
        }
    )
    out = run_queries(rd.from_pandas(qs), d, CFG, concurrency=2).to_pandas()
    assert set(out["key"]) == {"exact", "gap1"}


def test_rescore_phrase_composes(phrase_index, ray_session):
    """ES rescore (phrase rescorer): with a window covering every hit,
    each base hit's score becomes round6(query_weight*base +
    rescore_weight*phrase); docs not matching the phrase keep qw*base.
    Composed from the rank-verified match + phrase paths."""
    import numpy as np

    from kafka_es_ray.query.bm25 import round6
    from kafka_es_ray.query.engine import run_queries

    idx = phrase_index
    s = IndexSearcher(idx, CFG)
    PHRASE = "quick brown"
    base = s.search(PHRASE, k=200)
    ph = s.search_phrase(PHRASE, k=200)
    pm = dict(zip(ph["doc_id"], ph["score"]))
    qw, rw = 0.7, 1.3
    exp = {
        d: float(round6(qw * sc + rw * pm.get(d, 0.0)))
        for d, sc in zip(base["doc_id"], base["score"])
    }
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    q = pd.DataFrame(
        {
            "query_id": np.int64([0]),
            "text": [PHRASE],
            "rescore_phrase": [PHRASE],
            "rescore_window": [10_000],
            "query_weight": [qw],
            "rescore_weight": [rw],
            "k": np.int32(10),
        }
    )
    out = run_queries(q, idx, CFG, concurrency=2).to_pandas().sort_values("rank")
    assert list(zip(out["doc_id"], out["score"])) == ranked
    # absent rescore phrase -> base ranking untouched (ES: no-op rescore)
    q2 = q.assign(rescore_phrase="zzzgone zzzmissing", query_weight=1.0)
    out2 = run_queries(q2, idx, CFG, concurrency=2).to_pandas().sort_values("rank")
    want = base.head(10)
    assert out2["doc_id"].tolist() == want["doc_id"].tolist()
    assert out2["score"].tolist() == want["score"].tolist()


def _span_oracle(docs, searcher, text, slop, k=10):
    """Brute-force span_near (in_order) scorer: ordered greedy chain with
    total gap <= slop; tf = chain-starting first-term positions."""
    an = get_analyzer("en")
    terms = an.tokenize(text)
    toks = [an.tokenize(t) for t in docs["text"]]
    n = len(docs)
    dfs = {t: sum(t in set(tt) for tt in toks) for t in set(terms)}
    idf_sum = float(sum(bm25_idf(np.array([dfs[t]]), n)[0] for t in terms))
    avgdl = np.mean([len(tt) for tt in toks]) or 1.0
    rows = []
    for did, tt in zip(docs["oracle_doc_id"], toks):
        tf = 0
        for i, w in enumerate(tt):
            if w != terms[0]:
                continue
            cur = i
            ok = True
            for t in terms[1:]:
                nxt = next((j for j in range(cur + 1, len(tt)) if tt[j] == t), None)
                if nxt is None:
                    ok = False
                    break
                cur = nxt
            if ok and (cur - i + 1 - len(terms)) <= slop:
                tf += 1
        if tf:
            score = round6(
                idf_sum
                * bm25_tf_part(
                    np.array([tf], dtype=float),
                    np.array([len(tt)], dtype=float), avgdl, 1.2, 0.75,
                )
            )[0]
            rows.append({"doc_id": int(did), "score": float(score)})
    out = pd.DataFrame(rows, columns=["doc_id", "score"])
    return (
        out.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k).reset_index(drop=True)
    )


def test_span_near_ordered_and_slop(ray_session, tmp_path_factory):
    """Hand-built docs pin the ordered-chain semantics: gap boundary,
    reversed order rejected, repeated-term clauses, 3-term chains."""
    import ray.data as rd

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(6)],
            "text": [
                "alpha z z z beta",     # gap 3
                "alpha z beta",         # gap 1
                "beta z z alpha",       # reversed only
                "alpha beta",           # gap 0
                "rep rep",              # repeated term chain
                "alpha z z z z beta",   # gap 4
            ],
            "lang": ["en"] * 6,
        }
    )
    d = str(tmp_path_factory.mktemp("spanx"))
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    s = IndexSearcher(d, CFG)
    key_of = lambda r: set(r["key"])
    r3 = s.search_span_near("alpha beta", slop=3)
    assert key_of(r3) == {"u0", "u1", "u3"}          # gap<=3; u5 (gap 4) out
    r0 = s.search_span_near("alpha beta", slop=0)
    assert key_of(r0) == {"u3"}                      # strict adjacency
    assert key_of(s.search_span_near("beta alpha", slop=3)) == {"u2"}
    assert key_of(s.search_span_near("rep rep", slop=0)) == {"u4"}
    # 3-term chain: alpha..beta needs both in order
    assert len(s.search_span_near("alpha beta alpha", slop=5)) == 0


def test_span_near_matches_bruteforce_and_distributed(
    ray_session, phrase_corpus, phrase_index
):
    from kafka_es_ray.query.engine import run_queries

    s = IndexSearcher(phrase_index, CFG)
    docs = _with_engine_ids(phrase_corpus, s)
    for text, slop in (("quick fox", 1), ("quick brown fox", 0), ("brown quick", 2)):
        got = s.search_span_near(text, slop=slop)
        want = _span_oracle(docs, s, text, slop)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), (text, slop)
        assert got["score"].tolist() == want["score"].tolist()
        q = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [text],
                "type": ["span_near"],
                "slop": np.array([slop], dtype=np.int64),
            }
        )
        dist = run_queries(q, phrase_index, CFG).to_pandas().sort_values("rank")
        assert dist["doc_id"].tolist() == got["doc_id"].tolist()
        assert dist["score"].tolist() == got["score"].tolist()


def test_intervals_unordered_gaps(ray_session, tmp_path_factory):
    """ES intervals (all_of, ordered=false): hand-built docs pin the
    unordered window semantics — any order matches, gap boundary exact,
    3-term covers."""
    import ray.data as rd

    from kafka_es_ray.query.engine import run_queries

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(7)],
            "text": [
                "alpha beta",             # gaps 0
                "beta alpha",             # reversed: still gaps 0
                "alpha z z beta",         # gaps 2
                "beta z z z alpha",       # gaps 3
                "alpha z z z z beta",     # gaps 4
                "alpha alpha alpha",      # missing beta: no match
                "beta z alpha z beta",    # best window gaps 1
            ],
            "lang": ["en"] * 7,
        }
    )
    d = str(tmp_path_factory.mktemp("intervx"))
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    s = IndexSearcher(d, CFG)
    key_of = lambda r: set(r["key"])
    assert key_of(s.search_intervals("alpha beta", max_gaps=0)) == {"u0", "u1"}
    assert key_of(s.search_intervals("alpha beta", max_gaps=2)) == {
        "u0", "u1", "u2", "u6",
    }
    assert key_of(s.search_intervals("alpha beta", max_gaps=3)) == {
        "u0", "u1", "u2", "u3", "u6",
    }
    assert key_of(s.search_intervals("alpha beta", max_gaps=4)) == {
        "u0", "u1", "u2", "u3", "u4", "u6",
    }
    # 3-term cover: beta..alpha..beta in u6 needs gaps >= 1... the
    # window [0, 4] holds beta, alpha, beta: width 5 - 2 distinct... the
    # unique-terms contract: "beta alpha beta" analyzes to {alpha, beta}
    assert key_of(s.search_intervals("beta alpha beta", max_gaps=0)) == {"u0", "u1"}
    # tf counts valid minimal-window ends: u6 at max_gaps=1 has ends at
    # the alpha (pos 2, window [0,2]... gaps 1) and the final beta
    # (pos 4, window [2,4], gaps 1) — score reflects tf=2
    r = s.search_intervals("alpha beta", max_gaps=1)
    assert key_of(r) == {"u0", "u1", "u6"}
    # distributed plan parity
    q = pd.DataFrame(
        {
            "query_id": np.array([0], dtype=np.int64),
            "text": ["alpha beta"],
            "type": ["intervals"],
            "max_gaps": np.array([2], dtype=np.int64),
        }
    )
    dist = run_queries(q, d, CFG).to_pandas().sort_values("rank")
    want = s.search_intervals("alpha beta", max_gaps=2)
    assert dist["doc_id"].tolist() == want["doc_id"].tolist()
    assert dist["score"].tolist() == want["score"].tolist()


def test_intervals_matches_bruteforce(ray_session, phrase_corpus, phrase_index):
    """Window-scan brute force over the corpus == the engine's
    minimal-window-per-end formulation (existence AND tf)."""
    an = get_analyzer("en")
    s = IndexSearcher(phrase_index, CFG)
    docs = _with_engine_ids(phrase_corpus, s)
    for text, mg in (("quick fox", 1), ("quick brown fox", 2), ("brown quick", 0)):
        terms = sorted(set(an.tokenize(text)))
        n = len(terms)
        toks = [an.tokenize(t) for t in docs["text"]]
        dfs = {t: sum(t in set(tt) for tt in toks) for t in terms}
        idf_sum = float(sum(bm25_idf(np.array([dfs[t]]), len(docs))[0] for t in terms))
        avgdl = np.mean([len(tt) for tt in toks]) or 1.0
        rows = []
        for did, tt in zip(docs["oracle_doc_id"], toks):
            # brute force: for each end position holding any term, check
            # the latest-occurrence-per-term window
            tf = 0
            for i, tok in enumerate(tt):
                if tok not in terms:
                    continue
                latest = []
                ok = True
                for u in terms:
                    cand_pos = [j for j in range(i + 1) if tt[j] == u]
                    if not cand_pos:
                        ok = False
                        break
                    latest.append(cand_pos[-1])
                if ok and (i - min(latest) + 1 - n) <= mg:
                    tf += 1
            if tf:
                score = round6(
                    idf_sum
                    * bm25_tf_part(
                        np.array([tf], dtype=float),
                        np.array([len(tt)], dtype=float), avgdl, 1.2, 0.75,
                    )
                )[0]
                rows.append({"doc_id": int(did), "score": float(score)})
        want = (
            pd.DataFrame(rows, columns=["doc_id", "score"])
            .sort_values(["score", "doc_id"], ascending=[False, True])
            .head(10).reset_index(drop=True)
        )
        got = s.search_intervals(text, max_gaps=mg)
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), (text, mg)
        assert got["score"].tolist() == want["score"].tolist(), (text, mg)


def test_span_or_union_freq(ray_session, tmp_path_factory):
    """span_or: union of clause-term occurrences; tf = Σ term tfs;
    absent clause terms dropped (or semantics)."""
    import ray.data as rd

    from kafka_es_ray.query.bm25 import bm25_idf, bm25_tf_part, round6
    from kafka_es_ray.query.engine import run_queries

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(4)],
            "text": [
                "alpha alpha beta",   # tf 3
                "alpha z z",          # tf 1
                "beta beta",          # tf 2
                "z z z",              # no match
            ],
            "lang": ["en"] * 4,
        }
    )
    d = str(tmp_path_factory.mktemp("spanor"))
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    q = pd.DataFrame(
        {
            "query_id": np.array([0, 1], dtype=np.int64),
            "text": ["alpha beta", "alpha zzmissing"],
            "type": ["span_or", "span_or"],
        }
    )
    out = run_queries(q, d, CFG).to_pandas()
    g0 = out[out["query_id"] == 0].sort_values("rank")
    assert set(g0["key"]) == {"u0", "u1", "u2"}
    an = get_analyzer("en")
    toks = [an.tokenize(t) for t in docs["text"]]
    dfa = sum("alpha" in set(t) for t in toks)
    dfb = sum("beta" in set(t) for t in toks)
    idf_sum = float(bm25_idf(np.array([dfa]), 4)[0] + bm25_idf(np.array([dfb]), 4)[0])
    avgdl = np.mean([len(t) for t in toks])
    want = {
        u: round6(
            idf_sum
            * bm25_tf_part(np.array([tf], float), np.array([dl], float), avgdl, 1.2, 0.75)
        )[0]
        for u, tf, dl in [("u0", 3, 3), ("u1", 1, 3), ("u2", 2, 2)]
    }
    assert {k_: v for k_, v in zip(g0["key"], g0["score"])} == want
    # absent term dropped: query 1 == span_or over alpha alone
    g1 = out[out["query_id"] == 1]
    assert set(g1["key"]) == {"u0", "u1"}


def test_span_not_pre_post_windows(ray_session, tmp_path_factory):
    """span_not: include positions die when an exclude occurrence falls
    in the pre/post window; 0/0 keeps everything."""
    import ray.data as rd

    from kafka_es_ray.query.engine import run_queries

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(5)],
            "text": [
                "alpha stop",          # exclude 1 after
                "stop alpha",          # exclude 1 before
                "alpha z z stop",      # exclude 3 after
                "alpha z alpha stop",  # positions 0 (safe at post=1), 2 (dies at post>=1)
                "alpha only here",     # never excluded
            ],
            "lang": ["en"] * 5,
        }
    )
    d = str(tmp_path_factory.mktemp("spannot"))
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)

    def run(pre, post):
        q = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": ["alpha"],
                "type": ["span_not"],
                "exclude": ["stop"],
                "pre": np.array([pre], dtype=np.int64),
                "post": np.array([post], dtype=np.int64),
            }
        )
        return run_queries(q, d, CFG).to_pandas()

    all_docs = {"u0", "u1", "u2", "u3", "u4"}
    assert set(run(0, 0)["key"]) == all_docs           # 0/0: spans never overlap
    assert set(run(0, 1)["key"]) == {"u1", "u2", "u3", "u4"}  # u0 dies; u3 keeps pos 0
    assert set(run(1, 0)["key"]) == {"u0", "u2", "u3", "u4"}  # u1 dies
    assert set(run(0, 3)["key"]) == {"u1", "u4"}       # u2 + both u3 positions die
    assert set(run(5, 5)["key"]) == {"u4"}
    # exclude term absent anywhere == plain include spans
    q2 = pd.DataFrame(
        {
            "query_id": np.array([0], dtype=np.int64),
            "text": ["alpha"],
            "type": ["span_not"],
            "exclude": ["zzmissing"],
            "pre": np.array([9], dtype=np.int64),
            "post": np.array([9], dtype=np.int64),
        }
    )
    assert set(run_queries(q2, d, CFG).to_pandas()["key"]) == all_docs


def test_span_first_envelope(ray_session, tmp_path_factory):
    """span_first: the chain must END before the given token position;
    greedy minimal-end chains make the cut exact."""
    import ray.data as rd

    from kafka_es_ray.query.engine import run_queries

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(4)],
            "text": [
                "alpha beta z z z z",       # chain ends at pos 1
                "z z z alpha beta z",       # ends at pos 4
                "z z z z z alpha beta",     # ends at pos 6
                "alpha z z z z beta",       # gap 4 > slop anyway
            ],
            "lang": ["en"] * 4,
        }
    )
    d = str(tmp_path_factory.mktemp("spanfx"))
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    s = IndexSearcher(d, CFG)
    assert set(s.search_span_near("alpha beta", slop=1)["key"]) == {"u0", "u1", "u2"}
    r = s.search_span_near("alpha beta", slop=1, first_end=5)
    assert set(r["key"]) == {"u0", "u1"}      # u2's chain ends at 6 >= 5
    r2 = s.search_span_near("alpha beta", slop=1, first_end=2)
    assert set(r2["key"]) == {"u0"}           # end() = 1+1 <= 2
    # distributed plan carries first_end
    q = pd.DataFrame(
        {
            "query_id": np.array([0], dtype=np.int64),
            "text": ["alpha beta"],
            "type": ["span_near"],
            "slop": np.array([1], dtype=np.int64),
            "first_end": np.array([5], dtype=np.int64),
        }
    )
    dist = run_queries(q, d, CFG).to_pandas()
    assert set(dist["key"]) == {"u0", "u1"}
    assert dist["score"].tolist() == r["score"].tolist()


def test_span_containing_and_within(ray_session, tmp_path_factory):
    """Hand-built docs pin containment semantics against the minimal-
    span-per-start (greedy) enumeration: little inside/outside the big
    span, gap boundary, multi-span docs, and the tf difference between
    containing (spans) and within (little occurrences)."""
    import ray.data as rd

    from kafka_es_ray.query.engine import run_queries

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(6)],
            "text": [
                # span [0,2] w/o gamma + span [6,8] with gamma7
                "alpha gap beta with gamma inside alpha gamma beta",
                "alpha beta no little here",       # span, no gamma
                "alpha x x x x beta gamma",        # gap 4 > slop 3: no span
                "gamma alpha beta",                # gamma outside the span
                # two spans each containing one gamma; within sees 2 gammas
                "alpha gamma beta alpha gamma beta",
                "no terms at all",
            ],
            "lang": ["en"] * 6,
        }
    )
    d = str(tmp_path_factory.mktemp("spancx"))
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)

    def run(mode):
        q = pd.DataFrame(
            {
                "query_id": [0],
                "text": ["alpha beta"],
                "little": ["gamma"],
                "type": [mode],
                "slop": [3],
            }
        )
        out = run_queries(q, d, CFG).to_pandas()
        return out if len(out) else pd.DataFrame(columns=["key", "score"])

    cont = run("span_containing")
    within = run("span_within")
    assert set(cont["key"]) == {"u0", "u4"}
    assert set(within["key"]) == {"u0", "u4"}
    # u4: containing tf = 2 spans; within tf = 2 gammas -> same scores;
    # both rank u4 (tf 2) above u0 (tf 1)
    assert cont.sort_values("rank")["key"].tolist() == ["u4", "u0"]
    assert within.sort_values("rank")["key"].tolist() == ["u4", "u0"]
    # little term absent from the corpus -> plan dropped, empty result
    q = pd.DataFrame(
        {
            "query_id": [0],
            "text": ["alpha beta"],
            "little": ["zzznothing"],
            "type": ["span_containing"],
            "slop": [3],
        }
    )
    assert run_queries(q, d, CFG).count() == 0
    # multi-token little is a hard error (exactly one span_term)
    q2 = pd.DataFrame(
        {
            "query_id": [0],
            "text": ["alpha beta"],
            "little": ["two words"],
            "type": ["span_within"],
            "slop": [3],
        }
    )
    with pytest.raises(ValueError, match="little"):
        run_queries(q2, d, CFG)

def test_span_multi_prefix_semantics(ray_session, tmp_path_factory):
    """Hand-built docs pin span_near-with-prefix-wrapper (span_multi)
    semantics: a prefix slot matches the UNION of dictionary terms
    starting with the prefix, ordered chain with gap <= slop, idf_sum
    sums EVERY present slot member (span_or convention per slot) — so a
    corpus term carrying the prefix contributes idf even when it never
    completes a chain."""
    import ray.data as rd

    from kafka_es_ray.query.engine import run_queries

    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(7)],
            "text": [
                "alpha betone",             # gap 0, member betone
                "alpha z z z bettwo",       # gap 3, member bettwo
                "alpha z z z z betone",     # gap 4 > slop: no chain
                "betone alpha",             # reversed: no chain
                "alpha nonmatch",           # first slot only
                "betthree only here",       # prefix member, no alpha:
                                            # still contributes idf
                "alpha betone alpha bettwo",  # tf 2 (two anchors chain)
            ],
            "lang": ["en"] * 7,
        }
    )
    d = str(tmp_path_factory.mktemp("spanmx"))
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)

    def run(text, slop):
        q = pd.DataFrame(
            {
                "query_id": np.array([0], dtype=np.int64),
                "text": [text],
                "type": ["span_multi"],
                "slop": np.array([slop], dtype=np.int64),
            }
        )
        out = run_queries(q, d, CFG).to_pandas()
        return out if len(out) else pd.DataFrame(columns=["key", "score", "rank"])

    r = run("alpha bet*", 3)
    assert set(r["key"]) == {"u0", "u1", "u6"}
    # u6 has tf 2 -> top rank
    assert r.sort_values("rank")["key"].tolist()[0] == "u6"

    # expected idf_sum: alpha + ALL prefix members (betone df=3 incl u2,
    # bettwo df=2, betthree df=1) — replay the engine's frozen formula
    an = get_analyzer("en")
    toks = [an.tokenize(t) for t in docs["text"]]
    n = len(docs)
    dfs = {}
    for tt in toks:
        for t in set(tt):
            dfs[t] = dfs.get(t, 0) + 1
    members = ["alpha", "betone", "betthree", "bettwo"]
    idf_sum = float(sum(bm25_idf(np.array([dfs[t]]), n)[0] for t in members))
    avgdl = np.mean([len(tt) for tt in toks])
    u0 = r[r["key"] == "u0"]["score"].iloc[0]
    want = round6(
        idf_sum
        * bm25_tf_part(
            np.array([1.0]), np.array([float(len(toks[0]))]), avgdl, 1.2, 0.75
        )
    )[0]
    assert u0 == want

    # slop 0: strict adjacency only
    assert set(run("alpha bet*", 0)["key"]) == {"u0", "u6"}
    # prefix with no dictionary member -> empty slot, no matches
    assert len(run("alpha zzz*", 3)) == 0
    # plain span_term slots (no *) degrade to span_near semantics
    assert set(run("alpha betone", 3)["key"]) == {"u0", "u6"}
    # multi-token clause is a hard error
    with pytest.raises(ValueError, match="span_multi"):
        run_queries(
            pd.DataFrame(
                {
                    "query_id": np.array([0], dtype=np.int64),
                    "text": ["alpha o'two*"],
                    "type": ["span_multi"],
                    "slop": np.array([3], dtype=np.int64),
                }
            ),
            d,
            CFG,
        )


def test_span_multi_partition_invariant(ray_session, tmp_path_factory):
    """The global prefix expansion makes span_multi deterministic across
    shard layouts: 1-partition and 6-partition builds return identical
    (key, score) rankings."""
    import ray.data as rd

    from kafka_es_ray.query.engine import run_queries

    rng = np.random.default_rng(23)
    stems = ["prefab", "prefer", "prefix", "press", "other", "alpha"]
    texts = [
        " ".join(rng.choice(stems, size=rng.integers(4, 12)))
        for _ in range(60)
    ]
    docs = pd.DataFrame(
        {
            "url": [f"https://m.x/{i:03d}" for i in range(60)],
            "text": texts,
            "lang": ["en"] * 60,
        }
    )
    q = pd.DataFrame(
        {
            "query_id": np.array([0], dtype=np.int64),
            "text": ["alpha pre*"],
            "type": ["span_multi"],
            "slop": np.array([2], dtype=np.int64),
            "k": np.array([60], dtype=np.int64),
        }
    )
    outs = []
    for nparts in (1, 6):
        cfg = EngineConfig(num_partitions=nparts, index_positions=True)
        d = str(tmp_path_factory.mktemp(f"spanmp{nparts}"))
        build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
        out = run_queries(q, d, cfg).to_pandas()
        # within a score tie the rank order is doc_id (layout-dependent),
        # so the layout-invariant is the (key, score) MAP, not the order
        outs.append(
            out[["key", "score"]]
            .sort_values(["key"])
            .reset_index(drop=True)
        )
    assert len(outs[0]) > 0
    pd.testing.assert_frame_equal(outs[0], outs[1])
