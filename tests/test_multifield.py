"""Multi-field documents (cfg.text_fields): ES mapped text fields — the
reference's free-form JSON sources carry nested {"title":…, "body":…}
docs (JsonConverterTests.kt:110-115).  Each field gets its own postings
(prefixed terms), own length norm + avgdl; multi_match most_fields sums
per-field BM25.  Oracle here is a from-scratch numpy BM25 per field."""

import math

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.merge import merge_index
from kafka_es_ray.query.bm25 import round6
from kafka_es_ray.query.engine import IndexSearcher, run_queries

CFG = EngineConfig(num_partitions=2, text_fields=("title", "body"), index_positions=True)

DOCS = pd.DataFrame(
    {
        "url": [f"u{i}" for i in range(8)],
        "title": [
            "alpha report",
            "beta summary",
            "alpha beta notes",
            "zebra findings",        # 'zebra' appears ONLY in this title
            "gamma overview",
            "delta alpha digest",
            "notes on gamma",
            "beta beta beta",
        ],
        "body": [
            "alpha alpha text about things and stuff",
            "beta text with alpha mentions inside",
            "completely unrelated body content here",
            "body without the title animal at all",
            "gamma gamma gamma dense body",
            "short body",
            "gamma text and alpha text mixed together",
            "the last body mentions delta once",
        ],
        "lang": ["en"] * 8,
    }
)


def _tok(s: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _field_scores(docs: pd.DataFrame, field: str, qterms: list[str]) -> dict[str, float]:
    """round6 BM25 per key for one field (k1=1.2, b=0.75), absent terms
    dropped — the engine's per-field score contract."""
    toks = [_tok(t) for t in docs[field]]
    n = len(docs)
    dl = np.array([len(t) for t in toks], dtype=float)
    avgdl = dl.mean() if n else 1.0
    out: dict[str, float] = {}
    for i, key in enumerate(docs["url"]):
        sc = 0.0
        for term in sorted(set(qterms)):
            df = sum(term in set(t) for t in toks)
            if df == 0:
                continue
            tf = toks[i].count(term)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            sc += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl[i] / avgdl))
        if sc > 0:
            out[key] = float(round6(sc))
    return out


@pytest.fixture(scope="module")
def mf_index(ray_session, tmp_path_factory):
    import ray.data as rd

    idx = str(tmp_path_factory.mktemp("mfidx"))
    build_index(rd.from_pandas(DOCS), idx, CFG, text_col="body", html_col=None, ts_col=None)
    return idx


def test_title_only_match(mf_index):
    """A term present only in titles is found via field="title" and
    invisible to a body-scoped match (per-field postings are disjoint)."""
    s = IndexSearcher(mf_index, CFG)
    hit = s.search("zebra", field="title")
    assert hit["key"].tolist() == ["u3"]
    assert len(s.search("zebra", field="body")) == 0
    # and the reverse: a body-only word is invisible to title search
    assert len(s.search("unrelated", field="title")) == 0
    assert s.search("unrelated", field="body")["key"].tolist() == ["u2"]


@pytest.mark.parametrize("field", ["title", "body"])
@pytest.mark.parametrize("query", ["alpha", "beta notes", "gamma alpha", "zebra"])
def test_field_scores_match_manual_oracle(mf_index, field, query):
    s = IndexSearcher(mf_index, CFG)
    got = s.search(query, field=field, k=20)
    want = _field_scores(DOCS, field, _tok(query))
    assert dict(zip(got["key"], got["score"])) == want
    # determinism contract: score desc, doc_id asc
    assert got["score"].is_monotonic_decreasing


@pytest.mark.parametrize("query", ["alpha", "beta", "gamma alpha", "zebra body"])
def test_multi_match_sums_per_field(mf_index, query):
    """most_fields: score = round6(round6(title bm25) + round6(body bm25));
    ranked (score desc, doc_id asc)."""
    s = IndexSearcher(mf_index, CFG)
    got = s.multi_match(query, ["title", "body"], k=20)
    t = _field_scores(DOCS, "title", _tok(query))
    b = _field_scores(DOCS, "body", _tok(query))
    want = {
        k: float(round6(t.get(k, 0.0) + b.get(k, 0.0)))
        for k in set(t) | set(b)
    }
    assert dict(zip(got["key"], got["score"])) == want
    assert got["score"].is_monotonic_decreasing


def test_multi_match_field_boosts(mf_index, ray_session):
    """fields=['title^2','body']: the title field's round6'd BM25 is
    doubled before the most_fields sum (and before dis_max's max)."""
    from kafka_es_ray.query.engine import run_queries

    for qtype in ("multi_match", "dis_max"):
        queries = pd.DataFrame(
            {
                "query_id": [0],
                "text": ["gamma alpha"],
                "type": qtype,
                "fields": "title^2,body",
                "tie_breaker": 0.3,
                "k": 20,
            }
        )
        got = run_queries(queries, mf_index, CFG).to_pandas()
        t = _field_scores(DOCS, "title", _tok("gamma alpha"))
        b = _field_scores(DOCS, "body", _tok("gamma alpha"))
        want = {}
        for k_ in set(t) | set(b):
            bt, bb = 2.0 * t.get(k_, 0.0), b.get(k_, 0.0)
            if qtype == "multi_match":
                want[k_] = float(round6(bt + bb))
            else:
                want[k_] = float(round6(max(bt, bb) + 0.3 * min(bt, bb)))
        assert dict(zip(got["key"], got["score"])) == want, qtype


@pytest.mark.parametrize("tb", [0.0, 0.3, 1.0])
def test_dis_max_combines_best_field(mf_index, ray_session, tb):
    """dis_max: score = round6(best field + tb * other fields); tb=1.0
    degenerates to the most_fields sum."""
    from kafka_es_ray.query.engine import run_queries

    queries = pd.DataFrame(
        {
            "query_id": [0, 1],
            "text": ["alpha", "gamma alpha"],
            "type": "dis_max",
            "fields": "title,body",
            "tie_breaker": tb,
            "k": 20,
        }
    )
    got = run_queries(queries, mf_index, CFG).to_pandas()
    for qid, query in [(0, "alpha"), (1, "gamma alpha")]:
        t = _field_scores(DOCS, "title", _tok(query))
        b = _field_scores(DOCS, "body", _tok(query))
        want = {
            k: float(round6(
                max(t.get(k, 0.0), b.get(k, 0.0))
                + tb * min(t.get(k, 0.0), b.get(k, 0.0))
            ))
            for k in set(t) | set(b)
        }
        g = got[got["query_id"] == qid]
        assert dict(zip(g["key"], g["score"])) == want, (qid, tb)
        assert g["score"].is_monotonic_decreasing


def test_distributed_field_and_multi_match_parity(mf_index, ray_session):
    """run_queries (segments-as-Dataset path) reproduces the
    single-process field-scoped and multi_match results exactly."""
    import ray.data as rd

    s = IndexSearcher(mf_index, CFG)
    qs = pd.DataFrame(
        {
            "query_id": np.arange(5, dtype=np.int64),
            "text": ["alpha", "alpha", "zebra", "gamma alpha", "beta"],
            "type": ["match", "match", "match", "multi_match", "multi_match"],
            "field": ["title", "body", "title", None, None],
            "fields": [None, None, None, "title,body", "title,body"],
            "k": np.int32(20),
        }
    )
    out = run_queries(rd.from_pandas(qs), mf_index, CFG, concurrency=2).to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    expected = []
    for row in qs.itertuples(index=False):
        if row.type == "multi_match":
            r = s.multi_match(row.text, row.fields.split(","), k=int(row.k))
        else:
            r = s.search(row.text, field=row.field, k=int(row.k))
        r = r.assign(query_id=np.int64(row.query_id))
        expected.append(r)
    exp = (
        pd.concat(expected, ignore_index=True)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["query_id", "rank", "doc_id", "score"]].astype({"query_id": np.int64}),
        exp[["query_id", "rank", "doc_id", "score"]].astype({"query_id": np.int64}),
    )


def test_merge_preserves_field_norms(ray_session, tmp_path):
    """After merge_index the per-field length columns + avgdl_fields
    survive and every field/multi_match result is byte-identical."""
    import ray.data as rd

    idx = str(tmp_path / "mfmerge")
    build_index(rd.from_pandas(DOCS), idx, CFG, text_col="body", html_col=None, ts_col=None)
    s0 = IndexSearcher(idx, CFG)
    before = {
        q: (
            s0.search(q, field="title", k=20),
            s0.search(q, field="body", k=20),
            s0.multi_match(q, ["title", "body"], k=20),
        )
        for q in ["alpha", "gamma alpha", "zebra"]
    }
    merge_index(idx, merge_factor=2, cfg=CFG)
    s1 = IndexSearcher(idx, CFG)
    assert s1.avgdl_fields == s0.avgdl_fields
    for q, (t0, b0, m0) in before.items():
        pd.testing.assert_frame_equal(s1.search(q, field="title", k=20), t0)
        pd.testing.assert_frame_equal(s1.search(q, field="body", k=20), b0)
        pd.testing.assert_frame_equal(s1.multi_match(q, ["title", "body"], k=20), m0)


def test_field_scoped_phrase(mf_index):
    """match_phrase inside one mapped field: intra-field adjacency only —
    a phrase spanning the title/body boundary never matches, and the same
    word pair matches per field independently."""
    s = IndexSearcher(mf_index, CFG)
    # "alpha beta" adjacent in u2's title, nowhere adjacent in bodies
    hit = s.search_phrase("alpha beta", field="title")
    assert hit["key"].tolist() == ["u2"]
    assert len(s.search_phrase("alpha beta", field="body")) == 0
    # "gamma gamma" repeats inside u4's body
    assert s.search_phrase("gamma gamma", field="body")["key"].tolist() == ["u4"]
    # cross-field adjacency: u0 title ends "report", u0 body starts "alpha"
    # — the combined position stream makes them neighbours, but prefixed
    # terms keep them in different fields
    assert len(s.search_phrase("report alpha", field="title")) == 0
    assert len(s.search_phrase("report alpha", field="body")) == 0
    # slop window stays inside the field: "alpha notes" with slop 1
    # matches u2's title "alpha beta notes"
    assert s.search_phrase("alpha notes", field="title", slop=1)["key"].tolist() == ["u2"]
    assert len(s.search_phrase("alpha notes", field="title", slop=0)) == 0


def test_distributed_field_phrase_parity(mf_index, ray_session):
    import ray.data as rd

    s = IndexSearcher(mf_index, CFG)
    qs = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["alpha beta", "gamma gamma", "alpha notes"],
            "type": "phrase",
            "field": ["title", "body", "title"],
            "slop": [0, 0, 1],
            "k": 10,
        }
    )
    out = run_queries(rd.from_pandas(qs), mf_index, CFG, concurrency=2).to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = pd.concat(
        [
            s.search_phrase(r.text, field=r.field, slop=int(r.slop)).assign(
                query_id=np.int64(r.query_id)
            )
            for r in qs.itertuples(index=False)
        ],
        ignore_index=True,
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["query_id", "rank", "doc_id", "score"]].astype({"query_id": np.int64}),
        exp[["query_id", "rank", "doc_id", "score"]].astype({"query_id": np.int64}),
    )


def test_missing_field_column_treated_empty(ray_session, tmp_path):
    """A doc batch lacking one mapped field indexes it as empty (ES doc
    without the field) — no crash, zero-length norms."""
    import ray.data as rd

    docs = DOCS.drop(columns=["title"])
    idx = str(tmp_path / "mfmissing")
    build_index(rd.from_pandas(docs), idx, CFG, text_col="body", html_col=None, ts_col=None)
    s = IndexSearcher(idx, CFG)
    assert len(s.search("alpha", field="title")) == 0
    assert len(s.search("alpha", field="body")) > 0
    assert s.avgdl_fields["title"] == 1.0  # 0 coalesced to 1.0 guard


def _bm25f_scores(docs: pd.DataFrame, fields_w: list[tuple[str, float]], qterms: list[str]) -> dict[str, float]:
    """From-scratch BM25F oracle: blended tf/dl across weighted fields,
    idf from the cross-field UNION df, one BM25 per term, round6(sum)."""
    toks = {f: [_tok(t) for t in docs[f]] for f, _ in fields_w}
    n = len(docs)
    dl_c = np.zeros(n)
    for f, w in fields_w:
        dl_c += w * np.array([len(t) for t in toks[f]], dtype=float)
    avgdl_c = dl_c.mean() if n else 1.0
    out: dict[str, float] = {}
    for i, key in enumerate(docs["url"]):
        sc = 0.0
        for term in sorted(set(qterms)):
            df_u = sum(
                any(term in set(toks[f][j]) for f, _ in fields_w)
                for j in range(n)
            )
            if df_u == 0:
                continue
            ctf = sum(w * toks[f][i].count(term) for f, w in fields_w)
            if ctf == 0:
                continue
            idf = math.log(1 + (n - df_u + 0.5) / (df_u + 0.5))
            sc += idf * ctf * 2.2 / (ctf + 1.2 * (0.25 + 0.75 * dl_c[i] / avgdl_c))
        if sc > 0:
            out[key] = float(round6(sc))
    return out


@pytest.mark.parametrize(
    "query,fields",
    [
        ("alpha", ["title", "body"]),
        ("alpha beta", ["title^2", "body"]),
        ("gamma zebra", ["title^3", "body^0.5"]),
        ("delta", ["title", "body"]),
    ],
)
def test_combined_fields_bm25f_oracle(mf_index, query, fields):
    s = IndexSearcher(mf_index, CFG)
    got = s.combined_fields(query, fields, k=100)
    fw = []
    for f in fields:
        nm, _, w = f.partition("^")
        fw.append((nm, float(w) if w else 1.0))
    want = _bm25f_scores(DOCS, fw, query.split())
    assert dict(zip(got["key"], got["score"])) == want
    assert got["score"].is_monotonic_decreasing


def test_combined_fields_differs_from_most_fields(mf_index):
    """BM25F saturates tf ACROSS fields: a doc repeating the term in both
    fields scores differently than under per-field-sum most_fields."""
    s = IndexSearcher(mf_index, CFG)
    cf = s.combined_fields("alpha", ["title", "body"], k=100)
    mm = s.multi_match("alpha", ["title", "body"], k=100)
    assert dict(zip(cf["key"], cf["score"])) != dict(zip(mm["key"], mm["score"]))
    assert set(cf["key"]) == set(mm["key"])  # same match set


def test_combined_fields_unmapped_field_raises(mf_index):
    s = IndexSearcher(mf_index, CFG)
    with pytest.raises(ValueError):
        s.combined_fields("alpha", ["nope"], k=5)


def test_combined_fields_distributed_parity(mf_index, ray_session):
    """Distributed combined_fields (run_queries type=combined_fields,
    union-df stats pass + blended scoring per shard) == the
    single-process searcher, including per-field weights and plan
    dedup."""
    s = IndexSearcher(mf_index, CFG)
    qs = pd.DataFrame(
        {
            "query_id": np.arange(3, dtype=np.int64),
            "type": "combined_fields",
            "text": ["alpha", "alpha beta", "gamma zebra"],
            "fields": ["title^2,body"] * 3,
            "k": np.int32(100),
        }
    )
    out = run_queries(qs, mf_index, CFG, concurrency=2).to_pandas()
    for qid, text in [(0, "alpha"), (1, "alpha beta"), (2, "gamma zebra")]:
        want = s.combined_fields(text, ["title^2", "body"], k=100)
        g = out[out["query_id"] == qid].sort_values("rank")
        assert g["doc_id"].tolist() == want["doc_id"].tolist(), text
        assert g["score"].tolist() == want["score"].tolist(), text


def test_combined_fields_multi_index_equals_combined(ray_session, tmp_path_factory):
    """combined_fields over a split multi-index pair == the combined
    single index (global union-df and blended avgdl summed across
    indexes), by key."""
    import ray.data as rd

    base = tmp_path_factory.mktemp("cfmulti")
    d_all, d_e, d_o = str(base / "all"), str(base / "e"), str(base / "o")
    build_index(rd.from_pandas(DOCS), d_all, CFG, text_col="body", html_col=None, ts_col=None)
    build_index(rd.from_pandas(DOCS[DOCS.index % 2 == 0]), d_e, CFG, text_col="body", html_col=None, ts_col=None)
    build_index(rd.from_pandas(DOCS[DOCS.index % 2 == 1]), d_o, CFG, text_col="body", html_col=None, ts_col=None)
    qs = pd.DataFrame(
        {
            "query_id": np.int64([0]),
            "type": "combined_fields",
            "text": ["alpha beta"],
            "fields": "title^2,body",
            "k": np.int32(100),
        }
    )
    one = run_queries(qs, d_all, CFG, concurrency=2).to_pandas().sort_values("rank")
    two = run_queries(qs, [d_e, d_o], CFG, concurrency=2).to_pandas().sort_values("rank")
    assert one["key"].tolist() == two["key"].tolist()
    assert one["score"].tolist() == two["score"].tolist()


@pytest.mark.parametrize("query", ["alpha", "gamma alpha", "zebra body", "beta"])
def test_cross_fields_term_centric_oracle(mf_index, ray_session, query):
    """multi_match type=cross_fields: per term the BLENDED idf (max
    per-field df — Lucene BlendedTermQuery) x the best field's round6'd
    tf-part contribution; doc score = round6(sum over terms).  Distinct
    from most_fields whenever a term lives in both fields with different
    dfs."""
    from kafka_es_ray.query.engine import run_queries

    q = pd.DataFrame(
        {
            "query_id": np.int64([0]),
            "text": [query],
            "type": "cross_fields",
            "fields": "title,body",
            "k": np.int32(20),
        }
    )
    got = run_queries(q, mf_index, CFG).to_pandas()
    # from-scratch oracle
    n = len(DOCS)
    toks = {f: [_tok(t) for t in DOCS[f]] for f in ("title", "body")}
    dls = {f: np.array([len(t) for t in toks[f]], dtype=float) for f in toks}
    avg = {f: dls[f].mean() for f in toks}
    want: dict[str, float] = {}
    for i, key in enumerate(DOCS["url"]):
        total = 0.0
        for term in sorted(set(_tok(query))):
            bdf = max(
                sum(term in set(t) for t in toks[f]) for f in ("title", "body")
            )
            if bdf == 0:
                continue
            idf = math.log(1 + (n - bdf + 0.5) / (bdf + 0.5))
            best = None
            for f in ("title", "body"):
                tf = toks[f][i].count(term)
                if tf == 0:
                    continue
                c = float(round6(
                    idf * tf * 2.2
                    / (tf + 1.2 * (0.25 + 0.75 * dls[f][i] / avg[f]))
                ))
                best = c if best is None else max(best, c)
            if best is not None:
                total += best
        if total > 0:
            want[key] = float(round6(total))
    assert dict(zip(got["key"], got["score"])) == dict(
        sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    )


def test_cross_fields_differs_from_most_fields(mf_index, ray_session):
    """'alpha' lives in both fields with different dfs: most_fields SUMS
    the two per-field scores while cross_fields takes the best — the
    rankings must reflect that."""
    from kafka_es_ray.query.engine import run_queries

    base = {"query_id": np.int64([0]), "text": ["alpha"],
            "fields": "title,body", "k": np.int32(20)}
    xf = run_queries(
        pd.DataFrame({**base, "type": "cross_fields"}), mf_index, CFG
    ).to_pandas()
    mm = run_queries(
        pd.DataFrame({**base, "type": "multi_match"}), mf_index, CFG
    ).to_pandas()
    x = dict(zip(xf["key"], xf["score"]))
    m = dict(zip(mm["key"], mm["score"]))
    assert set(x) == set(m)  # same match set (alpha anywhere)
    # doc u0 has alpha in BOTH fields: most_fields strictly higher there
    assert m["u0"] > x["u0"]
