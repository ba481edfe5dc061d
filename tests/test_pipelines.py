"""Driver-style oracle parity in pytest (sf0.001) + rows-only pipeline
sanity.  The standalone sweep lives in tools/check_oracle.py; this keeps
a fast subset green in CI."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from tools.check_oracle import canon, to_pandas

SF = "/root/testdata/sf0.001"
SQL_SUBSET = [
    "bm25_topk",
    "bm25_topk_and",
    "lineitem_agg",
    "topk_orders",
    "ngram_jaccard",
    "doc_token_counts",
    "term_df",
    "exact_dedup",
    "lww_events",
    "window_events",
    "broadcast_lookup",
    "ann_cosine_topk",
    "doc_fingerprint",
    "lang_stats",
    "doc_quality",
    "distinct_users",
    "simhash",
    "lang_id",
    "tfidf_top_terms",
    "dedup_clusters",
    "prefix_count",
    "wildcard_count",
    "fuzzy_count",
    "search_after_topk",
    "sessionize_events",
    "gopher_quality",
    "regexp_count",
    "contamination",
    "percolate",
    "stratified_sample",
    "train_holdout",
    "pii_scan",
    "chunk_documents",
    "line_dedup",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", SQL_SUBSET)
def test_sql_oracle_parity(ray_session, con, name):
    mine = canon(to_pandas(entrymod.queries()[name](SF)))
    oracle = canon(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    for c in mine.columns:
        if mine[c].dtype == "float64":
            assert np.array_equal(mine[c].to_numpy(), oracle[c].to_numpy()), c
        else:
            assert mine[c].equals(oracle[c]), c


def test_rows_only_pipelines_run(ray_session):
    qs = entrymod.queries()
    for name in ("minhash_dups", "embedding_neardup", "media_features"):
        res = to_pandas(qs[name](SF))
        assert len(res) > 0, name


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = to_pandas(res)
    assert len(df) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}


def test_gopher_stats_handcrafted(ray_session):
    """GopherStatsStage on hand-crafted repetition cases: a clean doc, a
    single-word spam doc (word_rep = 1), a repeated-bigram doc, and a
    too-short doc — each rule fires exactly where intended."""
    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import gopher_quality

    clean = " ".join(f"w{i:02d}" for i in range(30))           # 30 distinct words
    spam = " ".join(["buy"] * 40)                              # one word repeated
    bigram = " ".join(["click here"] * 20)                     # one bigram repeated
    short = "too short"
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": [clean, spam, bigram, short]}
    )
    out = (
        gopher_quality(rd.from_pandas(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_words"].tolist() == [30, 40, 40, 2]
    r = out.set_index("doc_id")
    assert r.loc[1, "keep"] == 1
    assert r.loc[1, "max_word_rep_frac"] == np.floor(1 / 30 * 1e6 + 0.5) / 1e6
    # spam: every word identical -> rep frac 1, top bigram covers all chars
    assert r.loc[2, "max_word_rep_frac"] == 1.0
    assert r.loc[2, "top2gram_frac"] == np.floor(39 * 6 / 120 * 1e6 + 0.5) / 1e6
    assert r.loc[2, "keep"] == 0
    # bigram doc: "click here" x20 -> top bigram (click,here) c=20, chars 9/ (20*9)=1? chars: click(5)+here(4)=9, total=20*9=180, frac=20*9/180=1.0
    assert r.loc[3, "top2gram_frac"] == 1.0 and r.loc[3, "keep"] == 0
    # short doc fails the word-count floor
    assert r.loc[4, "keep"] == 0
    assert r.loc[4, "mean_word_len"] == np.floor(8 / 2 * 1e6 + 0.5) / 1e6


def test_rank_eval_hand_computed():
    """rank_eval metrics against hand-computed values: relevant at ranks
    2 and 5 of 5 retrieved, 3 relevant total; plus the degenerate
    no-relevant and no-retrieved queries."""
    from kafka_es_ray.query.rank_eval import rank_eval

    run = pd.DataFrame(
        {
            "query_id": [0] * 5 + [1] * 3,
            "rank": [1, 2, 3, 4, 5, 1, 2, 3],
            "doc_id": [10, 11, 12, 13, 14, 20, 21, 22],
        }
    )
    qrels = pd.DataFrame(
        {"query_id": [0, 0, 0, 2], "doc_id": [11, 14, 99, 30]}
    )
    out = rank_eval(run, qrels, k=10).set_index("query_id")
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    assert out.loc[0, "precision"] == r6(2 / 5)
    assert out.loc[0, "recall"] == r6(2 / 3)
    assert out.loc[0, "mrr"] == r6(1 / 2)
    dcg = 1 / np.log2(3) + 1 / np.log2(6)
    idcg = 1 / np.log2(2) + 1 / np.log2(3) + 1 / np.log2(4)
    assert out.loc[0, "ndcg"] == r6(dcg / idcg)
    # query 1: retrieved but nothing relevant
    assert (out.loc[1, ["precision", "recall", "mrr", "ndcg"]] == 0).all()
    # query 2: relevant docs but nothing retrieved
    assert out.loc[2, "n_retrieved"] == 0 and out.loc[2, "n_relevant"] == 1
    assert (out.loc[2, ["precision", "recall", "mrr", "ndcg"]] == 0).all()


def test_chunking_covers_and_overlaps(ray_session):
    """Every token is covered, consecutive chunks overlap by size-stride,
    short docs yield exactly one chunk, and the early-stop rule emits no
    redundant tail."""
    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import chunk_documents

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                " ".join(f"w{i}" for i in range(25)),  # 25 toks: windows at 0,8,16
                " ".join(f"w{i}" for i in range(10)),  # size>n: one chunk
                " ".join(f"w{i}" for i in range(16)),  # size==n: one chunk
            ],
        }
    )
    out = (
        chunk_documents(rd.from_pandas(docs), size=16, stride=8)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    g1 = out[out["doc_id"] == 1]
    assert g1["chunk_idx"].tolist() == [0, 1, 2]
    assert g1["n_tokens"].tolist() == [16, 16, 9]
    assert g1["chunk"].iloc[0].split()[:8] != g1["chunk"].iloc[1].split()[:8]
    assert g1["chunk"].iloc[0].split()[8:] == g1["chunk"].iloc[1].split()[:8]  # overlap
    covered = set()
    for c in g1["chunk"]:
        covered.update(c.split())
    assert covered == {f"w{i}" for i in range(25)}
    assert out[out["doc_id"] == 2]["n_tokens"].tolist() == [10]
    assert out[out["doc_id"] == 3]["n_tokens"].tolist() == [16]


def test_pii_scan_handcrafted(ray_session):
    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import pii_scan

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "mail me at jo.doe+x@mail.example.org today",
                "server 192.168.1.10 and backup 10.0.0.2",
                "two mails a@b.io and c.d@e-f.co plus 8.8.8.8",
                "nothing sensitive here",
            ],
        }
    )
    out = pii_scan(rd.from_pandas(docs)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_emails"].tolist() == [1, 0, 2, 0]
    assert out["n_ips"].tolist() == [0, 2, 1, 0]
    assert out.loc[0, "redacted"] == "mail me at [EMAIL] today"
    assert out.loc[1, "redacted"] == "server [IP] and backup [IP]"
    assert out.loc[2, "redacted"] == "two mails [EMAIL] and [EMAIL] plus [IP]"
    assert out.loc[3, "redacted"] == "nothing sensitive here"


def test_sampling_deterministic_and_partition_invariant(ray_session):
    """Hash-based sampling: the kept set is identical across runs AND
    across different partitionings (the no-RNG property that makes the
    split leakage-safe), and group rates are approximately honored."""
    import ray.data as rd

    from kafka_es_ray.pipelines.sampling import stratified_sample, train_holdout_split

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4000, dtype=np.int64),
            "lang": np.where(np.arange(4000) % 2 == 0, "en", "de"),
        }
    )
    rates = {"en": 0.25, "de": 0.75}
    a = stratified_sample(rd.from_pandas(df), rates).to_pandas()
    b = stratified_sample(rd.from_pandas(df).repartition(13), rates).to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])
    for g, r in rates.items():
        frac = (a["lang"] == g).sum() / 2000
        assert abs(frac - r) < 0.05, (g, frac)
    s1 = train_holdout_split(rd.from_pandas(df), 0.1).to_pandas()
    s2 = train_holdout_split(rd.from_pandas(df).repartition(7), 0.1).to_pandas()
    m1 = dict(zip(s1["doc_id"], s1["split"]))
    m2 = dict(zip(s2["doc_id"], s2["split"]))
    assert m1 == m2
    hf = sum(v == "holdout" for v in m1.values()) / 4000
    assert abs(hf - 0.1) < 0.03


def test_percolate_handcrafted(ray_session):
    """percolate: or-queries match on any term, and-queries on all terms,
    unanalyzable queries match nothing."""
    import ray.data as rd

    from kafka_es_ray.pipelines.fulltext import percolate

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta gamma", "alpha only here", "delta epsilon"],
        }
    )
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "text": ["alpha", "alpha beta", "alpha beta", "!!!"],
            "operator": ["or", "or", "and", "or"],
        }
    )
    out = (
        percolate(rd.from_pandas(docs), queries)
        .to_pandas()
        .sort_values(["doc_id", "query_id"])
        .reset_index(drop=True)
    )
    pairs = set(zip(out["doc_id"], out["query_id"]))
    assert pairs == {(1, 0), (1, 1), (1, 2), (2, 0), (2, 1)}


def test_contamination_planted_leak(ray_session):
    """contamination_check flags exactly the training doc that quotes a
    benchmark 4-gram (and counts distinct shared grams, not occurrences)."""
    import ray.data as rd

    from kafka_es_ray.pipelines.dedup_ops import contamination_check

    bench = pd.DataFrame(
        {"doc_id": [100], "text": ["the quick brown fox jumps over the lazy dog"]}
    )
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                # quotes 'quick brown fox jumps' TWICE -> 1 distinct shared
                "he said quick brown fox jumps and again quick brown fox jumps",
                "totally unrelated words about ray data pipelines here",
                # shares two DISTINCT benchmark 4-grams
                "over the lazy dog is how the quick brown fox story ends",
            ],
        }
    )
    out = (
        contamination_check(rd.from_pandas(train), rd.from_pandas(bench), n=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [1, 0, 1]
    assert out.loc[0, "n_shared"] == 1  # duplicates counted once
    assert out.loc[2, "n_shared"] == 2  # 'over the lazy dog', 'the quick brown fox'


def test_minhash_finds_planted_neardups(ray_session):
    """Plant near-duplicate docs; MinHash+LSH must surface the pair with
    high Jaccard."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.dedup_ops import minhash_dedup

    base = " ".join(f"tok{i}" for i in range(200))
    near = " ".join(f"tok{i}" for i in range(199)) + " tokX"
    other = " ".join(f"zzz{i}" for i in range(200))
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, other]})
    out = to_pandas(minhash_dedup(rd.from_pandas(docs), threshold=0.5))
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_minhash_stage_vectorized_token_identical():
    """The round-4 vectorized MinHashStage.__call__ (flat shingle stream +
    minimum.reduceat) emits byte-identical (band_id, band_hash, doc_id)
    rows to the per-row signature() path, including empty / short /
    unicode docs and across the internal chunk boundary."""
    import pandas as pd

    from kafka_es_ray.functions.hashing import stable_hash64
    from kafka_es_ray.pipelines.dedup_ops import MinHashStage

    rng = np.random.default_rng(11)
    words = np.array(["alpha", "beta", "gamma", "delta", "Héllo", "wörld", "x9"])
    texts = [" ".join(rng.choice(words, int(n))) for n in rng.integers(0, 50, 150)]
    texts += ["", "one", "one two", None, "übermäßig groß straße " * 4]
    batch = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": pd.Series(texts, dtype=object)}
    )
    st = MinHashStage()
    st._CHUNK_SHINGLES = 64  # force many affine chunks
    got = st(batch).reset_index(drop=True)
    doc_ids, bands, hashes = [], [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        sig = st.signature(text)
        if sig is None:
            continue
        bm = sig.reshape(st.bands, st.rows_per_band)
        bh = stable_hash64(np.array([b.tobytes() for b in bm], dtype=object))
        doc_ids += [int(doc_id)] * st.bands
        bands += list(range(st.bands))
        hashes += bh.tolist()
    want = pd.DataFrame(
        {
            "band_id": pd.Series(bands, dtype=np.int32),
            "band_hash": pd.Series(hashes, dtype=np.uint64),
            "doc_id": pd.Series(doc_ids, dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, want)


def test_lsh_ann_recall(ray_session):
    """LSH-bucketed ANN returns a subset of brute force with decent
    recall on clustered data."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.ann import cosine_topk, lsh_cosine_topk

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((4, 32))
    vecs = np.concatenate([c + 0.05 * rng.standard_normal((50, 32)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64), "embedding": list(vecs.astype(np.float32))})
    qids = np.array([0, 50])
    qm = vecs[qids]
    exact = to_pandas(cosine_topk(rd.from_pandas(df), qids, qm, k=10))
    approx = to_pandas(lsh_cosine_topk(rd.from_pandas(df), qids, qm, k=10, nbits=2))
    recalls = []
    for q in qids:
        e = set(exact[exact["query_vec_id"] == q]["vec_id"])
        a = set(approx[approx["query_vec_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # LSH is approximate: a cluster straddling a bucket boundary loses
    # members — require useful average recall, not perfection
    assert np.mean(recalls) >= 0.5, recalls


def test_minhash_degenerate_corpus_capped(ray_session):
    """1k identical docs: every band bucket is one 1000-doc hot bucket;
    the hot-bucket cap must keep the candidate-pair count ~C(200,2), not
    explode to C(1000,2) per band."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.dedup_ops import minhash_candidates

    docs = pd.DataFrame(
        {
            "doc_id": range(1000),
            "text": ["the same boilerplate text repeated verbatim"] * 1000,
        }
    )
    pairs = minhash_candidates(rd.from_pandas(docs)).to_pandas()
    assert 0 < len(pairs) <= 200 * 199 // 2


def test_semdedup_recall_vs_exact(ray_session):
    """SemDeDup (cluster-then-compare) recovers most exact pairs on a
    clustered corpus, and every emitted pair is a true pair."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.dedup_ops import embedding_neardup_exact, semdedup

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((10, 32))
    vecs = np.concatenate([c + 0.02 * rng.standard_normal((20, 32)) for c in centers])
    df = pd.DataFrame(
        {"vec_id": np.arange(200, dtype=np.int64), "embedding": list(vecs.astype(np.float32))}
    )
    exact = to_pandas(embedding_neardup_exact(rd.from_pandas(df), threshold=0.9))
    approx = to_pandas(semdedup(rd.from_pandas(df), threshold=0.9, nlist=8))
    e = set(zip(exact["vec_a"], exact["vec_b"]))
    a = set(zip(approx["vec_a"], approx["vec_b"]))
    assert a <= e  # within-cluster sims are the same rounded values
    assert len(e & a) / max(1, len(e)) >= 0.8, (len(e), len(a), len(e & a))


def test_embedding_neardup_recall_vs_exact(ray_session):
    """The LSH-bucketed near-dup path must recover most high-cosine pairs
    the exact all-pairs oracle finds (clustered vectors, threshold .9)."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.dedup_ops import embedding_neardup, embedding_neardup_exact

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((10, 32))
    vecs = np.concatenate([c + 0.02 * rng.standard_normal((20, 32)) for c in centers])
    df = pd.DataFrame(
        {"vec_id": np.arange(200, dtype=np.int64), "embedding": list(vecs.astype(np.float32))}
    )
    exact = to_pandas(embedding_neardup_exact(rd.from_pandas(df), threshold=0.9))
    approx = to_pandas(embedding_neardup(rd.from_pandas(df), threshold=0.9))
    e = set(zip(exact["vec_a"], exact["vec_b"]))
    a = set(zip(approx["vec_a"], approx["vec_b"]))
    assert a <= e or all(  # every approx pair must be a true pair (same rounding)
        abs(s - 0.9) < 1e-6 for s in approx[~approx.set_index(["vec_a", "vec_b"]).index.isin(e)]["sim"]
    )
    assert len(e & a) / max(1, len(e)) >= 0.7, (len(e), len(a), len(e & a))


def test_ivf_ann_recall(ray_session):
    """IVF (spherical-kmeans coarse quantizer) ANN: subset of brute force
    with high recall on clustered data at nprobe=4."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.ann import cosine_topk, ivf_cosine_topk

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((6, 32))
    vecs = np.concatenate([c + 0.05 * rng.standard_normal((40, 32)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(240, dtype=np.int64), "embedding": list(vecs.astype(np.float32))})
    qids = np.array([0, 40, 80])
    qm = vecs[qids]
    exact = to_pandas(cosine_topk(rd.from_pandas(df), qids, qm, k=10))
    approx = to_pandas(ivf_cosine_topk(rd.from_pandas(df), qids, qm, k=10, nlist=12, nprobe=4, train_size=240))
    recalls = []
    for q in qids:
        e = set(exact[exact["query_vec_id"] == q]["vec_id"])
        a = set(approx[approx["query_vec_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


def test_sq8_ann_recall(ray_session):
    """int8 scalar-quantized cosine top-k: near-exact recall (the 8-bit
    grid perturbs sims by ~1e-2 relative at most)."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.ann import cosine_topk, sq8_cosine_topk

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((300, 32))
    df = pd.DataFrame(
        {"vec_id": np.arange(300, dtype=np.int64), "embedding": list(vecs.astype(np.float32))}
    )
    qids = np.array([1, 100, 200])
    qm = vecs[qids]
    exact = to_pandas(cosine_topk(rd.from_pandas(df), qids, qm, k=10))
    sq8 = to_pandas(sq8_cosine_topk(rd.from_pandas(df), qids, qm, k=10))
    recalls = []
    for q in qids:
        e = set(exact[exact["query_vec_id"] == q]["vec_id"])
        a = set(sq8[sq8["query_vec_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls
    # sims from codes stay within the 8-bit grid's error of the exact sims
    j = exact.merge(sq8, on=["query_vec_id", "vec_id"], suffixes=("_e", "_q"))
    assert (np.abs(j["sim_e"] - j["sim_q"]) <= 0.02).all()


def test_props_json_agg_matches_pandas(ray_session):
    """props_json_agg == a plain-pandas json parse + groupby, including
    whitespace/key-order variants a regex scrape would miss."""
    import json

    import ray.data as rd

    from kafka_es_ray.pipelines.relational import props_json_agg

    df = pd.DataFrame(
        {
            "event_type": ["a", "b", "a", "b", "a", "c"],
            "props": [
                '{"k": 3}',
                '{ "k" : 10 }',          # whitespace
                '{"other": 1, "k": 7}',  # key order
                '{"k": 0}',
                '{"k": 100}',
                '{"k": 5}',
            ],
        }
    )
    got = props_json_agg(rd.from_pandas(df))
    want = (
        df.assign(k=[json.loads(p)["k"] for p in df["props"]])
        .groupby("event_type", as_index=False)
        .agg(n_events=("k", "size"), sum_k=("k", "sum"))
    )
    want["avg_k"] = (want["sum_k"] / want["n_events"]).round(6)
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["sum_k"].tolist() == want["sum_k"].tolist()
    assert got["avg_k"].tolist() == want["avg_k"].tolist()


def test_dup_ngram_stats_handcrafted(ray_session):
    """DupNgramStage n=3 on hand-built repetition: a doc with one
    repeated trigram, a fully-repetitive doc, a clean doc, and a doc
    shorter than n (zeros)."""
    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import dup_ngram_stats

    rep = "a b c x a b c"            # trigram "a b c" at 0 and 4
    loop = "p q p q p q p q"         # every trigram repeats
    clean = "one two three four five"
    tiny = "just two"
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": [rep, loop, clean, tiny]}
    )
    out = (
        dup_ngram_stats(rd.from_pandas(docs), n=3)
        .to_pandas().sort_values("doc_id").set_index("doc_id")
    )
    # rep: 5 windows, 2 duplicate occurrences; coverage 0..2 and 4..6 = 6 of 7
    assert out.loc[1, "n_windows"] == 5
    assert out.loc[1, "dup_ngram_frac"] == np.floor(2 / 5 * 1e6 + 0.5) / 1e6
    assert out.loc[1, "dup_cover_frac"] == np.floor(6 / 7 * 1e6 + 0.5) / 1e6
    # loop: all 6 windows are "p q p"/"q p q" repeats; full coverage
    assert out.loc[2, "dup_ngram_frac"] == 1.0
    assert out.loc[2, "dup_cover_frac"] == 1.0
    assert out.loc[3, "dup_ngram_frac"] == 0.0
    assert out.loc[4, "n_windows"] == 0
    assert out.loc[4, "dup_ngram_frac"] == 0.0 and out.loc[4, "dup_cover_frac"] == 0.0


def test_cross_doc_ngram_dups_handcrafted(ray_session):
    """cross_doc_ngram_dups n=3: a trigram shared by two docs marks both
    docs' overlapping windows; within-doc-only repeats do NOT count; a
    short doc is absent from the output."""
    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import cross_doc_ngram_dups

    d1 = "alpha beta gamma delta"        # windows: abg, bgd
    d2 = "zz alpha beta gamma yy"        # shares "alpha beta gamma"
    d3 = "m n m n m n"                   # self-repeats only
    d4 = "too short"                     # no window
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": [d1, d2, d3, d4]}
    )
    out = (
        cross_doc_ngram_dups(rd.from_pandas(docs), n=3)
        .to_pandas().sort_values("doc_id").set_index("doc_id")
    )
    assert sorted(out.index) == [1, 2, 3]          # doc 4 has no windows
    assert out.loc[1, "n_windows"] == 2 and out.loc[1, "n_dup_windows"] == 1
    assert out.loc[2, "n_windows"] == 3 and out.loc[2, "n_dup_windows"] == 1
    # doc 3: "m n m" x2 + "n m n" x2 repeat only within the doc -> 0
    assert out.loc[3, "n_windows"] == 4 and out.loc[3, "n_dup_windows"] == 0
    assert out.loc[1, "dup_frac"] == 0.5


def test_cross_doc_ngram_partition_invariance(ray_session):
    """The cross-doc verdict must not depend on how docs are batched:
    1-row blocks == one block."""
    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import cross_doc_ngram_dups

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=16)) for _ in range(24)]
    docs = pd.DataFrame({"doc_id": np.arange(24, dtype=np.int64), "text": texts})
    a = (
        cross_doc_ngram_dups(rd.from_pandas(docs), n=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        cross_doc_ngram_dups(rd.from_pandas(docs).repartition(24), n=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_dup_windows"] > 0).any()  # the random corpus does collide


def test_lm_score_matches_bruteforce(ray_session):
    """lm_score == brute-force corpus-MLE mean log-likelihood, invariant
    to batching; empty docs omitted."""
    import ray.data as rd

    from kafka_es_ray.functions.tokenizer import get_analyzer
    from kafka_es_ray.pipelines.text_ops import lm_score

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "the cat sat on the mat",
                "the dog sat",
                "rare words zyzzyva",
                "",                       # zero tokens -> omitted
                "the the the",
            ],
        }
    )
    an = get_analyzer("en")
    toks = [an.tokenize(t) for t in docs["text"]]
    from collections import Counter

    cnt = Counter(t for tt in toks for t in tt)
    total = sum(cnt.values())
    got = (
        lm_score(rd.from_pandas(docs).repartition(3))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1, 2, 4]
    for _, row in got.iterrows():
        tt = toks[int(row["doc_id"])]
        want = np.mean([np.log(cnt[t] / total) for t in tt])
        assert row["n_tokens"] == len(tt)
        assert abs(row["lm_logprob"] - want) < 1e-5, row["doc_id"]
    # the common-token doc scores higher than the rare-token doc
    by = got.set_index("doc_id")["lm_logprob"]
    assert by[4] > by[2]


def test_pack_sequences_prefix_sum(ray_session):
    """Packing offsets == a serial prefix sum in doc_id order regardless
    of partitioning; straddle counts follow from the window arithmetic."""
    import ray.data as rd

    from kafka_es_ray.functions.tokenizer import get_analyzer
    from kafka_es_ray.pipelines.text_ops import pack_training_sequences

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab, size=rng.integers(1, 30)))
                     for _ in range(40)],
        }
    )
    docs.loc[7, "text"] = ""  # zero-token doc -> omitted
    an = get_analyzer("en")
    n = docs["text"].map(lambda t: len(an.tokenize(t))).to_numpy(np.int64)
    got = (
        pack_training_sequences(rd.from_pandas(docs).repartition(7), capacity=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    start = np.cumsum(n) - n
    keep = n > 0
    assert got["doc_id"].tolist() == docs["doc_id"].to_numpy()[keep].tolist()
    assert got["start_offset"].tolist() == start[keep].tolist()
    assert got["first_seq"].tolist() == (start[keep] // 16).tolist()
    assert got["last_seq"].tolist() == ((start[keep] + n[keep] - 1) // 16).tolist()
    # a doc longer than capacity straddles > 1 window somewhere
    assert (got["last_seq"] > got["first_seq"]).any()


def test_mix_epochs_weighting(ray_session):
    """Weight 3.0 -> exactly 3 copies (epochs 0..2); 0.0 -> dropped;
    fractional part hash-decided and partition-invariant."""
    import ray.data as rd

    from kafka_es_ray.pipelines.sampling import mix_epochs

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(300, dtype=np.int64),
            "source": ["a"] * 100 + ["b"] * 100 + ["c"] * 100,
        }
    )
    w = {"a": 3.0, "b": 0.5, "c": 0.0}
    got = (
        mix_epochs(rd.from_pandas(docs), w)
        .to_pandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    )
    a = got[got["source"] == "a"]
    assert len(a) == 300 and a.groupby("doc_id")["epoch"].apply(list).map(
        lambda e: e == [0, 1, 2]
    ).all()
    b = got[got["source"] == "b"]
    assert 20 < len(b) < 80 and (b["epoch"] == 0).all()  # ~50% of 100
    assert (got["source"] != "c").all()
    # partition invariance
    again = (
        mix_epochs(rd.from_pandas(docs).repartition(13), w)
        .to_pandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)


def test_cumulative_cardinality_exact(ray_session):
    """cumulative_cardinality == the pandas first-appearance identity:
    cum_distinct(t) = |users whose first month <= t|; a month whose
    users ALL appeared earlier still gets a row (n_new=0, flat cumsum);
    result invariant to input partitioning."""
    import ray.data as rd

    from kafka_es_ray.pipelines.relational import cumulative_cardinality

    # months: Jan(u1,u2) Feb(u2) Mar(u3,u1) Apr(u2,u3) -> new 2,0,1,0
    ts = pd.to_datetime(
        [
            "2024-01-05", "2024-01-20", "2024-02-10",
            "2024-03-01", "2024-03-30", "2024-04-02", "2024-04-28",
        ]
    )
    ev = pd.DataFrame({"ts": ts, "user_id": np.int64([1, 2, 2, 3, 1, 2, 3])})
    got = cumulative_cardinality(rd.from_pandas(ev))
    months = (
        ts.to_numpy().astype("datetime64[M]").astype("datetime64[s]")
        .astype(np.int64)
    )
    assert got["bucket_ts"].tolist() == sorted(set(months.tolist()))
    assert got["n_new"].tolist() == [2, 0, 1, 0]
    assert got["cum_distinct"].tolist() == [2, 2, 3, 3]
    # partition-invariance: many small blocks, same answer
    again = cumulative_cardinality(rd.from_pandas(ev).repartition(5))
    pd.testing.assert_frame_equal(got, again)
    # empty input contract
    empty = cumulative_cardinality(rd.from_pandas(ev.iloc[:0]))
    assert len(empty) == 0 and list(empty.columns) == [
        "bucket_ts", "n_new", "cum_distinct",
    ]


def test_frequent_token_pairs(ray_session):
    """frequent_token_pairs == brute-force pair supports; the Apriori
    df-prune never drops a frequent pair; partition-invariant; empty
    when nothing reaches min_support."""
    from itertools import combinations

    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import frequent_token_pairs

    rng = np.random.default_rng(3)
    words = ["ale", "bun", "cod", "dip", "elk", "fig"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "text": [
                " ".join(rng.choice(words, size=rng.integers(2, 5)).tolist())
                for _ in range(200)
            ],
        }
    )
    got = frequent_token_pairs(rd.from_pandas(docs), min_support=15, k=50)
    support = {}
    for t in docs["text"]:
        for a, b in combinations(sorted(set(t.split())), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    want = sorted(
        ((n, a, b) for (a, b), n in support.items() if n >= 15),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:50]
    assert list(zip(got["support"], got["t1"], got["t2"])) == want
    assert got["rank"].tolist() == list(range(1, len(want) + 1))
    again = frequent_token_pairs(
        rd.from_pandas(docs).repartition(7), min_support=15, k=50
    )
    pd.testing.assert_frame_equal(got, again)
    none = frequent_token_pairs(rd.from_pandas(docs), min_support=10**6)
    assert len(none) == 0 and list(none.columns) == ["rank", "t1", "t2", "support"]


def test_embedding_kmeans(ray_session):
    """embedding_kmeans: assignment == argmax cosine against the trained
    centroids (recomputed serially), partition-invariant, sim round6'd,
    planted clusters recovered."""
    import ray.data as rd

    from kafka_es_ray.pipelines.ann import _kmeans_spherical, _normalize, embedding_kmeans

    rng = np.random.default_rng(11)
    # three planted directions + noise
    base = _normalize(rng.normal(size=(3, 16)))
    vecs = []
    for i in range(240):
        v = base[i % 3] + 0.05 * rng.normal(size=16)
        vecs.append(v.astype(np.float64))
    emb = pd.DataFrame({"vec_id": np.arange(240, dtype=np.int64), "embedding": vecs})
    got = (
        embedding_kmeans(rd.from_pandas(emb), k=3, train_size=240)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # serial reference: same training prefix, same seed
    cent = _kmeans_spherical(_normalize(np.stack(emb["embedding"])), 3)
    m = _normalize(np.stack(emb["embedding"]))
    sims = m @ cent.T
    want = np.argmax(sims, axis=1)
    assert got["cluster"].tolist() == want.tolist()
    np.testing.assert_allclose(
        got["sim"], np.floor(sims[np.arange(240), want] * 1e6 + 0.5) / 1e6
    )
    # planted structure: members of one planted direction share a cluster
    for j in range(3):
        members = got["cluster"][j::3]
        assert members.nunique() == 1, j
    again = (
        embedding_kmeans(rd.from_pandas(emb).repartition(2), k=3, train_size=240)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # NOTE: training reads limit(train_size) == the whole set here, so
    # the centroids are partition-independent and assignments match
    pd.testing.assert_frame_equal(got, again)


def test_quality_classifier_handcrafted(ray_session):
    """Frozen-weight classifier: score == sigmoid over the documented
    features computed by hand; digit-heavy docs score low, stopword-rich
    prose scores high; empty docs omitted; partition-invariant."""
    import math

    import ray.data as rd

    from kafka_es_ray.functions.tokenizer import ENGLISH_STOPWORDS, get_analyzer
    from kafka_es_ray.pipelines.text_ops import quality_classifier

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "the cat sat on the mat and it was a good day for all",
                "42 7 999 12345 8 0 3 77",
                "",
                "mixed 12 words with the 9 numbers in it",
            ],
        }
    )
    an = get_analyzer("en")

    def expect(text):
        ts = an.tokenize(text)
        if not ts:
            return None
        n = len(ts)
        f1 = math.log1p(n)
        f2 = sum(map(len, ts)) / n
        f3 = sum(t in ENGLISH_STOPWORDS for t in ts) / n
        f4 = sum(t.isdigit() for t in ts) / n
        z = -2.0 + 0.6 * f1 + 0.1 * f2 + 2.0 * f3 - 3.0 * f4
        return math.floor(1 / (1 + math.exp(-z)) * 1e6 + 0.5) / 1e6

    got = (
        quality_classifier(rd.from_pandas(docs).repartition(3))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1, 3]
    for r in got.itertuples():
        e = expect(docs["text"][r.doc_id])
        assert abs(r.quality - e) < 1e-9, r.doc_id
        assert r.keep == (r.quality >= 0.5)
    # prose beats digit spam
    q = dict(zip(got["doc_id"], got["quality"]))
    assert q[0] > 0.5 > q[1]


def test_lm_quality_buckets_cutoffs(ray_session):
    """Bucketing is a pure function of the round6 lm score and the fixed
    cutoffs; every lm_score row appears with its bucket."""
    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import lm_quality_buckets, lm_score

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "common common common common",
                "common rare1",
                "rare2 rare3 rare4",
                "common common rare5",
            ],
        }
    )
    base = (
        lm_score(rd.from_pandas(docs))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    lo, hi = float(base["lm_logprob"].min()), float(base["lm_logprob"].max())
    mid1, mid2 = lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3
    got = (
        lm_quality_buckets(rd.from_pandas(docs).repartition(2), (mid1, mid2))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got[["doc_id", "n_tokens", "lm_logprob"]].equals(
        base[["doc_id", "n_tokens", "lm_logprob"]]
    )
    for r in got.itertuples():
        want = (
            "head" if r.lm_logprob > mid2
            else ("middle" if r.lm_logprob > mid1 else "tail")
        )
        assert r.bucket == want
    assert set(got["bucket"]) == {"head", "middle", "tail"}


def test_top_quality_fraction_exact_selection(ray_session):
    """keep_n = ceil(frac*n) by (quality desc, doc_id asc); ties at the
    threshold admitted smallest-doc_id-first; frac=1 keeps everything."""
    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import (
        quality_classifier,
        top_quality_fraction,
    )

    texts = (
        ["the cat sat on the mat and it was a good day"] * 3
        + ["1 2 3 4 5 6 7"] * 2
        + ["mixed words with some 42 numbers", "plain words only here"]
    )
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    scored = (
        quality_classifier(rd.from_pandas(docs))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = scored.sort_values(
        ["quality", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    for frac in (0.3, 0.5, 1.0):
        got = top_quality_fraction(rd.from_pandas(docs).repartition(3), frac)
        keep_n = int(np.ceil(frac * len(scored)))
        expect = want.head(keep_n)
        assert got["doc_id"].tolist() == expect["doc_id"].tolist(), frac
        assert np.allclose(got["quality"], expect["quality"]), frac
    import pytest as _pytest

    with _pytest.raises(ValueError, match="frac"):
        top_quality_fraction(rd.from_pandas(docs), 0.0)


def test_embedding_pca_matches_numpy(ray_session):
    """embedding_pca == direct numpy PCA of the full matrix (population
    covariance eigh), signs fixed, variance descending; transform
    projects exactly; partition-invariant within float tolerance."""
    import ray.data as rd

    from kafka_es_ray.pipelines.ann import embedding_pca, embedding_pca_transform

    rng = np.random.default_rng(5)
    d, n = 16, 400
    base = rng.normal(size=(n, d)) @ np.diag(np.linspace(3, 0.1, d))
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": [r.astype(np.float32).tolist() for r in base]}
    )
    m = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    mu = m.mean(axis=0)
    cov = (m - mu).T @ (m - mu) / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    want_c = evecs[:, order].T
    for i in range(4):
        j = int(np.argmax(np.abs(want_c[i])))
        if want_c[i, j] < 0:
            want_c[i] = -want_c[i]
    comps, ev, mean = embedding_pca(rd.from_pandas(df).repartition(5), 4)
    assert comps.shape == (4, d) and ev.shape == (4,)
    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(ev, evals[order], atol=1e-9)
    assert np.allclose(comps, want_c, atol=1e-7)
    assert (np.diff(ev) <= 1e-12).all()  # descending
    # partition invariance (within float tolerance)
    c2, ev2, mean2 = embedding_pca(rd.from_pandas(df).repartition(11), 4)
    assert np.allclose(c2, comps, atol=1e-7) and np.allclose(ev2, ev, atol=1e-9)
    # transform: exact projection
    proj = (
        embedding_pca_transform(rd.from_pandas(df), comps, mean)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    want_p = (m - mean) @ comps.T
    got_p = np.stack([np.asarray(v) for v in proj["proj"]])
    assert np.allclose(got_p, want_p, atol=1e-9)
    # projected variance per component ~ eigenvalue
    assert np.allclose(got_p.var(axis=0), ev, rtol=1e-6)


def test_sq8_rescore_matches_exact(ray_session):
    """SQ8 + full-precision rescore (ES rescore_vector oversample=3):
    quantized candidate selection, exact re-ranking — result identical to
    the exact brute force (ids, ranks AND sims) on data where raw SQ8
    alone already perturbs sims."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.ann import cosine_topk, sq8_rescore_topk

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((300, 32))
    df = pd.DataFrame(
        {"vec_id": np.arange(300, dtype=np.int64), "embedding": list(vecs.astype(np.float32))}
    )
    qids = np.array([1, 100, 200])
    qm = vecs[qids]
    exact = (
        to_pandas(cosine_topk(rd.from_pandas(df), qids, qm, k=10))
        .sort_values(["query_vec_id", "rank"]).reset_index(drop=True)
    )
    resc = (
        to_pandas(sq8_rescore_topk(rd.from_pandas(df), qids, qm, k=10, oversample=3.0))
        .sort_values(["query_vec_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, resc)


def test_cap_per_group_matches_pandas_and_is_partition_invariant(ray_session):
    """cap_per_group == a plain-pandas per-group top-n cut, and the kept
    set is identical at 1 block and 8 blocks (the combiner + exchange
    can't change the deterministic (order desc, id asc) cut)."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.sampling import cap_per_group

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "source": rng.choice([f"host{i}" for i in range(7)], size=400),
            "n_chars": rng.integers(10, 500, size=400).astype(np.int64),
        }
    )
    want = df.sort_values(
        ["source", "n_chars", "doc_id"], ascending=[True, False, True], kind="mergesort"
    )
    want = want[want.groupby("source").cumcount() < 5].copy()
    want["group_rank"] = (want.groupby("source").cumcount() + 1).astype(np.int64)
    want = want.sort_values("doc_id").reset_index(drop=True)
    for nblocks in (1, 8):
        got = (
            to_pandas(cap_per_group(rd.from_pandas(df).repartition(nblocks), 5))
            .sort_values("doc_id")
            .reset_index(drop=True)[want.columns.tolist()]
        )
        pd.testing.assert_frame_equal(got, want), nblocks


def test_global_shuffle_is_a_permutation_and_partition_invariant(ray_session):
    """global_shuffle == pandas rank over (md5(seed||id) % 2^62, id):
    positions are exactly 0..n-1, match the serial oracle, are identical
    at 1 and 8 blocks, and a different seed yields a different order."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.sampling import global_shuffle, seeded_hash_mod

    ids = np.arange(1000, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    h = seeded_hash_mod(ids, 1 << 62, "shuf:")
    order = np.lexsort((ids, h))
    want = pd.DataFrame({"doc_id": ids[order], "shuffle_pos": np.arange(1000, dtype=np.int64)})
    want = want.sort_values("doc_id").reset_index(drop=True)
    outs = []
    for nblocks in (1, 8):
        got = (
            to_pandas(global_shuffle(rd.from_pandas(df).repartition(nblocks)))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want), nblocks
        outs.append(got)
    other = to_pandas(global_shuffle(rd.from_pandas(df), seed="epoch1:"))
    assert sorted(other["shuffle_pos"]) == list(range(1000))
    assert not other.sort_values("doc_id")["shuffle_pos"].reset_index(drop=True).equals(
        want["shuffle_pos"]
    )


def test_pq_ann_recall(ray_session):
    """Product-quantization ADC top-k: good recall vs brute force on
    clustered data; ADC sims stay close to exact; deterministic across
    runs (fixed codebook seed)."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.ann import cosine_topk, pq_cosine_topk

    rng = np.random.default_rng(13)
    centers = rng.standard_normal((5, 32))
    # moderate spread: neighbor sims must separate beyond the PQ
    # reconstruction error (near-duplicate clusters are indistinguishable
    # to ANY quantizer; the rescore test below covers that regime)
    vecs = np.concatenate([c + 0.3 * rng.standard_normal((60, 32)) for c in centers])
    df = pd.DataFrame(
        {"vec_id": np.arange(300, dtype=np.int64), "embedding": list(vecs.astype(np.float32))}
    )
    qids = np.array([0, 60, 120])
    qm = vecs[qids]
    exact = to_pandas(cosine_topk(rd.from_pandas(df), qids, qm, k=10))
    approx = to_pandas(
        pq_cosine_topk(rd.from_pandas(df), qids, qm, k=10, m=8, ksub=256, train_size=300)
    )
    recalls = []
    for q in qids:
        e = set(exact[exact["query_vec_id"] == q]["vec_id"])
        a = set(approx[approx["query_vec_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.7, recalls
    # reconstruction-error bound on the shared hits
    j = exact.merge(approx, on=["query_vec_id", "vec_id"], suffixes=("_e", "_q"))
    assert (np.abs(j["sim_e"] - j["sim_q"]) <= 0.1).all()
    # deterministic: same input -> identical codes/scores
    again = to_pandas(
        pq_cosine_topk(rd.from_pandas(df), qids, qm, k=10, m=8, ksub=256, train_size=300)
    )
    pd.testing.assert_frame_equal(
        approx.sort_values(["query_vec_id", "rank"]).reset_index(drop=True),
        again.sort_values(["query_vec_id", "rank"]).reset_index(drop=True),
    )

    from kafka_es_ray.pipelines.ann import _pq_train

    with pytest.raises(ValueError, match="not divisible"):
        _pq_train(np.ones((10, 30)), m=7)


def test_pq_rescore_matches_exact(ray_session):
    """PQ + rescore_vector oversample == exact brute-force top-k, even on
    near-duplicate clusters where raw ADC ranking degrades."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.ann import cosine_topk, pq_rescore_topk

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((4, 32))
    vecs = np.concatenate([c + 0.05 * rng.standard_normal((50, 32)) for c in centers])
    df = pd.DataFrame(
        {"vec_id": np.arange(200, dtype=np.int64), "embedding": list(vecs.astype(np.float32))}
    )
    qids = np.array([0, 50, 100])
    qm = vecs[qids]
    exact = to_pandas(cosine_topk(rd.from_pandas(df), qids, qm, k=10))
    resc = to_pandas(
        pq_rescore_topk(
            rd.from_pandas(df), qids, qm, k=10, oversample=6.0,
            m=8, ksub=128, train_size=200,
        )
    )
    pd.testing.assert_frame_equal(
        exact.sort_values(["query_vec_id", "rank"]).reset_index(drop=True),
        resc.sort_values(["query_vec_id", "rank"]).reset_index(drop=True),
    )


def test_ivfpq_ann_recall(ray_session):
    """IVF+PQ composed: coarse-list pruning then ADC scoring still finds
    most exact neighbors on separable data."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.ann import cosine_topk, ivfpq_cosine_topk

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((6, 32))
    vecs = np.concatenate([c + 0.3 * rng.standard_normal((50, 32)) for c in centers])
    df = pd.DataFrame(
        {"vec_id": np.arange(300, dtype=np.int64), "embedding": list(vecs.astype(np.float32))}
    )
    qids = np.array([0, 50, 100])
    qm = vecs[qids]
    exact = to_pandas(cosine_topk(rd.from_pandas(df), qids, qm, k=10))
    approx = to_pandas(
        ivfpq_cosine_topk(
            rd.from_pandas(df), qids, qm, k=10,
            nlist=12, nprobe=4, m=8, ksub=256, train_size=300,
        )
    )
    recalls = []
    for q in qids:
        e = set(exact[exact["query_vec_id"] == q]["vec_id"])
        a = set(approx[approx["query_vec_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls


def test_curriculum_order_exact_rank(ray_session):
    """curriculum_order == pandas rank over (score desc|asc, id):
    exact total order, ties broken by id, partition-invariant, empty ok."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.sampling import curriculum_order

    rng = np.random.default_rng(19)
    n = 500
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "quality": rng.integers(0, 40, size=n).astype(np.float64),  # many ties
        }
    )
    want = df.sort_values(["quality", "doc_id"], ascending=[False, True])
    want = want.assign(pos=np.arange(n, dtype=np.int64)).set_index("doc_id")["pos"]

    got = (
        curriculum_order(rd.from_pandas(df), "quality", num_ranges=16, sample_size=200)
        .to_pandas().set_index("doc_id")["curriculum_pos"]
    )
    assert got.sort_index().tolist() == want.sort_index().tolist()

    # partition invariance
    got4 = (
        curriculum_order(
            rd.from_pandas(df).repartition(7), "quality",
            num_ranges=16, sample_size=200,
        )
        .to_pandas().set_index("doc_id")["curriculum_pos"]
    )
    assert got4.sort_index().tolist() == want.sort_index().tolist()

    # ascending (hard-first curriculum)
    asc = (
        curriculum_order(rd.from_pandas(df), "quality", ascending=True,
                         num_ranges=16, sample_size=200)
        .to_pandas().set_index("doc_id")["curriculum_pos"]
    )
    want_asc = df.sort_values(["quality", "doc_id"]).assign(
        pos=np.arange(n, dtype=np.int64)
    ).set_index("doc_id")["pos"]
    assert asc.sort_index().tolist() == want_asc.sort_index().tolist()


def test_curriculum_sorted_input_balanced_ranges(ray_session):
    """Round-4 verdict #4: the quantile sample must be seeded-hash, not
    a block prefix — on PRESORTED input (a re-run over already-ordered
    data) a prefix sample collapses nearly all rows into one hot range.
    Exactness must hold AND the range cuts must stay balanced."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.sampling import curriculum_order, seeded_sample_ds

    n = 20_000
    # presorted by score: the adversarial layout for a prefix sample
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "quality": np.arange(n, dtype=np.float64)[::-1].copy(),
        }
    )
    ds = rd.from_pandas(df).repartition(8)

    # the sample the op uses internally: spans the whole score range
    sample = seeded_sample_ds(ds, "doc_id", 1024, prefix="curr:")
    assert 300 < len(sample) < 4096  # ~target, never the whole corpus
    q = np.quantile(sample["quality"].to_numpy(), [0.1, 0.5, 0.9])
    assert q[0] < 0.25 * n and abs(q[1] - 0.5 * n) < 0.15 * n and q[2] > 0.75 * n

    # balanced ranges end-to-end: replicate the op's cut construction
    skey = -sample["quality"].to_numpy(np.float64)
    qs = np.linspace(0, 1, 64 + 1)[1:-1]
    cuts = np.unique(np.quantile(skey, qs))
    rids = np.searchsorted(cuts, -df["quality"].to_numpy(np.float64), side="left")
    share = np.bincount(rids).max() / n
    assert share < 0.10, f"hot range holds {share:.0%} of rows"

    # and the ordering stays exact on the sorted input
    got = (
        curriculum_order(ds, "quality", num_ranges=64, sample_size=1024)
        .to_pandas().set_index("doc_id")["curriculum_pos"]
    )
    assert got.sort_index().tolist() == list(range(n))


def test_decontaminate_drops_overlapping(ray_session):
    """decontaminate: docs sharing any benchmark 4-gram drop; max_shared
    loosens the cut; disjoint corpus passes through whole."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.dedup_ops import decontaminate

    bench = pd.DataFrame(
        {"doc_id": [100], "text": ["the quick brown fox jumps over lazy dogs"]}
    )
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [
                "quick brown fox jumps around here",   # shares 4-grams? "quick brown fox jumps" yes
                "totally different words entirely now",
                "the quick brown fox jumps over lazy dogs again",  # many shared
            ],
        }
    )
    out = decontaminate(rd.from_pandas(docs), rd.from_pandas(bench)).to_pandas()
    assert sorted(out["doc_id"]) == [1]
    loose = decontaminate(
        rd.from_pandas(docs), rd.from_pandas(bench), max_shared=1
    ).to_pandas()
    assert sorted(loose["doc_id"]) == [0, 1]
    assert (loose["n_shared"] <= 1).all()


def test_line_dedup_exact_first_occurrence(ray_session):
    """C4-style exact line dedup: repeated lines keep only the global
    first (doc_id, pos) occurrence; empty docs survive as skeletons;
    token-group mode matches a pandas brute force on a random corpus."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.pipelines.text_ops import line_dedup

    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "dup line\nunique one\nshared tail",
                "dup line\nanother thing",
                "totally unique\nshared tail",
                "",
                "dup line",
            ],
        }
    )
    out = (
        line_dedup(rd.from_pandas(df).repartition(3))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["text"].tolist() == [
        "dup line\nunique one\nshared tail",
        "another thing",
        "totally unique",
        "",  # the empty line's first occurrence IS doc 3's only line
        "",
    ]
    assert out["n_kept"].tolist() == [3, 1, 1, 1, 0]
    assert out["n_dropped"].tolist() == [0, 1, 1, 0, 1]

    # brute-force parity, token-group mode, random corpus with planted dups
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 40)).tolist())
        for _ in range(120)
    ]
    big = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": texts})
    W = 6
    lines = []
    for did, t in zip(big["doc_id"], big["text"]):
        toks = t.split()
        for pos, i in enumerate(range(0, len(toks), W)):
            lines.append((int(did), pos, " ".join(toks[i : i + W])))
    ldf = pd.DataFrame(lines, columns=["doc_id", "pos", "line"])
    ldf["rnk"] = ldf.sort_values(["doc_id", "pos"]).groupby("line").cumcount()
    want_kept = ldf[ldf["rnk"] == 0]
    want = (
        want_kept.sort_values(["doc_id", "pos"])
        .groupby("doc_id")["line"].agg("\n".join)
    )
    got = (
        line_dedup(rd.from_pandas(big).repartition(7), line_tokens=W)
        .to_pandas().set_index("doc_id").sort_index()
    )
    for did in big["doc_id"]:
        assert got.loc[did, "text"] == want.get(did, "")
    drops = ldf[ldf["rnk"] > 0].groupby("doc_id").size()
    for did in big["doc_id"]:
        assert got.loc[did, "n_dropped"] == int(drops.get(did, 0))
