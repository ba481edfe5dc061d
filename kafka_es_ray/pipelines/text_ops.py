"""Text analysis operators over a documents table — token counting,
quality scoring, language ID, document fingerprinting (task brief:
first-class training-data-pipeline ops).

All stages are vectorized ``map_batches``; the tokenizer matches the
ascii_v1 analyzer so SQL oracles reproduce results exactly
(tests/test_tokenizer.py::test_duckdb_parity).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from kafka_es_ray.functions.bpe import BpeEncoder
from kafka_es_ray.functions.tokenizer import ENGLISH_STOPWORDS, get_analyzer
from kafka_es_ray.runtime import stage_pool

# Small fixed stopword list (frozen with the analyzer version).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


class TokenStatsStage:
    """Actor-pool stage: per-doc token count + quality metrics.  Analyzer
    compiled once per actor (reference stateful-converter analog,
    ProtobufSerde.kt:26-73)."""

    def __init__(self, text_col: str = "text", quality: bool = False):
        self.an = get_analyzer("en")  # ascii_v1 == SQL tokenizer
        self.text_col = text_col
        self.quality = quality
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = self.an.tokenize_series(batch[self.text_col])
        n_tokens = toks.str.len().astype(np.int64)
        out = pd.DataFrame({"doc_id": batch["doc_id"].astype(np.int64), "n_tokens": n_tokens.to_numpy()})
        if self.quality:
            stop = self.stop
            n_stop = toks.map(lambda ts: sum(t in stop for t in ts)).astype(np.int64)
            total_len = toks.map(lambda ts: sum(len(t) for t in ts)).astype(np.float64)
            nt = n_tokens.to_numpy().astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                out["stop_ratio"] = _round6(np.where(nt > 0, n_stop.to_numpy() / nt, 0.0))
                out["mean_token_len"] = _round6(np.where(nt > 0, total_len.to_numpy() / nt, 0.0))
        return out


def _round6(x):
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


def doc_token_counts(docs_ds):
    """(doc_id, n_tokens) per document."""
    return docs_ds.map_batches(
        TokenStatsStage, batch_format="pandas", batch_size=4096, concurrency=stage_pool()
    )


def doc_quality(docs_ds):
    """(doc_id, n_tokens, stop_ratio, mean_token_len)."""
    return docs_ds.map_batches(
        TokenStatsStage,
        fn_constructor_kwargs={"quality": True},
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )


class ChunkStage:
    """Actor-pool chunking (pre-training sequence prep): split each doc's
    token stream into windows of ``size`` tokens advancing by ``stride``
    (overlap = size - stride), chunk text = space-joined window.  The
    final short window is kept iff it adds tokens (start < n).  Fan-out
    shape: one input row -> ceil(max(n - size, 0) / stride) + 1 rows."""

    def __init__(self, size: int = 64, stride: int = 48, text_col: str = "text"):
        assert 0 < stride <= size
        self.size, self.stride, self.text_col = size, stride, text_col
        self.an = get_analyzer("en")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = self.an.tokenize_series(batch[self.text_col])
        ids_out, idx_out, n_out, txt_out = [], [], [], []
        for did, ts in zip(batch["doc_id"].astype(np.int64), toks):
            n = len(ts)
            if n == 0:
                continue
            # stride grid, stopping after the first window that reaches
            # the end — full coverage, no redundant tail windows
            ci = 0
            for st_ in range(0, n, self.stride):
                w = ts[st_ : st_ + self.size]
                ids_out.append(did)
                idx_out.append(ci)
                n_out.append(len(w))
                txt_out.append(" ".join(w))
                ci += 1
                if st_ + self.size >= n:
                    break
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids_out, dtype=np.int64),
                "chunk_idx": pd.Series(idx_out, dtype=np.int64),
                "n_tokens": pd.Series(n_out, dtype=np.int64),
                "chunk": pd.Series(txt_out, dtype=object),
            }
        )


def chunk_documents(docs_ds, size: int = 64, stride: int = 48, text_col: str = "text"):
    """(doc_id, chunk_idx, n_tokens, chunk) — overlapping token windows,
    one streaming flat-map pass."""
    return docs_ds.map_batches(
        ChunkStage,
        fn_constructor_kwargs={"size": size, "stride": stride, "text_col": text_col},
        batch_format="pandas",
        batch_size=2048,
        concurrency=stage_pool(),
    )


# PII patterns — RE2-compatible (no lookaround) so DuckDB's regexp
# functions replay them exactly; frozen with the op version.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


class PiiScanStage:
    """Actor-pool PII scan/redaction (the pre-training scrub pass):
    per-doc counts of email / IPv4 matches and the text with every match
    replaced by a typed placeholder — vectorized pandas str kernels over
    compiled patterns (emails first, then IPs, the documented order)."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.email = re.compile(PII_EMAIL)
        self.ipv4 = re.compile(PII_IPV4)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        n_emails = t.str.count(self.email).astype(np.int64)
        n_ips = t.str.count(self.ipv4).astype(np.int64)
        red = t.str.replace(self.email, "[EMAIL]", regex=True).str.replace(
            self.ipv4, "[IP]", regex=True
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_emails": n_emails,
                "n_ips": n_ips,
                "redacted": red,
            }
        )


def pii_scan(docs_ds, text_col: str = "text"):
    """(doc_id, n_emails, n_ips, redacted) per document — one streaming
    pass, no shuffle; patterns are RE2 on both engine and oracle."""
    return docs_ds.map_batches(
        PiiScanStage,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )


class GopherStatsStage:
    """Actor-pool stage: Gopher-style repetition/quality signals per doc
    (Rae et al. 2021 §A1.1, the public rule set) adapted to token
    streams: token count, mean word length, the most-repeated single
    word's token fraction, and the most frequent 2-gram's CHARACTER
    fraction.  One vectorized pass per batch (flat token stream + two
    pandas groupbys); `keep` applies the configured thresholds to the
    ROUNDED values so the SQL oracle's cut is bit-identical."""

    def __init__(
        self,
        text_col: str = "text",
        min_words: int = 20,
        max_words: int = 1000,
        min_mean_word_len: float = 2.0,
        max_mean_word_len: float = 10.0,
        max_top2gram_frac: float = 0.20,
        max_word_rep_frac: float = 0.30,
    ):
        self.an = get_analyzer("en")  # ascii_v1 == SQL tokenizer
        self.text_col = text_col
        self.th = (
            min_words, max_words, min_mean_word_len, max_mean_word_len,
            max_top2gram_frac, max_word_rep_frac,
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        toks = self.an.tokenize_series(batch[self.text_col])
        n_per = toks.map(len).to_numpy(dtype=np.int64)
        n = len(batch)
        total = int(n_per.sum())
        flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
        doc = np.repeat(np.arange(n, dtype=np.int64), n_per)
        tok_len = pd.Series(flat).str.len().to_numpy(np.int64) if total else np.array([], dtype=np.int64)
        total_chars = np.bincount(doc, weights=tok_len, minlength=n)
        # most-repeated single word per doc (count desc, word asc)
        top_w = np.zeros(n, dtype=np.int64)
        if total:
            wc = (
                pd.DataFrame({"d": doc, "w": flat})
                .groupby(["d", "w"], sort=False).size().reset_index(name="c")
                .sort_values(["d", "c", "w"], ascending=[True, False, True], kind="mergesort")
                .drop_duplicates("d")
            )
            top_w[wc["d"].to_numpy()] = wc["c"].to_numpy()
        # most frequent bigram per doc: char fraction = c * (|w1|+|w2|) / chars
        top_bg_chars = np.zeros(n, dtype=np.float64)
        if total > 1:
            adj = doc[1:] == doc[:-1]
            if adj.any():
                bc = (
                    pd.DataFrame(
                        {"d": doc[:-1][adj], "w1": flat[:-1][adj], "w2": flat[1:][adj]}
                    )
                    .groupby(["d", "w1", "w2"], sort=False).size().reset_index(name="c")
                    .sort_values(
                        ["d", "c", "w1", "w2"],
                        ascending=[True, False, True, True], kind="mergesort",
                    )
                    .drop_duplicates("d")
                )
                l12 = (
                    bc["w1"].str.len().to_numpy(np.int64)
                    + bc["w2"].str.len().to_numpy(np.int64)
                )
                top_bg_chars[bc["d"].to_numpy()] = bc["c"].to_numpy(np.int64) * l12
        nw = n_per.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_wl = _round6(np.where(n_per > 0, total_chars / nw, 0.0))
            word_rep = _round6(np.where(n_per > 0, top_w / nw, 0.0))
            bg_frac = _round6(
                np.where(total_chars > 0, top_bg_chars / total_chars, 0.0)
            )
        mn_w, mx_w, mn_l, mx_l, mx_bg, mx_rep = self.th
        keep = (
            (n_per >= mn_w) & (n_per <= mx_w)
            & (mean_wl >= mn_l) & (mean_wl <= mx_l)
            & (bg_frac <= mx_bg) & (word_rep <= mx_rep)
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_words": n_per,
                "mean_word_len": mean_wl,
                "max_word_rep_frac": word_rep,
                "top2gram_frac": bg_frac,
                "keep": keep.astype(np.int64),
            }
        )


def gopher_quality(docs_ds, **thresholds):
    """(doc_id, n_words, mean_word_len, max_word_rep_frac, top2gram_frac,
    keep) per document — one streaming pass, no shuffle."""
    return docs_ds.map_batches(
        GopherStatsStage,
        fn_constructor_kwargs=thresholds,
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )


def _flat_tokens(an, batch: pd.DataFrame, text_col: str):
    """(flat object array of tokens, per-row doc index repeat, n_per)."""
    from itertools import chain

    toks = an.tokenize_series(batch[text_col])
    n_per = toks.map(len).to_numpy(dtype=np.int64)
    total = int(n_per.sum())
    flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
    doc = np.repeat(np.arange(len(batch), dtype=np.int64), n_per)
    return flat, doc, n_per


def _window_keys(flat: np.ndarray, doc: np.ndarray, n: int):
    """Space-joined n-gram window keys over the flat token stream.
    Returns (start index into flat, window doc index, key) for every
    window whose n tokens all belong to one doc — the SQL
    ``array_to_string(t[i:i+n-1], ' ')`` contract (string keys, not
    hashes, so oracle grouping is byte-identical)."""
    m = len(flat) - n + 1
    if m <= 0:
        return (np.array([], dtype=np.int64), np.array([], dtype=np.int64),
                np.array([], dtype=object))
    valid = doc[:m] == doc[n - 1 :]
    starts = np.nonzero(valid)[0]
    keys = flat[starts]
    for j in range(1, n):  # n-1 vectorized object-concat passes
        keys = keys + " "
        keys = keys + flat[starts + j]
    return starts, doc[starts], keys


class DupNgramStage:
    """Actor-pool stage: within-doc duplicate n-gram repetition signals
    (Rae et al. 2021 §A1.1 'fraction of characters in duplicate n-grams',
    adapted to token positions).  Per doc: n_windows (token n-gram
    count), dup_ngram_frac = windows whose key occurs >= 2x in the doc /
    windows, dup_cover_frac = token positions covered by >= 1 such
    window / tokens.  One vectorized pass; docs shorter than n tokens
    report zeros.  No shuffle."""

    def __init__(self, n: int = 5, text_col: str = "text"):
        self.an = get_analyzer("en")
        self.n = int(n)
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = self.n
        flat, doc, n_per = _flat_tokens(self.an, batch, self.text_col)
        starts, wdoc, keys = _window_keys(flat, doc, n)
        nrows = len(batch)
        n_windows = np.bincount(wdoc, minlength=nrows).astype(np.int64)
        dup_occ = np.zeros(nrows, dtype=np.int64)
        covered = np.zeros(nrows, dtype=np.int64)
        if len(starts):
            cnt = (
                pd.DataFrame({"d": wdoc, "k": keys})
                .groupby(["d", "k"], sort=False)["k"].transform("size")
                .to_numpy(np.int64)
            )
            dup = cnt >= 2
            dup_occ = np.bincount(wdoc[dup], minlength=nrows).astype(np.int64)
            if dup.any():  # position coverage via a difference array
                diff = np.zeros(len(flat) + 1, dtype=np.int64)
                np.add.at(diff, starts[dup], 1)
                np.add.at(diff, starts[dup] + n, -1)
                cov = np.cumsum(diff[:-1]) > 0
                covered = np.bincount(doc[cov], minlength=nrows).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            dup_frac = _round6(
                np.where(n_windows > 0, dup_occ / np.maximum(n_windows, 1), 0.0)
            )
            cover_frac = _round6(
                np.where(n_per > 0, covered / np.maximum(n_per, 1), 0.0)
            )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_words": n_per,
                "n_windows": n_windows,
                "dup_ngram_frac": dup_frac,
                "dup_cover_frac": cover_frac,
            }
        )


def dup_ngram_stats(docs_ds, n: int = 5):
    """Within-doc duplicate n-gram repetition signals per document
    (doc_id, n_words, n_windows, dup_ngram_frac, dup_cover_frac) — one
    streaming pass, no shuffle."""
    return docs_ds.map_batches(
        DupNgramStage,
        fn_constructor_kwargs={"n": n},
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )


class _NgramDocPartial:
    """Per-batch (doc_id, key, occ) rows: DISTINCT window keys per doc
    with in-doc occurrence counts — the pre-aggregate before the
    key-hashed exchange (a doc lives entirely in one batch row, so the
    partial is exact; cross-doc df = row count per key)."""

    def __init__(self, n: int = 8, text_col: str = "text"):
        self.an = get_analyzer("en")
        self.n = int(n)
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        flat, doc, _ = _flat_tokens(self.an, batch, self.text_col)
        _, wdoc, keys = _window_keys(flat, doc, self.n)
        if not len(keys):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "key": pd.Series([], dtype=object),
                    "occ": pd.Series([], dtype=np.int64),
                }
            )
        ids = batch["doc_id"].to_numpy().astype(np.int64)[wdoc]
        g = (
            pd.DataFrame({"doc_id": ids, "key": keys})
            .groupby(["doc_id", "key"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "occ"})
        )
        return g.astype({"doc_id": np.int64, "occ": np.int64})


def cross_doc_ngram_dups(docs_ds, n: int = 8):
    """Cross-document duplicate n-gram span detection (the exact-substring
    dedup signal of Lee et al. 2022, at token n-gram granularity): per
    doc, how many of its n-gram window occurrences also appear in at
    least one OTHER document.  Returns (doc_id, n_windows,
    n_dup_windows, dup_frac) for every doc with >= 1 window.

    Scale shape: the window stream materializes once as per-doc DISTINCT
    (doc, key, occ) rows (the combiner); cross-doc df = row count per
    key through one bucketed key-hashed exchange; the dup verdict joins
    back by co-partitioning the same rows with df rows on key (second
    exchange); per-doc rollup is a third, doc-keyed exchange.  Nothing
    key-wide ever sits on the driver — same shape as tfidf_top_terms."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    rows = docs_ds.map_batches(
        _NgramDocPartial,
        fn_constructor_kwargs={"n": n},
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    ).materialize()

    def df_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("key", as_index=False).agg(df=("key", "size"))
        return g[g["df"] >= 2].astype({"df": np.int64})  # unique keys drop here

    dup_keys = bucketed_group_agg(
        rows.map_batches(lambda b: b[["key"]], batch_format="pandas"),
        ["key"], df_combine,
    )

    # co-partition occ rows (doc_id >= 0) and dup-key markers (doc_id -1)
    def tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": np.full(len(b), -1, dtype=np.int64),
                "key": b["key"].to_numpy(),
                "occ": np.zeros(len(b), dtype=np.int64),
            }
        )

    unioned = rows.union(dup_keys.map_batches(tag, batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_dup = g[g["doc_id"] < 0]["key"]
        t = g[g["doc_id"] >= 0]
        hit = t["key"].isin(set(is_dup)).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(),
                "occ": t["occ"].to_numpy(np.int64),
                "dup_occ": np.where(hit, t["occ"].to_numpy(np.int64), 0),
            }
        )

    per_key = bucketed_group_agg(unioned, ["key"], join_bucket)

    def doc_rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_windows=("occ", "sum"), n_dup_windows=("dup_occ", "sum")
        )
        out["dup_frac"] = _round6(
            out["n_dup_windows"].to_numpy(np.float64)
            / out["n_windows"].to_numpy(np.float64)
        )
        return out.astype(
            {"doc_id": np.int64, "n_windows": np.int64, "n_dup_windows": np.int64}
        )

    return bucketed_group_agg(per_key, ["doc_id"], doc_rollup)


class _TermDfPartial:
    """Combiner: per-batch partial df (one row per distinct term per
    batch) BEFORE the groupby — the pre-aggregate rule (ray_guide
    'Aggregation at scale'; reference-side analog: metrics partials per
    task, MetricsUpdater.kt:3-15)."""

    def __init__(self):
        self.an = get_analyzer("en")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = self.an.tokenize_series(batch["text"])
        sets = [np.unique(np.asarray(t, dtype=object)) for t in toks if t]
        if not sets:
            return pd.DataFrame({"term": pd.Series([], dtype=object), "df_partial": pd.Series([], dtype=np.int64)})
        allt = np.concatenate(sets)
        terms, counts = np.unique(allt, return_counts=True)
        return pd.DataFrame({"term": terms, "df_partial": counts.astype(np.int64)})


def term_df(docs_ds):
    """Global document frequency per term: partial per batch (combiner),
    then a bucketed combine — the shuffle moves one row per (term, batch)
    and the group stage sees B buckets, not |vocab| keys."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    partials = docs_ds.map_batches(_TermDfPartial, batch_format="pandas", batch_size=4096, concurrency=stage_pool())

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("term", as_index=False).agg(df=("df_partial", "sum"))
        g["df"] = g["df"].astype(np.int64)
        return g

    return bucketed_group_agg(partials, ["term"], combine)


class _TfPartial:
    """Per-batch (doc_id, term, tf) rows — flat token stream + one pandas
    groupby per batch; a doc lives entirely in one batch row, so batch
    partials ARE exact per-doc term frequencies (no combine needed)."""

    def __init__(self):
        self.an = get_analyzer("en")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = self.an.tokenize_series(batch["text"])
        lens = toks.str.len().to_numpy().astype(np.int64)
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "term": pd.Series([], dtype=object),
                "tf": pd.Series([], dtype=np.int64),
            }
        )
        if lens.sum() == 0:
            return empty
        ids = np.repeat(batch["doc_id"].to_numpy().astype(np.int64), lens)
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)])
        g = (
            pd.DataFrame({"doc_id": ids, "term": flat})
            .groupby(["doc_id", "term"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        return g.astype({"doc_id": np.int64, "tf": np.int64})


def tfidf_top_terms(docs_ds, k: int = 5):
    """TF-IDF keyword extraction: top-k terms per document by
    round6(tf * ln(N / df)), ties term asc — (doc_id, term, rank, tfidf).

    Fully distributed, no driver-side vocabulary: tf rows materialize
    once (token-scale, spillable); df comes from COUNTING those rows per
    term (bucketed combine); the tf-df join co-partitions both row kinds
    through one bucketed exchange on term; top-k per doc is a second
    bucketed exchange on doc_id.  The canonical keyword-extraction shape
    for a training-data pipeline."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    n_docs = float(docs_ds.count())
    tf_rows = docs_ds.map_batches(
        _TfPartial, batch_format="pandas", batch_size=4096, concurrency=stage_pool()
    ).materialize()

    # df = rows per term (each tf row is one distinct (doc, term))
    def df_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("term", as_index=False).agg(df=("term", "size"))
        return g.astype({"df": np.int64})

    def project_term(b: pd.DataFrame) -> pd.DataFrame:
        return b[["term"]]

    dfs = bucketed_group_agg(
        tf_rows.map_batches(project_term, batch_format="pandas"), ["term"], df_combine
    )

    # co-partition tf rows (doc_id >= 0) and df rows (doc_id = -1) by term
    def tag_df(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": np.full(len(b), -1, dtype=np.int64),
                "term": b["term"].to_numpy(),
                "tf": b["df"].to_numpy().astype(np.int64),
            }
        )

    unioned = tf_rows.union(dfs.map_batches(tag_df, batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_df = g["doc_id"].to_numpy() < 0
        dmap = g[is_df].set_index("term")["tf"]
        t = g[~is_df]
        idf = np.log(n_docs / dmap.reindex(t["term"]).to_numpy().astype(np.float64))
        return pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(),
                "term": t["term"].to_numpy(),
                "tfidf": _round6(t["tf"].to_numpy().astype(np.float64) * idf),
            }
        )

    scored = bucketed_group_agg(unioned, ["term"], join_bucket)

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "tfidf", "term"], ascending=[True, False, True], kind="mergesort"
        )
        g["rank"] = (g.groupby("doc_id", sort=False).cumcount() + 1).astype(np.int64)
        return g[g["rank"] <= k][["doc_id", "term", "rank", "tfidf"]]

    return bucketed_group_agg(scored, ["doc_id"], topk_bucket)


def pack_training_sequences(docs_ds, capacity: int = 1024):
    """Training-sequence packing (concatenate-then-split, the standard
    LLM pretraining batch layout): documents are concatenated in doc_id
    order into one logical token stream and cut into fixed ``capacity``
    windows; each doc reports where it landed — global start offset,
    first/last sequence index, and how many windows it straddles.

    Distributed as a classic prefix sum: per-block token-count partials
    (one row per block) -> driver computes block prefix offsets (tiny)
    -> broadcast -> per-block local cumsum + offset.  No shuffle moves
    doc rows; the only exchange is #blocks scalar partials, so the op is
    100-TB-safe and the output is partition-invariant (doc_id order is
    global by construction).  Returns (doc_id, n_tokens, start_offset,
    first_seq, last_seq) for docs with >= 1 token."""
    import ray

    # per-block (min_doc_id, token_sum) partials + per-doc counts kept
    # block-local; blocks are doc_id-ordered ranges because read order is
    # row-group order, but we do NOT rely on that: re-sort via one
    # bucketed exchange on doc_id ranges
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    counts = docs_ds.map_batches(
        TokenStatsStage, batch_format="pandas", batch_size=4096,
        concurrency=stage_pool(),
    )

    # one exchange keyed by doc_id ranges: a RANGE is a contiguous doc_id
    # span, so the global prefix order is exactly (range_id, doc_id)
    span = 1 << 20  # docs per contiguous range (fixed, layout-free)

    def tag_span(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["range_id"] = b["doc_id"].to_numpy(np.int64) // span
        return b

    ranged = counts.map_batches(tag_span, batch_format="pandas")

    def range_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values(["range_id", "doc_id"], kind="mergesort")
        n = bucket["n_tokens"].to_numpy(np.int64)
        cum = bucket.groupby("range_id", sort=False)["n_tokens"].cumsum()
        return pd.DataFrame(
            {
                "range_id": bucket["range_id"].to_numpy(np.int64),
                "doc_id": bucket["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "local_start": cum.to_numpy(np.int64) - n,
            }
        )

    local = bucketed_group_agg(ranged, ["range_id"], range_combine).materialize()

    # block prefix offsets: one scalar per range -> driver (tiny)
    totals = (
        local.map_batches(
            lambda b: b.groupby("range_id", as_index=False)["n_tokens"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if len(totals) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "start_offset": pd.Series([], dtype=np.int64),
                "first_seq": pd.Series([], dtype=np.int64),
                "last_seq": pd.Series([], dtype=np.int64),
            }
        )
    totals = totals.groupby("range_id", as_index=True)["n_tokens"].sum().sort_index()
    offsets = {
        int(rid): int(off)
        for rid, off in zip(totals.index, totals.cumsum() - totals)
    }
    off_ref = ray.put(offsets)
    cap = int(capacity)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        base = b["range_id"].map(offs).to_numpy(np.int64)
        start = base + b["local_start"].to_numpy(np.int64)
        n = b["n_tokens"].to_numpy(np.int64)
        keep = n > 0
        start, n = start[keep], n[keep]
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64)[keep],
                "n_tokens": n,
                "start_offset": start,
                "first_seq": start // cap,
                "last_seq": (start + n - 1) // cap,
            }
        )

    return local.map_batches(finalize, batch_format="pandas")


def lm_score(docs_ds):
    """Unigram language-model quality scoring over the corpus's own MLE
    model: per doc the mean token log-likelihood, lm_logprob =
    (1/n_d) Σ_t tf_{d,t} · ln(c_t / total_tokens) — the classic LM
    quality signal for training-data curation (low = token distribution
    unlike the corpus; the CCNet/KenLM-style filter with the corpus
    itself as the model, public technique).  Distributed exactly like
    tfidf_top_terms: tf rows materialize once, global term counts by
    bucketed combine, tf⋈count co-partitioned on term through one
    bucketed exchange, then a per-doc reduce on doc_id — no driver-side
    vocabulary at any point (100-TB-safe).  Docs with zero tokens are
    omitted.  Returns (doc_id, n_tokens, lm_logprob) with lm_logprob
    round6."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    tf_rows = docs_ds.map_batches(
        _TfPartial, batch_format="pandas", batch_size=4096, concurrency=stage_pool()
    ).materialize()
    total_tokens = float(
        tf_rows.map_batches(
            lambda b: pd.DataFrame({"n": [int(b["tf"].sum())]}),
            batch_format="pandas",
        ).to_pandas()["n"].sum()
    )
    if total_tokens == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "lm_logprob": pd.Series([], dtype=np.float64),
            }
        )

    # global occurrence count per term (bucketed combine over tf rows)
    def cnt_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("term", as_index=False).agg(c=("tf", "sum"))
        return g.astype({"c": np.int64})

    def project_tc(b: pd.DataFrame) -> pd.DataFrame:
        return b[["term", "tf"]]

    counts = bucketed_group_agg(
        tf_rows.map_batches(project_tc, batch_format="pandas"), ["term"], cnt_combine
    )

    # co-partition tf rows (doc_id >= 0) and count rows (doc_id = -1)
    def tag_cnt(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": np.full(len(b), -1, dtype=np.int64),
                "term": b["term"].to_numpy(),
                "tf": b["c"].to_numpy().astype(np.int64),
            }
        )

    unioned = tf_rows.union(counts.map_batches(tag_cnt, batch_format="pandas"))

    def contrib_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_c = g["doc_id"].to_numpy() < 0
        cmap = g[is_c].set_index("term")["tf"]
        t = g[~is_c]
        lnp = np.log(
            cmap.reindex(t["term"]).to_numpy().astype(np.float64) / total_tokens
        )
        return pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(),
                "n_tokens": t["tf"].to_numpy().astype(np.int64),
                "ll": t["tf"].to_numpy().astype(np.float64) * lnp,
            }
        )

    contrib = bucketed_group_agg(unioned, ["term"], contrib_bucket)

    def doc_reduce(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", as_index=False).agg(
            n_tokens=("n_tokens", "sum"), ll=("ll", "sum")
        )
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"].to_numpy().astype(np.int64),
                "n_tokens": agg["n_tokens"].to_numpy().astype(np.int64),
                "lm_logprob": _round6(
                    agg["ll"].to_numpy() / agg["n_tokens"].to_numpy()
                ),
            }
        )

    return bucketed_group_agg(contrib, ["doc_id"], doc_reduce)


class _BigramPartial:
    """Combiner: per-batch partial adjacent-bigram counts (vectorized —
    flat token stream + doc-boundary mask, no per-row Python loop)."""

    def __init__(self):
        self.an = get_analyzer("en")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "w1": pd.Series([], dtype=object),
                "w2": pd.Series([], dtype=object),
                "n_partial": pd.Series([], dtype=np.int64),
            }
        )
        toks = self.an.tokenize_series(batch["text"])
        lens = np.asarray([len(t) for t in toks], dtype=np.int64)
        nonempty = [np.asarray(t, dtype=object) for t in toks if len(t)]
        if not nonempty:
            return empty
        flat = np.concatenate(nonempty)
        if flat.size < 2:
            return empty
        # a bigram starts at every position except each doc's last token
        start_ok = np.ones(flat.size, dtype=bool)
        start_ok[np.cumsum(lens[lens > 0]) - 1] = False
        w1 = flat[:-1][start_ok[:-1]]
        w2 = flat[1:][start_ok[:-1]]
        if w1.size == 0:
            return empty
        g = (
            pd.DataFrame({"w1": w1, "w2": w2})
            .groupby(["w1", "w2"], as_index=False)
            .size()
            .rename(columns={"size": "n_partial"})
        )
        g["n_partial"] = g["n_partial"].astype(np.int64)
        return g


def top_bigram(docs_ds) -> tuple[str, str, int]:
    """The corpus's most frequent adjacent token bigram (count desc,
    w1 asc, w2 asc) — fully distributed: per-batch partial counts →
    bucketed combine → per-bucket top-1 → driver min over B rows.
    The driver never sees doc text or the full bigram table."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    partials = docs_ds.map_batches(
        _BigramPartial, batch_format="pandas", batch_size=4096, concurrency=stage_pool()
    )

    def bucket_top1(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["w1", "w2"], as_index=False).agg(n=("n_partial", "sum"))
        g = g.sort_values(["n", "w1", "w2"], ascending=[False, True, True], kind="mergesort")
        return g.head(1).astype({"n": np.int64})

    tops = bucketed_group_agg(partials, ["w1", "w2"], bucket_top1).take_all()
    best = min(tops, key=lambda r: (-int(r["n"]), r["w1"], r["w2"]))
    return str(best["w1"]), str(best["w2"]), int(best["n"])


class LangIdStage:
    """Character-n-gram heuristic language ID (no external models).

    Scores each doc against per-language trigram profiles built from
    small frozen seed text.  Scoring is EXACT integer arithmetic so the
    DuckDB SQL oracle can reproduce the argmax bit-for-bit: the profile
    weight of gram g in language L is count_L(g) * (LCM / total_L) where
    LCM is the least common multiple of the four seeds' gram totals — an
    integer rescaling of the old count/total probability that preserves
    the ordering (the per-doc division by n_grams is constant across
    languages and dropped).  Ties break by seed declaration order."""

    SEEDS = {
        "en": "the quick brown fox jumps over the lazy dog and the cat is on the mat with a hat",
        "de": "der schnelle braune fuchs springt über den faulen hund und die katze ist auf der matte",
        "fr": "le renard brun rapide saute par dessus le chien paresseux et le chat est sur le tapis",
        "es": "el rapido zorro marron salta sobre el perro perezoso y el gato esta en la alfombra",
    }

    @classmethod
    def int_profiles(cls) -> dict[str, dict[str, int]]:
        """lang -> {gram: integer weight}; shared with the SQL oracle."""
        import math

        counts = {}
        totals = {}
        for lang, seed in cls.SEEDS.items():
            grams = [seed[i : i + 3] for i in range(len(seed) - 2)]
            g, c = np.unique(np.asarray(grams, dtype=object), return_counts=True)
            counts[lang] = dict(zip(g.tolist(), c.tolist()))
            totals[lang] = int(c.sum())
        lcm = math.lcm(*totals.values())
        return {
            lang: {g: int(c) * (lcm // totals[lang]) for g, c in cnt.items()}
            for lang, cnt in counts.items()
        }

    def __init__(self):
        self.profiles = self.int_profiles()

    def _score(self, text: str) -> str:
        t = (text or "").lower()
        grams = [t[i : i + 3] for i in range(max(0, len(t) - 2))]
        if not grams:
            return "und"
        best, best_s = "und", -1
        for lang, prof in self.profiles.items():
            s = sum(prof.get(g, 0) for g in grams)
            if s > best_s:
                best, best_s = lang, s
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "lang_pred": batch["text"].map(self._score),
            }
        )


def lang_id(docs_ds):
    return docs_ds.map_batches(LangIdStage, batch_format="pandas", batch_size=4096, concurrency=stage_pool())


def doc_fingerprint(docs_ds):
    """(doc_id, fp): md5 content fingerprint of the raw text — matches
    DuckDB md5(text) for the SQL oracle.  Per-row digest is inherently
    per-row work; md5 of short strings is C-speed."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "fp": batch["text"].map(lambda t: hashlib.md5((t or "").encode()).hexdigest()),
            }
        )

    return docs_ds.map_batches(fp, batch_format="pandas", batch_size=8192)


def lang_stats(docs_ds):
    """Per-lang corpus stats (n_docs, avg chars, avg tokens) with partial
    aggregation before the tiny groupby."""
    from ray.data.aggregate import Count, Sum

    class Partial(TokenStatsStage):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = self.an.tokenize_series(batch[self.text_col])
            return (
                pd.DataFrame(
                    {
                        "lang": batch["lang"],
                        "n_chars": batch["n_chars"].astype(np.int64),
                        "n_tokens": toks.str.len().astype(np.int64),
                    }
                )
                .groupby("lang", as_index=False)
                .agg(n_docs=("lang", "size"), sum_chars=("n_chars", "sum"), sum_tokens=("n_tokens", "sum"))
            )

    partials = docs_ds.map_batches(Partial, batch_format="pandas", batch_size=8192, concurrency=stage_pool())
    agg = partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
        Sum("sum_tokens", alias_name="sum_tokens"),
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": batch["lang"],
                "n_docs": batch["n_docs"].astype(np.int64),
                "avg_chars": _round6(batch["sum_chars"] / batch["n_docs"]),
                "avg_tokens": _round6(batch["sum_tokens"] / batch["n_docs"]),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


def bpe_train_sample(
    docs_ds,
    num_merges: int = 200,
    sample_mod: int = 7,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Train a BPE merge table on a DETERMINISTIC corpus sample
    (functions/bpe.py; Sennrich et al. 2016).  Sample membership =
    ``md5_number_lower(str(id)) % sample_mod == 0`` (the sampling-ops
    hash contract — reproducible across runs and partitionings; BPE is
    conventionally trained on a subset).  The distributed part is the
    word HISTOGRAM (per-batch value_counts partials, one tiny driver
    merge of <= |vocab| rows per block); the greedy merge loop itself is
    driver-side over that small dict, as in every published trainer."""
    from kafka_es_ray.functions.bpe import train_bpe
    from kafka_es_ray.pipelines.sampling import seeded_hash_mod

    an = get_analyzer("en")

    def word_partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = seeded_hash_mod(batch[id_col], sample_mod) == 0
        sub = batch[keep]
        if not len(sub):
            return pd.DataFrame(
                {"word": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        toks = an.tokenize_series(sub[text_col])
        vc = pd.Series(
            [t for ts in toks for t in ts], dtype=object
        ).value_counts()
        return pd.DataFrame(
            {"word": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)}
        )

    parts = docs_ds.map_batches(
        word_partial, batch_format="pandas", batch_size=8192
    ).to_pandas()
    counts = (
        parts.groupby("word")["n"].sum().to_dict() if len(parts) else {}
    )
    return train_bpe(counts, num_merges)


def bpe_token_counts(
    docs_ds,
    merges: list,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, n_tokens, n_bpe_tokens) per document under a trained BPE
    merge table — the real-tokenizer token-counting op (sequence-length
    budgeting, packing inputs).  Encoding is an actor-pool stage whose
    per-distinct-word memo PERSISTS across batches (BpeEncoder): Zipf
    makes distinct words per actor a small fraction of token volume, so
    the per-word encode loop never runs in the hot path."""

    class BpeCountStage:
        def __init__(self, merges_):
            # BpeEncoder imported at module top (CLAUDE.md rule 1: no
            # import statements inside worker-side functions)
            self.an = get_analyzer("en")
            self.enc = BpeEncoder(merges_)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = self.an.tokenize_series(batch[text_col])
            count = self.enc.count
            n_bpe = toks.map(lambda ts: sum(count(w) for w in ts))
            return pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype(np.int64),
                    "n_tokens": toks.str.len().to_numpy(np.int64),
                    "n_bpe_tokens": n_bpe.to_numpy(np.int64),
                }
            )

    return docs_ds.map_batches(
        BpeCountStage,
        fn_constructor_args=(list(merges),),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )


def frequent_token_pairs(
    docs_ds,
    min_support: int = 10,
    k: int = 20,
    *,
    text_col: str = "text",
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """ES frequent_item_sets aggregation, restricted to the size-2
    itemsets (the documented subset — pairs are where the ES agg earns
    its keep for co-occurrence mining): token pairs co-occurring in >=
    ``min_support`` documents, top-``k`` by (support desc, pair asc).

    Scale shape (Apriori prune): pass 1 computes global per-token doc
    frequency (per-batch distinct partials -> bucketed sum) and keeps
    only tokens with df >= min_support — anti-monotonicity says no other
    token can appear in a frequent pair — broadcast via ray.put; pass 2
    generates each doc's pairs over the SURVIVING tokens only (pandas
    value_counts per batch = combiner) and one bucketed pair exchange
    sums supports.  Pair blow-up is bounded by the per-doc count of
    globally-frequent distinct tokens, the documented assumption.
    Returns (rank, t1, t2, support)."""
    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    an = get_analyzer("en")

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = an.tokenize_series(batch[text_col])
        vc = pd.Series(
            [t for ts in toks for t in set(ts)], dtype=object
        ).value_counts()
        return pd.DataFrame(
            {"term": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)}
        )

    def df_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("term", as_index=False)["n"].sum()
        return g[g["n"] >= int(min_support)]

    freq_df = bucketed_group_agg(
        docs_ds.map_batches(df_partial, batch_format="pandas", batch_size=8192),
        ["term"], df_sum, num_buckets,
    ).to_pandas()
    empty = pd.DataFrame(
        {
            "rank": pd.Series([], dtype=np.int64),
            "t1": pd.Series([], dtype=object),
            "t2": pd.Series([], dtype=object),
            "support": pd.Series([], dtype=np.int64),
        }
    )
    if not len(freq_df):
        return empty
    freq_ref = ray.put(frozenset(freq_df["term"]))

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        freq = ray.get(freq_ref)
        toks = an.tokenize_series(batch[text_col])
        keys = []
        for ts in toks:
            kept = sorted(set(ts) & freq)
            for i in range(len(kept)):
                for j in range(i + 1, len(kept)):
                    keys.append(kept[i] + "\x1f" + kept[j])
        if not keys:
            return pd.DataFrame(
                {"pair": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        vc = pd.Series(keys, dtype=object).value_counts()
        return pd.DataFrame(
            {"pair": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)}
        )

    def pair_sum(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("pair", as_index=False)["n"].sum()
        return g[g["n"] >= int(min_support)]

    pairs = bucketed_group_agg(
        docs_ds.map_batches(pair_partial, batch_format="pandas", batch_size=8192),
        ["pair"], pair_sum, num_buckets,
    ).to_pandas()
    if not len(pairs):
        return empty
    split = pairs["pair"].str.split("\x1f", expand=True)
    out = pd.DataFrame(
        {"t1": split[0], "t2": split[1], "support": pairs["n"].astype(np.int64)}
    ).sort_values(
        ["support", "t1", "t2"], ascending=[False, True, True], kind="mergesort"
    ).head(int(k)).reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out


class QualityClassifierStage:
    """Deterministic quality-classifier filter (the fastText/DCLM-style
    learned-filter SHAPE with frozen public weights — no model file in
    this container, so the linear layer is a fixed, documented constant):
    per doc, quality = round6(sigmoid(w·x + b)) over four vectorized text
    features, keep = quality >= threshold.

    Features (analyzed ascii_v1 tokens): f1 = ln(1 + n_tokens),
    f2 = mean token length, f3 = stopword fraction (the `_english_`
    list), f4 = all-digit-token fraction.  Weights FROZEN (b, w1..w4) =
    (-2.0, 0.6, 0.1, 2.0, -3.0) — replayed verbatim by the SQL oracle.
    One streaming pass, flat-array reduceat per batch, no shuffle."""

    B, W1, W2, W3, W4 = -2.0, 0.6, 0.1, 2.0, -3.0

    def __init__(self, threshold: float = 0.5, text_col: str = "text"):
        self.threshold = float(threshold)
        self.text_col = text_col
        self.an = get_analyzer("en")
        self.stop = sorted(ENGLISH_STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = self.an.tokenize_series(batch[self.text_col])
        counts = toks.map(len).to_numpy(np.int64)
        ids = batch["doc_id"].to_numpy(np.int64)
        keep_rows = counts > 0
        ids, counts = ids[keep_rows], counts[keep_rows]
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "quality": pd.Series([], dtype=np.float64),
                "keep": pd.Series([], dtype=bool),
            }
        )
        if not ids.size:
            return empty
        flat = pd.Series(
            [t for ts, ok in zip(toks, keep_rows) if ok for t in ts],
            dtype=object,
        )
        lens = flat.str.len().to_numpy(np.float64)
        is_stop = flat.isin(self.stop).to_numpy()
        is_digit = flat.str.fullmatch(r"[0-9]+").to_numpy(bool)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        mean_len = np.add.reduceat(lens, starts) / counts
        stop_frac = np.add.reduceat(is_stop.astype(np.float64), starts) / counts
        digit_frac = np.add.reduceat(is_digit.astype(np.float64), starts) / counts
        z = (
            self.B
            + self.W1 * np.log1p(counts.astype(np.float64))
            + self.W2 * mean_len
            + self.W3 * stop_frac
            + self.W4 * digit_frac
        )
        q = np.floor(1.0 / (1.0 + np.exp(-z)) * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": counts,
                "quality": q,
                "keep": q >= self.threshold,
            }
        )


def quality_classifier(docs_ds, threshold: float = 0.5):
    """(doc_id, n_tokens, quality, keep) — the classifier-based document
    filter of the modern curation pipelines (RefinedWeb/DCLM fastText
    filtering shape) as one vectorized streaming pass; zero-token docs
    omitted."""
    return docs_ds.map_batches(
        QualityClassifierStage,
        fn_constructor_kwargs={"threshold": threshold},
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )


def lm_quality_buckets(docs_ds, cutoffs: tuple = (-3.55, -3.42)):
    """CCNet-style perplexity bucketing: per doc the unigram-LM mean
    log-likelihood (lm_score) bucketed by FIXED cutoffs into
    tail / middle / head (CCNet §4.3 uses fixed per-language perplexity
    thresholds from a reference model — the cutoffs are configuration,
    not data-derived, so the op stays one streaming pass after the
    lm_score exchanges).  bucket: head = lp > cutoffs[1], middle =
    lp > cutoffs[0], else tail; comparisons on the round6'd score (the
    oracle contract).  Returns (doc_id, n_tokens, lm_logprob, bucket)."""
    lo, hi = float(cutoffs[0]), float(cutoffs[1])
    scored = lm_score(docs_ds)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        lp = b["lm_logprob"].to_numpy(np.float64)
        b = b.copy()
        b["bucket"] = np.where(lp > hi, "head", np.where(lp > lo, "middle", "tail"))
        return b

    if isinstance(scored, pd.DataFrame):  # degenerate empty corpus
        scored["bucket"] = pd.Series([], dtype=object)
        return scored
    return scored.map_batches(add_bucket, batch_format="pandas")


def top_quality_fraction(docs_ds, frac: float = 0.3):
    """Curation selection: keep the top ``frac`` of the corpus by the
    quality-classifier score — "train on the best 30%" (the
    classifier-threshold selection of DCLM/RefinedWeb-style pipelines,
    with the cutoff DERIVED from the corpus instead of fixed).

    Exact and distributed: quality scores are round6'd, so the value
    space is bounded (<= 1e6 distinct) — one per-value count exchange
    gives the driver a tiny cumulative histogram to find the threshold
    t and how many threshold-tied docs still fit; docs with quality > t
    all pass, ties at t are admitted smallest-doc_id-first (the only
    driver-side doc list is the ties at ONE 6-dp value — degenerate
    corpora where that is large should lower frac or use a fixed
    cutoff).  keep_n = ceil(frac * n_scored).  Returns a pandas
    DataFrame (doc_id, n_tokens, quality) of the kept docs."""
    if not (0.0 < frac <= 1.0):
        raise ValueError("top_quality_fraction: frac must be in (0, 1]")
    scored = quality_classifier(docs_ds).materialize()

    def vc(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("quality", as_index=False).size()
        return g.rename(columns={"size": "n"})

    hist = scored.map_batches(vc, batch_format="pandas").to_pandas()
    if not len(hist):
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "quality": pd.Series([], dtype=np.float64),
            }
        )
    hist = hist.groupby("quality", as_index=False)["n"].sum().sort_values(
        "quality", ascending=False
    )
    total = int(hist["n"].sum())
    keep_n = int(np.ceil(frac * total))
    cum = hist["n"].cumsum().to_numpy()
    ti = int(np.searchsorted(cum, keep_n))
    t = float(hist["quality"].to_numpy()[ti])
    n_above = int(cum[ti - 1]) if ti > 0 else 0
    n_at_t = keep_n - n_above
    above = scored.map_batches(
        lambda b: b[b["quality"] > t], batch_format="pandas"
    ).to_pandas()
    if not len(above):  # 0-row to_pandas drops columns (rule 8b)
        above = pd.DataFrame(
            {c: pd.Series([], dtype=d)
             for c, d in (("doc_id", np.int64), ("n_tokens", np.int64),
                          ("quality", np.float64), ("keep", bool))}
        )
    ties = scored.map_batches(
        lambda b: b[b["quality"] == t], batch_format="pandas"
    ).to_pandas().sort_values("doc_id", kind="mergesort").head(n_at_t)
    out = pd.concat([above, ties], ignore_index=True)
    return (
        out[["doc_id", "n_tokens", "quality"]]
        .sort_values(["quality", "doc_id"], ascending=[False, True],
                     kind="mergesort")
        .reset_index(drop=True)
    )


# ------------------------------------------------ exact line dedup (C4)


class _LineExplodeStage:
    """(doc_id, pos, line) rows.  Lines are ``sep``-separated spans of
    ``text_col`` (the C4/RefinedWeb unit), or — when ``line_tokens`` is
    set — fixed-size analyzer-token groups, the deterministic proxy for
    corpora without newlines (SQL: ``(generate_subscripts - 1) //
    line_tokens``).  Analyzer built once per actor."""

    def __init__(self, text_col: str, line_tokens: int | None, sep: str):
        self.an = get_analyzer("en")
        self.text_col, self.line_tokens, self.sep = text_col, line_tokens, sep

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        if self.line_tokens is None:
            per_doc = batch[self.text_col].fillna("").str.split(self.sep).tolist()
        else:
            w = int(self.line_tokens)
            toks = self.an.tokenize_series(batch[self.text_col])
            per_doc = [
                [" ".join(t[i : i + w]) for i in range(0, len(t), w)]
                for t in toks
            ]
        counts = np.fromiter((len(p) for p in per_doc), dtype=np.int64, count=len(per_doc))
        total = int(counts.sum())
        flat = np.empty(total, dtype=object)
        k = 0
        for p in per_doc:
            flat[k : k + len(p)] = p
            k += len(p)
        ends = np.cumsum(counts)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, counts),
                "pos": np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts),
                "line": pd.Series(flat, dtype=object),
            }
        )


def line_dedup(
    docs_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_tokens: int | None = None,
    sep: str = "\n",
):
    """C4/RefinedWeb-family EXACT line deduplication: any line whose
    exact text occurs more than once in the corpus keeps only its FIRST
    occurrence (smallest (doc_id, pos)); every other copy is dropped.
    Returns Dataset (doc_id, text, n_kept, n_dropped) with ``text`` =
    the kept lines re-joined by '\\n' in document order (empty string
    when every line was dropped).  SQL-oracle-checkable in token-group
    mode.

    Scale shape: TWO bucketed exchanges over corpus text — exchange 1
    keys the line STRING itself (collision-safe, the canonical-URL-dedup
    precedent: a 64-bit hash would silently merge distinct lines at
    multi-billion-line scale) and picks each line's global winner;
    exchange 2 keys doc_id and reassembles survivors in position order.
    No driver-side state; hot lines (boilerplate repeated millions of
    times) cost one reducer group each — their row count, not their
    content, is the skew, and only (doc_id, pos) pairs ride those
    groups."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    if id_col != "doc_id":
        docs_ds = docs_ds.map_batches(
            lambda b, c=id_col: b.rename(columns={c: "doc_id"}),
            batch_format="pandas",
        )

    exploded = docs_ds.map_batches(
        _LineExplodeStage,
        fn_constructor_args=(text_col, line_tokens, sep),
        batch_format="pandas",
        batch_size=2048,
        concurrency=stage_pool(),
    )

    def winner_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        # per line: rank rows by (doc_id, pos); rank 0 survives, the
        # rest are dropped — emitted as per-doc drop COUNT partials
        # (kind column, never a value sentinel: the round-5 exchange
        # lesson).  kind 0 = kept line row, 1 = dropped-count partial.
        b = bucket.sort_values(["line", "doc_id", "pos"], kind="mergesort")
        first = ~b["line"].duplicated()
        kept = b[first]
        dropped = b[~first]
        out_k = pd.DataFrame(
            {
                "doc_id": kept["doc_id"].to_numpy(np.int64),
                "kind": np.int64(0),
                "pos": kept["pos"].to_numpy(np.int64),
                "line": kept["line"].to_numpy(),
                "n": np.int64(0),
            }
        )
        dc = dropped.groupby("doc_id", as_index=False).size()
        out_d = pd.DataFrame(
            {
                "doc_id": dc["doc_id"].to_numpy(np.int64),
                "kind": np.int64(1),
                "pos": np.int64(0),
                "line": pd.Series([""] * len(dc), dtype=object),
                "n": dc["size"].to_numpy(np.int64),
            }
        )
        return pd.concat([out_k, out_d], ignore_index=True)

    survivors = bucketed_group_agg(exploded, ["line"], winner_bucket)

    # doc skeletons guarantee every input doc appears, even when all of
    # its lines were dropped (or it had none in token mode)
    def skeleton(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "kind": np.int64(2),
                "pos": np.int64(0),
                "line": pd.Series([""] * len(b), dtype=object),
                "n": np.int64(0),
            }
        )

    skel = docs_ds.map_batches(skeleton, batch_format="pandas")

    def assemble(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, g in bucket.groupby("doc_id", sort=False):
            keep = g[g["kind"] == 0].sort_values("pos", kind="mergesort")
            rows.append(
                (
                    int(did),
                    "\n".join(keep["line"].tolist()),
                    int(len(keep)),
                    int(g[g["kind"] == 1]["n"].sum()),
                )
            )
        return pd.DataFrame(
            rows, columns=["doc_id", "text", "n_kept", "n_dropped"]
        ).astype({"doc_id": np.int64, "n_kept": np.int64, "n_dropped": np.int64})

    return bucketed_group_agg(survivors.union(skel), ["doc_id"], assemble)
