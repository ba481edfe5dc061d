"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup (task brief: first-class at 100 TB).

Scale shapes:
  * exact: content-hash column -> groupby(hash) -> per-group first.  The
    shuffle moves (hash, doc_id) pairs, never the text, when
    ``keys_only=True``.
  * MinHash+LSH: shingle -> minhash signature per doc (vectorized) ->
    explode to (band_id, band_hash) rows -> groupby(band) -> candidate
    pairs -> exact-Jaccard verify.  Classic mergeable-sketch pattern.
  * SimHash / fingerprints: per-batch vectorized, no shuffle.
  * last-write-wins: the reference's per-_id upsert semantics
    (SURVEY §2 E1, router D2) generalized to any (key, ts, seq) stream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from kafka_es_ray.functions.hashing import stable_hash64
from kafka_es_ray.pipelines.sampling import seeded_sample_ds
from kafka_es_ray.runtime import stage_pool
from kafka_es_ray.functions.tokenizer import get_analyzer

# ---------------------------------------------------------------- exact


def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """One survivor per distinct text: (doc_id=min id, n_copies).

    Hash-partition + per-group first — the exact-dedup rule the reference
    gets from ES doc-id upsert (SURVEY §2.5 'Set ops / dedup')."""

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "h": stable_hash64(batch[text_col].to_numpy()).astype(np.uint64),
                id_col: batch[id_col].astype(np.int64),
            }
        )

    def first_per_key(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("h", as_index=False).agg(
            doc_id=(id_col, "min"), n_copies=(id_col, "size")
        )
        return g[["doc_id", "n_copies"]].astype(np.int64)

    # the shuffle moves only (hash, id) pairs — never the text; bucketed
    # combine keeps group count at B, not |distinct texts|
    hashed = docs_ds.map_batches(add_hash, batch_format="pandas", batch_size=8192)
    return bucketed_group_agg(hashed, ["h"], first_per_key)


# ------------------------------------------- benchmark contamination


def _batch_ngrams(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, gram) arrays of every token n-gram in the batch —
    vectorized: flat token stream + object-array string concat; a gram is
    valid when its n tokens share one doc (doc idx is block-sorted)."""
    from itertools import chain

    an = get_analyzer("en")  # ascii_v1 == SQL tokenizer
    toks = an.tokenize_series(texts)
    n_per = toks.map(len).to_numpy(dtype=np.int64)
    total = int(n_per.sum())
    if total < n:
        return np.array([], dtype=np.int64), np.array([], dtype=object)
    flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
    doc = np.repeat(np.arange(n_per.size, dtype=np.int64), n_per)
    valid = doc[: total - n + 1] == doc[n - 1 :]
    grams = flat[: total - n + 1].copy()
    for j in range(1, n):
        grams = grams + " "
        grams = grams + flat[j : total - n + 1 + j]
    return doc[: total - n + 1][valid], grams[valid]


class _BenchNgramPartial:
    """Per-batch DISTINCT benchmark n-grams (combiner before the driver
    union — the benchmark side is small by contract)."""

    def __init__(self, n: int, text_col: str):
        self.n, self.text_col = n, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _, grams = _batch_ngrams(batch[self.text_col], self.n)
        return pd.DataFrame({"g": pd.unique(grams)})


class _ContaminationStage:
    """Actor-pool stage: per-doc count of DISTINCT n-grams shared with
    the broadcast benchmark set (ray.put once, read per actor — the M6
    broadcast-lookup rule; the benchmark set is a test/eval corpus,
    orders of magnitude smaller than the training corpus)."""

    def __init__(self, bench_ref, n: int, id_col: str, text_col: str):
        import ray

        self.bench = set(ray.get(bench_ref).tolist())
        self.n, self.id_col, self.text_col = n, id_col, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc, grams = _batch_ngrams(batch[self.text_col], self.n)
        n_shared = np.zeros(len(batch), dtype=np.int64)
        if grams.size:
            dg = pd.DataFrame({"d": doc, "g": grams}).drop_duplicates()
            hit = dg[dg["g"].isin(self.bench)]
            if len(hit):
                cnt = hit.groupby("d").size()
                n_shared[cnt.index.to_numpy()] = cnt.to_numpy()
        return pd.DataFrame(
            {
                "doc_id": batch[self.id_col].astype(np.int64),
                "n_shared": n_shared,
                "contaminated": (n_shared > 0).astype(np.int64),
            }
        )


def contamination_check(
    docs_ds, bench_ds, n: int = 4, id_col: str = "doc_id", text_col: str = "text"
):
    """Benchmark-contamination check (the GPT-3/Gopher eval-leakage
    scan): for each training doc, the number of distinct token n-grams it
    shares with the benchmark corpus, plus a contaminated flag.  The
    benchmark n-gram set is gathered distributed (per-batch distinct
    partials), unioned on the driver, and broadcast once — the corpus
    side streams, nothing shuffles."""
    import ray

    bench_parts = bench_ds.map_batches(
        _BenchNgramPartial,
        fn_constructor_args=(n, text_col),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    ).to_pandas()
    bench = np.sort(pd.unique(bench_parts["g"])) if len(bench_parts) else np.array([], dtype=object)
    bench_ref = ray.put(bench)
    return docs_ds.map_batches(
        _ContaminationStage,
        fn_constructor_args=(bench_ref, n, id_col, text_col),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )


# ------------------------------------------------------- last-write-wins


def last_write_wins(ds, key_col: str, order_cols: list[str]):
    """Latest row per key by order_cols desc (ties -> later order col desc).

    The BulkAction upsert stream resolution: same routing key co-located,
    winner = max sequence (reference D2/E1; we carry explicit seq columns,
    SURVEY §4 'Ordering')."""

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    def latest_per_key(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(order_cols, ascending=False, kind="mergesort")
        return b.groupby(key_col, as_index=False).head(1)

    return bucketed_group_agg(ds, [key_col], latest_per_key)


# ------------------------------------------------------------- minhash


_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(tokens: list[str], shingle: int) -> np.ndarray:
    if len(tokens) < shingle:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i : i + shingle]) for i in range(len(tokens) - shingle + 1)]
    if not joined:
        return np.array([], dtype=np.uint64)
    return np.unique(stable_hash64(np.asarray(joined, dtype=object)))


class MinHashStage:
    """Per-doc minhash signature (num_perm permutations over w-shingles),
    exploded to (band_id, band_hash, doc_id) rows for LSH bucketing."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 3):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.shingle = num_perm, bands, shingle
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm)
        self.an = get_analyzer("en")

    def signature(self, text: str) -> np.ndarray | None:
        sh = _shingle_hashes(self.an.tokenize(text or ""), self.shingle)
        if sh.size == 0:
            return None
        # (a*x + b) mod p, min over shingles, vectorized (num_perm x n)
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    # Doc-aligned shingle budget per affine pass: bounds the (num_perm x
    # chunk) uint64 temporaries to ~64 MB regardless of batch text volume.
    _CHUNK_SHINGLES = 1 << 17

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # Vectorized (round-3 verdict #3, the _postings_from_tokens shape):
        # flat shingle-byte stream for the WHOLE batch -> ONE stable_hash64
        # call -> chunked (num_perm x n) affine pass with per-doc
        # np.minimum.reduceat -> ONE band-hash call.  Token-identical to
        # the old per-row loop: bytes tokens joined with b" " hash equal to
        # their str counterparts (pandas hashes str via utf-8), and min
        # over the shingle multiset == min over the uniqued set.
        doc_ids = batch["doc_id"].to_numpy(np.int64)
        toks = self.an.tokenize_series_bytes(batch["text"]).tolist()
        w = self.shingle
        shingles: list[bytes] = []
        counts = np.zeros(len(toks), dtype=np.int64)
        for di, lst in enumerate(toks):
            n = len(lst)
            if n == 0:
                continue
            if n < w:
                shingles.append(b" ".join(lst))
                counts[di] = 1
            else:
                shingles.extend(b" ".join(lst[i : i + w]) for i in range(n - w + 1))
                counts[di] = n - w + 1
        keep = counts > 0
        empty = pd.DataFrame(
            {
                "band_id": pd.Series([], dtype=np.int32),
                "band_hash": pd.Series([], dtype=np.uint64),
                "doc_id": pd.Series([], dtype=np.int64),
            }
        )
        if not keep.any():
            return empty
        hashes = stable_hash64(np.asarray(shingles, dtype=object))
        kept_counts = counts[keep]
        kept_ids = doc_ids[keep]
        nd = kept_ids.size
        ends = np.cumsum(kept_counts)
        starts = ends - kept_counts
        sig = np.empty((nd, self.num_perm), dtype=np.uint64)
        a, b = self.a[:, None], self.b[:, None]
        big_m = np.uint64(_MERSENNE)
        c0 = 0
        while c0 < nd:
            c1 = c0 + 1
            tot = kept_counts[c0]
            while c1 < nd and tot + kept_counts[c1] <= self._CHUNK_SHINGLES:
                tot += kept_counts[c1]
                c1 += 1
            lo = starts[c0]
            v = (a * hashes[None, lo : ends[c1 - 1]] + b) % big_m
            sig[c0:c1] = np.minimum.reduceat(v, starts[c0:c1] - lo, axis=1).T
            c0 = c1
        # band bytes: C-order buffer of the (nd*bands, rows_per_band)
        # matrix == the per-doc band.tobytes() concatenation
        buf = sig.tobytes()
        step = self.rows_per_band * 8
        rows = np.empty(nd * self.bands, dtype=object)
        for i in range(rows.size):
            rows[i] = buf[i * step : (i + 1) * step]
        return pd.DataFrame(
            {
                "band_id": np.tile(np.arange(self.bands, dtype=np.int32), nd),
                "band_hash": stable_hash64(rows),
                "doc_id": np.repeat(kept_ids, self.bands),
            }
        )


def minhash_candidates(docs_ds, num_perm: int = 64, bands: int = 16, shingle: int = 3):
    """LSH candidate pairs: docs sharing any band bucket.  Returns
    (doc_a, doc_b) with doc_a < doc_b, distinct."""
    sig = docs_ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle": shingle},
        batch_format="pandas",
        batch_size=2048,
        concurrency=stage_pool(),
    )

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in bucket.groupby(["band_id", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            if len(g) > 200:
                # hot-bucket cap (mirrors the n-gram df ceiling below): a
                # degenerate band bucket — empty docs, boilerplate — would
                # emit k² pairs; keep the first 200 ids (sorted, so the
                # kept candidate set is deterministic)
                g = g.nsmallest(200, "doc_id")
            ids = np.sort(g["doc_id"].to_numpy())
            i, j = np.triu_indices(ids.size, k=1)
            out_a.append(ids[i])
            out_b.append(ids[j])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)})

    def dedupe_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(["doc_a", "doc_b"])

    cand = bucketed_group_agg(sig, ["band_id", "band_hash"], pairs_in_bucket)
    # dedupe pairs found in multiple bands
    return bucketed_group_agg(cand, ["doc_a", "doc_b"], dedupe_pairs)


def minhash_dedup(docs_ds, threshold: float = 0.8, num_perm: int = 64, bands: int = 16, shingle: int = 3):
    """Candidates + exact shingle-Jaccard verification >= threshold —
    fully DISTRIBUTED: candidate docs' shingle sets and candidate pairs
    are co-routed through two bucketed exchanges (join-on-member-doc,
    then group-by-pair); no shingle data ever materializes on the driver.
    The only driver-side object is the ids-only candidate set broadcast
    (``ray.put``) used to prune the shingle scan — the documented
    candidate-set << corpus assumption of LSH dedup."""
    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    # pairs are consumed twice (ids-only reduce + join rows): materialize
    # the small pair table instead of recomputing the whole LSH pipeline
    cand = minhash_candidates(docs_ds, num_perm, bands, shingle).materialize()

    def member_ids(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": np.unique(
                    np.concatenate(
                        [b["doc_a"].to_numpy(np.int64), b["doc_b"].to_numpy(np.int64)]
                    )
                )
            }
        )

    need_df = cand.map_batches(member_ids, batch_format="pandas").to_pandas()
    if need_df.empty:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype=np.int64),
                "doc_b": pd.Series([], dtype=np.int64),
                "jaccard": pd.Series([], dtype=np.float64),
            }
        )
    need_ref = ray.put(np.unique(need_df["doc_id"].to_numpy(np.int64)))

    class CandidateShingles:
        """Shingle-set blobs for candidate docs only (vectorized np.isin
        membership filter; analyzer built once per actor)."""

        def __init__(self):
            self.an = get_analyzer("en")
            self.need = ray.get(need_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["doc_id"].to_numpy().astype(np.int64)
            keep = np.isin(ids, self.need)
            ids = ids[keep]
            toks = self.an.tokenize_series(batch["text"].reset_index(drop=True)[keep])
            blobs = [_shingle_hashes(t, shingle).tobytes() for t in toks]
            return pd.DataFrame(
                {
                    "jkey": pd.Series(ids, dtype=np.int64),
                    "doc_a": pd.Series(np.full(ids.size, -1), dtype=np.int64),
                    "doc_b": pd.Series(np.full(ids.size, -1), dtype=np.int64),
                    "blob": pd.Series(blobs, dtype=object),
                }
            )

    def pair_member_rows(b: pd.DataFrame) -> pd.DataFrame:
        a = b["doc_a"].to_numpy(np.int64)
        d = b["doc_b"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "jkey": np.concatenate([a, d]),
                "doc_a": np.concatenate([a, a]),
                "doc_b": np.concatenate([d, d]),
                "blob": pd.Series([b""] * (2 * a.size), dtype=object),
            }
        )

    def attach_blob(bucket: pd.DataFrame) -> pd.DataFrame:
        is_doc = (bucket["doc_a"] < 0).to_numpy()
        m = dict(zip(bucket["jkey"].to_numpy()[is_doc], bucket["blob"].to_numpy()[is_doc]))
        left = bucket[~is_doc]
        blobs = left["jkey"].map(m)
        ok = ~blobs.isna().to_numpy()
        return pd.DataFrame(
            {
                "doc_a": left["doc_a"].to_numpy(np.int64)[ok],
                "doc_b": left["doc_b"].to_numpy(np.int64)[ok],
                "member": left["jkey"].to_numpy(np.int64)[ok],
                "blob": blobs.to_numpy()[ok],
            }
        )

    def verify_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for (a, d), g in bucket.groupby(["doc_a", "doc_b"], sort=False):
            if len(g) < 2:
                continue  # a member had no shingles -> jaccard 0
            g = g.sort_values("member")
            sa = np.frombuffer(g["blob"].iloc[0], dtype=np.uint64)
            sb = np.frombuffer(g["blob"].iloc[1], dtype=np.uint64)
            if sa.size == 0 and sb.size == 0:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            jac = inter / (sa.size + sb.size - inter) if (sa.size + sb.size - inter) else 0.0
            if jac >= threshold:
                out_a.append(int(a))
                out_b.append(int(d))
                out_j.append(jac)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype=np.int64),
                "doc_b": pd.Series(out_b, dtype=np.int64),
                "jaccard": pd.Series(out_j, dtype=np.float64),
            }
        )

    members = cand.map_batches(pair_member_rows, batch_format="pandas")
    blobs = docs_ds.map_batches(
        CandidateShingles, batch_format="pandas", batch_size=2048, concurrency=stage_pool()
    )
    joined = bucketed_group_agg(members.union(blobs), ["jkey"], attach_blob)
    return bucketed_group_agg(joined, ["doc_a", "doc_b"], verify_bucket)


# -------------------------------------------------- exact n-gram Jaccard


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.2, shingle: int = 3):
    """EXACT n-gram-Jaccard similar pairs (no LSH): explode distinct
    shingles -> groupby(shingle) pairs -> count shared per pair ->
    jaccard vs broadcast set sizes.  SQL-oracle-checkable.

    Partitioning assumption (documented): no single shingle is shared by
    a huge number of docs — a k-hot shingle produces k² pair rows.  At
    100 TB boilerplate shingles must be capped (df ceiling) or routed to
    the MinHash path; here the cap is explicit.

    Set sizes are joined in as ROWS through bucketed exchanges (route
    pair rows and size rows by the same member-doc hash) — no O(corpus)
    driver dict, no broadcast of per-doc state."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    class ShingleStage:
        """Exploded DISTINCT shingle hashes per doc — vectorized (the
        MinHashStage shape, round-4 verdict #2): flat shingle-byte
        stream for the whole batch -> ONE stable_hash64 call ->
        per-doc dedupe via lexsort + neighbor mask.  Hash-identical to
        the old per-row ``_shingle_hashes`` loop (bytes tokens joined
        with b" " hash equal to their str counterparts; np.unique per
        doc == the neighbor mask on the doc-sorted stream)."""

        def __init__(self):
            self.an = get_analyzer("en")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            doc_ids = batch["doc_id"].to_numpy(np.int64)
            toks = self.an.tokenize_series_bytes(batch["text"]).tolist()
            w = shingle
            shingles: list[bytes] = []
            counts = np.zeros(len(toks), dtype=np.int64)
            for di, lst in enumerate(toks):
                n = len(lst)
                if n == 0:
                    continue
                if n < w:
                    shingles.append(b" ".join(lst))
                    counts[di] = 1
                else:
                    shingles.extend(
                        b" ".join(lst[i : i + w]) for i in range(n - w + 1)
                    )
                    counts[di] = n - w + 1
            if not shingles:
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype=np.int64),
                        "sh": pd.Series([], dtype=np.uint64),
                    }
                )
            hashes = stable_hash64(np.asarray(shingles, dtype=object))
            docs_rep = np.repeat(doc_ids, counts)
            order = np.lexsort((hashes, docs_rep))
            dr, hr = docs_rep[order], hashes[order]
            keep = np.ones(hr.size, dtype=bool)
            keep[1:] = (dr[1:] != dr[:-1]) | (hr[1:] != hr[:-1])
            return pd.DataFrame({"doc_id": dr[keep], "sh": hr[keep]})

    # exploded shingle rows feed two consumers (sizes + co-occurrence):
    # materialize once instead of tokenizing the corpus twice
    exploded = docs_ds.map_batches(
        ShingleStage, batch_format="pandas", batch_size=2048, concurrency=stage_pool()
    ).materialize()

    # set sizes as a DATASET: distinct shingles per doc (bucketed combine)
    def size_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("doc_id", as_index=False).agg(n=("sh", "size"))
        return g.astype({"doc_id": np.int64, "n": np.int64})

    sizes = bucketed_group_agg(exploded, ["doc_id"], size_bucket).materialize()

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        # Vectorized pair explosion (round-5): the former per-shingle
        # Python loop (groupby + triu per group) dominated the whole
        # dedup_clusters pipeline at 100k docs; a C-speed self-merge on
        # sh emits the IDENTICAL pair multiset (doc_a < doc_b per shared
        # shingle; downstream is an order-free count).  The hot-shingle
        # cap applies BEFORE the merge, bounding the blow-up at
        # cap x |bucket| rows.
        cnt = bucket.groupby("sh")["doc_id"].transform("size").to_numpy()
        b = bucket[(cnt >= 2) & (cnt <= 200)]
        if not len(b):
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype=np.int64),
                    "doc_b": pd.Series([], dtype=np.int64),
                }
            )
        m = b.merge(b, on="sh")
        keep = m["doc_id_x"].to_numpy() < m["doc_id_y"].to_numpy()
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_x"].to_numpy(np.int64)[keep],
                "doc_b": m["doc_id_y"].to_numpy(np.int64)[keep],
            }
        )

    def count_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["doc_a", "doc_b"], as_index=False).size()
        return pd.DataFrame(
            {
                "doc_a": g["doc_a"].astype(np.int64),
                "doc_b": g["doc_b"].astype(np.int64),
                "inter": g["size"].astype(np.int64),
            }
        )

    shared = bucketed_group_agg(exploded, ["sh"], pairs_in_bucket)
    counts = bucketed_group_agg(shared, ["doc_a", "doc_b"], count_bucket)

    # ---- size joins: route pair rows + size rows by the member doc hash.
    # Common row schema (jkey, doc_a, doc_b, inter, n); size rows are
    # marked doc_a = -1.
    def counts_keyed_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "jkey": b["doc_a"].astype(np.int64),
                "doc_a": b["doc_a"].astype(np.int64),
                "doc_b": b["doc_b"].astype(np.int64),
                "inter": b["inter"].astype(np.int64),
                "n": pd.Series(np.zeros(len(b)), dtype=np.int64),
            }
        )

    def sizes_as_rows(b: pd.DataFrame) -> pd.DataFrame:
        z = pd.Series(np.full(len(b), -1), dtype=np.int64)
        return pd.DataFrame(
            {
                "jkey": b["doc_id"].astype(np.int64),
                "doc_a": z,
                "doc_b": z,
                "inter": pd.Series(np.zeros(len(b)), dtype=np.int64),
                "n": b["n"].astype(np.int64),
            }
        )

    def attach_size(col_out: str):
        def _attach(bucket: pd.DataFrame) -> pd.DataFrame:
            is_size = (bucket["doc_a"] < 0).to_numpy()
            m = dict(
                zip(bucket["jkey"].to_numpy()[is_size], bucket["n"].to_numpy()[is_size])
            )
            left = bucket[~is_size]
            out = pd.DataFrame(
                {
                    "doc_a": left["doc_a"].to_numpy(np.int64),
                    "doc_b": left["doc_b"].to_numpy(np.int64),
                    "inter": left["inter"].to_numpy(np.int64),
                    col_out: left["jkey"].map(m).fillna(0).to_numpy(np.int64),
                }
            )
            if "n_a" in left.columns:
                out["n_a"] = left["n_a"].to_numpy(np.int64)
            return out

        return _attach

    with_sa = bucketed_group_agg(
        counts.map_batches(counts_keyed_a, batch_format="pandas").union(
            sizes.map_batches(sizes_as_rows, batch_format="pandas")
        ),
        ["jkey"],
        attach_size("n_a"),
    )

    def pairs_keyed_b(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "jkey": b["doc_b"].astype(np.int64),
                "doc_a": b["doc_a"].astype(np.int64),
                "doc_b": b["doc_b"].astype(np.int64),
                "inter": b["inter"].astype(np.int64),
                "n": pd.Series(np.zeros(len(b)), dtype=np.int64),
                "n_a": b["n_a"].astype(np.int64),
            }
        )

    def sizes_as_rows_b(b: pd.DataFrame) -> pd.DataFrame:
        out = sizes_as_rows(b)
        out["n_a"] = pd.Series(np.zeros(len(b)), dtype=np.int64)
        return out

    with_both = bucketed_group_agg(
        with_sa.map_batches(pairs_keyed_b, batch_format="pandas").union(
            sizes.map_batches(sizes_as_rows_b, batch_format="pandas")
        ),
        ["jkey"],
        attach_size("n_b"),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        inter = b["inter"].to_numpy(np.float64)
        sa = b["n_a"].to_numpy(np.float64)
        sb = b["n_b"].to_numpy(np.float64)
        jac = inter / (sa + sb - inter)
        jac = np.floor(jac * 1e6 + 0.5) / 1e6
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "doc_a": b["doc_a"].to_numpy(np.int64)[keep],
                "doc_b": b["doc_b"].to_numpy(np.int64)[keep],
                "jaccard": jac[keep],
            }
        )

    return with_both.map_batches(finish, batch_format="pandas")


# ------------------------------------------------------------- simhash


class SimHashStage:
    """64-bit SimHash over token hashes — per-batch vectorized, no
    shuffle; near-dups = small Hamming distance.

    Term hash contract (SQL-oracle parity): h(t) = little-endian uint64 of
    md5(utf8(t)) bytes [8:16] == DuckDB ``md5_number_lower(t)`` — verified
    against DuckDB 1.0.  The output is the uint64 simhash REINTERPRETED as
    int64 (two's-complement wrap), matching the oracle's HUGEINT-
    accumulate-then-wrap cast, so both sides compare as plain BIGINT."""

    def __init__(self):
        self.an = get_analyzer("en")
        self.bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
        self._hcache: dict[str, int] = {}

    def _hash_terms(self, terms: np.ndarray) -> np.ndarray:
        # md5 per UNIQUE term with a cross-batch cache: corpus vocabulary
        # is tiny relative to the token stream, so the digest cost amortizes
        if len(self._hcache) > 1_000_000:
            self._hcache.clear()
        c = self._hcache
        out = np.empty(terms.size, dtype=np.uint64)
        for i, t in enumerate(terms):
            h = c.get(t)
            if h is None:
                h = int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little")
                c[t] = h
            out[i] = h
        return out

    def simhash(self, tokens: list[str]) -> int:
        if not tokens:
            return 0
        terms, tf = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
        h = self._hash_terms(terms)
        bits = ((h[:, None] & self.bits) != 0).astype(np.int64)  # (n_terms, 64)
        v = (bits * 2 - 1).T @ tf  # weighted bit votes
        return int(int((self.bits[0][v > 0]).sum().astype(np.uint64)))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = self.an.tokenize_series(batch["text"])
        u64 = np.array([self.simhash(t) for t in toks], dtype=np.uint64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "simhash": u64.view(np.int64),
            }
        )


def simhash64(docs_ds):
    return docs_ds.map_batches(SimHashStage, batch_format="pandas", batch_size=4096, concurrency=stage_pool())


# ------------------------------------------------- embedding near-dup


def embedding_neardup(
    emb_ds,
    threshold: float = 0.95,
    nbits: int = 8,
    tables: int = 4,
    max_bucket: int = 4096,
):
    """Approximate cosine >= threshold pairs — the SCALE path: ``tables``
    independent random-hyperplane LSH tables (nbits sign bits each);
    vectors sharing a bucket in ANY table are compared within-bucket
    (vectorized matmul per group), pairs deduped across tables.  No
    all-pairs matmul, no driver materialization; shuffle volume =
    tables x corpus rows.  Recall < 1 by construction — measured against
    ``embedding_neardup_exact`` (the all-pairs oracle) in tests; recall
    rises with ``tables`` and falls with ``nbits``.
    Returns Dataset (vec_a, vec_b, sim) with vec_a < vec_b, sim rounded
    6dp; hot buckets capped at ``max_bucket`` ids (deterministic)."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    class MultiTableLsh:
        """Planes built lazily on the first batch (dim from data), fixed
        seed — deterministic across workers and runs."""

        def __init__(self):
            self.planes: list[np.ndarray] | None = None
            self.w = (np.uint64(1) << np.arange(nbits, dtype=np.uint64)).astype(np.int64)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            if self.planes is None:
                rng = np.random.default_rng(23)
                self.planes = [
                    rng.standard_normal((m.shape[1], nbits)) for _ in range(tables)
                ]
            ids = batch["vec_id"].to_numpy(np.int64)
            frames = []
            for t, planes in enumerate(self.planes):
                bucket = ((m @ planes) > 0) @ self.w
                frames.append(
                    pd.DataFrame(
                        {
                            "table": pd.Series(np.full(ids.size, t), dtype=np.int16),
                            "bucket": pd.Series(bucket, dtype=np.int64),
                            "vec_id": pd.Series(ids, dtype=np.int64),
                            "nv": pd.Series(list(m), dtype=object),
                        }
                    )
                )
            return pd.concat(frames, ignore_index=True)

    def pairs_in_bucket(bucket_df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in bucket_df.groupby(["table", "bucket"], sort=False):
            if len(g) < 2:
                continue
            if len(g) > max_bucket:
                g = g.nsmallest(max_bucket, "vec_id")
            ids = g["vec_id"].to_numpy(np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            m = np.stack(g["nv"].to_numpy())[order]
            sims = m @ m.T
            iu, ju = np.triu_indices(ids.size, k=1)
            # round-6 BEFORE thresholding (DuckDB-oracle parity rule)
            simr = np.floor(sims[iu, ju] * 1e6 + 0.5) / 1e6
            mask = simr >= threshold
            if not mask.any():
                continue
            out.append(
                pd.DataFrame(
                    {
                        "vec_a": ids[iu[mask]],
                        "vec_b": ids[ju[mask]],
                        "sim": simr[mask],
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype=np.int64),
                    "vec_b": pd.Series([], dtype=np.int64),
                    "sim": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(out, ignore_index=True)

    def dedupe(bucket_df: pd.DataFrame) -> pd.DataFrame:
        return bucket_df.drop_duplicates(["vec_a", "vec_b"])

    tagged = emb_ds.map_batches(
        MultiTableLsh, batch_format="pandas", batch_size=4096, concurrency=stage_pool()
    )
    pairs = bucketed_group_agg(tagged, ["table", "bucket"], pairs_in_bucket)
    return bucketed_group_agg(pairs, ["vec_a", "vec_b"], dedupe)


def semdedup(
    emb_ds,
    threshold: float = 0.95,
    nlist: int = 32,
    train_size: int = 10_000,
    max_cluster: int = 8192,
):
    """Semantic dedup (the SemDeDup recipe, Abbas et al. 2023, public):
    k-means-cluster the embeddings with a sampled spherical quantizer,
    then find cosine >= threshold pairs WITHIN each cluster only — the
    published scale answer to all-pairs: work drops from O(N²) to
    sum over clusters of O(|c|²), and only (cluster, vec) rows shuffle.
    Approximate by construction (cross-cluster near-dups are missed;
    recall vs the exact oracle measured in tests, rises with fewer
    clusters).  Returns Dataset (vec_a, vec_b, sim), vec_a < vec_b,
    sim rounded 6dp; hot clusters capped at ``max_cluster`` members
    (deterministic by vec_id) with the cap logged in the row count."""
    from kafka_es_ray.pipelines.ann import _kmeans_spherical, _normalize
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    train = seeded_sample_ds(emb_ds, "vec_id", int(train_size), prefix="train:")
    centroids = _kmeans_spherical(
        _normalize(np.stack(train["embedding"].to_numpy())), nlist
    )

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        return pd.DataFrame(
            {
                "cluster": np.argmax(m @ centroids.T, axis=1).astype(np.int64),
                "vec_id": batch["vec_id"].astype(np.int64),
                "embedding": batch["embedding"],
            }
        )

    assigned = emb_ds.map_batches(assign, batch_format="pandas", batch_size=4096)

    def pairs_in_cluster(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in bucket.groupby("cluster", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("vec_id").head(max_cluster)
            ids = g["vec_id"].to_numpy(np.int64)
            m = _normalize(np.stack(g["embedding"].to_numpy()))
            sim = m @ m.T
            a, b = np.triu_indices(len(g), k=1)
            s = np.floor(sim[a, b] * 1e6 + 0.5) / 1e6
            keep = s >= threshold
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {"vec_a": ids[a[keep]], "vec_b": ids[b[keep]], "sim": s[keep]}
                    )
                )
        if not out:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype=np.int64),
                    "vec_b": pd.Series([], dtype=np.int64),
                    "sim": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_agg(assigned, ["cluster"], pairs_in_cluster)


def embedding_neardup_exact(emb_ds, threshold: float = 0.95):
    """EXACT cosine >= threshold pairs: the corpus matrix is broadcast
    once (``ray.put``) and every batch matmuls against it — distributed
    over batches, O(N²) work by definition (all-pairs is inherently
    quadratic; this is the TEST-SCALE ORACLE for embedding_neardup; the
    broadcast-whole-corpus step is the documented scale limit).
    Returns Dataset (vec_a, vec_b, sim), vec_a < vec_b, sim rounded 6dp."""
    import ray

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].astype(np.int64), "nv": pd.Series(list(m), dtype=object)}
        )

    normed = emb_ds.map_batches(norm, batch_format="pandas", batch_size=4096).materialize()
    all_df = normed.to_pandas()  # ids + normalized matrix, broadcast once
    all_ids = all_df["vec_id"].to_numpy(np.int64)
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    corpus_ref = ray.put((all_ids, np.stack(all_df["nv"].to_numpy())[order]))

    class PairScan:
        def __init__(self):
            self.ids, self.m = ray.get(corpus_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["vec_id"].to_numpy(np.int64)
            m = np.stack(batch["nv"].to_numpy())
            sims = m @ self.m.T  # (batch, corpus)
            simr = np.floor(sims * 1e6 + 0.5) / 1e6  # round-6 pre-threshold
            # keep only pairs with batch id < corpus id (each pair once)
            lt = ids[:, None] < self.ids[None, :]
            hit = (simr >= threshold) & lt
            bi, ci = np.nonzero(hit)
            return pd.DataFrame(
                {
                    "vec_a": ids[bi],
                    "vec_b": self.ids[ci],
                    "sim": simr[bi, ci],
                }
            )

    return normed.map_batches(PairScan, batch_format="pandas", batch_size=1024, concurrency=stage_pool())


# ------------------------------------- duplicate clustering (components)


def _edge_signature(edges_ds) -> tuple[int, int]:
    """(count, xor-hash) of an edge Dataset — the convergence scalar.
    Driver sees one tiny partial row per block, never the edges."""

    def part(b: pd.DataFrame) -> pd.DataFrame:
        h = stable_hash64(b["u"].to_numpy()) * np.uint64(
            0x9E3779B97F4A7C15
        ) + stable_hash64(b["v"].to_numpy())
        x = int(np.bitwise_xor.reduce(h)) if len(h) else 0
        return pd.DataFrame({"n": [len(b)], "x": [np.uint64(x)]})

    parts = edges_ds.map_batches(part, batch_format="pandas").to_pandas()
    if parts.empty:
        return 0, 0
    return int(parts["n"].sum()), int(np.bitwise_xor.reduce(parts["x"].to_numpy()))


def connected_components(pairs_ds, nodes_ds, max_iters: int = 30):
    """Connected components over a duplicate-pair edge list -> one row
    (doc_id, cluster_id) per node, cluster_id = MIN doc_id reachable.

    Algorithm: alternating large-star / small-star contractions (Kiveris
    et al., "Connected Components in MapReduce and Beyond", ACM SoCC
    2014 — the standard MapReduce CC algorithm).  Each half-round is ONE
    bucketed exchange over the EDGE set (pairs, never the corpus); edges
    monotonically bend toward each component's minimum node and the set
    converges to per-component star graphs in O(log n) rounds.  The
    driver sees only the per-round (count, hash) convergence scalar.

    Scale notes: edge volume is the dedup-pair set (<< corpus); each
    input edge emits at most one output edge per half-round (+1 per
    distinct hub in small-star), so rounds never blow up; duplicates are
    thinned per-bucket each round and cannot affect per-node mins.
    ``nodes_ds`` (one ``doc_id`` column) supplies singleton docs, which
    never enter the exchanges.
    """
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": b["doc_a"].to_numpy(np.int64),
                "v": b["doc_b"].to_numpy(np.int64),
            }
        )

    def large_star_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # input rows symmetrized: every (u, v) once per direction.
        # emit (v, m) for v > u where m = min(N(u) ∪ {u})
        g = g.drop_duplicates()
        u = g["u"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        m = np.minimum(g.groupby("u", sort=False)["v"].transform("min").to_numpy(np.int64), u)
        keep = v > u
        return pd.DataFrame({"u": v[keep], "v": m[keep]}).drop_duplicates()

    def small_star_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # input rows oriented u > v.  m = min(N(u) ∪ {u}) = min(v)s;
        # emit (x, m) for x ∈ N(u) ∪ {u} \ {m}
        g = g.drop_duplicates()
        u = g["u"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        m = g.groupby("u", sort=False)["v"].transform("min").to_numpy(np.int64)
        keep = v != m
        hubs = g.groupby("u", sort=False)["v"].min().reset_index()
        out = pd.DataFrame(
            {
                "u": np.concatenate([v[keep], hubs["u"].to_numpy(np.int64)]),
                "v": np.concatenate([m[keep], hubs["v"].to_numpy(np.int64)]),
            }
        )
        return out.drop_duplicates()

    def symmetrize(b: pd.DataFrame) -> pd.DataFrame:
        u = b["u"].to_numpy(np.int64)
        v = b["v"].to_numpy(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pd.DataFrame(
            {"u": np.concatenate([u, v]), "v": np.concatenate([v, u])}
        )

    def orient_max_first(b: pd.DataFrame) -> pd.DataFrame:
        u = b["u"].to_numpy(np.int64)
        v = b["v"].to_numpy(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pd.DataFrame({"u": np.maximum(u, v), "v": np.minimum(u, v)})

    edges = pairs_ds.map_batches(to_edges, batch_format="pandas").materialize()
    sig = None
    if edges.count():
        for _ in range(max_iters):
            ls_in = edges.map_batches(symmetrize, batch_format="pandas")
            edges = bucketed_group_agg(ls_in, ["u"], large_star_bucket)
            ss_in = edges.map_batches(orient_max_first, batch_format="pandas")
            edges = bucketed_group_agg(ss_in, ["u"], small_star_bucket).materialize()
            new_sig = _edge_signature(edges)
            if new_sig == sig:
                break
            sig = new_sig

    # label assembly: per-node min over (self ∪ neighbors) — converged
    # star edges already point at roots, the min is just belt+braces
    def edge_label_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = symmetrize(b)
        return pd.DataFrame({"doc_id": s["u"], "cand": s["v"]})

    def node_label_rows(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": ids, "cand": ids})

    def min_label(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("doc_id", as_index=False).agg(cluster_id=("cand", "min"))
        return g.astype({"doc_id": np.int64, "cluster_id": np.int64})

    rows = nodes_ds.map_batches(node_label_rows, batch_format="pandas").union(
        edges.map_batches(edge_label_rows, batch_format="pandas")
    )
    return bucketed_group_agg(rows, ["doc_id"], min_label)


def dedup_clusters(docs_ds, threshold: float = 0.2, shingle: int = 3):
    """Training-data dedup clustering: n-gram-Jaccard duplicate pairs ->
    connected components -> (doc_id, cluster_id) for EVERY document
    (singletons are their own cluster).  Keeping rows where
    doc_id == cluster_id is the canonical keep-one-per-cluster filter."""
    pairs = ngram_jaccard_pairs(docs_ds, threshold=threshold, shingle=shingle)

    def ids_only(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64)})

    nodes = docs_ds.map_batches(ids_only, batch_format="pandas")
    return connected_components(pairs, nodes)


def decontaminate(
    docs_ds, bench_ds, n: int = 4, id_col: str = "doc_id",
    text_col: str = "text", max_shared: int = 0,
):
    """The actionable decontamination step atop contamination_check (the
    GPT-3 appendix-C eval-leakage removal): keep only docs sharing at
    most ``max_shared`` distinct token n-grams with the benchmark corpus
    (default 0 = any overlap drops the doc).  Same scale shape — the
    benchmark n-gram set broadcasts once, the corpus streams through the
    score + filter maps, nothing shuffles.  Returns the surviving
    (id, n_shared) rows."""
    scored = contamination_check(docs_ds, bench_ds, n, id_col, text_col)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        out = b[b["n_shared"] <= int(max_shared)]
        return out[[id_col, "n_shared"]]

    return scored.map_batches(keep, batch_format="pandas")
