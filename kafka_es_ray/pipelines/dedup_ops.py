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

import numpy as np
import pandas as pd

from kafka_es_ray.functions.hashing import stable_hash64
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

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(batch["doc_id"].astype(np.int64), batch["text"]):
            sig = self.signature(text)
            if sig is None:
                continue
            bands = sig.reshape(self.bands, self.rows_per_band)
            bh = stable_hash64(np.array([b.tobytes() for b in bands], dtype=object))
            out_doc.extend([int(doc_id)] * self.bands)
            out_band.extend(range(self.bands))
            out_hash.extend(bh.tolist())
        return pd.DataFrame(
            {
                "band_id": pd.Series(out_band, dtype=np.int32),
                "band_hash": pd.Series(out_hash, dtype=np.uint64),
                "doc_id": pd.Series(out_doc, dtype=np.int64),
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
        concurrency=2,
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
    """Candidates + exact n-gram-Jaccard verification >= threshold.

    Verification broadcasts the candidate doc ids' shingle sets via a
    driver-side join at test scale; at 100 TB the verify step is a
    bucketed self-join on candidate ids (documented partitioning
    assumption: candidate set << corpus)."""
    import ray

    cand = minhash_candidates(docs_ds, num_perm, bands, shingle).to_pandas()
    if cand.empty:
        return cand.assign(jaccard=pd.Series([], dtype=np.float64))
    need = np.unique(np.concatenate([cand["doc_a"].to_numpy(), cand["doc_b"].to_numpy()]))
    need_ref = ray.put(set(int(x) for x in need))
    stage_args = {"shingle": shingle}

    def collect(batch: pd.DataFrame) -> pd.DataFrame:
        need_ids = ray.get(need_ref)
        an = get_analyzer("en")
        rows = [
            (int(d), _shingle_hashes(an.tokenize(t or ""), stage_args["shingle"]))
            for d, t in zip(batch["doc_id"].astype(np.int64), batch["text"])
            if int(d) in need_ids
        ]
        return pd.DataFrame(
            {
                "doc_id": pd.Series([r[0] for r in rows], dtype=np.int64),
                "sh": pd.Series([r[1] for r in rows], dtype=object),
            }
        )

    shingles = docs_ds.map_batches(collect, batch_format="pandas", batch_size=4096).to_pandas()
    sh_map = dict(zip(shingles["doc_id"], shingles["sh"]))
    jac = []
    for a_id, b_id in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sh_map.get(int(a_id)), sh_map.get(int(b_id))
        if sa is None or sb is None or sa.size == 0:
            jac.append(0.0)
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        jac.append(inter / (sa.size + sb.size - inter))
    cand = cand.assign(jaccard=np.asarray(jac))
    return cand[cand["jaccard"] >= threshold].reset_index(drop=True)


# -------------------------------------------------- exact n-gram Jaccard


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.2, shingle: int = 3):
    """EXACT n-gram-Jaccard similar pairs (no LSH): explode distinct
    shingles -> groupby(shingle) pairs -> count shared per pair ->
    jaccard vs broadcast set sizes.  SQL-oracle-checkable.

    Partitioning assumption (documented): no single shingle is shared by
    a huge number of docs — a k-hot shingle produces k² pair rows.  At
    100 TB boilerplate shingles must be capped (df ceiling) or routed to
    the MinHash path; here the cap is explicit."""
    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    class ShingleStage:
        def __init__(self):
            self.an = get_analyzer("en")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out_doc, out_sh, sizes_doc, sizes_n = [], [], [], []
            toks = self.an.tokenize_series(batch["text"])
            for doc_id, tok in zip(batch["doc_id"].astype(np.int64), toks):
                sh = _shingle_hashes(tok, shingle)
                out_doc.extend([int(doc_id)] * sh.size)
                out_sh.extend(sh.tolist())
                sizes_doc.append(int(doc_id))
                sizes_n.append(int(sh.size))
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype=np.int64),
                    "sh": pd.Series(out_sh, dtype=np.uint64),
                    # piggyback set sizes as rows with sh sentinel? no —
                    # separate collection below keeps the schema clean
                }
            )

    exploded = docs_ds.map_batches(ShingleStage, batch_format="pandas", batch_size=2048, concurrency=2)

    # set sizes: distinct shingles per doc (small aggregate -> broadcast)
    def size_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("doc_id", as_index=False).agg(n=("sh", "size"))

    sizes = (
        exploded.map_batches(size_partial, batch_format="pandas")
        .to_pandas()
        .groupby("doc_id", as_index=False)["n"]
        .sum()
    )
    sizes_ref = ray.put(dict(zip(sizes["doc_id"].astype(int), sizes["n"].astype(int))))

    def pairs_in_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in bucket.groupby("sh", sort=False):
            if len(g) < 2 or len(g) > 200:  # explicit hot-shingle cap
                continue
            ids = np.sort(g["doc_id"].to_numpy())
            i, j = np.triu_indices(ids.size, k=1)
            out_a.append(ids[i])
            out_b.append(ids[j])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)})

    def jaccard_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        sizes_map = ray.get(sizes_ref)
        g = bucket.groupby(["doc_a", "doc_b"], as_index=False).size()
        inter = g["size"].to_numpy().astype(np.float64)
        sa = g["doc_a"].map(sizes_map).to_numpy(dtype=np.float64)
        sb = g["doc_b"].map(sizes_map).to_numpy(dtype=np.float64)
        jac = inter / (sa + sb - inter)
        jac = np.floor(jac * 1e6 + 0.5) / 1e6
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "doc_a": g["doc_a"].to_numpy()[keep].astype(np.int64),
                "doc_b": g["doc_b"].to_numpy()[keep].astype(np.int64),
                "jaccard": jac[keep],
            }
        )

    shared = bucketed_group_agg(exploded, ["sh"], pairs_in_bucket)
    return bucketed_group_agg(shared, ["doc_a", "doc_b"], jaccard_bucket)


# ------------------------------------------------------------- simhash


class SimHashStage:
    """64-bit SimHash over token hashes — per-batch vectorized, no
    shuffle; near-dups = small Hamming distance."""

    def __init__(self):
        self.an = get_analyzer("en")
        self.bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]

    def simhash(self, tokens: list[str]) -> int:
        if not tokens:
            return 0
        terms, tf = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
        h = stable_hash64(terms)
        bits = ((h[:, None] & self.bits) != 0).astype(np.int64)  # (n_terms, 64)
        v = (bits * 2 - 1).T @ tf  # weighted bit votes
        return int((self.bits[0][v > 0]).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = self.an.tokenize_series(batch["text"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "simhash": pd.Series([self.simhash(t) for t in toks], dtype=np.uint64),
            }
        )


def simhash64(docs_ds):
    return docs_ds.map_batches(SimHashStage, batch_format="pandas", batch_size=4096, concurrency=2)


# ------------------------------------------------- embedding near-dup


def embedding_neardup(emb_ds, threshold: float = 0.95):
    """Cosine >= threshold pairs via LSH-free blocked self-join at test
    scale: normalize per batch, all-pairs within the (small) materialized
    matrix.  At 100 TB this becomes IVF/LSH bucketing (see pipelines/ann).
    Returns (vec_a, vec_b, sim) with vec_a < vec_b, sim rounded 6dp."""

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame({"vec_id": batch["vec_id"].astype(np.int64), "nv": list(m)})

    df = emb_ds.map_batches(norm, batch_format="pandas", batch_size=4096).to_pandas()
    ids = df["vec_id"].to_numpy()
    m = np.stack(df["nv"].to_numpy())
    sims = m @ m.T
    iu, ju = np.triu_indices(ids.size, k=1)
    mask = sims[iu, ju] >= threshold
    a, b = ids[iu[mask]], ids[ju[mask]]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    s = np.floor(sims[iu[mask], ju[mask]] * 1e6 + 0.5) / 1e6
    order = np.lexsort((b2, a2))
    return pd.DataFrame({"vec_a": a2[order], "vec_b": b2[order], "sim": s[order]})
