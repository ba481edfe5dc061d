"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — broadcast the query matrix ONCE with
``ray.put`` (never re-shipped per batch), numpy matmul per batch, per-batch
partial top-k (combiner), final per-query merge.  The shuffle moves only
(query_id, vec_id, sim) candidate rows — k per query per batch — never the
embeddings.

Scale path: LSH-bucketed variant — random-hyperplane signs bucket vectors;
queries probe only their bucket (+ optional multiprobe).  Recall < 1 by
construction; the brute-force path is the correctness oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kafka_es_ray.pipelines.sampling import seeded_sample_ds

from kafka_es_ray.runtime import stage_pool


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _round6(x):
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


class CosineTopKStage:
    """Stateful scoring stage: pulls the broadcast query matrix once in
    __init__ (ray.put on the driver; the broadcast-small-side rule —
    reference topicToIndexMap lookup M6, ElasticsearchSinkTask.kt:301-310)."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref)  # (query_ids, matrix)
        self.qids = q[0]
        self.qm = _normalize(q[1])
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        sims = self.qm @ m.T  # (n_queries, n_batch)
        k = min(self.k, ids.size)
        # per-batch partial top-k per query; keep everything within 1e-6 of
        # the k-th best so 6dp rounding at the merge cannot change ranks
        kth = -np.partition(-sims, k - 1, axis=1)[:, k - 1]
        rows = []
        for qi in range(self.qids.size):
            sel = np.flatnonzero(sims[qi] >= kth[qi] - 1e-6)
            rows.append(
                pd.DataFrame(
                    {
                        "query_vec_id": np.int64(self.qids[qi]),
                        "vec_id": ids[sel],
                        "sim": sims[qi, sel],
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)


def cosine_topk(emb_ds, query_ids: np.ndarray, query_matrix: np.ndarray, k: int = 10):
    """Brute-force cosine top-k: returns (query_vec_id, rank, vec_id, sim)."""
    import ray

    qref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix)))
    partials = emb_ds.map_batches(
        CosineTopKStage,
        fn_constructor_args=(qref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )

    return _merge_topk(partials, k)


def _merge_topk(partials, k: int):
    """Final per-query top-k merge of per-batch candidates (bucketed so
    group count tracks B, not the number of queries)."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    def merge_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in bucket.groupby("query_vec_id", sort=False):
            sim_r = _round6(g["sim"].to_numpy())
            ids = g["vec_id"].to_numpy().astype(np.int64)
            order = np.lexsort((ids, -sim_r))[:k]
            out.append(
                pd.DataFrame(
                    {
                        "query_vec_id": np.int64(qid),
                        "rank": np.arange(1, order.size + 1, dtype=np.int64),
                        "vec_id": ids[order],
                        "sim": sim_r[order],
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "query_vec_id": pd.Series([], dtype=np.int64),
                    "rank": pd.Series([], dtype=np.int64),
                    "vec_id": pd.Series([], dtype=np.int64),
                    "sim": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_group_agg(partials, ["query_vec_id"], merge_bucket)


class _SQ8TopKStage:
    """int8 scalar-quantized cosine top-k: vectors quantize per batch to
    int8 codes + one float scale per vector (symmetric max-abs — 4x less
    memory/shuffle than float32, the storage-bound ANN lever at corpus
    scale); scoring dequantizes the BATCH to float32 for the BLAS matmul
    (numpy has no int8 GEMM), so the quantization cost is accuracy, not
    compute.  Approximate by construction; recall vs the exact brute
    force is the pytest oracle."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref)
        self.qids = q[0]
        self.qm = _normalize(q[1]).astype(np.float32)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        # --- quantize (what an SQ8 index would STORE: codes + scales) ---
        scale = np.maximum(np.abs(m).max(axis=1, keepdims=True), 1e-12) / 127.0
        codes = np.clip(np.rint(m / scale), -127, 127).astype(np.int8)
        # --- score from the codes alone (storage-faithful) ---
        deq = codes.astype(np.float32) * scale.astype(np.float32)
        sims = (self.qm @ deq.T).astype(np.float64)
        k = min(self.k, ids.size)
        kth = -np.partition(-sims, k - 1, axis=1)[:, k - 1]
        rows = []
        for qi in range(self.qids.size):
            sel = np.flatnonzero(sims[qi] >= kth[qi] - 1e-6)
            rows.append(
                pd.DataFrame(
                    {
                        "query_vec_id": np.int64(self.qids[qi]),
                        "vec_id": ids[sel],
                        "sim": sims[qi, sel],
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)


def sq8_cosine_topk(emb_ds, query_ids: np.ndarray, query_matrix: np.ndarray, k: int = 10):
    """int8 scalar-quantized cosine top-k (approximate; see _SQ8TopKStage).
    Returns (query_vec_id, rank, vec_id, sim) with sims computed from the
    int8 codes."""
    import ray

    qref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix)))
    partials = emb_ds.map_batches(
        _SQ8TopKStage,
        fn_constructor_args=(qref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )
    return _merge_topk(partials, k)


class _SQ8RescoreStage:
    """ES kNN ``rescore_vector`` (oversample) over SQ8 storage: candidate
    selection uses the int8-quantized sims (what the index stores in
    RAM), then each batch's quantized top-(k*oversample) per query is
    re-scored with the full-precision vectors — the ES quantized-index
    rescore pass (raw vectors stay on disk and are read only for the
    oversampled candidates).  The final merge therefore ranks by EXACT
    cosine: the result equals exact brute force whenever every batch's
    quantized top-(k*oversample) covers its exact top-k (8-bit error is
    ~1e-2, so oversample=3 covers at any tested scale — pytest-asserted,
    and the driver oracle compares against the exact-SQL top-k)."""

    def __init__(self, queries_ref, k: int, oversample: float):
        import ray

        q = ray.get(queries_ref)
        self.qids = q[0]
        self.qm = _normalize(q[1])
        self.qm32 = self.qm.astype(np.float32)
        self.k = k
        self.m = max(int(k), int(np.ceil(k * float(oversample))))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        scale = np.maximum(np.abs(m).max(axis=1, keepdims=True), 1e-12) / 127.0
        codes = np.clip(np.rint(m / scale), -127, 127).astype(np.int8)
        deq = codes.astype(np.float32) * scale.astype(np.float32)
        qsims = (self.qm32 @ deq.T).astype(np.float64)
        mm = min(self.m, ids.size)
        kth = -np.partition(-qsims, mm - 1, axis=1)[:, mm - 1]
        sels = [
            np.flatnonzero(qsims[qi] >= kth[qi] - 1e-6)
            for qi in range(self.qids.size)
        ]
        # one full-precision GEMM over the union of candidate columns —
        # the same accumulation shape as the exact CosineTopKStage
        cols = np.unique(np.concatenate(sels)) if sels else np.array([], np.int64)
        exact = self.qm @ m[cols].T  # (n_queries, |cols|)
        pos = {int(c): i for i, c in enumerate(cols)}
        rows = []
        for qi, sel in enumerate(sels):
            j = np.array([pos[int(c)] for c in sel], dtype=np.int64)
            rows.append(
                pd.DataFrame(
                    {
                        "query_vec_id": np.int64(self.qids[qi]),
                        "vec_id": ids[sel],
                        "sim": exact[qi, j],
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)


def sq8_rescore_topk(
    emb_ds, query_ids: np.ndarray, query_matrix: np.ndarray,
    k: int = 10, oversample: float = 3.0,
):
    """SQ8 ANN with the ES rescore_vector oversample pass: quantized
    candidate selection, full-precision re-ranking (see _SQ8RescoreStage).
    Returns (query_vec_id, rank, vec_id, sim) with EXACT cosine sims."""
    import ray

    qref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix)))
    partials = emb_ds.map_batches(
        _SQ8RescoreStage,
        fn_constructor_args=(qref, k, oversample),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )
    return _merge_topk(partials, k)


def _kmeans_spherical(train: np.ndarray, nlist: int, iters: int = 10, seed: int = 29) -> np.ndarray:
    """Deterministic spherical k-means (numpy Lloyd, fixed iterations):
    the IVF coarse quantizer.  Input rows must be L2-normalized."""
    rng = np.random.default_rng(seed)
    n = train.shape[0]
    nlist = min(nlist, n)
    centroids = train[rng.choice(n, nlist, replace=False)]
    for _ in range(iters):
        assign = np.argmax(train @ centroids.T, axis=1)
        for c in range(nlist):
            members = train[assign == c]
            if len(members):
                v = members.sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 1e-12:
                    centroids[c] = v / norm
    return centroids


def ivf_cosine_topk(
    emb_ds,
    query_ids,
    query_matrix,
    k: int = 10,
    nlist: int = 64,
    nprobe: int = 8,
    train_size: int = 10_000,
):
    """IVF variant of the ANN scale path: a sampled spherical-k-means
    coarse quantizer (trained once on the driver, broadcast via the
    closure) partitions vectors into ``nlist`` inverted lists; queries
    probe only their ``nprobe`` closest centroids' lists.  Approximate
    (recall measured vs brute force in tests); per-batch work is one
    matmul against the centroid matrix + the filtered top-k scoring.

    Scale shape: train set = a bounded prefix sample (never the corpus);
    assignment is a narrow map; only probed-list vectors are scored."""
    import ray

    qm = _normalize(np.asarray(query_matrix))
    train = seeded_sample_ds(emb_ds, "vec_id", int(train_size), prefix="train:")
    centroids = _kmeans_spherical(
        _normalize(np.stack(train["embedding"].to_numpy())), nlist
    )
    # queries' probe lists -> the union of inverted lists worth scoring
    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    wanted = np.unique(probe)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix)))

    def assign_and_filter(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        lists = np.argmax(m @ centroids.T, axis=1)
        keep = np.isin(lists, wanted)
        return batch[keep]

    partials = emb_ds.map_batches(
        assign_and_filter, batch_format="pandas", batch_size=4096
    ).map_batches(
        CosineTopKStage,
        fn_constructor_args=(qref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )
    return _merge_topk(partials, k)


class LshBucketStage:
    """Scale path: random-hyperplane LSH bucket id per vector (nbits sign
    bits).  Bucketing is a cheap narrow map; a bucketed top-k probes only
    matching buckets (approximate; recall measured vs brute force)."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits))
        self.weights = (1 << np.arange(nbits)).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        bits = (m @ self.planes) > 0
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].astype(np.int64),
                "bucket": bits @ self.weights,
                "embedding": batch["embedding"],
            }
        )


def lsh_cosine_topk(emb_ds, query_ids, query_matrix, k: int = 10, nbits: int = 8):
    """Approximate: score only vectors whose bucket matches a query's
    bucket.  Returns same schema as cosine_topk (subset recall)."""
    import ray

    dim = int(np.asarray(query_matrix).shape[1])
    stage = LshBucketStage(dim, nbits)
    qbits = (_normalize(np.asarray(query_matrix)) @ stage.planes) > 0
    qbuckets = qbits @ stage.weights
    wanted = set(int(x) for x in qbuckets)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix)))

    wanted_arr = np.array(sorted(wanted), dtype=np.int64)
    bucketed = emb_ds.map_batches(
        lambda b: stage(b), batch_format="pandas", batch_size=4096
    ).map_batches(
        lambda b: b[np.isin(b["bucket"].to_numpy(), wanted_arr)],
        batch_format="pandas",
    )
    partials = bucketed.map_batches(
        CosineTopKStage,
        fn_constructor_args=(qref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )

    return _merge_topk(partials, k)


def _pq_train(
    train_norm: np.ndarray, m: int, ksub: int = 256, iters: int = 10, seed: int = 37
) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011, TPAMI): split
    the dim into ``m`` contiguous subspaces and run plain Euclidean
    k-means (deterministic numpy Lloyd, fixed seed/iterations) per
    subspace on the L2-normalized training sample.
    Returns (m, ksub_eff, dim/m) codebooks."""
    n, d = train_norm.shape
    if d % m:
        raise ValueError(f"pq: dim {d} not divisible by m={m}")
    ds = d // m
    ksub = min(ksub, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, ds), dtype=np.float64)
    for j in range(m):
        sub = train_norm[:, j * ds : (j + 1) * ds]
        cents = sub[rng.choice(n, ksub, replace=False)]
        for _ in range(iters):
            # squared-distance argmin == argmax(x·c - |c|^2/2)
            assign = np.argmax(
                sub @ cents.T - 0.5 * (cents * cents).sum(axis=1), axis=1
            )
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def _pq_encode(vec_norm: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) normalized vectors -> (n, m) uint8/uint16 codes."""
    m, ksub, ds = books.shape
    codes = np.empty((vec_norm.shape[0], m), dtype=np.uint16)
    for j in range(m):
        sub = vec_norm[:, j * ds : (j + 1) * ds]
        codes[:, j] = np.argmax(
            sub @ books[j].T - 0.5 * (books[j] * books[j]).sum(axis=1), axis=1
        )
    return codes


class _PQTopKStage:
    """ADC (asymmetric distance computation) scoring: each actor holds
    the per-query inner-product lookup tables (n_queries, m, ksub) built
    ONCE in __init__ from the broadcast query matrix and codebooks; per
    batch it encodes the vectors (in the storage design the codes are
    what persists — 4-16x smaller than float32 — and this encode is the
    write path) and scores sim~ = sum_j LUT[q, j, code_j]: one gather
    per subspace, no float matmul against the corpus."""

    def __init__(self, queries_ref, books_ref, k: int):
        import ray

        self.query_ids, qm = ray.get(queries_ref)
        self.books = ray.get(books_ref)  # (m, ksub, ds)
        self.k = k
        qn = _normalize(np.asarray(qm))
        m, ksub, ds = self.books.shape
        self.lut = np.stack(
            [qn[:, j * ds : (j + 1) * ds] @ self.books[j].T for j in range(m)],
            axis=1,
        )  # (n_queries, m, ksub)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(np.stack(batch["embedding"].to_numpy()))
        codes = _pq_encode(vecs, self.books)  # (n, m)
        vec_ids = batch["vec_id"].to_numpy().astype(np.int64)
        out = []
        m = codes.shape[1]
        for qi, qid in enumerate(self.query_ids):
            sims = self.lut[qi, np.arange(m), codes].sum(axis=1)
            top = min(self.k, sims.size)
            sel = np.argpartition(-sims, top - 1)[:top]
            out.append(
                pd.DataFrame(
                    {
                        "query_vec_id": np.int64(qid),
                        "vec_id": vec_ids[sel],
                        "sim": sims[sel],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)


def pq_cosine_topk(
    emb_ds,
    query_ids,
    query_matrix,
    k: int = 10,
    m: int = 8,
    ksub: int = 256,
    train_size: int = 10_000,
):
    """Product-quantization ANN (the classic memory-scale path: 4-16x
    smaller vector storage than float32; IVF's complement — PQ shrinks
    residency, IVF shrinks candidates; real systems compose them):
    codebooks trained once on a bounded driver-side sample, broadcast
    with ``ray.put``; per-batch ADC scoring via per-query lookup tables.
    Approximate — recall and sim-error measured vs brute force in tests.
    Returns (query_vec_id, rank, vec_id, sim) with sim = round6(ADC)."""
    import ray

    train = seeded_sample_ds(emb_ds, "vec_id", int(train_size), prefix="train:")
    books = _pq_train(
        _normalize(np.stack(train["embedding"].to_numpy())), m=m, ksub=ksub
    )
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix)))
    bref = ray.put(books)
    partials = emb_ds.map_batches(
        _PQTopKStage,
        fn_constructor_args=(qref, bref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )
    return _merge_topk(partials, k)


class _PQRescoreStage:
    """PQ ADC candidate selection + full-precision rescore (the same
    rescore_vector shape as _SQ8RescoreStage, over PQ codes instead of
    int8 grids): per batch, the ADC top-(k*oversample) per query is
    re-scored with the exact float vectors, so the final merge ranks by
    EXACT cosine whenever every batch's ADC window covers its exact
    top-k (pytest-asserted at the tested scales)."""

    def __init__(self, queries_ref, books_ref, k: int, oversample: float):
        import ray

        self.qids, qm = ray.get(queries_ref)
        self.books = ray.get(books_ref)
        self.qm = _normalize(np.asarray(qm))
        self.k = k
        self.m_cand = max(int(k), int(np.ceil(k * float(oversample))))
        m, ksub, ds = self.books.shape
        self.lut = np.stack(
            [self.qm[:, j * ds : (j + 1) * ds] @ self.books[j].T for j in range(m)],
            axis=1,
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        vecs = _normalize(np.stack(batch["embedding"].to_numpy()))
        codes = _pq_encode(vecs, self.books)
        msub = codes.shape[1]
        adc = np.stack(
            [self.lut[qi, np.arange(msub), codes].sum(axis=1)
             for qi in range(self.qids.size)]
        )  # (n_queries, n_batch)
        mm = min(self.m_cand, ids.size)
        kth = -np.partition(-adc, mm - 1, axis=1)[:, mm - 1]
        sels = [
            np.flatnonzero(adc[qi] >= kth[qi] - 1e-9)
            for qi in range(self.qids.size)
        ]
        cols = np.unique(np.concatenate(sels)) if sels else np.array([], np.int64)
        exact = self.qm @ vecs[cols].T
        pos = {int(c): i for i, c in enumerate(cols)}
        rows = []
        for qi, sel in enumerate(sels):
            j = np.array([pos[int(c)] for c in sel], dtype=np.int64)
            rows.append(
                pd.DataFrame(
                    {
                        "query_vec_id": np.int64(self.qids[qi]),
                        "vec_id": ids[sel],
                        "sim": exact[qi, j],
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)


def pq_rescore_topk(
    emb_ds, query_ids, query_matrix,
    k: int = 10, oversample: float = 4.0,
    m: int = 8, ksub: int = 256, train_size: int = 10_000,
):
    """PQ ANN with the rescore_vector oversample pass: ADC candidate
    selection over codes (the RAM-resident representation), exact
    re-ranking of the oversampled window.  Returns
    (query_vec_id, rank, vec_id, sim) with EXACT cosine sims."""
    import ray

    train = seeded_sample_ds(emb_ds, "vec_id", int(train_size), prefix="train:")
    books = _pq_train(
        _normalize(np.stack(train["embedding"].to_numpy())), m=m, ksub=ksub
    )
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix)))
    bref = ray.put(books)
    partials = emb_ds.map_batches(
        _PQRescoreStage,
        fn_constructor_args=(qref, bref, k, oversample),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )
    return _merge_topk(partials, k)


def ivfpq_cosine_topk(
    emb_ds,
    query_ids,
    query_matrix,
    k: int = 10,
    nlist: int = 64,
    nprobe: int = 8,
    m: int = 8,
    ksub: int = 256,
    train_size: int = 10_000,
):
    """IVF + PQ composed (the canonical billion-scale layout, Jegou et
    al.'s IVFADC without the residual encoding — codes quantize the raw
    normalized vectors, documented simplification): the coarse quantizer
    prunes to the probed inverted lists, PQ ADC scores only the
    survivors from codes.  Both codebooks train once on one bounded
    driver-side sample and broadcast.  Approximate on both axes — recall
    measured vs brute force in tests.
    Returns (query_vec_id, rank, vec_id, sim)."""
    import ray

    train = seeded_sample_ds(emb_ds, "vec_id", int(train_size), prefix="train:")
    tn = _normalize(np.stack(train["embedding"].to_numpy()))
    centroids = _kmeans_spherical(tn, nlist)
    books = _pq_train(tn, m=m, ksub=ksub)
    qm = _normalize(np.asarray(query_matrix))
    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    wanted = np.unique(probe)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_matrix)))
    bref = ray.put(books)

    def assign_and_filter(batch: pd.DataFrame) -> pd.DataFrame:
        mm = _normalize(np.stack(batch["embedding"].to_numpy()))
        lists = np.argmax(mm @ centroids.T, axis=1)
        return batch[np.isin(lists, wanted)]

    partials = emb_ds.map_batches(
        assign_and_filter, batch_format="pandas", batch_size=4096
    ).map_batches(
        _PQTopKStage,
        fn_constructor_args=(qref, bref, k),
        batch_format="pandas",
        batch_size=4096,
        concurrency=stage_pool(),
    )
    return _merge_topk(partials, k)


def embedding_kmeans(
    emb_ds,
    k: int = 32,
    train_size: int = 10_000,
    iters: int = 10,
    seed: int = 29,
):
    """First-class spherical k-means over an embedding column (the
    SemDeDup / IVF building block exposed as its own op — corpus
    clustering for curriculum buckets, dedup pre-partitioning, topic
    sampling).  Centroids train on the driver over a bounded prefix
    sample (the published practice; deterministic seed), then ONE
    streaming assignment pass maps every vector to its argmax-cosine
    centroid — broadcast centroids, no shuffle, nothing but the
    (vec_id, cluster, sim) rows leave the tasks.  Returns Dataset
    (vec_id, cluster, sim) with sim = round6 cosine to the assigned
    centroid."""
    train = seeded_sample_ds(emb_ds, "vec_id", int(train_size), prefix="train:")
    centroids = _kmeans_spherical(
        _normalize(np.stack(train["embedding"].to_numpy())), int(k),
        iters=int(iters), seed=int(seed),
    )

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(np.stack(batch["embedding"].to_numpy()))
        sims = m @ centroids.T
        best = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].astype(np.int64),
                "cluster": best.astype(np.int64),
                "sim": np.floor(sims[np.arange(len(m)), best] * 1e6 + 0.5) / 1e6,
            }
        )

    return emb_ds.map_batches(assign, batch_format="pandas", batch_size=4096)


def embedding_pca(emb_ds, n_components: int = 8, col: str = "embedding"):
    """Distributed PCA over an embedding column (the
    whitening / dimensionality-reduction preprocessing of embedding
    dedup and clustering pipelines): ONE streaming pass emits per-batch
    moment partials (n, Σx, XᵀX — each d x d with d = embedding dim,
    tiny), the driver assembles the covariance (population, /n) and
    eigendecomposes it (d x d — never the data).  Component signs are
    fixed deterministically (largest-|loading| element made positive),
    eigenvalues descend.  float64 throughout.

    Returns (components: (k, d) ndarray, explained_variance: (k,),
    mean: (d,)).  Shuffle volume = O(batches x d²), never rows."""
    import ray

    k = int(n_components)

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in b[col]]
        ) if len(b) else np.zeros((0, 1))
        if not m.size:
            return pd.DataFrame({"payload": []})
        import pickle

        return pd.DataFrame(
            {
                "payload": [
                    pickle.dumps(
                        (m.shape[0], m.sum(axis=0), m.T @ m),
                        protocol=4,
                    )
                ]
            }
        )

    import pickle

    parts = emb_ds.map_batches(
        moments, batch_format="pandas", batch_size=4096
    ).to_pandas()
    if not len(parts):
        raise ValueError("embedding_pca: empty input")
    n_tot, s_tot, xtx = 0, None, None
    for raw in parts["payload"]:
        n_, s_, x_ = pickle.loads(raw)
        n_tot += n_
        s_tot = s_ if s_tot is None else s_tot + s_
        xtx = x_ if xtx is None else xtx + x_
    mean = s_tot / n_tot
    cov = xtx / n_tot - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # deterministic sign: the largest-|loading| element of each
    # component is positive (ties: first such index wins via argmax)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, evals[order], mean


def embedding_pca_transform(emb_ds, components: np.ndarray, mean: np.ndarray,
                            col: str = "embedding", id_col: str = "vec_id"):
    """Project every embedding onto the given PCA components (broadcast
    once via ray.put, one streaming matmul pass).  Returns
    Dataset(id, proj list<float64>)."""
    import ray

    ref = ray.put((np.asarray(components, dtype=np.float64),
                   np.asarray(mean, dtype=np.float64)))

    def project(b: pd.DataFrame) -> pd.DataFrame:
        comps, mu = ray.get(ref)
        if not len(b):
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "proj": pd.Series([], dtype=object)})
        m = np.stack([np.asarray(v, dtype=np.float64) for v in b[col]])
        p = (m - mu) @ comps.T
        return pd.DataFrame(
            {id_col: b[id_col].astype(np.int64).to_numpy(),
             "proj": list(p)}
        )

    return emb_ds.map_batches(project, batch_format="pandas", batch_size=4096)
