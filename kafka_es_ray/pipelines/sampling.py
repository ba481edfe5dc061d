"""Deterministic sampling for training-data mixing: per-group rates
(dataset mixing weights) and train/holdout splits, decided by a hash of
the document id — never an RNG.

Why hash-based: the keep/drop decision is then (a) reproducible across
runs, cluster sizes, and partitionings, (b) local to the row — one
streaming `map_batches`, no shuffle, no global state, and (c) exactly
replayable in SQL for the oracle.  Hash contract (shared with SimHash):
``int.from_bytes(md5(utf8(s))[8:16], 'little')`` == DuckDB
``md5_number_lower(s)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

DENOM = 1_000_000  # rate resolution: 1e-6


def seeded_hash_mod(ids, mod: int, prefix: str = "") -> np.ndarray:
    """``md5_number_lower(prefix + str(id)) % mod`` per row — THE
    engine-wide sampling hash contract (shared by stratified sampling,
    random_score, random_sampler, BPE sample membership); DuckDB replay:
    ``md5_number_lower(prefix || id) % mod``.  md5 of a short string is
    C-speed; the loop is digest-bound either way."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5((prefix + str(v)).encode()).digest()[8:16], "little"
            ) % mod
            for v in ids
        ),
        dtype=np.int64,
        count=len(ids),
    )


def _id_hash_mod(ids: pd.Series) -> np.ndarray:
    """md5_number_lower(str(id)) % DENOM per row (seeded_hash_mod with
    the rate resolution)."""
    return seeded_hash_mod(ids, DENOM)


def seeded_sample_ds(ds, id_col: str, target: int, prefix: str = "sample:"):
    """Deterministic ~``target``-row driver-side sample of a Dataset via
    the seeded_hash_mod contract (rule 1b) — REPRESENTATIVE regardless
    of row order, where ``ds.limit(n)`` takes the first blocks and skews
    quantile cuts / trained codebooks on sorted or clustered input
    (round-4 verdict #4 / advice).  Membership is a pure function of the
    id, so re-runs and any partitioning see the same sample.  One
    streaming filter pass (plus a count); corpora at or under ``target``
    return whole — small-scale behavior (and every exact oracle) is
    unchanged.  Expected sample size = target (binomial noise ~sqrt)."""
    n = ds.count()
    if n <= target:
        return ds.to_pandas()
    denom = 1 << 20
    thr = max(1, int(round(denom * (float(target) / n))))

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return b[seeded_hash_mod(b[id_col], denom, prefix) < thr]

    return ds.map_batches(keep, batch_format="pandas").to_pandas()


def stratified_sample(
    docs_ds,
    rates: dict[str, float],
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
):
    """Keep each row with its group's probability — the dataset-mixing
    primitive (e.g. downsample boilerplate-heavy languages).  Keep rule:
    ``hash(id) % 1e6 < round(rate * 1e6)``; rows keep their columns."""
    thresholds = {g: int(round(r * DENOM)) for g, r in rates.items()}
    default_t = int(round(default_rate * DENOM))

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        h = _id_hash_mod(batch[id_col])
        t = batch[group_col].map(lambda g: thresholds.get(g, default_t)).to_numpy(np.int64)
        return batch[h < t]

    return docs_ds.map_batches(pick, batch_format="pandas", batch_size=8192)


def train_holdout_split(docs_ds, holdout_frac: float, *, id_col: str = "doc_id"):
    """Tag every row 'holdout' (hash(id) % 1e6 < frac * 1e6) or 'train' —
    the leakage-safe eval split: membership is a pure function of the id,
    so re-runs, resharding, and incremental additions never move a doc
    across the boundary."""
    thr = int(round(holdout_frac * DENOM))

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        h = _id_hash_mod(batch[id_col])
        return batch.assign(split=np.where(h < thr, "holdout", "train"))

    return docs_ds.map_batches(tag, batch_format="pandas", batch_size=8192)


def mix_epochs(
    docs_ds,
    weights: dict[str, float],
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
):
    """Dataset mixing with REPETITION (epoch weighting): weight w means
    every row of that group appears floor(w) times (epochs 0..floor(w)-1)
    plus once more (epoch floor(w)) with probability w - floor(w) — the
    standard up-weighting of underrepresented sources in a pretraining
    mix (published practice, e.g. multi-epoch source weighting).  The
    fractional keep is hash-decided with the epoch index salted into the
    id (``hash(id|epoch)``) so it is reproducible, partition-invariant,
    and independent of the integer-epoch copies.  Streaming flat-map, no
    shuffle; output = input columns + ``epoch``."""
    import hashlib

    wmap = {g: float(w) for g, w in weights.items()}

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch[group_col].map(lambda g: wmap.get(g, default_weight)).to_numpy(
            np.float64
        )
        k_full = np.floor(w).astype(np.int64)
        frac_thr = np.round((w - k_full) * DENOM).astype(np.int64)
        # integer epochs: row i repeated k_full[i] times with epoch 0..k-1
        idx_full = np.repeat(np.arange(len(batch)), k_full)
        ends = np.cumsum(k_full)
        epoch_full = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - (
            np.repeat(ends - k_full, k_full)
        )
        # fractional epoch: salted hash keep
        ids = batch[id_col].to_numpy()
        salted = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{v}|{k}".encode()).digest()[8:16], "little"
                ) % DENOM
                for v, k in zip(ids, k_full)
            ),
            dtype=np.int64,
            count=len(batch),
        )
        keep_frac = salted < frac_thr
        parts = []
        if idx_full.size:
            full = batch.iloc[idx_full].copy()
            full["epoch"] = epoch_full
            parts.append(full)
        if keep_frac.any():
            fr = batch[keep_frac].copy()
            fr["epoch"] = k_full[keep_frac]
            parts.append(fr)
        if not parts:
            out = batch.iloc[:0].copy()
            out["epoch"] = pd.Series([], dtype=np.int64)
            return out
        return pd.concat(parts, ignore_index=True)

    return docs_ds.map_batches(expand, batch_format="pandas", batch_size=8192)


def cap_per_group(
    docs_ds,
    n: int,
    *,
    group_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
):
    """Per-domain/source quota capping — the web-pipeline curation op
    that stops a handful of giant hosts from dominating a training mix
    (C4/RefinedWeb-style host caps): keep at most ``n`` docs per
    ``group_col`` value, best-first by (``order_col`` desc, id asc) so
    the kept set is deterministic at any parallelism.

    Scale shape: a per-batch combiner cuts each batch to its local
    top-n per group FIRST (a batch can never contribute more than n
    rows per group to the exchange), then one bucketed group exchange
    decides the global top-n — shuffle volume is O(n x groups-per-batch),
    never the corpus, and high-cardinality domains hash across buckets
    (no per-domain reducer).  Returns the kept rows plus ``group_rank``
    (1 = best kept doc of its group)."""

    def _cut(b: pd.DataFrame, with_rank: bool) -> pd.DataFrame:
        b = b.sort_values(
            [group_col, order_col, id_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        keep = b.groupby(group_col, sort=False).cumcount() < n
        b = b[keep]
        if with_rank:
            b = b.assign(
                group_rank=(b.groupby(group_col, sort=False).cumcount() + 1).astype(np.int64)
            )
        return b

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    local = docs_ds.map_batches(
        lambda b: _cut(b, False), batch_format="pandas", batch_size=8192
    )
    return bucketed_group_agg(local, [group_col], lambda b: _cut(b, True))


def global_shuffle(docs_ds, *, id_col: str = "doc_id", seed: str = "shuf:"):
    """Deterministic global shuffle for training-data serving: every doc
    gets a stable pseudo-random global position — ``shuffle_pos`` = rank
    in ascending (md5(seed || id) % 2^62, id) order, the engine-wide
    sampling-hash contract (seeded_hash_mod), so the permutation is a
    pure function of (corpus, seed): identical at any parallelism,
    replayable after a resume, and a different ``seed`` gives an
    independent epoch order (the pretraining reshuffle-per-epoch op).

    Distributed ranking as a prefix sum over hash ranges: per-batch
    hashing tags each row with range = h >> 48 (<= 16,384 uniform
    ranges); ONE bucketed exchange on range computes per-range local
    ranks; per-range counts (scalars) go to the driver for cumulative
    offsets, broadcast back; position = offset[range] + local rank.  No
    doc rows funnel through the driver.  Returns (id, shuffle_pos)."""
    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    mod = 1 << 62

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        h = seeded_hash_mod(b[id_col].to_numpy(), mod, seed)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "h": h,
                "range_id": h >> 48,
            }
        )

    hashed = docs_ds.map_batches(add_hash, batch_format="pandas", batch_size=8192)

    def range_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values(["range_id", "h", id_col], kind="mergesort")
        return pd.DataFrame(
            {
                id_col: bucket[id_col].to_numpy(np.int64),
                "range_id": bucket["range_id"].to_numpy(np.int64),
                "local_rank": bucket.groupby("range_id", sort=False)
                .cumcount()
                .to_numpy(np.int64),
            }
        )

    local = bucketed_group_agg(hashed, ["range_id"], range_combine).materialize()
    totals = local.map_batches(
        lambda b: b.groupby("range_id", as_index=False).size(),
        batch_format="pandas",
    ).to_pandas()
    if len(totals) == 0:
        return pd.DataFrame(
            {
                id_col: pd.Series([], dtype=np.int64),
                "shuffle_pos": pd.Series([], dtype=np.int64),
            }
        )
    totals = totals.groupby("range_id")["size"].sum().sort_index()
    offsets = {
        int(rid): int(off) for rid, off in zip(totals.index, totals.cumsum() - totals)
    }
    off_ref = ray.put(offsets)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        base = b["range_id"].map(offs).to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "shuffle_pos": base + b["local_rank"].to_numpy(np.int64),
            }
        )

    return local.map_batches(finalize, batch_format="pandas")


def curriculum_order(
    docs_ds,
    score_col: str,
    *,
    id_col: str = "doc_id",
    ascending: bool = False,
    num_ranges: int = 4096,
    sample_size: int = 65536,
):
    """Deterministic global curriculum ordering for training-data
    serving: every doc gets its exact rank in (score desc|asc, id asc)
    order — the easy-to-hard (or hard-to-easy) curriculum layout over a
    quality/difficulty score.  The EXACT total order, not approximate.

    Distributed sample-sort ranking (the global_shuffle prefix-sum shape
    with data-dependent range bounds): a bounded driver-side sample
    yields quantile cut points; per-batch searchsorted tags each row's
    range; ONE bucketed exchange on range computes per-range local ranks
    by (key, id); per-range counts (scalars) flow to the driver for
    cumulative offsets, broadcast back.  Equal keys land in one range by
    construction (searchsorted side='left'), so cross-range order is
    exact.  No doc rows funnel through the driver.
    Returns (id, curriculum_pos)."""
    import ray

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    sample = seeded_sample_ds(docs_ds, id_col, int(sample_size), prefix="curr:")
    if len(sample) == 0:
        return pd.DataFrame(
            {
                id_col: pd.Series([], dtype=np.int64),
                "curriculum_pos": pd.Series([], dtype=np.int64),
            }
        )
    sgn = 1.0 if ascending else -1.0
    skey = sgn * sample[score_col].to_numpy(np.float64)
    qs = np.linspace(0, 1, min(int(num_ranges), len(sample)) + 1)[1:-1]
    cuts = np.unique(np.quantile(skey, qs)) if len(qs) else np.array([])

    def add_range(b: pd.DataFrame) -> pd.DataFrame:
        key = sgn * b[score_col].to_numpy(np.float64)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "key": key,
                "range_id": np.searchsorted(cuts, key, side="left").astype(np.int64),
            }
        )

    tagged = docs_ds.map_batches(add_range, batch_format="pandas", batch_size=8192)

    def range_combine(bucket: pd.DataFrame) -> pd.DataFrame:
        bucket = bucket.sort_values(["range_id", "key", id_col], kind="mergesort")
        return pd.DataFrame(
            {
                id_col: bucket[id_col].to_numpy(np.int64),
                "range_id": bucket["range_id"].to_numpy(np.int64),
                "local_rank": bucket.groupby("range_id", sort=False)
                .cumcount()
                .to_numpy(np.int64),
            }
        )

    local = bucketed_group_agg(tagged, ["range_id"], range_combine).materialize()
    totals = local.map_batches(
        lambda b: b.groupby("range_id", as_index=False).size(),
        batch_format="pandas",
    ).to_pandas()
    totals = totals.groupby("range_id")["size"].sum().sort_index()
    offsets = {
        int(rid): int(off) for rid, off in zip(totals.index, totals.cumsum() - totals)
    }
    off_ref = ray.put(offsets)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        base = b["range_id"].map(offs).to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "curriculum_pos": base + b["local_rank"].to_numpy(np.int64),
            }
        )

    return local.map_batches(finalize, batch_format="pandas")
