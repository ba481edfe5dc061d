"""Mergeable sketches — approximate aggregates whose partials merge
exactly (ray_guide 'Aggregation at scale': one sketch per batch, merged
in a tiny second stage; the reference's only aggregates are its metrics
counters, SURVEY §2.5 'No sketches in reference' — these are the
training-data extension).

HyperLogLog (Flajolet et al. 2007, public algorithm): 2^p registers of
max leading-zero ranks; per-batch build is fully vectorized (np.maximum.at
over register indices), merges are elementwise max — associative,
commutative, idempotent, so ANY Ray execution order gives the identical
sketch and estimate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kafka_es_ray.functions.hashing import stable_hash64


def _hll_build(values, p: int = 12) -> np.ndarray:
    """One HLL sketch (uint8[2^p]) from an array of values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = stable_hash64(np.asarray(values, dtype=object))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))  # sentinel stops rank
    # rank = leading zeros of the remaining 64-p bits, +1
    probe = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    lz = np.zeros(h.size, dtype=np.uint8)
    active = np.ones(h.size, dtype=bool)
    for _ in range(64 - p + 1):
        zero_here = active & ((cur & probe) == 0)
        lz[zero_here] += 1
        active &= zero_here
        cur = cur << np.uint64(1)
        if not active.any():
            break
    rank = lz + 1
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def _dd_partial(vals: np.ndarray, gamma_ln: float) -> pd.DataFrame:
    """DDSketch bucket partial for one batch: (sign, k, n) counter rows.
    Bucket keys are functions of the VALUE alone (k = ceil(ln|v|/ln γ)),
    so partials merge by pure counter addition and the merged sketch is
    identical under ANY Ray execution order (unlike centroid sketches)."""
    vals = vals[~np.isnan(vals)]
    out = []
    for sign in (1, -1):
        part = vals[vals > 0] if sign == 1 else -vals[vals < 0]
        if part.size:
            k = np.ceil(np.log(part) / gamma_ln).astype(np.int64)
            uk, cnt = np.unique(k, return_counts=True)
            out.append(
                pd.DataFrame(
                    {"sign": np.int8(sign), "k": uk, "n": cnt.astype(np.int64)}
                )
            )
    n_zero = int((vals == 0).sum())
    if n_zero:
        out.append(
            pd.DataFrame({"sign": [np.int8(0)], "k": [np.int64(0)], "n": [n_zero]})
        )
    if not out:
        return pd.DataFrame(
            {
                "sign": pd.Series([], dtype=np.int8),
                "k": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
            }
        )
    return pd.concat(out, ignore_index=True)


def approx_quantiles(
    ds, column: str, percentiles=(25.0, 50.0, 75.0, 99.0), alpha: float = 0.01
) -> pd.DataFrame:
    """Approximate quantiles with RELATIVE-error guarantee |v̂/v - 1| <=
    ~alpha — the DDSketch algorithm (Masson, Lee, Rim: "DDSketch: a fast
    and fully-mergeable quantile sketch with relative-error guarantees",
    VLDB 2019; public).  One vectorized bucket partial per batch; the
    shuffle moves O(#buckets) counter rows per batch (buckets ~= ln(range)
    / ln γ, a few thousand at alpha=0.01), never values; the merge is a
    bucket-count sum, so results are EXECUTION-ORDER-DETERMINISTIC.
    Nearest-rank (rank = ceil(n*p/100)) over bucket representatives
    v = 2γ^k/(γ+1).  Returns (pct, value)."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    gamma_ln = float(np.log(gamma))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return _dd_partial(batch[column].to_numpy(dtype=np.float64), gamma_ln)

    merged = (
        ds.map_batches(partial, batch_format="pandas", batch_size=65536)
        .to_pandas()  # O(#buckets x #batches) counter rows — never values
        .groupby(["sign", "k"], as_index=False)["n"]
        .sum()
    )
    if merged.empty:
        return pd.DataFrame(
            {"pct": pd.Series([], dtype=np.float64), "value": pd.Series([], dtype=np.float64)}
        )
    sign = merged["sign"].to_numpy(np.int64)
    k = merged["k"].to_numpy(np.int64)
    rep = np.where(
        sign == 0, 0.0, sign * (2.0 * np.power(gamma, k.astype(np.float64)) / (gamma + 1.0))
    )
    order = np.argsort(rep, kind="stable")
    rep = rep[order]
    cum = merged["n"].to_numpy(np.int64)[order].cumsum()
    n = int(cum[-1])
    rows = []
    for p in percentiles:
        rank = max(1, int(np.ceil(n * float(p) / 100.0)))
        rows.append((float(p), float(rep[int(np.searchsorted(cum, rank))])))
    return pd.DataFrame(rows, columns=["pct", "value"]).astype(np.float64)


# ----------------------------------------------- Count-Min heavy hitters

# Odd multipliers/offsets (splitmix64-derived constants) giving `depth`
# pairwise-independent-enough row hash functions from one base hash.
_CMS_A = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 0xD6E8FEB86659FD93,
     0xA0761D6478BD642F, 0xE7037ED1A0B428DB, 0x8EBC6AF09C88C6E3, 0x589965CC75374CC3],
    dtype=np.uint64,
)
_CMS_B = np.array(
    [0x2545F4914F6CDD1D, 0x6A09E667F3BCC909, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
     0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F, 0x1F83D9ABFB41BD6B],
    dtype=np.uint64,
)


def _cms_cols(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices from one uint64 base hash per value."""
    out = np.empty((depth, h.size), dtype=np.int64)
    for d in range(depth):
        out[d] = ((h * _CMS_A[d] + _CMS_B[d]) >> np.uint64(32)).astype(np.int64) % width
    return out


def _cms_build(values, counts: np.ndarray, depth: int, width: int) -> np.ndarray:
    """One CMS table (int64[depth, width]) from distinct values + counts."""
    table = np.zeros((depth, width), dtype=np.int64)
    if len(values) == 0:
        return table
    h = stable_hash64(np.asarray(values, dtype=object))
    cols = _cms_cols(h, depth, width)
    for d in range(depth):
        np.add.at(table[d], cols[d], counts)
    return table


def _cms_query(table: np.ndarray, values) -> np.ndarray:
    """Point estimates (min over rows) — never underestimates."""
    h = stable_hash64(np.asarray(values, dtype=object))
    cols = _cms_cols(h, table.shape[0], table.shape[1])
    return np.min(
        np.stack([table[d][cols[d]] for d in range(table.shape[0])]), axis=0
    )


def heavy_hitters(
    ds, column: str, k: int = 20, width: int = 4096, depth: int = 4,
    candidates_per_batch: int = 512,
) -> pd.DataFrame:
    """Top-k most frequent values via a Count-Min sketch (Cormode &
    Muthukrishnan 2005, public algorithm).  Per batch: one exact
    value_counts (vectorized) -> a (depth x width) counter partial plus
    the batch's top `candidates_per_batch` values as candidates.  The
    shuffle moves O(depth*width + C) per batch, never rows.  CMS partials
    merge by pure ADDITION (associative/commutative -> execution-order
    deterministic); the merged sketch point-estimates each candidate
    (min over depth rows, one-sided error <= n*e/width w.h.p.).  A true
    global top-k value is a local top-C value in at least one batch for
    any C >= k under batch sizes >> k, so the candidate union covers the
    heads.  Returns (value:str, approx_count) sorted (count desc, value
    asc) — deterministic tie-break."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[column].astype(str).value_counts()
        table = _cms_build(
            vc.index.to_numpy(dtype=object), vc.to_numpy(np.int64), depth, width
        )
        cands = vc.index.to_numpy(dtype=object)[:candidates_per_batch]
        return pd.DataFrame(
            {"sketch": [table.tobytes()], "cands": ["\x00".join(map(str, cands))]}
        )

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    merged = np.zeros((depth, width), dtype=np.int64)
    cand_set: set[str] = set()
    for _, row in parts.iterrows():
        merged += np.frombuffer(row["sketch"], dtype=np.int64).reshape(depth, width)
        if row["cands"]:
            cand_set.update(row["cands"].split("\x00"))
    if not cand_set:
        return pd.DataFrame(
            {"value": pd.Series([], dtype=object),
             "approx_count": pd.Series([], dtype=np.int64)}
        )
    cands = np.array(sorted(cand_set), dtype=object)
    est = _cms_query(merged, cands)
    order = np.lexsort((cands, -est))[:k]
    return pd.DataFrame(
        {"value": cands[order], "approx_count": est[order].astype(np.int64)}
    )


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): one sketch per batch, one
    elementwise-max merge — the shuffle moves 2^p bytes per batch, never
    values.  Typical error ~1.04/sqrt(2^p) (~1.6% at p=12)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        regs = _hll_build(batch[column].to_numpy(), p)
        return pd.DataFrame({"sketch": [regs.tobytes()]})

    sketches = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in sketches["sketch"]:
        merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
    return _hll_estimate(merged)
