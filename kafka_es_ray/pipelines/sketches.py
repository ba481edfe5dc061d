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
