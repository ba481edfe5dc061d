"""Relational / streaming-shaped operators: windowed aggregates over the
events log, broadcast small-side lookup joins.

The reference's only join is the broadcast topic->index map lookup
(reference ElasticsearchSinkTask.kt:301-310, maybeUpdateActionIndex);
``broadcast_join_agg`` is that pattern at table scale: ray.put the small
side ONCE, dict-lookup inside map_batches, no shuffle of the big side.

Windowed aggregation follows the ray_guide streaming-shaped recipe:
assign tumbling windows vectorized, pre-aggregate per batch (combiner),
then a tiny groupby over (window, key) partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kafka_es_ray.runtime import stage_pool


def _round6(x):
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


def sessionize_events(events_ds, gap: str = "30min"):
    """Gap-based sessionization: per-user sessions split when the gap
    between consecutive events exceeds ``gap`` — (user_id, session_seq,
    n_events, start_us, end_us), session_seq 1-based per user in time
    order, timestamps as int64 epoch-microseconds.

    ONE bucketed exchange on user_id (a user's events co-locate; the
    session split is a per-user cumsum inside the bucket — sessions can
    never span buckets).  Ties broken (ts, event_id) — mirrored by the
    SQL oracle's window ORDER BY."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    gap_us = int(pd.Timedelta(gap).total_seconds()) * 1_000_000

    def to_rows(batch: pd.DataFrame) -> pd.DataFrame:
        # epoch-us int64 keys (CLAUDE.md rule 3: never timestamps through
        # a shuffle; ns-normalize first so the parquet unit can't bite)
        tsu = batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype(np.int64),
                "event_id": batch["event_id"].astype(np.int64),
                "tsu": tsu.astype(np.int64),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "tsu", "event_id"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["tsu"].shift()
        new_s = (prev.isna() | ((g["tsu"] - prev) > gap_us)).astype(np.int64)
        g = g.assign(
            session_seq=new_s.groupby(g["user_id"], sort=False).cumsum()
        )
        out = g.groupby(["user_id", "session_seq"], as_index=False).agg(
            n_events=("tsu", "size"), start_us=("tsu", "min"), end_us=("tsu", "max")
        )
        return out.astype(
            {
                "user_id": np.int64,
                "session_seq": np.int64,
                "n_events": np.int64,
                "start_us": np.int64,
                "end_us": np.int64,
            }
        )

    rows = events_ds.map_batches(to_rows, batch_format="pandas", batch_size=8192)
    return bucketed_group_agg(rows, ["user_id"], per_bucket)


def windowed_agg(events_ds, window: str = "1h"):
    """Tumbling-window count/sum per (window_start, event_type).

    The time-based flush of the reference's BufferingActor (bulk.delay.ms
    select+onTimeout, Actors.kt:150-152) is the streaming cousin of this:
    bounded batch runs collapse time windows to event-time grouping."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    win_s = int(pd.Timedelta(window).total_seconds())

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # int64 epoch-seconds window key: timestamp keys in a Ray groupby
        # sort-shuffle are ~15x slower than ints (measured), and pandas
        # datetime64 unit (ns vs us) stops mattering
        ns = batch["ts"].astype("datetime64[ns]").astype("int64")
        ws = (ns // (win_s * 10**9)) * win_s
        g = (
            pd.DataFrame({"window_start_s": ws, "event_type": batch["event_type"], "value": batch["value"]})
            .groupby(["window_start_s", "event_type"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        )
        return g

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["window_start_s", "event_type"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )
        g["window_start_s"] = g["window_start_s"].astype(np.int64)
        g["n_events"] = g["n_events"].astype(np.int64)
        g["sum_value"] = _round6(g["sum_value"])
        return g

    partials = events_ds.map_batches(partial, batch_format="pandas", batch_size=8192)
    # bucketed combine: thousands of distinct windows would hit Ray's
    # per-group aggregate overhead; B buckets keep the shuffle wide-key-safe
    return bucketed_group_agg(partials, ["window_start_s", "event_type"], combine)


def lineitem_agg(lineitem_ds):
    """TPC-H-Q1-shaped grouped aggregate: per (returnflag, linestatus)
    counts and exact-cents money sums; per-batch partial aggregation
    before a tiny bucketed combine."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qty_c = np.floor(batch["l_quantity"].to_numpy() * 100 + 0.5).astype(np.int64)
        price_c = np.floor(batch["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "l_returnflag": batch["l_returnflag"],
                    "l_linestatus": batch["l_linestatus"],
                    "qty_c": qty_c,
                    "price_c": price_c,
                }
            )
            .groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(n_rows=("qty_c", "size"), sum_qty_c=("qty_c", "sum"), sum_price_c=("price_c", "sum"))
        )
        return g

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n_rows=("n_rows", "sum"), sum_qty_c=("sum_qty_c", "sum"), sum_price_c=("sum_price_c", "sum")
        )
        return pd.DataFrame(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "n_rows": g["n_rows"].astype(np.int64),
                "sum_qty": g["sum_qty_c"].astype(np.float64) / 100.0,
                "sum_price": g["sum_price_c"].astype(np.float64) / 100.0,
            }
        )

    partials = lineitem_ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return bucketed_group_agg(partials, ["l_returnflag", "l_linestatus"], combine)


def topk_orders(orders_ds, k: int = 10):
    """Top-k orders by price — per-batch partial top-k (with tie margin)
    then a single tiny merge; never a global sort (ds.sort is an
    all-to-all; top-k needs only per-block heaps + one reduce,
    SURVEY §2.5 'Sorts/limits/top-k')."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        p = batch["o_totalprice"].to_numpy()
        kk = min(k, p.size)
        kth = -np.partition(-p, kk - 1)[kk - 1]
        sel = np.flatnonzero(p >= kth)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy()[sel].astype(np.int64),
                "o_totalprice": p[sel],
            }
        )

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        ids = bucket["o_orderkey"].to_numpy()
        p = bucket["o_totalprice"].to_numpy()
        order = np.lexsort((ids, -p))[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int64),
                "o_orderkey": ids[order],
                "o_totalprice": p[order],
            }
        )

    partials = orders_ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    # the partial output is tiny (<= ~k rows per batch): single merge task
    return partials.repartition(1).map_batches(merge, batch_format="pandas", batch_size=1 << 30)


def broadcast_join_agg(orders_ds, customer_df: pd.DataFrame):
    """Orders joined to the (small) customer dim by broadcast lookup, then
    revenue per market segment.  customer_df is ray.put once; every task
    reads the same object-store copy."""
    import ray
    from ray.data.aggregate import Sum

    lookup_ref = ray.put(dict(zip(customer_df["c_custkey"].astype(np.int64), customer_df["c_mktsegment"])))

    class JoinStage:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            seg = batch["o_custkey"].astype(np.int64).map(self.lookup)
            # exact integer cents: money sums must not depend on float
            # accumulation order (partial-agg order differs from oracle's)
            cents = np.floor(batch["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
            g = (
                pd.DataFrame({"c_mktsegment": seg, "cents": cents})
                .dropna(subset=["c_mktsegment"])
                .groupby("c_mktsegment", as_index=False)
                .agg(n_orders=("cents", "size"), total_cents=("cents", "sum"))
            )
            return g

    partials = orders_ds.map_batches(JoinStage, batch_format="pandas", batch_size=8192, concurrency=stage_pool())
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("n_orders", alias_name="n_orders"), Sum("total_cents", alias_name="total_cents")
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "n_orders": batch["n_orders"].astype(np.int64),
                "total_price": batch["total_cents"].astype(np.float64) / 100.0,
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


def exact_distinct(ds, column: str, num_buckets: int | None = None) -> int:
    """EXACT distinct count, scale-safe: per-batch distinct (combiner)
    -> hash-bucketed distinct (same-value rows always share a bucket)
    -> sum of per-bucket counts.  The shuffle moves at most one row per
    (batch, distinct value); the driver sees only B partial counts.
    The exact companion to sketches.approx_distinct (HLL)."""
    import pandas as pd

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    def batch_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({column: batch[column].unique()})

    def bucket_count(bucket: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(bucket[column].nunique())]})

    partial = ds.map_batches(batch_distinct, batch_format="pandas")
    counts = bucketed_group_agg(partial, [column], bucket_count, num_buckets)
    return int(sum(r["n"] for r in counts.take_all()))


def cumulative_cardinality(
    events_ds, ts_col: str = "ts", value_col: str = "user_id",
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """ES cumulative_cardinality pipeline aggregation, EXACT: per
    calendar-month date_histogram bucket, the running distinct count of
    ``value_col`` (ES computes it from merged per-prefix HLL sketches —
    approximate; this engine computes the exact equivalent, the oracle
    contract).

    Identity used: cumulative distinct at bucket t = |values whose FIRST
    bucket <= t|.  Scale shape: per-batch combiner reduces each batch to
    one (value, min bucket) row per distinct value (plus sentinel rows
    carrying the batch's bucket set, so empty-of-new-values months still
    appear); one hash-bucketed exchange co-locates each value; reducers
    emit (bucket_ts, n_new) partials — the driver sees O(months) rows,
    never values.  Returns (bucket_ts, n_new, cum_distinct), month-start
    epoch seconds, int64."""
    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    _SENTINEL = np.int64(-(1 << 62))  # bucket-presence marker rows

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        months = (
            batch[ts_col].to_numpy().astype("datetime64[ns]")
            .astype("datetime64[M]").astype("datetime64[s]").astype(np.int64)
        )
        f = pd.DataFrame({"value": batch[value_col].to_numpy(), "b": months})
        first = f.groupby("value", as_index=False)["b"].min()
        marks = pd.DataFrame({"value": _SENTINEL, "b": np.unique(months)})
        return pd.concat([first, marks], ignore_index=True).astype(
            {"value": np.int64, "b": np.int64}
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sen = g["value"].to_numpy() == _SENTINEL
        out = []
        real = g[~sen]
        if len(real):
            fb = real.groupby("value")["b"].min()
            nn = fb.value_counts().sort_index()
            out.append(
                pd.DataFrame(
                    {"bucket_ts": nn.index.to_numpy(np.int64),
                     "n_new": nn.to_numpy(np.int64)}
                )
            )
        if sen.any():
            out.append(
                pd.DataFrame(
                    {"bucket_ts": np.unique(g["b"].to_numpy()[sen]),
                     "n_new": np.int64(0)}
                )
            )
        return pd.concat(out, ignore_index=True)

    parts = bucketed_group_agg(
        events_ds.map_batches(partial, batch_format="pandas"),
        ["value"], reduce_bucket, num_buckets,
    ).to_pandas()
    if not len(parts):
        return pd.DataFrame(
            {
                "bucket_ts": pd.Series([], dtype=np.int64),
                "n_new": pd.Series([], dtype=np.int64),
                "cum_distinct": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        parts.groupby("bucket_ts", as_index=False)["n_new"].sum()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    out["cum_distinct"] = out["n_new"].cumsum()
    return out.astype(
        {"bucket_ts": np.int64, "n_new": np.int64, "cum_distinct": np.int64}
    )


def props_json_agg(events_ds) -> pd.DataFrame:
    """Per-event-type stats of the JSON ``props`` payload: each event
    carries a JSON object (the reference's JsonConverter record shape,
    JsonConverterTests.kt); the numeric ``k`` field is extracted with a
    REAL json parse (C-speed stdlib loads inside map_batches — robust to
    whitespace/key-order, unlike a regex scrape) and aggregated
    (count / int64-exact sum / round6 avg) per event_type.

    Scale shape: per-batch partials collapse each batch to <= |types|
    rows BEFORE leaving the task (combiner-before-exchange rule), so the
    driver-side combine sees O(types x blocks) rows, never events."""
    import json

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        k = np.fromiter(
            (int(json.loads(p)["k"]) for p in batch["props"]),
            dtype=np.int64,
            count=len(batch),
        )
        return (
            pd.DataFrame({"event_type": batch["event_type"], "k": k})
            .groupby("event_type", as_index=False)
            .agg(n=("k", "size"), sum_k=("k", "sum"))
        )

    parts = events_ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = (
        parts.groupby("event_type", as_index=False)
        .agg(n_events=("n", "sum"), sum_k=("sum_k", "sum"))
        .astype({"n_events": np.int64, "sum_k": np.int64})
    )
    out["avg_k"] = _round6(out["sum_k"].to_numpy() / out["n_events"].to_numpy())
    return out.sort_values("event_type").reset_index(drop=True)
