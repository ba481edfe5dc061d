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


def _round6(x):
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


def windowed_agg(events_ds, window: str = "1h"):
    """Tumbling-window count/sum per (window_start, event_type).

    The time-based flush of the reference's BufferingActor (bulk.delay.ms
    select+onTimeout, Actors.kt:150-152) is the streaming cousin of this:
    bounded batch runs collapse time windows to event-time grouping."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["ts"].dt.floor(window)
        g = (
            pd.DataFrame({"window_start": w, "event_type": batch["event_type"], "value": batch["value"]})
            .groupby(["window_start", "event_type"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        )
        return g

    partials = events_ds.map_batches(partial, batch_format="pandas", batch_size=8192)
    agg = partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        # epoch seconds (int64) — timestamp-unit-agnostic for oracle parity
        ws = pd.to_datetime(batch["window_start"]).astype("int64") // 10**9
        return pd.DataFrame(
            {
                "window_start_s": ws.astype(np.int64),
                "event_type": batch["event_type"],
                "n_events": batch["n_events"].astype(np.int64),
                "sum_value": _round6(batch["sum_value"]),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


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

    partials = orders_ds.map_batches(JoinStage, batch_format="pandas", batch_size=8192, concurrency=2)
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
