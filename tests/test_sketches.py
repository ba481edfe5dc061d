"""HyperLogLog mergeable sketch: accuracy vs exact, merge invariance."""

import numpy as np
import pandas as pd

from kafka_es_ray.pipelines.sketches import _hll_build, _hll_estimate, approx_distinct


def test_accuracy_vs_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vals = [f"u{int(x)}" for x in rng.integers(0, 5000, 100_000)]
    true = len(set(vals))
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    est = approx_distinct(ds, "v")
    assert abs(est - true) / true < 0.05  # p=12 -> ~1.6% typical


def test_merge_equals_single_build():
    """Sketch of the union == elementwise max of the parts' sketches —
    the mergeability property that makes execution order irrelevant."""
    a = [f"a{i}" for i in range(4000)]
    b = [f"b{i}" for i in range(3000)] + a[:1000]
    merged = np.maximum(_hll_build(a), _hll_build(b))
    single = _hll_build(a + b)
    assert np.array_equal(merged, single)
    assert abs(_hll_estimate(single) - 7000) / 7000 < 0.05


def test_events_table(ray_session):
    import duckdb
    import ray.data as rd

    from kafka_es_ray.sources.parquet import read_table

    sf = "/root/testdata/sf0.001"
    est = approx_distinct(read_table(sf, "events", columns=["user_id"]), "user_id")
    (true,) = duckdb.sql(f"select count(distinct user_id) from '{sf}/events.parquet'").fetchone()
    assert abs(est - true) / true < 0.05


# ----------------------------------------------- DDSketch quantiles


def _exact_nearest_rank(vals: np.ndarray, p: float) -> float:
    v = np.sort(vals[~np.isnan(vals)])
    return float(v[max(1, int(np.ceil(v.size * p / 100.0))) - 1])


def test_ddsketch_relative_error(ray_session):
    import ray.data as rd

    from kafka_es_ray.pipelines.sketches import approx_quantiles

    rng = np.random.default_rng(9)
    vals = np.concatenate(
        [
            rng.lognormal(3.0, 2.0, 20_000),          # heavy positive tail
            -rng.lognormal(1.0, 1.0, 5_000),          # negatives
            np.zeros(100),
        ]
    )
    df = pd.DataFrame({"value": vals})
    got = approx_quantiles(rd.from_pandas(df), "value", (1.0, 25.0, 50.0, 75.0, 99.0), alpha=0.01)
    for p, v in zip(got["pct"], got["value"]):
        want = _exact_nearest_rank(vals, p)
        if want == 0:
            assert abs(v) < 1e-9
        else:
            assert abs(v / want - 1.0) <= 0.025, (p, v, want)  # ~alpha + rank slack


def test_ddsketch_execution_order_invariant(ray_session):
    import ray.data as rd

    from kafka_es_ray.pipelines.sketches import approx_quantiles

    rng = np.random.default_rng(10)
    vals = rng.lognormal(2.0, 1.5, 30_000)
    a = approx_quantiles(
        rd.from_pandas(pd.DataFrame({"value": vals})).repartition(3), "value"
    )
    b = approx_quantiles(
        rd.from_pandas(pd.DataFrame({"value": vals[::-1].copy()})).repartition(17),
        "value",
    )
    pd.testing.assert_frame_equal(a, b)  # bucket keys depend on VALUES only


def test_ddsketch_events_value(ray_session):
    import ray.data as rd

    from kafka_es_ray.pipelines.sketches import approx_quantiles
    from kafka_es_ray.sources.parquet import read_table

    ds = read_table("/root/testdata/sf0.001", "events", columns=["value"])
    got = approx_quantiles(ds, "value")
    vals = rd.read_parquet("/root/testdata/sf0.001/events.parquet").to_pandas()["value"].to_numpy()
    for p, v in zip(got["pct"], got["value"]):
        want = _exact_nearest_rank(vals, p)
        if abs(want) > 1e-12:
            assert abs(v / want - 1.0) <= 0.025, (p, v, want)
