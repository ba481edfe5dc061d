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


# ----------------------------------------------- Count-Min heavy hitters


def test_cms_never_underestimates_and_bounded():
    from kafka_es_ray.pipelines.sketches import _cms_build, _cms_query

    rng = np.random.default_rng(11)
    vals = np.array([f"v{i}" for i in range(5000)], dtype=object)
    counts = rng.integers(1, 50, vals.size)
    table = _cms_build(vals, counts, depth=4, width=4096)
    est = _cms_query(table, vals)
    assert (est >= counts).all()  # one-sided error by construction
    n = int(counts.sum())
    # CMS bound: overestimate <= e*n/width w.h.p.; allow 3x slack
    assert int((est - counts).max()) <= int(3 * np.e * n / 4096)


def test_cms_merge_is_addition():
    """CMS of the union multiset == sum of the parts' tables — the
    mergeability property that makes execution order irrelevant."""
    from kafka_es_ray.pipelines.sketches import _cms_build

    a_vals = np.array([f"a{i}" for i in range(300)], dtype=object)
    b_vals = np.array([f"a{i}" for i in range(150)] + ["x", "y"], dtype=object)
    ca = np.ones(a_vals.size, dtype=np.int64)
    cb = np.full(b_vals.size, 2, dtype=np.int64)
    merged = _cms_build(a_vals, ca, 4, 1024) + _cms_build(b_vals, cb, 4, 1024)
    joint = pd.Series(
        np.concatenate([np.repeat(a_vals, ca), np.repeat(b_vals, cb)])
    ).value_counts()
    single = _cms_build(
        joint.index.to_numpy(dtype=object), joint.to_numpy(np.int64), 4, 1024
    )
    assert np.array_equal(merged, single)


def test_heavy_hitters_zipf_exact_heads(ray_session):
    """On a zipf-ish corpus the CMS top-k matches the exact top-k values
    AND exact counts (heads are far above the noise floor)."""
    import ray.data as rd

    from kafka_es_ray.pipelines.sketches import heavy_hitters

    rng = np.random.default_rng(12)
    # 20 head values with huge separated counts + 20k tail singletons
    heads = [f"head{i:02d}" for i in range(20)]
    vals = []
    for i, h in enumerate(heads):
        vals += [h] * (5000 - 200 * i)
    vals += [f"tail{i}" for i in range(20_000)]
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    got = heavy_hitters(ds, "v", k=10)
    exact = pd.Series(vals).value_counts()
    assert list(got["value"]) == list(exact.index[:10])
    # estimates are upper bounds within the CMS error budget
    true = exact[got["value"]].to_numpy(np.int64)
    assert (got["approx_count"].to_numpy() >= true).all()
    assert int((got["approx_count"].to_numpy() - true).max()) <= int(
        3 * np.e * len(vals) / 4096
    )


def test_heavy_hitters_order_invariant(ray_session):
    import ray.data as rd

    from kafka_es_ray.pipelines.sketches import heavy_hitters

    vals = [f"h{i % 37}" for i in range(10_000)]
    a = heavy_hitters(rd.from_pandas(pd.DataFrame({"v": vals})).repartition(3), "v", k=5)
    b = heavy_hitters(
        rd.from_pandas(pd.DataFrame({"v": vals[::-1]})).repartition(11), "v", k=5
    )
    pd.testing.assert_frame_equal(a, b)
