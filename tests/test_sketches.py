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
