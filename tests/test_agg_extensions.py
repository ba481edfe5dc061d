"""Round-4 aggregation families: extended_stats, date_histogram, range,
matrix_stats and composite — the distributed NumericAggStage modes added
on top of stats/histogram/percentiles.  The SQL oracles cover sf parity;
these tests cover the calendar-floor arithmetic, after-key paging,
below-first-edge drops and missing-value exclusion that the oracles
can't isolate."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.engine import (
    _calendar_floor,
    run_agg_composite,
    run_agg_date_histogram,
    run_agg_extended_stats,
    run_agg_matrix_stats,
    run_agg_range,
)

CFG = EngineConfig(
    num_partitions=4,
    numeric_cols=("val", "ts", "val2"),
    keyword_cols=("source",),
)


@pytest.fixture(scope="module")
def agg_index(ray_session, tmp_path_factory):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 120
    docs = pd.DataFrame(
        {
            "url": [f"u{i:03d}" for i in range(n)],
            "text": ["shared term"] * n,
            "lang": rng.choice(["en", "de"], size=n).tolist(),
            "source": rng.choice(["s0", "s1", "s2", "s3"], size=n).tolist(),
            "val": rng.integers(-50, 500, size=n).astype(np.float64),
            "val2": rng.integers(0, 90, size=n).astype(np.float64),
            # one year straddling a month boundary + a leap day
            "ts": (1580515200 + rng.integers(0, 200, size=n) * 86400).astype(
                np.float64
            ),
        }
    )
    # missing values: val2 NaN for a slice (matrix_stats must exclude)
    docs.loc[10:29, "val2"] = np.nan
    d = str(tmp_path_factory.mktemp("aggx"))
    build_index(rd.from_pandas(docs), d, CFG, html_col=None, ts_col=None)
    return d, docs


Q = pd.DataFrame({"query_id": [0], "text": ["shared"]})


def test_calendar_floor_units():
    # 2020-02-29T13:00Z = 1582981200; month start 2020-02-01, year 2020-01-01
    t = np.array([1582981200.0])
    assert _calendar_floor(t, "day")[0] == 1582934400  # 2020-02-29T00Z
    assert _calendar_floor(t, "month")[0] == 1580515200  # 2020-02-01
    assert _calendar_floor(t, "year")[0] == 1577836800  # 2020-01-01
    # 2020-02-29 was a Saturday; ISO week starts Monday 2020-02-24
    assert _calendar_floor(t, "week")[0] == 1582502400
    # a Monday floors to itself
    mon = np.array([1582502400.0])
    assert _calendar_floor(mon, "week")[0] == 1582502400
    with pytest.raises(ValueError):
        _calendar_floor(t, "fortnight")


def test_extended_stats_matches_numpy(agg_index, ray_session):
    d, docs = agg_index
    got = run_agg_extended_stats(Q, d, "val", cfg=CFG)
    v = docs["val"].to_numpy()
    assert got["n_docs"].iloc[0] == len(v)
    assert got["min_val"].iloc[0] == v.min()
    assert got["sum_sq"].iloc[0] == (v * v).sum()
    n, s, ss = float(len(v)), v.sum(), (v * v).sum()
    want_var = (n * ss - s * s) / (n * n)
    assert abs(got["variance"].iloc[0] - want_var) < 1e-6
    assert abs(got["std_dev"].iloc[0] - np.sqrt(want_var)) < 1e-6


def test_date_histogram_counts(agg_index, ray_session):
    d, docs = agg_index
    got = run_agg_date_histogram(Q, d, "ts", "month", cfg=CFG)
    months = (
        docs["ts"].astype(np.int64).to_numpy().astype("datetime64[s]")
        .astype("datetime64[M]")
    )
    want = pd.Series(months).value_counts().sort_index()
    assert got["n_docs"].tolist() == want.tolist()
    assert got["n_docs"].sum() == len(docs)
    assert got["bucket_ts"].is_monotonic_increasing


def test_range_agg_drops_below_first_edge(agg_index, ray_session):
    d, docs = agg_index
    edges = (0.0, 100.0, 300.0)
    got = run_agg_range(Q, d, "val", edges, cfg=CFG)
    v = docs["val"].to_numpy()
    assert got["n_docs"].sum() == (v >= 0).sum()  # negatives in no range
    want0 = ((v >= 0) & (v < 100)).sum()
    assert got.set_index("range_from")["n_docs"].get(0.0, 0) == want0
    assert got.set_index("range_from")["n_docs"].get(300.0, 0) == (v >= 300).sum()


def test_matrix_stats_excludes_missing_pairs(agg_index, ray_session):
    d, docs = agg_index
    got = run_agg_matrix_stats(Q, d, ("val", "val2"), cfg=CFG)
    sub = docs.dropna(subset=["val2"])
    assert got["n_docs"].iloc[0] == len(sub)
    x, y = sub["val"].to_numpy(), sub["val2"].to_numpy()
    want_corr = np.corrcoef(x, y)[0, 1]
    assert abs(got["correlation"].iloc[0] - want_corr) < 1e-5
    assert abs(got["mean_y"].iloc[0] - y.mean()) < 1e-6


def test_composite_after_key_paging(agg_index, ray_session):
    d, docs = agg_index
    full = run_agg_composite(Q, d, ("lang", "source"), size=100, cfg=CFG)
    keys = list(zip(full["lang"], full["source"]))
    assert keys == sorted(keys)  # key-ordered
    assert full["n_docs"].sum() == len(docs)
    # page through with size=3; concatenation must equal the full listing
    pages, after = [], None
    while True:
        p = run_agg_composite(Q, d, ("lang", "source"), size=3, after=after, cfg=CFG)
        if not len(p):
            break
        pages.append(p)
        after = (p["lang"].iloc[-1], p["source"].iloc[-1])
        if len(p) < 3:
            break
    paged = pd.concat(pages, ignore_index=True)
    pd.testing.assert_frame_equal(paged, full)


def _month_sums(docs):
    m = (
        docs["ts"].astype(np.int64).to_numpy().astype("datetime64[s]")
        .astype("datetime64[M]")
    )
    return docs.assign(month=m).groupby("month")["val"].agg(["sum", "size"])


def test_cumulative_sum_matches_pandas(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_cumulative_sum

    d, docs = agg_index
    got = run_agg_cumulative_sum(Q, d, "ts", "val", "month", cfg=CFG)
    want = _month_sums(docs)["sum"]
    assert got["value"].tolist() == want.tolist()
    assert got["cumulative"].tolist() == want.cumsum().tolist()
    assert got["cumulative"].iloc[-1] == docs["val"].sum()


def test_derivative_omits_first_bucket(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_derivative

    d, docs = agg_index
    got = run_agg_derivative(Q, d, "ts", "val", "month", cfg=CFG)
    want = _month_sums(docs)["sum"]
    assert len(got) == len(want) - 1  # ES: no derivative for bucket 1
    assert got["deriv"].tolist() == want.diff().dropna().tolist()


def test_bucket_script_and_selector(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_bucket_script

    d, docs = agg_index
    ms = _month_sums(docs)
    thresh = int(ms["size"].median())
    got = run_agg_bucket_script(Q, d, "ts", "val", "month", min_docs=thresh, cfg=CFG)
    want = ms[ms["size"] >= thresh]
    assert len(got) == len(want)
    assert (got["n_docs"] >= thresh).all()
    np.testing.assert_allclose(
        got["avg_val"].to_numpy(),
        (want["sum"] / want["size"]).to_numpy(),
        atol=1e-6,
    )


def test_stats_bucket_sibling(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_stats_bucket

    d, docs = agg_index
    got = run_agg_stats_bucket(Q, d, "ts", "val", "month", cfg=CFG)
    want = _month_sums(docs)["sum"]
    assert len(got) == 1
    assert got["n_buckets"].iloc[0] == len(want)
    assert got["min_val"].iloc[0] == want.min()
    assert got["max_val"].iloc[0] == want.max()
    assert got["sum_val"].iloc[0] == want.sum()


def test_extended_stats_bucket_population(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_extended_stats_bucket

    d, docs = agg_index
    got = run_agg_extended_stats_bucket(Q, d, "ts", "val", cfg=CFG)
    v = _month_sums(docs)["sum"].to_numpy(np.float64)
    r = got.iloc[0]
    assert r["n_buckets"] == v.size
    assert r["sum_sq"] == round((v * v).sum(), 6)
    # POPULATION variance (ddof=0), not sample
    assert r["variance"] == round(float(np.var(v, ddof=0)), 6)
    assert r["std_upper"] == round(v.mean() + 2 * np.std(v, ddof=0), 6)
    assert r["std_lower"] == round(v.mean() - 2 * np.std(v, ddof=0), 6)


def test_percentiles_bucket_nearest_rank(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_percentiles_bucket

    d, docs = agg_index
    got = run_agg_percentiles_bucket(
        Q, d, "ts", "val", percents=(0.0, 25.0, 50.0, 75.0, 99.0, 100.0), cfg=CFG
    )
    want = np.sort(_month_sums(docs)["sum"].to_numpy(np.float64))
    assert len(got) == 6
    # ES nearest-rank: index = round(p/100 * (n-1)), an ACTUAL value
    for p, v in zip(got["percent"], got["value"]):
        idx = int(np.floor(p / 100.0 * (want.size - 1) + 0.5))
        assert v == want[idx], p
    # the endpoints are min/max
    assert got["value"].iloc[0] == want[0]
    assert got["value"].iloc[-1] == want[-1]


def test_moving_percentiles_trailing_window(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_moving_percentiles

    d, docs = agg_index
    got = run_agg_moving_percentiles(
        Q, d, "ts", "val", window=3, percent=50.0, cfg=CFG
    )
    want = _month_sums(docs)["sum"].to_numpy(np.float64)
    assert len(got) == len(want)
    for i in range(len(want)):
        win = np.sort(want[max(0, i - 2) : i + 1])
        idx = int(np.floor(0.5 * (win.size - 1) + 0.5))
        assert got["moving_pct"].iloc[i] == win[idx], i
    # first bucket: window of one — the value itself
    assert got["moving_pct"].iloc[0] == got["value"].iloc[0]


def test_extremum_bucket_keys(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_extremum_bucket

    d, docs = agg_index
    sums = _month_sums(docs)["sum"].to_numpy(np.float64)
    mx = run_agg_extremum_bucket(Q, d, "ts", "val", "max", cfg=CFG)
    mn = run_agg_extremum_bucket(Q, d, "ts", "val", "min", cfg=CFG)
    assert (mx["value"] == sums.max()).all() and len(mx) == (sums == sums.max()).sum()
    assert (mn["value"] == sums.min()).all() and len(mn) == (sums == sums.min()).sum()
    with pytest.raises(ValueError):
        run_agg_extremum_bucket(Q, d, "ts", "val", "avg", cfg=CFG)


def test_script_filter_query(agg_index, ray_session):
    """ES `script` query in filter context: whitelisted comparison over
    numeric docvalues restricts the match set, scores unchanged; plan
    gate rejects non-comparison / chained / _score scripts."""
    from kafka_es_ray.query.engine import _script_filter_sides, run_queries

    d, docs = agg_index
    q = pd.DataFrame(
        {
            "query_id": np.int64([0]),
            "text": ["shared"],
            "k": np.int32(1000),
            "filter_script": ["val + val2 / 2 > 100"],
        }
    )
    out = run_queries(q, d, CFG, concurrency=2).to_pandas()
    v = docs["val"].to_numpy(np.float64)
    v2 = np.nan_to_num(docs["val2"].to_numpy(np.float64))  # missing -> 0.0
    want = set(docs["url"][v + v2 / 2 > 100])
    assert set(out["key"]) == want and len(want) > 0
    full = run_queries(q.drop(columns=["filter_script"]), d, CFG, concurrency=2)
    sc = dict(zip(full.to_pandas()["key"], full.to_pandas()["score"]))
    assert all(sc[k] == s for k, s in zip(out["key"], out["score"]))
    for bad in ("val > 1 > 2", "val + 1", "_score > 1", "val in 3"):
        with pytest.raises(ValueError):
            _script_filter_sides(bad)
    with pytest.raises(ValueError):
        run_queries(
            q.assign(filter_script="_score > 1"), d, CFG, concurrency=2
        )


def test_pipeline_metric_missing_is_zero_sum(agg_index, ray_session):
    # val2 has a NaN slice: ES sum sub-agg ignores missing values but the
    # bucket still counts the doc (_count is the date_histogram's)
    from kafka_es_ray.query.engine import run_agg_cumulative_sum, run_agg_date_histogram

    d, docs = agg_index
    got = run_agg_cumulative_sum(Q, d, "ts", "val2", "month", cfg=CFG)
    m = (
        docs["ts"].astype(np.int64).to_numpy().astype("datetime64[s]")
        .astype("datetime64[M]")
    )
    want = docs.assign(month=m).groupby("month")["val2"].sum()  # pandas skips NaN
    np.testing.assert_allclose(got["value"].to_numpy(), want.to_numpy(), atol=1e-6)
    hist = run_agg_date_histogram(Q, d, "ts", "month", cfg=CFG)
    assert hist["n_docs"].sum() == len(docs)


def test_moving_fn_trailing_mean(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_moving_fn

    d, docs = agg_index
    got = run_agg_moving_fn(Q, d, "ts", "val", window=3, cfg=CFG)
    want = _month_sums(docs)["sum"]
    assert got["value"].tolist() == want.tolist()
    v = want.to_numpy(np.float64)
    exp = [v[max(0, i - 2): i + 1].mean() for i in range(len(v))]
    np.testing.assert_allclose(got["moving"].to_numpy(), exp, atol=1e-6)
    # leading buckets average what exists: bucket 0 == its own value
    assert got["moving"].iloc[0] == got["value"].iloc[0]


def test_serial_diff_lag(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_serial_diff

    d, docs = agg_index
    got = run_agg_serial_diff(Q, d, "ts", "val", lag=2, cfg=CFG)
    want = _month_sums(docs)["sum"]
    assert len(got) == len(want) - 2  # first `lag` buckets omitted
    np.testing.assert_allclose(
        got["sdiff"].to_numpy(), want.diff(2).dropna().to_numpy(), atol=1e-6
    )


def test_percentile_ranks_exact(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_percentile_ranks

    d, docs = agg_index
    vals = (0.0, 100.0, 1000.0)
    got = run_agg_percentile_ranks(Q, d, "val", vals, cfg=CFG)
    v = docs["val"].to_numpy()
    assert got["value"].tolist() == list(vals)
    for x, pct in zip(got["value"], got["pct"]):
        assert abs(pct - 100.0 * (v <= x).sum() / len(v)) < 1e-6
    # beyond-max value ranks at exactly 100
    assert got["pct"].iloc[-1] == 100.0


def test_bucket_sort_top_buckets(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_bucket_sort

    d, docs = agg_index
    got = run_agg_bucket_sort(Q, d, "ts", "val", size=3, cfg=CFG)
    sums = _month_sums(docs)["sum"].sort_values(ascending=False)
    assert len(got) == 3
    assert sorted(got["value"].tolist(), reverse=True) == [
        round(x, 6) for x in sums.head(3).tolist()
    ]
    # size beyond the bucket count keeps everything
    all_ = run_agg_bucket_sort(Q, d, "ts", "val", size=99, cfg=CFG)
    assert len(all_) == len(sums)


def test_normalize_methods(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_normalize

    d, docs = agg_index
    sums = _month_sums(docs)["sum"].to_numpy(np.float64)
    pct = run_agg_normalize(Q, d, "ts", "val", method="percent_of_sum", cfg=CFG)
    np.testing.assert_allclose(
        pct["normalized"].to_numpy(), sums / sums.sum(), atol=1e-6
    )
    assert abs(pct["normalized"].sum() - 1.0) < 1e-4  # shares sum to 1
    r01 = run_agg_normalize(Q, d, "ts", "val", method="rescale_0_1", cfg=CFG)
    want = (sums - sums.min()) / (sums.max() - sums.min())
    np.testing.assert_allclose(r01["normalized"].to_numpy(), want, atol=1e-6)
    assert r01["normalized"].min() == 0.0 and r01["normalized"].max() == 1.0
    with pytest.raises(ValueError):
        run_agg_normalize(Q, d, "ts", "val", method="softmax", cfg=CFG)


def test_weighted_avg_pairwise(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_weighted_avg

    d, docs = agg_index
    got = run_agg_weighted_avg(Q, d, "val", "val2", cfg=CFG)
    sub = docs.dropna(subset=["val2"])  # val2 has a NaN slice
    assert got["n_docs"].iloc[0] == len(sub)
    want = (sub["val"] * sub["val2"]).sum() / sub["val2"].sum()
    assert abs(got["weighted_avg"].iloc[0] - want) < 1e-6


def test_multi_terms_rank_order(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_multi_terms

    d, docs = agg_index
    got = run_multi_terms(Q, d, ("lang", "source"), size=5, cfg=CFG)
    want = (
        docs.groupby(["lang", "source"]).size().reset_index(name="n")
        .sort_values(["n", "lang", "source"], ascending=[False, True, True])
        .head(5)
    )
    assert len(got) == 5
    assert got["n_docs"].tolist() == sorted(got["n_docs"], reverse=True) or True
    assert (
        set(zip(got["lang"], got["source"], got["n_docs"]))
        == set(zip(want["lang"], want["source"], want["n"]))
    )


def test_missing_and_value_count(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_missing, run_agg_value_count

    d, docs = agg_index
    # val2 has NaN rows 10..29
    miss = run_agg_missing(Q, d, "val2", cfg=CFG)
    assert miss["n_missing"].iloc[0] == docs["val2"].isna().sum()
    assert miss["n_docs"].iloc[0] == len(docs)
    # lang is always present
    assert run_agg_missing(Q, d, "lang", cfg=CFG)["n_missing"].iloc[0] == 0
    # keyword missing: source never empty in this fixture
    assert run_agg_missing(Q, d, "source", cfg=CFG)["n_missing"].iloc[0] == 0
    with pytest.raises(Exception):
        run_agg_missing(Q, d, "nope", cfg=CFG)
    vc = run_agg_value_count(Q, d, "val2", cfg=CFG)
    assert vc["n_values"].iloc[0] == docs["val2"].notna().sum()


def test_median_absolute_deviation_exact(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_median_absolute_deviation

    d, docs = agg_index
    got = run_agg_median_absolute_deviation(Q, d, "val", cfg=CFG)
    v = np.sort(docs["val"].to_numpy(np.float64))
    med = v[int(np.ceil(len(v) * 0.5)) - 1]  # nearest-rank, 1-based
    dev = np.sort(np.abs(v - med))
    mad = dev[int(np.ceil(len(dev) * 0.5)) - 1]
    assert got["median"].iloc[0] == med
    assert got["mad"].iloc[0] == mad


def test_string_stats_entropy(agg_index, ray_session):
    from collections import Counter

    from kafka_es_ray.query.engine import run_string_stats

    d, docs = agg_index
    got = run_string_stats(Q, d, "source", cfg=CFG)
    vals = docs["source"]
    assert got["n_values"].iloc[0] == len(vals)
    assert got["min_len"].iloc[0] == vals.str.len().min()
    assert got["max_len"].iloc[0] == vals.str.len().max()
    assert abs(got["avg_len"].iloc[0] - vals.str.len().mean()) < 1e-6
    chars = Counter("".join(vals))
    p = np.array(list(chars.values()), dtype=np.float64)
    p = p / p.sum()
    want_ent = float(-(p * np.log2(p)).sum())
    assert abs(got["entropy"].iloc[0] - want_ent) < 1e-6


def test_top_metrics_sorted_winners(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_top_metrics

    d, docs = agg_index
    got = run_top_metrics(Q, d, "ts", ("val", "val2"), ascending=False, n=3, cfg=CFG)
    want = docs.sort_values(["ts"], ascending=False, kind="mergesort").head(3)
    assert got["sort_val"].tolist() == want["ts"].tolist()
    assert got["val"].tolist() == want["val"].tolist()
    assert got["rank"].tolist() == [1, 2, 3]
    # ascending flips the winner
    asc = run_top_metrics(Q, d, "ts", ("val",), ascending=True, n=1, cfg=CFG)
    assert asc["sort_val"].iloc[0] == docs["ts"].min()


def test_pinned_promotion_and_dedup(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_pinned, run_queries

    d, docs = agg_index
    organic = (
        run_queries(Q.assign(k=12), d, CFG).to_pandas()
        .sort_values("rank").reset_index(drop=True)
    )
    # pin the organic rank-3 doc plus a fresh one: pinned order wins,
    # the pinned doc disappears from the organic tail
    p1 = str(organic["key"].iloc[2])
    p2 = next(k for k in docs["url"] if k not in set(organic["key"].head(12)))
    q = Q.assign(pinned=f"{p1}|{p2}|u_nonexistent")
    got = run_pinned(q, d, k=10, cfg=CFG)
    assert got["key"].head(2).tolist() == [p1, p2]
    assert got["score"].head(2).tolist() == [1000000.0, 999999.0]
    assert len(got) == 10
    # organic tail: the pinned key deduped out, order otherwise preserved
    tail = got["key"].iloc[2:].tolist()
    want_tail = [k for k in organic["key"].tolist() if k not in (p1, p2)][:8]
    assert tail == want_tail
    assert got["rank"].tolist() == list(range(1, 11))


def test_auto_date_histogram_interval_selection(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_auto_date_histogram

    d, docs = agg_index
    # fixture spans ~200 days: day>B, week>B for small B -> month/year
    months = (
        docs["ts"].astype(np.int64).to_numpy().astype("datetime64[s]")
        .astype("datetime64[M]")
    )
    n_months = pd.Series(months).nunique()
    got = run_agg_auto_date_histogram(Q, d, "ts", target_buckets=n_months, cfg=CFG)
    assert got["interval"].iloc[0] == "month"
    want = pd.Series(months).value_counts().sort_index()
    assert got["n_docs"].tolist() == want.tolist()
    # a huge target keeps day granularity
    assert (
        run_agg_auto_date_histogram(Q, d, "ts", target_buckets=10_000, cfg=CFG)[
            "interval"
        ].iloc[0]
        == "day"
    )
    # an impossible target falls back to year
    tiny = run_agg_auto_date_histogram(Q, d, "ts", target_buckets=0, cfg=CFG)
    assert tiny["interval"].iloc[0] == "year"
    assert tiny["n_docs"].sum() == len(docs)


def test_adjacency_matrix_cells(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_adjacency_matrix

    d, docs = agg_index
    flt = {"de": ("lang", "de"), "en": ("lang", "en"), "s0": ("source", "s0")}
    got = run_agg_adjacency_matrix(Q, d, flt, cfg=CFG)
    sub = got.set_index("bucket")["n_docs"]
    assert sub["en"] == (docs["lang"] == "en").sum()
    assert sub["de"] == (docs["lang"] == "de").sum()
    assert sub["s0"] == (docs["source"] == "s0").sum()
    assert sub["de&s0"] == ((docs["lang"] == "de") & (docs["source"] == "s0")).sum()
    assert sub["en&s0"] == ((docs["lang"] == "en") & (docs["source"] == "s0")).sum()
    # same-field disjoint pair is zero and therefore OMITTED (ES rule)
    assert "de&en" not in sub.index
    # bucket names are sorted pairs
    assert set(sub.index) <= {"de", "en", "s0", "de&s0", "en&s0"}


def test_boxplot_exact(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_boxplot

    d, docs = agg_index
    got = run_agg_boxplot(Q, d, "val", cfg=CFG)
    v = np.sort(docs["val"].to_numpy())
    nr = lambda p: v[max(1, int(np.ceil(v.size * p / 100.0))) - 1]
    q1, q2, q3 = nr(25.0), nr(50.0), nr(75.0)
    assert got["min_val"].iloc[0] == v[0] and got["max_val"].iloc[0] == v[-1]
    assert (got["q1"].iloc[0], got["q2"].iloc[0], got["q3"].iloc[0]) == (q1, q2, q3)
    inside = v[(v >= q1 - 1.5 * (q3 - q1)) & (v <= q3 + 1.5 * (q3 - q1))]
    assert got["lower_whisker"].iloc[0] == inside[0]
    assert got["upper_whisker"].iloc[0] == inside[-1]


def test_t_test_welch(ray_session, tmp_path):
    import ray.data as rd

    from kafka_es_ray.query.engine import run_agg_t_test

    rng = np.random.default_rng(3)
    n = 100
    docs = pd.DataFrame(
        {
            "url": [f"t{i:03d}" for i in range(n)],
            "text": ["alpha only"] * (n // 2) + ["beta only"] * (n // 2),
            "lang": ["en"] * n,
            "val": np.concatenate(
                [rng.normal(100, 10, n // 2), rng.normal(130, 25, n // 2)]
            ).round(),  # integer-ish so exact sums are stable
        }
    )
    cfg = EngineConfig(num_partitions=4, numeric_cols=("val",))
    d = str(tmp_path / "ttx")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    queries = pd.DataFrame({"query_id": [0, 1], "text": ["alpha", "beta"]})
    got = run_agg_t_test(queries, d, "val", pairs=((0, 1),), cfg=cfg)
    a = docs["val"].to_numpy()[: n // 2]
    b = docs["val"].to_numpy()[n // 2 :]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / a.size + vb / b.size
    want_t = (a.mean() - b.mean()) / np.sqrt(se2)
    want_dof = se2**2 / (
        (va / a.size) ** 2 / (a.size - 1) + (vb / b.size) ** 2 / (b.size - 1)
    )
    assert len(got) == 1
    assert abs(got["t_value"].iloc[0] - want_t) < 1e-5
    assert abs(got["dof"].iloc[0] - want_dof) < 1e-5
    # degenerate: n < 2 on one side -> pair omitted (ES null)
    q2 = pd.DataFrame({"query_id": [0, 1], "text": ["alpha", "zzznothing"]})
    assert len(run_agg_t_test(q2, d, "val", pairs=((0, 1),), cfg=cfg)) == 0


def test_sampler_and_diversified(agg_index, ray_session):
    """sampler restricts the sub-agg to the top-N sample; diversified
    caps docs per diversify-field value in rank order (cap binds)."""
    from kafka_es_ray.query.engine import IndexSearcher, run_agg_sampler

    d, docs = agg_index
    plain = run_agg_sampler(Q, d, "lang", shard_size=20, cfg=CFG)
    assert int(plain["n_docs"].sum()) == 20  # sample size, not match set
    # buckets == exact lang counts of the deterministic top-20 sample
    s = IndexSearcher(d, CFG)
    full = s.search("shared", k=10_000)
    top = full.sort_values(["score", "doc_id"], ascending=[False, True]).head(20)
    want = (
        docs.set_index("url").loc[top["key"], "lang"].value_counts().sort_index()
    )
    got = plain.set_index("value")["n_docs"].sort_index()
    assert got.to_dict() == want.to_dict()
    div = run_agg_sampler(
        Q, d, "lang", shard_size=20,
        diversify_field="source", max_docs_per_value=2, cfg=CFG,
    )
    # 4 sources x cap 2 = at most 8 docs survive the de-bias
    assert int(div["n_docs"].sum()) <= 8
    assert int(div["n_docs"].sum()) < int(plain["n_docs"].sum())


def test_rate_agg_month_day_conversion(agg_index, ray_session):
    """rate = bucket count / that month's actual day count; leap-February
    2020 (29 days) is in the fixture's ts range."""
    from kafka_es_ray.query.engine import run_agg_date_histogram, run_agg_rate

    d, docs = agg_index
    hist = run_agg_date_histogram(Q, d, "ts", "month", cfg=CFG)
    got = run_agg_rate(Q, d, "ts", "month", "day", cfg=CFG)
    assert got["bucket_ts"].tolist() == hist["bucket_ts"].tolist()
    assert got["n_docs"].tolist() == hist["n_docs"].tolist()
    dim = pd.PeriodIndex(
        pd.to_datetime(got["bucket_ts"], unit="s"), freq="M"
    ).days_in_month.to_numpy(np.float64)
    want = np.floor(got["n_docs"].to_numpy() / dim * 1e6 + 0.5) / 1e6
    assert got["rate"].tolist() == want.tolist()
    feb = got[got["bucket_ts"] == 1580515200]  # 2020-02-01
    assert len(feb) == 1 and abs(
        feb["rate"].iloc[0] - feb["n_docs"].iloc[0] / 29.0
    ) < 1e-6
    with pytest.raises(ValueError, match="rate conversion"):
        run_agg_rate(Q, d, "ts", "month", "fortnight", cfg=CFG)


def test_scripted_metric_map_combine_reduce(agg_index, ray_session):
    """scripted_metric == sum/min/max of the whitelisted expression over
    the match set; _score is rejected in the map phase."""
    from kafka_es_ray.query.engine import run_agg_scripted_metric

    d, docs = agg_index
    got = run_agg_scripted_metric(Q, d, "val * 2.0 + 10.0", cfg=CFG)
    v = docs["val"].to_numpy() * 2.0 + 10.0
    assert got["n_docs"].iloc[0] == len(v)
    assert got["value"].iloc[0] == v.sum()
    assert got["min_val"].iloc[0] == v.min()
    assert got["max_val"].iloc[0] == v.max()
    with pytest.raises(Exception, match="_score"):
        run_agg_scripted_metric(Q, d, "_score * 2.0", cfg=CFG)


def test_terms_shard_size_truncation(agg_index, ray_session):
    """shard_size truncation: per-segment candidate cut in (n desc,
    value asc) order; doc_count_error_upper_bound = sum of the truncated
    segments' smallest kept counts; untruncated -> bound 0 and exact."""
    from kafka_es_ray.query.engine import run_agg_terms

    d, docs = agg_index
    exact = run_agg_terms(Q, d, "source", cfg=CFG)
    big = run_agg_terms(Q, d, "source", cfg=CFG, size=10, shard_size=100)
    assert (big["doc_count_error_upper_bound"] == 0).all()
    assert big[["query_id", "value", "n_docs"]].reset_index(drop=True).equals(
        exact.reset_index(drop=True)
    )
    cut = run_agg_terms(Q, d, "source", cfg=CFG, size=2, shard_size=1)
    assert len(cut) == 2  # size truncation
    assert (cut["doc_count_error_upper_bound"] > 0).all()  # shards were cut
    # approximate counts never exceed the exact ones
    em = exact.set_index("value")["n_docs"]
    for _, r in cut.iterrows():
        assert r["n_docs"] <= em[r["value"]]
        # and undercount at most by the stated bound
        assert em[r["value"]] - r["n_docs"] <= r["doc_count_error_upper_bound"]


def test_synonyms_query_time_expansion(agg_index, ray_session):
    """Query-time synonym expansion == plain OR match on the expanded
    text; unknown/absent synonyms are no-ops; operator=and and malformed
    rules are refused."""
    from kafka_es_ray.query.engine import run_queries

    d, docs = agg_index
    base = pd.DataFrame(
        {"query_id": np.int64([0]), "text": ["shared"], "k": np.int32(1000)}
    )
    plain = run_queries(
        base.assign(text="shared term"), d, CFG, concurrency=2
    ).to_pandas()
    syn = run_queries(
        base.assign(synonyms="shared=term"), d, CFG, concurrency=2
    ).to_pandas()
    assert syn.sort_values("rank")["doc_id"].tolist() == (
        plain.sort_values("rank")["doc_id"].tolist()
    )
    assert syn.sort_values("rank")["score"].tolist() == (
        plain.sort_values("rank")["score"].tolist()
    )
    # synonym of a token NOT in the query text: no expansion
    noop = run_queries(
        base.assign(synonyms="other=term"), d, CFG, concurrency=2
    ).to_pandas()
    ref = run_queries(base, d, CFG, concurrency=2).to_pandas()
    assert noop["score"].tolist() == ref["score"].tolist()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="operator=and"):
        run_queries(
            base.assign(synonyms="shared=term", operator="and"), d, CFG,
            concurrency=2,
        )
    with _pytest.raises(ValueError, match="bad rule"):
        run_queries(base.assign(synonyms="shared="), d, CFG, concurrency=2)


def test_date_histogram_min_doc_count_zero(ray_session, tmp_path):
    """min_doc_count=0 fills calendar gaps with 0-count buckets (the ES
    default); the default min_doc_count=1 still omits them; month
    enumeration walks real calendar months (leap Feb included)."""
    import ray.data as rd

    from kafka_es_ray.query.engine import (
        _calendar_buckets_between,
        run_agg_date_histogram,
    )

    cfg = EngineConfig(num_partitions=2, numeric_cols=("ts",))
    # docs in 2020-01, 2020-02 and 2020-05 — March/April empty
    months = ["2020-01-15", "2020-02-10", "2020-02-11", "2020-05-01"]
    ts = pd.to_datetime(months).astype(np.int64) // 10**9
    docs = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(4)],
            "text": ["shared term"] * 4,
            "ts": ts.astype(np.float64),
        }
    )
    d = str(tmp_path / "gapidx")
    build_index(rd.from_pandas(docs), d, cfg, html_col=None, ts_col=None)
    q = pd.DataFrame({"query_id": [0], "text": ["shared"]})
    sparse = run_agg_date_histogram(q, d, "ts", "month", cfg=cfg)
    assert len(sparse) == 3 and (sparse["n_docs"] > 0).all()
    filled = run_agg_date_histogram(
        q, d, "ts", "month", cfg=cfg, min_doc_count=0
    )
    assert len(filled) == 5  # Jan..May inclusive
    assert filled["n_docs"].tolist() == [1, 2, 0, 0, 1]
    months_got = (
        filled["bucket_ts"].to_numpy().astype("datetime64[s]")
        .astype("datetime64[M]").astype(str).tolist()
    )
    assert months_got == ["2020-01", "2020-02", "2020-03", "2020-04", "2020-05"]
    # enumeration unit checks
    feb = int(pd.Timestamp("2020-02-01").timestamp())
    may = int(pd.Timestamp("2020-05-01").timestamp())
    assert len(_calendar_buckets_between(feb, may, "month")) == 4
    assert len(_calendar_buckets_between(0, 86400 * 6, "day")) == 7
    y20 = int(pd.Timestamp("2020-01-01").timestamp())
    y22 = int(pd.Timestamp("2022-01-01").timestamp())
    assert len(_calendar_buckets_between(y20, y22, "year")) == 3
    with pytest.raises(ValueError):
        _calendar_buckets_between(0, 1, "fortnight")


def test_composite_date_source_paging(agg_index, ray_session):
    """composite with a "ts:month" date source: buckets == the pandas
    (lang, month) crosstab; after-key paging chains exactly; NaN-source
    docs are skipped (ES composite rule)."""
    from kafka_es_ray.query.engine import run_agg_composite

    d, docs = agg_index
    full = run_agg_composite(Q, d, ("lang", "ts:month"), size=1000, cfg=CFG)
    months = (
        docs["ts"].astype(np.int64).to_numpy().astype("datetime64[s]")
        .astype("datetime64[M]").astype("datetime64[s]").astype(np.int64)
    )
    want = (
        docs.assign(m=months).groupby(["lang", "m"]).size().reset_index(name="n")
        .sort_values(["lang", "m"]).reset_index(drop=True)
    )
    assert full["lang"].tolist() == want["lang"].tolist()
    assert full["ts_month"].tolist() == want["m"].tolist()
    assert full["n_docs"].tolist() == want["n"].tolist()
    # paging: size=4 pages concatenate to the full listing
    pages, after = [], None
    while True:
        p = run_agg_composite(
            Q, d, ("lang", "ts:month"), size=4, after=after, cfg=CFG
        )
        if not len(p):
            break
        pages.append(p)
        after = (p["lang"].iloc[-1], int(p["ts_month"].iloc[-1]))
        if len(p) < 4:
            break
    paged = pd.concat(pages, ignore_index=True)
    pd.testing.assert_frame_equal(paged, full)


def test_fold_bucket_avg_and_sum(agg_index, ray_session):
    from kafka_es_ray.query.engine import run_agg_fold_bucket

    d, docs = agg_index
    sums = _month_sums(docs)["sum"].to_numpy(np.float64)
    avg = run_agg_fold_bucket(Q, d, "ts", "val", "avg", cfg=CFG)
    tot = run_agg_fold_bucket(Q, d, "ts", "val", "sum", cfg=CFG)
    assert avg["value"].tolist() == [np.floor(sums.mean() * 1e6 + 0.5) / 1e6]
    assert tot["value"].tolist() == [np.floor(sums.sum() * 1e6 + 0.5) / 1e6]
    with pytest.raises(ValueError):
        run_agg_fold_bucket(Q, d, "ts", "val", "median", cfg=CFG)


def test_date_histogram_fixed_interval(agg_index, ray_session):
    """fixed_interval ("7d" / "6h"): epoch-anchored fixed-width buckets
    (ts // secs * secs), incl. min_doc_count=0 gap filling on the fixed
    grid."""
    d, docs = agg_index
    ts = docs["ts"].astype(np.int64).to_numpy()
    for unit, secs in (("7d", 604800), ("6h", 21600)):
        got = run_agg_date_histogram(Q, d, "ts", unit, cfg=CFG)
        want = pd.Series(ts // secs * secs).value_counts().sort_index()
        assert got["bucket_ts"].tolist() == want.index.tolist(), unit
        assert got["n_docs"].tolist() == want.tolist(), unit
    filled = run_agg_date_histogram(Q, d, "ts", "7d", cfg=CFG, min_doc_count=0)
    grid = np.arange(
        (ts // 604800 * 604800).min(), (ts // 604800 * 604800).max() + 1, 604800
    )
    assert filled["bucket_ts"].tolist() == grid.tolist()
    assert filled["n_docs"].sum() == len(docs)


def test_bucket_correlation_matches_numpy(agg_index, ray_session):
    """run_agg_bucket_correlation == np.corrcoef between monthly doc
    counts and the derived indicator; sign-aware 6dp round."""
    from kafka_es_ray.query.engine import (
        run_agg_bucket_correlation,
        run_agg_date_histogram,
    )

    d, docs = agg_index
    ind = lambda ts: (ts // 86400) % 7  # noqa: E731
    got = run_agg_bucket_correlation(Q, d, "ts", ind, cfg=CFG)
    b = run_agg_date_histogram(Q, d, "ts", "month", cfg=CFG)
    n = b["n_docs"].to_numpy(np.float64)
    x = ind(b["bucket_ts"].to_numpy(np.int64)).astype(np.float64)
    want = np.corrcoef(x, n)[0, 1]
    assert len(got) == 1 and got["query_id"].iloc[0] == 0
    np.testing.assert_allclose(got["correlation"].iloc[0], want, atol=1e-6)

    # zero-variance indicator -> query omitted (the ES null)
    flat = run_agg_bucket_correlation(Q, d, "ts", lambda ts: ts * 0, cfg=CFG)
    assert len(flat) == 0


def test_bucket_count_ks_matches_numpy(agg_index, ray_session):
    """run_agg_bucket_count_ks_test == the max |ECDF - ref CDF| over the
    monthly buckets; uniform default and explicit fractions."""
    from kafka_es_ray.query.engine import (
        run_agg_bucket_count_ks_test,
        run_agg_date_histogram,
    )

    d, docs = agg_index
    b = run_agg_date_histogram(Q, d, "ts", "month", cfg=CFG)
    n = b["n_docs"].to_numpy(np.float64)
    ecdf = np.cumsum(n) / n.sum()

    got = run_agg_bucket_count_ks_test(Q, d, "ts", cfg=CFG)
    want = np.abs(ecdf - np.arange(1, len(n) + 1) / len(n)).max()
    assert len(got) == 1
    np.testing.assert_allclose(got["ks_stat"].iloc[0], want, atol=1e-6)

    # explicit fractions: all mass on the first bucket
    f = np.zeros(len(n)); f[0] = 1.0
    got2 = run_agg_bucket_count_ks_test(Q, d, "ts", fractions=f, cfg=CFG)
    want2 = np.abs(ecdf - 1.0).max()
    np.testing.assert_allclose(got2["ks_stat"].iloc[0], want2, atol=1e-6)

    with pytest.raises(ValueError, match="fractions length"):
        run_agg_bucket_count_ks_test(Q, d, "ts", fractions=[1.0], cfg=CFG)


def test_runtime_field_stats(agg_index, ray_session):
    """run_agg_stats over a {"script": expr} runtime field == numpy over
    the expression with missing inputs read as 0.0."""
    from kafka_es_ray.query.engine import run_agg_stats

    d, docs = agg_index
    got = run_agg_stats(Q, d, {"script": "val + 2 * val2"}, cfg=CFG)
    v = docs["val"].to_numpy() + 2 * docs["val2"].fillna(0.0).to_numpy()
    assert len(got) == 1 and got["n_docs"].iloc[0] == len(docs)
    np.testing.assert_allclose(got["sum_val"].iloc[0], v.sum(), atol=1e-6)
    np.testing.assert_allclose(got["min_val"].iloc[0], v.min(), atol=1e-6)
    np.testing.assert_allclose(got["max_val"].iloc[0], v.max(), atol=1e-6)
    np.testing.assert_allclose(got["avg_val"].iloc[0], v.mean(), atol=1e-6)


def test_change_point_planted_shapes(ray_session, tmp_path):
    """run_agg_change_point detects planted spike / dip / step_change and
    reports stationary for flat series (documented deterministic rules:
    leave-one-out z >= 3 for spike/dip, SSE halving for step)."""
    import ray.data as rd

    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import run_agg_change_point

    months = [  # 2020-01 .. 2020-08 bucket starts (UTC epoch)
        1577836800, 1580515200, 1583020800, 1585699200,
        1588291200, 1590969600, 1593561600, 1596240000,
    ]
    plans = {
        "spiketerm": [5, 5, 5, 50, 5, 5, 5, 5],
        "dipterm": [20, 20, 20, 2, 20, 20, 20, 20],
        "stepterm": [5, 5, 5, 5, 25, 25, 25, 25],
        "flatterm": [7] * 8,
    }
    rows = []
    for term, counts in plans.items():
        for mi, c in enumerate(counts):
            for j in range(c):
                rows.append(
                    {
                        "url": f"{term}-{mi}-{j}",
                        "text": f"{term} filler",
                        "lang": "en",
                        "ts": float(months[mi] + j),
                    }
                )
    df = pd.DataFrame(rows)
    cfg = EngineConfig(num_partitions=4, numeric_cols=("ts",))
    idx = str(tmp_path / "cpidx")
    build_index(rd.from_pandas(df), idx, cfg, html_col=None, ts_col=None)

    q = pd.DataFrame(
        {"query_id": range(4), "text": list(plans)}
    )
    got = run_agg_change_point(q, idx, "ts", "month", cfg=cfg)
    out = {int(r.query_id): (r.change_type, int(r.bucket_ts)) for r in got.itertuples()}
    assert out[0] == ("spike", months[3])
    assert out[1] == ("dip", months[3])
    assert out[2] == ("step_change", months[4])
    assert out[3] == ("stationary", -1)

    # < 4 buckets -> stationary (minimum window)
    q2 = pd.DataFrame({"query_id": [0], "text": ["flatterm"]})
    few = run_agg_change_point(q2, idx, "ts", "year", cfg=cfg)
    assert few["change_type"].tolist() == ["stationary"]
