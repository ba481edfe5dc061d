"""ES geo query/aggregation family (geo_distance / geo_bounding_box
filters; geo_distance, geotile_grid, geo_centroid, geo_bounds aggs).

Storage model: a geo_point field ``F`` = two numeric docstore columns
``{F}_lat``/``{F}_lon`` (functions/geo.py).  Oracle here: brute-force
pandas haversine/mercator over the same corpus; DuckDB parity is covered
by the __ray_entry__ oracles (tools/check_oracle.py).
"""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.functions.geo import (
    EARTH_RADIUS_M,
    geotile_pack,
    geotile_unpack,
    geotile_xy,
    haversine_m,
)
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.engine import (
    run_agg_geo_bounds,
    run_agg_geo_centroid,
    run_agg_geo_distance,
    run_agg_geotile_grid,
    run_queries,
)

CFG = EngineConfig(num_partitions=4, numeric_cols=("loc_lat", "loc_lon"))
WORDS = ["alpha", "beta", "gamma", "delta", "omega", "kappa"]
ORIGIN = (10.0, 20.0)


def _corpus(n=150, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(3, 8)).tolist())
        for _ in range(n)
    ]
    lat = np.round(rng.uniform(-90, 90, size=n), 2)
    lon = np.round(rng.uniform(-180, 180, size=n), 2)
    miss = rng.random(n) < 0.1  # docs with no location
    lat[miss] = np.nan
    lon[miss] = np.nan
    return pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "doc_id": np.arange(1, n + 1, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "loc_lat": lat,
            "loc_lon": lon,
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    df = _corpus()
    idx = str(tmp_path_factory.mktemp("geoidx"))
    build_index(
        rd.from_pandas(df), idx, CFG,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    return idx, df


def _brute_match(df: pd.DataFrame, terms: list[str]) -> pd.DataFrame:
    hit = df["text"].str.split().apply(lambda t: any(w in t for w in terms))
    return df[hit]


def _queries(texts: list[str], k: int = 1000) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "query_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "k": np.int32(k),
        }
    )


# ---------------------------------------------------------------- kernels

def test_haversine_zero_and_symmetry():
    d0 = haversine_m(np.array([10.0]), np.array([20.0]), 10.0, 20.0)
    assert d0[0] == 0.0
    a = haversine_m(np.array([48.8566]), np.array([2.3522]), 51.5074, -0.1278)
    b = haversine_m(np.array([51.5074]), np.array([-0.1278]), 48.8566, 2.3522)
    assert a[0] == b[0]
    assert 340_000 < a[0] < 350_000  # London-Paris ~344 km


def test_haversine_equator_degree():
    # one degree of longitude on the equator = R * pi/180
    d = haversine_m(np.array([0.0]), np.array([1.0]), 0.0, 0.0)
    assert abs(d[0] - EARTH_RADIUS_M * np.pi / 180.0) < 1e-3


def test_geotile_known_cells():
    # zoom 1: the world is 2x2 tiles; (0, 0) is the bottom-right of the
    # top-left quadrant boundary -> tile (1, 1)
    x, y = geotile_xy(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1)
    # north-west corner clamps into (0, 0)
    x, y = geotile_xy(np.array([89.0]), np.array([-180.0]), 1)
    assert (x[0], y[0]) == (0, 0)
    # lon just below +180 stays in the last column
    x, y = geotile_xy(np.array([-45.0]), np.array([179.99]), 3)
    assert x[0] == 7 and 0 <= y[0] <= 7


def test_geohash_known_cells():
    from kafka_es_ray.functions.geo import geohash_cells, geohash_render

    # canonical vector: (57.64911, 10.40744) -> "u4pruydqqvj"
    for p, want in ((1, "u"), (2, "u4"), (4, "u4pr")):
        c = geohash_cells(np.array([57.64911]), np.array([10.40744]), p)
        assert geohash_render(c, p) == [want]
    # equator/greenwich lands in "s" (the cell NE of the origin)
    c = geohash_cells(np.array([0.0]), np.array([0.0]), 1)
    assert geohash_render(c, 1) == ["s"]


def test_geotile_pack_roundtrip():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-85, 85, size=200)
    lon = rng.uniform(-180, 180, size=200)
    for zoom in (0, 3, 8):
        x, y = geotile_xy(lat, lon, zoom)
        key = geotile_pack(x, y, zoom)
        x2, y2 = geotile_unpack(key, zoom)
        assert (x2 == x).all() and (y2 == y).all()


# ------------------------------------------------------------- query paths

def test_geo_distance_filter_matches_bruteforce(built):
    idx, df = built
    q = _queries(["alpha beta"]).assign(
        geo_field="loc", geo_lat=ORIGIN[0], geo_lon=ORIGIN[1],
        geo_distance_m=6_000_000.0,
    )
    out = run_queries(q, idx, CFG).to_pandas()
    want = _brute_match(df, ["alpha", "beta"])
    d = haversine_m(
        want["loc_lat"].to_numpy(), want["loc_lon"].to_numpy(), *ORIGIN
    )
    want = want[~np.isnan(d) & (d <= 6_000_000.0)]
    assert set(out["doc_id"]) == set(want["doc_id"])
    assert len(want) > 0


def test_geo_bbox_filter_matches_bruteforce(built):
    idx, df = built
    q = _queries(["gamma"]).assign(
        geo_bbox_field="loc", geo_bbox_top=60.0, geo_bbox_left=-90.0,
        geo_bbox_bottom=-30.0, geo_bbox_right=90.0,
    )
    out = run_queries(q, idx, CFG).to_pandas()
    want = _brute_match(df, ["gamma"])
    want = want[
        want["loc_lat"].between(-30.0, 60.0)
        & want["loc_lon"].between(-90.0, 90.0)
    ]
    assert set(out["doc_id"]) == set(want["doc_id"])
    assert len(want) > 0


def test_geo_bbox_antimeridian_rejected(built):
    idx, _ = built
    q = _queries(["gamma"]).assign(
        geo_bbox_field="loc", geo_bbox_top=10.0, geo_bbox_left=170.0,
        geo_bbox_bottom=-10.0, geo_bbox_right=-170.0,
    )
    with pytest.raises(ValueError, match="antimeridian"):
        run_queries(q, idx, CFG)


# ------------------------------------------------------------ aggregations

def test_geo_distance_agg_ring_counts(built):
    idx, df = built
    edges = (0.0, 3e6, 8e6, 1.4e7)
    out = run_agg_geo_distance(
        _queries(["alpha", "omega kappa"]), idx, "loc", *ORIGIN, edges, cfg=CFG
    )
    for qid, terms in ((0, ["alpha"]), (1, ["omega", "kappa"])):
        want = _brute_match(df, terms)
        d = haversine_m(
            want["loc_lat"].to_numpy(), want["loc_lon"].to_numpy(), *ORIGIN
        )
        d = d[~np.isnan(d)]
        exp = {
            e: int(((d >= e) & (d < (edges + (np.inf,))[i + 1])).sum())
            for i, e in enumerate(edges)
        }
        got = dict(
            zip(
                out[out["query_id"] == qid]["ring_from"],
                out[out["query_id"] == qid]["n_docs"],
            )
        )
        assert got == {e: n for e, n in exp.items() if n > 0}


def test_geo_centroid_and_bounds(built):
    idx, df = built
    q = _queries(["delta"])
    cen = run_agg_geo_centroid(q, idx, "loc", cfg=CFG)
    bnd = run_agg_geo_bounds(q, idx, "loc", cfg=CFG)
    want = _brute_match(df, ["delta"]).dropna(subset=["loc_lat", "loc_lon"])
    assert len(cen) == 1 and len(bnd) == 1
    assert cen["n_docs"][0] == len(want)
    assert abs(cen["centroid_lat"][0] - want["loc_lat"].mean()) < 1e-6
    assert abs(cen["centroid_lon"][0] - want["loc_lon"].mean()) < 1e-6
    assert bnd["top"][0] == want["loc_lat"].max()
    assert bnd["bottom"][0] == want["loc_lat"].min()
    assert bnd["left"][0] == want["loc_lon"].min()
    assert bnd["right"][0] == want["loc_lon"].max()


def test_geotile_grid_agg_counts(built):
    idx, df = built
    zoom, size = 2, 50  # size > cell count -> every non-empty cell
    out = run_agg_geotile_grid(
        _queries(["beta"]), idx, "loc", zoom=zoom, size=size, cfg=CFG
    )
    want = _brute_match(df, ["beta"]).dropna(subset=["loc_lat", "loc_lon"])
    x, y = geotile_xy(
        want["loc_lat"].to_numpy(), want["loc_lon"].to_numpy(), zoom
    )
    exp: dict[str, int] = {}
    for xi, yi in zip(x, y):
        exp[f"{zoom}/{xi}/{yi}"] = exp.get(f"{zoom}/{xi}/{yi}", 0) + 1
    got = dict(zip(out["tile"], out["n_docs"]))
    assert got == exp


def test_geohash_grid_agg_counts(built):
    from kafka_es_ray.functions.geo import geohash_cells, geohash_render
    from kafka_es_ray.query.engine import run_agg_geohash_grid

    idx, df = built
    out = run_agg_geohash_grid(
        _queries(["beta"]), idx, "loc", precision=1, size=50, cfg=CFG
    )
    want = _brute_match(df, ["beta"]).dropna(subset=["loc_lat", "loc_lon"])
    cells = geohash_render(
        geohash_cells(
            want["loc_lat"].to_numpy(), want["loc_lon"].to_numpy(), 1
        ),
        1,
    )
    exp: dict[str, int] = {}
    for c in cells:
        exp[c] = exp.get(c, 0) + 1
    got = dict(zip(out["cell"], out["n_docs"]))
    assert got == exp


def test_geotile_grid_size_cut_deterministic(built):
    idx, _ = built
    full = run_agg_geotile_grid(
        _queries(["beta"]), idx, "loc", zoom=2, size=50, cfg=CFG
    )
    cut = run_agg_geotile_grid(
        _queries(["beta"]), idx, "loc", zoom=2, size=3, cfg=CFG
    )
    assert len(cut) == min(3, len(full))
    # the cut keeps the (count desc, packed key asc) head of the full set
    def keyed(df):
        packs = [
            int(t.split("/")[1]) * 4 + int(t.split("/")[2]) for t in df["tile"]
        ]
        return sorted(zip(-df["n_docs"].to_numpy(), packs))

    assert keyed(cut) == keyed(full)[: len(cut)]


def test_geo_distance_sort_matches_bruteforce(built):
    from kafka_es_ray.query.engine import run_sorted

    idx, df = built
    out = run_sorted(
        _queries(["alpha"]), idx, {"geo_distance": ("loc", *ORIGIN)},
        ascending=True, k=5, cfg=CFG,
    ).to_pandas()
    want = _brute_match(df, ["alpha"]).copy()
    want["d"] = haversine_m(
        want["loc_lat"].to_numpy(), want["loc_lon"].to_numpy(), *ORIGIN
    )
    want = want.dropna(subset=["d"]).sort_values(["d", "doc_id"]).head(5)
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(out["sort_val"].to_numpy(), want["d"].to_numpy())
    assert out["rank"].tolist() == list(range(1, len(want) + 1))


def test_missing_points_never_match(built):
    idx, df = built
    # a huge radius still excludes docs with no location
    q = _queries(["alpha beta gamma delta omega kappa"]).assign(
        geo_field="loc", geo_lat=0.0, geo_lon=0.0, geo_distance_m=5e7
    )
    out = run_queries(q, idx, CFG).to_pandas()
    located = set(df.dropna(subset=["loc_lat", "loc_lon"])["doc_id"])
    assert set(out["doc_id"]) <= located
    assert len(out) == len(df.dropna(subset=["loc_lat", "loc_lon"]))


def test_geo_polygon_filter_matches_bruteforce(built):
    """Convex geo_polygon == half-plane tests regardless of vertex
    orientation (cw == ccw); missing points never match; degenerate
    (<3-vertex) polygons refused."""
    idx, df = built
    tri = [(0.0, -60.0), (60.0, 0.0), (-30.0, 70.0)]

    def inside(lat, lon):
        ok = ~(np.isnan(lat) | np.isnan(lon))
        for (la1, lo1), (la2, lo2) in zip(tri, tri[1:] + tri[:1]):
            cross = (lo2 - lo1) * (lat - la1) - (la2 - la1) * (lon - lo1)
            ok &= -cross >= 0  # this vertex order is clockwise (sign -1)
        return ok

    q = _queries(["alpha beta"]).assign(
        geo_poly_field="loc", geo_poly_pts="0:-60|60:0|-30:70"
    )
    out = run_queries(q, idx, CFG).to_pandas()
    want = _brute_match(df, ["alpha", "beta"])
    want = want[inside(want["loc_lat"].to_numpy(), want["loc_lon"].to_numpy())]
    assert set(out["doc_id"]) == set(want["doc_id"])
    assert len(want) > 0
    # reversed vertex order (ccw) selects the same region
    q2 = _queries(["alpha beta"]).assign(
        geo_poly_field="loc", geo_poly_pts="-30:70|60:0|0:-60"
    )
    out2 = run_queries(q2, idx, CFG).to_pandas()
    assert set(out2["doc_id"]) == set(out["doc_id"])
    with pytest.raises(ValueError, match="3 vertices"):
        run_queries(
            _queries(["alpha"]).assign(
                geo_poly_field="loc", geo_poly_pts="0:0|1:1"
            ),
            idx, CFG,
        )


def test_geo_line_matches_bruteforce(built, ray_session):
    """run_geo_line == pandas: first `size` LOCATED matching docs in
    doc_id order, round6 coords, seq = 0-based position on the line."""
    from kafka_es_ray.query.engine import run_geo_line

    idx, df = built
    q = pd.DataFrame({"query_id": [0, 1], "text": ["alpha beta", "omega"]})
    got = run_geo_line(q, idx, "loc", size=7, cfg=CFG, concurrency=2)
    toks = df["text"].str.split()
    for qid, terms in [(0, {"alpha", "beta"}), (1, {"omega"})]:
        hit = toks.apply(lambda t: bool(set(t) & terms))
        want = df[hit & df["loc_lat"].notna() & df["loc_lon"].notna()]
        want = want.sort_values("doc_id").head(7)
        g = got[got["query_id"] == qid]
        assert g["doc_id"].tolist() == want["doc_id"].tolist(), qid
        assert g["seq"].tolist() == list(range(len(want))), qid
        assert g["lat"].tolist() == (
            np.floor(want["loc_lat"].to_numpy() * 1e6 + 0.5) / 1e6
        ).tolist(), qid
        assert g["lon"].tolist() == (
            np.floor(want["loc_lon"].to_numpy() * 1e6 + 0.5) / 1e6
        ).tolist(), qid
