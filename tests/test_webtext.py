"""Webtext URL operators: frozen canon_v1 canonicalization rules,
canonical-URL dedup, domain blocklist counts."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.pipelines.webtext import (
    canonical_url_dedup,
    canonicalize_url_series,
    canonicalize_urls,
    domain_counts,
    extract_host_series,
)


CASES = [
    # lowercase scheme+host only; path keeps case
    ("HTTPS://WWW.Ex.COM/Page/One", "https://www.ex.com/Page/One"),
    # fragment stripped
    ("https://ex.com/a#frag", "https://ex.com/a"),
    # default ports stripped (https:443, http:80); other ports kept
    ("https://ex.com:443/a", "https://ex.com/a"),
    ("http://ex.com:80/a", "http://ex.com/a"),
    ("https://ex.com:443", "https://ex.com"),
    ("https://ex.com:8443/a", "https://ex.com:8443/a"),
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),
    # tracking params removed wherever they sit; others preserved in order
    ("https://ex.com/a?utm_source=x", "https://ex.com/a"),
    ("https://ex.com/a?utm_source=x&q=1", "https://ex.com/a?q=1"),
    ("https://ex.com/a?q=1&utm_medium=y", "https://ex.com/a?q=1"),
    ("https://ex.com/a?q=1&fbclid=z&r=2", "https://ex.com/a?q=1&r=2"),
    ("https://ex.com/a?utm_a=1&utm_b=2", "https://ex.com/a"),
    ("https://ex.com/a?gclid=g&utm_x=1&q=3", "https://ex.com/a?q=3"),
    # trailing slash stripped (root too)
    ("https://ex.com/a/", "https://ex.com/a"),
    ("https://ex.com/", "https://ex.com"),
    # combined
    (
        "HTTPS://Ex.COM:443/A/b/?utm_source=f&ref=2#top",
        "https://ex.com/A/b/?ref=2",
    ),
]


def test_canon_v1_rules():
    urls = pd.Series([u for u, _ in CASES])
    want = [w for _, w in CASES]
    assert canonicalize_url_series(urls).tolist() == want


def test_extract_host():
    s = pd.Series(
        ["https://Ex.COM:443/a", "http://sub.Ex.org/b?q=1", "https://h.io#f"]
    )
    assert extract_host_series(s).tolist() == ["ex.com", "sub.ex.org", "h.io"]


@pytest.fixture()
def url_ds(ray_session):
    import ray.data as rd

    n = 60
    i = np.arange(n, dtype=np.int64)
    urls = pd.Series(
        ["https://ExAmple%d.COM" % (k % 3) for k in i]
    ) + "/p/" + pd.Series((i % 10).astype(str)) + np.where(
        i % 2 == 0, "?utm_source=x", ""
    ) + np.where(i % 4 == 0, "#f", "")
    df = pd.DataFrame({"doc_id": i, "url": urls})
    return rd.from_pandas(df), df


def test_canonicalize_urls_dataset(url_ds):
    ds, df = url_ds
    out = canonicalize_urls(ds).to_pandas().sort_values("doc_id")
    want = canonicalize_url_series(df["url"]).tolist()
    assert out["canon_url"].tolist() == want


def test_canonical_url_dedup_matches_bruteforce(url_ds):
    ds, df = url_ds
    got = (
        canonical_url_dedup(ds).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    canon = canonicalize_url_series(df["url"])
    want = (
        df.assign(c=canon).groupby("c", as_index=False)
        .agg(doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        [["doc_id", "n_copies"]].sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype(np.int64))


def test_canonical_url_dedup_custom_id_col(url_ds):
    """Round-4 advice: the survivor id column is named from id_col, and
    grouping is on the canonical URL STRING (no 64-bit-hash collision
    path can merge two distinct URLs)."""
    ds, df = url_ds
    renamed = ds.map_batches(
        lambda b: b.rename(columns={"doc_id": "page_id"}),
        batch_format="pandas",
    )
    got = (
        canonical_url_dedup(renamed, id_col="page_id")
        .to_pandas().sort_values("page_id").reset_index(drop=True)
    )
    assert list(got.columns) == ["page_id", "n_copies"]
    base = (
        canonical_url_dedup(ds).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["page_id"].tolist() == base["doc_id"].tolist()
    assert got["n_copies"].tolist() == base["n_copies"].tolist()


def test_domain_counts_blocklist(url_ds):
    ds, df = url_ds
    got = domain_counts(ds, blocked=("example1.com",)).to_pandas()
    hosts = extract_host_series(df["url"])
    want = hosts[hosts != "example1.com"].value_counts()
    assert dict(zip(got["host"], got["n_docs"])) == want.to_dict()
    assert "example1.com" not in set(got["host"])


def test_host_quality_filter_matches_bruteforce(ray_session):
    """host_quality_filter == pandas: failing hosts (exact integer
    sum < T*count) dropped with every doc; empty-blocklist passthrough."""
    import ray.data as rd

    from kafka_es_ray.pipelines.webtext import host_quality_filter

    n = 90
    i = np.arange(n, dtype=np.int64)
    hostno = i % 3
    df = pd.DataFrame(
        {
            "doc_id": i,
            "url": ["https://h%d.com/p/%d" % (k % 3, k) for k in i],
            # host 0 avg=50 (fails T=100), host 1 avg=150, host 2 avg=100
            "n_chars": np.select([hostno == 0, hostno == 1], [50, 150], 100),
        }
    )
    got = (
        host_quality_filter(rd.from_pandas(df), min_avg=100)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = df[hostno != 0]
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert set(got["host"]) == {"h1.com", "h2.com"}
    # boundary: avg == T survives (strict < in the failing test)
    assert "h2.com" in set(got["host"])

    allpass = host_quality_filter(rd.from_pandas(df), min_avg=1).to_pandas()
    assert len(allpass) == n


def test_robots_filter(ray_session):
    """robots_filter: stdlib robotparser semantics per host — Disallow
    prefixes, Allow overrides, per-agent sections, unknown-host default."""
    import ray.data as rd

    from kafka_es_ray.pipelines.webtext import robots_filter

    robots = {
        "a.com": "User-agent: *\nAllow: /private/ok\nDisallow: /private/\n",
        "b.com": "User-agent: mybot\nDisallow: /\n\nUser-agent: *\nDisallow:\n",
    }
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "url": [
                "https://a.com/public/x",      # allowed
                "https://a.com/private/x",     # disallowed
                "https://a.com/private/ok",    # Allow override
                "https://b.com/anything",      # * section allows
                "https://c.com/no-robots",     # unknown host -> default
                "https://b.com/else",
            ],
        }
    )
    got = robots_filter(rd.from_pandas(df), robots).to_pandas()
    assert sorted(got["doc_id"]) == [0, 2, 3, 4, 5]

    # agent-specific: mybot is banned from b.com entirely
    bot = robots_filter(rd.from_pandas(df), robots, agent="mybot").to_pandas()
    assert sorted(bot["doc_id"]) == [0, 2, 4]

    # default_allow=False drops unknown hosts
    strict = robots_filter(
        rd.from_pandas(df), robots, default_allow=False
    ).to_pandas()
    assert 4 not in set(strict["doc_id"])


def test_url_quality_features(ray_session):
    """url_quality == hand-computed features on crafted URLs; exact
    integer arithmetic (milli-fractions, counts)."""
    import ray.data as rd

    from kafka_es_ray.pipelines.webtext import url_quality

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "url": [
                "https://a.b.c.d.example.com/x/y?q=1",     # deep host
                "https://ex.com/a/b/c/d/e/f/g/h",          # deep path
                "https://123x0.com/p?" + "k=v&" * 20,      # digits + long query
                "https://clean.org/page#frag",             # clean
            ],
        }
    )
    out = (
        url_quality(rd.from_pandas(df)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert out["host_depth"].tolist() == [5, 1, 1, 1]
    assert out["path_depth"].tolist() == [2, 8, 1, 1]
    # "123x0.com": 4 digits / 9 chars -> 444 milli
    assert out["host_digit_milli"].tolist()[2] == 4 * 1000 // 9
    assert out["query_len"].tolist()[0] == 3
    assert out["query_len"].tolist()[2] == len("k=v&" * 20)
    assert out["url_spam"].tolist() == [1, 1, 2, 0]
