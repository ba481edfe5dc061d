"""WARC source: ISO 28500 record parsing (plain + gzip members),
non-response skipping, HTTP header stripping, status filtering, and the
end-to-end read_warc -> build_index -> search path."""

import gzip

import pandas as pd
import pytest

from kafka_es_ray.sources.warc import parse_warc_bytes, read_warc, write_warc


def _archive(tmp_path, gz=False):
    recs = [
        {"url": "https://a.example/1", "warc_ts": "2020-01-01T00:00:00Z",
         "html": "<html><body>quartz feldspar</body></html>"},
        {"url": "https://a.example/2", "warc_ts": "2020-01-02T00:00:00Z",
         "html": "<html><body>mica quartz</body></html>"},
    ]
    p = str(tmp_path / ("t.warc.gz" if gz else "t.warc"))
    write_warc(recs, p, gzip_members=gz)
    return p, recs


def test_parse_roundtrip_and_skips(tmp_path):
    p, recs = _archive(tmp_path)
    data = open(p, "rb").read()
    # prepend a warcinfo and a request record: both must be skipped
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\n"
            b"hello\r\n\r\n")
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: https://a.example/1\r\n"
           b"Content-Length: 5\r\n\r\nGET /\r\n\r\n")
    got = parse_warc_bytes(info + req + data)
    assert [r["url"] for r in got] == [r["url"] for r in recs]
    assert [r["warc_ts"] for r in got] == [r["warc_ts"] for r in recs]
    assert all(r["http_status"] == 200 for r in got)
    # HTTP headers stripped: payload is exactly the html body
    assert got[0]["payload"] == recs[0]["html"].encode()
    # truncated tail record is dropped, earlier records survive
    trunc = parse_warc_bytes(data[: len(data) - 30])
    assert len(trunc) == 1 and trunc[0]["url"] == recs[0]["url"]


def test_parse_gzip_members(tmp_path):
    p, recs = _archive(tmp_path, gz=True)
    data = open(p, "rb").read()
    # two independent gzip members concatenated
    assert data[:2] == b"\x1f\x8b"
    got = parse_warc_bytes(data)
    assert [r["url"] for r in got] == [r["url"] for r in recs]
    # whole-file (single-member) gzip of the same stream also parses
    plain = open(_archive(tmp_path)[0], "rb").read()
    got2 = parse_warc_bytes(gzip.compress(plain))
    assert [r["url"] for r in got2] == [r["url"] for r in recs]


def test_read_warc_to_index_end_to_end(ray_session, tmp_path):
    import ray.data as rd  # noqa: F401

    from kafka_es_ray.config import EngineConfig
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.query.engine import IndexSearcher

    p, recs = _archive(tmp_path)
    ds = read_warc(p)
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert df["url"].tolist() == [r["url"] for r in recs]
    assert bytes(df["html"].iloc[0]) == recs[0]["html"].encode()

    cfg = EngineConfig(num_partitions=2)
    idx = str(tmp_path / "warcidx")
    build_index(read_warc(p), idx, cfg, html_col="html", ts_col="warc_ts",
                lang_col=None)
    s = IndexSearcher(idx, cfg)
    assert len(s.search("quartz")) == 2
    assert len(s.search("mica")) == 1


def test_read_warc_status_filter(ray_session, tmp_path):
    """Non-2xx responses are dropped at the source."""
    p = str(tmp_path / "s.warc")
    html404 = b"<html>gone</html>"
    http404 = b"HTTP/1.1 404 Not Found\r\n\r\n" + html404
    rec404 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a.example/404\r\n"
        b"WARC-Date: 2020-01-03T00:00:00Z\r\n"
        + f"Content-Length: {len(http404)}\r\n\r\n".encode()
        + http404 + b"\r\n\r\n"
    )
    good = open(_archive(tmp_path)[0], "rb").read()
    open(p, "wb").write(good + rec404)
    urls = set(read_warc(p).to_pandas()["url"])
    assert "https://a.example/404" not in urls and len(urls) == 2
