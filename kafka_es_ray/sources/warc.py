"""WARC source (ISO 28500, the Common Crawl container format): a
pure-stdlib record parser + a Ray Data reader whose output schema
``(url, warc_ts, html)`` feeds ``build_index`` directly — the missing
first hop of a CC-style crawl pipeline (the reference's corpora are
CC-shaped per BASELINE input_hint; this reader makes raw crawl archives
a first-class input alongside parquet).

Scale shape: one WARC file = one parse unit inside ``flat_map`` over
``read_binary_files`` blocks — parsing is stateless and embarrassingly
parallel; only the extracted (url, ts, html) rows continue downstream
(request/metadata/warcinfo records and HTTP headers are dropped at the
source, the column-prune analog).  ``.warc.gz`` uses per-record (or
whole-file) gzip members; stdlib zlib consumes concatenated members.
"""

from __future__ import annotations

import zlib


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the WARC .gz convention:
    one member per record) into one byte stream."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse a WARC/1.0 byte stream into response-record dicts:
    (url, warc_ts, http_status, payload: bytes).  Non-response records
    (warcinfo, request, metadata, ...) are skipped; a response payload is
    the HTTP body (headers stripped at the first CRLFCRLF).  Malformed
    trailing bytes end the scan (never raise mid-archive — a truncated
    fetch loses its tail record only, the crawl-ingest convention)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if not data[pos : pos + 5] == b"WARC/":
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if hdr_end + 4 + length > n:
            break  # truncated tail record: drop it, keep what parsed
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        status = None
        payload = body
        if body[:5] == b"HTTP/":
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line = body[: body.find(b"\r\n")].split(b" ")
                if len(status_line) >= 2 and status_line[1].isdigit():
                    status = int(status_line[1])
                payload = body[http_end + 4 :]
        records.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": headers.get("warc-date", ""),
                "http_status": status,
                "payload": payload,
            }
        )
    return records


def write_warc(records: list[dict], path: str, gzip_members: bool = False) -> int:
    """Serialize (url, warc_ts, html) dicts as WARC/1.0 response records
    (with a minimal HTTP/1.1 200 header block) — the test/export side of
    the reader; gzip_members writes one gzip member per record (the
    .warc.gz convention)."""
    import gzip as _gzip

    chunks = []
    for r in records:
        html = r["html"].encode("utf-8") if isinstance(r["html"], str) else r["html"]
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {r.get('warc_ts', '2020-01-01T00:00:00Z')}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n\r\n"
        )
        rec = hdr + http + b"\r\n\r\n"
        chunks.append(_gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as fh:
        for c in chunks:
            fh.write(c)
    return len(chunks)


def read_warc(path: str, min_status: int = 200, max_status: int = 299):
    """Ray Dataset of (url, warc_ts, html: binary, text: null) rows from
    a .warc/.warc.gz file or a directory of them — drop non-2xx
    responses (the crawl convention).  ``html`` stays BYTES (the
    input_hint corpus stores html as binary; ``extract_text`` decodes).
    Feed straight into ``build_index(ds, ..., html_col="html")``."""
    import ray.data as rd

    ds = rd.read_binary_files(path)

    def explode(row: dict) -> list[dict]:
        return [
            {
                "url": r["url"],
                "warc_ts": r["warc_ts"],
                "html": r["payload"],
                # the input_hint corpus schema carries text alongside
                # html; a raw crawl has none — ExtractStage recovers it
                "text": None,
            }
            for r in parse_warc_bytes(bytes(row["bytes"]))
            if r["http_status"] is None
            or min_status <= r["http_status"] <= max_status
        ]

    return ds.flat_map(explode)
