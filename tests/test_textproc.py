"""Extraction goldens — byte-identical html -> text (input_hint invariant;
the ProtobufSource-printer determinism analog, reference
BulkAction.kt:277-295)."""

import numpy as np

from kafka_es_ray.fixtures import full_page_text, make_pages, render_html
from kafka_es_ray.functions.textproc import extract_text, fill_text_from_html


def test_golden_simple():
    html = b"<html><body><p>Hello &amp; goodbye</p></body></html>"
    assert extract_text(html) == "Hello & goodbye"


def test_drops_script_style_head_comments():
    html = (
        b"<head><title>T</title></head><style>x{}</style>"
        b"<script>if(1<2){}</script><!-- hidden -->body text"
    )
    assert extract_text(html) == "body text"


def test_whitespace_collapse_and_none():
    assert extract_text(b"<p>a\n\n  b\tc</p>") == "a b c"
    assert extract_text(None) is None


def test_fixture_roundtrip_byte_identical():
    body = "w00001 w00002 some words 42"
    assert extract_text(render_html(body)) == full_page_text(body)


def test_pages_nulls_recoverable(pages_small):
    t = pages_small
    text = t.column("text").to_numpy(zero_copy_only=False)
    html = t.column("html").to_numpy(zero_copy_only=False)
    nulls = [i for i, x in enumerate(text) if x is None]
    assert len(nulls) > 50  # ~20% of 1000
    filled = fill_text_from_html(text, html)
    # spot-check full corpus: every filled row equals extraction of its html
    for i in nulls[:100]:
        assert filled[i] == extract_text(html[i])
        assert filled[i] is not None and len(filled[i]) > 0


def test_extraction_deterministic(pages_small):
    html = pages_small.column("html").to_numpy(zero_copy_only=False)
    a = [extract_text(h) for h in html[:50]]
    b = [extract_text(h) for h in html[:50]]
    assert a == b


def test_pages_fixture_shape(pages_small):
    assert pages_small.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert str(pages_small.schema.field("warc_ts").type) == "timestamp[us]"
    assert pages_small.num_rows == 1000
    # dup urls exist (LWW fixture)
    urls = pages_small.column("url").to_pylist()
    assert len(set(urls)) < len(urls)


def test_pages_deterministic():
    a = make_pages(200)
    b = make_pages(200)
    assert a.equals(b)
