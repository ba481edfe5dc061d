"""Deterministic text extraction: html -> text.

Per-row invariant fixed by BASELINE.json input_hint: "byte-identical
extracted text per url".  The reference analog is the ProtobufSource JSON
printer — a pure deterministic serializer whose output is golden-tested
byte-for-byte (reference BulkAction.kt:277-295, golden strings
ElasticsearchBulkSenderTests.kt:215-218).  Extraction must therefore be a
frozen pure function: no library whose upgrades could change output.

EXTRACTION_VERSION "v1" (frozen; golden tests in tests/test_textproc.py):
  1. decode UTF-8 (errors="replace")
  2. drop <script>/<style>/<head> elements and HTML comments
  3. strip all remaining tags
  4. unescape HTML entities (html.unescape — stdlib, stable)
  5. collapse all whitespace runs to a single space, strip ends

Pure stdlib (re + html), no external parser.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np

EXTRACTION_VERSION = "v1"

_DROP = re.compile(
    r"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<head\b.*?</head\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")


def extract_text(html_bytes: bytes | None) -> str | None:
    """Pure deterministic html -> text (see module docstring)."""
    if html_bytes is None:
        return None
    raw = html_bytes.decode("utf-8", errors="replace")
    no_blocks = _DROP.sub(" ", raw)
    no_tags = _TAG.sub(" ", no_blocks)
    unescaped = _html.unescape(no_tags)
    return _WS.sub(" ", unescaped).strip()


def fill_text_from_html(text_col: np.ndarray, html_col: np.ndarray) -> np.ndarray:
    """Where ``text`` is null, recover it from ``html`` (vectorized over the
    null rows only — ~20% in the fixture corpus, FIXTURES.md §1)."""
    out = np.asarray(text_col, dtype=object).copy()
    for i in np.flatnonzero([t is None for t in out]):
        out[i] = extract_text(html_col[i])
    return out
