"""Language-aware analyzer chains (frozen, versioned).

The reference delegates analysis to Elasticsearch's analyzers; the sink's
own stateful analog is the reflectively-loaded protobuf parser built ONCE
at configure time and reused per record (reference ProtobufSerde.kt:26-73).
Here the analyzer registry is the stateful per-worker object: construct in
an actor's ``__init__``, call per batch.

Analyzer chain "v1" (FROZEN — any change is a breaking analyzer version,
SURVEY §7.4; goldens in tests/test_tokenizer.py):

  * ``en`` (and default): NFC normalize -> lower() -> split on anything
    outside ``[a-z0-9]`` (ASCII).  Exactly reproducible in DuckDB as
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` — which is what
    the SQL oracles in __ray_entry__.py use.
  * ``unicode`` (used for non-ASCII langs de/fr/uk/...): NFC -> lower()
    -> Unicode word chars ``[^\\W_]+``.

Vectorized: pandas ``str`` ops over whole columns, one compiled regex per
analyzer instance.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

ANALYZER_VERSION = "v1"

_ASCII_TOKEN = re.compile(r"[a-z0-9]+")
_UNICODE_TOKEN = re.compile(r"[^\W_]+", re.UNICODE)


class Analyzer:
    """A frozen tokenizer chain for one language family."""

    def __init__(self, name: str, pattern: re.Pattern):
        self.name = name
        self.pattern = pattern

    def tokenize(self, text: str) -> list[str]:
        if text is None:
            return []
        t = unicodedata.normalize("NFC", text).lower()
        return self.pattern.findall(t)

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        """Vectorized: Series[str] -> Series[list[str]]."""
        t = texts.fillna("").map(lambda s: unicodedata.normalize("NFC", s)).str.lower()
        return t.str.findall(self.pattern)


_REGISTRY: dict[str, Analyzer] = {}


def register_analyzer(lang: str, analyzer: Analyzer) -> None:
    """User-extension surface — the Converter/plugin-registry analog
    (reference BaseConverter.kt:7, config-driven protobuf.class
    ProtobufSerde.kt:44-62)."""
    _REGISTRY[lang] = analyzer


def get_analyzer(lang: str | None = None) -> Analyzer:
    if lang in _REGISTRY:
        return _REGISTRY[lang]
    return _REGISTRY["default"]


register_analyzer("default", Analyzer("ascii_v1", _ASCII_TOKEN))
register_analyzer("en", Analyzer("ascii_v1", _ASCII_TOKEN))
for _lang in ("de", "fr", "uk", "es", "zh"):
    register_analyzer(_lang, Analyzer("unicode_v1", _UNICODE_TOKEN))


def token_counts(tokens: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(unique_terms, tf) for one document, terms sorted ascending."""
    if not tokens:
        return np.array([], dtype=object), np.array([], dtype=np.int32)
    terms, tf = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
    return terms, tf.astype(np.int32)
