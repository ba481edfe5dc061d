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


# non-[a-z0-9] bytes -> space; UTF-8 continuation/lead bytes are >= 0x80
# so multi-byte characters can never alias into the token alphabet
_ASCII_TBL = bytes(b if (97 <= b <= 122 or 48 <= b <= 57) else 32 for b in range(256))


class Analyzer:
    """A frozen tokenizer chain for one language family."""

    def __init__(self, name: str, pattern: re.Pattern):
        self.name = name
        self.pattern = pattern
        self._ascii_fast = pattern is _ASCII_TOKEN

    def tokenize(self, text: str) -> list[str]:
        if text is None:
            return []
        t = unicodedata.normalize("NFC", text).lower()
        return self.pattern.findall(t)

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        """Vectorized: Series[str] -> Series[list[str]]."""
        t = texts.fillna("").map(lambda s: unicodedata.normalize("NFC", s)).str.lower()
        return t.str.findall(self.pattern)

    def _tokenize_bytes_one(self, s) -> list[bytes]:
        if s is None:
            return []
        if not s.isascii():
            s = unicodedata.normalize("NFC", s)  # NFC is identity on ASCII
        return s.lower().encode("utf-8", "ignore").translate(_ASCII_TBL).split()

    def tokenize_series_bytes(self, texts: pd.Series) -> pd.Series:
        """Index-build fast path: Series[str] -> Series[list[bytes]]
        (UTF-8 token bytes).  For ascii_v1 this is bytes.translate+split —
        measured 2x faster than the regex chain with IDENTICAL tokens
        (tested token-for-token vs tokenize_series); other analyzers fall
        back to the regex chain + encode.  Callers decode only the
        VOCABULARY back to str (|vocab| decodes, not |tokens|)."""
        if self._ascii_fast:
            return texts.map(self._tokenize_bytes_one)
        return self.tokenize_series(texts).map(lambda ts: [t.encode("utf-8") for t in ts])


# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (the ES `_english_`
# stopword list — frozen; public Lucene constant)
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)
_ENGLISH_STOPWORDS_B = frozenset(w.encode() for w in ENGLISH_STOPWORDS)


def english_minimal_stem(w: str) -> str:
    """Lucene EnglishMinimalStemmer (ES `stemmer: minimal_english`):
    plural-only stemming — drop a trailing 's' unless it ends 'us'/'ss';
    '...Xies' (X not a/e, len>4) -> '...Xy'; '[iaou]es' kept.  Frozen;
    replayed verbatim by the SQL oracles' CASE expression."""
    n = len(w)
    if n < 3 or w[-1] != "s":
        return w
    c = w[-2]
    if c == "u" or c == "s":
        return w
    if c == "e":
        if n > 3 and w[-3] == "i" and w[-4] not in "ae":
            return w[:-3] + "y"
        if w[-3] in "iaou":
            return w
    return w[:-1]


def _english_minimal_stem_bytes(w: bytes) -> bytes:
    n = len(w)
    if n < 3 or w[-1] != 0x73:  # 's'
        return w
    c = w[-2]
    if c == 0x75 or c == 0x73:  # 'u' 's'
        return w
    if c == 0x65:  # 'e'
        if n > 3 and w[-3] == 0x69 and w[-4] not in (0x61, 0x65):
            return w[:-3] + b"y"
        if w[-3] in (0x69, 0x61, 0x6F, 0x75):  # i a o u
            return w
    return w[:-1]


class TokenFilterAnalyzer(Analyzer):
    """Analyzer chain with ES-style token filters applied after the base
    tokenizer: an optional stopword set (ES `stop` filter) then an
    optional stemmer (str->str).  Filters run identically on the str and
    bytes paths (ascii-only chains), so the index-build fast path stays
    token-identical with the query-side analysis."""

    def __init__(self, name, pattern, stopwords=None, stem=False):
        super().__init__(name, pattern)
        self.stopwords = frozenset(stopwords or ())
        self._stop_b = frozenset(w.encode() for w in self.stopwords)
        self.stem = bool(stem)

    def _filter(self, toks: list[str]) -> list[str]:
        if self.stopwords:
            toks = [t for t in toks if t not in self.stopwords]
        if self.stem:
            toks = [english_minimal_stem(t) for t in toks]
        return toks

    def _filter_bytes(self, toks: list[bytes]) -> list[bytes]:
        if self._stop_b:
            toks = [t for t in toks if t not in self._stop_b]
        if self.stem:
            toks = [_english_minimal_stem_bytes(t) for t in toks]
        return toks

    def tokenize(self, text: str) -> list[str]:
        return self._filter(super().tokenize(text))

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        return super().tokenize_series(texts).map(self._filter)

    def tokenize_series_bytes(self, texts: pd.Series) -> pd.Series:
        return super().tokenize_series_bytes(texts).map(self._filter_bytes)


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
# ES custom analyzers as frozen registry entries (lang value = analyzer
# choice, both index- and query-side): `stop` filter and
# `stemmer: minimal_english` chains over the ascii tokenizer
register_analyzer(
    "en_stop",
    TokenFilterAnalyzer("ascii_stop_v1", _ASCII_TOKEN, stopwords=ENGLISH_STOPWORDS),
)
register_analyzer(
    "en_min_stem",
    TokenFilterAnalyzer("ascii_minstem_v1", _ASCII_TOKEN, stem=True),
)


def token_counts(tokens: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(unique_terms, tf) for one document, terms sorted ascending."""
    if not tokens:
        return np.array([], dtype=object), np.array([], dtype=np.int32)
    terms, tf = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
    return terms, tf.astype(np.int32)
