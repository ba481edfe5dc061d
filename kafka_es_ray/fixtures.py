"""Deterministic synthetic fixtures (seed=42) — FIXTURES.md.

Generates the CC-style ``pages`` corpus fixed by BASELINE.json input_hint
(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string),
the ``actions`` doc-ops table (BulkAction semantics, reference
BulkAction.kt:25-112), and the ``queries`` table.  Pure numpy + pyarrow;
no external data.  The same recipe at different sizes produces the smoke /
correctness / bench corpora.

Invariants the tests rely on:
  * ~20% of rows have text=null and must be recovered byte-identically
    from html by functions.textproc.extract_text (input_hint invariant).
  * ~2% of urls appear 2-3x with distinct warc_ts/text (last-write-wins
    fixture, reference doc-id upsert semantics E1).
  * token stream is Zipfian over ~10k terms (head-term skew fixture).
  * physical row order is shuffled (order != warc_ts order).
"""

from __future__ import annotations

import html as _html
import json

import numpy as np
import pyarrow as pa

SEED = 42
N_HOSTS = 97
LANGS = np.array(["en", "de", "fr", "uk"], dtype=object)
LANG_P = np.array([0.7, 0.1, 0.1, 0.1])
VOCAB_SIZE = 10_000
BASE_TS_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds


def _vocab() -> np.ndarray:
    return np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)], dtype=object)


def _zipf_text(rng: np.random.Generator, vocab: np.ndarray, n_tokens: int) -> str:
    # Zipf-ish: P(rank r) ~ 1/(r+1); sampled via u^alpha trick for speed
    ranks = np.minimum(
        (vocab.size * rng.random(n_tokens) ** 3.0).astype(np.int64), vocab.size - 1
    )
    return " ".join(vocab[ranks])


_HTML_TEMPLATE = (
    "<!DOCTYPE html><html><head><title>page</title>"
    "<style>body {{ color: #000; }}</style>"
    "<script>var x = 1 < 2;</script></head>"
    "<body><nav>home | about</nav><article><p>{body}</p></article>"
    "<footer>&copy; 2025 example</footer></body></html>"
)


def render_html(text: str) -> bytes:
    """Template html wrapping ``text``.  extract_text(render_html(t)) must
    round-trip byte-identically for whitespace-normalized ``t`` -- the nav
    and footer contribute 'home | about' / '© 2025 example' framing, so the
    body is embedded between deterministic markers we strip in fixtures'
    golden path.  To keep the per-url byte-identity invariant simple, the
    fixture defines extracted text as the FULL page text (nav + body +
    footer normalized), and pages with non-null ``text`` carry exactly
    that string."""
    return _HTML_TEMPLATE.format(body=_html.escape(text)).encode("utf-8")


def full_page_text(body: str) -> str:
    """The canonical extracted text of render_html(body)."""
    return f"home | about {body} © 2025 example"


def make_dedup_docs(n_rows: int, seed: int = SEED) -> pa.Table:
    """Documents table (doc_id:int64, text:string) with PLANTED
    duplicates for dedup-pipeline benchmarking at sizes where
    parallelism is measurable (the sf0.1 documents table is 5k rows —
    fixed-overhead territory; round-4 verdict #3):

      * ~86% unique Zipfian docs (~60 tokens each);
      * ~8% near-duplicates: a copy of an earlier doc with ~5% of its
        tokens substituted (lands above typical Jaccard thresholds);
      * ~6% exact duplicates of an earlier doc.

    Deterministic (seed); doc_id = row index."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    n_base = max(1, int(n_rows * 0.86))
    lens = np.maximum(10, rng.poisson(60, size=n_base))
    texts = [_zipf_text(rng, vocab, int(L)) for L in lens]
    n_near = int(n_rows * 0.08)
    for _ in range(n_near):
        src = texts[int(rng.integers(0, n_base))].split()
        n_mut = max(1, int(len(src) * 0.05))
        for pos in rng.integers(0, len(src), size=n_mut):
            src[int(pos)] = vocab[int(rng.integers(0, vocab.size))]
        texts.append(" ".join(src))
    while len(texts) < n_rows:
        texts.append(texts[int(rng.integers(0, n_base))])
    order = rng.permutation(n_rows)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_rows, dtype=np.int64)),
            "text": pa.array(np.asarray(texts, dtype=object)[order], type=pa.string()),
        }
    )


def make_pages(n_rows: int, seed: int = SEED) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = _vocab()

    n_base = max(1, int(n_rows / 1.025))  # ~2.5% extra rows are re-crawls
    urls = np.array(
        [f"https://site{i % N_HOSTS}.example/p/{i}" for i in range(n_base)], dtype=object
    )
    # re-crawled urls: ~2% of base urls appear 2-3x
    n_extra = n_rows - n_base
    recrawl_idx = rng.choice(n_base, size=n_extra, replace=True)

    all_urls = np.concatenate([urls, urls[recrawl_idx]])
    n = all_urls.size
    # warc_ts: base + i*7s for originals; re-crawls get strictly larger ts
    ts = BASE_TS_US + np.arange(n, dtype=np.int64) * 7_000_000
    lang = rng.choice(LANGS, size=n, p=LANG_P)

    doc_lens = np.maximum(5, rng.poisson(60, size=n))
    # ~1-2% oversized rows (wide-row handling fixture)
    big = rng.random(n) < 0.015
    doc_lens[big] = 40_000

    bodies = [_zipf_text(rng, vocab, int(L)) for L in doc_lens]
    texts = np.array([full_page_text(b) for b in bodies], dtype=object)
    htmls = np.array([render_html(b) for b in bodies], dtype=object)

    # ~20% rows: text null, recoverable from html
    null_mask = rng.random(n) < 0.2
    texts_out = texts.copy()
    texts_out[null_mask] = None

    order = rng.permutation(n)
    return pa.table(
        {
            "url": pa.array(all_urls[order], type=pa.string()),
            "warc_ts": pa.array(ts[order], type=pa.timestamp("us")),
            "html": pa.array(htmls[order], type=pa.binary()),
            "text": pa.array(texts_out[order], type=pa.string()),
            "lang": pa.array(lang[order], type=pa.string()),
        }
    )


def make_actions(pages: pa.Table, n_actions: int, seed: int = SEED) -> pa.Table:
    """Doc-ops stream over the pages corpus (FIXTURES.md §2).

    Columnar analog of the reference's BulkAction stream: op-tagged rows
    with meta (id/index/routing) + JSON source (BulkAction.kt:25-112,
    bulk_action.proto:8-23)."""
    rng = np.random.default_rng(seed + 1)
    urls = pages.column("url").to_pylist()
    ops = rng.choice(
        np.array(["index", "create", "update", "delete"], dtype=object),
        size=n_actions,
        p=[0.85, 0.05, 0.05, 0.05],
    )
    ids = np.array([urls[i] for i in rng.integers(0, len(urls), n_actions)], dtype=object)
    # a few index ops with null id (auto-id path, BulkAction.kt:117)
    auto_id = (ops == "index") & (rng.random(n_actions) < 0.02)
    ids[auto_id] = None
    index_col = np.where(rng.random(n_actions) < 0.1, "preset-index", None)
    routing = np.array(
        [f"route-{i}" if r < 0.1 else None for i, r in enumerate(rng.random(n_actions))],
        dtype=object,
    )
    seq = np.arange(n_actions, dtype=np.int64)
    src = np.array(
        [
            None
            if op == "delete"
            else json.dumps(
                {"title": f"doc {i}", "nested": {"rank": int(i % 7), "flag": None}},
                separators=(",", ":"),
            )
            for i, op in enumerate(ops)
        ],
        dtype=object,
    )
    tag = rng.choice(np.array([None, "foo", "bar"], dtype=object), size=n_actions, p=[0.5, 0.3, 0.2])
    return pa.table(
        {
            "op": pa.array(ops, type=pa.string()).dictionary_encode(),
            "id": pa.array(ids, type=pa.string()),
            "index": pa.array(index_col, type=pa.string()),
            "routing": pa.array(routing, type=pa.string()),
            "seq": pa.array(seq, type=pa.int64()),
            "source": pa.array(src, type=pa.string()),
            "tag": pa.array(tag, type=pa.string()),
        }
    )


def make_queries(n_queries: int = 40, seed: int = SEED) -> pa.Table:
    """Reference query set (FIXTURES.md §3): 1-5 terms, head/tail/mixed,
    plus one guaranteed-absent term (empty-postings path)."""
    rng = np.random.default_rng(seed + 2)
    vocab = _vocab()
    rows = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 6))
        kind = qid % 4
        if kind == 0:  # head terms
            ranks = rng.integers(0, 50, n_terms)
        elif kind == 1:  # tail terms
            ranks = rng.integers(VOCAB_SIZE // 2, VOCAB_SIZE, n_terms)
        else:  # mixed
            ranks = np.concatenate(
                [rng.integers(0, 50, max(1, n_terms // 2)), rng.integers(1000, VOCAB_SIZE, n_terms - max(1, n_terms // 2))]
            )
        text = " ".join(vocab[r] for r in ranks)
        rows.append((qid, text, "en", 10 if qid % 2 == 0 else 100))
    rows.append((n_queries, "zzzabsentterm", "en", 10))  # empty-postings path
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array([r[2] for r in rows], type=pa.string()),
            "k": pa.array([r[3] for r in rows], type=pa.int32()),
        }
    )
