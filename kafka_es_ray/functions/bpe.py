"""Byte-pair encoding: a real trained subword tokenizer (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units") — the merge-table learner runs driver-side over a word-frequency
dict (training on a deterministic SAMPLE is the standard practice:
GPT-2/SentencePiece train on a corpus subset); ENCODING is the
distributed part, memoized per distinct word inside actor state (the
fast-tokenizers trick — Zipf means a batch's distinct-word count is far
below its token count).

Determinism contract: merge ties break (count desc, pair lexicographic
asc); encode applies the lowest-rank mergeable pair first, leftmost on
rank ties.  Same corpus sample => byte-identical merge table on any
machine.
"""

from __future__ import annotations

from collections import Counter

END = "\x01"  # end-of-word sentinel (control char: never in analyzed tokens)


def train_bpe(word_counts: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from {word: count}.  Classic
    greedy loop: count adjacent symbol pairs weighted by word frequency,
    merge the most frequent (ties: pair lexicographic asc), repeat.
    Stops early when no pair occurs twice.  Driver-side by design — call
    it on a sampled word histogram, never the full corpus."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if w:
            sym = tuple(w) + (END,)
            vocab[sym] = vocab.get(sym, 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Encode one word under a merge-rank table: repeatedly merge the
    present pair with the LOWEST rank (training order), leftmost first —
    the canonical BPE apply order, deterministic."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return tuple(sym)


class BpeEncoder:
    """Memoizing encoder: one instance per actor, the cache persists
    across batches (encode each distinct word once per actor
    lifetime)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.cache: dict[str, tuple[str, ...]] = {}

    def encode(self, word: str) -> tuple[str, ...]:
        got = self.cache.get(word)
        if got is None:
            got = self.cache[word] = encode_word(word, self.ranks)
        return got

    def count(self, word: str) -> int:
        return len(self.encode(word))
