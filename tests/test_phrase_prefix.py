"""ES match_phrase_prefix (autocomplete): fixed terms adjacent in order,
last slot = prefix expansion.  Oracle: brute-force token-position scan."""

import numpy as np
import pandas as pd
import pytest

from kafka_es_ray.config import EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.query.engine import IndexSearcher, run_counts

CFG = EngineConfig(num_partitions=4, index_positions=True)

WORDS = ["quick", "brown", "fox", "quill", "quiet", "lazy", "dog", "brownie"]


def _corpus(n=120, seed=17) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(2, 9)).tolist())
        for _ in range(n)
    ]
    texts[0] = "quick brown fox"
    texts[1] = "quick brownie fox"
    texts[2] = "brown quick fox"  # wrong order: must NOT match "quick bro*"
    return pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "doc_id": np.arange(1, n + 1, dtype=np.int64),
            "text": texts,
            "lang": "en",
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    df = _corpus()
    idx = str(tmp_path_factory.mktemp("ppidx"))
    build_index(
        rd.from_pandas(df), idx, CFG,
        key_col="url", lang_col="lang", html_col=None, ts_col=None,
        id_col="doc_id",
    )
    return idx, df


def _brute(df: pd.DataFrame, fixed: list[str], pre: str) -> int:
    n = 0
    for t in df["text"].str.split():
        hit = False
        for i in range(len(t) - len(fixed)):
            if t[i : i + len(fixed)] == fixed and t[i + len(fixed)].startswith(pre):
                hit = True
                break
        n += hit
    return n


def test_phrase_prefix_matches_bruteforce(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    for text, fixed, pre in [
        ("quick bro", ["quick"], "bro"),       # brown AND brownie complete it
        ("quick brown fo", ["quick", "brown"], "fo"),
        ("lazy d", ["lazy"], "d"),
        ("quick zz", ["quick"], "zz"),         # no expansion
        ("qui", [], "qui"),                    # degenerates to prefix query
    ]:
        assert s.phrase_prefix_count(text) == _brute(df, fixed, pre), text


def test_phrase_prefix_order_matters(built):
    idx, df = built
    s = IndexSearcher(idx, CFG)
    got = s.phrase_prefix_count("quick bro")
    # doc 3 has "brown quick" (wrong order) and must not be counted
    assert got == _brute(df, ["quick"], "bro")
    assert _brute(df, ["quick"], "bro") < _brute(df, [], "bro") + _brute(df, [], "qui")


def test_distributed_phrase_prefix(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    queries = pd.DataFrame(
        {"query_id": [0, 1], "phrase_prefix": ["quick bro", "lazy d"]}
    )
    out = run_counts(queries, idx, CFG)
    got = dict(zip(out["query_id"], out["n_matching"]))
    assert got[0] == s.phrase_prefix_count("quick bro")
    assert got[1] == s.phrase_prefix_count("lazy d")


def test_max_expansions_caps(built):
    idx, _ = built
    s = IndexSearcher(idx, CFG)
    capped = s.phrase_prefix_count("quick bro", max_expansions=1)
    full = s.phrase_prefix_count("quick bro")
    assert 0 < capped <= full
