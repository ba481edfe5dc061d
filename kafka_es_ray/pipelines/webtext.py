"""Webtext URL operators: canonicalization, canonical-URL dedup, and
domain filtering/counting — the crawl-side curation steps a CC-style
corpus needs before content dedup (the reference's pipelines key docs by
url, SURVEY §2; these ops normalize that key the way crawl dedup does).

The canonicalizer is a FROZEN regex pipeline (version canon_v1): every
pattern is plain RE2-compatible syntax so a DuckDB ``regexp_replace``
replay is byte-identical — the same frozen-transform contract the
analyzers use (CLAUDE.md rule 6).  Scale shape: canonicalization is a
stateless vectorized map (no shuffle); dedup moves only (hash, id)
pairs through one bucketed exchange (the exact_dedup shape); domain
counting ships per-batch combiner partials, never doc rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kafka_es_ray.functions.hashing import stable_hash64
from kafka_es_ray.stages.shuffle import bucketed_group_agg

# frozen canon_v1 regex passes, applied in order AFTER the
# scheme+host lowercase step.  RE2-compatible (no lookarounds, no
# backrefs in patterns) so DuckDB regexp_replace(..., 'g') replays them.
_TRACK = "(utm_[a-z0-9_]*|fbclid|gclid)"
CANON_PASSES: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),                            # 1. strip fragment
    (r"^(https://[^/:?#]+):443([/?]|$)", r"\1\2"),   # 2. default ports
    (r"^(http://[^/:?#]+):80([/?]|$)", r"\1\2"),
    (rf"&{_TRACK}=[^&]*", ""),                # 3. tracking params (mid/late)
    (rf"\?{_TRACK}=[^&]*&", "?"),             # 4. leading tracking param
    (rf"\?{_TRACK}=[^&]*$", ""),              # 5. only tracking param
    (r"/$", ""),                              # 6. trailing slash
)


def canonicalize_url_series(urls: pd.Series) -> pd.Series:
    """Vectorized canon_v1: lowercase the scheme://host[:port] prefix
    (paths stay case-sensitive — the URL standard), then the frozen
    regex passes in order."""
    prefix = urls.str.extract(r"^([^/?#]+//[^/?#]+)", expand=False).fillna("")
    rest = urls.str.slice(start=0).str.replace(
        r"^[^/?#]+//[^/?#]+", "", regex=True
    )
    out = prefix.str.lower() + rest
    for pat, repl in CANON_PASSES:
        out = out.str.replace(pat, repl, regex=True)
    return out


def canonicalize_urls(ds, url_col: str = "url", id_col: str = "doc_id"):
    """Streaming map: (id, url, canon_url) per row — no shuffle."""

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: batch[id_col].astype(np.int64),
                url_col: batch[url_col].astype(str),
                "canon_url": canonicalize_url_series(batch[url_col].astype(str)),
            }
        )

    return ds.map_batches(canon, batch_format="pandas", batch_size=8192)


def canonical_url_dedup(ds, url_col: str = "url", id_col: str = "doc_id"):
    """One survivor per distinct canonical URL: (id_col=min id,
    n_copies) — canonicalize in the map, then the exact_dedup shape
    (one bucketed exchange; group count bounded by buckets, not by
    distinct URLs).  Survivors group on the canonical URL STRING itself,
    not a 64-bit hash of it (round-4 advice: at multi-billion-URL scale
    a hash collision would silently merge two distinct URLs and drop a
    doc).  The exchange therefore moves (canon, id) rows — URLs are
    short, and the string rides the same bucketed route the hash would
    have.  The output id column is named from ``id_col``."""

    def add_canon(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "canon": canonicalize_url_series(batch[url_col].astype(str)),
                id_col: batch[id_col].astype(np.int64),
            }
        )

    def first_per_key(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("canon", as_index=False).agg(
            **{id_col: (id_col, "min"), "n_copies": (id_col, "size")}
        )
        return g[[id_col, "n_copies"]].astype(np.int64)

    canonical = ds.map_batches(add_canon, batch_format="pandas", batch_size=8192)
    return bucketed_group_agg(canonical, ["canon"], first_per_key)


def extract_host_series(urls: pd.Series) -> pd.Series:
    """Lowercased host (port stripped) — the domain-filter key."""
    return (
        urls.str.extract(r"^[^/?#]+//([^/?#:]+)", expand=False)
        .fillna("")
        .str.lower()
    )


def host_quality_filter(
    ds,
    url_col: str = "url",
    id_col: str = "doc_id",
    metric_col: str = "n_chars",
    min_avg: int = 100,
):
    """Host-level quality curation (the RefinedWeb/CCNet shape: judge the
    DOMAIN, drop all its pages): hosts whose mean ``metric_col`` over
    their docs is below ``min_avg`` are removed with every doc they
    contributed.  Two streaming passes:

    1. per-host (n, sum) combiner partials -> one bucketed exchange; the
       reduce emits ONLY failing hosts (`sum < min_avg * n`, exact
       integer comparison — no float averaging), so the driver collects
       the blocklist side, which is the small side by construction;
    2. the blocklist broadcasts into a filter map over the doc stream.

    Scale note: the exchange carries one row per (batch, host) partial —
    domains, never pages; the driver holds only failing hosts.
    Returns the surviving (id, host) rows."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hosts = extract_host_series(batch[url_col].astype(str))
        g = (
            pd.DataFrame(
                {"host": hosts, "m": batch[metric_col].to_numpy(np.int64)}
            )
            .groupby("host", as_index=False)
            .agg(n=("m", "size"), s=("m", "sum"))
        )
        return g.astype({"n": np.int64, "s": np.int64})

    def failing(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("host", as_index=False)[["n", "s"]].sum()
        bad = g[g["s"] < min_avg * g["n"]]
        return bad[["host"]]

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=8192)
    bad_df = bucketed_group_agg(partials, ["host"], failing).to_pandas()
    # rule 8b: a 0-row Dataset.to_pandas() drops every column
    bad_hosts = frozenset() if len(bad_df) == 0 else frozenset(bad_df["host"])

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        hosts = extract_host_series(batch[url_col].astype(str))
        ok = ~hosts.isin(bad_hosts)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(np.int64)[ok.to_numpy()],
                "host": hosts[ok].to_numpy(dtype=object),
            }
        )

    return ds.map_batches(keep, batch_format="pandas", batch_size=8192)


def url_quality(ds, url_col: str = "url", id_col: str = "doc_id"):
    """URL spam signals (the crawl-curation heuristics keyed on the URL
    alone — applied before any content fetch/decode at crawl scale):
    per row — host subdomain depth (dots in host), path depth (segments),
    digit fraction of the host, query-string length, and a rule score
    ``url_spam`` counting fired signals (depth > 3, host digits > 0.2,
    query > 50 chars, path > 6 deep).  One vectorized pandas pass, no
    shuffle; every feature is exact integer/string arithmetic so a SQL
    replay matches bit-for-bit.
    Returns (id, host_depth, path_depth, host_digit_milli, query_len,
    url_spam)."""

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch[url_col].astype(str)
        host = extract_host_series(u)
        host_depth = host.str.count(r"\.").to_numpy(np.int64)
        rest = u.str.replace(r"^[^/?#]+//[^/?#]+", "", regex=True)
        path = rest.str.replace(r"[?#].*$", "", regex=True)
        path_depth = path.str.count("/").to_numpy(np.int64)
        # integer milli-fraction: exact on both engines (no float ratio)
        host_len = host.str.len().to_numpy(np.int64)
        host_digits = host.str.count(r"[0-9]").to_numpy(np.int64)
        digit_milli = np.where(
            host_len > 0, host_digits * 1000 // np.maximum(host_len, 1), 0
        ).astype(np.int64)
        q = rest.str.extract(r"\?([^#]*)", expand=False).fillna("")
        query_len = q.str.len().to_numpy(np.int64)
        spam = (
            (host_depth > 3).astype(np.int64)
            + (digit_milli > 200).astype(np.int64)
            + (query_len > 50).astype(np.int64)
            + (path_depth > 6).astype(np.int64)
        )
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(np.int64),
                "host_depth": host_depth,
                "path_depth": path_depth,
                "host_digit_milli": digit_milli,
                "query_len": query_len,
                "url_spam": spam,
            }
        )

    return ds.map_batches(feats, batch_format="pandas", batch_size=8192)


def robots_filter(
    ds,
    robots_by_host: dict,
    url_col: str = "url",
    agent: str = "*",
    default_allow: bool = True,
):
    """Crawl-politeness filter: drop rows whose URL is disallowed by its
    host's robots.txt (stdlib ``urllib.robotparser`` semantics —
    FIRST-matching rule wins, so an Allow override must precede its
    Disallow; the curation step a CC-style pipeline applies before
    indexing).
    ``robots_by_host`` maps lowercased host -> robots.txt text; hosts
    absent from the map pass when ``default_allow`` (the crawl default).
    The parsed rule objects build ONCE PER ACTOR in ``__init__`` (not
    per batch) and the rules map is broadcast via the actor constructor
    — small by contract (one entry per distinct host)."""
    from kafka_es_ray.runtime import stage_pool

    class RobotsStage:
        def __init__(self, rules_text: dict, agent_: str, default_: bool):
            from urllib.robotparser import RobotFileParser

            self.agent = agent_
            self.default = default_
            self.parsers = {}
            for host, txt in rules_text.items():
                p = RobotFileParser()
                p.parse(str(txt).splitlines())
                self.parsers[str(host).lower()] = p

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            hosts = extract_host_series(batch[url_col].astype(str))
            urls = batch[url_col].astype(str)
            keep = np.empty(len(batch), dtype=bool)
            for i, (h, u) in enumerate(zip(hosts, urls)):
                p = self.parsers.get(h)
                keep[i] = self.default if p is None else p.can_fetch(self.agent, u)
            return batch[keep]

    return ds.map_batches(
        RobotsStage,
        fn_constructor_args=(dict(robots_by_host), agent, bool(default_allow)),
        batch_format="pandas",
        batch_size=8192,
        concurrency=stage_pool(),
    )


def domain_counts(ds, url_col: str = "url", blocked=()):
    """Doc counts per host AFTER dropping blocked domains — the
    crawl-curation blocklist step.  The blocklist is broadcast once via
    the task closure (small by contract); per-batch value_counts
    combiner partials are the only rows shuffled (≤ distinct hosts per
    batch), summed in one bucketed exchange.  Returns (host, n_docs)."""
    blocked_set = frozenset(str(b).lower() for b in blocked)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hosts = extract_host_series(batch[url_col].astype(str))
        if blocked_set:
            hosts = hosts[~hosts.isin(blocked_set)]
        vc = hosts.value_counts()
        return pd.DataFrame(
            {"host": vc.index.to_numpy(dtype=object), "n": vc.to_numpy(np.int64)}
        )

    def reduce_host(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("host", as_index=False)["n"].sum()
        return pd.DataFrame(
            {"host": g["host"], "n_docs": g["n"].astype(np.int64)}
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=8192)
    return bucketed_group_agg(partials, ["host"], reduce_host)
