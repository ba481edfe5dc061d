"""Index aliases — the ES ``_aliases`` API analog: a registry file maps
alias names to lists of index directories, and queries resolve through
it.  One atomic JSON write per mutation means an alias SWAP (the ES
zero-downtime reindex cutover: build new index, repoint alias, drop old)
is a single commit — readers see either the old target set or the new,
never a mix.  An alias naming several indexes feeds straight into the
engine's multi-index search (`run_queries(queries, [dir1, dir2, ...])`).
"""

from __future__ import annotations

import json
import os

from kafka_es_ray.index.segment import atomic_write_json


def _load(registry_path: str) -> dict:
    if not os.path.exists(registry_path):
        return {}
    with open(registry_path) as fh:
        return json.load(fh)


def list_aliases(registry_path: str) -> dict:
    """{alias: [index_dir, ...]}."""
    return _load(registry_path)


def add_alias(registry_path: str, alias: str, index_dirs: list[str]) -> dict:
    """Point ``alias`` at ``index_dirs`` (replacing any previous target
    set — the ES actions=[{remove},{add}] swap collapses to one call).
    Every target must be a committed index (manifest present)."""
    for d in index_dirs:
        if not os.path.exists(os.path.join(d, "manifest.json")):
            raise ValueError(f"not a committed index (no manifest): {d}")
    reg = _load(registry_path)
    reg[alias] = [os.path.abspath(d) for d in index_dirs]
    atomic_write_json(reg, registry_path)
    return reg


def remove_alias(registry_path: str, alias: str) -> dict:
    reg = _load(registry_path)
    reg.pop(alias, None)
    atomic_write_json(reg, registry_path)
    return reg


def rollover(
    registry_path: str,
    alias: str,
    new_index_dir: str,
    *,
    max_docs: int,
    cfg=None,
) -> dict:
    """ES ``_rollover`` analog for the continuous-ingestion flow: the
    alias's WRITE index is its LAST target; when that index holds >=
    ``max_docs`` docs, create a fresh EMPTY index at ``new_index_dir``
    (committed manifest, zero segments — ingestion lands there via
    apply_incremental) and atomically repoint the alias to
    ``[*old_targets, new_index_dir]``.  Reads through the alias span
    every generation via multi-index search; time-ordered generations
    bound per-index size exactly like ES time-series indices."""
    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.config import DEFAULT
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.index.segment import read_manifest

    targets = resolve(registry_path, alias)
    write = targets[-1]
    n = int(read_manifest(write)["n_docs"])
    if n < max_docs:
        return {"rolled": False, "write_index": write, "n_docs": n}
    empty = pd.DataFrame(
        {
            "url": pd.Series([], dtype=object),
            "text": pd.Series([], dtype=object),
            "lang": pd.Series([], dtype=object),
        }
    )
    build_index(
        rd.from_pandas(empty), new_index_dir, cfg or DEFAULT,
        html_col=None, ts_col=None,
    )
    add_alias(registry_path, alias, [*targets, new_index_dir])
    return {"rolled": True, "write_index": new_index_dir, "n_docs": n}


def resolve(registry_path: str | None, name: str) -> list[str]:
    """Resolve a name to index directories: a registered alias returns
    its target list; anything else must be an index directory itself and
    passes through (so every query entry point accepts both)."""
    if registry_path:
        reg = _load(registry_path)
        if name in reg:
            return list(reg[name])
    if os.path.exists(os.path.join(name, "manifest.json")):
        return [name]
    raise ValueError(f"unknown alias / not an index directory: {name!r}")
