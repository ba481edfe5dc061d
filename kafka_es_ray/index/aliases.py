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
