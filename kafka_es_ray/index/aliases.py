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
    """{alias: [index_dir, ...]} (the reserved ``_templates`` section is
    not an alias and is excluded)."""
    return {k: v for k, v in _load(registry_path).items() if k != "_templates"}


def add_alias(
    registry_path: str, alias: str, index_dirs: list[str],
    filter_lang: str | None = None,
) -> dict:
    """Point ``alias`` at ``index_dirs`` (replacing any previous target
    set — the ES actions=[{remove},{add}] swap collapses to one call).
    Every target must be a committed index (manifest present).

    ``filter_lang``: an ES FILTERED alias — every search through the
    alias implicitly applies this lang term filter (the ES
    ``aliases: {a: {filter: {term: ...}}}`` shape; lang is the engine's
    built-in keyword field).  Stored as the dict registry form; plain
    aliases keep the legacy list form so existing registries read
    unchanged."""
    if alias.startswith("_"):
        raise ValueError(f"alias names may not start with '_': {alias!r}")
    for d in index_dirs:
        if not os.path.exists(os.path.join(d, "manifest.json")):
            raise ValueError(f"not a committed index (no manifest): {d}")
    reg = _load(registry_path)
    dirs = [os.path.abspath(d) for d in index_dirs]
    reg[alias] = (
        {"targets": dirs, "filter_lang": str(filter_lang)}
        if filter_lang is not None
        else dirs
    )
    atomic_write_json(reg, registry_path)
    return {k: v for k, v in reg.items() if k != "_templates"}


def remove_alias(registry_path: str, alias: str) -> dict:
    if alias.startswith("_"):  # "_templates" etc. are not aliases
        raise ValueError(f"not an alias (reserved name): {alias!r}")
    reg = _load(registry_path)
    reg.pop(alias, None)
    atomic_write_json(reg, registry_path)
    return {k: v for k, v in reg.items() if k != "_templates"}


_TEMPLATE_SETTINGS = {
    "num_partitions", "index_positions", "store_text",
    "keyword_cols", "numeric_cols", "vector_cols", "text_fields",
}


def put_template(
    registry_path: str, name: str, pattern: str, settings: dict,
    priority: int = 0,
) -> dict:
    """ES ``_index_template`` analog: a named template = (glob
    index_pattern, EngineConfig setting overrides, priority), stored in
    the registry's reserved ``_templates`` section.  When an index is
    auto-created under a matching name (rollover's new generation, or
    ``template_config`` callers), the highest-priority matching
    template's settings apply (the ES composable-template rule; ties
    break name asc)."""
    bad = set(settings) - _TEMPLATE_SETTINGS
    if bad:
        raise ValueError(
            f"unknown template settings {sorted(bad)} "
            f"(allowed: {sorted(_TEMPLATE_SETTINGS)})"
        )
    reg = _load(registry_path)
    tpl = reg.setdefault("_templates", {})
    tpl[name] = {
        "pattern": str(pattern), "settings": dict(settings),
        "priority": int(priority),
    }
    atomic_write_json(reg, registry_path)
    return tpl[name]


def list_templates(registry_path: str) -> dict:
    return _load(registry_path).get("_templates", {})


def delete_template(registry_path: str, name: str) -> dict:
    reg = _load(registry_path)
    reg.get("_templates", {}).pop(name, None)
    atomic_write_json(reg, registry_path)
    return reg.get("_templates", {})


def match_template(registry_path: str, index_name: str) -> dict | None:
    """Highest-priority template whose glob pattern matches
    ``index_name`` (fnmatch; ties name asc), or None."""
    import fnmatch

    tpl = _load(registry_path).get("_templates", {})
    hits = sorted(
        ((-v["priority"], k) for k, v in tpl.items()
         if fnmatch.fnmatch(index_name, v["pattern"])),
    )
    return tpl[hits[0][1]] if hits else None


def template_config(registry_path: str, index_name: str, base=None):
    """EngineConfig for a new index named ``index_name``: the matching
    template's settings over ``base`` (or the library DEFAULT) — list
    settings become tuples (EngineConfig's storage form)."""
    from dataclasses import replace

    from kafka_es_ray.config import DEFAULT

    cfg = base if base is not None else DEFAULT
    t = match_template(registry_path, index_name)
    if t is None:
        return cfg
    kw = {
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in t["settings"].items()
    }
    return replace(cfg, **kw)


def rollover(
    registry_path: str,
    alias: str,
    new_index_dir: str,
    *,
    max_docs: int | None = None,
    max_age_s: float | None = None,
    max_size_bytes: int | None = None,
    cfg=None,
) -> dict:
    """ES ``_rollover`` analog for the continuous-ingestion flow: the
    alias's WRITE index is its LAST target; when ANY provided condition
    holds — ``max_docs`` (doc count), ``max_age_s`` (seconds since the
    manifest's created_at; pre-created_at indexes never age-match),
    ``max_size_bytes`` (on-disk bytes of the index dir, the ES max_size
    primary-store analog) — create a fresh EMPTY index at
    ``new_index_dir`` (committed manifest, zero segments — ingestion
    lands there via apply_incremental) and atomically repoint the alias
    to ``[*old_targets, new_index_dir]``.  At least one condition is
    required (the ES dry-run-refuses-unconditioned-rollover rule).
    Reads through the alias span every generation via multi-index
    search; time-ordered generations bound per-index size exactly like
    ES time-series indices."""
    import time

    import pandas as pd
    import ray.data as rd

    from kafka_es_ray.config import DEFAULT
    from kafka_es_ray.index.build import build_index
    from kafka_es_ray.index.segment import read_manifest

    if max_docs is None and max_age_s is None and max_size_bytes is None:
        raise ValueError("rollover: need max_docs, max_age_s and/or max_size_bytes")
    targets, alias_filter = resolve_full(registry_path, alias)
    write = targets[-1]
    m = read_manifest(write)
    n = int(m["n_docs"])
    age_s = (
        time.time() - float(m["created_at"]) if m.get("created_at") else None
    )
    size_b = None
    if max_size_bytes is not None:
        size_b = sum(
            os.path.getsize(os.path.join(dp, fn))
            for dp, _, fns in os.walk(write)
            for fn in fns
        )
    hit = (
        (max_docs is not None and n >= max_docs)
        or (max_age_s is not None and age_s is not None and age_s >= max_age_s)
        or (max_size_bytes is not None and size_b >= max_size_bytes)
    )
    status = {
        "write_index": write, "n_docs": n,
        **({"age_s": round(age_s, 3)} if age_s is not None else {}),
        **({"size_bytes": size_b} if size_b is not None else {}),
    }
    if not hit:
        return {"rolled": False, **status}
    empty = pd.DataFrame(
        {
            "url": pd.Series([], dtype=object),
            "text": pd.Series([], dtype=object),
            "lang": pd.Series([], dtype=object),
        }
    )
    build_index(
        rd.from_pandas(empty), new_index_dir,
        # no explicit cfg: the new generation inherits the matching
        # index template's settings (ES rollover-through-template)
        cfg or template_config(
            registry_path, os.path.basename(new_index_dir), DEFAULT
        ),
        html_col=None, ts_col=None,
    )
    add_alias(
        registry_path, alias, [*targets, new_index_dir], filter_lang=alias_filter
    )
    return {"rolled": True, **{**status, "write_index": new_index_dir}}


def resolve(registry_path: str | None, name: str) -> list[str]:
    """Resolve a name to index directories: a registered alias returns
    its target list; anything else must be an index directory itself and
    passes through (so every query entry point accepts both)."""
    return resolve_full(registry_path, name)[0]


def resolve_full(
    registry_path: str | None, name: str
) -> tuple[list[str], str | None]:
    """(index_dirs, filter_lang) — filter_lang is the filtered alias's
    implicit lang term filter (None for plain aliases / direct dirs)."""
    if registry_path:
        reg = _load(registry_path)
        if name in reg and name != "_templates":
            ent = reg[name]
            if isinstance(ent, dict):
                return list(ent["targets"]), ent.get("filter_lang")
            return list(ent), None
    if os.path.exists(os.path.join(name, "manifest.json")):
        return [name], None
    raise ValueError(f"unknown alias / not an index directory: {name!r}")


def ilm_tick(
    registry_path: str,
    alias: str,
    new_index_dir_fn,
    *,
    max_docs: int | None = None,
    max_age_s: float | None = None,
    max_size_bytes: int | None = None,
    merge_max_segments: int | None = None,
    retention_generations: int | None = None,
    cfg=None,
) -> dict:
    """One ES ILM policy tick for a time-series alias (the hot -> warm ->
    delete lifecycle the reference's ES cluster runs via index lifecycle
    management), composed from the engine's primitives:

    1. HOT: `rollover` the write index (last target) when any provided
       condition holds — ``new_index_dir_fn(generation:int) -> path``
       names the next generation;
    2. WARM: `auto_merge` every NON-write generation down to
       ``merge_max_segments`` live segments (read-optimize old
       generations; the write index keeps ingesting untouched);
    3. DELETE: drop generations beyond ``retention_generations`` (oldest
       first) — the alias is atomically repointed BEFORE the directories
       are removed, so a concurrent reader resolving the alias never
       sees a missing target.

    Call it from an ingestion loop (the ILM scheduler shape).  Returns
    {"rolled": bool, "merged": {dir: n}, "deleted": [dirs]}."""
    import shutil

    from kafka_es_ray.config import DEFAULT
    from kafka_es_ray.index.merge import auto_merge

    cfg = cfg or DEFAULT
    out: dict = {"rolled": False, "merged": {}, "deleted": []}
    targets, alias_filter = resolve_full(registry_path, alias)

    if max_docs is not None or max_age_s is not None or max_size_bytes is not None:
        r = rollover(
            registry_path, alias, str(new_index_dir_fn(len(targets))),
            max_docs=max_docs, max_age_s=max_age_s,
            max_size_bytes=max_size_bytes, cfg=cfg,
        )
        out["rolled"] = bool(r.get("rolled"))
        targets, alias_filter = resolve_full(registry_path, alias)

    if merge_max_segments is not None:
        for d in targets[:-1]:  # never the write index
            am = auto_merge(d, max_segments=int(merge_max_segments), cfg=cfg)
            if am.get("merged"):
                out["merged"][d] = int(am["merged"])

    if retention_generations is not None and len(targets) > int(retention_generations):
        drop = targets[: len(targets) - int(retention_generations)]
        keep = targets[len(drop):]
        add_alias(registry_path, alias, keep, filter_lang=alias_filter)
        for d in drop:
            shutil.rmtree(d, ignore_errors=True)
        out["deleted"] = drop

    return out
