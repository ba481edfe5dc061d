"""Small ES metadata/batch APIs over the manifest mappings:

* :func:`field_caps` — ES ``GET /<indices>/_field_caps``: merged field
  capabilities (type / searchable / aggregatable) across indices, with
  the ES conflict behavior (a field mapped to different types appears
  once per type, each listing its indices).
* :func:`run_msearch` — ES ``POST /_msearch``: N independent search
  bodies executed as ONE distributed ``run_queries`` batch (the engine's
  planner already dedupes identical plans and broadcasts them once, so
  an msearch of N bodies costs one segment sweep, not N).

Both read only the manifest — no segment I/O.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kafka_es_ray.index.segment import read_manifest


def _index_fields(manifest: dict) -> list[tuple[str, str, bool, bool]]:
    """(field, type, searchable, aggregatable) rows for one index —
    derived from the manifest's frozen mappings block."""
    mp = manifest.get("mappings", {})
    rows: list[tuple[str, str, bool, bool]] = []
    text_fields = list(mp.get("text_fields") or [])
    for f in text_fields or ["text"]:
        rows.append((f, "text", True, False))
    for f in mp.get("keyword_cols") or []:
        rows.append((f, "keyword", True, True))
    for f in mp.get("numeric_cols") or []:
        rows.append((f, "double", True, True))
    for f in mp.get("vector_cols") or []:
        rows.append((f, "dense_vector", True, False))
    return rows


def field_caps(index_dirs, names: list[str] | None = None) -> pd.DataFrame:
    """Merged field capabilities across one or more indices.  Returns
    (field, type, searchable, aggregatable, indices) sorted by (field,
    type); ``indices`` is the comma-joined sorted list of index names
    mapping the field to that type — a field with >1 row is the ES
    "conflict" case."""
    dirs = [index_dirs] if isinstance(index_dirs, str) else list(index_dirs)
    names = names or [d.rstrip("/").rsplit("/", 1)[-1] for d in dirs]
    acc: dict[tuple[str, str], dict] = {}
    for name, d in zip(names, dirs):
        for fld, typ, srch, agg in _index_fields(read_manifest(d)):
            e = acc.setdefault(
                (fld, typ),
                {"searchable": srch, "aggregatable": agg, "indices": []},
            )
            e["indices"].append(name)
    rows = [
        {
            "field": fld,
            "type": typ,
            "searchable": e["searchable"],
            "aggregatable": e["aggregatable"],
            "indices": ",".join(sorted(e["indices"])),
        }
        for (fld, typ), e in acc.items()
    ]
    return (
        pd.DataFrame(
            rows, columns=["field", "type", "searchable", "aggregatable", "indices"]
        )
        .sort_values(["field", "type"])
        .reset_index(drop=True)
    )


def cat_indices(index_dirs, names: list[str] | None = None) -> pd.DataFrame:
    """ES ``GET _cat/indices``: one row per index with live doc count,
    deleted (tombstoned) doc count, partition count and generation —
    manifest + tombstone-file reads only, no segment decode.  Returns
    (index, docs_count, docs_deleted, parts, gen) sorted by index."""
    import json
    import os

    dirs = [index_dirs] if isinstance(index_dirs, str) else list(index_dirs)
    names = names or [d.rstrip("/").rsplit("/", 1)[-1] for d in dirs]
    rows = []
    for name, d in zip(names, dirs):
        m = read_manifest(d)
        dead: set[int] = set()
        for files in (m.get("tombstones") or {}).values():
            for fname in files:
                with open(os.path.join(d, os.path.basename(fname))) as f:
                    dead.update(json.load(f))
        rows.append(
            {
                "index": name,
                # manifest n_docs keeps tombstoned docs until merge (the
                # ES stats rule); _cat reports LIVE count + deleted
                "docs_count": int(m["n_docs"]) - len(dead),
                "docs_deleted": len(dead),
                "parts": len(m["parts"]),
                "gen": int(m.get("gen", 0)),
            }
        )
    return pd.DataFrame(rows).sort_values("index").reset_index(drop=True)


def run_msearch(
    bodies: list[dict],
    index_dir,
    cfg=None,
    concurrency: int | None = None,
):
    """Execute N search bodies (the templates module's DSL subset) as
    one distributed batch; query_id = body position.  Returns the
    run_queries Dataset."""
    import numpy as np

    from kafka_es_ray.query.engine import run_queries
    from kafka_es_ray.query.templates import query_row_from_dsl

    rows = []
    for qid, body in enumerate(bodies):
        row = query_row_from_dsl(body)
        row["query_id"] = np.int64(qid)
        rows.append(row)
    kwargs = {} if cfg is None else {"cfg": cfg}
    return run_queries(
        pd.DataFrame(rows), index_dir, concurrency=concurrency, **kwargs
    )


def run_search_with_totals(
    queries_ds,
    index_dir: str,
    cfg=None,
    concurrency: int | None = None,
):
    """ES ``track_total_hits: true``: the top-k hits PLUS the exact total
    match count per query (ES's default only lower-bounds totals at
    10,000; exact tracking makes ES score every match too).  Two
    distributed sweeps — the scored top-k pass and the count pass — each
    already exchange only per-(plan, segment) partials; joined
    driver-side on query_id.  Returns a DataFrame: the run_queries
    columns + ``total_hits`` (int64, repeated per hit row; queries with
    zero matches contribute no rows, like _search)."""
    from kafka_es_ray.config import DEFAULT
    from kafka_es_ray.query.engine import run_counts, run_queries

    cfg = cfg or DEFAULT
    queries = (
        queries_ds.to_pandas() if hasattr(queries_ds, "to_pandas") else queries_ds
    )
    hits = run_queries(queries, index_dir, cfg, concurrency).to_pandas()
    if not len(hits):
        # rule 8b: a 0-row Dataset.to_pandas() drops ALL columns —
        # return the typed empty contract instead of KeyError'ing
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "key": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
                "total_hits": pd.Series([], dtype=np.int64),
            }
        )
    counts = run_counts(queries, index_dir, cfg, concurrency)
    totals = dict(zip(counts["query_id"], counts["n_matching"]))
    hits["total_hits"] = (
        hits["query_id"].map(totals).fillna(0).astype(np.int64)
    )
    return hits


def cat_segments(index_dirs, names: list[str] | None = None) -> pd.DataFrame:
    """ES ``GET _cat/segments``: one row per (index, segment) with the
    segment's routing partition, generation class (base vs delta), doc /
    term / posting counts, per-segment deleted docs and on-disk bytes —
    manifest + tombstone-file + stat() reads only, no segment decode.
    ``partitions`` is a comma-joined string (merged segments cover
    several routing partitions); ``kind`` is base / delta / merged.
    Returns (index, segment, partitions, kind, docs_count, docs_deleted,
    terms, postings, size_bytes) sorted (index, segment)."""
    import json
    import os

    dirs = [index_dirs] if isinstance(index_dirs, str) else list(index_dirs)
    names = names or [d.rstrip("/").rsplit("/", 1)[-1] for d in dirs]
    rows = []
    for name, d in zip(names, dirs):
        m = read_manifest(d)
        n_parts = int(m["num_partitions"])
        tomb = m.get("tombstones") or {}
        for sid_s, pm in m.get("part_manifests", {}).items():
            sid = int(sid_s)
            dead = set()
            for fname in tomb.get(str(sid), []):
                with open(os.path.join(d, os.path.basename(fname))) as f:
                    dead.update(json.load(f))
            size = 0
            for fname in pm.get("files", []):
                fp = os.path.join(d, os.path.basename(fname))
                if os.path.exists(fp):
                    size += os.path.getsize(fp)
            # partition membership from the manifest records, NEVER id
            # arithmetic (CLAUDE.md rule 8a); merged segments carry a
            # "partitions" list, base/delta a scalar "partition"
            if pm.get("partitions"):
                parts_s = ",".join(str(int(x)) for x in pm["partitions"])
                kind = "merged"
            else:
                parts_s = str(int(pm.get("partition", sid)))
                kind = "base" if sid < n_parts else "delta"
            rows.append(
                {
                    "index": name,
                    "segment": sid,
                    "partitions": parts_s,
                    "kind": kind,
                    "docs_count": int(pm["n_docs"]) - len(dead),
                    "docs_deleted": len(dead),
                    "terms": int(pm.get("n_terms", 0)),
                    "postings": int(pm.get("n_postings", 0)),
                    "size_bytes": size,
                }
            )
    return (
        pd.DataFrame(rows)
        .sort_values(["index", "segment"])
        .reset_index(drop=True)
    )
