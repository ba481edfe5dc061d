"""ES ``_reindex`` analog: rebuild an index from another index's stored
``_source`` under a NEW configuration (different partition count,
analyzer version, positions on/off, added keyword/numeric mappings) —
the standard ES migration path for mapping changes.

Ray-Data-first shape: the source index's docstore parquet files ARE the
Dataset (column-pruned read — postings are never touched), tombstoned
docs are dropped with a broadcast id set, and the result streams into
the ordinary ``build_index`` pipeline, which re-analyzes and re-shards.
Requires the source was built with ``store_text=True`` (no _source, no
reindex — the ES rule).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from kafka_es_ray.config import DEFAULT, EngineConfig
from kafka_es_ray.index.build import build_index
from kafka_es_ray.index.segment import (
    docstore_path,
    manifest_tombstone_files,
    read_manifest,
)


def reindex(
    src_dir: str,
    dest_dir: str,
    cfg: EngineConfig = DEFAULT,
    *,
    resume: bool = False,
    query: str | None = None,
    operator: str = "or",
    set_scripts: dict | None = None,
) -> dict:
    """Rebuild ``src_dir``'s live documents into ``dest_dir`` under
    ``cfg``.  Documents get fresh doc ids (the ES reindex contract);
    keys, lang, and any kw_/num_ mapped columns present in the source
    docstore carry over (renamed back to their field names so the build
    re-maps whatever ``cfg`` asks for).  ``query`` (the ES
    ``source.query`` filter — the corpus-curation path: reindex only the
    docs matching a match query) restricts the rebuild to matching live
    docs; each segment task decodes only the query terms' postings to
    decide membership.  Returns the new manifest.

    ``set_scripts``: the ES ``_reindex`` script subset — {numeric_field:
    whitelisted arithmetic expr over the SOURCE numeric fields}
    (``ctx._source.f = expr``), evaluated vectorized inside the
    streaming rebuild; referenced and target fields must be numeric
    columns of the source docstore (missing values read as 0.0)."""
    import ray
    import ray.data as rd

    from kafka_es_ray.query.engine import _script_eval_env, _script_fields

    manifest = read_manifest(src_dir)
    parts = [int(p) for p in manifest["parts"]]
    files = [docstore_path(src_dir, p) for p in parts]
    schema = pq.read_schema(files[0])
    if "text" not in schema.names:
        raise ValueError("source index was built without store_text=True — no _source to reindex")
    cols = ["doc_id", "key", "text", "lang"] + [
        n for n in schema.names if n.startswith(("kw_", "num_"))
    ]
    set_scripts = dict(set_scripts or {})
    if set_scripts:
        src_nums = {n[4:] for n in schema.names if n.startswith("num_")}
        for fld, expr in set_scripts.items():
            refs = set(_script_fields(str(expr)))  # whitelist gate
            missing = ({fld} | refs) - src_nums
            if missing:
                raise ValueError(
                    f"set_scripts[{fld}]: {sorted(missing)} are not numeric "
                    f"columns of the source docstore (have: {sorted(src_nums)})"
                )
    # dead ids across all segments: ids are globally unique, so one
    # broadcast set suffices (tombstone files are small by construction)
    dead: set[int] = set()
    for p in parts:
        for fname in manifest_tombstone_files(manifest, p):
            with open(os.path.join(src_dir, os.path.basename(fname))) as fh:
                dead.update(json.load(fh))
    dead_ref = ray.put(np.array(sorted(dead), dtype=np.int64))

    match_ref = None
    if query is not None:
        # ES source.query filter: one dictionary+postings pass per
        # segment gathers the matching LIVE doc ids; ids are globally
        # unique, so the union broadcasts as one sorted array
        from kafka_es_ray.query.engine import _match_set_plans, _segment_match_ids_for_plan
        from kafka_es_ray.index.segment import Segment
        import pandas as pd

        plan = _match_set_plans(
            pd.DataFrame({"query_id": [0], "text": [query], "operator": [operator]})
        )

        def seg_matches(batch: pd.DataFrame) -> pd.DataFrame:
            out = []
            for pid in batch["sid"].astype(int):
                s = Segment.load(src_dir, pid, manifest_tombstone_files(manifest, pid))
                ids = _segment_match_ids_for_plan(s, plan[0])
                out.append(pd.DataFrame({"doc_id": ids}))
            return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64)}
            )

        matched = (
            rd.from_pandas(pd.DataFrame({"sid": parts}))
            .repartition(max(1, len(parts) // 2))
            .map_batches(seg_matches, batch_format="pandas")
            .to_pandas()["doc_id"]
            .to_numpy(np.int64)
        )
        match_ref = ray.put(np.sort(matched))

    def live_source(batch: pa.Table) -> pa.Table:
        tomb = ray.get(dead_ref)
        ids = batch.column("doc_id").to_numpy()
        if tomb.size:
            pos = np.minimum(np.searchsorted(tomb, ids), tomb.size - 1)
            keep = tomb[pos] != ids
            batch = batch.filter(pa.array(keep))
            ids = ids[keep]
        if match_ref is not None:
            want = ray.get(match_ref)
            if want.size:
                pos = np.minimum(np.searchsorted(want, ids), want.size - 1)
                batch = batch.filter(pa.array(want[pos] == ids))
            else:
                batch = batch.slice(0, 0)
        out = {"key": batch.column("key"), "text": batch.column("text"),
               "lang": batch.column("lang")}
        for n in batch.schema.names:
            if n.startswith("kw_"):
                out[n[3:]] = batch.column(n)
            elif n.startswith("num_"):
                out[n[4:]] = batch.column(n)
        if set_scripts and batch.num_rows:
            # ES _reindex script: new value = expr(OLD source numerics);
            # all targets read the pre-script env (ES evaluates one
            # script body against the original _source)
            env = {}
            for expr in set_scripts.values():
                for f in _script_fields(str(expr)):
                    env[f] = np.nan_to_num(
                        out[f].to_numpy(zero_copy_only=False).astype(np.float64)
                    )
            for fld, expr in set_scripts.items():
                out[fld] = pa.array(
                    _script_eval_env(env, str(expr), batch.num_rows),
                    type=pa.float64(),
                )
        return pa.table(out)

    ds = rd.read_parquet(files, columns=cols).map_batches(
        live_source, batch_format="pyarrow"
    )
    return build_index(
        ds, dest_dir, cfg,
        key_col="key", text_col="text", lang_col="lang",
        html_col=None, ts_col=None, resume=resume,
    )
