"""ES search templates (`POST /_search/template` /
`_render/template`): a stored JSON query source with mustache
placeholders, rendered per-request with a params object, then executed
as a normal search (reference clients hit this API for every
parameterized dashboard query; ES docs "Search template").

Supported mustache subset — the idioms the ES docs themselves use:

* ``{{name}}``           — scalar substitution (strings JSON-escaped,
                           numbers/bools/null as JSON literals)
* ``{{#toJson}}name{{/toJson}}`` — full JSON encoding of any value
* ``{{^name}}default{{/name}}``  — inverted section: emits the literal
                           section body when the param is missing/falsy
                           (the ES default-value idiom
                           ``{{size}}{{^size}}10{{/size}}``)

Anything else (loops, partials, lambdas) raises — templates are a
whitelisted surface like the painless/script subsets elsewhere in this
engine.

The rendered JSON body is then converted to the engine's queries-row
surface by :func:`query_row_from_dsl`, supporting the DSL subset
{match, bool{must: match, filter: term/terms/range}, size} — the same
row columns (`text`, `k`, `kw_field`/`kw_value`,
`range_field`/`range_gte`/`range_lte`) every distributed query path
already consumes, so a rendered template runs through `run_queries`
unchanged (one planner, no parallel code path).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

_TO_JSON = re.compile(r"\{\{#toJson\}\}\s*([\w.]+)\s*\{\{/toJson\}\}")
_INVERTED = re.compile(r"\{\{\^([\w.]+)\}\}(.*?)\{\{/\1\}\}", re.S)
_SCALAR = re.compile(r"\{\{([\w.]+)\}\}")
_LEFTOVER = re.compile(r"\{\{[#^/&>{]")


def render_template(source: str, params: dict) -> str:
    """Render the mustache-subset ``source`` with ``params`` into a
    concrete JSON string.  Unknown scalar params render as empty (the
    mustache contract), which pairs with the ``{{^name}}`` default
    idiom; unsupported mustache constructs raise ValueError."""

    def _to_json(m: re.Match) -> str:
        return json.dumps(params.get(m.group(1)), sort_keys=True)

    out = _TO_JSON.sub(_to_json, source)

    def _inverted(m: re.Match) -> str:
        return "" if params.get(m.group(1)) else m.group(2)

    out = _INVERTED.sub(_inverted, out)

    def _scalar(m: re.Match) -> str:
        v = params.get(m.group(1))
        if v is None:
            return ""
        if isinstance(v, str):
            return json.dumps(v)[1:-1]  # escaped, no surrounding quotes
        return json.dumps(v)

    out = _SCALAR.sub(_scalar, out)
    if _LEFTOVER.search(out):
        raise ValueError(
            "unsupported mustache construct in search template "
            f"(whitelisted: scalar / toJson / inverted-default): {out!r}"
        )
    return out


def query_row_from_dsl(body: dict) -> dict:
    """Convert a rendered search body (DSL subset) to a queries-row
    dict.  Supported: ``{"query": {"match": {field: text|{"query":
    text}}}, "size": k}`` and ``bool`` with one match ``must`` plus
    term/terms/range ``filter`` clauses."""
    row: dict = {}
    size = body.get("size")
    if size is not None:
        row["k"] = np.int32(int(size))
    q = body.get("query")
    if not isinstance(q, dict) or len(q) != 1:
        raise ValueError(f"unsupported template query body: {q!r}")
    kind, spec = next(iter(q.items()))

    def _match_text(mspec: dict) -> str:
        if len(mspec) != 1:
            raise ValueError(f"match needs exactly one field: {mspec!r}")
        val = next(iter(mspec.values()))
        return str(val["query"]) if isinstance(val, dict) else str(val)

    if kind == "match":
        row["text"] = _match_text(spec)
    elif kind == "bool":
        must = spec.get("must", [])
        must = must if isinstance(must, list) else [must]
        if len(must) != 1 or "match" not in must[0]:
            raise ValueError(f"bool template needs one match must: {must!r}")
        row["text"] = _match_text(must[0]["match"])
        filt = spec.get("filter", [])
        filt = filt if isinstance(filt, list) else [filt]
        for f in filt:
            if "term" in f:
                (fld, v), = f["term"].items()
                row["kw_field"], row["kw_value"] = str(fld), str(v)
            elif "terms" in f:
                (fld, vs), = f["terms"].items()
                row["kw_field"] = str(fld)
                row["kw_value"] = "|".join(str(v) for v in vs)
            elif "range" in f:
                (fld, b), = f["range"].items()
                row["range_field"] = str(fld)
                if "gte" in b:
                    row["range_gte"] = float(b["gte"])
                if "lte" in b:
                    row["range_lte"] = float(b["lte"])
            else:
                raise ValueError(f"unsupported template filter: {f!r}")
    else:
        raise ValueError(f"unsupported template query kind: {kind!r}")
    return row


def run_search_template(
    source: str,
    params_list,
    index_dir,
    cfg=None,
    concurrency: int | None = None,
):
    """Execute one template over N params objects as ONE distributed
    `run_queries` batch (identical rendered plans dedupe in the planner,
    the broadcast side stays tiny).  ``params_list``: list of dicts or a
    DataFrame (one row per request); query_id = position.  Returns the
    run_queries Dataset."""
    from kafka_es_ray.query.engine import run_queries

    if isinstance(params_list, pd.DataFrame):
        params_list = params_list.to_dict("records")
    rows = []
    for qid, params in enumerate(params_list):
        body = json.loads(render_template(source, dict(params)))
        row = query_row_from_dsl(body)
        row["query_id"] = np.int64(qid)
        rows.append(row)
    queries = pd.DataFrame(rows)
    kwargs = {} if cfg is None else {"cfg": cfg}
    return run_queries(queries, index_dir, concurrency=concurrency, **kwargs)


def run_msearch_template(
    entries,
    index_dir,
    cfg=None,
    concurrency: int | None = None,
):
    """ES ``_msearch/template``: a batch of independent (template source,
    params) request pairs — each rendered to a DSL body, all executed as
    ONE distributed `run_queries` batch (one segment sweep; identical
    rendered plans dedupe in the planner).  ``entries``: list of
    {"source": str, "params": dict}; query_id = position.  Returns the
    run_queries Dataset."""
    from kafka_es_ray.query.engine import run_queries

    rows = []
    for qid, ent in enumerate(entries):
        body = json.loads(
            render_template(str(ent["source"]), dict(ent.get("params") or {}))
        )
        row = query_row_from_dsl(body)
        row["query_id"] = np.int64(qid)
        rows.append(row)
    queries = pd.DataFrame(rows)
    kwargs = {} if cfg is None else {"cfg": cfg}
    return run_queries(queries, index_dir, concurrency=concurrency, **kwargs)
