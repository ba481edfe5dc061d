"""ES ingest pipelines (`PUT _ingest/pipeline/<id>` + `?pipeline=` on
bulk): a declarative chain of processors applied to every document
before indexing.  The reference's connector ships raw JSON to ES and
relies on server-side ingest pipelines for reshaping
(ElasticsearchSinkTask preprocess hooks are the client-side analog); here
the pipeline compiles ONCE into a vectorized pandas transform and runs
as a streaming ``map_batches`` stage — no per-row Python in the hot
path, no shuffle.

Whitelisted processor subset (the ES docs' core set, each replayable in
SQL for the oracle): ``set``, ``rename``, ``remove``, ``lowercase``,
``uppercase``, ``trim``, ``gsub``, ``split``, ``convert``.  Unknown
processors or option combinations raise at COMPILE time (the ES
simulate-pipeline contract: bad pipelines fail before any doc flows).

Processor spec mirrors ES JSON, e.g.::

    [{"rename": {"field": "value", "target_field": "amount"}},
     {"set": {"field": "pipeline", "value": "v1"}},
     {"gsub": {"field": "props", "pattern": "[0-9]+", "replacement": "#"}},
     {"convert": {"field": "user_id", "type": "string"}}]

``ignore_missing: true`` on rename/remove/convert and the case/trim/gsub
/split string processors skips absent fields instead of raising.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_CONVERTERS = {
    "integer": lambda s: s.astype(np.int64),
    "long": lambda s: s.astype(np.int64),
    "float": lambda s: s.astype(np.float64),
    "double": lambda s: s.astype(np.float64),
    "string": lambda s: s.astype(object).map(
        lambda v: v if v is None else str(v)
    ),
    "boolean": lambda s: s.astype(bool),
}


def _need(spec: dict, key: str, proc: str):
    if key not in spec:
        raise ValueError(f"ingest processor {proc!r} requires {key!r}: {spec!r}")
    return spec[key]


def compile_pipeline(processors: list[dict]):
    """Compile an ES-style processor list into one vectorized
    ``batch -> batch`` pandas function.  All validation happens here —
    a compiled pipeline only fails on data (missing field without
    ignore_missing)."""
    steps = []
    for p in processors:
        if not isinstance(p, dict) or len(p) != 1:
            raise ValueError(f"each processor must be a single-key dict: {p!r}")
        (name, spec), = p.items()
        ignore = bool(spec.get("ignore_missing", False))

        if name == "set":
            fld, val = _need(spec, "field", name), _need(spec, "value", name)

            def step(b, fld=fld, val=val):
                b[fld] = val
                return b

        elif name == "rename":
            fld = _need(spec, "field", name)
            tgt = _need(spec, "target_field", name)

            def step(b, fld=fld, tgt=tgt, ignore=ignore):
                if fld not in b.columns:
                    if ignore:
                        return b
                    raise KeyError(f"ingest rename: missing field {fld!r}")
                if tgt in b.columns:
                    raise KeyError(f"ingest rename: target {tgt!r} exists")
                return b.rename(columns={fld: tgt})

        elif name == "remove":
            flds = _need(spec, "field", name)
            flds = [flds] if isinstance(flds, str) else list(flds)

            def step(b, flds=flds, ignore=ignore):
                missing = [f for f in flds if f not in b.columns]
                if missing and not ignore:
                    raise KeyError(f"ingest remove: missing fields {missing}")
                return b.drop(columns=[f for f in flds if f in b.columns])

        elif name in ("lowercase", "uppercase", "trim"):
            fld = _need(spec, "field", name)
            op = {"lowercase": "lower", "uppercase": "upper", "trim": "strip"}[name]

            def step(b, fld=fld, op=op, ignore=ignore, name=name):
                if fld not in b.columns:
                    if ignore:
                        return b
                    raise KeyError(f"ingest {name}: missing field {fld!r}")
                b[fld] = getattr(b[fld].str, op)()
                return b

        elif name == "gsub":
            fld = _need(spec, "field", name)
            pat = re.compile(_need(spec, "pattern", name))
            rep = _need(spec, "replacement", name)

            def step(b, fld=fld, pat=pat, rep=rep, ignore=ignore):
                if fld not in b.columns:
                    if ignore:
                        return b
                    raise KeyError(f"ingest gsub: missing field {fld!r}")
                b[fld] = b[fld].str.replace(pat, rep, regex=True)
                return b

        elif name == "split":
            fld = _need(spec, "field", name)
            sep = re.compile(_need(spec, "separator", name))

            def step(b, fld=fld, sep=sep, ignore=ignore):
                if fld not in b.columns:
                    if ignore:
                        return b
                    raise KeyError(f"ingest split: missing field {fld!r}")
                b[fld] = b[fld].map(
                    lambda v: v if v is None else sep.split(v)
                )
                return b

        elif name == "convert":
            fld = _need(spec, "field", name)
            typ = _need(spec, "type", name)
            tgt = spec.get("target_field", fld)
            if typ not in _CONVERTERS:
                raise ValueError(f"ingest convert: unsupported type {typ!r}")

            def step(b, fld=fld, tgt=tgt, typ=typ, ignore=ignore):
                if fld not in b.columns:
                    if ignore:
                        return b
                    raise KeyError(f"ingest convert: missing field {fld!r}")
                b[tgt] = _CONVERTERS[typ](b[fld])
                return b

        else:
            raise ValueError(f"unsupported ingest processor {name!r}")
        steps.append(step)

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        for s in steps:
            batch = s(batch)
        return batch

    return run


def apply_ingest_pipeline(ds, processors: list[dict], batch_size: int = 8192):
    """Run an ingest pipeline over a Dataset as one streaming
    ``map_batches`` stage (task pool — the transform is stateless; the
    compiled closure ships in the task pickle)."""
    fn = compile_pipeline(processors)
    return ds.map_batches(fn, batch_format="pandas", batch_size=batch_size)


def simulate_pipeline(processors: list[dict], docs: list[dict]) -> pd.DataFrame:
    """ES ``POST _ingest/pipeline/_simulate``: run the compiled pipeline
    over a handful of INLINE docs, isolating failures per doc (ES
    returns a per-doc ``error`` object instead of failing the request).
    Column ``slot`` is the doc position, ``ok`` the per-doc verdict;
    failed docs keep NULL transformed fields.  Per-doc execution is
    deliberate — simulate is a debugging endpoint over a handful of
    docs, never a data path (apply_ingest_pipeline is the streaming
    path)."""
    fn = compile_pipeline(processors)  # compile errors still raise (ES)
    results: list[tuple[int, bool, dict]] = []
    cols: list[str] = []
    for i, doc in enumerate(docs):
        try:
            out = fn(pd.DataFrame([dict(doc)]))
            rec = out.iloc[0].to_dict()
            results.append((i, True, rec))
            for c in out.columns:
                if c not in cols:
                    cols.append(c)
        except Exception:  # noqa: BLE001 - the ES per-doc error contract
            results.append((i, False, {}))
    frame: dict = {
        "slot": pd.Series([r[0] for r in results], dtype=np.int64),
        "ok": pd.Series([r[1] for r in results], dtype=bool),
    }
    for c in cols:
        frame[c] = [r[2].get(c) for r in results]
    return pd.DataFrame(frame)
