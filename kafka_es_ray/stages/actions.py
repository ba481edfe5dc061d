"""Doc-ops stream semantics — the columnar BulkAction pipeline.

Reimplements (Ray-Data-first, columnar) the reference's per-record
convert/filter/fan-out chain:

  * parse_records    — JsonConverter.toConnectData (JsonConverter.kt:42-76):
                       polymorphic action header {op: {meta}} + JSON value;
                       Delete takes no source; malformed -> quarantined row
                       (poison-row handling for D10's NON_RETRIABLE class,
                       ElasticsearchBulkSender.kt:51-92).
  * tag filter       — BaseConverter.shouldSkipMessage (BaseConverter.kt:52-61):
                       drop when a configured tag doesn't match the record's
                       tag header; missing header => keep.
  * fan-out          — preprocessRecords (ElasticsearchSinkTask.kt:282-299):
                       a record value may be ONE action or a LIST; flatten.
  * default index    — maybeUpdateActionIndex (ElasticsearchSinkTask.kt:301-310):
                       _index ?? topic_index_map[topic] ?? default index,
                       error when unresolved; preset index wins.
  * empty-str -> null — ProtobufConverter normalization (ProtobufConverter.kt:71-74).
  * NDJSON serialize — BulkAction.write / BulkMetaSerializer
                       (BulkAction.kt:104-111,194-238): meta line + optional
                       source line, '\n'-terminated — golden-tested.
  * resolve_actions  — last-write-wins per (routing ?? id) by seq with
                       delete tombstones (E1/D2 semantics) -> the doc set a
                       downstream index build indexes.

The actions schema (columnar sealed-class analog, SURVEY §1.2):
  op: string in {index,create,update,delete}, id: string?, index: string?,
  routing: string?, parent: string?, retry_on_conflict: int?, seq: int64,
  source: string? (JSON), tag: string?
Scripted updates are out of scope (documented, SURVEY §7.4): update
resolves as doc-source last-write-wins.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

# module-top import (CLAUDE.md rule 1): ParseProtobufActionsStage's
# __init__/__call__ run on Ray workers — a lazy import there would need
# the package importable on the worker's sys.path
from kafka_es_ray.functions.protowire import BULK_ACTION, OP_DELETE, OP_INDEX, resolve_proto

OPS = ("index", "create", "update", "delete")
META_FIELDS = ("_id", "_type", "_index", "routing", "parent", "retry_on_conflict")


def _norm(v):
    """empty string -> null (ProtobufConverter.kt:71-74)."""
    return None if v == "" or v is None else v


def parse_record(header: str | None, value: str | None) -> list[dict] | None:
    """One raw record -> list of action dicts (fan-out) or None (skip).
    Raises ValueError on malformed input (callers quarantine)."""
    if header is None:
        raise ValueError("missing action header")
    meta_obj = json.loads(header)
    if not isinstance(meta_obj, dict) or len(meta_obj) != 1:
        raise ValueError(f"action header must have exactly one op key: {header!r}")
    op = next(iter(meta_obj))
    if op not in OPS:
        raise ValueError(f"unknown op {op!r}")
    meta = meta_obj[op]
    if not isinstance(meta, dict):
        raise ValueError("op meta must be an object")
    base = {
        "op": op,
        "id": _norm(meta.get("id", meta.get("_id"))),
        "index": _norm(meta.get("index", meta.get("_index"))),
        "routing": _norm(meta.get("routing")),
        "parent": _norm(meta.get("parent")),
        "retry_on_conflict": meta.get("retry_on_conflict"),
    }
    if op == "delete":
        if value not in (None, ""):
            # tolerated: delete ignores any value payload
            pass
        return [dict(base, source=None)]
    if value in (None, ""):
        raise ValueError(f"{op} action requires a source")
    payload = json.loads(value)
    if isinstance(payload, list):  # fan-out (ElasticsearchSinkTask.kt:282-299)
        return [dict(base, source=json.dumps(p, separators=(",", ":"))) for p in payload]
    return [dict(base, source=json.dumps(payload, separators=(",", ":")))]


class ParseActionsStage:
    """map_batches stage: raw records (topic, seq, action, value, tag) ->
    actions rows + quarantine rows (poison-row handling, D10)."""

    def __init__(
        self,
        tag: str | None = None,
        default_index: str | None = None,
        topic_index_map: dict[str, str] | None = None,
    ):
        self.tag = tag
        self.default_index = default_index
        self.topic_index_map = topic_index_map or {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for r in batch.itertuples(index=False):
            tag = getattr(r, "tag", None)
            # tag filter: missing header => keep (BaseConverter.kt:52-61)
            if self.tag is not None and tag is not None and tag != self.tag:
                continue
            topic = getattr(r, "topic", None)
            try:
                actions = parse_record(r.action, r.value)
            except ValueError as exc:
                rows.append(
                    {
                        "op": "quarantine",
                        "id": None,
                        "index": None,
                        "routing": None,
                        "seq": int(r.seq),
                        "source": None,
                        "error": str(exc),
                    }
                )
                continue
            for j, a in enumerate(actions):
                # default index resolution (ElasticsearchSinkTask.kt:301-310)
                idx = a["index"] or self.topic_index_map.get(topic) or self.default_index
                if idx is None:
                    rows.append(
                        {
                            "op": "quarantine",
                            "id": a["id"],
                            "index": None,
                            "routing": a["routing"],
                            "parent": a["parent"],
                            "retry_on_conflict": a["retry_on_conflict"],
                            "seq": int(r.seq),
                            "source": None,
                            "error": f"index not resolved for topic {topic!r}",
                        }
                    )
                    continue
                doc_id = a["id"]
                if doc_id is None:
                    if a["op"] in ("index", "create"):
                        # auto-id path (BulkAction.kt:117): ES generates a
                        # random id; the deterministic batch analog derives
                        # it from (seq, fan-out position)
                        doc_id = f"_auto_{int(r.seq)}_{j}"
                    else:
                        rows.append(
                            {
                                "op": "quarantine",
                                "id": None,
                                "index": idx,
                                "routing": a["routing"],
                                "parent": a["parent"],
                                "retry_on_conflict": a["retry_on_conflict"],
                                "seq": int(r.seq),
                                "source": None,
                                "error": f"{a['op']} requires an id",
                            }
                        )
                        continue
                rows.append(
                    {
                        "op": a["op"],
                        "id": doc_id,
                        "index": idx,
                        "routing": a["routing"],
                        "parent": a["parent"],
                        "retry_on_conflict": a["retry_on_conflict"],
                        "seq": int(r.seq),
                        "source": a["source"],
                        "error": None,
                    }
                )
        return pd.DataFrame(
            rows,
            columns=["op", "id", "index", "routing", "parent", "retry_on_conflict", "seq", "source", "error"],
        ).astype({"seq": np.int64})


class ParseProtobufActionsStage:
    """map_batches stage: protobuf-wire records -> actions rows +
    quarantine rows — the ProtobufConverter.toConnectData path
    (reference ProtobufConverter.kt:62-117):

      * the action header is a ``kafka_es.BulkAction`` wire message;
        only INDEX and DELETE ops exist (bulk_action.proto:8-23);
        UNRECOGNIZED op -> quarantine (the converter throws);
      * empty-string -> null for index/type/id/routing/parent
        (ProtobufConverter.kt:71-74);
      * the record value is a message of the configured class
        (``protobuf.class``), resolved ONCE per actor (the reflective
        parser-built-once rule, ProtobufSerde.kt:26-73), printed to
        proto3 JSON with proto field names as the action source;
      * malformed header/value -> quarantine row (DataException analog);
      * tag filter: missing header => keep (BaseConverter.kt:52-61).

    Input columns: (topic, seq, action: bytes, value: bytes?, tag:
    str?)."""

    def __init__(
        self,
        protobuf_class: str,
        tag: str | None = None,
        default_index: str | None = None,
        topic_index_map: dict[str, str] | None = None,
        include_default_values: bool = False,
    ):
        self.header_type = BULK_ACTION
        self.value_type = resolve_proto(protobuf_class)  # configure-time load
        self.tag = tag
        self.default_index = default_index
        self.topic_index_map = topic_index_map or {}
        self.include_default_values = include_default_values

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []

        def q(seq: int, err: str, base: dict | None = None) -> None:
            base = base or {}
            rows.append(
                {
                    "op": "quarantine",
                    "id": base.get("id"),
                    "index": base.get("index"),
                    "routing": base.get("routing"),
                    "parent": base.get("parent"),
                    "retry_on_conflict": None,
                    "seq": int(seq),
                    "source": None,
                    "error": err,
                }
            )

        for r in batch.itertuples(index=False):
            tag = getattr(r, "tag", None)
            if self.tag is not None and tag is not None and tag != self.tag:
                continue
            topic = getattr(r, "topic", None)
            if r.action is None:
                q(r.seq, "missing action header")
                continue
            try:
                meta = self.header_type.decode(bytes(r.action))
            except ValueError as exc:
                q(r.seq, f"Error when parsing protobuf action header: {exc}")
                continue
            op_type = meta["op_type"]
            if op_type not in (OP_INDEX, OP_DELETE):
                q(r.seq, "Unrecognized operation type for bulk action")
                continue
            # empty-string -> null normalization (ProtobufConverter.kt:71-74)
            idx = _norm(meta["index"]) or self.topic_index_map.get(topic) or self.default_index
            base = {
                "id": _norm(meta["id"]),
                "index": idx,
                "routing": _norm(meta["routing"]),
                "parent": _norm(meta["parent"]),
                "retry_on_conflict": None,
                "seq": int(r.seq),
                "error": None,
            }
            if idx is None:
                q(r.seq, f"index not resolved for topic {topic!r}", base)
                continue
            if op_type == OP_DELETE:
                rows.append(dict(base, op="delete", source=None))
                continue
            if r.value is None:
                q(r.seq, "Message value must be present", base)
                continue
            try:
                source = self.value_type.to_json(
                    self.value_type.decode(bytes(r.value)),
                    include_defaults=self.include_default_values,
                )
            except ValueError as exc:
                q(r.seq, f"Error when parsing protobuf data: {exc}", base)
                continue
            doc_id = base["id"]
            if doc_id is None:
                doc_id = f"_auto_{int(r.seq)}_0"
            rows.append(dict(base, id=doc_id, op="index", source=source))
        return pd.DataFrame(
            rows,
            columns=["op", "id", "index", "routing", "parent", "retry_on_conflict", "seq", "source", "error"],
        ).astype({"seq": np.int64})


def serialize_action(
    op: str,
    id: str | None = None,
    index: str | None = None,
    routing: str | None = None,
    parent: str | None = None,
    retry_on_conflict: int | None = None,
    source: str | None = None,
) -> str:
    """NDJSON form: meta line + optional source line, each '\\n'-terminated
    (the ES /_bulk wire format the reference emits, BulkAction.kt:104-111;
    golden-tested in tests/test_actions.py)."""
    meta: dict = {}
    if id is not None:
        meta["_id"] = id
    if index is not None:
        meta["_index"] = index
    if routing is not None:
        meta["routing"] = routing
    if parent is not None:
        meta["parent"] = parent
    if retry_on_conflict is not None and op == "update":
        meta["retry_on_conflict"] = retry_on_conflict
    out = json.dumps({op: meta}, separators=(",", ":")) + "\n"
    if op != "delete":
        if source is None:
            raise ValueError(f"{op} action requires a source")
        out += source + "\n"
    return out


def serialize_bulk(actions: pd.DataFrame) -> str:
    """A bulk body: concatenated NDJSON actions (BulkRequest.kt:16-47,
    content type application/x-ndjson)."""
    parts = []
    for r in actions.itertuples(index=False):
        parts.append(
            serialize_action(
                r.op,
                id=r.id,
                index=r.index,
                routing=getattr(r, "routing", None),
                parent=getattr(r, "parent", None),
                retry_on_conflict=getattr(r, "retry_on_conflict", None),
                source=r.source,
            )
        )
    return "".join(parts)


def merge_doc(old: dict, patch: dict) -> dict:
    """Recursive partial-document merge — ES update {"doc": ...}
    semantics (nested objects merge, scalars/arrays replace)."""
    out = dict(old)
    for k, v in patch.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_doc(out[k], v)
        else:
            out[k] = v
    return out


_SCRIPT_STMT = re.compile(r"^ctx\._source\.(\w+)\s*(=|\+=|-=)\s*params\.(\w+)$")


def apply_script(doc: dict, script: dict) -> dict | None:
    """Whitelisted painless subset — exactly the shape of the reference's
    scripted-update golden (BulkActionTests.kt:186-207:
    ``ctx._source.counter += params.param1``): ';'-separated statements of
    ``ctx._source.F = params.P`` / ``+=`` / ``-=``.  Returns the updated
    doc, or None when the script falls outside the subset (callers
    quarantine — never a silent drop)."""
    src = script.get("source")
    params = script.get("params") or {}
    if not isinstance(src, str) or not isinstance(params, dict):
        return None
    out = dict(doc)
    for stmt in filter(None, (s.strip() for s in src.split(";"))):
        m = _SCRIPT_STMT.match(stmt)
        if m is None:
            return None
        field, op, pname = m.groups()
        if pname not in params:
            return None
        v = params[pname]
        if op == "=":
            out[field] = v
        else:
            cur = out.get(field, 0)
            if not isinstance(cur, (int, float)) or not isinstance(v, (int, float)):
                return None
            out[field] = cur + v if op == "+=" else cur - v
    return out


def _fold_ops(rows: list[dict]) -> tuple[dict | None, dict | None, list[dict]]:
    """Fold one (route_key, id) group's ops in seq order — full ES doc-op
    semantics (E1):
      index   -> replace (upsert)
      create  -> version-conflict if the doc exists (op dropped, like the
                 reference's non-retriable per-item error D10)
      update  -> recursive partial merge of {"doc": ...} (or the whole
                 source when not wrapped) into the live doc; scripted
                 updates run the whitelisted painless subset
                 (apply_script) — outside it they QUARANTINE, never
                 silently drop; an update whose doc has no in-batch prior
                 op becomes an ORPHAN patch (resolved against the stored
                 doc by the incremental path, or quarantined)
      delete  -> tombstone
    Returns (live_row, orphan_update_row, quarantine_rows)."""
    live: dict | None = None
    deleted_in_batch = False
    orphan: dict | None = None  # accumulated patch for a doc not in batch
    quarantine: list[dict] = []

    def _q(r: dict, err: str) -> None:
        quarantine.append(dict(r, op="quarantine", error=err))

    for r in rows:
        op = r["op"]
        if op == "index":
            live = dict(r)
            orphan = None
        elif op == "create":
            if live is None:
                live = dict(r)
                orphan = None
        elif op == "update":
            if r["source"] is None:
                continue
            patch = json.loads(r["source"])
            is_script = isinstance(patch, dict) and "script" in patch
            das = bool(isinstance(patch, dict) and patch.get("doc_as_upsert"))
            if das and live is None and deleted_in_batch and not is_script:
                # ES doc_as_upsert after an in-batch delete: insert the doc
                p = patch.get("doc", patch)
                live = dict(r)
                live["source"] = json.dumps(p, separators=(",", ":"))
                deleted_in_batch = False
                continue
            if live is not None:
                old = json.loads(live["source"]) if live["source"] else {}
                if is_script:
                    merged = apply_script(old, patch["script"])
                    if merged is None:
                        _q(r, "script outside whitelisted subset")
                        continue
                else:
                    p = patch.get("doc", patch) if isinstance(patch, dict) else patch
                    merged = merge_doc(old, p) if isinstance(p, dict) else p
                live = dict(live)
                live["source"] = (
                    json.dumps(merged, separators=(",", ":"))
                    if isinstance(merged, dict)
                    else json.dumps(merged)
                )
                live["seq"] = r["seq"]
            elif deleted_in_batch:
                # ES document_missing: the doc was deleted earlier in-batch
                _q(r, "document missing (deleted earlier in batch)")
            elif is_script:
                # a script against an unseen stored doc can't be replayed
                # field-wise downstream -> surface, don't drop
                _q(r, "scripted update of doc not in batch")
            else:
                p = patch.get("doc", patch) if isinstance(patch, dict) else patch
                if not isinstance(p, dict):
                    _q(r, "update source must be an object")
                    continue
                merged = merge_doc(json.loads(orphan["source"]), p) if orphan else p
                prev_das = bool(orphan and orphan.get("doc_as_upsert"))
                orphan = dict(r)
                orphan["source"] = json.dumps(merged, separators=(",", ":"))
                # ES doc_as_upsert: the orphan patch INSERTS if the doc is
                # also missing from the index (resolved downstream)
                orphan["doc_as_upsert"] = das or prev_das
        elif op == "delete":
            live = None
            orphan = None
            deleted_in_batch = True
    return live, orphan, quarantine


def resolve_actions(
    actions_ds,
    keep_deletes: bool = False,
    keep_orphans: bool = False,
    keep_quarantine: bool = False,
):
    """Op-stream -> live doc set: groupby(routing ?? id), winner = max seq
    (E1 upsert / D2 co-location); delete winners drop the doc; 'create'
    only wins if no earlier live doc... ES semantics for create are
    version-conflict-on-exists — in a bounded batch we resolve create like
    index (documented divergence).

    ``keep_orphans``: emit op='update' rows for updates whose doc has no
    in-batch prior op (the incremental path resolves them against the
    stored doc — ES partial-merge into _source); when False they surface
    as quarantine rows (never silently dropped).
    ``keep_quarantine``: include op='quarantine' rows (malformed /
    non-whitelisted-script / document-missing items — the reference's
    non-retriable per-item error class, ElasticsearchBulkSender.kt:51-92).

    Returns Dataset of (id, index, routing, seq, source) — plus 'op' and
    'error' columns when any of the keep_* flags is set."""

    from kafka_es_ray.stages.shuffle import bucketed_group_agg

    any_extra = keep_deletes or keep_orphans or keep_quarantine

    def add_route_key(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["op"] != "quarantine"].copy()
        batch = batch[~batch["id"].isna()]  # auto-id docs can't conflict; handled separately
        batch["route_key"] = batch["routing"].where(~batch["routing"].isna(), batch["id"])
        return batch

    def winners(bucket: pd.DataFrame) -> pd.DataFrame:
        # fold ops in seq order PER (route_key, id) — the router co-locates
        # same keys (Actors.kt:57-75); like ES, inconsistent routing for
        # one id yields one live doc per shard.  Full op semantics
        # (upsert / create-conflict / partial-merge update / tombstone)
        # live in _fold_ops.
        b = bucket.sort_values("seq", kind="mergesort")
        out_rows: list[dict] = []

        def emit(op: str, r: dict, source, error=None) -> None:
            out_rows.append(
                {
                    "op": op,
                    "id": r["id"],
                    "index": r["index"],
                    "routing": r["routing"],
                    "seq": r["seq"],
                    "source": source,
                    "error": error,
                }
            )

        for (_, _id), g in b.groupby(["route_key", "id"], sort=False):
            rows = g.to_dict("records")
            live, orphan, quarantine = _fold_ops(rows)
            if live is not None:
                emit("index", live, live["source"])
            elif any(r["op"] == "delete" for r in rows):
                if keep_deletes:
                    last_del = [r for r in rows if r["op"] == "delete"][-1]
                    emit("delete", last_del, None)
            if orphan is not None:
                if keep_orphans:
                    emit(
                        "upsert" if orphan.get("doc_as_upsert") else "update",
                        orphan,
                        orphan["source"],
                    )
                else:
                    quarantine.append(
                        dict(orphan, op="quarantine", error="update of doc not in batch")
                    )
            if keep_quarantine:
                for q in quarantine:
                    emit("quarantine", q, q["source"], q["error"])
        cols = ["op", "id", "index", "routing", "seq", "source", "error"]
        out = pd.DataFrame(out_rows, columns=cols)
        if not any_extra:
            out = out[out["op"] == "index"].drop(columns=["op", "error"])
        return out

    keyed = actions_ds.map_batches(add_route_key, batch_format="pandas")
    return bucketed_group_agg(keyed, ["route_key"], winners)
