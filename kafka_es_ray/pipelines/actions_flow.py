"""The full reference dataflow, end to end:

    records (topic, seq, action-header, value, tag)
      -> ParseActionsStage        (convert + tag filter + index default)
      -> resolve_actions          (route, LWW, tombstones)
      -> field extraction         (source JSON -> text)
      -> build_index              (the '/_bulk sink' analog: segments)

This is the Ray Data shape of the reference's channel topology
(ElasticsearchSink.kt:25-164: in -> RoutingActor -> N x (BufferingActor ->
BulkSinkActor) -> ES): routing = hash partition, buffering = Arrow
batching, writer pool = the segment-building group tasks.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

from kafka_es_ray.config import DEFAULT, EngineConfig
from kafka_es_ray.runtime import stage_pool
from kafka_es_ray.index.build import build_index
from kafka_es_ray.stages.actions import ParseActionsStage, resolve_actions


def index_from_actions(
    records_ds,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    *,
    tag: str | None = None,
    default_index: str | None = "docs",
    topic_index_map: dict[str, str] | None = None,
    text_field: str = "title",
) -> dict:
    """records -> parsed -> resolved live docs -> inverted index.

    ``text_field`` is the source-JSON field indexed as document text."""
    parsed = records_ds.map_batches(
        ParseActionsStage,
        fn_constructor_kwargs={
            "tag": tag,
            "default_index": default_index,
            "topic_index_map": topic_index_map,
        },
        batch_format="pandas",
        batch_size=cfg.batch_size,
        concurrency=stage_pool(),
    )
    live = resolve_actions(parsed)

    def extract_field(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["source"].map(
            lambda s: str(json.loads(s).get(text_field, "")) if s else ""
        )
        return pd.DataFrame(
            {
                "id": batch["id"],
                "routing": batch["routing"],
                "seq": batch["seq"],
                "text": texts,
                "lang": "en",
            }
        )

    docs = live.map_batches(extract_field, batch_format="pandas")
    # key = id; router key = routing ?? id (D2).  Docs are already resolved,
    # so the in-partition LWW (keyed by seq) is a no-op except for same-id
    # docs that arrived under distinct routing (kept apart, like ES shards).
    return build_index(
        docs,
        index_dir,
        cfg,
        key_col="id",
        text_col="text",
        lang_col="lang",
        html_col=None,
        ts_col=None,
        seq_col="seq",
        routing_col="routing",
    )


def index_from_actions_multi(
    records_ds,
    base_dir: str,
    cfg: EngineConfig = DEFAULT,
    *,
    tag: str | None = None,
    default_index: str | None = "docs",
    topic_index_map: dict[str, str] | None = None,
    text_field: str = "title",
) -> dict[str, dict]:
    """Multi-index fan-out — the reference's per-topic index routing
    (maybeUpdateActionIndex + topic.index.map,
    ElasticsearchSinkTask.kt:301-310) taken to its conclusion: actions
    carrying different ``_index`` names land in DIFFERENT indices.
    Builds one index per distinct resolved index name under
    ``{base_dir}/{index_name}``; returns {index_name: manifest}.

    The resolved action set is materialized once (small relative to the
    corpus: post-LWW docs) and filtered per index — N small filters, not
    N parse+resolve passes."""
    import os

    parsed = records_ds.map_batches(
        ParseActionsStage,
        fn_constructor_kwargs={
            "tag": tag,
            "default_index": default_index,
            "topic_index_map": topic_index_map,
        },
        batch_format="pandas",
        batch_size=cfg.batch_size,
        concurrency=stage_pool(),
    )
    live = resolve_actions(parsed).materialize()
    names = sorted(
        live.map_batches(
            lambda b: pd.DataFrame({"index": b["index"].dropna().unique()}),
            batch_format="pandas",
        )
        .to_pandas()["index"]
        .unique()
    )

    def extract_field(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["source"].map(
            lambda s: str(json.loads(s).get(text_field, "")) if s else ""
        )
        return pd.DataFrame(
            {
                "id": batch["id"],
                "routing": batch["routing"],
                "seq": batch["seq"],
                "text": texts,
                "lang": "en",
            }
        )

    out: dict[str, dict] = {}
    for name in names:
        docs = live.map_batches(
            lambda b, _n=name: extract_field(b[b["index"] == _n]),
            batch_format="pandas",
        )
        out[name] = build_index(
            docs,
            os.path.join(base_dir, name),
            cfg,
            key_col="id",
            text_col="text",
            lang_col="lang",
            html_col=None,
            ts_col=None,
            seq_col="seq",
            routing_col="routing",
        )
    return out


def update_index_from_actions(
    index_dir: str,
    records_ds,
    cfg: EngineConfig = DEFAULT,
    *,
    tag: str | None = None,
    default_index: str | None = "docs",
    topic_index_map: dict[str, str] | None = None,
    text_field: str = "title",
) -> dict:
    """Continuous-ingest analog: apply a NEW batch of action records to an
    EXISTING index as delta segments + tombstones (the put()-loop
    semantics of the reference task, ElasticsearchSinkTask.kt:256-280;
    see index/incremental.py)."""
    from kafka_es_ray.index.incremental import apply_incremental

    parsed = records_ds.map_batches(
        ParseActionsStage,
        fn_constructor_kwargs={
            "tag": tag,
            "default_index": default_index,
            "topic_index_map": topic_index_map,
        },
        batch_format="pandas",
        batch_size=cfg.batch_size,
        concurrency=stage_pool(),
    )
    live = resolve_actions(parsed, keep_deletes=True, keep_orphans=True)

    def extract_field(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["op"] != "quarantine"]

        def text_of(op: str, s):
            if s is None or (isinstance(s, float) and pd.isna(s)):
                return None if op in ("update", "upsert") else ""
            d = json.loads(s)
            if op in ("update", "upsert"):
                # orphan patch: null text = field untouched -> the apply
                # stage inherits the stored text (ES partial update;
                # upsert = doc_as_upsert, inserts when the doc is missing)
                return str(d[text_field]) if text_field in d else None
            return str(d.get(text_field, ""))

        return pd.DataFrame(
            {
                "op": batch["op"],
                "id": batch["id"],
                "routing": batch["routing"],
                "seq": batch["seq"],
                "text": [
                    text_of(op, s) for op, s in zip(batch["op"], batch["source"])
                ],
                "lang": "en",
            }
        )

    docs = live.map_batches(extract_field, batch_format="pandas")
    return apply_incremental(
        index_dir,
        docs,
        cfg,
        key_col="id",
        text_col="text",
        lang_col="lang",
        seq_col="seq",
        op_col="op",
        routing_col="routing",
    )
