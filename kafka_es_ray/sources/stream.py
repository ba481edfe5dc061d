"""Continuous micro-batch ingestion — the Kafka-consumer analog.

The reference is a long-running connector: poll records, resolve doc
ops, bulk-apply, commit offsets (ElasticsearchSinkTask.kt put/flush
cycle; offset commit = the at-least-once checkpoint).  Here the "topic"
is a directory that producers drop parquet files into; the "offset" is
the sorted file name; the commit point is an atomically-rewritten
ledger INSIDE the index directory.

At-least-once by construction: the ledger is written AFTER a file's
``apply_incremental`` manifest commit, so a crash between apply and
ledger append replays that file — and replays are safe because delta
segment ids are deterministic under retry and per-key LWW/seq resolution
is idempotent (tests/test_incremental.py crash-retry idempotence).
Files apply in name order (Kafka partition-order analog); each apply is
itself Ray-parallel per routing partition.
"""

from __future__ import annotations

import json
import os
import time

from kafka_es_ray.config import DEFAULT, EngineConfig

LEDGER = "ingest_ledger.json"


def _ledger_path(index_dir: str) -> str:
    return os.path.join(index_dir, LEDGER)


def read_ledger(index_dir: str) -> dict:
    try:
        with open(_ledger_path(index_dir)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"consumed": []}


def _commit_ledger(index_dir: str, ledger: dict) -> None:
    tmp = _ledger_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ledger, f)
    os.replace(tmp, _ledger_path(index_dir))  # atomic commit point


def pending_files(input_dir: str, index_dir: str) -> list[str]:
    """Unconsumed parquet files in offset (name) order."""
    seen = {e["file"] for e in read_ledger(index_dir)["consumed"]}
    return sorted(
        fn
        for fn in os.listdir(input_dir)
        if fn.endswith(".parquet") and fn not in seen
    )


def follow_directory(
    input_dir: str,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    *,
    key_col: str = "id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    seq_col: str | None = "seq",
    op_col: str | None = "op",
    poll_s: float = 1.0,
    max_batches: int | None = None,
    idle_stop_s: float | None = None,
    metrics=None,
    watchdog_ttl_s: float | None = None,
    watchdog_max_restarts: int = 2,
    auto_merge_max_segments: int | None = None,
    alert_queries=None,
    _apply_fn=None,
) -> dict:
    """Tail ``input_dir`` for new parquet files and apply each as an
    incremental micro-batch, committing the ledger after every file.

    Runs until ``max_batches`` files have been applied and/or the
    directory has been idle for ``idle_stop_s`` seconds (both None =
    forever, the connector's normal mode).  Returns a summary
    {files_applied, rows (cumulative index apply_metrics), last_gen,
    watchdog_restarts, quarantined}.

    ``metrics``: an optional :class:`kafka_es_ray.metrics.MetricsServer`
    (or any object with ``inc``/``set``) updated live per micro-batch —
    the Prometheus-exporter analog (reference Metrics.kt:24-83,
    MetricsUpdater.kt:3-15): files_applied, rows_total, last_gen,
    last_apply_seconds, pending_files, watchdog_restarts, quarantined.

    ``auto_merge_max_segments``: when set, run the tiered merge policy
    (index.merge.auto_merge) after each applied file — the ES background
    merge scheduler shape: delta segments accumulate per micro-batch and
    are compacted as soon as the live count exceeds the threshold, so a
    long-running follow never degrades query fan-out.  Merges happen
    between applies (applies are serialized per index), and a merge
    crash loses nothing: the pre-merge manifest stays the commit point.

    ``alert_queries``: a DataFrame (query_id, text[, operator]) of
    REGISTERED percolate queries matched against every applied
    micro-batch's docs — the ES Watcher/alerting shape composed from the
    percolator (stored queries are the small side; only the incoming
    docs stream).  Matches append to ``<index>/alerts.jsonl`` (one
    {file, key, query_id} line each, after the ledger commit) and the
    cumulative count lands in metrics as ``alerts_total``.  Delete ops
    never alert (no text).

    ``watchdog_ttl_s``: straggler watchdog for the continuous path (the
    WatchDog analog, reference WatchDog.kt:13-126 — restart a task whose
    progress stalls past a TTL).  Each apply runs on a worker thread; if
    it exceeds the TTL it is declared stuck, logged, counted, and the
    file is RE-APPLIED (safe: replays are idempotent — delta segment ids
    are deterministic under retry and per-key LWW/seq resolution
    re-resolves, tests/test_incremental.py).  After
    ``watchdog_max_restarts`` strikes the file is quarantined in the
    ledger (error-classification rule D10) so one poison file cannot
    wedge the stream.  The abandoned attempt's thread is daemonic — at
    the reference this is the JVM task cancel; here the replacement
    apply wins the manifest commit race because applies are serialized
    per index and commit via atomic rename."""
    import logging

    import ray.data as rd

    from kafka_es_ray.index.incremental import apply_incremental

    log = logging.getLogger("kafka_es_ray.stream")
    apply_fn = _apply_fn or apply_incremental
    applied = 0
    rows = 0
    last_gen = None
    restarts = 0
    merges = 0
    alerts_total = 0
    quarantined: list[str] = []
    idle_since = time.monotonic()

    percolator = None
    if alert_queries is not None and len(alert_queries):
        # the ES Watcher shape: the stored queries are the broadcast
        # small side, built ONCE for the whole follow session; each
        # micro-batch's docs stream through driver-side (micro-batches
        # are small by construction)
        import ray

        from kafka_es_ray.functions.tokenizer import get_analyzer
        from kafka_es_ray.pipelines.fulltext import PercolateStage

        plans = []
        for r in alert_queries.itertuples(index=False):
            terms = tuple(sorted(set(get_analyzer(None).tokenize(r.text))))
            if terms:
                plans.append(
                    (
                        int(r.query_id), terms,
                        (getattr(r, "operator", None) or "or") == "and",
                    )
                )
        percolator = PercolateStage(ray.put(plans))

    def _alert(fn: str, df) -> int:
        """Percolate one applied micro-batch; append alert lines."""
        import pandas as _pd

        live = df
        if op_col in live.columns:
            live = live[live[op_col] != "delete"]
        if not len(live):
            return 0
        import numpy as np

        probe = _pd.DataFrame(
            {
                "doc_id": np.arange(len(live), dtype=np.int64),
                "text": live[text_col].fillna("").astype(str).to_numpy(),
            }
        )
        hits = percolator(probe)
        if not len(hits):
            return 0
        keys = live[key_col].astype(str).to_numpy()
        with open(os.path.join(index_dir, "alerts.jsonl"), "a") as fh:
            for r in hits.itertuples(index=False):
                fh.write(json.dumps(
                    {"file": fn, "key": keys[int(r.doc_id)],
                     "query_id": int(r.query_id)}
                ) + "\n")
        return int(len(hits))

    def _run_once(fn: str) -> dict:
        return apply_fn(
            index_dir,
            rd.read_parquet(os.path.join(input_dir, fn)),
            cfg,
            key_col=key_col,
            text_col=text_col,
            lang_col=lang_col,
            seq_col=seq_col,
            op_col=op_col,
        )

    def _run_watched(fn: str) -> dict | None:
        """Apply under the TTL; None = quarantined after max restarts."""
        nonlocal restarts
        if watchdog_ttl_s is None:
            return _run_once(fn)
        import threading

        for attempt in range(watchdog_max_restarts + 1):
            box: dict = {}

            def _target(box=box, fn=fn):
                try:
                    box["manifest"] = _run_once(fn)
                except BaseException as e:  # surfaced to the loop below
                    box["error"] = e

            th = threading.Thread(target=_target, daemon=True)
            th.start()
            th.join(watchdog_ttl_s)
            if not th.is_alive():
                if "error" in box:
                    raise box["error"]
                return box["manifest"]
            restarts += 1
            if metrics is not None:
                metrics.set("watchdog_restarts", restarts)
            log.warning(
                "watchdog: apply of %s exceeded ttl=%.1fs (attempt %d/%d) — restarting",
                fn, watchdog_ttl_s, attempt + 1, watchdog_max_restarts + 1,
            )
        log.error("watchdog: quarantining %s after %d stuck attempts", fn, restarts)
        return None

    while True:
        batch_files = pending_files(input_dir, index_dir)
        if metrics is not None:
            metrics.set("pending_files", len(batch_files))
        if max_batches is not None:
            batch_files = batch_files[: max(0, max_batches - applied)]
        for fn in batch_files:
            t0 = time.monotonic()
            manifest = _run_watched(fn)
            ledger = read_ledger(index_dir)
            if manifest is None:
                quarantined.append(fn)
                # consumed-with-error: skip forever, visible for replay tooling
                ledger["consumed"].append({"file": fn, "error": "watchdog_quarantined"})
                _commit_ledger(index_dir, ledger)
                if metrics is not None:
                    metrics.set("quarantined", len(quarantined))
                idle_since = time.monotonic()
                continue
            last_gen = int(manifest.get("gen", 0))
            # apply_metrics is CUMULATIVE across applies — report the total
            rows = int(manifest.get("apply_metrics", {}).get("rows", 0))
            applied += 1
            # ledger AFTER the apply's manifest commit = at-least-once
            ledger["consumed"].append({"file": fn, "gen": last_gen})
            _commit_ledger(index_dir, ledger)
            if percolator is not None:
                import pandas as _pd

                n_al = _alert(fn, _pd.read_parquet(os.path.join(input_dir, fn)))
                if n_al:
                    alerts_total += n_al
                    log.info("alerts: %d percolate matches in %s", n_al, fn)
                if metrics is not None:
                    metrics.set("alerts_total", alerts_total)
            idle_since = time.monotonic()
            if auto_merge_max_segments is not None:
                from kafka_es_ray.index.merge import auto_merge

                am = auto_merge(index_dir, max_segments=auto_merge_max_segments, cfg=cfg)
                if am.get("merged"):
                    merges += 1
                    log.info(
                        "auto-merge: compacted %d segments -> %d live",
                        am["merged"], am["parts"],
                    )
                    if metrics is not None:
                        metrics.set("auto_merges", merges)
                        metrics.set("live_segments", am["parts"])
            if metrics is not None:
                metrics.set("files_applied", applied)
                metrics.set("rows_total", rows)
                metrics.set("last_gen", last_gen)
                metrics.set("last_apply_seconds", time.monotonic() - t0)
        if max_batches is not None and applied >= max_batches:
            break
        if idle_stop_s is not None and time.monotonic() - idle_since >= idle_stop_s:
            break
        time.sleep(poll_s)
    return {
        "files_applied": applied,
        "rows": rows,
        "last_gen": last_gen,
        "watchdog_restarts": restarts,
        "quarantined": quarantined,
        "auto_merges": merges,
        "alerts_total": alerts_total,
    }
