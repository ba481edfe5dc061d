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
    quarantined: list[str] = []
    idle_since = time.monotonic()

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
    }
