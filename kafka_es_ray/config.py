"""Engine configuration.

The reference exposes 19 throughput-shaping knobs on the connector config
(reference ElasticsearchSinkConnector.kt:46-217: bulk.size, bulk.delay.ms,
max.in.flight.requests, queue.size, retry.interval, ...).  In a Ray Data
engine those map onto batch sizes, actor-pool concurrency and partition
counts; retry/backoff knobs map onto Ray task retries plus the segment
writer's in-actor retry loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # --- batching (reference: bulk.size=100, ElasticsearchSinkConnector.kt:53-54).
    # Our unit of work is an Arrow batch, far larger than an ES bulk because
    # the per-batch overhead is a Python call, not an HTTP round trip.
    batch_size: int = 4096
    # Parallelism of stateful stages (reference: max.in.flight.requests,
    # ElasticsearchSinkConnector.kt:61-62 — default 1 writer; we default to
    # "let Ray size the pool" unless pinned).
    extract_concurrency: int | None = None
    query_concurrency: int | None = None
    # Max segments a ShardScorerStage actor keeps decoded in memory (LRU).
    # Ray Data gives no block->actor affinity, so without a cap a long-lived
    # query actor converges toward holding the whole index.
    scorer_segment_cache: int = 8

    # --- index layout
    # Number of doc partitions ("shards").  Each partition owns a doc_id
    # range, is deduped / doc_id-assigned / segment-built independently, and
    # becomes exactly one segment.  At 100 TB this is O(100k); partition
    # content must fit in one worker's heap.
    num_partitions: int = 16
    # doc_id = part_id * PART_STRIDE + local_rank.  2^36 docs per partition
    # x 2^27 partitions fits int64 — deterministic ids with NO global
    # barrier (no prefix-sum pass over partition counts).
    part_stride: int = 1 << 36
    # Posting-list block length for block-max metadata + skip pointers.
    block_size: int = 128

    # --- BM25 (reference target: Okapi BM25 k1=1.2 b=0.75 — SURVEY §2 E4,
    # BASELINE.json north_star)
    k1: float = 1.2
    b: float = 0.75

    # --- analyzer chain version (frozen; bump = reindex; SURVEY §7.4)
    analyzer_version: str = "v1"

    # --- index token positions (ES indexes positions by default; here
    # opt-in since they add ~2x postings storage).  Required for
    # search_phrase (match_phrase analog).
    index_positions: bool = False

    # --- store the indexed text in the docstore (the ES _source stored
    # field): enables fetch-with-results at the cost of docstore ~= corpus
    # size — exactly the tradeoff ES makes by default.
    store_text: bool = False

    # --- extra keyword fields stored in the docstore (ES keyword-mapped
    # fields): each becomes a kw_{name} docstore column usable by terms
    # aggregations (agg_terms field=...) — the generalization of the
    # built-in lang column.
    keyword_cols: tuple[str, ...] = ()

    # --- numeric fields stored in the docstore (ES numeric-mapped
    # fields): each becomes a num_{name} float64 docstore column usable
    # by range filters (search(filter_range=…)) and sort-by-field
    # (search_sorted / run_sorted).  Float64 is exact for integers up to
    # 2^53 — the practical range of doc metadata.
    numeric_cols: tuple[str, ...] = ()

    # --- index sorting (the ES index.sort setting): ("field", "desc" |
    # "asc") lays each partition's docs out in that numeric field's order
    # (missing values last, ties by key) BEFORE rank assignment, so
    # ascending doc_id == the sort order within every segment.  A
    # sort-by-this-field query then early-terminates: the per-segment
    # top-k is the FIRST k value-ordered matching docs — no full
    # match-set docvalue gather.  Internal-id builds only (external
    # id_col fixes doc ids and cannot re-map); opt-in because it changes
    # rank order (a breaking layout version per the determinism rule).
    index_sort: tuple[str, str] | None = None

    # --- dense-vector fields stored in the docstore (ES dense_vector
    # mapped fields): each becomes a vec_{name} list<float32> docstore
    # column usable by exact kNN search (run_knn) — the ES knn/
    # script_score cosine path.  Docs with a missing vector are never
    # kNN hits (ES missing-field semantics).
    vector_cols: tuple[str, ...] = ()

    # --- multi-field documents (ES mapped text fields — the reference's
    # free-form JSON sources carry nested {"title":…, "body":…} docs,
    # JsonConverterTests.kt:110-115).  When set, build_index tokenizes
    # EACH named input column as its own field: postings terms are
    # "{field}\x1f{token}" (the unit separator can never appear in a
    # token), per-field lengths land in fl_{field} docstore columns, and
    # block-min-dl is computed from the posting's OWN field length so
    # MaxScore bounds stay exact per field.  Query side: search(field=…)
    # scores one field; multi_match(fields=[…]) sums per-field BM25
    # (ES most_fields).  None = single-field legacy (unprefixed terms).
    text_fields: tuple[str, ...] | None = None

    # --- segment writer retry loop (reference: retry.interval=30s doubling
    # to max.retry.interval=300s, Actors.kt:236-259).  Local FS writes fail
    # rarely; keep short.
    write_retries: int = 3
    write_retry_delay_s: float = 0.1

    # --- tag filter (reference: value.converter.tag, BaseConverter.kt:52-61)
    tag: str | None = None
    # --- default index name + per-topic map (reference: index /
    # topic.index.map, ElasticsearchSinkTask.kt:301-310)
    index: str | None = None
    topic_index_map: dict[str, str] = field(default_factory=dict)


DEFAULT = EngineConfig()
