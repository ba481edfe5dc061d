"""kafka_es_ray — a Ray-Data-native full-text indexing + BM25 query engine.

A from-scratch reimplementation of the *capabilities* of the reference
sink-connector pipeline (anti-social/kafka-es: Kafka -> Elasticsearch bulk
indexing) as an idiomatic Ray Data engine:

    Parquet corpus  ->  ray.data.Dataset pipeline  ->  Arrow-backed
    inverted-index segments  ->  BM25 (k1=1.2, b=0.75) top-k query engine

plus the large-scale training-data operators (dedup families, ANN search,
text analysis, multimodal plumbing) a 100 TB pipeline needs.

Reference citations in docstrings use file:line relative to /root/reference.
"""

__version__ = "0.1.0"

from kafka_es_ray.config import EngineConfig  # noqa: F401


def _register_pickle_by_value() -> None:
    """Ship this package's code by VALUE inside Ray task/actor pickles.

    Ray pickles classes/functions by module reference; if the driver's
    working directory (not this repo) decides the workers' sys.path, every
    actor-pool stage would die with ModuleNotFoundError and Ray would
    retry forever.  Registering the package for cloudpickle
    by-value serialization makes stages self-contained — the worker never
    needs kafka_es_ray importable.  Cost: a few KB per task submission."""
    import sys

    try:
        from ray import cloudpickle
    except Exception:  # pragma: no cover - ray not installed
        return
    # eager-import the stage-bearing submodules so they register too
    from kafka_es_ray import fixtures, metrics, runtime  # noqa: F401
    from kafka_es_ray.functions import bpe, codec, geo, hashing, mediacodec, protowire, textproc, tokenizer  # noqa: F401
    from kafka_es_ray.index import aliases, build, incremental, merge, reindex, segment, snapshot  # noqa: F401
    from kafka_es_ray.pipelines import (  # noqa: F401
        actions_flow,
        ann,
        dedup_ops,
        fulltext,
        multimodal,
        relational,
        sampling,
        sketches,
        text_ops,
        webtext,
    )
    from kafka_es_ray.query import apis, bm25, bruteforce, engine, parent_join, rank_eval, searcher, templates  # noqa: F401
    from kafka_es_ray.sources import corpus, parquet, stream, warc  # noqa: F401
    from kafka_es_ray.stages import actions, ingest, shuffle  # noqa: F401

    for name, mod in list(sys.modules.items()):
        if mod is not None and (name == "kafka_es_ray" or name.startswith("kafka_es_ray.")):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:  # pragma: no cover
                pass


_register_pickle_by_value()
