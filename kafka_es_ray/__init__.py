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
