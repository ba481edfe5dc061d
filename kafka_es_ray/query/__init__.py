from kafka_es_ray.query.bm25 import bm25_idf, bm25_tf_part, round6  # noqa: F401
from kafka_es_ray.query.engine import IndexSearcher, QueryStage, run_queries  # noqa: F401
