from kafka_es_ray.functions.hashing import stable_hash64, route_partition  # noqa: F401
from kafka_es_ray.functions.tokenizer import Analyzer, get_analyzer  # noqa: F401
