from kafka_es_ray.index.build import build_index  # noqa: F401
from kafka_es_ray.index.segment import Segment, read_manifest  # noqa: F401
