from kafka_es_ray.sources.parquet import read_table  # noqa: F401
