import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session per pytest run (SURVEY §5: local hermetic harness)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_small():
    from kafka_es_ray.fixtures import make_pages

    return make_pages(1000)


@pytest.fixture(scope="session")
def queries_small():
    from kafka_es_ray.fixtures import make_queries

    return make_queries(20)
