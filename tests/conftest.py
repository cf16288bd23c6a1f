import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level=logging.ERROR,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus_dir():
    from session_graph_ray.fixtures import ensure_corpus

    return ensure_corpus("tiny")


@pytest.fixture(scope="session")
def small_corpus_dir():
    from session_graph_ray.fixtures import ensure_corpus

    return ensure_corpus("small")
