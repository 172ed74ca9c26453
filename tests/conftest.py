import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(ray_session, tmp_path_factory):
    """A 400-battle corpus (tokens + ground truth) in a session tmp dir."""
    from stats_ray import synth

    out = str(tmp_path_factory.mktemp("corpus"))
    synth.build_corpus(out, 400)
    return out
