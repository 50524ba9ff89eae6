import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Deterministic 400-doc synthetic corpus table (seed=42)."""
    from onestools_eventlog_ray import synth
    return synth.generate_corpus(400, seed=42)


@pytest.fixture(scope="session")
def small_corpus_dir(tmp_path_factory, small_corpus):
    import pyarrow.parquet as pq
    d = tmp_path_factory.mktemp("corpus")
    pq.write_table(small_corpus, str(d / "part-00000.parquet"))
    return str(d)
