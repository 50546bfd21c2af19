import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (per round instructions)."""
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # the executor's 50% per-operator reservation starves long map/shuffle
    # chains at num_cpus=4 (measured: dataset-mode pagerank 1.6 s/iter
    # without reservation vs ~30 s/iter with) — same setting as bench.py
    ctx.op_resource_reservation_enabled = False
    yield
    ray.shutdown()


SF_DIR = "/root/testdata/sf0.001"
