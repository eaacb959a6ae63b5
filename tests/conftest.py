import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


def _foreign_ray_clusters() -> bool:
    """True when raylets beyond this session's own cluster are running.

    ``Dataset.join`` reserves aggregator CPUs up front; on a box where a
    CONCURRENT Ray cluster is consuming the same physical CPUs the
    reservation can never be satisfied and the join wedges (observed
    only under cross-cluster contention, never solo). Join-path tests
    are correctness-critical but not worth a suite hang — they skip
    under contention and the solo run (the driver's) enforces them."""
    import subprocess

    try:
        out = subprocess.run(
            ["pgrep", "-c", "raylet"], capture_output=True, text=True, timeout=10
        )
        return int(out.stdout.strip() or 0) > 1
    except Exception:
        return False


requires_solo_ray = pytest.mark.skipif(
    _foreign_ray_clusters(),
    reason="concurrent Ray cluster on this box can starve Dataset.join "
    "aggregator CPU reservations (wedge); run solo to exercise",
)
