"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session", autouse=True)
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


@pytest.fixture(scope="session")
def small_fixtures():
    """Small deterministic fixture tables (parquet dir)."""
    from snomed_ct_entity_linking_ray import fixtures

    spec = fixtures.FixtureSpec(seed=42, n_docs=60, n_concepts=120)
    return fixtures.fixture_dir(spec), spec


SF001 = "/root/testdata/sf0.001"
