"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import logging

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # manifest-row stages legitimately emit a different schema than their
    # data-row predecessors; Ray logs a WARNING per bundle otherwise
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()
