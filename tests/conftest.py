"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import pytest
import ray
from ray.data import DataContext


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    """Frozen tiny corpus (seed=42): 20 convs + a 120-turn mega conv."""
    from bank_statement_pdf_parser_ray.sources.corpus import gen_corpus

    return gen_corpus(20, seed=42, mega_turns=120)


@pytest.fixture(scope="session")
def tiny_expected(tiny_corpus):
    from bank_statement_pdf_parser_ray.oracle import oracle_extract

    return oracle_extract(tiny_corpus)
