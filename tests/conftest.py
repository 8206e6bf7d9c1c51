import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

FIXTURE_CACHE = os.path.join(REPO, ".fixtures")


@pytest.fixture(scope="session")
def spark():
    from frontier_engine.session import get_spark

    s = get_spark("local[4]", app="frontier-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_fixture_dir():
    """n=2000 (sf0.001-equivalent) crawl fixture, cached under .fixtures/."""
    from frontier_engine.fixtures import ensure_fixtures

    return ensure_fixtures(FIXTURE_CACHE, 2000)
