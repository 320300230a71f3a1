import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grawler import synthgen  # noqa: E402
from grawler.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("grawler-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_web():
    return synthgen.generate(seed=42, n_pages=120, shape="mixed")
