from __future__ import annotations

import pytest

from bigclam_apachespark_spark.session import get_spark
from bigclam_apachespark_spark.sources import edges_from_pairs

# FIXTURES.md §2: two 4-cliques + bridge, ids 0-7.
G1_PAIRS = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7),
    (3, 4),
]

# FIXTURES.md §3: path P4.
G2_PAIRS = [(0, 1), (1, 2), (2, 3)]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bigclam_tests")
    yield s


@pytest.fixture(scope="session")
def g1_edges(spark):
    return edges_from_pairs(spark, G1_PAIRS).cache()


@pytest.fixture(scope="session")
def g2_edges(spark):
    return edges_from_pairs(spark, G2_PAIRS).cache()
