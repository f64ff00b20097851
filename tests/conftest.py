from __future__ import annotations

import pytest

from graphdb_neo4j_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
