from __future__ import annotations

import pytest

from graph_embeddings_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def world():
    from graph_embeddings_spark.corpus import build_world

    return build_world(seed=42, n_entities=120)
