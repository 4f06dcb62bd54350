"""Shared pytest fixtures: one SparkSession per parallelism level.

Parity tests run at local[8] AND local[32] (the sandbox evidence for the
N vs 4N cluster-size criterion): sessions are created sequentially — the
active one is stopped before a different-core session starts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from crawler_spark.session import get_spark

_CURRENT: dict[str, int | None] = {"cores": None}


def spark_at(cores: int) -> SparkSession:
    """Session with `cores` local threads; recreates the JVM context only
    when the level changes (sequential two-level parity runs)."""
    if _CURRENT["cores"] != cores:
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        _CURRENT["cores"] = cores
    return get_spark(cores=cores, shuffle_partitions=max(cores, 8))


@pytest.fixture()
def spark() -> SparkSession:
    # function-scoped: parity tests switch levels mid-suite, so re-assert 32
    return spark_at(32)
