"""Every registered query with an oracle must match DuckDB at sf0.001.

This is the local pre-flight for the driver's t2 gate (which runs the
same comparison at sf0.01 with a value hash).
"""

from __future__ import annotations

import pytest

import couchwarehouse_spark.plans.all  # noqa: F401
from couchwarehouse_spark.plans import ORACLES, QUERIES

from .conftest import SF_SMOKE
from .oracle_utils import assert_frames_match


def _oracle_names():
    return sorted(n for n in QUERIES if n in ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    ddf = duck.sql(ORACLES[name]).df()
    assert_frames_match(sdf, ddf, name)


def test_all_queries_run_and_entry(spark):
    import __spark_entry__ as e

    assert set(e.oracle_sql()) <= set(e.queries())
    out = e.entry(spark)
    assert out.count() > 0
