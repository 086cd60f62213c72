"""Cross-check every registry query against its DuckDB oracle — the
local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from football_etl_spark.plans.queries import REGISTRY

from .conftest import SF_ORACLE
from .oracle_harness import compare

ORACLE_QUERIES = [name for name, q in REGISTRY.items() if q.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_ORACLE)
    problems = compare(df, q.oracle, SF_ORACLE)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_all_queries_return_rows_or_valid_empty(spark):
    """Every query must at least execute and have a stable schema."""
    for name, q in REGISTRY.items():
        df = q.fn(spark, SF_ORACLE)
        assert df.columns, f"{name} produced no columns"
