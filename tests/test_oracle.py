"""Cross-check every registry query against its DuckDB oracle — the
local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from football_etl_spark.plans.queries import REGISTRY, STAGED

from .conftest import SF_ORACLE
from .oracle_harness import compare

# one body serves both tiers: staged entries ride the identical gate
# as registered ones, so promotion is a decorator rename, not a
# re-verification effort
ORACLE_CASES = [
    ("registry", name) for name, q in REGISTRY.items() if q.oracle is not None
] + [("staged", name) for name, q in STAGED.items() if q.oracle is not None]


@pytest.mark.parametrize(("tier", "name"), ORACLE_CASES)
def test_query_matches_oracle(spark, tier, name):
    q = (REGISTRY if tier == "registry" else STAGED)[name]
    df = q.fn(spark, SF_ORACLE)
    problems = compare(df, q.oracle, SF_ORACLE)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_staged_names_disjoint_from_registry():
    assert not set(STAGED) & set(REGISTRY)


def test_all_queries_return_rows_or_valid_empty(spark):
    """Every query must at least execute and have a stable schema."""
    for name, q in REGISTRY.items():
        df = q.fn(spark, SF_ORACLE)
        assert df.columns, f"{name} produced no columns"


def test_norm_canonicalizes_signed_zero():
    """-0.0 and 0.0 are equal values whose reprs differ — _norm must
    collapse them so the repr-keyed row sort cannot misalign rows
    (engines legitimately differ on the sign of a rounded zero)."""
    from .oracle_harness import _norm

    assert repr(_norm(-0.0)) == repr(_norm(0.0)) == "0.0"
    assert _norm(-1.5) == -1.5 and _norm(float("nan")) == "NaN"
