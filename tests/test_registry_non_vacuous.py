"""Registry-wide vacuity gate — the permanent form of the round-7
audit that caught two silently-vacuous green entries
(purchase_asof_login matched a nonexistent event type so every as-of
match column was NULL; users_without_purchase was structurally empty).
An oracle can only prove Spark == DuckDB; it cannot prove the query
computes anything. This gate adds the missing half: every registered
entry, executed at the smallest test SF, must

  1. return at least one row, and
  2. have no column that is NULL in EVERY row,

unless the entry is explicitly allowlisted here WITH a reason. Both
r7 finds would have tripped it: purchase_asof_login's joined columns
were 100% NULL (rule 2), users_without_purchase returned 0 rows
(rule 1).

The allowlist is deliberately a visible dict in this file, not a doc
marker — adding an entry to it is a reviewable act.
"""

from __future__ import annotations

import pytest

from football_etl_spark.plans.queries import REGISTRY, STAGED

from .conftest import SF_SMOKE

# name -> reason a 0-row result is legitimate at sf0.001.
# (Empty today: every registered entry returns rows at the smallest SF;
# zorder_sink_pruned_read's rectangle was re-centered in r8 precisely
# so it could come OFF this list.)
EMPTY_OK: dict[str, str] = {}

# (name, column) -> reason an all-NULL column is legitimate at sf0.001.
ALL_NULL_OK: dict[tuple[str, str], str] = {}

_ALL = sorted(set(REGISTRY) | set(STAGED))


@pytest.mark.parametrize("name", _ALL)
def test_registry_non_vacuous(spark, name):
    q = REGISTRY.get(name) or STAGED[name]
    rows = q.fn(spark, SF_SMOKE).collect()
    if not rows:
        assert name in EMPTY_OK, (
            f"{name} returned 0 rows at {SF_SMOKE} and is not "
            "allowlisted — a 0-row result is oracle-green even when "
            "the query is structurally empty (the r7 "
            "users_without_purchase failure mode)"
        )
        return
    for col in rows[0].asDict():
        if all(r[col] is None for r in rows):
            assert (name, col) in ALL_NULL_OK, (
                f"{name}.{col} is NULL in every row at {SF_SMOKE} — "
                "an all-NULL joined column is oracle-green even when "
                "the join matches nothing (the r7 purchase_asof_login "
                "failure mode)"
            )
