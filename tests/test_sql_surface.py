"""SURVEY §7.0 dual surface: every capability must also be reachable
through ``spark.sql`` — views registered by io.loader.register_views,
Spark-SQL text executed by the SAME session, results agreeing with the
DataFrame formulation of the same query."""

from __future__ import annotations

import pytest

from football_etl_spark.io.loader import register_views
from football_etl_spark.plans.queries import REGISTRY

from .conftest import SF_ORACLE

# Representative slice of the inventory: agg, window, join, set-op,
# grouping sets, reshape, text. (Spark SQL understands the ANSI dialect
# of these directly; engine-specific oracles cover the rest via DuckDB.)
SQL_TWINS = {
    "top_event_types": "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_revenue,
               COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "top3_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          FROM orders) WHERE rnk <= 3
    """,
    "users_without_purchase": """
        WITH b AS (SELECT MAX(ts) - INTERVAL 3 DAY AS cutoff FROM events)
        SELECT DISTINCT user_id FROM events
        WHERE user_id NOT IN (
          SELECT user_id FROM events, b
          WHERE event_type = 'purchase' AND ts >= b.cutoff
        )
    """,
}


@pytest.mark.parametrize("name", sorted(SQL_TWINS))
def test_sql_surface_agrees_with_dataframe(spark, name):
    register_views(spark, SF_ORACLE)
    got = {tuple(r) for r in spark.sql(SQL_TWINS[name]).collect()}
    want_df = REGISTRY[name].fn(spark, SF_ORACLE)
    # align column order to the SQL twin's schema
    sql_cols = spark.sql(SQL_TWINS[name]).columns
    want = {tuple(r) for r in want_df.select(*sql_cols).collect()}
    assert got == want
    # non-vacuous by construction (the retry-set entry is time-scoped
    # precisely so the dense feed yields real candidates)
    assert len(got) > 0
