"""SQL-registered Python surface (SURVEY §2.8): the escape hatches are
registered in the session catalog and certified against their builtin
JVM twins — proving the mechanism while the registry's hot paths stay
Python-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from football_etl_spark.functions.registration import register_sql_surface
from football_etl_spark.io.loader import load_table

from .conftest import SF_SMOKE


def test_registered_scalar_matches_jvm_twin(spark):
    """quality_score_py (Arrow pandas_udf, registered for SQL) must
    reproduce functions/text.quality_score's JVM expression to 1e-9 on
    the real documents table."""
    from football_etl_spark.functions import text

    register_sql_surface(spark)
    load_table(spark, SF_SMOKE, "documents").createOrReplaceTempView("docs_reg")
    got = spark.sql(
        "SELECT doc_id, quality_score_py(text) AS q FROM docs_reg"
    )
    want = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", text.quality_score("text").alias("q")
    )
    j = got.alias("g").join(want.alias("w"), "doc_id")
    bad = j.filter(
        ~(
            (F.col("g.q").isNull() & F.col("w.q").isNull())
            | (F.abs(F.col("g.q") - F.col("w.q")) < 1e-9)
        )
    ).count()
    assert bad == 0


def test_registered_pandas_udaf_grouped_agg(spark):
    """weighted_mean_py used inside groupBy().agg() — the pandas UDAF
    path — must equal the exact SQL weighted mean per group."""
    register_sql_surface(spark)
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority",
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderkey") % 7 + 1).cast("double").alias("w"),
    )
    o.createOrReplaceTempView("orders_reg")
    got = {
        r["o_orderpriority"]: r["wm"]
        for r in spark.sql(
            "SELECT o_orderpriority, weighted_mean_py(v, w) AS wm "
            "FROM orders_reg GROUP BY o_orderpriority"
        ).collect()
    }
    want = {
        r["o_orderpriority"]: r["wm"]
        for r in o.groupBy("o_orderpriority")
        .agg((F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k


def test_registered_udtf_matches_posexplode_twin(spark):
    """tokenize_py via LATERAL must emit exactly the rows of the
    builtin posexplode(split(...)) twin — certifying the table-function
    mechanism end to end (the builtin stays the hot-path form)."""
    register_sql_surface(spark)
    load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("docs_udtf")
    got = spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM docs_udtf d, LATERAL tokenize_py(d.text) t"
    )
    want = spark.sql(
        "SELECT doc_id, posexplode(split(trim(text), '\\\\s+')) AS (pos, token) "
        "FROM docs_udtf WHERE length(trim(text)) > 0"
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w


def test_registration_idempotent_and_names(spark):
    names = register_sql_surface(spark)
    names2 = register_sql_surface(spark)  # re-register must not throw
    assert names == names2 == [
        "quality_score_py",
        "weighted_mean_py",
        "tokenize_py",
    ]
