"""Skew (salting) and co-location (bucketing) — the remaining two
legs of the 100 TB partitioning story alongside broadcast + AQE."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from football_etl_spark.io.loader import load_table
from football_etl_spark.io.sinks import write_bucketed
from football_etl_spark.operators.scale import salted_join

from .conftest import SF_SMOKE
from .test_plans import plan_str


def test_salted_join_matches_plain_join(spark):
    """Salting must change placement only, never results."""
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_mktsegment"
    )
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"), cust, ["c_custkey"], n_salts=4
    ).select("o_orderkey", "c_mktsegment")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must fan out over >1 (key, salt) shuffle key —
    the whole point of salting. (Partition-id placement is not
    asserted: local-mode AQE/broadcast heuristics legitimately merge
    tiny test partitions; at scale the shuffle keys ARE the spread.)"""
    hot = spark.range(2000).select(F.lit(1).alias("k"), F.col("id"))
    salt = F.floor(F.rand(42) * 4).cast("int")
    n_shuffle_keys = (
        hot.withColumn("__salt", salt).select("k", "__salt").distinct().count()
    )
    assert n_shuffle_keys > 1
    # and the small side replicates once per salt so no pair is lost
    from football_etl_spark.operators.scale import explode_salts

    dim = spark.createDataFrame([(1, "x")], ["k", "v"])
    assert explode_salts(dim, 4).count() == 4


@pytest.fixture()
def bucket_dir():
    d = tempfile.mkdtemp(prefix="bucketed_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_needs_no_shuffle(spark, bucket_dir):
    """Two tables bucketed on the join key must sort-merge join with
    ZERO Exchange nodes — the write-time co-location contract."""
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    try:
        write_bucketed(
            orders.withColumnRenamed("o_custkey", "custkey"),
            "b_orders", ["custkey"], 4, f"{bucket_dir}/o",
        )
        write_bucketed(
            cust.withColumnRenamed("c_custkey", "custkey"),
            "b_cust", ["custkey"], 4, f"{bucket_dir}/c",
        )
        bo, bc = spark.table("b_orders"), spark.table("b_cust")
        # disable auto-broadcast so the test exercises the bucketed
        # sort-merge path (the small side would otherwise broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = plan_str(bo.join(bc, "custkey"), "simple")
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")
