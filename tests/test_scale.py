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


PARTITION_SENSITIVE_CANDIDATES = [
    # every entry whose algorithm touches partition layout: global
    # rank, exactly-k sampling, hash splits, rate mixtures, Arrow
    # kernels with per-batch state, per-cell grouped-map dedup
    "epoch_shuffle_positions",
    "reservoir_sample_docs",
    "stratified_sample_docs",
    "deterministic_split_stats",
    "hash_sampled_docs",
    "lang_rate_mixture",
    "kmeans_embedding_clusters",
    "semantic_dedup_docs",
]


def test_results_invariant_to_shuffle_partition_count(spark):
    """Distributed-correctness property: results must not depend on
    the reducer count — on a cluster the same query runs at 32 or
    2000 shuffle partitions and a result that shifts with layout is a
    latent at-scale bug. Re-executes each layout-touching entry at 3
    and 17 shuffle partitions (physical planning re-reads the conf
    per action) and requires identical row multisets. (A stronger
    two-JVM variant — different core counts — was probed manually and
    also holds; the conf flip is the CI-friendly form.)"""
    from football_etl_spark.plans.queries import REGISTRY

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in PARTITION_SENSITIVE_CANDIDATES:
            df = REGISTRY[name].fn(spark, SF_SMOKE)
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            r_low = sorted(map(repr, (tuple(r) for r in df.collect())))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            r_high = sorted(map(repr, (tuple(r) for r in df.collect())))
            assert r_low == r_high, f"{name} depends on partition count"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_runtime_bloom_filter_fires_on_selective_fact_fact_join(spark):
    """enable_runtime_bloom_filters: on a big-big join whose one side
    carries a selective filter (the orders⋈lineitem shape above the
    broadcast threshold), Catalyst must inject a bloom-filter probe
    into the other side's subtree — row-level pre-shuffle pruning."""
    from football_etl_spark.operators.scale import enable_runtime_bloom_filters

    from .conftest import SF_SMOKE

    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        enable_runtime_bloom_filters(spark, application_side_min="0")
        # force the shuffle-join regime the helper targets (the test
        # corpus is broadcast-sized; a cluster fact table is not)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        from football_etl_spark.io.loader import load_table

        o = load_table(spark, SF_SMOKE, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        li = load_table(spark, SF_SMOKE, "lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


STAGED_PARTITION_SENSITIVE = [
    # staged entries whose plans involve Arrow kernels, driver-side
    # training state, or segment-key fan-out — same invariance bar
    # pre-promotion
    "pq_adc_ann_topk",
    "fuzzy_name_matches",
    "robust_outlier_flags",
    "multi_band_scan_counts",
    # round-6 staged wave: data-derived sampling rates, decimal-summed
    # LM scores, interval-join fan-out + rank, per-group NTILE bins
    "temperature_resampled_corpus",
    "unigram_logprob_scores",
    "attribution_first_touch",
    "equi_depth_histogram",
    # round-7 staged wave: per-segment NTILE codes, windowed segment
    # ids, iterative join-agg rounds, co-moment aggregates
    "rfm_segments",
    "running_balance_resets",
    "pagerank_trade_graph",
    "segment_spend_correlation",
    "ewma_daily_revenue",
]


def test_staged_results_invariant_to_shuffle_partition_count(spark):
    """The registry's partition-count invariance bar applied to the
    staged tier before promotion."""
    from football_etl_spark.plans.queries import REGISTRY, STAGED

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in STAGED_PARTITION_SENSITIVE:
            df = (REGISTRY.get(name) or STAGED[name]).fn(spark, SF_SMOKE)
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            r_low = sorted(map(repr, (tuple(r) for r in df.collect())))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            r_high = sorted(map(repr, (tuple(r) for r in df.collect())))
            assert r_low == r_high, f"{name} depends on partition count"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_grouped_map_width_survives_aqe(spark):
    """AQE-collapse gate (VERDICT r12 ask #7): r12 found AQE's
    byte-based partition coalescing collapsing the many-tiny-groups
    grouped-map exchange to ~1 partition — ~15k Python group calls ran
    SERIALLY (7.0 s vs 1.3 s at sf0.1) because coalescing sees bytes,
    not per-group Python overhead. grouped_zscore's width pin
    (explicit repartition on the group keys) prevents it; this gate
    runs a many-tiny-groups grouped map UNDER ENGINE DEFAULTS (AQE on)
    and asserts the grouped-map stage actually executed on more than
    one partition, so the collapse class cannot regress silently."""
    from football_etl_spark.operators import windows

    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        df = spark.range(4000).select(
            F.col("id").alias("k"), (F.col("id") % 7).cast("double").alias("v")
        )
        out = windows.grouped_zscore(df, ["k"], "v")
        # spark_partition_id() is evaluated in the grouped-map output
        # stage (narrow), before the distinct's own exchange — it
        # reads the width the grouped map really ran at.
        n_parts = out.select(F.spark_partition_id().alias("pid")).distinct().count()
        assert n_parts > 1, (
            f"grouped-map stage collapsed to {n_parts} partition(s) under AQE"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
