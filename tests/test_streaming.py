"""Structured Streaming variants (SURVEY.md §2.9): availableNow
incremental catch-up over the parquet feed must agree with the batch
equivalent of the same windowed aggregation."""

from __future__ import annotations

import tempfile

from football_etl_spark.io.loader import load_table
from football_etl_spark.schemas import TESTDATA
from football_etl_spark.streaming import incremental

SF = "/root/testdata/sf0.001"


def test_available_now_matches_batch(spark):
    batch = load_table(spark, SF, "events")
    expected = {
        (str(r["win"]["start"]), r["event_type"]): (r["n"], r["total_value"])
        for r in incremental.windowed_event_counts(batch).collect()
    }

    # the nanosecond ts needs the same loader conversion; stream the
    # already-converted frame through a parquet round-trip
    with tempfile.TemporaryDirectory() as tmp:
        feed = f"{tmp}/feed"
        batch.write.parquet(feed)
        stream = incremental.read_event_stream(
            spark, feed, spark.read.parquet(feed).schema
        )
        agg = incremental.windowed_event_counts(stream)
        got_df = incremental.run_available_now(agg, "stream_counts_test", f"{tmp}/ckpt")
        got = {
            (str(r["win"]["start"]), r["event_type"]): (r["n"], r["total_value"])
            for r in got_df.collect()
        }
    assert got == expected
    assert len(got) > 0


def test_stateful_user_totals_matches_batch(spark):
    """applyInPandasWithState running totals: after an availableNow
    catch-up over the whole feed, the final per-user state must equal
    the batch groupBy. (With multiple micro-batches the memory sink in
    update mode holds one row per key per batch; the LAST row per key
    is the final state.)"""
    import pyspark.sql.functions as F

    batch = load_table(spark, SF, "events")
    expected = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("total"))
        .collect()
    }

    with tempfile.TemporaryDirectory() as tmp:
        feed = f"{tmp}/feed"
        # 2 files → 2 micro-batches: enough to prove cross-batch state
        # carry-over without 32 stateful-Python micro-batch spin-ups
        batch.coalesce(2).write.parquet(feed)
        stream = incremental.read_event_stream(
            spark, feed, spark.read.parquet(feed).schema
        )
        # NoTimeout: registered processing-time timers would keep the
        # availableNow query waiting for timer expiry before it can
        # terminate — TTL is exercised implicitly via the operator's
        # default path in production, not in this finite catch-up test.
        totals = incremental.stateful_user_totals(stream, state_ttl_minutes=None)
        q = (
            totals.writeStream.outputMode("update")
            .format("memory")
            .queryName("stateful_totals_test")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.table("stateful_totals_test").collect()

    final: dict[int, tuple[int, float]] = {}
    for r in rows:  # memory sink appends in batch order; later wins
        final[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    assert len(final) == len(expected)
    assert final == expected
