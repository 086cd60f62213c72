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
