"""Nested-JSON ingest flatten against the reference's own artifacts.

Exercises operators/ingest.py over (a) the REAL preserved raw dump
(/root/reference/sofascore_data/raw/api_response_2025-05-23.txt — a
debug capture whose JSON is truncated mid-record, so the correct
behavior is graceful zero-row degradation, matching the reference's
per-event try/except skip) and (b) a complete event reconstructed
with exactly the values visible in that dump + the reference's
committed flatten output (sofascore_data/daily/matches_2025-05-23.csv
row 1), asserted field-for-field against that committed row.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from football_etl_spark.operators.ingest import (
    explode_api_envelope,
    extract_dump_content,
    flatten_api_events,
)

RAW_DUMP = Path("/root/reference/sofascore_data/raw/api_response_2025-05-23.txt")
DAILY_CSV = Path("/root/reference/sofascore_data/daily/matches_2025-05-23.csv")

# The first event of the 2025-05-23 feed, reconstructed: every field
# below is either visible verbatim in the truncated raw dump
# (tournament/category/roundInfo/status/homeTeam) or taken from the
# reference's committed flatten of the same payload (id, awayTeam,
# startTimestamp — matches_2025-05-23.csv row 1).
COMPLETE_EVENT = (
    '{"tournament":{"name":"Stoiximan Super League, Relegation Round",'
    '"slug":"super-league-relegation-round",'
    '"category":{"id":67,"name":"Greece","slug":"greece"}},'
    '"roundInfo":{"round":10},'
    '"status":{"code":0,"description":"Not started","type":"notstarted"},'
    '"homeTeam":{"name":"APO Levadiakos","slug":"levadiakos"},'
    '"awayTeam":{"name":"NPS Volos","slug":"volos"},'
    '"id":13589460,"startTimestamp":1747924200}'
)


def test_extract_dump_content_real_file(spark):
    raw = RAW_DUMP.read_text()
    df = spark.createDataFrame([(raw,)], "raw string")
    content = df.select(extract_dump_content("raw").alias("c")).first()["c"]
    assert content is not None and content.startswith('{"events":[')


def test_truncated_payload_degrades_to_zero_rows(spark):
    """The preserved dump's JSON is cut off mid-record; the envelope
    parse must yield zero event rows, not an exception."""
    raw = RAW_DUMP.read_text()
    df = spark.createDataFrame([(raw,)], "raw string")
    events = explode_api_envelope(
        df.select(extract_dump_content("raw").alias("content")), "content"
    )
    assert events.count() == 0
    flat = flatten_api_events(events)
    assert flat.count() == 0


def test_flatten_matches_reference_committed_output(spark):
    """Flatten the reconstructed first event of 2025-05-23 and compare
    field-for-field with the reference's committed daily CSV row."""
    env = '{"events":[' + COMPLETE_EVENT + "]}"
    df = spark.createDataFrame([(env,)], "content string")
    events = explode_api_envelope(df, "content")
    # the reference renders start_time with LOCAL fromtimestamp
    # (daily_match_scraper.py:486-492); its committed CSV was produced
    # in CEST (UTC+2) — 1747924200 → 16:30
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Europe/Paris")
        got = flatten_api_events(events, source="api").first().asDict()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)

    expected = (
        spark.read.option("header", True)
        .csv(str(DAILY_CSV))
        .filter(F.col("id") == "13589460")
        .first()
        .asDict()
    )
    assert got["id"] == expected["id"] == "13589460"
    assert got["home_team"] == expected["home_team"] == "APO Levadiakos"
    assert got["away_team"] == expected["away_team"] == "NPS Volos"
    assert got["league"] == expected["league"]
    assert got["country"] == expected["country"] == "Greece"
    assert str(got["start_timestamp"]) == expected["start_timestamp"]
    assert got["start_time"] == expected["start_time"] == "16:30"
    assert got["status"] == expected["status"] == "Not started"
    assert got["venue"] == expected["venue"]  # both null (absent upstream)
    assert got["round"] == expected["round"] == "10"
    assert got["source"] == expected["source"] == "api"


@pytest.mark.parametrize(
    "event,expect",
    [
        # home/away fallback + top-level category + bare-string status
        (
            '{"id":1,"home":{"name":"A"},"away":{"name":"B"},'
            '"category":{"name":"Iceland"},"status":"Postponed"}',
            {
                "league": "Iceland",
                "country": "Iceland",
                "status": "Postponed",
                "start_time": "Unknown",
                "venue": None,
            },
        ),
        # league-object fallback, bare-string venue, defaults
        (
            '{"id":2,"homeTeam":{"name":"A"},"awayTeam":{"name":"B"},'
            '"league":{"name":"Cup"},"venue":"Old Arena"}',
            {
                "league": "Cup",
                "country": "International",
                "status": "Unknown",
                "venue": "Old Arena",
            },
        ),
        # no league info anywhere → Unknown League
        (
            '{"homeTeam":{"name":"A"},"awayTeam":{"name":"B"}}',
            {"id": "unknown", "league": "Unknown League", "country": "International"},
        ),
    ],
)
def test_candidate_path_fallbacks(spark, event, expect):
    df = spark.createDataFrame([(event,)], "event_json string")
    row = flatten_api_events(df).first().asDict()
    for k, v in expect.items():
        assert row[k] == v, (k, row)


def test_required_fields_drop(spark):
    rows = [
        ('{"id":1,"homeTeam":{"name":"A"}}',),          # away missing
        ('{"id":2,"awayTeam":{"name":"B"}}',),          # home missing
        ('{"id":3,"homeTeam":{"name":"A"},"awayTeam":{"name":"B"}}',),
    ]
    df = spark.createDataFrame(rows, "event_json string")
    out = flatten_api_events(df)
    assert [r["id"] for r in out.collect()] == ["3"]


def test_raw_dump_datasource_end_to_end(spark):
    """The custom Python DataSource must expose the reference's raw
    capture directory as a partitioned relation (one partition per
    daily file), and feed the existing peel→explode→flatten chain
    unchanged — the acquisition layer as a first-class Spark source."""
    from football_etl_spark.io.dump_source import RawDumpDataSource
    from football_etl_spark.operators import ingest

    spark.dataSource.register(RawDumpDataSource)
    raw_dir = str(RAW_DUMP.parent)
    n_files = len([f for f in os.listdir(raw_dir)
                   if f.startswith("api_response_") and f.endswith(".txt")])
    df = (
        spark.read.format("raw_api_dumps")
        .option("path", raw_dir)
        .load()
    )
    rows = df.collect()
    assert len(rows) == n_files  # one row per daily capture
    assert df.rdd.getNumPartitions() == n_files  # one partition per file
    dates = [r["capture_date"] for r in rows]
    assert all(d and len(d) == 10 for d in dates)
    # the committed captures are TRUNCATED debug dumps — the chain
    # must degrade to zero rows, never raise (the graceful contract)
    one = df.filter(df.capture_date == "2025-05-23").select(
        ingest.extract_dump_content("raw").alias("content")
    )
    events = ingest.explode_api_envelope(one, "content")
    assert ingest.flatten_api_events(events, "event_json").count() == 0


def test_raw_dump_datasource_well_formed_capture(spark, tmp_path):
    """A well-formed capture read through the custom source flattens
    to the reference's committed row — the full acquisition chain
    (source → peel → explode → flatten) on one relation."""
    from football_etl_spark.io.dump_source import RawDumpDataSource
    from football_etl_spark.operators import ingest

    spark.dataSource.register(RawDumpDataSource)
    dump = (
        "Status: 200\nHeaders: {'Content-Type': 'application/json'}\n"
        'Content: {"events":[' + COMPLETE_EVENT + "]}"
    )
    (tmp_path / "api_response_2025-01-01.txt").write_text(dump)
    df = (
        spark.read.format("raw_api_dumps")
        .option("path", str(tmp_path))
        .load()
        .select(
            "capture_date", ingest.extract_dump_content("raw").alias("content")
        )
    )
    flat = ingest.flatten_api_events(
        ingest.explode_api_envelope(df, "content"), "event_json"
    )
    row = flat.first().asDict()
    assert row["home_team"] == "APO Levadiakos"
    assert row["away_team"] == "NPS Volos"
    assert row["country"] == "Greece"
