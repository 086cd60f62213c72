"""CSV/JSON interchange IO round-trips (SURVEY §2.1 rows 1-2, 4-5).

The reference's primary interchange formats
(processors/data_processor.py:119-120 CSV sinks,
scrapers/team_scraper.py:89-150 JSON cache) exercised through the
engine's schema-declared readers/writers: values must survive a full
write→read cycle, column order must be fixed, extras dropped.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from football_etl_spark.io.loader import load_table, read_csv, read_json
from football_etl_spark.io.sinks import write_csv, write_json
from football_etl_spark.schemas import FIXTURES

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, key):
    return sorted((tuple(r) for r in df.collect()), key=lambda t: t[: len(key)])


def test_csv_round_trip_orders(spark):
    """TESTDATA orders through CSV: schema-declared read (no
    inference) reproduces every value including timestamps."""
    from football_etl_spark.schemas import TESTDATA

    orders = load_table(spark, SF, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        write_csv(orders, f"{tmp}/orders_csv")
        back = read_csv(spark, f"{tmp}/orders_csv", "orders")
        # the read-back carries the DECLARED contract (the parquet
        # original stores o_orderdate as TIMESTAMP_NTZ; values agree)
        assert back.schema == TESTDATA["orders"]
        assert _sorted_rows(back, ["o_orderkey"]) == _sorted_rows(orders, ["o_orderkey"])


def test_csv_fixed_column_order_and_extras_dropped(spark):
    """write_csv with a column projection = the reference's
    csv.DictWriter(extrasaction='ignore') fixed-field contract
    (daily_match_scraper.py:548)."""
    df = spark.createDataFrame(
        [(1, "a", "extra"), (2, "b", "extra")], "k int, v string, junk string"
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_csv(df, f"{tmp}/out", columns=("v", "k"))
        header = (
            spark.read.text(f"{tmp}/out").filter(F.col("value").startswith("v,"))
        )
        assert header.count() > 0  # header row is exactly 'v,k'
        back = spark.read.option("header", True).csv(f"{tmp}/out")
        assert back.columns == ["v", "k"]


def test_json_round_trip_events(spark):
    """TESTDATA events through JSON records — mirrors the per-team
    JSON cache (team_scraper.py:89-126); nulls and doubles survive."""
    events = load_table(spark, SF, "events")
    with tempfile.TemporaryDirectory() as tmp:
        write_json(events, f"{tmp}/events_json")
        back = read_json(spark, f"{tmp}/events_json", "events")
        assert back.schema == events.schema
        assert back.count() == events.count()
        a = _sorted_rows(back.drop("ts"), ["event_id"])
        b = _sorted_rows(events.drop("ts"), ["event_id"])
        assert a == b
        # timestamps compare on the epoch to dodge JSON tz rendering
        ta = _sorted_rows(back.select("event_id", F.unix_micros("ts")), ["event_id"])
        tb = _sorted_rows(events.select("event_id", F.unix_micros("ts")), ["event_id"])
        assert ta == tb


def test_csv_round_trip_reference_fixtures_schema(spark):
    """Reference-domain FIXTURES schema through CSV: the committed raw
    fixtures file → write → schema-declared re-read is lossless."""
    raw = read_csv(
        spark, "/root/reference/data/raw/raw_fixtures_20250510_20250524.csv", FIXTURES
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_csv(raw, f"{tmp}/fx")
        back = read_csv(spark, f"{tmp}/fx", FIXTURES)
        assert back.schema == raw.schema
        assert _sorted_rows(back, ["match_id", "date"]) == _sorted_rows(
            raw, ["match_id", "date"]
        )


def test_write_range_sorted_prunes_and_sorts(spark, tmp_path):
    from football_etl_spark.io import sinks

    df = spark.range(0, 10000).selectExpr("id", "id % 7 AS v")
    out = str(tmp_path / "ranged")
    sinks.write_range_sorted(df, out, ["id"], n_partitions=8)
    back = spark.read.parquet(out)
    assert back.count() == 10000
    # range clustering: each file's id span is disjoint → a narrow
    # id filter touches 1 file (check via per-file min/max)
    import pyspark.sql.functions as F
    spans = (
        back.select("id", F.input_file_name().alias("f"))
        .groupBy("f").agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    assert len(spans) == 8
    ordered = sorted([(r["lo"], r["hi"]) for r in spans])
    for (lo1, hi1), (lo2, hi2) in zip(ordered, ordered[1:]):
        assert hi1 < lo2  # disjoint ranges → footer-stat pruning works


def test_write_parquet_observed_collects_metrics_in_one_pass(spark, tmp_path):
    import pyspark.sql.functions as F
    from football_etl_spark.io import sinks

    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 7.5)], "id long, v double"
    )
    out = str(tmp_path / "observed")
    got = sinks.write_parquet_observed(
        df,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.sum(F.col("v").isNull().cast("long")),
            "sum_v": F.sum("v"),
        },
    )
    assert got == {"n_rows": 3, "n_null_v": 1, "sum_v": 12.5}
    assert spark.read.parquet(out).count() == 3


def test_load_table_ntz_normalization_is_session_tz_independent(spark, tmp_path):
    """Some driver testdata generations store events.ts as plain µs
    TIMESTAMP_NTZ (no nanos). The loader must map the wall-clock to
    the SAME instant regardless of spark.sql.session.timeZone — the
    driver contract runs a stock session in the machine timezone, and
    a cast('timestamp') there would silently shift ts relative to the
    nanos branch and the DuckDB oracle."""
    import duckdb
    import pyspark.sql.functions as F

    from football_etl_spark.io.loader import load_table

    d = str(tmp_path)
    duckdb.sql(
        "COPY (SELECT 1::BIGINT AS event_id, "
        "TIMESTAMP '2024-03-01 12:34:56.789' AS ts) "
        f"TO '{d}/events.parquet'"
    )
    expect = duckdb.sql(
        "SELECT EPOCH_US(TIMESTAMP '2024-03-01 12:34:56.789')"
    ).fetchone()[0]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = (
                load_table(spark, d, "events")
                .select(F.unix_micros("ts").alias("us"))
                .collect()[0]["us"]
            )
            assert got == expect, f"ts shifted under session tz {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_ship_package_zips_sources_and_is_idempotent(spark):
    """ship_package must (1) produce a zip whose member paths start
    with the package name (so the archive lands importable on worker
    sys.path), (2) include the Python DataSource module that pickles
    by reference, and (3) be a cheap no-op on repeat calls for the
    same session (cached per applicationId)."""
    import os
    import tempfile
    import zipfile

    from football_etl_spark.session import _SHIPPED, ship_package

    ship_package(spark)
    zp = os.path.join(tempfile.gettempdir(), f"fes_pkg_{os.getpid()}.zip")
    assert os.path.exists(zp)
    with zipfile.ZipFile(zp) as z:
        names = z.namelist()
    assert all(n.startswith("football_etl_spark/") for n in names)
    assert "football_etl_spark/io/dump_source.py" in names
    assert "football_etl_spark/session.py" in names
    app = spark.sparkContext.applicationId
    assert app in _SHIPPED
    mtime = os.path.getmtime(zp)
    ship_package(spark)  # cached — must not rebuild the archive
    assert os.path.getmtime(zp) == mtime
