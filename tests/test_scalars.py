"""Unit tests for the scalar expression library (SURVEY.md §2.7) on
tiny literal DataFrames — each mirrors a reference helper's contract."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from football_etl_spark.functions import scalars


def _one(spark, expr, **lits):
    row = spark.createDataFrame([tuple(lits.values())], list(lits.keys()))
    return row.select(expr.alias("v")).collect()[0]["v"]


def test_normalize_team_name(spark):
    assert _one(spark, scalars.normalize_team_name("t"), t="  Fulham FC ") == "Fulham"
    assert _one(spark, scalars.normalize_team_name("t"), t="Man United") == "Manchester United"
    assert _one(spark, scalars.normalize_team_name("t"), t="Arsenal") == "Arsenal"
    # suffix strip happens before mapping, like the reference
    assert _one(spark, scalars.normalize_team_name("t"), t="Spurs FC") == "Tottenham Hotspur"


def test_normalize_date_formats(spark):
    for raw in [
        "2025-05-10",
        "10/05/2025",
        "10.05.2025",
        "May 10, 2025",
        # weekday-prefixed forms (reference utils/data_utils.py:44-57):
        # Spark forbids weekday letters in parse patterns, so these go
        # through the prefix strip
        "Saturday, May 10, 2025",
        "Saturday, 10/05/2025",
    ]:
        assert _one(spark, scalars.normalize_date("d"), d=raw) == datetime.date(2025, 5, 10)
    # month-led comma forms must NOT be mistaken for weekday prefixes
    assert _one(spark, scalars.normalize_date("d"), d="May 10, 2025") == datetime.date(2025, 5, 10)
    assert _one(spark, scalars.normalize_date("d"), d="not a date") is None


def test_clean_number(spark):
    assert _one(spark, scalars.clean_number("x"), x="55%") == 55.0
    assert _one(spark, scalars.clean_number("x"), x=" 1,234.5 ") == 1234.5
    assert _one(spark, scalars.clean_number("x"), x="-3.2xg") == -3.2
    assert _one(spark, scalars.clean_number("x"), x="abc") is None


def test_match_ids(spark):
    d = datetime.date(2024, 8, 17)
    got = _one(spark, scalars.generate_match_id("d", "h", "a"), d=d, h="Arsenal", a="Wolverhampton Wanderers")
    assert got == "20240817_arsenal_wolverhamptonwanderers"
    sym1 = _one(spark, scalars.symmetric_match_id("d", "h", "a"), d=d, h="B Team", a="A Team")
    sym2 = _one(spark, scalars.symmetric_match_id("d", "h", "a"), d=d, h="A Team", a="B Team")
    assert sym1 == sym2 == "20240817_ateam_bteam"
    cond = _one(
        spark,
        scalars.conditional_match_id("d", "t", "o", "ih"),
        d=d, t="Everton", o="Fulham", ih=0,
    )
    assert cond == "20240817_fulham_everton"


def test_standardize_result_domain(spark):
    cases = {"Win": "W", "w": "W", "1": "W", "Draw": "D", "0.5": "D",
             "loss": "L", "0": "L", "??": "U"}
    for raw, want in cases.items():
        assert _one(spark, scalars.standardize_result("r"), r=raw) == want


def test_result_points_and_ratios(spark):
    assert _one(spark, scalars.result_to_points("r"), r="W") == 1.0
    assert _one(spark, scalars.result_to_points("r"), r="D") == 0.5
    assert _one(spark, scalars.safe_ratio("a", "b"), a=3.0, b=0.0) == 0.0
    assert _one(spark, scalars.safe_ratio("a", "b"), a=3.0, b=4.0) == 0.75
    df = spark.createDataFrame([(None, 0.7)], "h double, a double")
    assert df.select(scalars.match_quality("h", "a").alias("v")).collect()[0]["v"] == 0.6


def test_kickoff_and_season(spark):
    assert _one(spark, scalars.clean_kickoff_time("k"), k="2025-05-10 15:45") == "15:45"
    assert _one(spark, scalars.clean_kickoff_time("k"), k="Unknown") is None
    assert _one(spark, scalars.derive_season("d"), d=datetime.date(2024, 8, 17)) == "2024-2025"
    assert _one(spark, scalars.derive_season("d"), d=datetime.date(2024, 5, 1)) == "2023-2024"


def test_epoch_and_score_split(spark):
    # engine pins UTC (the reference used machine-local time)
    assert _one(spark, scalars.epoch_to_hhmm("t"), t=1746884700) == "13:45"
    gf, ga = scalars.split_score("s", "v")
    df = spark.createDataFrame([("2-1", "Home"), ("2-1", "Away")], ["s", "v"])
    rows = df.select(gf.alias("gf"), ga.alias("ga")).collect()
    assert (rows[0]["gf"], rows[0]["ga"]) == (2.0, 1.0)
    assert (rows[1]["gf"], rows[1]["ga"]) == (1.0, 2.0)
    assert _one(spark, scalars.is_home_flag("v"), v="Home") == 1


def test_normalize_date_separator_gate_equivalence(spark):
    """The r12 separator gate (skip a format whose literal separator is
    absent) must be output-identical to the ungated coalesce on every
    input class: each declared format rendered for real dates, the
    ambiguous dd/MM vs MM/dd case (order decides), weekday prefixes,
    dirty strings, mixed separators, empties and NULL."""
    fixtures = [
        "2025-05-10", "10/05/2025", "05/10/2025", "10-05-2025",
        "2025/05/10", "10.05.2025", "2025.05.10", "10 May 2025",
        "May 10 2025", "May 10, 2025", "March 03, 2025",
        "Saturday, May 10, 2025", "Sat, 10/05/2025",
        "03/04/2025",          # ambiguous: dd/MM wins by coalesce order
        "13/04/2025",          # only dd/MM can parse
        "04/13/2025",          # only MM/dd can parse
        "2025-5-1", "1/2/25", "20250510", "not a date", "",
        "   ", "10//05//2025", "May  10, 2025", "2025.05-10",
        "10 05 2025", ",,,", "-", ".", "/", None,
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in fixtures], "raw string")
    gated = scalars.normalize_date("raw")
    stripped = F.regexp_replace(F.trim(F.col("raw")), scalars._WEEKDAY_PREFIX_RE, "")
    ungated = F.coalesce(
        *[F.try_to_date(stripped, f) for f in scalars.DATE_FORMATS]
    )
    rows = df.select(gated.alias("g"), ungated.alias("u")).collect()
    for i, r in enumerate(rows):
        assert r["g"] == r["u"], (fixtures[i], r["g"], r["u"])


def test_format_sep_gates_are_literal_chars_of_their_format():
    """_FORMAT_SEP desync guard (VERDICT r12 #4): the gate table is
    sound only while every gated separator is a LITERAL character of
    its format string (a literal absent from the input can never
    parse, so skipping is null-identical). A format added to
    DATE_FORMATS without a gate entry degrades safely to ungated; a
    WRONG separator would silently skip parseable inputs — this pins
    the invariant structurally so the table can't drift."""
    from football_etl_spark.functions.scalars import _FORMAT_SEP, DATE_FORMATS

    # pattern letters are format directives; anything else is literal
    for fmt, sep in _FORMAT_SEP.items():
        literals = set(fmt) - set("GyMdEahHmsSVzOXxZQqDFWwuekK")
        assert sep in literals, f"{fmt!r}: gate separator {sep!r} is not a literal"
        assert fmt in DATE_FORMATS, f"{fmt!r} gated but not in DATE_FORMATS"
