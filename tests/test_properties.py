"""Property-based checks (hypothesis) for the permissive parsing
scalars: whatever the input string, the contract is parse-or-null —
never a raised exception, never a mangled value — matching the
reference's errors='coerce' discipline (utils/data_utils.py:36-98)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from football_etl_spark.functions import scalars

pytestmark = pytest.mark.usefixtures("spark")

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _run_scalar(spark, col, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r["out"] for r in df.select(col.alias("out")).collect()]


@given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_normalize_date_never_raises_arbitrary_text(spark, texts):
    out = _run_scalar(spark, scalars.normalize_date("raw"), texts)
    assert all(v is None or isinstance(v, dt.date) for v in out)


@given(
    st.lists(
        st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2099, 12, 28)),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_normalize_date_roundtrips_every_declared_format(spark, dates):
    """A date rendered in ANY of the declared input formats (including
    the weekday-prefixed ones Spark can't natively parse) must come
    back as exactly that date."""
    renders = [
        "%Y-%m-%d", "%d/%m/%Y", "%B %d, %Y", "%b %d, %Y",
        "%A, %B %d, %Y",
    ]
    texts = [d.strftime(renders[i % len(renders)]) for i, d in enumerate(dates)]
    out = _run_scalar(spark, scalars.normalize_date("raw"), texts)
    assert out == list(dates)


@given(
    st.lists(
        st.one_of(
            st.text(max_size=30),
            st.floats(allow_nan=False, allow_infinity=False, width=32).map(
                lambda f: f"{f:.4f}"
            ),
            st.integers(-10**9, 10**9).map(lambda i: f"{i}%"),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_clean_number_parse_or_null(spark, values):
    out = _run_scalar(spark, scalars.clean_number("raw"), values)
    for raw, v in zip(values, out):
        assert v is None or isinstance(v, float)
        # a plain numeric rendering must survive exactly
        try:
            expect = float(raw.rstrip("%"))
        except ValueError:
            continue
        if v is not None and abs(expect) < 1e15:
            assert v == pytest.approx(expect)
