"""Scalar expression library (SURVEY.md §2.7).

Every row-at-a-time helper the reference applies via
``Series.apply`` / ``DataFrame.apply(axis=1)`` compiled to built-in
Spark Column expressions — JVM-side, whole-stage-codegen'd, zero
Python UDFs. Each function cites the reference implementation it is
semantically equivalent to.

All parsing helpers are null-on-failure (``try_*`` / non-ANSI cast
semantics), matching pandas ``errors='coerce'`` behavior.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --------------------------------------------------------------------------
# Team-name normalization (utils/data_utils.py:14-33, config.py:40-76)
# --------------------------------------------------------------------------

# Default mapping mirroring the reference's TEAM_NAME_MAPPING intent
# (config.py:40-76): canonicalize common alias forms. Callers pass the
# full table; this default exists so the expression is testable alone.
DEFAULT_TEAM_MAPPING: dict[str, str] = {
    "Man United": "Manchester United",
    "Man Utd": "Manchester United",
    "Man City": "Manchester City",
    "Spurs": "Tottenham Hotspur",
    "Wolves": "Wolverhampton Wanderers",
    "Newcastle": "Newcastle United",
}

_SUFFIX_RE = r"\s+(FC|CF|AFC)$"


def strip_team_suffix(c: ColumnOrName) -> Column:
    """Trim + strip club-suffix tokens (utils/data_utils.py:20-24)."""
    return F.regexp_replace(F.trim(_col(c)), _SUFFIX_RE, "")


def normalize_team_name(
    c: ColumnOrName, mapping: Mapping[str, str] | None = None
) -> Column:
    """normalize_team_name (utils/data_utils.py:14-33): trim, strip
    suffix regex, then exact-match dictionary remap via a literal map
    (constant-folded by Catalyst; for large mappings use
    ``operators.joins.lookup_join`` instead)."""
    mapping = DEFAULT_TEAM_MAPPING if mapping is None else mapping
    stripped = strip_team_suffix(c)
    if not mapping:
        return stripped
    kv: list[Column] = []
    for k, v in mapping.items():
        kv += [F.lit(k), F.lit(v)]
    return F.coalesce(F.create_map(*kv)[stripped], stripped)


# --------------------------------------------------------------------------
# Date / time parsing (utils/data_utils.py:36-71)
# --------------------------------------------------------------------------

# The reference tries 12 explicit formats then a permissive parse
# (utils/data_utils.py:44-57). Spark format strings for the same set.
DATE_FORMATS = (
    "yyyy-MM-dd",
    "dd/MM/yyyy",
    "MM/dd/yyyy",
    "dd-MM-yyyy",
    "yyyy/MM/dd",
    "dd.MM.yyyy",
    "yyyy.MM.dd",
    "dd MMM yyyy",
    "MMM dd yyyy",
    "MMM dd, yyyy",
    "MMMM dd, yyyy",
)

# The reference also tries weekday-prefixed forms ("%A, %B %d, %Y",
# utils/data_utils.py:44-57). Spark ≥3 forbids week-day letters when
# PARSING, so normalize_date strips a leading "<Weekday>, " token
# before the format coalesce — same accepted inputs, no E-pattern.
# The strip requires a comma DIRECTLY after the letters, so month-led
# forms like "March 3, 2025" / "Mar 03 2025" are untouched.
_WEEKDAY_PREFIX_RE = r"^[A-Za-z]+,\s*"


# Literal separator required by each format: a pattern's literal
# characters must appear verbatim in the input for the parse to
# succeed, so an input lacking the separator can NEVER parse that
# format — try_to_date would return null after a full (and expensive:
# exception-driven) parse attempt. normalize_date uses this to gate
# each attempt behind a cheap substring check (r12: the failed
# attempts dominated the chain's cost — 3.27 s -> 1.25 s for the
# messy_ingest date column at sf0.1, value-identical by the literal
# argument above; equivalence fuzz-pinned in tests/test_scalars.py).
_FORMAT_SEP = {
    "yyyy-MM-dd": "-",
    "dd/MM/yyyy": "/",
    "MM/dd/yyyy": "/",
    "dd-MM-yyyy": "-",
    "yyyy/MM/dd": "/",
    "dd.MM.yyyy": ".",
    "yyyy.MM.dd": ".",
    "dd MMM yyyy": " ",
    "MMM dd yyyy": " ",
    "MMM dd, yyyy": ",",
    "MMMM dd, yyyy": ",",
}


def normalize_date(c: ColumnOrName, formats: tuple[str, ...] = DATE_FORMATS) -> Column:
    """Multi-format permissive date parse, null on total failure —
    a coalesce over per-format ``try_to_date`` (null on mismatch even
    under ANSI sessions), ≡ utils/data_utils.py:36-71 including its
    weekday-prefixed formats (handled by prefix strip, see above).
    Each attempt is separator-gated (``_FORMAT_SEP``): skipping a
    format whose literal separator is absent cannot change the result
    and avoids the exception-driven cost of a doomed parse."""
    col = F.regexp_replace(F.trim(_col(c)), _WEEKDAY_PREFIX_RE, "")
    return F.coalesce(
        *[
            F.when(col.contains(_FORMAT_SEP[fmt]), F.try_to_date(col, fmt))
            if fmt in _FORMAT_SEP
            else F.try_to_date(col, fmt)
            for fmt in formats
        ]
    )


def epoch_to_hhmm(ts_seconds: ColumnOrName) -> Column:
    """Unix seconds → 'HH:mm' (daily_match_scraper.py:486-492)."""
    return F.date_format(F.timestamp_seconds(_col(ts_seconds)), "HH:mm")


def clean_kickoff_time(c: ColumnOrName) -> Column:
    """Keep the time part after a space; require ':' else null
    (processors/data_processor.py:86-95)."""
    col = F.trim(_col(c))
    last = F.element_at(F.split(col, " "), -1)
    return F.when(last.contains(":"), last)


def derive_season(d: ColumnOrName) -> Column:
    """Season label 'YYYY-YYYY+1' with an August boundary
    (scrapers/team_scraper.py:152-174)."""
    col = _col(d)
    start = F.when(F.month(col) >= 8, F.year(col)).otherwise(F.year(col) - 1)
    return F.concat_ws("-", start.cast("string"), (start + 1).cast("string"))


# --------------------------------------------------------------------------
# Numeric cleaning (utils/data_utils.py:74-98)
# --------------------------------------------------------------------------


def clean_number(c: ColumnOrName) -> Column:
    """Strip everything but ``[0-9.-]`` then cast double, null on
    failure — ≡ clean_number / to_numeric(errors='coerce')
    (utils/data_utils.py:74-98; '%' strip at team_scraper.py:563-567)."""
    return F.regexp_replace(_col(c).cast("string"), r"[^0-9.\-]", "").try_cast("double")


# --------------------------------------------------------------------------
# Match-id generation (utils/data_utils.py:101-119,
# processors/data_processor.py:221-241)
# --------------------------------------------------------------------------


def _slug(c: Column) -> Column:
    return F.regexp_replace(F.lower(c), "[^a-z0-9]", "")


def generate_match_id(d: ColumnOrName, home: ColumnOrName, away: ColumnOrName) -> Column:
    """'YYYYMMDD_home_away', teams lowercased & alnum-only
    (utils/data_utils.py:101-119)."""
    return F.concat_ws(
        "_", F.date_format(_col(d), "yyyyMMdd"), _slug(_col(home)), _slug(_col(away))
    )


def symmetric_match_id(d: ColumnOrName, t1: ColumnOrName, t2: ColumnOrName) -> Column:
    """Order-independent id via least/greatest
    (processors/data_processor.py:232-241)."""
    a, b = _slug(_col(t1)), _slug(_col(t2))
    return F.concat_ws("_", F.date_format(_col(d), "yyyyMMdd"), F.least(a, b), F.greatest(a, b))


def conditional_match_id(
    d: ColumnOrName, team: ColumnOrName, opponent: ColumnOrName, is_home: ColumnOrName
) -> Column:
    """Swap home/away by the is_home flag
    (processors/data_processor.py:222-231)."""
    return F.when(
        _col(is_home) == 1, generate_match_id(d, team, opponent)
    ).otherwise(generate_match_id(d, opponent, team))


# --------------------------------------------------------------------------
# Result / metric expressions (processors/data_processor.py:181-219,
# utils/data_utils.py:279-287, examples/visualize_data.py:276-279)
# --------------------------------------------------------------------------

RESULT_DOMAIN = ("W", "D", "L", "U")


def standardize_result(c: ColumnOrName) -> Column:
    """Map {Win/win/W/1→W, Draw/draw/D/0.5→D, Loss/loss/L/0→L, else U}
    (processors/data_processor.py:181-193)."""
    v = F.lower(F.trim(_col(c).cast("string")))
    return (
        F.when(v.isin("w", "win", "won", "1", "1.0"), "W")
        .when(v.isin("d", "draw", "drawn", "tie", "0.5"), "D")
        .when(v.isin("l", "loss", "lost", "lose", "0", "0.0"), "L")
        .otherwise("U")
    )


def result_to_points(c: ColumnOrName) -> Column:
    """{W→1.0, D→0.5, L→0.0, else null} (utils/data_utils.py:281-285)."""
    v = _col(c)
    return (
        F.when(v == "W", F.lit(1.0)).when(v == "D", F.lit(0.5)).when(v == "L", F.lit(0.0))
    )


def safe_ratio(num: ColumnOrName, den: ColumnOrName) -> Column:
    """num/den if den>0 else 0.0 — shot_accuracy / conversion_rate
    (processors/data_processor.py:207-219)."""
    n, d = _col(num), _col(den)
    return F.when(d > 0, n / d).otherwise(F.lit(0.0))


def match_quality(home_wr: ColumnOrName, away_wr: ColumnOrName) -> Column:
    """(coalesce(h,0.5)+coalesce(a,0.5))/2
    (examples/visualize_data.py:276-279)."""
    return (F.coalesce(_col(home_wr), F.lit(0.5)) + F.coalesce(_col(away_wr), F.lit(0.5))) / 2


def split_score(score: ColumnOrName, venue: ColumnOrName) -> tuple[Column, Column]:
    """'2-1' → (goals_for, goals_against), swapped by venue
    (scrapers/team_scraper.py:656-667). Returns (for, against)."""
    parts = F.split(F.trim(_col(score).cast("string")), "[-–]")
    first = F.element_at(parts, 1).try_cast("double")
    second = F.element_at(parts, 2).try_cast("double")
    home = F.lower(F.trim(_col(venue))) == "home"
    gf = F.when(home, first).otherwise(second)
    ga = F.when(home, second).otherwise(first)
    return gf, ga


def is_home_flag(venue: ColumnOrName) -> Column:
    """venue=='Home' → 1 else 0 (scrapers/team_scraper.py:669-681)."""
    return (F.lower(F.trim(_col(venue))) == "home").cast("int")
