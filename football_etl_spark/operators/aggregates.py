"""Aggregation operators (SURVEY.md §2.4).

All are single groupBy/agg passes — Catalyst plans partial (map-side)
aggregation automatically, so these are shuffle-light at scale. The
observability aggregates (null counts, completion, duplicate counts)
reproduce the reference's validation/stats surface
(utils/data_utils.py:194-235, pipeline.py:103-118) as ONE pass over
the table instead of pandas' repeated full scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def value_counts(df: DataFrame, col: str, desc: bool = True, limit: int | None = None) -> DataFrame:
    """groupBy-count ranked (examples/visualize_data.py:71;
    daily_match_scraper.py:670-723 top-10 reports)."""
    out = df.groupBy(col).agg(F.count("*").alias("n"))
    out = out.orderBy(F.desc("n") if desc else F.asc("n"), col)
    return out.limit(limit) if limit else out


def null_counts(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column null counts in one pass (utils/data_utils.py:222-226)."""
    cols = cols or df.columns
    return df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    )


def completion_ratio(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Whole-table data-completion % — mean of per-column non-null
    densities (pipeline.py:108, processors/data_processor.py:383)."""
    cols = cols or df.columns
    per_col = [F.avg(F.col(c).isNotNull().cast("double")) for c in cols]
    total = per_col[0]
    for p in per_col[1:]:
        total = total + p
    return df.agg((total / F.lit(len(cols))).alias("completion"))


def duplicate_count(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """#rows − #distinct keys (processors/data_processor.py:102)."""
    return df.agg(
        (F.count("*") - F.count_distinct(*[F.col(k) for k in keys])).alias("n_duplicates")
    )


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """The offending key values (utils/data_utils.py:229-233)."""
    return (
        df.groupBy(*keys).agg(F.count("*").alias("n")).filter(F.col("n") > 1)
    )


def distinct_union(df: DataFrame, col_a: str, col_b: str, out: str) -> DataFrame:
    """Distinct values of two columns united — all teams = home ∪ away
    (scrapers/team_scraper.py:938-940)."""
    return (
        df.select(F.col(col_a).alias(out))
        .unionByName(df.select(F.col(col_b).alias(out)))
        .distinct()
    )


def pivot_matrix(
    df: DataFrame,
    row_key: str,
    pivot_col: str,
    agg_col: str,
    values: Sequence[str] | None = None,
    agg: str = "avg",
) -> DataFrame:
    """Cross-tab (examples/visualize_data.py:285-290). At scale the
    pivot value list must be bounded — pass ``values`` explicitly to
    skip the distinct-collection job and cap output width."""
    g = df.groupBy(row_key)
    p = g.pivot(pivot_col, list(values)) if values else g.pivot(pivot_col)
    return p.agg(getattr(F, agg)(agg_col))


def table_stats(df: DataFrame, key_cols: Sequence[str], distinct_cols: Sequence[str]) -> Row:
    """The pipeline_stats dict (pipeline.py:103-113) as one agg pass:
    row count, duplicate count on the key, count-distinct per listed
    column. Returns a single collected Row (driver-side by design —
    it is the job summary, not a data path)."""
    aggs = [
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count_distinct(*[F.col(k) for k in key_cols])).alias("n_duplicates"),
    ]
    aggs += [F.count_distinct(c).alias(f"n_{c}") for c in distinct_cols]
    return df.agg(*aggs).collect()[0]
