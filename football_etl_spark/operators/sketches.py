"""Mergeable approximate sketches — the 100 TB pre-aggregation layer.

Exact distincts and exact percentiles need a full shuffle of the raw
key stream; at 100 TB that is the dominant cost of any dashboard-style
rollup. The standard large-scale answer is a *mergeable sketch*:
aggregate each partition/day/segment into a tiny fixed-size summary
once, then answer every coarser query by merging summaries instead of
re-reading raw data.

- ``daily_hll_sketches`` / ``merge_hll`` — Apache DataSketches HLL
  via the built-in ``hll_sketch_agg`` / ``hll_union_agg`` /
  ``hll_sketch_estimate`` (JVM-side, whole-stage codegen). The
  per-day sketch table is ~KBs per group regardless of raw volume;
  the union re-rollup touches only sketches. This is the mergeability
  property ``approx_count_distinct`` alone does not give you: HLL++
  partials there are internal, while these sketches are first-class
  binary columns you can persist to parquet and merge across jobs.
- ``approx_group_percentiles`` — built-in ``approx_percentile``
  (Greenwald-Khanna variant): single pass, map-side partial combine,
  bounded memory per group; the t-digest role in this engine.

Correctness gating: sketch estimates are algorithm-specific, so no
cross-engine DuckDB oracle can hash-match them — the registered
queries use the driver's rows-only gate, and tests/test_operators.py
bounds the estimates against exact answers (HLL lgK=14 → <1 % typical
error; percentile accuracy=10000 → exact on the test scales).
Additionally, each rows-only entry has an ORACLE-GATED companion in
plans/queries.py (approx_distinct_error_bound, hll_reach_error_bound,
approx_percentile_error_bound) that reduces the sketch output to
deterministic bounded-error verdicts a DuckDB oracle replicates —
so the accuracy contracts also sit under the driver's hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_hll_sketches(
    df: DataFrame,
    key_col: str = "user_id",
    group_col: str = "event_type",
    ts_col: str = "ts",
    lg_k: int = 14,
) -> DataFrame:
    """One HLL sketch of ``key_col`` per (group, day) — the incremental
    build step. Runs as an ordinary partial-combined aggregation: each
    map task sketches its slice, the reduce merges sketches, so the
    shuffle carries ~2^lg_k bytes per group-day, never raw keys.
    Output: (group, day, sketch binary)."""
    return df.groupBy(
        F.col(group_col).alias("grp"), F.to_date(ts_col).alias("day")
    ).agg(F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"))


def merge_hll(sketches: DataFrame, by: str = "grp") -> DataFrame:
    """Re-rollup: union per-day sketches up to ``by`` and estimate.
    Reads only the sketch table — answering "distinct users per type
    over all time" without touching the raw 100 TB again."""
    return sketches.groupBy(by).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.count("*").alias("days_merged"),
    )


def approx_group_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles in one pass (no sort, no full
    shuffle of values — the GK summary partial-combines map-side).
    Output: (group, p_50, p_90, ... one column per quantile)."""
    arr = F.approx_percentile(
        value_col, F.array(*[F.lit(q) for q in quantiles]), F.lit(accuracy)
    )
    out = df.groupBy(F.col(group_col).alias("grp")).agg(arr.alias("__qs"))
    cols = [F.col("grp")] + [
        F.col("__qs").getItem(i).alias(f"p_{str(q).replace('0.', '')}")
        for i, q in enumerate(quantiles)
    ]
    return out.select(*cols)
