"""Deterministic content-hash sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible across reruns, (b) stable under repartitioning and
cluster-size changes, and (c) assignable in parallel with zero
coordination. Spark's ``sample``/``sampleBy`` are seeded but
partition-layout-dependent, so the standard large-scale technique is
content hashing: bucket every row by a cryptographic hash of a stable
key and select/split by hash range. The same row lands in the same
bucket on 1 executor or 1000, today or next year — and the whole thing
is a scan-level projection + filter (no shuffle, no state, pushes down
past column pruning).

Buckets use the md5 hex prefix so an ANSI-SQL oracle can mirror the
assignment exactly (md5 is identical everywhere; no engine-specific
integer-hash needed). 2 hex chars = 256 buckets ≈ 0.4 % granularity;
use more chars when finer fractions are needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_hex: int = 2) -> Column:
    """First ``n_hex`` hex chars of md5(key-as-string) — a uniform
    bucket label in ['00'..'ff'] for n_hex=2. String compare on the
    label ≡ numeric compare on the bucket, portably across engines."""
    return F.substring(F.md5(key.cast("string").cast("binary")), 1, n_hex)


def hash_sample(df: DataFrame, key: Column, fraction_hex: str = "29") -> DataFrame:
    """Keep rows whose 2-hex-char bucket sorts strictly below
    ``fraction_hex``: '29' = 0x29/0x100 ≈ 16 % deterministic sample.
    A filter on a scan-level expression — at 100 TB this samples
    without a shuffle and composes with partition pruning."""
    return df.filter(hash_bucket(key) < F.lit(fraction_hex))


def split_assign(key: Column, val_hex: str = "cd", test_hex: str = "e4") -> Column:
    """Train/val/test label from the hash bucket: buckets below
    ``val_hex`` → train, below ``test_hex`` → val, rest → test.
    Defaults ≈ 80/9/11. Content-keyed, so a document keeps its split
    across pipeline versions — the property that prevents train/test
    leakage when the corpus is re-ingested or deduplicated."""
    b = hash_bucket(key)
    return (
        F.when(b < F.lit(val_hex), F.lit("train"))
        .when(b < F.lit(test_hex), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def train_val_test_split(
    df: DataFrame, key: Column, val_hex: str = "cd", test_hex: str = "e4"
) -> DataFrame:
    """Attach a deterministic ``split`` column (see ``split_assign``)."""
    return df.withColumn("split", split_assign(key, val_hex, test_hex))


def weighted_hash_sample(
    df: DataFrame, key: Column, weight: Column, hex_digits: int = 4
) -> DataFrame:
    """Deterministic per-row weighted sampling: keep a row iff its
    uniform hash bucket falls below its own weight ∈ [0,1] — rows with
    weight w are kept with probability ≈ w (quantized to 16^hex_digits
    levels, and clamped so w=1 keeps all but the single top bucket).

    The comparison happens between two hex STRINGS (bucket vs
    lpad(hex(floor(w·16^d)))), so the predicate is mirrorable in any
    engine with md5 — no hex→int conversion needed. Same properties as
    ``hash_sample``: reproducible, layout-independent, scan-level (a
    quality-weighted corpus downsample of 100 TB is a filter, not a
    job).

    Weights are clamped to [0,1] on BOTH ends: without the lower
    clamp a negative weight would hex-format as a 16-char
    two's-complement string whose lpad truncation keeps nearly every
    row — the opposite of the intent. Null weights drop the row
    (null predicate)."""
    scale = 16**hex_digits
    w = F.greatest(weight, F.lit(0.0))
    thresh = F.lpad(
        F.lower(
            F.hex(F.least(F.floor(w * scale), F.lit(scale - 1)).cast("long"))
        ),
        hex_digits,
        "0",
    )
    return df.filter(hash_bucket(key, hex_digits) < thresh)


def rate_mixture(
    df: DataFrame,
    strata_col: str,
    rates: dict,
    key: Column,
    n_hex: int = 4,
) -> DataFrame:
    """Per-stratum rate-based sampling — the training-mixture
    composition step: keep a deterministic ``rates[stratum]``
    fraction of each stratum (e.g. downsample the dominant language
    toward a target mix). Same content-hash machinery as
    ``hash_sample`` (md5 bucket < per-stratum threshold), so the mix
    is reproducible, layout-independent, and a pure scan-level filter
    — composing a 100 TB mixture costs zero shuffles. Strata absent
    from ``rates`` are dropped (explicit mixture contract); a rate
    >= 1.0 keeps the whole stratum."""
    b = hash_bucket(key, n_hex)
    pred = F.lit(False)
    for stratum, rate in rates.items():
        if rate >= 1.0:
            keep = F.lit(True)
        else:
            thresh = format(int(rate * (16 ** n_hex)), f"0{n_hex}x")
            keep = b < F.lit(thresh)
        pred = F.when(F.col(strata_col) == stratum, keep).otherwise(pred)
    return df.filter(pred)


def temperature_resample(
    df: DataFrame,
    strata_col: str,
    key: Column,
    alpha: float = 0.5,
    hex_digits: int = 4,
    round_to: int = 6,
    rate_col: str | None = None,
) -> DataFrame:
    """Temperature-based mixture rebalancing with DATA-DERIVED rates —
    the multilingual-corpus resampling rule (sampling share ∝ p^alpha,
    alpha<1 flattens the language distribution, as in the mBERT/XLM-R
    exponential-smoothing recipe): the acceptance rate for stratum l
    with empirical share p_l is

        a_l = p_l^(alpha-1) / max_m p_m^(alpha-1)

    so the rarest stratum keeps everything (a=1) and dominant strata
    are thinned toward the tempered mix — realizable by pure
    subsampling, no upsampling needed.

    Plan: one groupBy(strata) count (map-side combined, strata-sized
    output), rates derived on that TINY relation with an unpartitioned
    window (bounded by the number of strata — languages, not rows),
    broadcast-joined back, then the same deterministic md5-vs-weight
    hex filter as ``weighted_hash_sample``. The corpus pass itself is
    scan + broadcast probe: resampling 100 TB costs one tiny count
    job plus a filter. Rates are rounded to ``round_to`` before the
    hex threshold so the kept set is reproducible cross-engine."""
    # pmod(__n, 1) is constant 0 but non-foldable: the window runs on
    # the strata-sized counts relation (bounded by #languages), and a
    # defined partitionSpec keeps the misleading "no partition defined"
    # WindowExec warning out of the logs (see operators/corpus.py)
    n_tot = Window.partitionBy(F.pmod(F.col("__n"), F.lit(1))).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    counts = df.groupBy(F.col(strata_col).alias("__stratum")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    boost = F.pow(F.col("__n") / F.sum("__n").over(n_tot), alpha - 1.0)
    rates = counts.select(
        "__stratum",
        F.round(boost / F.max(boost).over(n_tot), round_to).alias("__rate"),
    )
    joined = df.join(
        F.broadcast(rates), df[strata_col] == F.col("__stratum"), "inner"
    ).drop("__stratum")
    kept = weighted_hash_sample(joined, key, F.col("__rate"), hex_digits)
    if rate_col is not None:
        return kept.withColumnRenamed("__rate", rate_col)
    return kept.drop("__rate")
