"""Registry-wide int64-sum overflow gate (r11 VERDICT ask #1).

The class: ``F.sum`` over an integral column wraps SILENTLY under a
non-ANSI session once a group accumulates past 2^63 — the r10 cusum
and r11 wedge-sum fixes patched two instances; r12 closes the class.
Every registry entry's ANALYZED plan is walked; a non-try Sum whose
child is integral is acceptable only if

  (a) the plan carries an ``assert_true`` backstop (the
      ``operators/scale.sum_i64_checked`` idiom — try_sum's checked
      adds yield NULL on breach, the assert turns that NULL loud), or
  (b) the entry appears in ``_BOUNDED`` below with a written
      magnitude-bound justification (indicator sums bounded by group
      row count, token sums bounded by rows x max-doc tokens, ...).

The allowlist is kept HONEST both ways: an unlisted bare sum fails,
and a listed entry whose bare sums have disappeared (fixed or
removed) also fails, so the list cannot rot. A seeded-violation test
pins that the walker actually detects the pattern, and the checked
helper's loud-fire/empty-group semantics are pinned alongside.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from football_etl_spark.plans.queries import REGISTRY, _RRF_D
from football_etl_spark.operators.scale import sum_i64_checked

from .conftest import SF_SMOKE

pytestmark = pytest.mark.usefixtures("spark")

_INTEGRAL = ("bigint", "int", "smallint", "tinyint")


def _walk_expressions(plan):
    """Yield every JVM Expression under a logical plan (all nodes'
    expression trees, plus nested subquery plans)."""
    stack = [plan]
    while stack:
        node = stack.pop()
        exprs = node.expressions()
        for i in range(exprs.size()):
            estack = [exprs.apply(i)]
            while estack:
                e = estack.pop()
                yield e
                kids = e.children()
                for j in range(kids.size()):
                    estack.append(kids.apply(j))
                if hasattr(e, "plan"):  # SubqueryExpression
                    try:
                        stack.append(e.plan())
                    except Exception:
                        pass
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))


def bare_integral_sums(df):
    """(bare_sum_strings, has_assert) for a DataFrame: bare = a Sum
    aggregate that is not try_sum and whose child is integral-typed.
    try_sum is detected via toString() (the analyzed tree prints
    ``try_sum(...)``; py4j exposes no evalMode accessor)."""
    plan = df._jdf.queryExecution().analyzed()
    sums, has_assert = [], False
    for e in _walk_expressions(plan):
        cls = e.getClass().getSimpleName()
        if cls == "AssertTrue":
            has_assert = True
        elif cls == "Sum":
            s = e.toString()
            child_dt = str(e.children().apply(0).dataType().simpleString())
            if not s.startswith("try_sum") and child_dt in _INTEGRAL:
                sums.append(s[:120])
    return sums, has_assert


# Entries whose bare integral sums carry a WRITTEN magnitude bound.
# Keys must exactly match entries that still have unguarded sums —
# the gate fails on both unlisted offenders and stale listings.
_IND = (
    "0/1 indicator sums: bounded by the group's row count, int64-safe "
    "to 9.2e18 rows per group — beyond any corpus"
)
_CNT = (
    "sums of per-group COUNTs: bounded by the source relation's total "
    "row count (~1e13 at 100 TB), 5+ orders of int64 headroom"
)
_TOK = (
    "token/char-count sums: bounded by rows x max doc tokens "
    "(~1e13 x ~1e5 = 1e18 worst-case at 100 TB) — within int64; the "
    "breach point is a corpus 10x past the design scale"
)
_BOUNDED = {
    "approx_topk_exactness_certificate": _CNT + " (CMS estimates are <= true counts + eps*N)",
    "benford_price_digits": _CNT,
    "bigram_lm_surprisal_topk": (
        "sum(c2) per w1 == total corpus occurrences of w1 <= corpus "
        "token count (~1e16 at 100 TB with ~1e3 tokens/doc) — within "
        "int64; the quantized-decimal surprisal sums are separate and "
        "already DECIMAL"
    ),
    "bm25_topk_docs": (
        "sum(dl) is " + _TOK + "; the per-(query,doc) score sum has "
        "<= |query terms| (3) addends of 1e9-scaled term scores — "
        "int64-safe while idf (N-df+.5)/(df+.5) stays below ~3e9, i.e. "
        "until a 1e13-doc corpus meets a df=1 term, where production "
        "lowers the 1e9 display scaling"
    ),
    "boilerplate_chunk_stats": _IND,
    "cascade_delete_users": _IND,
    "chi_square_priority_status": _CNT,
    "clean_conversion_pattern": _IND,
    "context_budget_truncation": _TOK,
    "conversion_funnel": _IND,
    "corpus_mass_by_length_bucket": _TOK,
    "deterministic_split_stats": _TOK,
    "dq_expectations_report": _IND + "; sum(c) is " + _CNT,
    "duplicate_span_stats": _IND,
    "embedding_gram_matrix": (
        "per-row quantized component product <= 1e3*1e3 = 1e6; the "
        "(i,j) cell sum is int64-safe to 9.2e12 vectors — two orders "
        "above the 100 TB embedding-table row count"
    ),
    "event_key_skew_profile": _CNT,
    "hybrid_rrf_topk": (
        "inherits the _bm25_agg sums — same bounds as bm25_topk_docs "
        "(sum(dl) is token-count class; the per-(query,doc) score sum "
        "has <= 3 addends); the fusion sum itself is <= 2 exact "
        "contributions below 2^42"
    ),
    "kl_lang_drift": _IND + "; sum(n_a/n_b) is " + _CNT,
    "lorenz_gini_order_value": _CNT,
    "lsh_banded_recall": "hit sums bounded by k x |query set| (<= 80 rows)",
    "ivf_recall_at_k": "hit sums bounded by k x |query set| (<= 80 rows)",
    "lsh_recall_at_k": "hit sums bounded by k x |query set| (<= 80 rows)",
    "multi_band_scan_counts": _IND,
    "null_completion_report": _IND,
    "order_rule_violations": _IND,
    "order_status_transition_matrix": _CNT,
    "orders_column_profile": _IND,
    "packed_training_shards": _TOK,
    "psi_value_drift": _IND + "; sum(na/nb) is " + _CNT,
    "q12_priority_shipping": _IND,
    "robust_outlier_flags": _IND,
    "running_balance_resets": _IND + " (window island markers)",
    "simhash_near_dups": (
        "per-bit indicator sums over a doc's shingle multiset: "
        "bounded by per-doc token count (~1e5) per group"
    ),
    "sliding_distinct_users": _IND + " (first-appearance markers)",
    "sole_blame_late_suppliers": _IND,
    "temperature_resampled_corpus": _CNT + " (resample multiplicities sum to ~corpus size)",
    "token_fertility_by_lang": _TOK,
    "trigram_backoff_surprisal_topk": (
        "sum(c) rollups of the materialized trigram-count table are "
        "token-count sums: c1/N <= corpus token count (~1e16 at "
        "100 TB), c2 <= same — within int64; surprisal sums are "
        "DECIMAL"
    ),
    "unigram_logprob_scores": (
        "sum(tf) per term == corpus occurrences of the term <= corpus "
        "token count (~1e16 at 100 TB) — within int64"
    ),
    "user_day_entropy_profile": _IND,
    "user_sessions": _IND + " (window island markers)",
    "vocab_growth_curve": _CNT + " (new-term markers sum to |vocabulary|)",
    "weekday_seasonality_profile": _CNT + " (n_days <= days in a year bucket)",
}


def test_registry_integral_sums_guarded_or_bounded(spark):
    """THE gate: every entry's analyzed plan either has no bare
    integral sum, carries an assert_true backstop, or is allowlisted
    with a magnitude bound — and the allowlist carries no stale rows."""
    offenders, needed = {}, set()
    for name, ent in REGISTRY.items():
        df = ent.fn.__wrapped__(spark, SF_SMOKE)
        sums, has_assert = bare_integral_sums(df)
        if not sums:
            continue
        if sums and not has_assert:
            # this entry NEEDS either an assert or a listing
            if name in _BOUNDED:
                needed.add(name)
            else:
                offenders[name] = sums[:3]
    assert not offenders, (
        "bare integral F.sum without assert_true backstop or "
        f"documented bound: {offenders} — use "
        "operators/scale.sum_i64_checked or add a justified _BOUNDED row"
    )
    # listed entries must still NEED the listing (bare sums, no assert)
    stale = set(_BOUNDED) - needed
    assert not stale, (
        f"stale _BOUNDED rows (entry now guarded/sum-free): {sorted(stale)}"
    )


def test_walker_flags_seeded_violation(spark):
    """Non-vacuousness: the walker flags a plain long sum, does not
    flag try_sum / the checked helper / decimal sums, and sees the
    helper's assert."""
    base = spark.range(10).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("x")
    )
    bad = base.groupBy("g").agg(F.sum("x").alias("s"))
    sums, has_assert = bare_integral_sums(bad)
    assert sums and not has_assert
    ok = base.groupBy("g").agg(sum_i64_checked(F.col("x"), "seed").alias("s"))
    sums, has_assert = bare_integral_sums(ok)
    assert not sums and has_assert
    dec = base.groupBy("g").agg(F.sum(F.col("x").cast("decimal(18,0)")).alias("s"))
    sums, _ = bare_integral_sums(dec)
    assert not sums
    # windowed form is walked too
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("x")
    badw = base.select(F.sum("x").over(w).alias("s"))
    sums, _ = bare_integral_sums(badw)
    assert sums


def test_checked_sum_semantics(spark):
    """sum_i64_checked: value-identical to F.sum on safe data, NULL on
    an empty/all-null group, and a LOUD error on an int64 breach."""
    df = spark.createDataFrame(
        [(1, 5), (1, 7), (2, None)], "g int, x int"
    ).select("g", F.col("x").cast("long").alias("x"))
    got = {
        r["g"]: r["s"]
        for r in df.groupBy("g")
        .agg(sum_i64_checked(F.col("x"), "pin").alias("s"))
        .collect()
    }
    assert got == {1: 12, 2: None}
    big = spark.createDataFrame(
        [(9223372036854775807,), (1,)], "x long"
    )
    with pytest.raises(Exception, match="int64 sum overflow"):
        big.agg(sum_i64_checked(F.col("x"), "pin").alias("s")).collect()


def test_rrf_denominator_exact(spark):
    """hybrid_rrf_topk's common denominator is lcm(61..70) and every
    1/(60+r) contribution is a whole number below 2^53."""
    assert _RRF_D == math.lcm(*range(61, 71))
    assert _RRF_D < 2**53
    for r in range(1, 11):
        assert _RRF_D % (60 + r) == 0
