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


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(
            lambda v: round(v, 2)
        ),
        min_size=3,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_winsorized_stats_matches_reference_clamp(spark, vals):
    """For any value multiset: the bounds are the exact rank-based
    order statistics (value at row ceil(q*n) of the ascending sort),
    and the winsorized mean equals the 2dp-exact mean of the clamped
    values — verified against a pure-Python reference."""
    import math

    from football_etl_spark.operators.windows import winsorized_stats

    df = spark.createDataFrame([("g", float(v)) for v in vals], "grp string, v double")
    r = winsorized_stats(df, "grp", "v").collect()[0]
    sv = sorted(vals)
    n = len(sv)
    p_lo = sv[math.ceil(0.05 * n) - 1]
    p_hi = sv[math.ceil(0.95 * n) - 1]
    assert r["p_lo"] == p_lo and r["p_hi"] == p_hi
    clamped = [max(p_lo, min(p_hi, v)) for v in vals]
    expect = sum(round(c * 100) for c in clamped) / 100.0 / n
    assert abs(r["winsorized_mean"] - expect) < 1e-9
    # the scaled-long mean carries one ulp of division rounding, so
    # the range check needs the matching epsilon (e.g. clamped all to
    # 1.12: 336/100.0/3 = 1.1199999999999999)
    eps = 1e-9 * max(1.0, abs(p_lo), abs(p_hi))
    assert p_lo - eps <= r["winsorized_mean"] <= p_hi + eps or n < 2


@given(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=60)
)
@settings(**_SETTINGS)
def test_key_skew_profile_shares_and_total(spark, keys):
    """Shares must sum to 100% when every key fits in top_n, counts
    must sum to the relation size, and hot flags must agree with the
    1.5x-mean rule computed independently."""
    from football_etl_spark.operators.scale import key_skew_profile

    df = spark.createDataFrame([(i, k) for i, k in enumerate(keys)], "id long, k string")
    rows = key_skew_profile(df, "k", top_n=10).collect()
    assert sum(r["n"] for r in rows) == len(keys)
    assert abs(sum(r["share_pct"] for r in rows) - 100.0) < 1e-9
    n_keys = len(set(keys))
    mean_load = len(keys) / n_keys
    for r in rows:
        assert r["is_hot"] == (r["n"] > 1.5 * mean_load)


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(**_SETTINGS)
def test_incremental_dedup_verdict_per_incoming_doc(spark, seed):
    """Whatever the corpus/incoming split, the verdict relation has
    EXACTLY one row per incoming doc, dup rows carry a match + a
    jaccard >= threshold, and novel rows carry nulls."""
    import random

    from football_etl_spark.operators import dedup

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda: " ".join(rng.choice(vocab) for _ in range(40))  # noqa: E731
    corpus_rows = [(i, mk()) for i in range(1, 6)]
    incoming_rows = [(10 + i, mk()) for i in range(3)]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    incoming = spark.createDataFrame(incoming_rows, ["doc_id", "text"])
    out = dedup.incremental_minhash_dedup(corpus, incoming, threshold=0.5).collect()
    assert sorted(r["new_id"] for r in out) == sorted(i for i, _ in incoming_rows)
    for r in out:
        if r["is_dup"]:
            assert r["best_match_id"] in {i for i, _ in corpus_rows}
            assert r["best_jaccard"] >= 0.5
        else:
            assert r["best_match_id"] is None and r["best_jaccard"] is None


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_tolerance_matches_bruteforce(spark, seed):
    """asof_join with tolerance_sec vs the quadratic definition: for
    every left row, the right row with the max ts <= left ts (highest
    tiebreak on equal ts) and age <= tolerance — else NULL. Random
    keys/timestamps with deliberate collisions and boundary ages."""
    import random

    from football_etl_spark.operators import joins

    rng = random.Random(seed)
    tol = 60
    base = 1_700_000_000
    lrows = [
        (i, rng.randint(0, 3), base + rng.randint(0, 300))
        for i in range(20)
    ]
    rrows = [
        (100 + i, rng.randint(0, 3), base + rng.randint(-30, 300), i * 10)
        for i in range(25)
    ]
    left = spark.createDataFrame(
        [(i, k, __import__("datetime").datetime.utcfromtimestamp(t))
         for i, k, t in lrows],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(rid, k, __import__("datetime").datetime.utcfromtimestamp(t), v)
         for rid, k, t, v in rrows],
        "rid long, k long, ts timestamp, v long",
    )
    got = {
        r["lid"]: r["asof_v"]
        for r in joins.asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], right_tiebreak="rid", tolerance_sec=tol,
        ).collect()
    }
    for lid, k, lt in lrows:
        cands = [
            (t, rid, v) for rid, rk, t, v in rrows
            if rk == k and t <= lt and t >= lt - tol
        ]
        want = max(cands)[2] if cands else None
        assert got[lid] == want, (lid, k, lt, cands, got[lid])


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_forward_direction_matches_bruteforce(spark, seed):
    """direction='forward' vs the quadratic definition: earliest right
    with ts >= left ts within tolerance, LOWEST tiebreak at equal ts
    (the mirror of backward's highest)."""
    import random

    from football_etl_spark.operators import joins

    rng = random.Random(seed)
    tol = 60
    base = 1_700_000_000
    lrows = [(i, rng.randint(0, 3), base + rng.randint(0, 300)) for i in range(20)]
    rrows = [
        (100 + i, rng.randint(0, 3), base + rng.randint(0, 330), i * 10)
        for i in range(25)
    ]
    mk = __import__("datetime").datetime.utcfromtimestamp
    left = spark.createDataFrame(
        [(i, k, mk(t)) for i, k, t in lrows], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(rid, k, mk(t), v) for rid, k, t, v in rrows],
        "rid long, k long, ts timestamp, v long",
    )
    got = {
        r["lid"]: r["asof_v"]
        for r in joins.asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], right_tiebreak="rid", tolerance_sec=tol,
            direction="forward",
        ).collect()
    }
    for lid, k, lt in lrows:
        cands = [
            (t, rid, v) for rid, rk, t, v in rrows
            if rk == k and t >= lt and t <= lt + tol
        ]
        want = min(cands)[2] if cands else None
        assert got[lid] == want, (lid, k, lt, sorted(cands), got[lid])


# ---- r8 kernels pinned against brute force ---------------------------------


@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=14).map(
            lambda toks: " ".join(toks)
        ),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=2, max_value=4),
)
@settings(**_SETTINGS)
def test_duplicate_span_stats_matches_brute_force(spark, docs, n):
    """operators/dedup.duplicate_span_stats vs a quadratic Python
    recomputation on tiny 2-letter-alphabet corpora (maximally
    collision-prone shingles): per-doc window counts, duplicated
    counts, and NULL-ratio semantics must agree exactly."""
    from collections import Counter

    from football_etl_spark.operators.dedup import duplicate_span_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_ratio)
        for r in duplicate_span_stats(df, span_n=n).collect()
    }
    spans = {}
    for i, t in enumerate(docs):
        toks = t.split()
        spans[i] = [
            " ".join(toks[k : k + n]) for k in range(len(toks) - n + 1)
        ]
    freq = Counter(s for ss in spans.values() for s in ss)
    for i in range(len(docs)):
        total = len(spans[i])
        dup = sum(1 for s in spans[i] if freq[s] >= 2)
        want_ratio = dup / total if total else None
        g_total, g_dup, g_ratio = got[i]
        assert g_total == total and g_dup == dup, (i, got[i], (total, dup))
        if want_ratio is None:
            assert g_ratio is None
        else:
            assert abs(g_ratio - want_ratio) < 1e-12


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-2.0, max_value=2.0, allow_nan=False, width=32
            ),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_gram_matrix_matches_brute_force(spark, vecs):
    """operators/similarity.gram_matrix vs direct integer arithmetic:
    the distributed partial-sum path must reproduce the exact
    floor-quantized X'X upper triangle for arbitrary float inputs."""
    import math

    from football_etl_spark.operators.similarity import gram_matrix

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {(r.i, r.j): r.g for r in gram_matrix(df, dim=3, scale=10).collect()}
    # brute force: quantize exactly like the kernel (float32 -> float64
    # promotion, then floor), then integer dot products
    q = [
        [math.floor(float(__import__("numpy").float32(x)) * 10) for x in v]
        for v in vecs
    ]
    for i in range(1, 4):
        for j in range(i, 4):
            want = sum(row[i - 1] * row[j - 1] for row in q)
            assert got[(i, j)] == want, (i, j, got[(i, j)], want)
    assert len(got) == 6


@given(
    st.lists(
        st.tuples(
            st.integers(0, 7),          # user id
            st.integers(0, 80),         # day offset from an epoch base
        ),
        min_size=1,
        max_size=60,
    ),
    st.booleans(),                      # force a span-63 boundary user
)
@settings(**_SETTINGS)
def test_cohort_retention_matches_bruteforce_any_span(spark, pairs, pin63):
    """Pin the r9 cohort bitmask fast path against pure-Python brute
    force on arbitrary (user, day) feeds. The generated spans cross
    the 63-day bitmask cutoff both ways, and `pin63` injects a user
    whose cohort day sits near the span end so the rel0+p <= 63
    shift-wraparound guard is exercised at the exact boundary (Java's
    shiftleft is mod-64 — an unguarded decode would alias bit 64 to
    bit 0 and invent false periods)."""
    import tempfile

    import pandas as pd

    from football_etl_spark.plans.queries import REGISTRY

    if pin63:
        # span exactly 63: day 0 exists, day 63 exists, and a user
        # whose FIRST day is 60 with activity at 63 (period 3 sits on
        # the last representable bit).
        pairs = pairs + [(6, 0), (6, 63), (7, 60), (7, 63)]
    base = 19700  # days since epoch, arbitrary
    rows = [
        (i, u, base + d)
        for i, (u, d) in enumerate(pairs)
    ]
    ev = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime(
                [dt.date(1970, 1, 1) + dt.timedelta(days=r[2]) for r in rows]
            ).astype("datetime64[us]"),
            "user_id": [r[1] for r in rows],
            "event_type": ["a"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    tmp = tempfile.mkdtemp(prefix="cohort_prop_")
    ev.to_parquet(f"{tmp}/events.parquet")
    got = {
        (r["cohort_d"], r["period"]): r["n_users"]
        for r in REGISTRY["cohort_retention"].fn(spark, tmp).collect()
    }
    # brute force: cohort = min day per user; one cell per distinct
    # active day within 6 days of the cohort; count users per cell
    per_user: dict[int, set[int]] = {}
    for _, u, d in rows:
        per_user.setdefault(u, set()).add(d)
    want: dict[tuple[int, int], int] = {}
    for days in per_user.values():
        c = min(days)
        for d in days:
            if d - c <= 6:
                want[(c, d - c)] = want.get((c, d - c), 0) + 1
    assert got == want, (got, want)


@given(
    st.integers(0, 10_000),   # seed for the price stream
    st.integers(300, 1500),   # n rows
)
@settings(**_SETTINGS)
def test_brr_stderr_tracks_classic_se_on_random_data(spark, seed, n):
    """Statistical-consistency fuzz for the one-pass BRR estimator:
    on random i.i.d. prices the half-sample stderr must bracket the
    classic s/sqrt(n) within 3x (B=16 replicates carry ~18% relative
    noise; 3x is far outside it), and the mean must be the exact
    decimal mean."""
    import math
    import tempfile

    import numpy as np
    import pandas as pd

    from football_etl_spark.plans.queries import REGISTRY

    rng = np.random.RandomState(seed)
    prices = np.round(rng.uniform(900.0, 500_000.0, size=n), 2)
    od = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n + 1, dtype="int64"),
            "o_custkey": np.ones(n, dtype="int64"),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": prices,
            "o_orderdate": pd.to_datetime(["2024-01-01"] * n).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    tmp = tempfile.mkdtemp(prefix="brr_prop_")
    od.to_parquet(f"{tmp}/orders.parquet")
    row = REGISTRY["half_sample_stderr_revenue"].fn(spark, tmp).collect()[0]
    cents = np.round(prices * 100).astype("int64")
    assert row["n"] == n
    assert abs(row["mean_price"] - cents.sum() / 100.0 / n) < 1e-9
    se = cents.std(ddof=1) / 100.0 / math.sqrt(n)
    assert se / 3 < row["stderr_brr"] < se * 3, (row["stderr_brr"], se)
