"""Round-12 wave-7 additions: targeted pins for the four new entries
(event funnel, pareto quality filter, PMI collocations, MMR
diversified re-rank) beyond the registry-wide oracle compare —
boundary semantics, pure-Python greedy/counting references, and
partition-layout independence."""

from __future__ import annotations

import os
import shutil
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from football_etl_spark.plans.queries import (
    _MMR_C,
    _MMR_K,
    _MMR_LAM,
    REGISTRY,
)

from .conftest import SF_SMOKE

pytestmark = pytest.mark.usefixtures("spark")


def _fixture_dir(dirpath, skip=()):
    """Copy the full smoke table layout (duckdb_run binds every view
    eagerly) so individual tables can then be overwritten."""
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if t not in skip:
            shutil.copy(
                f"{SF_SMOKE}/{t}.parquet", os.path.join(dirpath, f"{t}.parquet")
            )
    return str(dirpath)


def _write_events(dirpath, rows):
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [pd.Timestamp(ts) for _, _, ts in rows],
            "user_id": [u for u, _, _ in rows],
            "event_type": [t for _, t, _ in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(os.path.join(dirpath, "events.parquet"))


def test_funnel_strict_ordering_and_24h_boundary(tmp_path, spark):
    """Hand-built funnel edge cases: step order is strict (a view
    BEFORE the first signup never converts), the 24h window is
    inclusive at exactly +24h, a too-late step does not convert, and
    a purchase BEFORE the qualifying view does not count."""
    t0 = "2024-03-01 12:00:00"
    rows = [
        # user 1: clean full conversion inside the window
        (1, "signup", t0),
        (1, "view", "2024-03-01 13:00:00"),
        (1, "purchase", "2024-03-01 14:00:00"),
        # user 2: view strictly BEFORE signup -> no view conversion
        (2, "view", "2024-03-01 11:00:00"),
        (2, "signup", t0),
        # user 3: view 25h after signup -> outside the window
        (3, "signup", t0),
        (3, "view", "2024-03-02 13:00:00"),
        # user 4: view at EXACTLY +24h (inclusive boundary) and
        # purchase at exactly +24h after that view
        (4, "signup", t0),
        (4, "view", "2024-03-02 12:00:00"),
        (4, "purchase", "2024-03-03 12:00:00"),
        # user 5: purchase fires BEFORE the qualifying view; with no
        # later purchase the user views but never purchases
        (5, "signup", t0),
        (5, "purchase", "2024-03-01 12:30:00"),
        (5, "view", "2024-03-01 13:30:00"),
        # user 6: active user who never signed up
        (6, "view", t0),
        (6, "purchase", "2024-03-01 13:00:00"),
    ]
    sf = _fixture_dir(tmp_path, skip=("events",))
    _write_events(tmp_path, rows)
    got = REGISTRY["event_funnel_conversion"].fn.__wrapped__(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (
        r["n_users"],
        r["n_signup"],
        r["n_viewed"],
        r["n_purchased"],
    ) == (6, 5, 3, 2), r
    assert r["view_rate"] == 0.6 and r["purchase_rate"] == 0.666667, r


def _round6(v: float) -> float:
    """Spark/DuckDB ROUND(double, 6): shortest-repr decimal then
    HALF_UP (BigDecimal.valueOf semantics)."""
    return float(Decimal(repr(v)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _seq_cosine(a, b) -> float:
    """vectors.dot/norm replica: sequential left-fold accumulation in
    element order, elements upcast to double first."""
    dot = acc_a = acc_b = 0.0
    for x, y in zip(a, b):
        x, y = float(x), float(y)
        dot += x * y
        acc_a += x * x
        acc_b += y * y
    import math

    d = math.sqrt(acc_a) * math.sqrt(acc_b)
    return dot / d if d > 0 else 0.0


def test_mmr_matches_greedy_reference(spark):
    """Pure-Python MMR greedy over the sf0.001 embeddings reproduces
    the entry row-for-row: candidate pool, pairwise sims, per-step
    argmax with the 6dp-rounded score and nid-ASC tiebreak."""
    vecs = {
        int(r.vec_id): list(r.embedding)
        for r in pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").itertuples()
    }
    lam, om = _MMR_LAM, round(1 - _MMR_LAM, 1)
    want = []
    for q in sorted(v for v in vecs if v < 8):
        scored = sorted(
            (
                (-_seq_cosine(vecs[q], vecs[n]), n)
                for n in vecs
                if n != q
            ),
        )[:_MMR_C]
        cand = [(n, _round6(-negcs)) for negcs, n in scored]
        sim = {
            (a, b): _round6(_seq_cosine(vecs[a], vecs[b]))
            for a, _ in cand
            for b, _ in cand
            if a != b
        }
        sel = [(cand[0][0], cand[0][1], 1, cand[0][1])]
        chosen = {cand[0][0]}
        for step in range(2, _MMR_K + 1):
            best = None
            for n, rel in cand:
                if n in chosen:
                    continue
                ms = max(sim[(n, s)] for s, _, _, _ in sel)
                sc = _round6(lam * rel - om * ms)
                key = (-sc, n)
                if best is None or key < best[0]:
                    best = (key, n, rel, sc)
            sel.append((best[1], best[2], step, best[3]))
            chosen.add(best[1])
        want.extend((q, n, step, rel, sc) for n, rel, step, sc in sel)
    got = sorted(
        (
            (r.query_id, r.neighbor_id, r.step, r.relevance, r.mmr_score)
            for r in REGISTRY["mmr_diverse_topk"].fn(spark, SF_SMOKE).collect()
        )
    )
    assert got == sorted(want), (got[:8], sorted(want)[:8])


def test_mmr_diversifies_vs_pure_relevance(spark):
    """The point of the operator: at least one query's MMR selection
    must differ from its pure top-5 relevance ranking (otherwise the
    diversity term is inert on this corpus and the entry pins
    nothing)."""
    rows = REGISTRY["mmr_diverse_topk"].fn(spark, SF_SMOKE).collect()
    ann = REGISTRY["ann_cosine_topk"].fn(spark, SF_SMOKE).collect()
    top5 = {}
    for r in ann:
        if r.rank <= _MMR_K:
            top5.setdefault(r.query_id, set()).add(r.neighbor_id)
    mmr = {}
    for r in rows:
        mmr.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert any(mmr[q] != top5[q] for q in mmr), (mmr, top5)


def test_pareto_filter_partition_independent(tmp_path, spark):
    """The md5-hash pareto draw is layout-independent: the same
    documents written reversed across a 7-file layout produce
    IDENTICAL per-lang rows."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    sf = _fixture_dir(tmp_path, skip=("documents",))
    spark.createDataFrame(docs.iloc[::-1]).repartition(7).write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp_path, "documents.parquet"))
    ent = REGISTRY["pareto_quality_filter"]
    base = sorted(tuple(r) for r in ent.fn(spark, SF_SMOKE).collect())
    got = sorted(tuple(r) for r in ent.fn.__wrapped__(spark, sf).collect())
    assert got == base, (got, base)


def test_pareto_filter_admits_tail(spark):
    """The mechanism under test vs a hard threshold: the kept set must
    contain at least one doc whose score is BELOW the best rejected
    doc's score (heavy-tailed admission — the GPT-3 Appendix A
    motivation)."""
    from football_etl_spark.functions import text
    from football_etl_spark.plans.queries import _t
    from pyspark.sql import functions as F

    d = _t(spark, SF_SMOKE, "documents").filter(
        ~F.col("text").contains("\x1e") & ~F.col("text").contains("\x1f")
    )
    w = text.quality_score("text")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
        ).cast("long")
        + F.lit(1).cast("long")
    ) / F.lit(16777216.0)
    draw = F.pow(u, F.lit(0.0) - F.lit(1.0) / F.lit(9.0)) - F.lit(1.0)
    rows = d.select(
        w.alias("w"), (draw > F.lit(1.0) - w).alias("kept")
    ).collect()
    kept = sorted(r.w for r in rows if r.kept)
    rejected = sorted(r.w for r in rows if not r.kept)
    assert kept and rejected
    assert kept[0] < rejected[-1], (kept[0], rejected[-1])


def test_pmi_matches_bruteforce(tmp_path, spark):
    """Planted-collocation corpus: 'new york' co-occurs far above its
    unigram expectation; reference counts + the discounted Mikolov
    score and PMI are computed in pure Python."""
    texts = (
        ["big new york city trip to new york now"] * 4
        + ["the new house and the york visit"] * 3
        + ["plain filler words here again ok"] * 3
    )
    sf = _fixture_dir(tmp_path, skip=("documents",))
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(os.path.join(tmp_path, "documents.parquet"))

    toks = [t.lower().split() for t in texts]
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    n_tot = 0
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
            n_tot += 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    import math

    scored = []
    for (a, b), c_ab in bi.items():
        if c_ab > 5:
            ps = _round6((c_ab - 5.0) * n_tot / (float(uni[a]) * uni[b]))
            pmi = _round6(math.log(c_ab * float(n_tot) / (float(uni[a]) * uni[b])))
            scored.append((f"{a} {b}", c_ab, uni[a], uni[b], ps, pmi))
    scored.sort(key=lambda r: (-r[4], r[0]))
    want = [r + (i + 1,) for i, r in enumerate(scored[:20])]
    got = [
        tuple(r)
        for r in REGISTRY["pmi_collocations_topk"]
        .fn.__wrapped__(spark, sf)
        .orderBy("rank")
        .collect()
    ]
    assert ("new york", 8) == (want[0][0], want[0][1])
    assert got == want, (got, want)


def test_transition_matrix_tiebreak_and_horizon(tmp_path, spark):
    """LEAD order under equal timestamps is pinned by event_id, and
    the 12h horizon is inclusive at exactly +12h."""
    t0 = "2024-03-01 00:00:00"
    rows = [
        # user 1: two events at the SAME ts — successor order must
        # follow event_id (view(id2) -> click(id3)), then a +12h-exact
        # transition (click -> error) that must count
        (1, "signup", t0),
        (1, "view", "2024-03-01 01:00:00"),
        (1, "click", "2024-03-01 01:00:00"),
        (1, "error", "2024-03-01 13:00:00"),
        # user 2: gap of 12h + 1s -> transition must NOT count
        (2, "signup", t0),
        (2, "purchase", "2024-03-01 12:00:01"),
    ]
    sf = _fixture_dir(tmp_path, skip=("events",))
    _write_events(tmp_path, rows)
    got = {
        (r.event_type, r.next_type): (r.n, r.p)
        for r in REGISTRY["event_transition_matrix"]
        .fn.__wrapped__(spark, sf)
        .collect()
    }
    assert got == {
        ("signup", "view"): (1, 1.0),
        ("view", "click"): (1, 1.0),
        ("click", "error"): (1, 1.0),
    }, got


def test_ivf_recall_beats_single_band_lsh(spark):
    """The gauge pair's documented claim: cell-probing IVF retrieves
    materially more of the true top-10 than single-band LSH on this
    corpus (whose honest single-band recall is ~0)."""
    ivf = {
        r.query_id: r.recall
        for r in REGISTRY["ivf_recall_at_k"].fn(spark, SF_SMOKE).collect()
    }
    lsh = {
        r.query_id: r.recall
        for r in REGISTRY["lsh_recall_at_k"].fn(spark, SF_SMOKE).collect()
    }
    assert set(ivf) == set(lsh) and len(ivf) == 8
    mean_ivf = sum(ivf.values()) / len(ivf)
    mean_lsh = sum(lsh.values()) / len(lsh)
    assert mean_ivf > mean_lsh + 0.5, (mean_ivf, mean_lsh)
