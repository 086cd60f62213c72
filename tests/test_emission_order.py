"""The staleness-rotating emission order is load-bearing: the driver's
per-round correctness gate samples the FIRST ~50 names of queries(),
so the ordering policy (never-sampled first, then oldest latest
driver row, stable within ties) decides which entries get hard
external re-certification each round. Pin it."""

from __future__ import annotations

from football_etl_spark.plans import queries as Q


def test_emission_order_policy(monkeypatch):
    names = list(Q.REGISTRY)
    # synthetic history: three cohorts — never sampled, old round, new
    never, old, new = names[0], names[1], names[2]
    hist = {n: 4 for n in names}
    hist.pop(never)
    hist[old] = 1
    hist[new] = 5
    monkeypatch.setattr(Q, "_driver_history", lambda: hist)
    order = Q._emission_order()
    assert set(order) == set(names)
    assert order[0] == never  # never-sampled leads
    assert order[1] == old  # then the stalest
    assert order[-1] == new  # freshest round goes last
    # ties keep registry order (stable rotation, no reshuffling)
    r4_block = [n for n in order if hist.get(n) == 4]
    assert r4_block == [n for n in names if hist.get(n) == 4]


def test_emission_order_degrades_to_registry_order_without_history(monkeypatch):
    monkeypatch.setattr(Q, "_driver_history", lambda: {})
    assert Q._emission_order() == list(Q.REGISTRY)


def test_current_history_reads_committed_rounds():
    hist = Q._driver_history()
    # every round file contributes; entries sampled in r1-r4 resolve
    assert hist, "no CORRECTNESS history found at repo root"
    assert max(hist.values()) >= 4
    # the three rows-only sketches were sampled in r4 → near the back
    order = Q._emission_order()
    tail = order[len(order) // 2 :]
    for n in ("approx_distinct_users", "hll_user_reach", "approx_order_percentiles"):
        assert n in tail, n
