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


def test_history_reads_fixture_rounds(tmp_path):
    """_driver_history parses CORRECTNESS_r*.json round files and keeps
    the LATEST round per entry. Fixture-pinned: the live repo-root
    artifact is rewritten by the driver every round, so any positional
    assertion against it breaks the moment a new round lands (the r5
    verdict's one red test). Synthetic files only."""
    import json

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": {"hash_match": True}, "b": {"hash_match": False}})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"b": {"hash_match": True}, "c": {"err": "no_oracle"}})
    )
    # garbled file is skipped, not fatal
    (tmp_path / "CORRECTNESS_r02.json").write_text("{not json")
    # non-matching filename is ignored
    (tmp_path / "CORRECTNESS_final.json").write_text(json.dumps({"z": {}}))
    hist = Q._driver_history(tmp_path)
    # red rows and no_oracle rows still count as "sampled" (driver saw them)
    assert hist == {"a": 1, "b": 3, "c": 3}


def test_live_emission_order_invariants():
    """The invariants that actually matter on the live tree, phrased so
    they hold for ANY committed history: every never-sampled name
    precedes every sampled one, latest-round is non-decreasing along
    the order, and ties keep registry order."""
    hist = Q._driver_history()
    assert hist, "no CORRECTNESS history found at repo root"
    order = Q._emission_order()
    assert set(order) == set(Q.REGISTRY)
    rounds = [hist.get(n, -1) for n in order]
    assert rounds == sorted(rounds), "latest-round must be non-decreasing"
    idx = {n: i for i, n in enumerate(Q.REGISTRY)}
    for a, b in zip(order, order[1:]):
        if hist.get(a, -1) == hist.get(b, -1):
            assert idx[a] < idx[b], f"tie ({a},{b}) must keep registry order"
