#!/usr/bin/env python
"""DuckDB comparator for the headline bench: run the oracle SQL on
the SAME sf0.1 parquet, warm min-of-2 with fetchall materialization —
the methodology the round judges use for the bench_vs_baseline ratio.
Prints one JSON line.

Timing uses ``perf_oracle or oracle``: when a correctness oracle was
ported to the engine-shared SQL subset for the dual surface (r12),
the portable spelling can be SLOWER on DuckDB than its native one
(split_part fan-out vs UNNEST) — and a slower DuckDB side would
flatter Spark's ratio. The native twin keeps the pairing honest;
result-equality of the two texts is gated in
tests/test_round12_wave.py::test_perf_oracle_matches_portable_oracle.

Queries with no oracle (none in the headline set) are skipped.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import HEADLINE, SF_DIR  # noqa: E402
from football_etl_spark.plans.queries import REGISTRY  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = REGISTRY[name].perf_oracle or REGISTRY[name].oracle
        if sql is None:
            continue
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs[1:]), 4)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_total_runtime_steady_state",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
