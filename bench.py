#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is forced through the `noop` sink so the full result set
materializes (a bare count() would let Catalyst prune most of the
work). One warmup of the smallest query amortizes JVM/codegen start.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from football_etl_spark.plans.queries import REGISTRY  # noqa: E402
from football_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship spine + the heaviest operator families
# (agg, window, as-of, joins, text, dedup, similarity).
HEADLINE = [
    "flagship_order_enrichment",
    "pricing_summary",
    "regional_revenue",
    "rolling_customer_metrics",
    "purchase_asof_login",
    "user_sessions",
    "top3_orders_per_customer",
    "text_quality_stats",
    "dedup_exact_documents",
    "minhash_near_dups",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
]


def run_query(spark, name: str) -> float:
    fn = REGISTRY[name].fn
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="football-etl-spark-bench")
    # warmup: JVM + codegen + parquet footer caches
    run_query(spark, "top_event_types")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_query(spark, name), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
