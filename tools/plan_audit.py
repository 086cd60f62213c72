#!/usr/bin/env python
"""Physical-plan audit over the whole query registry.

For every registry entry, compile the plan at $SPARK_GRAFT_SF_DIR
(default sf0.001 — plan SHAPE is what matters, not data volume) and
tabulate the properties the 100 TB design contract cares about:

- hash-shuffle exchanges (each is a full repartition of its input)
- broadcast vs sort-merge joins (a dim join must never shuffle the
  fact side)
- cartesian products (must be zero)
- Python stages (Arrow-vectorized or grouped-map — the sanctioned
  escape hatches; row-at-a-time PythonUDF must be zero)
- whether any parquet scan carries pushed filters / partition filters

Writes PLAN_AUDIT.md (markdown table + totals). The suite in
tests/test_plans.py asserts the load-bearing subset of these
properties per query; this tool makes the whole registry legible at
once.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_etl_spark.plans.queries import REGISTRY, STAGED  # noqa: E402
from football_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def plan_of(df) -> tuple[str, str]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    formatted = buf.getvalue()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    simple = buf.getvalue().split("== Initial Plan ==")[0]
    return simple, formatted


def main() -> None:
    spark = get_spark(app_name="plan-audit", shuffle_partitions=8)
    rows = []
    entries = {**REGISTRY, **{f"{n} (staged)": q for n, q in STAGED.items()}}
    for name in sorted(entries):
        df = entries[name].fn(spark, SF_DIR)
        simple, formatted = plan_of(df)
        shuffles = simple.count("Exchange hashpartitioning")
        bhj = simple.count("BroadcastHashJoin")
        smj = simple.count("SortMergeJoin")
        cart = simple.count("CartesianProduct")
        bnl = simple.count("BroadcastNestedLoopJoin")
        arrow = simple.count("ArrowEvalPython")
        grouped = (
            simple.count("FlatMapGroupsInPandas")
            + simple.count("MapInPandas")
            # r12: grouped_zscore moved to the Arrow-native grouped map
            + simple.count("FlatMapGroupsInArrow")
            + simple.count("MapInArrow")
        )
        rowudf = len(re.findall(r"BatchEvalPython", simple))
        pushed = "yes" if re.search(r"PushedFilters: \[[^\]]", formatted) else ""
        partf = "yes" if re.search(r"PartitionFilters: \[[^\]]", formatted) else ""
        rows.append(
            (name, shuffles, bhj, smj, cart + bnl, arrow, grouped, rowudf, pushed, partf)
        )

    out = [
        "# PLAN_AUDIT — physical-plan properties of every registry entry",
        "",
        f"Compiled at `{SF_DIR}` (plan shape, not data volume). Columns:",
        "hash-shuffle exchange count; broadcast-hash vs sort-merge join",
        "counts; cartesian/nested-loop joins (sanctioned only for the",
        "explicitly broadcast bounded ANN query side); Arrow-vectorized",
        "and grouped-map (applyInPandas/applyInArrow/mapInPandas/mapInArrow)",
        "Python stages; row-at-a-time Python",
        "UDFs (must be 0 everywhere); scan pushdown flags.",
        "",
        "Sanctioned SMJs: the connected-components label joins",
        "(near_dup/minhash/canonical clusters — both sides pair-scale),",
        "the full-outer reconciliation (full outer cannot build a",
        "broadcast hash side), and incremental_corpus_dedup's verdict",
        "left-join (both sides increment-sized — co-shuffling them on",
        "new_id is the correct plan at any increment size). Sanctioned",
        "cart/BNLJ: the explicitly broadcast bounded sides listed in",
        "test_plans.py, plus 1-row scalar broadcasts (doc-count /",
        "threshold / totals patterns).",
        "",
        "| query | shuffles | BHJ | SMJ | cart/BNLJ | arrow | grouped-map | row-udf | pushed | part-pruned |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append("| " + " | ".join(str(x) for x in r) + " |")
    t = lambda i: sum(r[i] for r in rows)  # noqa: E731
    out += [
        "",
        f"**Totals over {len(rows)} entries:** {t(1)} hash shuffles, "
        f"{t(2)} broadcast-hash joins, {t(3)} sort-merge joins, "
        f"{t(4)} cartesian/nested-loop joins, {t(5)} Arrow stages, "
        f"{t(6)} grouped-map stages (pandas or Arrow), {t(7)} row-at-a-time "
        f"Python UDFs.",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLAN_AUDIT.md ({len(rows)} entries)")


if __name__ == "__main__":
    main()
