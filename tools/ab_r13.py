#!/usr/bin/env python
"""Interleaved same-session A/B of the two driver-unconfirmed r12 wins
(VERDICT r12 ask #1): lang_id_counts collapsed-string counting and
simhash_near_dups hash-materialized votes, each vs an exact revert to
the pre-r12 form, at sf0.1 (bench configs) and on the x10 replica
(engine-default configs, like tools/scale_curve.py).

Protocol: ONE session; per round, variant plans are built fresh and
timed through the noop sink in alternating order (A,B then B,A each
round to cancel drift), min-of-N reported per variant — the paired
least-interference estimator OPTIMIZATION_r12.md used, now with the
variants in the SAME JVM so box drift cannot masquerade as a delta.

OUTCOME (recorded in OPTIMIZATION_r13.md): the revert won every
depth — lang_id 1.007x sf0.1 / 0.946x x10, simhash 0.927x sf0.1 /
0.909x x10 / 0.950x x100 (ratios are revert/current minima; <1 means
the pre-r12 form is faster) — so BOTH r12 changes were reverted in
r13 and the "revert" variants below are now identical to the shipped
code. The tool stays as the protocol record and for future re-pairs.

    python tools/ab_r13.py --rounds 5 [--x10]   (AB_FACTOR=100 for x100)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, functions as F  # noqa: E402

from football_etl_spark.functions import text  # noqa: E402
from football_etl_spark.functions.scalars import ColumnOrName  # noqa: E402
from football_etl_spark.operators import dedup  # noqa: E402
from football_etl_spark.operators.scale import ensure_min_partitions  # noqa: E402
from football_etl_spark.plans.queries import REGISTRY  # noqa: E402
from football_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- exact pre-r12 (4d9ecce) forms, reconstructed verbatim ---------------

def lang_id_pre_r12(c: ColumnOrName) -> Column:
    toks = F.transform(text.tokens(c), lambda t: F.lower(t))
    expr = F.lit("und")
    best = F.lit(0)
    for lang, markers in text.LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(marr, t)))
        expr = F.when(score > best, F.lit(lang)).otherwise(expr)
        best = F.greatest(best, score)
    return expr


def simhash_signatures_pre_r12(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 56,
    use_arrow: bool = False,
) -> DataFrame:
    assert not use_arrow
    src = ensure_min_partitions(df.select(id_col, text_col))
    toks = src.select(id_col, F.explode(text.tokens(text_col)).alias("__tok"))
    h = F.conv(F.substring(F.md5("__tok"), 1, bits // 4), 16, 10).cast("long")
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__v{b}")
            for b in range(bits)
        ]
    )
    sig: Column = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"__v{b}") >= 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select(id_col, sig.alias("simhash"))


CASES = {
    # name -> (query, patch_target_module, attr, revert_fn)
    "lang_id_counts": ("lang_id_counts", text, "lang_id", lang_id_pre_r12),
    "simhash_near_dups": (
        "simhash_near_dups",
        dedup,
        "simhash_signatures",
        simhash_signatures_pre_r12,
    ),
}


def run_once(spark, qname: str, sf_dir: str) -> float:
    fn = REGISTRY[qname].fn
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--x10", action="store_true")
    ap.add_argument("--cases", nargs="*", default=list(CASES))
    args = ap.parse_args()

    if args.x10:
        conf = {"spark.sql.shuffle.partitions": "32"}  # scale_curve protocol
    else:
        conf = {  # bench.py protocol
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "262144",
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.adaptive.enabled": "false",
        }
    spark = get_spark(app_name="ab-r13", extra_conf=conf)
    sf_dir = SF_DIR
    if args.x10:
        from tools.scale_curve import generate

        sf_dir = generate(spark, int(os.environ.get("AB_FACTOR", "10")))
    run_once(spark, "top_event_types", SF_DIR)  # warmup

    for case in args.cases:
        qname, mod, attr, revert = CASES[case]
        current = getattr(mod, attr)
        a_times: list[float] = []
        b_times: list[float] = []
        # warm both variants once (codegen caches)
        run_once(spark, qname, sf_dir)
        setattr(mod, attr, revert)
        try:
            run_once(spark, qname, sf_dir)
        finally:
            setattr(mod, attr, current)
        for r in range(args.rounds):
            order = ("A", "B") if r % 2 == 0 else ("B", "A")
            for side in order:
                if side == "A":
                    a_times.append(run_once(spark, qname, sf_dir))
                else:
                    setattr(mod, attr, revert)
                    try:
                        b_times.append(run_once(spark, qname, sf_dir))
                    finally:
                        setattr(mod, attr, current)
        fmt = lambda xs: " ".join(f"{x:.3f}" for x in sorted(xs))  # noqa: E731
        print(
            f"{qname} @ {sf_dir}:\n"
            f"  current(r12) min={min(a_times):.3f} med={sorted(a_times)[len(a_times)//2]:.3f} all=[{fmt(a_times)}]\n"
            f"  revert(pre)  min={min(b_times):.3f} med={sorted(b_times)[len(b_times)//2]:.3f} all=[{fmt(b_times)}]\n"
            f"  paired speedup (revert/current, min): {min(b_times)/min(a_times):.3f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
