"""Dev survey for the int64-sum overflow gate: walk every registry
entry's ANALYZED plan, list every non-TRY Sum whose child is an
integral type, and whether the plan carries an assert_true backstop.

The CANONICAL gate (with the justified-bound allowlist and the
seeded-violation pin) is tests/test_sum_overflow_gate.py — this
script is the exploratory companion that prints the raw hit list."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402


def walk_plan(plan):
    """Yield every JVM Expression in a logical plan tree (expressions
    of every node, recursively, plus each expression's subtree)."""
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
                # subquery expressions hide a nested plan
                if hasattr(e, "plan"):
                    try:
                        stack.append(e.plan())
                    except Exception:
                        pass
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))


def integral_sums(df):
    """(sum_exprs, has_assert) for a DataFrame's analyzed plan."""
    plan = df._jdf.queryExecution().analyzed()
    sums, has_assert = [], False
    for e in walk_plan(plan):
        cls = e.getClass().getSimpleName()
        if cls == "AssertTrue":
            has_assert = True
        if cls == "Sum":
            s = e.toString()
            child = e.children().apply(0)
            dt = str(child.dataType().simpleString())
            if not s.startswith("try_sum") and dt in (
                "bigint", "int", "smallint", "tinyint",
            ):
                sums.append((dt, s[:90]))
    return sums, has_assert


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    from football_etl_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    for name, ent in REGISTRY.items():
        try:
            df = ent.fn.__wrapped__(spark, sf)
            sums, has_assert = integral_sums(df)
        except Exception as ex:
            print(f"{name}\tERR\t{type(ex).__name__}: {str(ex)[:80]}")
            continue
        if sums:
            tag = "GUARDED" if has_assert else "BARE"
            for dt, s in sums:
                print(f"{name}\t{tag}\t{dt}\t{s}")


if __name__ == "__main__":
    main()
