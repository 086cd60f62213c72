"""SQL-accessible Python function surface: udf / pandas-UDAF / udtf.

SURVEY §2.8 policy: every reference helper compiles to built-in Column
expressions (zero Python in the hot path — the registry's plan audit
holds 0 row-at-a-time UDFs), but the engine still EXPOSES the escape
hatches as first-class, SQL-registered API surface for the custom
logic a user genuinely can't express in builtins. This module is that
surface:

- ``quality_score_py`` — a vectorized Arrow ``pandas_udf`` scalar
  (batch-at-a-time; the sanctioned scalar escape hatch). It mirrors
  functions/text.quality_score so the test suite can certify the
  registered Python path against the JVM expression it replaces.
- ``weighted_mean_py`` — a ``pandas_udf`` Series→scalar AGGREGATE
  (the Spark 3.5+ spelling of a pandas UDAF): usable in ``groupBy().
  agg()`` and map-side combined per group by the Arrow aggregation
  path.
- ``tokenize_py`` — a Python UDTF (table function, Spark 3.5+): one
  input row → (pos, token) output rows, the per-row expansion shape
  (``LATERAL tokenize_py(text)``) that a scalar UDF cannot produce.
  The builtin twin is ``posexplode(split(...))`` — the UDTF exists
  for logic with no builtin equivalent; the twin lets tests certify
  the mechanism exactly.

All closures are self-contained (no module globals) per the
worker-pickling contract — the driver imports this module from a
foreign cwd and executors never see the repo on PYTHONPATH.

At 100 TB: the pandas_udf paths move Arrow batches (the 10-100x
cheaper Python transport); the UDTF evaluates row-at-a-time and is
therefore documented as the LAST-resort surface — anything
expressible as explode/sequence/builtin stays JVM-side.
"""

# NOTE: deliberately NO `from __future__ import annotations` — it
# stringifies the pd.Series/float type hints that pandas_udf's
# eval-type inference must RESOLVE to classify weighted_mean_py as a
# GROUPED_AGG aggregate (PySpark's typehints resolver rejects
# unresolvable string signatures).
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def register_sql_surface(spark: SparkSession) -> list[str]:
    """Register the Python surface with the session catalog and return
    the registered names. Idempotent — re-registration replaces."""

    @F.pandas_udf("double")
    def quality_score_py(text):
        # self-contained mirror of functions/text.quality_score:
        # len/punct/stopword components, clamped and averaged
        import pandas as pd

        stop = {"the", "a", "and", "of", "to", "in", "is", "it", "for", "on"}

        def one(t):
            if t is None:
                return None
            toks = t.strip().split() if t.strip() else []
            n = len(toks)
            len_c = min(n / 100.0, 1.0)
            punct = sum(1 for ch in t if ch in ".,!?;:")
            punct_c = 1.0 - min((punct / len(t) if t else 0.0) * 5, 1.0)
            stop_c = min(
                (sum(1 for w in toks if w.lower() in stop) / n if n else 0.0) * 4,
                1.0,
            )
            return (len_c + punct_c + stop_c) / 3

        return pd.Series([one(t) for t in text])

    import pandas as pd

    # Series -> scalar type hints are what make pandas_udf infer the
    # GROUPED_AGG eval type (without them it registers as a SCALAR udf
    # and SQL rejects it outside GROUP BY aggregation)
    @F.pandas_udf("double")
    def weighted_mean_py(v: pd.Series, w: pd.Series) -> float:
        num = (v * w).sum()
        den = w.sum()
        return float(num / den) if den else None

    @F.udtf(returnType="pos int, token string")
    class tokenize_py:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split()):
                yield i, t

    spark.udf.register("quality_score_py", quality_score_py)
    spark.udf.register("weighted_mean_py", weighted_mean_py)
    spark.udtf.register("tokenize_py", tokenize_py)
    return ["quality_score_py", "weighted_mean_py", "tokenize_py"]
