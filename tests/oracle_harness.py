"""Local replica of the driver's Spark-vs-DuckDB comparison.

Used by tests/test_oracle.py so every registry entry is cross-checked
before the driver ever sees it: row count, sorted-by-name column sets,
and order-insensitive value comparison (exact, matching the driver's
value-hash discipline)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            # canonicalize IEEE -0.0: engines legitimately differ on
            # the sign of a rounded zero (Spark's BigDecimal HALF_UP
            # vs DuckDB's sign-preserving round); the values compare
            # equal but repr differs, which would misalign the
            # repr-keyed row sort
            return 0.0
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _key(row):
    return tuple((x is None, str(type(x)), x) if not isinstance(x, tuple) else (False, "t", x) for x in row)


def _driver_compat_problems(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Replicate the two ways the DRIVER's pandas canonicalizer can
    reject values this harness would accept (seen in CORRECTNESS_r03):

    1. DuckDB HUGEINT (uncast integer SUM) lands in pandas as float64
       while Spark emits int64 — the value-hash diverges even when the
       numbers are equal. Detected by comparing pandas dtype *kinds*
       per column: one side integer, the other float = red.
    2. Array-typed result columns crash the driver's sort/hash
       (pandas ``sort_values`` → "unhashable type: 'list'"). Detected
       by flagging any list/ndarray cell on either side.
    3. (CORRECTNESS_r10, ``lorenz_gini_order_value``) Decimal-typed
       result columns: Spark's ``toPandas`` keeps DECIMAL as object
       cells of ``Decimal('339624801.40')`` while DuckDB's ``fetchdf``
       converts its identical DECIMAL to float64 ``339624801.4`` — the
       driver's stringified value-hash diverges even though every
       value is numerically exact. This harness normalizes Decimal→
       float (``_norm``) so plain ``compare`` stays green — the exact
       blind spot the r10 driver red slipped through. Detected by
       flagging ANY ``Decimal`` cell on either side: the only safe
       final schema for the driver is to CAST to DOUBLE (or a string)
       on both sides.
    """
    import numpy as np

    problems: list[str] = []
    s_pdf = spark_df.limit(100).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    d_pdf = con.execute(f"SELECT * FROM ({oracle_sql}) LIMIT 100").df()
    con.close()

    s_kinds = {c: s_pdf[c].dtype.kind for c in s_pdf.columns}
    d_kinds = {c: d_pdf[c].dtype.kind for c in d_pdf.columns}
    for c in set(s_kinds) & set(d_kinds):
        pair = {s_kinds[c], d_kinds[c]}
        if pair == {"i", "f"} or pair == {"u", "f"}:
            problems.append(
                f"driver-compat: column {c!r} int-vs-float dtype divergence "
                f"(spark={s_kinds[c]}, duckdb={d_kinds[c]}) — driver value-hash "
                "will mismatch; CAST the oracle (or spark) side"
            )
    for name, pdf in (("spark", s_pdf), ("duckdb", d_pdf)):
        for c in pdf.columns:
            if pdf[c].dtype.kind != "O":
                continue
            head = pdf[c].head(5)
            if any(isinstance(v, (list, np.ndarray)) for v in head):
                problems.append(
                    f"driver-compat: {name} column {c!r} holds arrays — the "
                    "driver canonicalizer cannot sort/hash lists; emit long form"
                )
            if any(isinstance(v, Decimal) for v in head):
                problems.append(
                    f"driver-compat: {name} column {c!r} holds Decimal cells — "
                    "the driver value-hash stringifies Decimal('1.40') != "
                    "float64 1.4 (the r10 lorenz red); CAST to DOUBLE on both "
                    "sides"
                )
    return problems


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")

    # align column order by sorted name (driver sorts columns by name)
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    d_idx = [d_cols.index(c) for c in sorted(d_cols)]
    s_set = sorted((tuple(_norm(r[i]) for i in s_idx) for r in s_rows), key=repr)
    d_set = sorted((tuple(_norm(r[i]) for i in d_idx) for r in d_rows), key=repr)
    if problems:
        return problems

    n_bad = 0
    for a, b in zip(s_set, d_set):
        if a != b:
            n_bad += 1
            if n_bad <= 5:
                problems.append(f"row mismatch:\n  spark : {a}\n  duckdb: {b}")
    if n_bad > 5:
        problems.append(f"... {n_bad} mismatching rows total")
    if not problems:
        problems.extend(_driver_compat_problems(spark_df, oracle_sql, sf_dir))
    return problems
