"""Broadcast-hint convention auditor — the 100 TB hint contract.

Convention (established by the r7 hint audit and the r8
ratio_to_parent fix, applied repo-wide in r9): a forced
``F.broadcast()`` hint is only legal on a relation whose cardinality
is BOUNDED — independent of the data scale factor. Fixed-cardinality
dimensions (nation=25, region=5), global (ungrouped) aggregates
(≤1 row by construction), limited subtrees, and literal in-memory
relations qualify. An SF-proportional relation (customer, orders,
lineitem, part, supplier, events, documents, embeddings, or anything
derived from them without a bounding operation) must NOT carry a
hint: at bench SF the planner/AQE picks the identical broadcast join
from size stats alone, and at 100 TB a forced broadcast of a
terabyte-scale side OOMs every executor, while the unhinted plan
degrades gracefully to a shuffle join.

``audit_hints`` walks a DataFrame's ANALYZED logical plan (so it sees
``ResolvedHint`` nodes before the optimizer folds them into join
strategies), and for every broadcast hint decides:

- subtree scans no SF-scaled parquet table            -> OK (bounded
  dims, literal relations, range sources);
- subtree contains a global Aggregate (no grouping
  keys -> at most one row crosses the wire)           -> OK;
- subtree contains a GlobalLimit                      -> OK;
- otherwise                                           -> VIOLATION
  unless the (query, tables) site is explicitly allowlisted with a
  written justification for why its cardinality is bounded by
  something the plan walker cannot see (a bounded grouping domain,
  a vocabulary-sized key set, an argmax filter).

The allowlist lives with the pytest (tests/test_hint_convention.py)
so every exception is reviewed where the gate is enforced.
"""

from __future__ import annotations

# Parquet tables whose row count grows with the scale factor. nation
# and region are fixed-cardinality by the data model and deliberately
# absent.
SF_SCALED_TABLES = frozenset(
    {
        "customer",
        "orders",
        "lineitem",
        "part",
        "supplier",
        "partsupp",
        "events",
        "documents",
        "embeddings",
    }
)


def _walk(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _node_name(node) -> str:
    return node.getClass().getSimpleName()


def _relation_tables(node) -> set[str]:
    """Names of parquet tables scanned anywhere under ``node``."""
    tables: set[str] = set()
    for m in _walk(node):
        if _node_name(m) != "LogicalRelation":
            continue
        try:
            paths = m.relation().location().rootPaths()
        except Exception:  # non-file relation (in-memory, stream)
            continue
        for i in range(paths.size()):
            leaf = paths.apply(i).getName()
            tables.add(leaf.removesuffix(".parquet"))
    return tables


def _is_bounded(hint_subtree) -> bool:
    """True when the subtree provably bounds its own cardinality:
    a global (ungrouped) aggregate yields at most one row, and a
    GlobalLimit yields at most its literal limit."""
    for m in _walk(hint_subtree):
        name = _node_name(m)
        if name == "Aggregate" and m.groupingExpressions().size() == 0:
            return True
        if name in ("GlobalLimit", "Limit"):
            return True
    return False


def audit_hints(df) -> list[dict]:
    """Audit every broadcast ResolvedHint in ``df``'s analyzed plan.

    Returns one record per hint:
    ``{"tables": frozenset, "sf_tables": frozenset, "bounded": bool}``
    A record is a convention violation when ``sf_tables`` is non-empty
    and ``bounded`` is False (subject to the caller's allowlist).
    """
    analyzed = df._jdf.queryExecution().analyzed()
    records = []
    for node in _walk(analyzed):
        if _node_name(node) not in ("ResolvedHint", "UnresolvedHint"):
            continue
        child = node.children().apply(0)
        tables = _relation_tables(child)
        records.append(
            {
                "tables": frozenset(tables),
                "sf_tables": frozenset(tables & SF_SCALED_TABLES),
                "bounded": _is_bounded(child),
            }
        )
    return records


def violations(df, allow: frozenset = frozenset()) -> list[dict]:
    """Hint records that break the convention and are not allowlisted.

    ``allow`` holds frozensets of table names: a hint whose sf_tables
    exactly matches an entry is sanctioned (the pytest carries the
    written justification next to each entry).
    """
    return [
        r
        for r in audit_hints(df)
        if r["sf_tables"] and not r["bounded"] and r["sf_tables"] not in allow
    ]
