"""Conjunctive triple-pattern queries over the constructed KG (SPARQL BGP).

The reference emits its graph for downstream querying (Joern-style
tooling over the DOT/GML/JSON exports, ``CodePropertyGraph.java:84-381``);
this engine makes the query step itself a first-class distributed
operator: a basic graph pattern — a conjunction of (subject, predicate,
object) triple patterns with shared variables — evaluated as relational
joins over the edges table, which is exactly how SPARQL engines built on
relational backends execute BGPs (and why characteristic sets,
``graph_analytics.characteristic_sets``, are THE join-cardinality
statistic for them).

Scale posture:
- each pattern's constant terms become per-pattern filters on the edges
  scan (predicate constants reach the parquet scan as pushed filters —
  the triple store's "POS index probe" analog);
- patterns join on their shared variables — hash joins keyed on bound
  variable columns, nothing driver-side;
- a pattern sharing NO variable with the patterns before it would be a
  cartesian product; that is rejected loudly rather than executed,
  because at 10^12 edges an accidental cross join is a cluster-killer.
  Reorder the patterns so each one connects (any connected pattern graph
  admits such an order).

Bag semantics (duplicate bindings preserved), like SPARQL SELECT without
DISTINCT and like SQL — so an exact SQL oracle can mirror results
row-for-row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TriplePattern = Sequence[str]  # (subject, predicate, object), '?'-prefixed = var


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _pattern_df(edges: DataFrame, pat: TriplePattern) -> DataFrame:
    """One triple pattern -> DataFrame with one column per DISTINCT
    variable. Constants filter; a variable repeated inside the pattern
    (e.g. ``(?x, loops, ?x)``) becomes an equality filter."""
    if len(pat) != 3:
        raise ValueError(f"triple pattern must have 3 terms, got {pat!r}")
    df = edges.select("src", "pred", "dst")
    seen: dict[str, str] = {}
    sel = []
    for term, col in zip(pat, ("src", "pred", "dst")):
        if _is_var(term):
            var = term[1:]
            if not var:
                raise ValueError("'?' alone is not a variable name")
            if var in seen:
                df = df.where(F.col(col) == F.col(seen[var]))
            else:
                seen[var] = col
                sel.append(F.col(col).alias(var))
        else:
            df = df.where(F.col(col) == F.lit(term))
    if not sel:
        raise ValueError(
            f"all-constant pattern {pat!r}: an existence test binds nothing; "
            "give at least one term a variable"
        )
    return df.select(*sel)


def match_pattern(edges: DataFrame, patterns: Sequence[TriplePattern]) -> DataFrame:
    """Evaluate a basic graph pattern over ``edges`` (src, pred, dst).

    -> one column per variable (without the '?'), one row per binding of
    all variables such that every pattern matches (bag semantics).
    Patterns are joined left-to-right on their shared variables; each
    pattern must share at least one variable with the ones before it
    (see module docstring — accidental cartesian products are rejected).
    """
    if not patterns:
        raise ValueError("empty pattern list")
    result: DataFrame | None = None
    bound: set[str] = set()
    for pat in patterns:
        pdf = _pattern_df(edges, pat)
        pvars = set(pdf.columns)
        if result is None:
            result, bound = pdf, pvars
            continue
        shared = sorted(bound & pvars)
        if not shared:
            raise ValueError(
                f"pattern {tuple(pat)!r} shares no variable with the "
                f"already-bound set {sorted(bound)} — this would be a "
                "cartesian product; reorder the patterns"
            )
        result = result.join(pdf, on=shared)
        bound |= pvars
    return result.select(*sorted(bound))
