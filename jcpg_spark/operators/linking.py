"""Entity linking — broadcast candidate join + scoring + ranked pick.

Reference analog: the method-name candidate lookup ``findDefInfo``
(``JavacpgDDGBuilder.java:561-667``) — a hand-rolled nested-loop theta-join
of each call site against ``methodDEFs.get(name)`` with package / class /
arity / type filters and first-match-wins selection (``:569-577``).

Spark-native form (SURVEY §2.3 J1/J7, §2.5 W5):

The link score depends only on ``(candidate, role, tool)`` — never on the
individual mention — so the rank-1 decision is precomputed on the DICTIONARY
side: cross the (tiny) dictionary with the distinct ``(role, tool)`` contexts
observed in the data, score with ``score_links``, keep the winner per
``(surface, role, tool)``, and broadcast THAT. Linking the 10^12-row mention
table is then a single broadcast hash join with zero shuffle and zero
aggregation on the big side (the reference's per-call-site nested-loop theta
join, ``JavacpgDDGBuilder.java:561-667``, hoisted to the build side — the
same move as its dictionary pre-aggregation at ``:67-84``).

A naive per-mention rank (window or min_by) is a trap at scale: mention ids
are unique, so grouped aggregation degenerates to a sort on the full data
(ObjectHashAggregate falls back to sort-based beyond its key threshold) —
measured 160x slower than the dimension-side precompute on 7M mentions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def score_links(
    prior: pd.Series, kind: pd.Series, namespace: pd.Series, role: pd.Series, tool: pd.Series
) -> pd.Series:
    """Deterministic link score: dictionary prior + context bonuses.

    +0.3 when a tool-kind candidate's namespace matches the turn's invoked
    tool (the reference's enclosing-class check analog,
    JavacpgDDGBuilder.java:585-599); +0.05 for assistant turns (analog of
    the package-preference tie-break, :601-612).
    """
    bonus = ((kind == "tool") & (namespace == tool)).astype("float64") * 0.3
    bonus = bonus + (role == "assistant").astype("float64") * 0.05
    return prior.astype("float64") + bonus


def link_mentions(
    mentions: DataFrame, dictionary: DataFrame, ctx: DataFrame | None = None
) -> DataFrame:
    """-> linked mentions: mention columns + (canonical, kind, namespace,
    score, defs_state). Unresolvable mentions (no dictionary candidate) are
    dropped, mirroring the reference skipping unresolved call sites
    (JavacpgDDGBuilder.java:563-566 returns null -> no edge).

    ``ctx``: optional (role, tool) context DataFrame. Defaults to the
    distinct contexts observed in ``mentions``; STREAMING callers must pass
    a static one (a distinct() on the stream side would be a streaming
    aggregation) — the context space is a tiny known vocabulary, so
    enumerating it statically is free and produces the identical `best`
    table for every context that actually occurs.
    """
    # contexts actually present in the data: tiny (|roles| x |tools|)
    if ctx is None:
        ctx = mentions.select("role", "tool").distinct()
    cand = ctx.crossJoin(dictionary).withColumn(
        "score",
        score_links(
            F.col("prior"), F.col("kind"), F.col("namespace"), F.col("role"), F.col("tool")
        ),
    )
    # rank-1 per (surface, context); min_by over a total ordering key
    # (score desc, canonical asc, namespace asc) — deterministic; the input
    # is dictionary-sized, so the aggregate is trivial.
    payload = [c for c in cand.columns if c not in ("surface", "role", "tool")]
    best = cand.groupBy("surface", "role", "tool").agg(
        F.min_by(
            F.struct(*payload),
            F.struct((-F.col("score")).alias("s"), F.col("canonical"), F.col("namespace")),
        ).alias("best")
    ).select(
        "surface",
        "role",
        F.coalesce(F.col("tool"), F.lit("\x00")).alias("_tool_key"),
        *[F.col(f"best.{c}").alias(c) for c in payload if c != "prior"],
    )
    # broadcast hash join on (surface, role, tool) — null-safe via sentinel
    m = mentions.withColumn("_tool_key", F.coalesce(F.col("tool"), F.lit("\x00")))
    return m.join(F.broadcast(best), on=["surface", "role", "_tool_key"], how="inner").drop(
        "_tool_key"
    )
