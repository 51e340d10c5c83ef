"""Entity linking — broadcast candidate join + scoring + ranked pick.

Reference analog: the method-name candidate lookup ``findDefInfo``
(``JavacpgDDGBuilder.java:561-667``) — a hand-rolled nested-loop theta-join
of each call site against ``methodDEFs.get(name)`` with package / class /
arity / type filters and first-match-wins selection (``:569-577``).

Spark-native form (SURVEY §2.3 J1, §2.5 W5):

1. ``mentions LEFT JOIN broadcast(dictionary) ON surface`` — a broadcast
   hash join; the dictionary is the small build side exactly like the
   reference's in-memory map, but executor-resident instead of static.
2. ``score_links`` — vectorized scoring of (mention, candidate) pairs;
   replaces the reference's theta conditions with a deterministic score.
3. rank-1 pick — ``row_number`` over (score DESC, canonical ASC) per
   mention; replaces list-order first-match-wins with an explicit,
   partition-stable ordering.

The ranking window partitions by mention id, i.e. by ``(conv_id, turn_idx,
ordinal)``; because candidates-per-surface is tiny (<=3), AQE coalesces this
into a cheap shuffle; at 10^12-turn scale the candidate multiplicity stays
bounded so no skew can form on the mention side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
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


def link_mentions(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """-> linked mentions: mention columns + (canonical, kind, namespace,
    score, defs_state). Unresolvable mentions (no dictionary candidate) are
    dropped, mirroring the reference skipping unresolved call sites
    (JavacpgDDGBuilder.java:563-566 returns null -> no edge).
    """
    cand = mentions.join(F.broadcast(dictionary), on="surface", how="inner")
    cand = cand.withColumn(
        "score",
        score_links(
            F.col("prior"), F.col("kind"), F.col("namespace"), F.col("role"), F.col("tool")
        ),
    )
    w = Window.partitionBy("conv_id", "turn_idx", "ordinal").orderBy(
        F.desc("score"), F.asc("canonical")
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk", "prior")
    )
