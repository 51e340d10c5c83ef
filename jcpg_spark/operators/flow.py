"""Control-flow (CFG-layer) triples via the stable-turn-ordering window (W1/W2).

Reference analog: sequential ``FLOWS_TO`` threading through the
``preNodes``/``preEdges`` stacks (``JavacpgCFGBuilder.java:60-64,769-770,
1865-1883``) and branch edges ``FLOWS_TO_TRUE/FALSE`` (``:801-876``).

The reference threads flow by mutating a stack while visiting statements in
source order — inherently sequential per file. Here the same semantics is a
single ``lag``/``lead`` window over ``(conv_id, turn_idx)``: one hash
exchange on ``conv_id``, then every conversation is processed independently
inside its partition. All downstream per-conversation windows reuse the same
exchange (Catalyst recognizes the identical partitioning), so the whole flow
layer costs ONE shuffle regardless of how many edge kinds are emitted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jcpg_spark import schema as S

def w_conv():
    """The mandated stable-ordering window (north_star): partition by
    conversation, order by turn index. Ties are impossible (turn_idx is a key
    within conv_id). Built lazily — Window specs need an active session."""
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def flow_next(transcripts: DataFrame) -> DataFrame:
    """(turn_i, 'flow.next', turn_{i+1}) — FLOWS_TO analog."""
    nxt = F.lead("turn_idx").over(w_conv())
    return (
        transcripts.select("conv_id", "turn_idx", nxt.alias("next_idx"))
        .filter(F.col("next_idx").isNotNull())
        .select(
            S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
            F.lit("flow.next").alias("pred"),
            S.turn_node(F.col("conv_id"), F.col("next_idx")).alias("dst"),
            F.lit(None).cast("string").alias("var"),
            "conv_id",
        )
    )


def flow_branch(transcripts: DataFrame) -> DataFrame:
    """Branch triples from tool-invoking assistant turns (FLOWS_TO_TRUE/FALSE
    analog, JavacpgCFGBuilder.java:827-875).

    An assistant turn with ``tool`` non-null is a branch point (the reference's
    ``if`` condition node): if the next turn has role 'tool' the invocation was
    taken -> ``flow.branch_true``; otherwise the conversation continued past it
    -> ``flow.branch_false``.
    """
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        F.lead("turn_idx").over(w_conv()).alias("next_idx"),
        F.lead("role").over(w_conv()).alias("next_role"),
    ).filter(
        (F.col("role") == "assistant") & F.col("tool").isNotNull() & F.col("next_idx").isNotNull()
    )
    pred = F.when(F.col("next_role") == "tool", F.lit("flow.branch_true")).otherwise(
        F.lit("flow.branch_false")
    )
    return t.select(
        S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        pred.alias("pred"),
        S.turn_node(F.col("conv_id"), F.col("next_idx")).alias("dst"),
        F.col("tool").alias("var"),
        "conv_id",
    )
