"""Dynamic DEF-effect propagation — the interprocedural signature fixpoint.

Reference analog: the DDG builder's iterative signature computation —
``argDEFs[i]``/``stateDEF`` learned for a method in iteration k create new
DEFs at that method's call sites in iteration k+1, looping until no
signature changes (``JavacpgDDGBuilder.java:102-117`` the do/while,
``:1429-1441`` signature update, ``:1479-1480`` the changed flag).

Transcript semantics: a dictionary entry's ``defs_state`` bit (does a
mention of this entity REDEFINE its state?) need not be hand-curated — it
can be LEARNED from observed transcripts: an entity that is mentioned in a
tool-role turn (the tool's return surfaced it) and then re-mentioned later
in the same conversation shows def-effect evidence (the conversation kept
referring back to state the tool changed). When at least ``min_evidence``
conversations show the pattern, the entry gains ``defs_state`` for the
next linking pass — exactly the reference's "callee signature learned ->
call sites become DEFs" move.

The loop is driver-steered with changed-count convergence like
``canonicalize.connected_components``: re-link with the updated dictionary
each round, recompute evidence, stop when no bit flips (with the current
evidence rule the fixpoint lands in <= 2 rounds because evidence does not
depend on the bits themselves; richer rules — e.g. counting only
re-mentions currently classified as uses — iterate further and need no
code change here). Per-round cost: one groupBy on (conv, entity) — the
same key the reference layer shuffles on anyway. The dictionary is
broadcast-sized by contract, so the bit update is a driver-side set join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jcpg_spark.operators import linking, mentions


def def_effect_evidence(linked: DataFrame, min_evidence: int = 1) -> DataFrame:
    """-> (canonical) entities with tool-return def-effect evidence in at
    least ``min_evidence`` conversations.

    Evidence in one conversation: some tool-role turn mentions the entity
    AND a later turn mentions it again. Computed as one hash aggregation
    per (conv, entity) — min tool-mention turn vs max mention turn — then
    a distinct-conversation count per entity; no self-join.
    """
    per_conv = linked.groupBy("conv_id", "canonical").agg(
        F.min(F.when(F.col("role") == "tool", F.col("turn_idx"))).alias("first_tool_t"),
        F.max("turn_idx").alias("last_t"),
    )
    ev = per_conv.filter(
        F.col("first_tool_t").isNotNull() & (F.col("last_t") > F.col("first_tool_t"))
    )
    return (
        ev.groupBy("canonical")
        .agg(F.countDistinct("conv_id").alias("n_conv"))
        .filter(F.col("n_conv") >= min_evidence)
        .select("canonical")
    )


def propagate_def_effects(
    spark: SparkSession,
    transcripts: DataFrame,
    dictionary: DataFrame,
    min_evidence: int = 1,
    max_iter: int = 5,
) -> tuple[DataFrame, int, bool]:
    """Learn ``defs_state`` bits from transcripts until fixpoint.

    Returns (updated dictionary DF, rounds, converged). Bits only ever turn
    ON (monotone, like the reference's signature lattice — a learned DEF is
    never unlearned within a build), so the loop terminates in at most
    |dictionary| rounds; convergence is the zero-changed-count round.
    """
    from jcpg_spark.caching import swap_persist

    surfaces = [r["surface"] for r in dictionary.select("surface").distinct().collect()]
    # mention detection does not depend on the learned bits — detect once,
    # persist, and only the (broadcast) re-link runs per fixpoint round
    m = swap_persist(
        "def_effects.mentions", mentions.detect_mentions(spark, transcripts, surfaces)
    )
    cur = dictionary
    rounds = 0
    converged = False
    for rounds in range(1, max_iter + 1):
        linked = linking.link_mentions(m, cur)
        learned = {r["canonical"] for r in def_effect_evidence(linked, min_evidence).collect()}
        # changed = entries whose bit would flip on (dictionary-sized)
        flips = cur.filter(
            ~F.coalesce(F.col("defs_state"), F.lit(False))
            & F.col("canonical").isin(list(learned) or ["\x00"])
        ).count()
        if flips == 0:
            converged = True
            break
        cur = cur.withColumn(
            "defs_state",
            F.coalesce(F.col("defs_state"), F.lit(False))
            | F.col("canonical").isin(list(learned)),
        )
    return cur, rounds, converged
