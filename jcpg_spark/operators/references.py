"""Reference (DDG-layer) triples: reaching def -> use with kill-at-redef.

Reference analog: ``addDataFlowEdges`` (``JavacpgDDGBuilder.java:293-346``)
— for every node with DEFs, a forward DFS adds ``DDG_U`` (def -> use) edges
until the variable is re-defined (kill: ``DDG_D`` def -> redef edge at
:329-335, then the path is abandoned), plus ``SELF_FLOW`` loops for ``++/--``
(:311-314). The reference's path enumeration is exponential and
order-dependent; SURVEY §4.1 replaces it with the deterministic
reaching-definition formulation — an as-of join expressed as a window
(``last(def, ignorenulls)`` over turn order), O(n log n) in one shuffle.

Transcript semantics (the golden definition, encoded in tests/oracle):

- a mention is a DEF when its dictionary surface has ``defs_state`` (stateDEF
  analog, JavacpgMethodLevel.java:3093-3103) OR it is the entity's first
  mention in the conversation (declaration analog).
- per (conv, entity, turn): has_def / has_use aggregate over that turn's
  mentions; edges connect TURN nodes (the reference's DDG connects statement
  nodes, not variables), ``var`` = canonical entity id.
- ``ref.use``   (d, u): use-only turn u binds to the latest def turn d <= u
  not killed in between.
- ``ref.redef`` (d, d'): def turn d' kills the previous def turn d.
- ``ref.self``  (t, t): a turn that both defs and uses the entity
  (the ``x = x + 1`` SELF_FLOW analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jcpg_spark import schema as S


def reference_triples(linked_mentions: DataFrame) -> DataFrame:
    """linked mentions (from linking.link_mentions) -> ref.* triples.

    Physical shape: ONE hash aggregation (per-turn rollup, map-side
    combinable) followed by ONE window pass over (conv, entity) in turn
    order. The per-mention "first mention is a def" rule folds into the
    aggregate via ``min_by(defs_state, ordinal)`` + ``row_number`` on the
    same window, so no second differently-ordered sort is needed.
    """
    # "defs_state of the min-ordinal mention" is parity-encoded into a
    # single min(long): min(ordinal*2 + defs_state) — ordinal monotone in
    # the high bits, flag in the LSB. A min_by here would fall back to
    # sort-based aggregation at data-scale group counts (TypedImperative
    # aggregates lose hash aggregation beyond the ObjectHashAggregate key
    # threshold); min(long) stays in whole-stage-codegen HashAggregate.
    #
    # ONE exchange for agg + window (r6): pre-partitioning by the WINDOW
    # key (conv, canonical) satisfies the aggregation's clustering
    # requirement too (same-key rows are colocated for any superset key),
    # so the per-turn rollup and the turn-order window share a single
    # shuffle instead of agg-keyed + window-keyed back-to-back exchanges.
    # The trade — losing map-side partial aggregation on the mention rows
    # — is cheap by construction (mentions ≈ 1.07x turns in this corpus;
    # the old second exchange carried nearly as many rows as the first):
    # measured 9.3s -> 8.0s for this layer at 6.3M turns on local[4].
    enc = F.col("ordinal").cast("long") * 2 + F.col("defs_state").cast("long")
    pre = linked_mentions.repartition("conv_id", "canonical")
    per_turn = pre.groupBy("conv_id", "canonical", "turn_idx").agg(
        F.count("*").alias("n_mentions"),
        F.sum(F.col("defs_state").cast("int")).alias("n_exp_def"),
        ((F.min(enc) % 2) == 1).alias("first_def_state"),
    )

    w_turns = Window.partitionBy("conv_id", "canonical").orderBy("turn_idx")
    w_prev = w_turns.rowsBetween(Window.unboundedPreceding, -1)
    # intro rule: the entity's first turn's first mention is an implicit def
    # (declaration analog) unless it is already an explicit def.
    intro_bonus = F.when(
        (F.row_number().over(w_turns) == 1) & ~F.col("first_def_state"), F.lit(1)
    ).otherwise(F.lit(0))
    per_turn = per_turn.withColumn("n_def", F.col("n_exp_def") + intro_bonus)
    per_turn = per_turn.select(
        "conv_id",
        "canonical",
        "turn_idx",
        (F.col("n_def") > 0).cast("int").alias("has_def"),
        (F.col("n_mentions") > F.col("n_def")).cast("int").alias("has_use"),
    )
    per_turn = per_turn.withColumn(
        "prev_def_turn",
        F.last(
            F.when(F.col("has_def") == 1, S.turn_node(F.col("conv_id"), F.col("turn_idx"))),
            ignorenulls=True,
        ).over(w_prev),
    )
    # single-pass emission of all three edge kinds (a 3-way union of filters
    # over per_turn would recompute the aggregation + window per branch)
    turn = S.turn_node(F.col("conv_id"), F.col("turn_idx"))

    def edge(src, pred, dst):
        return F.struct(src.alias("src"), F.lit(pred).alias("pred"), dst.alias("dst"))

    arr = F.array_compact(
        F.array(
            F.when(
                (F.col("has_use") == 1)
                & (F.col("has_def") == 0)
                & F.col("prev_def_turn").isNotNull(),
                edge(F.col("prev_def_turn"), "ref.use", turn),
            ),
            F.when(
                (F.col("has_def") == 1) & F.col("prev_def_turn").isNotNull(),
                edge(F.col("prev_def_turn"), "ref.redef", turn),
            ),
            F.when(
                (F.col("has_def") == 1) & (F.col("has_use") == 1),
                edge(turn, "ref.self", turn),
            ),
        )
    )
    out = per_turn.select("conv_id", F.col("canonical").alias("var"), F.explode(arr).alias("m"))
    return out.select(
        F.col("m.src").alias("src"),
        F.col("m.pred").alias("pred"),
        F.col("m.dst").alias("dst"),
        "var",
        "conv_id",
    )


def def_use_rollup(linked_mentions: DataFrame) -> DataFrame:
    """-> (conv_id, turn_idx, defs, uses): the per-turn DEF/USE sets,
    serialized as ';'-joined sorted canonical lists (null when empty).

    Reference analog: the per-node ``defs``/``uses`` arrays the reference
    attaches to every CPG node and carries into its GML/JSON exports
    (``CodePropertyGraph.java:202-203,308-309``). Same def/use semantics as
    ``reference_triples`` (explicit defs_state OR first-mention intro rule;
    a turn USES the entity when it has more mentions than defs), computed
    with the same single hash aggregation + (conv, entity) window, then one
    further map-side-combinable aggregation onto (conv, turn).
    """
    enc = F.col("ordinal").cast("long") * 2 + F.col("defs_state").cast("long")
    # same one-exchange agg+window share as reference_triples (see above)
    pre = linked_mentions.repartition("conv_id", "canonical")
    per_turn = pre.groupBy("conv_id", "canonical", "turn_idx").agg(
        F.count("*").alias("n_mentions"),
        F.sum(F.col("defs_state").cast("int")).alias("n_exp_def"),
        ((F.min(enc) % 2) == 1).alias("first_def_state"),
    )
    w_turns = Window.partitionBy("conv_id", "canonical").orderBy("turn_idx")
    intro_bonus = F.when(
        (F.row_number().over(w_turns) == 1) & ~F.col("first_def_state"), F.lit(1)
    ).otherwise(F.lit(0))
    per_turn = per_turn.withColumn("n_def", F.col("n_exp_def") + intro_bonus)
    return (
        per_turn.groupBy("conv_id", "turn_idx")
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("n_def") > 0, F.col("canonical")))
            ).alias("_defs"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("n_mentions") > F.col("n_def"), F.col("canonical"))
                )
            ).alias("_uses"),
        )
        .select(
            "conv_id",
            "turn_idx",
            F.when(F.size("_defs") > 0, F.concat_ws(";", "_defs")).alias("defs"),
            F.when(F.size("_uses") > 0, F.concat_ws(";", "_uses")).alias("uses"),
        )
    )


def entity_nodes(linked_mentions: DataFrame) -> DataFrame:
    """One node per distinct linked entity."""
    return (
        linked_mentions.groupBy("canonical")
        .agg(F.max("kind").alias("_kind"), F.max("namespace").alias("_ns"))
        .select(
            S.entity_node(F.col("canonical")).alias("node_id"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit("entity").alias("kind"),
            F.col("canonical").alias("label"),
            F.lit(None).cast("int").alias("turn_idx"),
            S.props_map(entity_kind=F.col("_kind"), namespace=F.col("_ns")).alias("props"),
        )
    )
