"""Structural (AST-layer) nodes and triples.

Reference analog: the AST hierarchy edges emitted by the CFG builder's
visitor (``JavacpgCFGBuilder.java:196,228``) and node construction on
fixpoint iteration 1 (``JavacpgDDGBuilder.java:903-910``). Here the
"syntax tree" of a conversation is conversation -> turns -> mentions, all
derivable with pure projections — no shuffle at all (node ids are content
keys, so no ordering or numbering pass is needed, unlike the reference's
export-time numbering at ``CodePropertyGraph.java:95-113``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jcpg_spark import schema as S


def turn_nodes(transcripts: DataFrame) -> DataFrame:
    """One node per turn, kind='turn', label=role; props = the CPGNode
    bag analog (role/tool/n_chars ~ the reference's type/code/line
    accessors, CPGNode.java:89-126)."""
    return transcripts.select(
        S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("node_id"),
        "conv_id",
        F.lit("turn").alias("kind"),
        F.col("role").alias("label"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        S.props_map(
            role=F.col("role"),
            tool=F.col("tool"),
            n_chars=F.length(F.col("text")),
        ).alias("props"),
    )


# Sentence separator: punctuation run + whitespace. The same pattern is
# used by the JVM split here, the Python boundary scan in
# mentions.detect_mentions (sent_idx assignment), the pandas oracle, and
# the DuckDB driver oracle (RE2 has no lookbehind, so the separator is
# consumed rather than looked-behind; terminal punctuation on the final
# fragment is stripped explicitly to keep all engines identical).
SENTENCE_SEP_RX = r"[.!?]+\s+"


def sentences(transcripts: DataFrame) -> DataFrame:
    """-> (conv_id, turn_idx, sent_idx, sentence): within-turn sentence
    split — the honest analog of the reference's intra-statement expression
    subtrees (CPGNode.java:13-57 has 44 node kinds below the statement;
    here turns ≈ statements per the north_rule mapping and sentences are
    the next level down). Pure JVM split + posexplode: map-side, no UDF,
    no shuffle. ``sent_idx`` is the pre-filter fragment position so it
    matches the Python boundary scan even when empty fragments (text
    starting with a separator) are dropped."""
    frags = F.split(F.col("text"), SENTENCE_SEP_RX)
    out = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.posexplode(frags).alias("sent_idx", "raw"),
    )
    return out.filter(F.col("raw") != "").select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        F.regexp_replace(F.col("raw"), r"[.!?]+$", "").alias("sentence"),
    )


def sentence_nodes(transcripts: DataFrame) -> DataFrame:
    """One node per sentence, kind='sentence', label = the sentence text."""
    s = sentences(transcripts)
    return s.select(
        S.sentence_node(F.col("conv_id"), F.col("turn_idx"), F.col("sent_idx")).alias(
            "node_id"
        ),
        "conv_id",
        F.lit("sentence").alias("kind"),
        F.col("sentence").alias("label"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        S.props_map(
            sent_idx=F.col("sent_idx"), n_chars=F.length(F.col("sentence"))
        ).alias("props"),
    )


def sentence_triples(transcripts: DataFrame) -> DataFrame:
    """(turn, 'ast.has_sentence', sentence) — within-turn AST depth
    (statement -> expression containment analog, JavacpgCFGBuilder.java:
    196,228 visitor emitting child edges)."""
    s = sentences(transcripts)
    return s.select(
        S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        F.lit("ast.has_sentence").alias("pred"),
        S.sentence_node(F.col("conv_id"), F.col("turn_idx"), F.col("sent_idx")).alias(
            "dst"
        ),
        F.lit(None).cast("string").alias("var"),
        "conv_id",
    )


def conversation_nodes(transcripts: DataFrame) -> DataFrame:
    """One node per conversation (distinct-agg; map-side partial combine)."""
    return transcripts.groupBy("conv_id").agg(F.count("*").alias("_n")).select(
        S.conv_node(F.col("conv_id")).alias("node_id"),
        "conv_id",
        F.lit("conversation").alias("kind"),
        F.col("conv_id").alias("label"),
        F.lit(None).cast("int").alias("turn_idx"),
        S.props_map(n_turns=F.col("_n")).alias("props"),
    )


def segment_nodes(transcripts: DataFrame) -> DataFrame:
    """One synthetic region node per topic segment, kind='segment'
    (FOLLOW-region analog, JavacpgCFGBuilder.java:1915-1956). Each
    region-opening turn IS the segment — one row per segment falls out of
    the boundary filter with no extra aggregation."""
    from jcpg_spark.operators.flow import segment_index

    t = segment_index(transcripts)
    return t.filter(F.col("is_break")).select(
        S.segment_node(F.col("conv_id"), F.col("seg")).alias("node_id"),
        "conv_id",
        F.lit("segment").alias("kind"),
        F.col("seg").cast("string").alias("label"),
        F.col("turn_idx").cast("int").alias("turn_idx"),  # opening turn
        S.props_map(opens_at=F.col("turn_idx")).alias("props"),
    )


def ast_has_turn(transcripts: DataFrame) -> DataFrame:
    """(conversation, 'ast.has_turn', turn) — pure projection, no shuffle."""
    return transcripts.select(
        S.conv_node(F.col("conv_id")).alias("src"),
        F.lit("ast.has_turn").alias("pred"),
        S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("dst"),
        F.lit(None).cast("string").alias("var"),
        "conv_id",
    )


def act_role(transcripts: DataFrame) -> DataFrame:
    """(turn, 'act.role', role:<role>) — speaker-act triples."""
    return transcripts.select(
        S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        F.lit("act.role").alias("pred"),
        S.role_node(F.col("role")).alias("dst"),
        F.lit(None).cast("string").alias("var"),
        "conv_id",
    )


def conversation_audit(transcripts: DataFrame) -> DataFrame:
    """Chat-format well-formedness audit, one row per conversation — the
    ingest gate an instruction-tuning pipeline runs before a transcript is
    allowed into training data (and the transcript analog of the
    reference's parse-validity precondition, JavacpgCFGBuilder accepting
    only files its parser validated).

    Flags per conversation:
    - ``first_role_ok``   — the opening turn is spoken by 'user';
    - ``alternates_ok``   — no two ADJACENT turns share a role (a stuck
      speaker is the classic scrape artifact; tool interleave still
      alternates because the role changes);
    - ``nonempty_ok``     — every turn has non-blank text;
    - ``ts_monotone_ok``  — timestamps never decrease in turn order;
    - ``contiguous_ok``   — turn_idx is exactly 0..n-1 (no gaps/dupes);
    - ``wellformed``      — the conjunction.

    One window pass (lag over the conv-ordered turns) + one conv-keyed
    hash-agg; at 10^12 turns both shuffle on conv_id and the window and
    the agg reuse the same partitioning (a single exchange end-to-end).
    """
    from jcpg_spark.operators.flow import w_conv

    prev_role = F.lag("role").over(w_conv())
    prev_ts = F.lag("ts").over(w_conv())
    t = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        (F.col("role") == F.coalesce(prev_role, F.lit(""))).alias("stuck"),
        (F.col("ts") < F.coalesce(prev_ts, F.col("ts"))).alias("ts_back"),
        (F.length(F.trim(F.col("text"))) > 0).alias("has_text"),
        F.when(F.col("turn_idx") == 0, F.col("role")).alias("role0"),
    )
    return t.groupBy("conv_id").agg(
        F.count("*").cast("int").alias("n_turns"),
        (F.max("role0") == F.lit("user")).alias("first_role_ok"),
        (~F.max("stuck")).alias("alternates_ok"),
        F.min("has_text").alias("nonempty_ok"),
        (~F.max("ts_back")).alias("ts_monotone_ok"),
        (
            (F.min("turn_idx") == 0)
            & (F.max("turn_idx") == F.count("*") - 1)
            & (F.count_distinct("turn_idx") == F.count("*"))
        ).alias("contiguous_ok"),
    ).withColumn(
        "wellformed",
        F.col("first_role_ok") & F.col("alternates_ok") & F.col("nonempty_ok")
        & F.col("ts_monotone_ok") & F.col("contiguous_ok"),
    )
