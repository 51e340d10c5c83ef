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


def flow_next_salted(transcripts: DataFrame, chunk_size: int = 100_000) -> DataFrame:
    """Skew-safe flow threading: salt hot conversations by turn-range chunk.

    The plain window puts an entire conversation in ONE task; a pathological
    conversation (north_star: hot conversations at 10^12-turn scale) then
    bounds the stage by its own length. Salting: partition by
    ``(conv_id, turn_idx div chunk_size)`` so a hot conversation spreads
    over ceil(len/chunk) tasks, compute intra-chunk edges with the same
    window, then stitch chunk boundaries with a per-chunk summary join
    (tiny: one row per chunk). Output is row-identical to ``flow_next``
    (pytest-verified on the 100x skew fixture).
    """
    chunk = (F.col("turn_idx") / chunk_size).cast("long")
    t = transcripts.select("conv_id", "turn_idx", chunk.alias("chunk"))

    w_chunk = Window.partitionBy("conv_id", "chunk").orderBy("turn_idx")
    intra = (
        t.select("conv_id", "turn_idx", "chunk", F.lead("turn_idx").over(w_chunk).alias("next_idx"))
        .filter(F.col("next_idx").isNotNull())
    )

    # boundary stitching: previous chunk's last turn -> this chunk's first
    summaries = t.groupBy("conv_id", "chunk").agg(
        F.min("turn_idx").alias("first_idx"), F.max("turn_idx").alias("last_idx")
    )
    w_conv_chunks = Window.partitionBy("conv_id").orderBy("chunk")
    boundary = (
        summaries.select(
            "conv_id",
            F.lag("last_idx").over(w_conv_chunks).alias("turn_idx"),
            F.col("first_idx").alias("next_idx"),
        )
        .filter(F.col("turn_idx").isNotNull())
    )

    both = intra.select("conv_id", "turn_idx", "next_idx").unionByName(boundary)
    return both.select(
        S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        F.lit("flow.next").alias("pred"),
        S.turn_node(F.col("conv_id"), F.col("next_idx")).alias("dst"),
        F.lit(None).cast("string").alias("var"),
        "conv_id",
    )


def segment_break(prev_role) -> F.Column:
    """The W3 region-boundary predicate: a turn OPENS a new topic segment
    iff it is the conversation's first turn, or a user turn whose
    predecessor was not a user turn (a user re-taking the floor after an
    assistant/tool exchange = a new discourse region). Shared by the
    standalone operators, the fused emitter, and the driver oracle."""
    return prev_role.isNull() | ((F.col("role") == "user") & (prev_role != "user"))


def segment_index(transcripts: DataFrame) -> DataFrame:
    """-> transcripts + (seg: 0-based segment index, is_break: bool).

    The CDG-region assignment (reference: synthetic FOLLOW region nodes,
    ``JavacpgCFGBuilder.java:1909-1989``): running sum of boundary flags
    over the mandated (conv_id, turn_idx) window — same exchange as every
    other CFG-layer operator, so folding it into a fused pass is free.
    """
    w = w_conv()
    w_fill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    brk = segment_break(F.lag("role").over(w))
    t = transcripts.withColumn("is_break", brk)
    return t.withColumn("seg", F.sum(F.col("is_break").cast("long")).over(w_fill) - 1)


def segment_triples(transcripts: DataFrame) -> DataFrame:
    """CDG/segment layer: (turn, 'cdg.in_segment', seg node) for every turn
    plus (seg k-1, 'cdg.follows', seg k) chaining consecutive regions.

    Reference analog: CDG edges into synthetic FOLLOW region nodes
    (``cpgCFGEdge.java:17-32``, ``JavacpgCFGBuilder.checkBuildFollowRegion``
    :1915-1956). One window pass; the follows edge is emitted at each
    region-opening turn (one per segment, no extra aggregation).
    """
    t = segment_index(transcripts)
    turn = S.turn_node(F.col("conv_id"), F.col("turn_idx"))
    seg = S.segment_node(F.col("conv_id"), F.col("seg"))
    prev_seg = S.segment_node(F.col("conv_id"), F.col("seg") - 1)
    nul = F.lit(None).cast("string")
    in_seg = t.select(
        turn.alias("src"), F.lit("cdg.in_segment").alias("pred"), seg.alias("dst"),
        nul.alias("var"), "conv_id",
    )
    follows = t.filter(F.col("is_break") & (F.col("seg") > 0)).select(
        prev_seg.alias("src"), F.lit("cdg.follows").alias("pred"), seg.alias("dst"),
        nul.alias("var"), "conv_id",
    )
    return in_seg.unionByName(follows)


def segment_entry_triples(
    transcripts: DataFrame, failure_rx: str = r"^tool output: no results"
) -> DataFrame:
    """Typed CDG region-entry edges — the CDG_TRUE/FALSE vs
    CDG_THROWS/NOT_THROWS distinction (``cpgCFGEdge.java:22-27``; the
    repo's membership/chaining edges alone can't answer "which segments
    were entered through a failed call").

    For every region-opening turn with a predecessor (``seg > 0``), the
    predecessor — the last turn of the previous region, the reference's
    condition node — classifies the entry:

    - assistant turn with a pending tool invocation whose branch was NOT
      taken (the user re-took the floor instead of the tool running):
      ``(prev_turn, 'cdg.enter_false', seg_k, var=tool)``
    - tool turn whose text matches ``failure_rx`` (the call failed):
      ``(prev_turn, 'cdg.enter_throws', seg_k)``
    - tool turn otherwise (a taken branch ran to completion):
      ``(prev_turn, 'cdg.enter_true', seg_k)``
    - plain assistant turn: epsilon entry (CDG_EPSILON analog) — the
      untyped membership/chaining edges already cover it, no edge here.

    Same single (conv_id, turn_idx) window as every CFG-layer operator;
    kept OUT of the fused emitter (like ``calls.throw_triples``) so the
    fused pass's scan keeps pruning ``text``.
    """
    w = w_conv()
    w_fill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # map-side failure predicate: boolean through the exchange, not text
    transcripts = transcripts.select(
        "conv_id", "turn_idx", "role", "tool",
        F.col("text").rlike(failure_rx).alias("failing"),
    )
    prev_role = F.lag("role").over(w)
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        prev_role.alias("prev_role"),
        F.lag("turn_idx").over(w).alias("prev_idx"),
        F.lag("tool").over(w).alias("prev_tool"),
        F.lag("failing").over(w).alias("prev_failing"),
        segment_break(prev_role).alias("is_break"),
    )
    t = t.withColumn("seg", F.sum(F.col("is_break").cast("long")).over(w_fill) - 1)
    pred = (
        F.when(
            (F.col("prev_role") == "assistant") & F.col("prev_tool").isNotNull(),
            F.lit("cdg.enter_false"),
        )
        .when((F.col("prev_role") == "tool") & F.col("prev_failing"), F.lit("cdg.enter_throws"))
        .when(F.col("prev_role") == "tool", F.lit("cdg.enter_true"))
    )
    return (
        t.filter(F.col("is_break") & (F.col("seg") > 0) & pred.isNotNull())
        .select(
            S.turn_node(F.col("conv_id"), F.col("prev_idx")).alias("src"),
            pred.alias("pred"),
            S.segment_node(F.col("conv_id"), F.col("seg")).alias("dst"),
            F.when(pred == "cdg.enter_false", F.col("prev_tool")).alias("var"),
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


def topic_segments(
    transcripts: DataFrame, threshold: float = 0.15
) -> DataFrame:
    """TextTiling-style topic segmentation: a boundary opens wherever the
    LEXICAL COHESION between a turn and its predecessor (Jaccard over
    distinct word sets) drops below ``threshold``; ``seg_idx`` is the
    running boundary count. The default 0.15 sits in the typical
    lexical-cohesion range for adjacent natural-language turns (distinct-
    word Jaccard between on-topic neighbors usually lands 0.1-0.4; a
    threshold like 0.8 is near-unreachable and would open a segment at
    almost every turn). Calibrate per corpus: pick the threshold at the
    dip of the cohesion histogram this operator itself emits. The linguistic complement of the structural
    W3 segmentation (``cdg_segments`` cuts on the control-flow role
    pattern; this cuts on vocabulary shift — "the conversation changed
    subject"), and the per-turn ``cohesion`` score doubles as a
    drift/quality signal for curation.

    ONE exchange: both window passes (the lag and the running sum) share
    the conv partitioning, and the word sets, intersections, and the
    Jaccard are JVM array expressions inside it — no UDF, no second
    shuffle. Empty-vocabulary adjacencies score 0.0 (a wordless turn is
    a topic break, not a match); the first turn of a conversation has
    NULL cohesion and always opens segment 0.
    """
    from jcpg_spark.functions.text import words

    w = w_conv()
    d = transcripts.select(
        "conv_id", "turn_idx", F.array_distinct(words(F.col("text"))).alias("ws")
    ).withColumn("pws", F.lag("ws").over(w))
    n_i = F.size(F.array_intersect("ws", "pws"))
    denom = F.size("ws") + F.size("pws") - n_i
    cohesion = F.when(F.col("pws").isNull(), F.lit(None).cast("double")).otherwise(
        F.when(denom == 0, F.lit(0.0)).otherwise(n_i.cast("double") / denom)
    )
    d = d.withColumn("cohesion", cohesion)
    boundary = F.when(
        F.col("cohesion").isNull() | (F.col("cohesion") < threshold), 1
    ).otherwise(0)
    seg = F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
    return d.select(
        "conv_id",
        "turn_idx",
        seg.cast("int").alias("seg_idx"),
        F.round("cohesion", 6).alias("cohesion"),
    )


def interarrival_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation inter-arrival timing profile: gap count, mean and
    sample-std of the turn gaps (seconds), and the Goh-Barabási
    burstiness coefficient B = (σ−μ)/(σ+μ) ∈ [−1, 1] — B near −1 is a
    metronome (scripted/bot traffic), near 0 Poisson-like (organic),
    positive bursty (human sessions). The TEMPORAL complement of
    ``sequence_typicality``'s behavioral score for session triage.

    Determinism across engines: gaps are integer epoch-second
    differences, and μ/σ come from the exact integer power sums (Σx,
    Σx²) — sample variance (n·Σx² − (Σx)²)/(n·(n−1)) — so the only IEEE
    steps are two divisions and one sqrt, pinned at 6 dp. One window
    pass + one hash-agg, both on the conv key. Conversations with a
    single gap have no sample std: σ, and therefore B, are null.
    """
    gap = (
        F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_conv()))
    ).alias("gap")
    g = transcripts.select("conv_id", "turn_idx", "ts").select(
        "conv_id", gap
    ).filter(F.col("gap").isNotNull())
    agg = g.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).alias("s2"),
    )
    n = F.col("n_gaps")
    mean = F.col("s1") / n
    var = F.when(
        n >= 2, (n * F.col("s2") - F.col("s1") * F.col("s1")) / (n * (n - 1))
    )
    std = F.sqrt(var)
    b = F.when(std + mean != 0, (std - mean) / (std + mean))
    return agg.select(
        "conv_id",
        "n_gaps",
        F.round(mean, 6).alias("mean_gap"),
        F.round(std, 6).alias("std_gap"),
        F.round(b, 6).alias("burstiness"),
    )
