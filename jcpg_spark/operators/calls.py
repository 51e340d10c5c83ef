"""Interprocedural (ICFG-layer) call / return triples.

Reference analog: ``JavacpgICFGBuilder.java`` — call-site -> method-entry
``CALLS`` edges (:111-141, resolved via the MethodKey equi-join J2) and
method-exit -> call-site ``RETURN`` edges (:129-134, exits collected at
:96-108 as out-degree-0 CFG nodes).

Transcript semantics:

- an assistant turn with ``tool`` non-null is a CALL SITE; the callee is the
  tool -> triple ``(call_turn, 'call', tool:<name>, var=<name>)``.
- the maximal run of consecutive ``role='tool'`` turns immediately following
  a call site is the callee body; its LAST turn is the exit -> triple
  ``(exit_turn, 'return', call_turn, var=<name>)``.

Both are pure window algebra over the same ``(conv_id, turn_idx)`` exchange
as the flow layer — no join is needed because the callee body is adjacent to
its call site in turn order (unlike the reference, which must join MethodKeys
across files; when cross-conversation tool registries appear, this becomes
the J2 broadcast equi-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jcpg_spark import schema as S
from jcpg_spark.operators.flow import segment_break, w_conv

_SENTINEL = "\x00"  # marks a tool run whose preceding turn is not a call site


def call_triples(transcripts: DataFrame) -> DataFrame:
    """(assistant turn with tool, 'call', tool:<name>) — CALLS analog."""
    return transcripts.filter(
        (F.col("role") == "assistant") & F.col("tool").isNotNull()
    ).select(
        S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        F.lit("call").alias("pred"),
        S.tool_node(F.col("tool")).alias("dst"),
        F.col("tool").alias("var"),
        "conv_id",
    )


def return_triples(transcripts: DataFrame) -> DataFrame:
    """(last turn of a tool run, 'return', call site) — RETURN analog.

    Implementation: mark run starts (tool turn whose predecessor is not a
    tool turn); at a run start, capture the call site from ``lag`` if the
    predecessor is a valid call site, else a sentinel; propagate the capture
    across the run with ``last(ignorenulls)``; emit on run ends.
    """
    prev_role = F.lag("role").over(w_conv())
    prev_tool = F.lag("tool").over(w_conv())
    prev_idx = F.lag("turn_idx").over(w_conv())
    next_role = F.lead("role").over(w_conv())

    is_tool = F.col("role") == "tool"
    run_start = is_tool & ((prev_role != "tool") | prev_role.isNull())
    callsite_ok = (prev_role == "assistant") & prev_tool.isNotNull()

    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        is_tool.alias("is_tool"),
        F.when(
            run_start,
            F.when(callsite_ok, S.turn_node(F.col("conv_id"), prev_idx)).otherwise(
                F.lit(_SENTINEL)
            ),
        ).alias("run_callsite"),
        F.when(run_start, F.when(callsite_ok, prev_tool)).alias("run_tool"),
        ((next_role != "tool") | next_role.isNull()).alias("run_end"),
    )
    w_fill = w_conv().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = t.withColumn("callsite", F.last("run_callsite", ignorenulls=True).over(w_fill))
    t = t.withColumn("callee_tool", F.last("run_tool", ignorenulls=True).over(w_fill))
    return (
        t.filter(F.col("is_tool") & F.col("run_end") & (F.col("callsite") != _SENTINEL))
        .select(
            S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
            F.lit("return").alias("pred"),
            F.col("callsite").alias("dst"),
            F.col("callee_tool").alias("var"),
            "conv_id",
        )
    )


def call_return_triples(transcripts: DataFrame) -> DataFrame:
    """Fused CALLS + RETURN emitter: both kinds in ONE window pass.

    Row-identical to ``call_triples(t) UNION return_triples(t)``
    (pytest-gated) — the call layer is a pure filter over columns the
    return layer's window pass already carries, so unioning the two
    standalone operators re-computed the (possibly derived) transcripts
    input and its conv-window once per layer (2 scans + 2 exchanges for
    the events adapter). Same single-pass struct-array + explode shape as
    ``cfg_triples``, restricted to the two ICFG kinds; the standalone
    operators remain for targeted queries.
    """
    prev_role = F.lag("role").over(w_conv())
    prev_tool = F.lag("tool").over(w_conv())
    prev_idx = F.lag("turn_idx").over(w_conv())
    next_role = F.lead("role").over(w_conv())

    is_tool = F.col("role") == "tool"
    run_start = is_tool & ((prev_role != "tool") | prev_role.isNull())
    callsite_ok = (prev_role == "assistant") & prev_tool.isNotNull()

    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        is_tool.alias("is_tool"),
        F.when(
            run_start,
            F.when(callsite_ok, S.turn_node(F.col("conv_id"), prev_idx)).otherwise(
                F.lit(_SENTINEL)
            ),
        ).alias("run_callsite"),
        F.when(run_start, F.when(callsite_ok, prev_tool)).alias("run_tool"),
        ((next_role != "tool") | next_role.isNull()).alias("run_end"),
    )
    w_fill = w_conv().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = t.select(
        "*",
        F.last("run_callsite", ignorenulls=True).over(w_fill).alias("callsite"),
        F.last("run_tool", ignorenulls=True).over(w_fill).alias("callee_tool"),
    )
    turn = S.turn_node(F.col("conv_id"), F.col("turn_idx"))
    arr = F.array_compact(
        F.array(
            F.when(
                (F.col("role") == "assistant") & F.col("tool").isNotNull(),
                F.struct(
                    turn.alias("src"),
                    F.lit("call").alias("pred"),
                    S.tool_node(F.col("tool")).alias("dst"),
                    F.col("tool").alias("var"),
                ),
            ),
            F.when(
                F.col("is_tool") & F.col("run_end") & (F.col("callsite") != _SENTINEL),
                F.struct(
                    turn.alias("src"),
                    F.lit("return").alias("pred"),
                    F.col("callsite").alias("dst"),
                    F.col("callee_tool").alias("var"),
                ),
            ),
        )
    )
    out = t.select("conv_id", F.explode(arr).alias("m"))
    return out.select(
        F.col("m.src").alias("src"),
        F.col("m.pred").alias("pred"),
        F.col("m.dst").alias("dst"),
        F.col("m.var").alias("var"),
        "conv_id",
    )


def cfg_triples(transcripts: DataFrame, failure_rx: str | None = None) -> DataFrame:
    """Fused CFG/ICFG/CDG emitter: ast.has_turn + act.role + flow.next +
    flow.branch_* + call + return + cdg.in_segment + cdg.follows in ONE
    window pass.

    The separate per-layer operators (flow.flow_next, flow.flow_branch,
    call_triples, return_triples, structural.ast_has_turn/act_role) are
    semantically identical but each carries its own exchange+sort when
    unioned (Catalyst only reuses exchanges for identical subplans, and the
    per-layer projections differ). This emitter computes every lead/lag
    column over the single mandated (conv_id, turn_idx) window, builds the
    per-turn edge candidates as an array of structs, and explodes — one
    shuffle + one sort for eight edge kinds. Used by the pipeline; the
    per-layer functions remain for targeted queries/tests.

    ``failure_rx`` opts IN the two text-reading layers — ``flow.throws``
    and the typed CDG entry edges — as a ninth/tenth kind in the SAME
    pass (row-identical to throw_triples + flow.segment_entry_triples,
    pytest-gated). Default None keeps text out of the scan entirely, so
    callers that never need failure semantics keep the pruned read. With
    failure_rx set, the regex is evaluated MAP-SIDE into a boolean before
    the window exchange — the raw text column never rides the shuffle
    (measured: text-through-exchange cost the emission stage ~10% of its
    parallel scaling at 6M turns).
    """
    w = w_conv()
    w_fill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prev_role = F.lag("role").over(w)
    prev_tool = F.lag("tool").over(w)
    prev_idx = F.lag("turn_idx").over(w)
    next_idx = F.lead("turn_idx").over(w)
    next_role = F.lead("role").over(w)

    is_tool = F.col("role") == "tool"
    run_start = is_tool & ((prev_role != "tool") | prev_role.isNull())
    callsite_ok = (prev_role == "assistant") & prev_tool.isNotNull()

    failure_cols = []
    if failure_rx is not None:
        # pre-window projection: rlike evaluated once per row map-side,
        # text dropped before the exchange
        transcripts = transcripts.select(
            "conv_id", "turn_idx", "role", "tool",
            F.col("text").rlike(failure_rx).alias("failing"),
        )
        failure_cols = [
            "failing",
            F.lag("failing").over(w).alias("prev_failing"),
            prev_role.alias("prev_role"),
            prev_tool.alias("prev_tool"),
            prev_idx.alias("prev_idx"),
        ]

    e = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        next_idx.alias("next_idx"),
        next_role.alias("next_role"),
        is_tool.alias("is_tool"),
        F.when(
            run_start,
            F.when(callsite_ok, S.turn_node(F.col("conv_id"), prev_idx)).otherwise(
                F.lit(_SENTINEL)
            ),
        ).alias("run_callsite"),
        F.when(run_start, F.when(callsite_ok, prev_tool)).alias("run_tool"),
        segment_break(prev_role).alias("is_break"),
        *failure_cols,
    )
    e = e.select(
        "*",
        F.last("run_callsite", ignorenulls=True).over(w_fill).alias("callsite"),
        F.last("run_tool", ignorenulls=True).over(w_fill).alias("callee_tool"),
        ((F.lead("is_tool").over(w).isNull()) | ~F.lead("is_tool").over(w)).alias("run_end"),
        (F.sum(F.col("is_break").cast("long")).over(w_fill) - 1).alias("seg"),
    )

    turn = S.turn_node(F.col("conv_id"), F.col("turn_idx"))
    nxt = S.turn_node(F.col("conv_id"), F.col("next_idx"))
    is_call = (F.col("role") == "assistant") & F.col("tool").isNotNull()
    nul = F.lit(None).cast("string")

    def edge(src, pred, dst, var):
        return F.struct(
            src.alias("src"), F.lit(pred).alias("pred") if isinstance(pred, str) else pred.alias("pred"),
            dst.alias("dst"), var.alias("var"),
        )

    branch_pred = F.when(F.col("next_role") == "tool", F.lit("flow.branch_true")).otherwise(
        F.lit("flow.branch_false")
    )
    kinds = [
        edge(S.conv_node(F.col("conv_id")), "ast.has_turn", turn, nul),
        edge(turn, "act.role", S.role_node(F.col("role")), nul),
        F.when(F.col("next_idx").isNotNull(), edge(turn, "flow.next", nxt, nul)),
        F.when(is_call & F.col("next_idx").isNotNull(), edge(turn, branch_pred, nxt, F.col("tool"))),
        F.when(is_call, edge(turn, "call", S.tool_node(F.col("tool")), F.col("tool"))),
        F.when(
            F.col("is_tool") & F.col("run_end") & (F.col("callsite") != _SENTINEL),
            edge(turn, "return", F.col("callsite"), F.col("callee_tool")),
        ),
        edge(turn, "cdg.in_segment", S.segment_node(F.col("conv_id"), F.col("seg")), nul),
        F.when(
            F.col("is_break") & (F.col("seg") > 0),
            edge(
                S.segment_node(F.col("conv_id"), F.col("seg") - 1),
                "cdg.follows",
                S.segment_node(F.col("conv_id"), F.col("seg")),
                nul,
            ),
        ),
    ]
    if failure_rx is not None:
        entry_pred = (
            F.when(
                (F.col("prev_role") == "assistant") & F.col("prev_tool").isNotNull(),
                F.lit("cdg.enter_false"),
            )
            .when(
                (F.col("prev_role") == "tool") & F.col("prev_failing"),
                F.lit("cdg.enter_throws"),
            )
            .when(F.col("prev_role") == "tool", F.lit("cdg.enter_true"))
        )
        kinds += [
            F.when(
                F.col("is_tool") & F.col("failing") & (F.col("callsite") != _SENTINEL),
                edge(turn, "flow.throws", F.col("callsite"), F.col("callee_tool")),
            ),
            F.when(
                F.col("is_break") & (F.col("seg") > 0) & entry_pred.isNotNull(),
                edge(
                    S.turn_node(F.col("conv_id"), F.col("prev_idx")),
                    entry_pred,
                    S.segment_node(F.col("conv_id"), F.col("seg")),
                    F.when(entry_pred == "cdg.enter_false", F.col("prev_tool")),
                ),
            ),
        ]
    arr = F.array_compact(F.array(*kinds))
    out = e.select("conv_id", F.explode(arr).alias("m"))
    return out.select(
        F.col("m.src").alias("src"),
        F.col("m.pred").alias("pred"),
        F.col("m.dst").alias("dst"),
        F.col("m.var").alias("var"),
        "conv_id",
    )


def throw_triples(
    transcripts: DataFrame, failure_rx: str = r"^tool output: no results"
) -> DataFrame:
    """THROWS-analog edges: a FAILING tool turn -> its call site.

    Reference analog: ``THROWS`` edges from throwing statements to their
    handler/caller (``CPGEdge.java:17-34``, ``cpgCFGEdge.java:17-32``
    THROWS/CDG_THROWS). Transcript semantics: a tool-role turn whose text
    matches ``failure_rx`` (the tool reported failure) emits
    ``(turn, 'flow.throws', call_site, var=tool)`` — the failure-path
    counterpart of the RETURN edge (which still fires at run end; a run
    can both throw mid-way and return).

    Standalone (not folded into cfg_triples) ON PURPOSE: failure detection
    must read ``text``, and the fused emitter's scan is plan-gated to
    prune it; callers that do not want throws never pay the text read.
    """
    # map-side failure predicate: boolean through the exchange, not text
    transcripts = transcripts.select(
        "conv_id", "turn_idx", "role", "tool",
        F.col("text").rlike(failure_rx).alias("failing"),
    )
    prev_role = F.lag("role").over(w_conv())
    prev_tool = F.lag("tool").over(w_conv())
    prev_idx = F.lag("turn_idx").over(w_conv())

    is_tool = F.col("role") == "tool"
    run_start = is_tool & ((prev_role != "tool") | prev_role.isNull())
    callsite_ok = (prev_role == "assistant") & prev_tool.isNotNull()

    t = transcripts.select(
        "conv_id",
        "turn_idx",
        is_tool.alias("is_tool"),
        "failing",
        F.when(
            run_start,
            F.when(callsite_ok, S.turn_node(F.col("conv_id"), prev_idx)).otherwise(
                F.lit(_SENTINEL)
            ),
        ).alias("run_callsite"),
        F.when(run_start, F.when(callsite_ok, prev_tool)).alias("run_tool"),
    )
    w_fill = w_conv().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = t.withColumn("callsite", F.last("run_callsite", ignorenulls=True).over(w_fill))
    t = t.withColumn("callee_tool", F.last("run_tool", ignorenulls=True).over(w_fill))
    return (
        t.filter(F.col("is_tool") & F.col("failing") & (F.col("callsite") != _SENTINEL))
        .select(
            S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
            F.lit("flow.throws").alias("pred"),
            F.col("callsite").alias("dst"),
            F.col("callee_tool").alias("var"),
            "conv_id",
        )
    )


def failure_layer_triples(
    transcripts: DataFrame, failure_rx: str = r"^tool output: no results"
) -> DataFrame:
    """Fused text-reading layer: ``flow.throws`` + typed CDG entry edges
    (``cdg.enter_true/enter_false/enter_throws``) in ONE window pass.

    Row-identical to ``throw_triples(t, rx) UNION
    flow.segment_entry_triples(t, rx)`` (pytest-gated) — both layers need
    the same (conv_id, turn_idx) window over the same text-bearing scan,
    so the pipeline composes them fused: one exchange + one sort instead
    of two of each. The standalone operators remain for targeted queries.
    """
    w = w_conv()
    w_fill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # map-side failure predicate: boolean through the exchange, not text
    transcripts = transcripts.select(
        "conv_id", "turn_idx", "role", "tool",
        F.col("text").rlike(failure_rx).alias("failing"),
    )
    prev_role = F.lag("role").over(w)
    prev_tool = F.lag("tool").over(w)
    prev_idx = F.lag("turn_idx").over(w)

    is_tool = F.col("role") == "tool"
    run_start = is_tool & ((prev_role != "tool") | prev_role.isNull())
    callsite_ok = (prev_role == "assistant") & prev_tool.isNotNull()
    from jcpg_spark.operators.flow import segment_break

    t = transcripts.select(
        "conv_id",
        "turn_idx",
        is_tool.alias("is_tool"),
        "failing",
        prev_role.alias("prev_role"),
        prev_tool.alias("prev_tool"),
        prev_idx.alias("prev_idx"),
        F.lag("failing").over(w).alias("prev_failing"),
        F.when(
            run_start,
            F.when(callsite_ok, S.turn_node(F.col("conv_id"), prev_idx)).otherwise(
                F.lit(_SENTINEL)
            ),
        ).alias("run_callsite"),
        F.when(run_start, F.when(callsite_ok, prev_tool)).alias("run_tool"),
        segment_break(prev_role).alias("is_break"),
    )
    t = t.select(
        "*",
        F.last("run_callsite", ignorenulls=True).over(w_fill).alias("callsite"),
        F.last("run_tool", ignorenulls=True).over(w_fill).alias("callee_tool"),
        (F.sum(F.col("is_break").cast("long")).over(w_fill) - 1).alias("seg"),
    )

    turn = S.turn_node(F.col("conv_id"), F.col("turn_idx"))
    entry_pred = (
        F.when(
            (F.col("prev_role") == "assistant") & F.col("prev_tool").isNotNull(),
            F.lit("cdg.enter_false"),
        )
        .when((F.col("prev_role") == "tool") & F.col("prev_failing"), F.lit("cdg.enter_throws"))
        .when(F.col("prev_role") == "tool", F.lit("cdg.enter_true"))
    )
    arr = F.array_compact(
        F.array(
            F.when(
                F.col("is_tool") & F.col("failing") & (F.col("callsite") != _SENTINEL),
                F.struct(
                    turn.alias("src"),
                    F.lit("flow.throws").alias("pred"),
                    F.col("callsite").alias("dst"),
                    F.col("callee_tool").alias("var"),
                ),
            ),
            F.when(
                F.col("is_break") & (F.col("seg") > 0) & entry_pred.isNotNull(),
                F.struct(
                    S.turn_node(F.col("conv_id"), F.col("prev_idx")).alias("src"),
                    entry_pred.alias("pred"),
                    S.segment_node(F.col("conv_id"), F.col("seg")).alias("dst"),
                    F.when(entry_pred == "cdg.enter_false", F.col("prev_tool")).alias("var"),
                ),
            ),
        )
    )
    out = t.select("conv_id", F.explode(arr).alias("m"))
    return out.select(
        F.col("m.src").alias("src"),
        F.col("m.pred").alias("pred"),
        F.col("m.dst").alias("dst"),
        F.col("m.var").alias("var"),
        "conv_id",
    )


def resolve_tool_registry(transcripts: DataFrame, registry: DataFrame) -> DataFrame:
    """Cross-conversation tool resolution: the REAL J2 equi-join.

    Within one conversation the callee is adjacent (window algebra above),
    but when a tool REGISTRY exists — canonical tool identities with
    aliases, the MethodKey table analog (``JavacpgICFGBuilder.java:111-141``
    resolving call sites against method entries via MethodKey equality) —
    call edges must resolve through it: broadcast equi-join of call sites
    against ``registry(alias, canonical)``; unresolved aliases pass through
    as their literal name (the reference skips unresolved call sites; here
    the edge is kept but unresolved, so the graph stays complete).

    -> call triples with dst = tool:<canonical>, var = the surface alias.
    """
    sites = transcripts.filter(
        (F.col("role") == "assistant") & F.col("tool").isNotNull()
    )
    reg = registry.select(
        F.col("alias").alias("tool"), F.col("canonical").alias("_canon")
    )
    joined = sites.join(F.broadcast(reg), "tool", "left")
    return joined.select(
        S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        F.lit("call").alias("pred"),
        S.tool_node(F.coalesce(F.col("_canon"), F.col("tool"))).alias("dst"),
        F.col("tool").alias("var"),
        "conv_id",
    )


def tool_nodes(transcripts: DataFrame) -> DataFrame:
    """One node per distinct tool (tiny dimension; global distinct-agg)."""
    return (
        transcripts.filter(F.col("tool").isNotNull())
        .select("tool")
        .distinct()
        .select(
            S.tool_node(F.col("tool")).alias("node_id"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit("tool").alias("kind"),
            F.col("tool").alias("label"),
            F.lit(None).cast("int").alias("turn_idx"),
            S.props_map(name=F.col("tool")).alias("props"),
        )
    )


def role_nodes(transcripts: DataFrame) -> DataFrame:
    """One node per distinct role."""
    return (
        transcripts.select("role")
        .distinct()
        .select(
            S.role_node(F.col("role")).alias("node_id"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit("role").alias("kind"),
            F.col("role").alias("label"),
            F.lit(None).cast("int").alias("turn_idx"),
            S.props_map(name=F.col("role")).alias("props"),
        )
    )
