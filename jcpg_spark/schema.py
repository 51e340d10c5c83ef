"""Canonical schemas and deterministic node-id construction.

The reference numbers nodes by object identity + insertion order at export
time (``CodePropertyGraph.java:95-113``), which is unstable under any
parallel execution. This engine instead derives every node id from row
content alone, so ids are identical under any partitioning / parallelism —
a correctness requirement for the cross-parallelism identical-output test.

Id grammar (structural content keys; collision-free by construction,
cheaper than sha2 at 10^12-turn scale and still deterministic):

- conversation  ``c:<conv_id>``
- turn          ``t:<conv_id>:<turn_idx>``
- mention       ``m:<conv_id>:<turn_idx>:<ordinal>``
- entity        ``e:<canonical>``
- role          ``role:<role>``
- tool          ``tool:<tool>``
- segment       ``seg:<conv_id>:<seg_idx>`` (synthetic region node, the
  FOLLOW-region analog of ``JavacpgCFGBuilder.checkBuildFollowRegion``,
  :1915-1956)
- namespace     ``ns:<namespace>`` (IMPORTS target, the package/import
  analog of ``JavacpgICFGBuilder.java:190-213``)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Entity-candidate dictionary (FIXTURES.md §2; analog of methodDEFs,
# JavacpgDDGBuilder.java:34-36,67-84)
# ---------------------------------------------------------------------------
DICTIONARY_SCHEMA = T.StructType(
    [
        T.StructField("surface", T.StringType(), False),
        T.StructField("canonical", T.StringType(), False),
        T.StructField("namespace", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("prior", T.DoubleType(), True),
        T.StructField("defs_state", T.BooleanType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Output graph (FIXTURES.md §3)
# ---------------------------------------------------------------------------
NODES_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        # the property-bag analog (CPGNode.java:68-70 `properties` map,
        # :89-126 line/code/type/normalized accessors): per-kind keys,
        # null-valued entries dropped (map_filter) so the bag is sparse
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("var", T.StringType(), True),
        T.StructField("conv_id", T.StringType(), True),
    ]
)

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("ordinal", T.IntegerType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)

# Closed predicate vocabulary (FIXTURES.md §3b), mapping to reference edge
# kinds in graphs/cpg/CPGEdge.java:17-34 and cpgCFGEdge.java:17-32.
PREDICATES = (
    "ast.has_turn",      # AST hierarchy  (JavacpgCFGBuilder.java:196,228)
    "ast.has_mention",   # AST leaf       (JavacpgCFGBuilder.java:733-755)
    "act.role",          # node-type/code props as speaker-act triples
    "flow.next",         # FLOWS_TO       (JavacpgCFGBuilder.java:1865-1883)
    "flow.branch_true",  # FLOWS_TO_TRUE  (JavacpgCFGBuilder.java:827-875)
    "flow.branch_false", # FLOWS_TO_FALSE
    "call",              # CALLS          (JavacpgICFGBuilder.java:128)
    "return",            # RETURN         (JavacpgICFGBuilder.java:131)
    "ref.use",           # DDG_U          (JavacpgDDGBuilder.java:336-341)
    "ref.redef",         # DDG_D          (JavacpgDDGBuilder.java:329-335)
    "ref.self",          # SELF_FLOW      (JavacpgDDGBuilder.java:311-314)
    "same_as",           # canonicalization (fixpoint analog :102-117)
    "cdg.in_segment",    # CDG region membership (cpgCFGEdge.java:17-32
                         # CDG_TRUE/FALSE/EPSILON; region nodes built at
                         # JavacpgCFGBuilder.java:1909-1989)
    "cdg.follows",       # FOLLOW region chaining (checkBuildFollowRegion,
                         # JavacpgCFGBuilder.java:1915-1956)
    "flow.throws",       # THROWS failure edge (CPGEdge.java:17-34,
                         # cpgCFGEdge.java THROWS/CDG_THROWS) — opt-in layer,
                         # see calls.throw_triples
    "cdg.enter_true",    # typed region entry: segment entered after a TAKEN
                         # tool branch completed (CDG_TRUE analog,
                         # cpgCFGEdge.java:22-27); see flow.segment_entry_triples
    "cdg.enter_false",   # entry after an untaken branch (CDG_FALSE analog)
    "cdg.enter_throws",  # entry after a FAILING tool turn (CDG_THROWS /
                         # NOT_THROWS split, cpgCFGEdge.java:26-27)
    "imports",           # conversation -> namespace it pulls entities from
                         # (IMPORTS, cpgCFGEdge.java:28; import semi-join
                         # JavacpgICFGBuilder.java:190-213); see
                         # linking.import_triples
    "ast.has_sentence",  # within-turn AST depth: turn -> sentence (the
                         # reference's intra-statement expression subtrees,
                         # CPGNode.java:13-57); see structural.sentence_triples
    "ast.in_sentence",   # mention -> enclosing sentence containment; see
                         # mentions.in_sentence_triples
)


def conv_node(conv_id: Column) -> Column:
    return F.concat(F.lit("c:"), conv_id)


def turn_node(conv_id: Column, turn_idx: Column) -> Column:
    return F.concat(F.lit("t:"), conv_id, F.lit(":"), turn_idx.cast("string"))


def mention_node(conv_id: Column, turn_idx: Column, ordinal: Column) -> Column:
    return F.concat(
        F.lit("m:"), conv_id, F.lit(":"), turn_idx.cast("string"), F.lit(":"), ordinal.cast("string")
    )


def entity_node(canonical: Column) -> Column:
    return F.concat(F.lit("e:"), canonical)


def role_node(role: Column) -> Column:
    return F.concat(F.lit("role:"), role)


def tool_node(tool: Column) -> Column:
    return F.concat(F.lit("tool:"), tool)


def segment_node(conv_id: Column, seg_idx: Column) -> Column:
    return F.concat(F.lit("seg:"), conv_id, F.lit(":"), seg_idx.cast("string"))


def namespace_node(namespace: Column) -> Column:
    return F.concat(F.lit("ns:"), namespace)


def sentence_node(conv_id: Column, turn_idx: Column, sent_idx: Column) -> Column:
    return F.concat(
        F.lit("sent:"), conv_id, F.lit(":"), turn_idx.cast("string"),
        F.lit(":"), sent_idx.cast("string"),
    )


def props_map(**kv: Column) -> Column:
    """Sparse property bag: build map(k -> v) dropping null-valued keys
    (CPGNode property map analog; keys with no value simply absent)."""
    pairs: list[Column] = []
    for k, v in kv.items():
        pairs.extend([F.lit(k), v.cast("string")])
    return F.map_filter(F.create_map(*pairs), lambda _k, v: v.isNotNull())
