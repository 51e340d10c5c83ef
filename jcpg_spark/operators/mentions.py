"""Mention detection — the parse stage (S2/P3 analog), as a pandas UDF.

Reference analog: the ANTLR lex+parse of each source file
(``JavacpgDDGBuilder.java:42-50``) plus the usability predicate
``isUsableExpression`` (``:1392-1416``) that decides which expressions enter
the USE lists. Transcript text is natural language, so "parsing" is
gazetteer matching: one compiled alternation regex of all dictionary
surfaces, longest-match-first, non-overlapping, case-insensitive.

Scale notes:
- the gazetteer regex is built ONCE per executor from a broadcast list
  (not re-pickled per task — guide pitfall), and matching is vectorized
  over Arrow batches (Series -> Series of struct arrays);
- map-side only: adds no shuffle; ``explode`` keeps the parent partitioning.
- longest-first matching means a def-verb surface ("set alpha cache")
  shadows its embedded base surface ("alpha cache"), mirroring the
  reference's preference for the outermost expression node.
"""

from __future__ import annotations

import re
from bisect import bisect_right

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MENTION_ELEM = T.StructType(
    [
        T.StructField("ordinal", T.IntegerType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)


def _trie_pattern(surfaces: list[str]) -> str:
    """Compile the surface set into a prefix-trie regex.

    Python's ``re`` scans flat alternations branch-by-branch at every
    position; a trie-shaped pattern shares common prefixes so each input
    position is rejected after at most one character class — ~10-50x faster
    for a couple hundred surfaces. Longest-match preference is preserved by
    ordering each trie level's branches so that longer continuations are
    tried before accepting a shorter terminal (terminal marker last).
    """
    trie: dict = {}
    for s in set(surfaces):
        node = trie
        for ch in s:
            node = node.setdefault(ch, {})
        node[""] = {}  # terminal marker

    def emit(node: dict) -> str:
        # branches sorted: non-terminal children first (prefer longer match),
        # deterministic order within.
        keys = sorted(node.keys(), key=lambda k: (k == "", k))
        parts = []
        for k in keys:
            if k == "":
                parts.append("")
                continue
            child = emit(node[k])
            parts.append(re.escape(k) + child)
        alts = [p for p in parts if p != ""]
        has_terminal = "" in parts
        if not alts:
            return ""
        body = "|".join(alts)
        if len(alts) == 1 and not has_terminal:
            return body
        return "(?:" + body + ")" + ("?" if has_terminal else "")

    return r"\b" + emit(trie) + r"\b"


def compile_gazetteer(surfaces: list[str]) -> re.Pattern:
    """Trie-optimized regex over all dictionary surfaces; prefers the
    longest match at each position; word-bounded; case-insensitive."""
    return re.compile(_trie_pattern(surfaces), re.IGNORECASE)


_MENTIONS_OUT = (
    "conv_id string, turn_idx int, role string, tool string, "
    "ordinal int, surface string, start int, end int, sent_idx int"
)

# keep in sync with structural.SENTENCE_SEP_RX (not imported: the UDF
# closure must not capture the DataFrame-side module)
_SENT_SEP = re.compile(r"[.!?]+\s+")


def detect_mentions(
    spark: SparkSession,
    transcripts: DataFrame,
    surfaces: list[str],
    turn_flag_rx: str | None = None,
) -> DataFrame:
    """-> mentions DF (conv_id, turn_idx, role, tool, ordinal, surface,
    start, end[, turn_flag]).

    ``ordinal`` is the 0-based match index within the turn (deterministic:
    regex scan order), giving mention node ids ``m:<conv>:<turn>:<ordinal>``.

    ``turn_flag_rx``: optional turn-level predicate evaluated ONCE per turn
    during this same pass (the UDF already holds the text) and emitted as a
    ``turn_flag`` boolean on each of the turn's mentions. Downstream stages
    that would otherwise re-scan the text and join the result back (e.g.
    alias-introduction turns for canonicalization) filter on the flag
    instead — no second text scan, no broadcast build. Semantics match
    Spark's ``rlike`` (``re.search``, case-sensitive, no MULTILINE). The
    reference analog is the parser tagging statement kinds during the one
    parse pass rather than re-lexing per analysis.

    Implemented with ``mapInPandas`` emitting already-exploded flat columns:
    returning ``array<struct>`` from a scalar pandas UDF forces a per-row
    Python->Arrow nested conversion that costs ~10x the regex matching
    itself; flat column buffers convert in bulk. Map-side only, keeps the
    parent partitioning.
    """
    bc = spark.sparkContext.broadcast(sorted(set(surfaces)))
    _local: dict[str, re.Pattern] = {}
    with_flag = turn_flag_rx is not None

    def _detect(batches):
        rx = _local.get("rx")
        if rx is None:
            rx = compile_gazetteer(bc.value)
            _local["rx"] = rx
        flag_rx = re.compile(turn_flag_rx) if with_flag else None
        for pdf in batches:
            conv, turn, role, tool = [], [], [], []
            ordinal, surface, start, end, sent, flag = [], [], [], [], [], []
            for c, ti, ro, to, tx in zip(
                pdf["conv_id"].values,
                pdf["turn_idx"].values,
                pdf["role"].values,
                pdf["tool"].values,
                pdf["text"].values,
            ):
                if not tx:
                    continue
                fl = bool(flag_rx.search(tx)) if with_flag else False
                # sentence fragment starts (same separator as structural.
                # sentences; fragment k begins at the end of separator k)
                bounds = [0] + [sm.end() for sm in _SENT_SEP.finditer(tx)]
                for i, m in enumerate(rx.finditer(tx)):
                    conv.append(c)
                    turn.append(ti)
                    role.append(ro)
                    tool.append(to)
                    ordinal.append(i)
                    surface.append(m.group(0).lower())
                    start.append(m.start())
                    end.append(m.end())
                    sent.append(bisect_right(bounds, m.start()) - 1)
                    if with_flag:
                        flag.append(fl)
            cols = {
                "conv_id": conv,
                "turn_idx": pd.array(turn, dtype="int32"),
                "role": role,
                "tool": tool,
                "ordinal": pd.array(ordinal, dtype="int32"),
                "surface": surface,
                "start": pd.array(start, dtype="int32"),
                "end": pd.array(end, dtype="int32"),
                "sent_idx": pd.array(sent, dtype="int32"),
            }
            if with_flag:
                cols["turn_flag"] = pd.array(flag, dtype="bool")
            yield pd.DataFrame(cols)

    schema = _MENTIONS_OUT + (", turn_flag boolean" if with_flag else "")
    return transcripts.select("conv_id", "turn_idx", "role", "tool", "text").mapInPandas(
        _detect, schema=schema
    )


def mention_nodes(mentions: DataFrame) -> DataFrame:
    from jcpg_spark import schema as S

    return mentions.select(
        S.mention_node(F.col("conv_id"), F.col("turn_idx"), F.col("ordinal")).alias("node_id"),
        "conv_id",
        F.lit("mention").alias("kind"),
        F.col("surface").alias("label"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        S.props_map(
            surface=F.col("surface"), start=F.col("start"), end=F.col("end")
        ).alias("props"),
    )


def in_sentence_triples(mentions: DataFrame) -> DataFrame:
    """(mention, 'ast.in_sentence', sentence) — containment of each mention
    in its enclosing sentence, from the ``sent_idx`` assigned during the
    detection pass (no join against the sentence split; the Python boundary
    scan and structural.sentences share SENTENCE_SEP_RX, pytest-gated)."""
    from jcpg_spark import schema as S

    return mentions.select(
        S.mention_node(F.col("conv_id"), F.col("turn_idx"), F.col("ordinal")).alias("src"),
        F.lit("ast.in_sentence").alias("pred"),
        S.sentence_node(F.col("conv_id"), F.col("turn_idx"), F.col("sent_idx")).alias("dst"),
        F.lit(None).cast("string").alias("var"),
        "conv_id",
    )


def ast_has_mention(mentions: DataFrame) -> DataFrame:
    """(turn, 'ast.has_mention', mention) — AST leaf edges
    (JavacpgCFGBuilder.java:733-755)."""
    from jcpg_spark import schema as S

    return mentions.select(
        S.turn_node(F.col("conv_id"), F.col("turn_idx")).alias("src"),
        F.lit("ast.has_mention").alias("pred"),
        S.mention_node(F.col("conv_id"), F.col("turn_idx"), F.col("ordinal")).alias("dst"),
        F.col("surface").alias("var"),
        "conv_id",
    )
