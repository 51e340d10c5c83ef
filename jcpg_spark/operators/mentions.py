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


def compile_gazetteer(surfaces: list[str]) -> re.Pattern:
    """Alternation regex over all dictionary surfaces, longest first so the
    regex engine prefers maximal matches; word-bounded; case-insensitive."""
    ordered = sorted(set(surfaces), key=len, reverse=True)
    pat = r"\b(?:" + "|".join(re.escape(s) for s in ordered) + r")\b"
    return re.compile(pat, re.IGNORECASE)


def detect_mentions(
    spark: SparkSession, transcripts: DataFrame, surfaces: list[str]
) -> DataFrame:
    """-> mentions DF (conv_id, turn_idx, ordinal, surface, start, end).

    ``ordinal`` is the 0-based match index within the turn (deterministic:
    regex scan order), giving mention node ids ``m:<conv>:<turn>:<ordinal>``.
    """
    bc = spark.sparkContext.broadcast(sorted(set(surfaces)))
    _local: dict[str, re.Pattern] = {}

    @F.pandas_udf(T.ArrayType(_MENTION_ELEM))
    def _detect(texts: pd.Series) -> pd.Series:
        rx = _local.get("rx")
        if rx is None:
            rx = compile_gazetteer(bc.value)
            _local["rx"] = rx

        def one(text):
            if not text:
                return []
            return [
                (i, m.group(0).lower(), m.start(), m.end())
                for i, m in enumerate(rx.finditer(text))
            ]

        return texts.map(one)

    exploded = (
        transcripts.select("conv_id", "turn_idx", "role", "tool", _detect("text").alias("ms"))
        .filter(F.size("ms") > 0)
        .select("conv_id", "turn_idx", "role", "tool", F.explode("ms").alias("m"))
    )
    return exploded.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        F.col("m.ordinal").alias("ordinal"),
        F.col("m.surface").alias("surface"),
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
    )


def mention_nodes(mentions: DataFrame) -> DataFrame:
    from jcpg_spark import schema as S

    return mentions.select(
        S.mention_node(F.col("conv_id"), F.col("turn_idx"), F.col("ordinal")).alias("node_id"),
        "conv_id",
        F.lit("mention").alias("kind"),
        F.col("surface").alias("label"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
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
