"""Deterministic synthetic transcripts + entity dictionary (FIXTURES.md).

Everything is derived from ``xxhash64`` of ``(conv_id, turn_idx, tag, seed)``
so any row regenerates identically under any order / partitioning / cluster
size — the property FIXTURES.md §1 mandates, and what makes the bench input
reproducible at both parallelism levels without shipping data.

Scale knob is ``n_conv``; conversation lengths are drawn from a seeded
geometric-ish distribution (min 2, max 40) with one skew conversation
(``conv000000``) at ~100x the median length to exercise skew handling.

The synthesis itself is pure column expressions (JVM-side, whole-stage
codegen) — no Python in the loop — so 10^6-turn bench inputs materialize in
seconds.
"""

from __future__ import annotations

import itertools

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
SKEW_CONV = "conv000000"
MEDIAN_LEN = 20
SKEW_LEN = 100 * MEDIAN_LEN  # FIXTURES.md: one conv with 100x median length

# Template pool (FIXTURES.md §1 `text`). {e0}/{e1} are entity-surface slots.
# Template 1 is the alias-introduction form consumed by canonicalization;
# template 2 produces def + same-turn second mention (ref.self analog of
# SELF_FLOW, JavacpgDDGBuilder.java:311-314,1682-1685).
TEMPLATES = [
    "check the {e0} again. it looked stale yesterday",
    "introducing {e0} as {e1}",
    "{e0} now references {e0} internally",
    "compare {e0} with {e1}",
    "the {e0} looks fine to me",
    "please update {e0} using {e1}. then verify {e0}",
    "what is the status of {e0}",
    "thanks, sounds good",
    "continuing with the plan",
    "we should document {e0}",
]
TOOL_TEMPLATES = [
    "tool output: {e0} resolved ok",
    "tool output: no results",
    "tool output: {e0} -> 3 records",
]
TOOLS = ["search", "calc", "db"]

_PREFIXES = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "zephyr", "acme"]
_NOUNS = [
    "service", "cache", "index", "queue", "ledger", "pipeline",
    "registry", "broker", "vault", "planner", "router", "monitor",
]
_DEF_VERBS = ["set", "put", "add", "insert", "push", "append"]


def gazetteer_pdf() -> pd.DataFrame:
    """Entity-candidate dictionary (~200+ rows), analog of the reference's
    ``methodDEFs`` / ``allClassInfos`` broadcast maps
    (JavacpgDDGBuilder.java:34-36,67-84).

    Deliberate structure:
    - every (prefix, noun) pair is a base surface, canonical ``<prefix>_<noun>``
    - every 7th surface is AMBIGUOUS: a second candidate in namespace ``alt``
      with a lower prior (exercises the ranked-pick join, SURVEY §2.3 J1/W5)
    - def-verb surfaces (``set alpha cache`` ...) carry ``defs_state=True``
      (analog of MethodDefInfo.stateDEF name-prefix heuristic,
      JavacpgMethodLevel.java:3093-3103) and link to the same canonical
    - alias surfaces (``the <prefix> <noun> alias``) map to canonical
      ``<prefix>_<noun>_alias`` — distinct ids that only merge during
      canonicalization via 'introducing X as Y' turns.
    """
    rows = []
    base = list(itertools.product(_PREFIXES, _NOUNS))
    for i, (p, n) in enumerate(base):
        surface = f"{p} {n}"
        canonical = f"{p}_{n}"
        rows.append((surface, canonical, "core", "artifact", 0.9, False))
        if i % 7 == 0:  # ambiguous: second, lower-prior candidate
            rows.append((surface, f"{canonical}_alt", "alt", "system", 0.4, False))
        if i % 3 == 0:  # def-verb surface for the same entity
            verb = _DEF_VERBS[i % len(_DEF_VERBS)]
            rows.append((f"{verb} {surface}", canonical, "core", "artifact", 0.9, True))
        if i % 5 == 0:  # alias surface with its own canonical (merged by CC)
            rows.append((f"{p} {n} alias", f"{canonical}_alias", "core", "artifact", 0.8, False))
    for t in TOOLS:
        rows.append((f"{t} tool", f"tool_{t}", t, "tool", 0.95, False))
    return pd.DataFrame(
        rows, columns=["surface", "canonical", "namespace", "kind", "prior", "defs_state"]
    )


def _h(tag: str, *cols) -> F.Column:
    """Deterministic non-negative 63-bit hash keyed on (seed, tag, *cols)."""
    return F.abs(F.xxhash64(F.lit(SEED), F.lit(tag), *cols))


def synth_transcripts(
    spark: SparkSession, n_conv: int, skew: bool = True, parallelism: int | None = None
) -> DataFrame:
    """Deterministic transcripts DataFrame, schema per BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string, tool string, ts timestamp).

    Role structure (FIXTURES.md §1): positions cycle user/assistant/<maybe tool>;
    a `tool`-role turn appears iff the preceding assistant turn invoked a tool
    (its ``tool`` column is non-null), so the call/return extractor has real
    call sites to resolve.
    """
    surfaces = gazetteer_pdf()["surface"].tolist()
    surf_arr = F.array(*[F.lit(s) for s in surfaces])
    tmpl_arr = F.array(*[F.lit(t) for t in TEMPLATES])
    tool_tmpl_arr = F.array(*[F.lit(t) for t in TOOL_TEMPLATES])
    tool_arr = F.array(*[F.lit(t) for t in TOOLS])

    conv = spark.range(0, n_conv, 1, parallelism or spark.sparkContext.defaultParallelism)
    conv = conv.select(F.format_string("conv%06d", F.col("id")).alias("conv_id"))
    length = (F.lit(2) + _h("len", F.col("conv_id")) % F.lit(39)).cast("int")
    if skew:
        length = F.when(F.col("conv_id") == SKEW_CONV, F.lit(SKEW_LEN)).otherwise(length)
    conv = conv.withColumn("n_turns", length)

    t = conv.select(
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
        "n_turns",
    )

    pos = F.col("turn_idx") % 3
    # does the assistant turn at index i invoke a tool? (only if a next turn exists)
    def invokes(idx):
        return (_h("inv", F.col("conv_id"), idx) % 3 == 0) & (idx + 1 < F.col("n_turns"))

    role = (
        F.when(pos == 0, F.lit("user"))
        .when(pos == 1, F.lit("assistant"))
        .otherwise(
            F.when(invokes(F.col("turn_idx") - 1), F.lit("tool")).otherwise(F.lit("user"))
        )
    )
    tool = F.when(
        (pos == 1) & invokes(F.col("turn_idx")),
        F.element_at(tool_arr, (_h("tool", F.col("conv_id"), F.col("turn_idx")) % 3 + 1).cast("int")),
    ).otherwise(F.lit(None).cast("string"))

    e0 = F.element_at(
        surf_arr, (_h("e0", F.col("conv_id"), F.col("turn_idx")) % len(surfaces) + 1).cast("int")
    )
    e1 = F.element_at(
        surf_arr, (_h("e1", F.col("conv_id"), F.col("turn_idx")) % len(surfaces) + 1).cast("int")
    )
    tmpl = F.when(
        role == "tool",
        F.element_at(
            tool_tmpl_arr,
            (_h("tt", F.col("conv_id"), F.col("turn_idx")) % len(TOOL_TEMPLATES) + 1).cast("int"),
        ),
    ).otherwise(
        F.element_at(
            tmpl_arr, (_h("t", F.col("conv_id"), F.col("turn_idx")) % len(TEMPLATES) + 1).cast("int")
        )
    )
    text = F.replace(F.replace(tmpl, F.lit("{e0}"), e0), F.lit("{e1}"), e1)

    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2026-01-01 00:00:00"), "yyyy-MM-dd HH:mm:ss")
        + (_h("off", F.col("conv_id")) % 86400)
        + F.col("turn_idx") * 13
    )

    return t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def write_transcripts(spark: SparkSession, path: str, n_conv: int, skew: bool = True) -> None:
    synth_transcripts(spark, n_conv, skew=skew).write.mode("overwrite").parquet(path)
