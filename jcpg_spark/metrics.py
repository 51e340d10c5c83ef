"""Stage metrics: the ``_metrics`` table (S7 analog).

The reference logs per-file node/edge counts and memory stats to a nano
logger (``Main.java:15-22``, ``Execution.java:153-155``); north_rule
upgrades that to a queryable metrics table: one row per (stage, predicate)
triple count plus the per-partition lineage captured in each table
manifest (io.write_table). Appended per run; deterministic content (no
wall-clock columns — determinism is a correctness requirement for the
byte-identical resume test)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_metrics(edges: DataFrame) -> DataFrame:
    """Triple counts by predicate with a rollup total (SURVEY §2.4 A7:
    rollup is free in Spark) plus entity-cardinality telemetry."""
    by_pred = edges.rollup("pred").agg(
        F.count("*").alias("n_triples"),
        F.approx_count_distinct("var").alias("approx_vars"),
    )
    return by_pred.select(
        F.coalesce(F.col("pred"), F.lit("__total__")).alias("pred"),
        "n_triples",
        "approx_vars",
    )


def conversation_digests(edges: DataFrame) -> DataFrame:
    """-> (conv_id, n_triples, digest): per-conversation content digest
    of the emitted triple set — md5 over the sorted serialized triples.
    The incremental-verification primitive behind the north rule's
    per-partition lineage: diffing two snapshots' digest tables names
    exactly the conversations whose graphs changed (re-extract only
    those), and a digest mismatch after a resume localizes corruption
    to a conversation instead of a 10^12-row table scan.

    One conv-keyed aggregation; the serialization uses the unit
    separator so no id/pred vocabulary can alias a field boundary.
    Global (conv_id null) edges are excluded — they belong to the
    corpus-level digest, not any conversation's.
    """
    line = F.concat_ws(
        "\x1f",
        F.col("src"), F.col("pred"), F.col("dst"),
        F.coalesce(F.col("var"), F.lit("\x00")),
    )
    return (
        edges.filter(F.col("conv_id").isNotNull())
        .select("conv_id", line.alias("line"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.md5(F.concat_ws("\n", F.sort_array(F.collect_list("line")))).alias("digest"),
        )
    )
