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
