"""Resumable staged materialization of the KG build.

Implements north_rule's checkpoint/resume contract: each stage writes a
snapshot-committed table (io.write_table: parquet + atomic manifest with
per-partition lineage); a rerun skips every committed stage and resumes
from the first uncommitted one, reading upstream stages from their
snapshots instead of recomputing (the reference has no analog — a crashed
run restarts from zero; SURVEY §4.2 item 4).

Stage graph (each node = one committed table):

    transcripts (input)
      -> mentions            (pandas-UDF detection)
      -> linked              (broadcast ranked linking)
      -> alias_mapping       (alias pairs + connected components)
      -> edges   [bucketed]  (all triple layers)
      -> nodes   [bucketed]
      -> canonical
      -> _metrics            (per-pred triple counts; lineage lives in
                              each table's manifest)

Determinism: all stage outputs are content-keyed and partition-invariant,
so a resumed run's tables are row-identical to a clean run's (pytest
kill/resume test)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from jcpg_spark import io as tio
from jcpg_spark import metrics as tmetrics
from jcpg_spark.operators import calls, canonicalize, linking, mentions, references, structural


@dataclass
class RunSummary:
    out_dir: str
    stages_computed: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    manifests: dict = field(default_factory=dict)
    stage_walls: dict = field(default_factory=dict)  # name -> seconds (computed stages)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    dictionary: DataFrame,
    out_dir: str,
    resume: bool = True,
    fail_after: str | None = None,
) -> RunSummary:
    """Run all stages, skipping committed snapshots when ``resume``.

    ``fail_after`` injects a crash after the named stage commits — used by
    the kill/resume test to simulate a mid-job failure.
    """
    summary = RunSummary(out_dir=out_dir)

    def stage(name: str, compute, bucket_col: str | None = None):
        if resume and tio.is_committed(out_dir, name):
            summary.stages_skipped.append(name)
            summary.manifests[name] = tio.read_manifest(out_dir, name)
        else:
            import time

            t0 = time.time()
            df = compute()
            summary.manifests[name] = tio.write_table(
                df, out_dir, name, bucket_col=bucket_col
            )
            summary.stage_walls[name] = round(time.time() - t0, 2)
            summary.stages_computed.append(name)
            if fail_after == name:
                raise RuntimeError(f"injected failure after stage {name}")
        return tio.read_table(spark, out_dir, name)

    surfaces = [r["surface"] for r in dictionary.select("surface").distinct().collect()]
    transcripts = transcripts.persist()

    m = stage(
        "mentions",
        lambda: mentions.detect_mentions(
            spark, transcripts, surfaces, turn_flag_rx=canonicalize.INTRO_RX
        ),
    )
    linked = stage("linked", lambda: linking.link_mentions(m, dictionary))

    def _mapping():
        pairs = canonicalize.alias_pairs(transcripts, linked)
        mapping, _rounds, _conv = canonicalize.connected_components(pairs)
        return mapping

    mapping = stage("alias_mapping", _mapping)

    # edges bucketed by the entity var (falls back to src for non-entity
    # triples) — the parquet stand-in for Iceberg bucket(N, entity_hash)
    # per north_star; later entity-keyed joins co-locate. Layer lists are
    # SHARED with build_graph (pipeline.edge_layers/node_layers) so the
    # staged path cannot drift from the direct one.
    from pyspark.sql import functions as F

    from jcpg_spark.pipeline import edge_layers, node_layers

    def _edges_bucketed():
        return edge_layers(transcripts, m, linked, mapping).withColumn(
            "_bucket_key", F.coalesce(F.col("var"), F.col("src"))
        )

    edges = stage("edges", _edges_bucketed, bucket_col="_bucket_key")
    edges = edges.drop("_bucket_key")

    stage("nodes", lambda: node_layers(transcripts, m, linked), bucket_col="node_id")
    stage("canonical", lambda: canonicalize.canonical_map(linked, mapping))
    stage("_metrics", lambda: tmetrics.edge_metrics(edges))
    return summary
