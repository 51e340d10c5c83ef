"""Kill/resume + materialization tests (SURVEY §5.2 item 3c, north_rule)."""

from __future__ import annotations

import hashlib
import json

import pytest

from jcpg_spark import io as tio
from jcpg_spark.plans.materialize import run_pipeline
from jcpg_spark.synth import gazetteer_pdf, synth_transcripts

STAGES = ["mentions", "linked", "alias_mapping", "edges", "nodes", "canonical", "_metrics"]


@pytest.fixture(scope="module")
def t_small(spark):
    df = synth_transcripts(spark, 10, skew=False).persist()
    df.count()
    return df


def _fp(spark, base, name):
    rows = sorted(tuple(r) for r in tio.read_table(spark, base, name).collect())
    return hashlib.sha256(json.dumps(rows, default=str).encode()).hexdigest()


def test_kill_resume_identical_output(spark, dictionary, t_small, tmp_path):
    clean, resumed = str(tmp_path / "clean"), str(tmp_path / "resumed")

    s0 = run_pipeline(spark, t_small, dictionary, clean)
    assert s0.stages_computed == STAGES

    # crash after the 'linked' stage commits
    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(spark, t_small, dictionary, resumed, fail_after="linked")
    assert tio.is_committed(resumed, "linked")
    assert not tio.is_committed(resumed, "edges")

    # resume: committed stages skipped, remaining computed
    s2 = run_pipeline(spark, t_small, dictionary, resumed)
    assert s2.stages_skipped == ["mentions", "linked"]
    assert s2.stages_computed == ["alias_mapping", "edges", "nodes", "canonical", "_metrics"]

    # resumed output identical to the clean run, table by table
    for name in STAGES:
        assert _fp(spark, clean, name) == _fp(spark, resumed, name), name


def test_rerun_is_noop(spark, dictionary, t_small, tmp_path):
    base = str(tmp_path / "t")
    run_pipeline(spark, t_small, dictionary, base)
    s = run_pipeline(spark, t_small, dictionary, base)
    assert s.stages_computed == []
    assert s.stages_skipped == STAGES


def test_manifest_lineage(spark, dictionary, t_small, tmp_path):
    base = str(tmp_path / "t")
    s = run_pipeline(spark, t_small, dictionary, base)
    man = s.manifests["edges"]
    assert man["rows"] == sum(man["lineage"].values())
    assert man["rows"] == tio.read_table(spark, base, "edges").count()
    assert man["bucket_col"] == "_bucket_key"
    # metrics table total matches the edges manifest
    metrics = {r["pred"]: r["n_triples"] for r in tio.read_table(spark, base, "_metrics").collect()}
    assert metrics["__total__"] == man["rows"]


def test_materialized_edges_match_build_graph(spark, dictionary, t_small, tmp_path):
    from pyspark.sql import functions as F

    from jcpg_spark.pipeline import build_graph

    base = str(tmp_path / "t")
    run_pipeline(spark, t_small, dictionary, base)
    mat = {
        tuple(r)
        for r in tio.read_table(spark, base, "edges").drop("_bucket_key").collect()
    }
    direct = {tuple(r) for r in build_graph(spark, t_small, dictionary).edges.collect()}
    assert mat == direct


def test_materialized_nodes_match_build_graph_and_stage_walls(
    spark, dictionary, t_small, tmp_path
):
    """Nodes parity catches pipeline/materialize drift (e.g. a node layer
    added to one but not the other); computed stages record wall times."""
    from jcpg_spark.pipeline import build_graph

    base = str(tmp_path / "t")
    s = run_pipeline(spark, t_small, dictionary, base)

    def canon(rows):  # props is a map -> make rows hashable
        return {
            tuple(v if not isinstance(v, dict) else tuple(sorted(v.items())) for v in r)
            for r in rows
        }

    mat = canon(tio.read_table(spark, base, "nodes").collect())
    direct = canon(build_graph(spark, t_small, dictionary).nodes.collect())
    assert mat == direct
    assert set(s.stage_walls) == set(s.stages_computed)
    assert all(w >= 0 for w in s.stage_walls.values())


def test_fan_out_widens_narrow_scan_only(spark, tmp_path):
    """fan_out repartitions a 1-partition input up to defaultParallelism,
    leaves an already-wide input untouched (the production no-op path),
    and preserves the row multiset either way."""
    df = spark.range(1000).coalesce(1)
    wide = tio.fan_out(df)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in wide.collect()) == list(range(1000))

    already = spark.range(1000).repartition(spark.sparkContext.defaultParallelism + 4)
    assert tio.fan_out(already) is already

    assert tio.fan_out(df, min_partitions=7).rdd.getNumPartitions() == 7
