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


def test_snapshot_append_time_travel_rollback_expire(spark, tmp_path):
    """Iceberg-parity snapshot lifecycle on the io seam: replace -> append
    (O(new) commit) -> time-travel reads -> rollback (pointer swap) ->
    expire (unreferenced dirs deleted, survivors intact)."""
    import os

    from jcpg_spark import io as tio

    base = str(tmp_path)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    m1 = tio.write_table(df1, base, "t")
    assert (m1["snapshot_id"], m1["rows"]) == (1, 2)

    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    m2 = tio.write_table(df2, base, "t", mode="append")
    assert (m2["snapshot_id"], m2["rows"]) == (2, 3)
    assert m2["data_dirs"] == ["snap-1", "snap-2"]

    df3 = spark.createDataFrame([(9, "z")], "id long, v string")
    m3 = tio.write_table(df3, base, "t")  # replace
    assert (m3["snapshot_id"], m3["rows"]) == (3, 1)

    def ids(snapshot=None):
        return sorted(
            r["id"] for r in tio.read_table(spark, base, "t", snapshot=snapshot).collect()
        )

    assert ids() == [9]
    assert ids(snapshot=1) == [1, 2]
    assert ids(snapshot=2) == [1, 2, 3]
    log = tio.snapshots(base, "t")
    assert [(e["id"], e["op"], e["parent"]) for e in log] == [
        (1, "replace", None), (2, "append", 1), (3, "replace", 2)]

    # rollback: current view = snapshot 2; log intact; data untouched
    tio.rollback(base, "t", 2)
    assert ids() == [1, 2, 3]
    assert tio.read_manifest(base, "t")["rows"] == 3
    assert len(tio.snapshots(base, "t")) == 3

    # expire all but the last 2 entries + current: snapshot 3's dir
    # survives (logged), snapshot 1's dir survives (referenced by current
    # snapshot 2) — nothing is actually deletable here
    assert tio.expire_snapshots(base, "t", keep_last=2) == [1]
    assert ids() == [1, 2, 3]

    # move current forward again: the new id must NOT collide with the
    # logged snapshot 3 (rollback left current=2; naive current+1 would
    # overwrite snap-3's data) — it allocates past the log maximum
    df4 = spark.createDataFrame([(7, "q")], "id long, v string")
    m4 = tio.write_table(df4, base, "t")  # replace
    assert m4["snapshot_id"] == 4
    expired = tio.expire_snapshots(base, "t", keep_last=1)
    assert set(expired) == {2, 3}
    assert ids() == [7]
    path = tio.table_path(base, "t")
    gone = [d for d in ("snap-1", "snap-2", "snap-3") if os.path.exists(os.path.join(path, d))]
    assert gone == [], gone
    assert os.path.exists(os.path.join(path, "snap-4"))


def test_snapshot_reader_isolation_during_overwrite(spark, tmp_path):
    """A DataFrame resolved against the old snapshot still reads the old
    data after a new replace commit — the atomic-pointer property the
    in-place overwrite could not give."""
    from jcpg_spark import io as tio

    base = str(tmp_path)
    tio.write_table(
        spark.createDataFrame([(1,)], "id long"), base, "t2")
    old_reader = tio.read_table(spark, base, "t2", snapshot=1)
    tio.write_table(
        spark.createDataFrame([(2,)], "id long"), base, "t2")
    assert [r["id"] for r in old_reader.collect()] == [1]
    assert [r["id"] for r in tio.read_table(spark, base, "t2").collect()] == [2]


def test_append_conversations_equals_full_build(spark, dictionary, tmp_path):
    """Incremental ingest contract: run_pipeline on the first batch +
    append_conversations on the second == build_graph over the full
    corpus, row-identical — including same_as merges that span the two
    batches (the canonicalization is re-solved, not appended)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from jcpg_spark.pipeline import build_graph
    from jcpg_spark.plans.materialize import (
        append_conversations,
        read_graph_edges,
        run_pipeline,
    )
    from jcpg_spark.synth import synth_transcripts

    t_all = synth_transcripts(spark, 16, skew=False).persist()
    convs = sorted(r["conv_id"] for r in t_all.select("conv_id").distinct().collect())
    first = convs[:10]
    t_a = t_all.filter(F.col("conv_id").isin(first))
    t_b = t_all.filter(~F.col("conv_id").isin(first))
    out = str(tmp_path / "inc")

    run_pipeline(spark, t_a, dictionary, out)
    s = append_conversations(spark, t_b, dictionary, out)
    assert "edges" in s.stages_computed and "alias_mapping" in s.stages_computed

    got = sorted(tuple(r) for r in read_graph_edges(spark, out).collect())
    want = sorted(tuple(r) for r in build_graph(spark, t_all, dictionary).edges.collect())
    assert got == want and want

    # appended snapshots really are appends: edges table has 2 snapshots,
    # the second op is append
    from jcpg_spark import io as tio

    log = tio.snapshots(out, "edges")
    assert [e["op"] for e in log] == ["replace", "append"]

    # the full-corpus edge view also matches after a re-read via time
    # travel to snapshot 1 + the second batch alone (sanity on data_dirs)
    n1 = tio.read_table(spark, out, "edges", snapshot=1).count()
    n2 = tio.read_table(spark, out, "edges").count()
    assert n1 < n2

    # re-ingest guard: same batch again must refuse
    with _pytest.raises(ValueError, match="overlaps"):
        append_conversations(spark, t_b, dictionary, out)
