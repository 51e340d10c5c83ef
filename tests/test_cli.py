"""CLI surface (Main.java/cmdlinearg.java analog): modes and formats."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from jcpg_spark.cli import main


def test_cli_cpg_dot(spark, tmp_path):
    out = str(tmp_path / "dot")
    assert main(["--cpg", "-f", "dot", "-o", out, "--master", "local[4]", "synth:3"]) == 0
    text = "".join(open(f).read() for f in glob.glob(out + "/part-*"))
    assert text.count("digraph ") == 3
    assert "flow.next" in text and "cdg.in_segment" in text


def test_cli_cfg_json_filters_layers(spark, tmp_path):
    out = str(tmp_path / "json")
    assert main(["--cfg", "-f", "json", "-o", out, "--master", "local[4]", "synth:3"]) == 0
    manifest = json.load(open(out + "/_GRAPH_MANIFEST.json"))
    assert manifest["nodes"] > 0 and manifest["edges"] > 0
    edges = spark.read.json(out + "/edges")
    preds = {r.pred for r in edges.select("pred").distinct().collect()}
    assert "flow.next" in preds and "cdg.in_segment" in preds
    assert not any(p.startswith("ref.") for p in preds)  # pdg layer excluded
    assert "ast.has_mention" not in preds


def test_cli_cpm_scoped_subgraph_and_parquet_mode(spark, tmp_path):
    out = str(tmp_path / "cpm")
    assert (
        main(
            ["--cpm", "-f", "json", "-o", out, "--scope", "conv000001",
             "--master", "local[4]", "synth:4"]
        )
        == 0
    )
    edges = spark.read.json(out + "/edges")
    convs = {r.conv_id for r in edges.select("conv_id").distinct().collect()}
    assert convs <= {"conv000001", None}
    # parquet mode delegates to run_pipeline (staged path fully covered by
    # test_resume.py) — here just the CLI wiring
    out2 = str(tmp_path / "stage")
    assert main(["--cpg", "-f", "parquet", "-o", out2, "--master", "local[4]", "synth:2"]) == 0
    # tables live behind the snapshot pointer since the io v2 layout
    # (snap-<id>/ dirs + atomic manifest) — read through the io seam,
    # exactly as an Iceberg table is read through its catalog
    from jcpg_spark import io as tio

    assert tio.is_committed(out2, "edges")
    assert (
        tio.read_table(spark, out2, "edges").filter(F.col("pred") == "flow.next").count() > 0
    )
