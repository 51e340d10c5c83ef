"""Command-line interface — the reference's user-facing entry point.

Reference analog: ``Main.java`` + ``cmdlinearg.java`` — modes ``-ast
-cfg -pdg -cpg -cpm`` (cmdlinearg.java:22-41), ``-outdir`` (:42-53),
``-format dot|gml|json`` (:54-76), input paths as positionals (:112-117),
``-debug``/``-timetags`` (:89-102). A reference user drives everything
through this surface, so the rebuild ships the same one:

    python -m jcpg_spark --cpg  -f json -o /tmp/out  transcripts.parquet
    python -m jcpg_spark --cpm  -o /tmp/out --scope c1,c2  synth:50
    python -m jcpg_spark --cfg  -f dot -o /tmp/out  synth:10

Mode -> layer mapping (reference graph kinds -> predicate families):

    ast  AST layer only          (ast.*)
    cfg  control layers          (ast.* + act.role + flow.* + cdg.*)
    pdg  data-dependence layer   (ref.* + same_as; needs a dictionary)
    cpg  everything (default)
    cpm  per-scope induced subgraphs (method-level analog)

Formats: ``dot``/``gml`` write the per-conversation documents as text
part-files (one document per conversation, concatenated per partition —
Graphviz processes multi-graph files natively); ``json`` writes the
distributed JSONL graph with manifest; ``parquet`` (beyond the
reference) writes the staged snapshot tables via materialize.
"""

from __future__ import annotations

import argparse
import sys
import time


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="jcpg_spark", description="transcript knowledge-graph construction"
    )
    mode = p.add_mutually_exclusive_group()
    for m, h in [
        ("ast", "AST layer only"),
        ("cfg", "control layers (flow/branch/call/return/segments)"),
        ("pdg", "data-dependence layer (ref.*, same_as)"),
        ("cpg", "full graph (default)"),
        ("cpm", "per-scope induced subgraphs"),
    ]:
        mode.add_argument(f"--{m}", dest="mode", action="store_const", const=m, help=h)
    p.set_defaults(mode="cpg")
    p.add_argument("-f", "--format", choices=["dot", "gml", "json", "parquet"], default="dot")
    p.add_argument("-o", "--outdir", required=True)
    p.add_argument("--dict", dest="dict_path", help="entity dictionary parquet/csv")
    p.add_argument("--scope", help="comma-separated conv_ids for --cpm (default: all)")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--debug", action="store_true", help="verbose Spark logs")
    p.add_argument("--timetags", action="store_true", help="print per-phase wall times")
    p.add_argument("input", help="transcripts parquet path, or synth:N")
    return p


_AST = ("ast.has_turn", "ast.has_mention")
_CFG = _AST[:1] + (
    "act.role", "flow.next", "flow.branch_true", "flow.branch_false",
    "call", "return", "cdg.in_segment", "cdg.follows",
)
_PDG = ("ref.use", "ref.redef", "ref.self", "same_as")


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import functions as F

    from jcpg_spark import export
    from jcpg_spark.session import get_spark

    t0 = time.time()
    spark = get_spark(app_name=f"jcpg_{args.mode}", master=args.master)
    if not args.debug:
        spark.sparkContext.setLogLevel("WARN")

    def tag(phase):
        if args.timetags:
            print(f"[{time.time() - t0:.1f}s] {phase}", file=sys.stderr)

    if args.input.startswith("synth:"):
        from jcpg_spark.synth import synth_transcripts

        transcripts = synth_transcripts(spark, int(args.input.split(":", 1)[1]))
    else:
        from jcpg_spark.sources.transcripts import read_transcripts

        transcripts = read_transcripts(spark, args.input)
    if args.dict_path:
        from jcpg_spark.sources.transcripts import read_dictionary

        dictionary = read_dictionary(spark, args.dict_path)
    else:
        from jcpg_spark.synth import gazetteer_pdf

        dictionary = spark.createDataFrame(gazetteer_pdf())
    tag("input ready")

    if args.format == "parquet":
        from jcpg_spark.plans.materialize import run_pipeline

        s = run_pipeline(spark, transcripts, dictionary, args.outdir)
        tag(f"staged tables: computed={s.stages_computed} skipped={s.stages_skipped}")
        if args.timetags:
            for name, wall in s.stage_walls.items():
                print(f"  stage {name}: {wall}s", file=sys.stderr)
        return 0

    from jcpg_spark.pipeline import build_graph

    res = build_graph(spark, transcripts, dictionary)
    nodes, edges = res.nodes, res.edges
    if args.mode in ("ast", "cfg", "pdg"):
        preds = {"ast": _AST, "cfg": _CFG, "pdg": _PDG}[args.mode]
        edges = edges.filter(F.col("pred").isin(*preds))
    if args.mode == "cpm":
        from jcpg_spark.operators.subgraph import induced_subgraph

        scope = (
            args.scope.split(",")
            if args.scope
            else transcripts.select("conv_id").distinct()
        )
        nodes, edges = induced_subgraph(nodes, edges, scope, res.canonical)
    tag("graph built")

    if args.format == "json":
        manifest = export.write_json_graph(nodes, edges, args.outdir)
        tag(f"json graph: {manifest['nodes']} nodes, {manifest['edges']} edges")
    else:
        docs = (
            export.dot_per_conversation(nodes, edges)
            if args.format == "dot"
            else export.gml_per_conversation(nodes, edges)
        )
        docs.select(docs.columns[1]).write.mode("overwrite").text(args.outdir)
        tag(f"{args.format} documents written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
