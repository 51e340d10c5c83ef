"""spark-submit entry point for the KG construction job (north_rule packaging).

Usage:
    python -m jcpg_spark.packaging          # builds dist/jcpg_spark.zip
    spark-submit --py-files dist/jcpg_spark.zip scripts/run_kg_job.py \\
        <transcripts_parquet> <out_dir> [--append]

If <transcripts_parquet> is the literal ``synth:N`` the job synthesizes N
deterministic conversations instead of reading a table (self-contained
smoke for clusters without data mounted). The job is resumable: rerunning
with the same out_dir skips committed stages. With ``--append`` the input
is treated as a NEW batch of conversations extending an already
materialized out_dir (O(new data) snapshot appends; canonicalization
re-solved — see materialize.append_conversations).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--append"]
    append = "--append" in sys.argv[1:]
    src, out_dir = args[0], args[1]
    spark = SparkSession.builder.appName("jcpg_kg_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imported AFTER session start so the --py-files zip is on the path
    from jcpg_spark.plans.materialize import append_conversations, run_pipeline
    from jcpg_spark.sources.transcripts import read_transcripts
    from jcpg_spark.synth import gazetteer_pdf, synth_transcripts

    if src.startswith("synth:"):
        transcripts = synth_transcripts(spark, int(src.split(":", 1)[1]))
    else:
        transcripts = read_transcripts(spark, src)
    dictionary = spark.createDataFrame(gazetteer_pdf())

    if append:
        summary = append_conversations(spark, transcripts, dictionary, out_dir)
    else:
        summary = run_pipeline(spark, transcripts, dictionary, out_dir)
    print(
        f"computed={summary.stages_computed} skipped={summary.stages_skipped} "
        f"edges={summary.manifests['edges']['rows']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
