"""Table IO seam: snapshot-committed parquet tables with manifests.

north_rule requires every stage to checkpoint per-partition lineage +
triple-count metrics and the pipeline to resume from the last committed
snapshot. The production target is Iceberg (atomic snapshot commits,
bucket partitioning); the Iceberg runtime jar is not in this sandbox image,
so this module provides the same contract over plain parquet:

- ``write_table`` writes parquet then atomically commits a manifest JSON
  (write temp + rename) recording row count, schema, and per-partition
  lineage (partition id -> rows), exactly the bookkeeping an Iceberg
  snapshot + manifest list would carry.
- ``is_committed`` / ``read_table`` give stage-skip resume: a stage whose
  manifest exists is never recomputed.

Swapping in Iceberg later = replacing these four functions with
``df.writeTo(...).createOrReplace()`` and snapshot inspection; callers are
unchanged (SURVEY §7 "thin io.py seam").
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen an under-partitioned scan to the session's parallelism.

    Small benchmark inputs arrive as a single parquet file with ONE row
    group, so the scan yields one partition and every expression evaluated
    before the first shuffle (shingling, minhash, RHP projections) runs on
    one core. This repartitions ONLY when the scan has fewer partitions
    than ``defaultParallelism`` — at production scale an input table has
    thousands of splits, so the check short-circuits and no shuffle is
    added. A round-robin exchange of the raw rows is strictly cheaper than
    serializing a CPU-bound expression chain on one core (sf0.1 A/B:
    jaccard shingle phase 9.0s -> 1.9s at local[32]).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    partition_cols: tuple[str, ...] = (),
    id_col: str = "file_id",
    size_col: str = "size_bytes",
) -> DataFrame:
    """-> input columns + ``bin``: group small files into rewrite tasks of
    ~``target_bytes`` each (the Iceberg ``rewrite_data_files`` binpack
    planner, expressed relationally).

    A 100 TB table accretes millions of under-sized files (streaming
    micro-batches, per-executor outputs); compaction is the table-
    maintenance operator that keeps scan task counts sane. Files already
    at or above the target are singleton bins (they are not rewritten
    together with others). Within each table partition the remaining files
    are ordered by (size desc, id) and assigned bin =
    floor(running_sum_before / target) — cumulative-sum sharding, ONE
    window over the partition instead of a sequential greedy loop, so the
    planner itself scales with the file count. Each bin's payload is
    bounded by target + the partition's largest small file; the size-desc
    order packs big files first so the tail bins hold many tiny files,
    matching greedy binpack's shape without its sequential dependency.
    Deterministic: ties break on the file id.
    """
    from pyspark.sql import Window

    pcols = [F.col(c) for c in partition_cols]
    big = F.col(size_col) >= target_bytes
    w = (
        Window.partitionBy(*pcols, "_big")
        .orderBy(F.col(size_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rn = Window.partitionBy(*pcols, "_big").orderBy(
        F.col(size_col).desc(), F.col(id_col).asc()
    )
    return (
        files.withColumn("_big", big)
        .withColumn(
            "bin",
            F.when(
                F.col("_big"),
                # singleton bins for already-right-sized files, numbered
                # below 0 so they never collide with the packed bins
                -F.row_number().over(rn).cast("long"),
            ).otherwise(
                F.floor(
                    F.coalesce(F.sum(size_col).over(w), F.lit(0)) / F.lit(target_bytes)
                )
            ),
        )
        .drop("_big")
    )


def table_path(base_dir: str, name: str) -> str:
    return os.path.join(base_dir, name)


def is_committed(base_dir: str, name: str) -> bool:
    return os.path.exists(os.path.join(table_path(base_dir, name), MANIFEST))


def write_table(
    df: DataFrame,
    base_dir: str,
    name: str,
    bucket_col: str | None = None,
    num_buckets: int = 32,
) -> dict:
    """Write ``df`` as a committed snapshot table; returns the manifest.

    ``bucket_col`` hash-distributes output files by the column (the parquet
    stand-in for Iceberg ``bucket(N, col)`` partitioning — co-locates later
    equi-joins on that column and bounds file sizes under skew).
    """
    path = table_path(base_dir, name)
    out = df
    if bucket_col is not None:
        out = df.repartition(num_buckets, F.col(bucket_col))
    # per-partition lineage computed on the same data that is written
    out = out.withColumn("_pid", F.spark_partition_id())
    out.write.mode("overwrite").parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path)
    lineage_rows = written.groupBy("_pid").count().collect()
    lineage = {str(r["_pid"]): r["count"] for r in lineage_rows}
    n_rows = sum(lineage.values())
    # strip the lineage column from the final table (rewrite would double IO;
    # readers use read_table which drops it)
    manifest = {
        "table": name,
        "rows": n_rows,
        "partitions": len(lineage),
        "lineage": lineage,
        "schema": [f.name for f in df.schema.fields],
        "bucket_col": bucket_col,
        "num_buckets": num_buckets if bucket_col else None,
        "format_version": 1,
    }
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, os.path.join(path, MANIFEST))  # atomic commit
    return manifest


def read_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(table_path(base_dir, name))
    return df.drop("_pid") if "_pid" in df.columns else df


def read_manifest(base_dir: str, name: str) -> dict:
    with open(os.path.join(table_path(base_dir, name), MANIFEST)) as f:
        return json.load(f)
