"""Single bench-job process: full KG pipeline at a given parallelism.

Run as ``python -m jcpg_spark.plans.bench_job <transcripts_parquet> <cpus>
<out_json>`` — a fresh process per parallelism level so each measurement
gets its own JVM (the sandbox proxy for N vs 4N executors per BASELINE.md:
same input, local[8] vs local[32], throughput ratio -> scaling efficiency).
"""

from __future__ import annotations

import json
import sys
import time


def run(transcripts_path: str, cpus: int, aqe: bool = False) -> dict:
    from jcpg_spark.session import get_spark
    from jcpg_spark.pipeline import build_graph
    from jcpg_spark.synth import gazetteer_pdf

    # AQE is off for scaling measurements: its per-query-stage re-planning
    # is driver-serial and dominates small-input walls, polluting the
    # parallel-scaling signal (it stays ON in the default session config,
    # where skew-join handling matters at real data sizes).
    spark = get_spark(
        app_name=f"jcpg_bench_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": str(aqe).lower(),
            "spark.local.dir": "/dev/shm/jcpg_spark_local",
        },
    )
    tr = spark.read.parquet(transcripts_path)
    dictionary = spark.createDataFrame(gazetteer_pdf())

    # Warmup pass on a small prefix (~5% of conversations): JIT compilation,
    # python-worker startup, and pandas imports are one-time per-process
    # costs a real long-running executor amortizes away; measuring them
    # inside the scaling wall would understate parallel efficiency. The
    # measured pass below is steady-state.
    warm = tr.filter(tr["conv_id"] < "conv008000")
    build_graph(spark, warm, dictionary).edges.count()
    spark.catalog.clearCache()

    t0 = time.time()
    res = build_graph(spark, tr, dictionary)
    triples = res.edges.count()
    t1 = time.time()
    wall = t1 - t0
    n_turns = tr.count()
    spark.stop()
    return {
        "cpus": cpus,
        "turns": n_turns,
        "triples": triples,
        "wall_sec": round(wall, 2),
        "triples_per_sec": int(triples / wall),
        # epoch bounds of the measured pass (excludes warmup/synthesis) so
        # the parent's NoiseSampler can scope its contamination verdict to
        # exactly this window — a steal burst during warmup is harmless.
        "measure_t0": round(t0, 2),
        "measure_t1": round(t1, 2),
    }


if __name__ == "__main__":
    path, cpus, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    result = run(path, cpus)
    with open(out, "w") as f:
        json.dump(result, f)
    print(json.dumps(result), file=sys.stderr)
