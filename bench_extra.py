#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN; this file is the
builder's own measurement loop per spark_optimization_guide.md §1).

Times individual headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS] with the same methodology as bench.py's query
section (fn(spark, sf_dir).count(), min over N windows), and optionally
captures .explain("formatted") into plans/r06/<query>_<tag>.txt.

Usage:
    python bench_extra.py [--plans TAG] [--runs N] [query ...]

With no query names, runs the full headline set. --plans TAG additionally
writes plans/r06/<query>_TAG.txt for each query (TAG = before/after).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINERS = [
    "kg_flow_next",
    "kg_reaching_ref",
    "kg_call_return",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_embedding_lsh",
    "ann_cosine_topk",
    "kg_triangles",
    "kg_pagerank",
    "tpch_q1",
    "corpus_build",
    "dedup_keep_list",
    "doc_bm25_topk",
    "kg_stream_canonical",
    "kg_full_pipeline",
]


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    runs = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_tag = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = HEADLINERS

    from jcpg_spark.session import get_spark
    from jcpg_spark.plans.driver_queries import FOLDED_REGISTRY, REGISTRY

    spark = get_spark(
        app_name="jcpg_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # production hash family for the two md5-seamed registry entries,
    # mirroring bench.py
    from jcpg_spark.operators import dedup as _dedup
    from jcpg_spark.plans.driver_queries import _docs as _bench_docs

    production_family = {
        "dedup_minhash": lambda s, d: _dedup.minhash_lsh_pairs(_bench_docs(s, d)),
        "dedup_simhash": lambda s, d: _dedup.simhash_pairs(_bench_docs(s, d)),
    }

    plans_dir = os.path.join(REPO, "plans", "r06")
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        if name == "kg_full_pipeline":
            from jcpg_spark.pipeline import build_graph
            from jcpg_spark.synth import gazetteer_pdf

            sf = os.path.basename(SF_DIR.rstrip("/"))[2:]
            n_conv = {"0.001": 300, "0.01": 3000, "0.1": 30000}.get(sf, 30000)
            tpath = os.path.join(REPO, ".bench", f"transcripts_{sf}_{n_conv}")
            if not os.path.exists(os.path.join(tpath, "_SUCCESS")):
                from jcpg_spark.synth import synth_transcripts

                synth_transcripts(spark, n_conv).write.mode("overwrite").parquet(tpath)
            tr = spark.read.parquet(tpath)
            dictionary = spark.createDataFrame(gazetteer_pdf())
            fn = lambda s, d: build_graph(s, tr, dictionary).edges  # noqa: E731
        else:
            fn = production_family.get(name)
            if fn is None:
                fn, _sql = REGISTRY.get(name) or FOLDED_REGISTRY[name]

        if plans_tag and name != "kg_stream_canonical":
            try:
                df = fn(spark, SF_DIR)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w") as f:
                    f.write(plan)
            except Exception as ex:  # plan capture must never block timing
                print(f"[plan {name}] FAILED: {ex}", file=sys.stderr)

        walls = []
        rows = None
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            rows = fn(spark, SF_DIR).count()
            walls.append(round(time.time() - t0, 3))
        results[name] = {"sec": min(walls), "walls": walls, "rows": rows}
        print(f"{name}: {min(walls)}s  (walls={walls}, rows={rows})", file=sys.stderr)

    print(json.dumps({k: v["sec"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
