"""Phase profiler for the KG pipeline at a given parallelism.

Usage: python scripts/profile_phases.py <transcripts_parquet> <cpus> [out_json]

Times each pipeline phase separately (mentions, linking, alias-pairs +
connected components, fused emission) in one fresh process, mirroring
build_graph's persist structure, so per-phase per-core scaling can be
compared across two runs at different core counts. Used to chase the
round-3 finding that the CC phase scaled at 0.59 per-core while every
other phase was ~0.98 (VERDICT round 3, task 3).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    path, cpus = sys.argv[1], int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else None
    sys.path.insert(0, "/root/repo")

    from jcpg_spark.session import get_spark
    from jcpg_spark.operators import calls, canonicalize, linking, mentions, references
    from jcpg_spark.pipeline import DEFAULT_FAILURE_RX
    from jcpg_spark.synth import gazetteer_pdf

    spark = get_spark(
        app_name=f"jcpg_profile_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.local.dir": "/dev/shm/jcpg_spark_local",
        },
    )
    t = {}

    def phase(name, fn):
        t0 = time.time()
        n = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"[{cpus}c] {name}: {t[name]}s ({n})", file=sys.stderr, flush=True)

    dictionary = spark.createDataFrame(gazetteer_pdf())
    surfaces = [r["surface"] for r in dictionary.select("surface").distinct().collect()]

    tr = spark.read.parquet(path)
    # warmup (JIT + python workers) on a prefix, as bench_job does
    warm = tr.filter(tr["conv_id"] < "conv008000")
    m_w = mentions.detect_mentions(spark, warm, surfaces)
    linking.link_mentions(m_w, dictionary).count()
    spark.catalog.clearCache()

    tr = tr.persist()
    phase("load", lambda: tr.count())

    m = mentions.detect_mentions(
        spark, tr, surfaces, turn_flag_rx=canonicalize.INTRO_RX
    ).persist()
    phase("mentions", lambda: m.count())

    linked = linking.link_mentions(m, dictionary).persist()
    phase("linking", lambda: linked.count())

    pairs = canonicalize.alias_pairs(tr, linked)
    t0 = time.time()
    probe = pairs.limit(1_000_001).collect()
    t["cc_alias_collect"] = round(time.time() - t0, 2)
    print(f"[{cpus}c] cc_alias_collect: {t['cc_alias_collect']}s ({len(probe)} pairs)",
          file=sys.stderr, flush=True)

    t0 = time.time()
    mapping = canonicalize._driver_union_find_rows(probe, pairs)
    mapping_n = mapping.count()
    t["cc_union_find"] = round(time.time() - t0, 2)
    print(f"[{cpus}c] cc_union_find: {t['cc_union_find']}s ({mapping_n} entities)",
          file=sys.stderr, flush=True)

    def emit():
        from jcpg_spark.pipeline import edge_layers

        edges = edge_layers(tr, m, linked, mapping, failure_rx=DEFAULT_FAILURE_RX)
        return edges.count()

    phase("emission", emit)

    t["cpus"] = cpus
    print(json.dumps(t))
    if out:
        with open(out, "w") as f:
            json.dump(t, f)
    spark.stop()


if __name__ == "__main__":
    main()
