"""Property-based invariants (SURVEY §5.2 item 3)."""

from __future__ import annotations

import hashlib
import json

import pytest

from jcpg_spark.pipeline import build_graph
from jcpg_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def t_small(spark):
    df = synth_transcripts(spark, 12, skew=False).persist()
    df.count()
    return df


def _fingerprint(df):
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.sha256(json.dumps(rows, default=str).encode()).hexdigest()


def test_triples_invariant_to_repartitioning(spark, dictionary, t_small):
    """df.repartition(k) for k in {1,4,32} => identical sorted hash."""
    hashes = {
        k: _fingerprint(build_graph(spark, t_small.repartition(k), dictionary).edges)
        for k in (1, 4, 32)
    }
    assert len(set(hashes.values())) == 1, hashes


def test_per_turn_text_equality(spark, dictionary, t_small):
    """input_hint invariant: turn text round-trips unchanged; every mention
    span re-slices to its surface."""
    orig = {(r.conv_id, r.turn_idx): r.text for r in t_small.collect()}
    res = build_graph(spark, t_small, dictionary)
    for m in res.mentions.collect():
        assert orig[(m.conv_id, m.turn_idx)][m.start : m.end].lower() == m.surface


def test_synth_deterministic_across_parallelism(spark):
    a = sorted(tuple(r) for r in synth_transcripts(spark, 6, skew=False).collect())
    b = sorted(tuple(r) for r in synth_transcripts(spark, 6, skew=False, parallelism=1).collect())
    assert a == b


def test_node_ids_unique(spark, dictionary, t_small):
    res = build_graph(spark, t_small, dictionary)
    n = res.nodes.count()
    assert res.nodes.select("node_id").distinct().count() == n


def test_edge_predicates_within_closed_vocabulary(spark, dictionary, t_small):
    """Every emitted pred is in schema.PREDICATES (FIXTURES §3b closed
    vocabulary) — catches an edge layer shipping a predicate the schema
    contract never declared (e.g. when new layers like cdg.* are added)."""
    from jcpg_spark import schema as S

    res = build_graph(spark, t_small, dictionary)
    got = {r.pred for r in res.edges.select("pred").distinct().collect()}
    assert got <= set(S.PREDICATES), got - set(S.PREDICATES)
    # and the graph actually exercises the CDG layer
    assert {"cdg.in_segment", "cdg.follows"} <= got


def test_segment_triples_invariant_to_repartitioning(spark, t_small):
    from jcpg_spark.operators import flow

    a = sorted(tuple(r) for r in flow.segment_triples(t_small.repartition(1)).collect())
    b = sorted(tuple(r) for r in flow.segment_triples(t_small.repartition(7)).collect())
    assert a == b


def test_edges_reference_existing_nodes(spark, dictionary, t_small):
    """Referential integrity: every src/dst appears in the nodes table."""
    res = build_graph(spark, t_small, dictionary)
    node_ids = res.nodes.select("node_id")
    for col in ("src", "dst"):
        dangling = (
            res.edges.select(res.edges[col].alias("node_id"))
            .distinct()
            .join(node_ids, "node_id", "left_anti")
            .count()
        )
        assert dangling == 0, f"dangling {col}"


def test_new_operators_partitioning_invariant(spark):
    """Every operator added in the late r4 session must produce an
    identical row set at repartition(1) and repartition(7) — the same
    pipeline-invariance contract build_graph carries."""
    from pyspark.sql import functions as F

    from jcpg_spark.operators.curation import sft_pairs
    from jcpg_spark.operators.flow import interarrival_stats, topic_segments
    from jcpg_spark.operators.graph_analytics import triad_census, wl_fingerprint
    from jcpg_spark.operators.lm import sequence_typicality
    from jcpg_spark.synth import synth_transcripts

    t = synth_transcripts(spark, 40)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    ops = {
        "topic_segments": lambda d: topic_segments(d),
        "sft_pairs": lambda d: sft_pairs(d),
        "interarrival": lambda d: interarrival_stats(d),
        # avg(logp) is order-sensitive in the last bits; compare at the
        # 6 dp the driver entry pins (the pagerank convention)
        "typicality": lambda d: sequence_typicality(d, "role").select(
            "conv_id", F.round("typicality", 6).alias("typicality")
        ),
    }
    for name, fn in ops.items():
        a = rows(fn(t.repartition(1)))
        b = rows(fn(t.repartition(7)))
        assert a == b, name
        assert a, name  # non-vacuous

    from jcpg_spark.operators.flow import flow_next

    e1 = flow_next(t.repartition(1)).select("src", "pred", "dst", "conv_id")
    e7 = flow_next(t.repartition(7)).select("src", "pred", "dst", "conv_id")
    assert rows(wl_fingerprint(e1)) == rows(wl_fingerprint(e7))
    assert rows(triad_census(e1.select("src", "dst"))) == rows(
        triad_census(e7.select("src", "dst"))
    )
