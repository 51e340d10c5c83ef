"""Golden-graph comparison: distributed pipeline vs pure-pandas oracle.

The BASELINE gate is P/R >= 0.95 (order-insensitive set comparison); we
assert exact agreement — any symmetric difference is a semantics drift.
"""

from __future__ import annotations

import pandas as pd
import pytest

from jcpg_spark.pipeline import build_graph
from jcpg_spark.synth import gazetteer_pdf, synth_transcripts
from tests.oracle.pandas_oracle import oracle_graph


@pytest.fixture(scope="module")
def t_unit(spark):
    # FIXTURES.md t_unit: 30 conversations incl. the skew conversation.
    df = synth_transcripts(spark, 30, skew=True).persist()
    df.count()
    return df


def _edge_set(edges_df):
    return {
        (r.src, r.pred, r.dst, r.var, r.conv_id)
        for r in edges_df.collect()
    }


def test_pipeline_matches_oracle(spark, dictionary, t_unit):
    res = build_graph(spark, t_unit, dictionary)
    got = _edge_set(res.edges)

    tp = t_unit.toPandas()
    tp["tool"] = tp["tool"].where(pd.notna(tp["tool"]), None)
    want, want_canonical = oracle_graph(tp, gazetteer_pdf())

    missing = want - got
    extra = got - want
    precision = (len(got) - len(extra)) / max(len(got), 1)
    recall = (len(want) - len(missing)) / max(len(want), 1)
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.4f} R={recall:.4f}\n"
        f"missing (oracle-only) sample: {sorted(missing)[:10]}\n"
        f"extra (spark-only) sample: {sorted(extra)[:10]}"
    )
    # strict: exact agreement expected between our two implementations
    assert not missing and not extra, (
        f"missing={sorted(missing)[:10]} extra={sorted(extra)[:10]}"
    )

    got_canonical = {r.mention_id: r.canonical_id for r in res.canonical.collect()}
    assert got_canonical == want_canonical


def test_pipeline_matches_frozen_golden(spark, dictionary, t_unit):
    """Against the FROZEN golden (tests/goldens/, generated once from the
    oracle and committed) — catches oracle+pipeline co-drift that the live
    comparison above cannot. P/R >= 0.95 gate; exact expected."""
    import gzip
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "goldens", "t_unit_golden.json.gz")
    with gzip.open(path, "rt") as f:
        golden = json.load(f)
    want = {tuple(e) for e in golden["edges"]}

    res = build_graph(spark, t_unit, dictionary)
    got = _edge_set(res.edges)
    missing, extra = want - got, got - want
    precision = (len(got) - len(extra)) / max(len(got), 1)
    recall = (len(want) - len(missing)) / max(len(want), 1)
    assert precision >= 0.95 and recall >= 0.95, f"P={precision} R={recall}"
    assert not missing and not extra

    got_canonical = {r.mention_id: r.canonical_id for r in res.canonical.collect()}
    assert got_canonical == golden["canonical"]


def test_cc_converges(spark, dictionary, t_unit):
    res = build_graph(spark, t_unit, dictionary)
    assert res.cc_converged
    assert res.cc_rounds <= 10
