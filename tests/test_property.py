"""Property-based tests: random transcripts vs the pure-pandas oracle.

Hypothesis generates adversarial conversation shapes (orphan tool runs,
consecutive defs, empty texts, single-turn conversations) that the seeded
synthesizer never produces; full-pipeline agreement with the independent
oracle on every one of them is a much stronger guarantee than the fixed
golden corpus alone."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jcpg_spark import schema as S
from jcpg_spark.pipeline import build_graph
from tests.oracle.pandas_oracle import oracle_graph

SURFACES = ["alpha cache", "set alpha cache", "beta queue", "alpha cache alias"]
DICT_ROWS = [
    ("alpha cache", "alpha_cache", "core", "artifact", 0.9, False),
    ("set alpha cache", "alpha_cache", "core", "artifact", 0.9, True),
    ("beta queue", "beta_queue", "core", "artifact", 0.9, False),
    ("alpha cache alias", "alpha_cache_alias", "core", "artifact", 0.8, False),
]
TEXTS = [
    "check the alpha cache now",
    "set alpha cache to zero",
    "introducing alpha cache as alpha cache alias",
    "compare beta queue with alpha cache",
    "alpha cache touches alpha cache",
    "nothing to see here",
    "",
    # failure marker: exercises flow.throws + cdg.enter_throws on random
    # tool runs (incl. multi-turn runs and orphan runs the synth never makes)
    "tool output: no results",
]
ROLES = ["user", "assistant", "tool"]
TOOLS = [None, "search", "db"]


@st.composite
def transcripts(draw):
    n_conv = draw(st.integers(1, 4))
    rows = []
    for c in range(n_conv):
        n_turns = draw(st.integers(1, 12))
        for i in range(n_turns):
            role = draw(st.sampled_from(ROLES))
            tool = draw(st.sampled_from(TOOLS)) if role == "assistant" else None
            text = draw(st.sampled_from(TEXTS))
            rows.append((f"c{c}", i, role, text, tool, dt.datetime(2026, 1, 1)))
    return rows


@pytest.fixture(scope="module")
def prop_dict(spark):
    return spark.createDataFrame(DICT_ROWS, schema=S.DICTIONARY_SCHEMA)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)), min_size=1, max_size=40
    )
)
def test_cc_bts_matches_union_find_on_random_graphs(spark, edges):
    """The large-star/small-star distributed path must produce the exact
    union-find mapping on arbitrary graphs (self-loops and duplicates
    included) — star contraction is subtle enough to fuzz."""
    from jcpg_spark.operators import canonicalize

    rows = [(f"n{a:02d}", f"n{b:02d}") for a, b in edges if a != b]
    if not rows:
        return
    pairs = spark.createDataFrame(rows, ["a", "b"])
    dist, _, conv_d = canonicalize.connected_components(pairs, max_iter=30, driver_threshold=0)
    uf, _, conv_u = canonicalize.connected_components(pairs, driver_threshold=1_000_000)
    assert conv_d and conv_u
    got = {r.entity: r.canonical_id for r in dist.collect()}
    want = {r.entity: r.canonical_id for r in uf.collect()}
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=transcripts())
def test_pipeline_matches_oracle_on_random_transcripts(spark, prop_dict, rows):
    t = spark.createDataFrame(rows, schema=S.TRANSCRIPT_SCHEMA)
    res = build_graph(spark, t, prop_dict)
    got = {(r.src, r.pred, r.dst, r.var, r.conv_id) for r in res.edges.collect()}

    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    want, want_canonical = oracle_graph(
        pdf, pd.DataFrame(DICT_ROWS, columns=["surface", "canonical", "namespace", "kind", "prior", "defs_state"])
    )
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )
    got_canonical = {r.mention_id: r.canonical_id for r in res.canonical.collect()}
    assert got_canonical == want_canonical
