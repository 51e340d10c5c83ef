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


# ---------------------------------------------------------------------------
# MP4 box walker (r5): the parser must recover exactly what the boxes
# declare under adversarial container layouts the synthesizer never emits —
# unknown sibling boxes, permuted moov children, version-1 64-bit fields,
# largesize and to-end-of-file size encodings.
# ---------------------------------------------------------------------------
import struct as _struct

from jcpg_spark.operators import multimodal as _mm


def _mvhd(version, timescale, dur_ticks):
    matrix = _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tail = (_struct.pack(">iH10x", 0x00010000, 0x0100) + matrix
            + _struct.pack(">6I", 0, 0, 0, 0, 0, 0) + _struct.pack(">I", 2))
    if version:
        head = _struct.pack(">B3xQQIQ", 1, 0, 0, timescale, dur_ticks)
    else:
        head = _struct.pack(">B3xIIII", 0, 0, 0, timescale, dur_ticks)
    return _mm._mp4_box(b"mvhd", head + tail)


def _tkhd(version, width, height, dur_ticks):
    matrix = _struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    if version:
        head = _struct.pack(">B3BQQI4xQ8x", 1, 0, 0, 7, 0, 0, 1, dur_ticks)
    else:
        head = _struct.pack(">B3BIII4xI8x", 0, 0, 0, 7, 0, 0, 1, dur_ticks)
    return _mm._mp4_box(
        b"tkhd",
        head + _struct.pack(">HHHH", 0, 0, 0, 0) + matrix
        + _struct.pack(">II", width << 16, height << 16),
    )


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    width=st.integers(min_value=1, max_value=8192),
    height=st.integers(min_value=1, max_value=8192),
    dur_ms=st.integers(min_value=0, max_value=86_400_000),
    version=st.integers(min_value=0, max_value=1),
    timescale=st.sampled_from([1000, 600, 90_000, 48_000]),
    pre_boxes=st.lists(st.sampled_from([b"free", b"skip", b"wide"]), max_size=3),
    junk=st.binary(max_size=64),
    mvhd_first=st.booleans(),
    moov_encoding=st.sampled_from(["plain", "largesize", "eof"]),
)
def test_mp4_walker_recovers_declared_metadata(width, height, dur_ms, version,
                                               timescale, pre_boxes, junk,
                                               mvhd_first, moov_encoding):
    from hypothesis import assume

    ticks = dur_ms * timescale // 1000
    # version-0 boxes carry 32-bit durations; a tick count needing 64 bits
    # is exactly what version 1 exists for
    assume(version == 1 or ticks < 2**32)
    children = [_mvhd(version, timescale, ticks),
                _mm._mp4_box(b"trak", _tkhd(version, width, height, ticks))]
    if not mvhd_first:
        children.reverse()
    moov_body = b"".join(children) + _mm._mp4_box(b"udta", junk)
    if moov_encoding == "plain":
        moov = _mm._mp4_box(b"moov", moov_body)
    elif moov_encoding == "largesize":
        moov = _struct.pack(">I4sQ", 1, b"moov", 16 + len(moov_body)) + moov_body
    else:  # size=0: moov extends to end of file, must be last
        moov = _struct.pack(">I4s", 0, b"moov") + moov_body
    payload = (_mm._mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isommp42")
               + b"".join(_mm._mp4_box(t, junk) for t in pre_boxes)
               + moov)
    got_w, got_h, got_ms = _mm.parse_mp4_header(payload)
    assert (got_w, got_h) == (width, height)
    # duration round-trips through the declared timescale (floor division
    # on both sides: ms -> ticks at build, ticks -> ms at parse)
    assert got_ms == ticks * 1000 // timescale


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payload=st.binary(min_size=0, max_size=256))
def test_mp4_walker_never_crashes_on_garbage(payload):
    """Arbitrary bytes must raise ValueError (or parse, if hypothesis
    stumbles onto a valid container) — never IndexError/struct.error:
    a malformed payload in a 100 TB scan must fail as a classified
    per-row error, not an executor crash."""
    try:
        _mm.parse_mp4_header(payload)
    except ValueError:
        pass


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(strings=st.lists(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40),
    min_size=1, max_size=8, unique=True),
    seed=st.integers(min_value=0, max_value=63))
def test_md5_hash_family_matches_duckdb_on_random_strings(spark, strings, seed):
    """The r5 oracle seam invariant under hypothesis: for ARBITRARY
    unicode strings and seeds, dedup._hash64_sql('md5', seed, s) in Spark
    equals the DuckDB expression byte-for-byte — the property every
    md5-family LSH oracle rests on. (The fixed-vector test pins known
    values; this pins the encoding-agreement edge cases: astral-plane
    chars, combining marks, embedded colons and quotes.)"""
    import duckdb

    from pyspark.sql import functions as F

    from jcpg_spark.operators.dedup import _hash64_sql

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r["s"]: r["h"] for r in df.select(
        "s", F.expr(_hash64_sql("md5", str(seed), "s")).alias("h")).collect()}
    con = duckdb.connect()
    for s in strings:
        want = con.execute(
            "SELECT CAST(('0x'||substr(md5(CAST(? AS VARCHAR)||':'||?),1,15)) AS BIGINT)",
            [seed, s]).fetchone()[0]
        assert got[s] == want, repr(s)
