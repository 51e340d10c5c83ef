"""Every FOLDED_REGISTRY entry keeps its exact DuckDB oracle gate.

The driver checks only the 50 entries in REGISTRY; the near-duplicates
consolidated into FOLDED_REGISTRY must not silently rot — each is run
against its oracle here with the same row/column/value comparison the
driver applies (via tools/check_oracle's normalizers), at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

from jcpg_spark.plans.driver_queries import FOLDED_REGISTRY
from tools.check_oracle import TABLES, df_rows

SF = "/root/testdata/sf0.001"

# Pinned sorted-row sha256 (first 16 hex) + row count for the rows-only
# folds at sf0.001 (r4 verdict task 6): each of these has a dedicated
# exactness gate elsewhere (pure-python/numpy twins, sketch-tolerance
# gates, the kg_full_pipeline_sql composite), but a bare count()>0 in THIS
# sweep would miss a silent value regression between those gates' runs.
# Floats (including inside array cells) are quantized to 6 dp BEFORE
# hashing: several of these outputs are distributed float sums whose
# combine order legitimately jitters at ~1e-15 relative (fastrp's
# docstring says so explicitly — full-precision str() of its emb arrays
# hashed differently run-to-run), while a real regression moves values by
# far more than 1e-6. Goldens verified stable over 3 independent runs;
# recompute deliberately when an operator's semantics change (same
# _norm6/_rows_hash recipe over FOLDED_REGISTRY[name] at sf0.001).
ROWS_ONLY_GOLDEN = {
    "ann_pq_topk": ("7d94130ccac9ed97", 25),
    "corpus_overlap": ("8a40b98d069c9fa5", 1),
    "corpus_profile": ("cd4fce918de932c9", 99),
    "emb_semantic_dedup": ("fd8aa2e45c3d89dd", 500),
    "kg_densest": ("645d3129c72477f0", 131),
    "kg_fastrp": ("895c8255f7939193", 131),
    "kg_full_pipeline": ("445460a84f9a57b0", 9327),
    "kg_neighborhood_fn": ("2ef764d04db82c8d", 7),
    "kg_steps_to_failure": ("cca49e90a4241cae", 4),
    "text_compression": ("6ef1edca586e0123", 500),
}


def _norm6(v) -> str:
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{round(v, 6):.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm6(x) for x in v) + "]"
    if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
        return f"{float(v):.6f}"
    return str(v)


def _rows_hash(cols, rows) -> str:
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    srt = sorted(tuple(_norm6(r[i]) for i in order) for r in rows)
    return hashlib.sha256(
        "\n".join("\x1f".join(t) for t in srt).encode()
    ).hexdigest()[:16]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(FOLDED_REGISTRY))
def test_folded_entry_matches_oracle(spark, con, name):
    fn, sql = FOLDED_REGISTRY[name]
    sdf = fn(spark, SF)
    if sql is None:
        # rows-only folds: iterative/trained components (CC, k-means) have
        # no single SQL statement; each has its own exactness gate in
        # pytest (kg_full_pipeline via kg_full_pipeline_sql + the layer
        # pin below; emb_semantic_dedup vs a pure-python twin in
        # test_dedup_similarity). Here (r5): pinned golden sorted-row hash
        # + row count, so THIS sweep also catches silent value regressions
        # between those gates' runs — no bare count()>0 remains.
        cols, rows = sdf.columns, [tuple(r) for r in sdf.collect()]
        want_hash, want_n = ROWS_ONLY_GOLDEN[name]
        assert len(rows) == want_n, (name, len(rows))
        assert _rows_hash(cols, rows) == want_hash, name
        if name == "kg_full_pipeline":
            preds = {r[cols.index("pred")] for r in rows}
            for fam in ("ast.has_turn", "ast.has_mention", "act.role",
                        "flow.next", "call", "return", "cdg.in_segment",
                        "ref.use", "imports"):
                assert fam in preds, f"layer {fam} missing from kg_full_pipeline"
        return
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert df_rows(scols, srows) == df_rows(dcols, drows), name


def test_driver_window_is_exactly_50_and_disjoint_from_folds():
    """The driver checks exactly the first 50 registry entries (round-2
    lesson: entries past the window go silently unchecked). Pin the count,
    the REGISTRY/FOLDED_REGISTRY disjointness, and that the entry-point
    surface mirrors the registry's oracles one-for-one."""
    import __spark_entry__ as e
    from jcpg_spark.plans.driver_queries import REGISTRY

    assert len(REGISTRY) == 50
    assert not set(REGISTRY) & set(FOLDED_REGISTRY)
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(qs) == set(REGISTRY)
    assert set(oracles) == {k for k, (_, sql) in REGISTRY.items() if sql is not None}
