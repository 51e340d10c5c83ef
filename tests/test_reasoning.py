"""RDFS entailment (ρdf fragment) — rule-by-rule and composition gates."""

from __future__ import annotations

from jcpg_spark.operators.reasoning import rdfs_entail


def _df(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def test_rdfs_entail_all_four_rules_and_their_composition(spark):
    """One instance graph exercising every rule and the strata that feed
    each other: subPropertyOf closure (p->q->r), domain typing on an
    INHERITED predicate (q domain fires on a triple rdfs7 produced),
    range typing, and subClassOf closure over asserted AND derived types."""
    schema = _df(spark, [
        ("B", "rdfs.subClassOf", "C"),
        ("C", "rdfs.subClassOf", "D"),
        ("p", "rdfs.subPropertyOf", "q"),
        ("q", "rdfs.subPropertyOf", "r"),
        ("q", "rdfs.domain", "DomC"),
        ("p", "rdfs.range", "RanC"),
    ])
    inst = _df(spark, [("x", "p", "y"), ("z", "rdf.type", "B")])
    got = {tuple(r) for r in rdfs_entail(inst, schema).collect()}
    assert got == {
        ("x", "p", "y"), ("z", "rdf.type", "B"),            # asserted
        ("x", "q", "y"), ("x", "r", "y"),                   # rdfs7 (closure)
        ("x", "rdf.type", "DomC"),                          # rdfs2 on inherited q
        ("y", "rdf.type", "RanC"),                          # rdfs3 on p
        ("z", "rdf.type", "C"), ("z", "rdf.type", "D"),     # rdfs9 (closure)
    }


def test_rdfs_entail_is_idempotent_and_set_semantics(spark):
    """Entailing an already-materialized graph adds nothing (the pass is
    a closure for fixed schema), and duplicate derivations collapse."""
    schema = _df(spark, [
        ("A", "rdfs.subClassOf", "B"),
        ("p", "rdfs.domain", "B"),
    ])
    # (x type B) is derivable two ways (rdfs2 and rdfs9) — one row out
    inst = _df(spark, [("x", "p", "y"), ("x", "rdf.type", "A")])
    once = rdfs_entail(inst, schema)
    rows1 = sorted(tuple(r) for r in once.collect())
    assert rows1.count(("x", "rdf.type", "B")) == 1
    twice = rdfs_entail(once, schema)
    assert sorted(tuple(r) for r in twice.collect()) == rows1


def _shapes_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "shape_id string, target_class string, path string, min_count int, "
        "max_count int, class_constraint string, pattern string",
    )


def test_shacl_validate_all_constraint_kinds(spark):
    """minCount (incl. absent-property nodes), maxCount, sh:class on
    value nodes, sh:pattern — one violation row per SHACL result."""
    from jcpg_spark.operators.reasoning import shacl_validate

    edges = _df(spark, [
        ("c1", "rdf.type", "Call"), ("c2", "rdf.type", "Call"),
        ("c3", "rdf.type", "Call"),
        ("c1", "uses", "t1"),                       # ok: 1 value, typed Tool
        ("c2", "uses", "t1"), ("c2", "uses", "t2"), # maxCount 1 violated
        # c3 has NO uses -> minCount violated
        ("t1", "rdf.type", "Tool"),                 # t2 untyped -> class viol
        ("c1", "name", "call-one"),
        ("c2", "name", "BAD NAME"),                 # pattern violated
    ])
    shapes = _shapes_df(spark, [
        ("S1", "Call", "uses", 1, 1, "Tool", None),
        ("S2", "Call", "name", None, None, None, "^[a-z-]+$"),
    ])
    got = {
        (r["focus"], r["shape_id"], r["path"], r["constraint"], r["got"])
        for r in shacl_validate(edges, shapes).collect()
    }
    assert got == {
        ("c3", "S1", "uses", "min_count", "0"),
        ("c2", "S1", "uses", "max_count", "2"),
        ("c2", "S1", "uses", "class", "t2"),
        ("c2", "S2", "name", "pattern", "BAD NAME"),
    }


def test_shacl_validate_clean_graph_and_unconstrained_noise(spark):
    """A conforming graph emits zero rows; edges whose predicate no shape
    constrains never influence the report (they are pruned before the
    counting shuffle)."""
    from jcpg_spark.operators.reasoning import shacl_validate

    edges = _df(spark, [
        ("c1", "rdf.type", "Call"), ("c1", "uses", "t1"),
        ("t1", "rdf.type", "Tool"),
        ("c1", "noise", "x"), ("c1", "noise", "y"), ("c1", "noise", "z"),
    ])
    shapes = _shapes_df(spark, [("S1", "Call", "uses", 1, 1, "Tool", None)])
    assert shacl_validate(edges, shapes).count() == 0


def test_rdfs_entail_empty_schema_is_identity_and_depth_bounds(spark):
    inst = _df(spark, [("x", "p", "y")])
    out = rdfs_entail(inst, _df(spark, []).limit(0), max_depth=2)
    assert [tuple(r) for r in out.collect()] == [("x", "p", "y")]
    # a chain deeper than max_depth truncates (documented bound)
    schema = _df(spark, [
        ("C1", "rdfs.subClassOf", "C2"),
        ("C2", "rdfs.subClassOf", "C3"),
        ("C3", "rdfs.subClassOf", "C4"),
    ])
    inst = _df(spark, [("x", "rdf.type", "C1")])
    got = {r["dst"] for r in rdfs_entail(inst, schema, max_depth=2).collect()}
    assert got == {"C1", "C2", "C3"}  # C4 is 3 hops up
    full = {r["dst"] for r in rdfs_entail(inst, schema, max_depth=8).collect()}
    assert full == {"C1", "C2", "C3", "C4"}
