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


def test_owl_entail_inverse_symmetric_and_composition(spark):
    """prp-inv both directions, prp-symp, and the schema-side rule
    COMPOSITION: P inverseOf Q with Q symmetric entails (x Q y) from
    (x P y) via P->Q (swap) then Q->Q (swap) — net parity 0."""
    from jcpg_spark.operators.reasoning import owl_entail

    schema = _df(spark, [
        ("p", "owl.inverseOf", "q"),
        ("q", "rdf.type", "owl.SymmetricProperty"),
    ])
    inst = _df(spark, [("x", "p", "y"), ("u", "q", "v")])
    got = {tuple(r) for r in owl_entail(inst, schema).collect()}
    assert got == {
        ("x", "p", "y"), ("u", "q", "v"),   # asserted
        ("y", "q", "x"),                    # prp-inv1 on p
        ("v", "p", "u"),                    # prp-inv2 on q
        ("x", "q", "y"),                    # composed: inverse then symmetric
        ("v", "q", "u"),                    # prp-symp on q
        ("u", "p", "v"),                    # composed: symmetric then inverse
        ("y", "p", "x"),                    # p->q->q->p parity 1: the inverse
                                            # of a symmetric property is itself
                                            # symmetric — depth-3 composition
    }


def test_owl_entail_transitive_is_hop_bounded_and_cycle_safe(spark):
    from jcpg_spark.operators.reasoning import owl_entail

    schema = _df(spark, [("t", "rdf.type", "owl.TransitiveProperty")])
    chain = _df(spark, [("a", "t", "b"), ("b", "t", "c"), ("c", "t", "d"),
                        ("d", "t", "a"),      # cycle
                        ("a", "other", "b")])  # non-transitive pred untouched
    got = {tuple(r) for r in owl_entail(chain, schema, max_hops=2).collect()}
    # 2 hops: every length-2 pair present, no length-3 pairs
    assert ("a", "t", "c") in got and ("b", "t", "d") in got
    assert ("c", "t", "a") in got and ("d", "t", "b") in got
    assert ("a", "t", "d") not in got
    assert ("a", "other", "c") not in got
    full = {tuple(r) for r in owl_entail(chain, schema, max_hops=8).collect()}
    # the 4-cycle closes to all 16 ordered pairs (incl. self-loops)
    assert sum(1 for s, p, o in full if p == "t") == 16


def test_owl_entail_empty_schema_identity_and_transitive_over_derived(spark):
    """No schema rows -> distinct(input); and the transitive stratum
    sees inverse-DERIVED triples (the stratification contract)."""
    from jcpg_spark.operators.reasoning import owl_entail

    inst = _df(spark, [("x", "p", "y"), ("x", "p", "y")])
    out = owl_entail(inst, _df(spark, []).limit(0))
    assert sorted(tuple(r) for r in out.collect()) == [("x", "p", "y")]

    schema = _df(spark, [
        ("p", "owl.inverseOf", "q"),
        ("q", "rdf.type", "owl.TransitiveProperty"),
    ])
    # q edges exist only via inversion of p: y<-x and z<-y, so the
    # closure must derive (z q x)... inverse gives (y q x), (z q y)
    inst2 = _df(spark, [("x", "p", "y"), ("y", "p", "z")])
    got = {tuple(r) for r in owl_entail(inst2, schema).collect()}
    assert ("z", "q", "x") in got


def test_owl_property_chain_and_stratification(spark):
    """prp-spo2: a chain axiom derives R from p∘q via the sequence-path
    engine, and chain-derived triples feed the later strata (a symmetric
    R also gets its reversed edges)."""
    from jcpg_spark.operators.reasoning import OWL_CHAIN, owl_entail

    inst = spark.createDataFrame(
        [("ann", "parent", "bob"), ("bob", "parent", "cid"),
         ("cid", "parent", "dee"), ("ann", "knows", "eve")],
        "src string, pred string, dst string",
    )
    schema = spark.createDataFrame(
        [("grandparent", OWL_CHAIN, "parent/parent")],
        "src string, pred string, dst string",
    )
    out = {(r["src"], r["pred"], r["dst"])
           for r in owl_entail(inst, schema).collect()}
    assert {t for t in out if t[1] == "grandparent"} == {
        ("ann", "grandparent", "cid"), ("bob", "grandparent", "dee")
    }
    assert ("ann", "knows", "eve") in out  # asserted layer intact
    schema2 = spark.createDataFrame(
        [("grandparent", OWL_CHAIN, "parent/parent"),
         ("grandparent", "rdf.type", "owl.SymmetricProperty")],
        "src string, pred string, dst string",
    )
    out2 = {(r["src"], r["pred"], r["dst"])
            for r in owl_entail(inst, schema2).collect()}
    assert ("cid", "grandparent", "ann") in out2  # chain fed the swap stratum


def test_ifp_same_as_star_pairs_and_cc_composition(spark):
    """prp-ifp: subjects sharing an IFP object emit anchor-star pairs
    (n-1 per group, never C(n,2)); duplicate assertions don't re-emit;
    max_group drops hub keys; union-find closes cross-key merges."""
    from pyspark.sql import functions as F

    from jcpg_spark.operators.canonicalize import connected_components
    from jcpg_spark.operators.reasoning import ifp_same_as

    rows = [
        ("u1", "email", "e@x"), ("u2", "email", "e@x"), ("u3", "email", "e@x"),
        ("u2", "email", "e@x"),              # duplicate assertion
        ("u3", "phone", "+1"), ("u4", "phone", "+1"),  # bridges u3 -> u4
        ("u5", "email", "solo@x"),           # singleton: no pair
        ("h1", "email", ""), ("h2", "email", ""), ("h3", "email", ""),
    ]
    e = spark.createDataFrame(rows, ["src", "pred", "dst"])
    pairs = ifp_same_as(e, ["email", "phone"])
    got = {(r["pred"], r["key"], r["a"], r["b"]) for r in pairs.collect()}
    assert got == {
        ("email", "e@x", "u1", "u2"), ("email", "e@x", "u1", "u3"),
        ("phone", "+1", "u3", "u4"),
        ("email", "", "h1", "h2"), ("email", "", "h1", "h3"),
    }
    # every pair carries its key group's subject count (evidence weight;
    # also makes the max_group cap auditable instead of silent)
    gn = {(r["pred"], r["key"]): r["group_n"] for r in pairs.collect()}
    assert gn == {("email", "e@x"): 3, ("phone", "+1"): 2, ("email", ""): 3}
    # hub-key guard: the empty-email group (3 subjects) drops at max_group=2
    capped = {(r["a"], r["b"]) for r in ifp_same_as(e, ["email", "phone"], max_group=2).collect()}
    assert capped == {("u3", "u4")}
    # composition: CC over the pairs merges u1-u4 through the shared subject
    mapping, _, conv = connected_components(
        pairs.select(F.col("a"), F.col("b"))
    )
    assert conv
    roots = {r["entity"]: r["canonical_id"] for r in mapping.collect()}
    assert roots["u4"] == roots["u1"] == roots["u2"] == roots["u3"] == "u1"
