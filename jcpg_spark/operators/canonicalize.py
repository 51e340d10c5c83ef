"""Entity canonicalization — iterative connected components (A6).

Reference analog: the iterative DEF-USE fixpoint (``JavacpgDDGBuilder.java:
102-117`` — ``do { changed } while(changed)`` over all files) and the
transitive callee merge (``JavacpgMethodLevel.java:272-290``, recursive
``connectmethods``). Both are "propagate until nothing changes" loops over
shared state; the distributed re-expression is min-label propagation over
the entity alias graph until a convergence aggregate reaches zero — the
same ``changed`` flag, computed as ``sum(changed) == 0`` instead of a
mutable boolean.

Scale properties:
- each round is one shuffle (groupBy node) after an edge/label join;
- ``localCheckpoint()`` per round truncates lineage (else the plan doubles
  every iteration and the driver OOMs on plan size long before data size);
- alias graphs are star-like (aliases point at a hub), so convergence is
  typically 2-3 rounds; a ``max_iter`` cap guards pathological chains —
  the BTS large-star/small-star alternation (PAPERS.md) is the upgrade
  path if real data shows high-diameter components.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jcpg_spark import schema as S

log = logging.getLogger(__name__)


def _driver_union_find_rows(rows, pairs: DataFrame) -> DataFrame:
    """In-memory union-find with min-label roots over collected pair rows;
    returns (entity, canonical_id) as a DataFrame with the pair columns'
    type."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = [(e, find(e)) for e in parent]
    spark = pairs.sparkSession
    a_type = pairs.schema[0].dataType
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("entity", a_type, False), T.StructField("canonical_id", a_type, False)]
    )
    return spark.createDataFrame(out, schema=schema)


def alias_pairs(transcripts: DataFrame, linked_mentions: DataFrame) -> DataFrame:
    """Extract (entity_a, entity_b) assertions from alias-introduction turns.

    A turn whose text matches the introduction form ('introducing X as Y')
    asserts that its first and second linked mentions co-refer. Returns
    distinct (a, b) with a < b (undirected edge, deduped).
    """
    from pyspark.sql import Window

    intro = transcripts.filter(F.col("text").rlike(r"^introducing\b")).select(
        "conv_id", "turn_idx"
    )
    m = linked_mentions.join(intro, on=["conv_id", "turn_idx"], how="left_semi")
    # first/last mention per turn WITHOUT min_by/max_by (TypedImperative
    # aggregates fall back to sort-based aggregation at data-scale group
    # counts): rank within turn, then conditional string max — min/max on
    # strings stay in hash aggregation with partial combine.
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("ordinal")
    w_all = Window.partitionBy("conv_id", "turn_idx")
    m = m.select(
        "conv_id",
        "turn_idx",
        "canonical",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_all).alias("cnt"),
    )
    per_turn = m.groupBy("conv_id", "turn_idx").agg(
        F.max(F.when(F.col("rn") == 1, F.col("canonical"))).alias("first"),
        F.max(F.when(F.col("rn") == F.col("cnt"), F.col("canonical"))).alias("second"),
        F.max("cnt").alias("n"),
    )
    pairs = per_turn.filter((F.col("n") >= 2) & (F.col("first") != F.col("second")))
    return pairs.select(
        F.least("first", "second").alias("a"), F.greatest("first", "second").alias("b")
    ).distinct()


def connected_components(
    pairs: DataFrame, max_iter: int = 25, driver_threshold: int = 1_000_000
) -> tuple[DataFrame, int, bool]:
    """Min-label propagation over undirected (a, b) pairs.

    Returns (mapping DF (entity, canonical), rounds run, converged flag).
    The mapping contains every entity that appears in ``pairs``; entities
    with no alias edge are their own canonical by definition (callers treat
    absence as identity).

    Scale-adaptive: the alias-pair graph is ENTITY-vocabulary-sized, not
    data-sized, so below ``driver_threshold`` distinct pairs the component
    labels are computed with an in-memory union-find on the driver (one
    collect, zero iterative shuffles — same move as Spark's own broadcast
    threshold). Above it, the distributed min-label propagation loop runs;
    both paths produce identical min-of-component labels.
    """
    # single probing job: fetch threshold+1 rows; if the graph is small we
    # already hold it (no separate count + re-collect round trips)
    probe = pairs.limit(driver_threshold + 1).collect()
    if len(probe) <= driver_threshold:
        mapping = _driver_union_find_rows(probe, pairs)
        return mapping, 1, True
    pairs = pairs.persist()
    edges = pairs.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        pairs.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    edges = edges.repartition("u").localCheckpoint()

    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    rounds = 0
    converged = False
    for rounds in range(1, max_iter + 1):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(F.col("u").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "new_label"
                ),
                F.col("label").alias("old_label"),
            )
        )
        changed = new_labels.filter(F.col("new_label") != F.col("old_label")).count()
        labels = new_labels.select("node", F.col("new_label").alias("label")).localCheckpoint()
        if changed == 0:
            converged = True
            break
    if not converged:
        log.warning("connected_components: max_iter=%d reached without convergence", max_iter)
    return labels.select(F.col("node").alias("entity"), F.col("label").alias("canonical_id")), rounds, converged


def same_as_triples(mapping: DataFrame) -> DataFrame:
    """(e:<entity>, 'same_as', e:<canonical>) for merged (non-root) entities."""
    return mapping.filter(F.col("entity") != F.col("canonical_id")).select(
        S.entity_node(F.col("entity")).alias("src"),
        F.lit("same_as").alias("pred"),
        S.entity_node(F.col("canonical_id")).alias("dst"),
        F.lit(None).cast("string").alias("var"),
        F.lit(None).cast("string").alias("conv_id"),
    )


def canonical_map(linked_mentions: DataFrame, mapping: DataFrame) -> DataFrame:
    """Per-mention canonical assignment (FIXTURES.md §3c golden_canonical):
    mention_id -> canonical entity (component root, identity when unmerged)."""
    out = linked_mentions.join(
        F.broadcast(mapping), linked_mentions["canonical"] == mapping["entity"], "left"
    )
    return out.select(
        S.mention_node(F.col("conv_id"), F.col("turn_idx"), F.col("ordinal")).alias("mention_id"),
        F.coalesce(F.col("canonical_id"), F.col("canonical")).alias("canonical_id"),
    )
