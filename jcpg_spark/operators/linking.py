"""Entity linking — broadcast candidate join + scoring + ranked pick.

Reference analog: the method-name candidate lookup ``findDefInfo``
(``JavacpgDDGBuilder.java:561-667``) — a hand-rolled nested-loop theta-join
of each call site against ``methodDEFs.get(name)`` with package / class /
arity / type filters and first-match-wins selection (``:569-577``).

Spark-native form (SURVEY §2.3 J1/J7, §2.5 W5):

The link score depends only on ``(candidate, role, tool)`` — never on the
individual mention — so the rank-1 decision is precomputed on the DICTIONARY
side: cross the (tiny) dictionary with the distinct ``(role, tool)`` contexts
observed in the data, score with ``score_links``, keep the winner per
``(surface, role, tool)``, and broadcast THAT. Linking the 10^12-row mention
table is then a single broadcast hash join with zero shuffle and zero
aggregation on the big side (the reference's per-call-site nested-loop theta
join, ``JavacpgDDGBuilder.java:561-667``, hoisted to the build side — the
same move as its dictionary pre-aggregation at ``:67-84``).

A naive per-mention rank (window or min_by) is a trap at scale: mention ids
are unique, so grouped aggregation degenerates to a sort on the full data
(ObjectHashAggregate falls back to sort-based beyond its key threshold) —
measured 160x slower than the dimension-side precompute on 7M mentions.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jcpg_spark import schema as S


@F.pandas_udf(T.DoubleType())
def score_links(
    prior: pd.Series, kind: pd.Series, namespace: pd.Series, role: pd.Series, tool: pd.Series
) -> pd.Series:
    """Deterministic link score: dictionary prior + context bonuses.

    +0.3 when a tool-kind candidate's namespace matches the turn's invoked
    tool (the reference's enclosing-class check analog,
    JavacpgDDGBuilder.java:585-599); +0.05 for assistant turns (analog of
    the package-preference tie-break, :601-612).
    """
    bonus = ((kind == "tool") & (namespace == tool)).astype("float64") * 0.3
    bonus = bonus + (role == "assistant").astype("float64") * 0.05
    return prior.astype("float64") + bonus


def score_links_expr(
    prior: Column, kind: Column, namespace: Column, role: Column, tool: Column
) -> Column:
    """JVM-expression twin of ``score_links`` — bit-identical doubles.

    The scoring input is dictionary-x-context sized (tiny), but the pandas
    UDF still cost one ArrowEvalPython stage (python worker launch + Arrow
    round trip) per link_mentions call — per MICRO-BATCH on the streaming
    path. The same arithmetic as built-in expressions runs inside whole-
    stage codegen with no Python boundary (guide §4.1). Identical IEEE tree:
    prior + ((m * 0.3) + (a * 0.05)), with pandas' null semantics (a
    comparison involving null is False, so each conjunct coalesces to
    False) — equality with the UDF is pytest-gated on a null-bearing grid.
    """
    m = F.coalesce((kind == "tool") & (namespace == tool), F.lit(False))
    a = F.coalesce(role == "assistant", F.lit(False))
    return prior.cast("double") + (
        m.cast("double") * F.lit(0.3) + a.cast("double") * F.lit(0.05)
    )


def link_mentions(
    mentions: DataFrame, dictionary: DataFrame, ctx: DataFrame | None = None
) -> DataFrame:
    """-> linked mentions: mention columns + (canonical, kind, namespace,
    score, defs_state). Unresolvable mentions (no dictionary candidate) are
    dropped, mirroring the reference skipping unresolved call sites
    (JavacpgDDGBuilder.java:563-566 returns null -> no edge).

    ``ctx``: optional (role, tool) context DataFrame. Defaults to the
    distinct contexts observed in ``mentions``; STREAMING callers must pass
    a static one (a distinct() on the stream side would be a streaming
    aggregation). A mention whose (role, tool) falls OUTSIDE a caller-
    provided ctx is NOT dropped: it falls back to the context-free best
    candidate for its surface (prior-only score, same tie-break) — a
    declared-vocabulary gap degrades the ranking, never the recall. With
    the default observed-context ctx the fallback is provably dead (every
    mention's context is in ctx), so the batch plan is unchanged.
    """
    # contexts actually present in the data: tiny (|roles| x |tools|)
    fallback = ctx is not None
    if ctx is None:
        ctx = mentions.select("role", "tool").distinct()
    best = _context_best(dictionary, ctx)
    best0 = _surface_best(dictionary) if fallback else None
    return _apply_link(mentions, best, best0)


def _context_best(dictionary: DataFrame, ctx: DataFrame) -> DataFrame:
    """Dictionary-side rank-1 table per (surface, role, tool) context —
    the build side of the linking broadcast join."""
    cand = ctx.crossJoin(dictionary).withColumn(
        "score",
        score_links_expr(
            F.col("prior"), F.col("kind"), F.col("namespace"), F.col("role"), F.col("tool")
        ),
    )
    # rank-1 per (surface, context); min_by over a total ordering key
    # (score desc, canonical asc, namespace asc) — deterministic; the input
    # is dictionary-sized, so the aggregate is trivial.
    payload = [c for c in cand.columns if c not in ("surface", "role", "tool")]
    return cand.groupBy("surface", "role", "tool").agg(
        F.min_by(
            F.struct(*payload),
            F.struct((-F.col("score")).alias("s"), F.col("canonical"), F.col("namespace")),
        ).alias("best")
    ).select(
        "surface",
        "role",
        F.coalesce(F.col("tool"), F.lit("\x00")).alias("_tool_key"),
        *[F.col(f"best.{c}").alias(c) for c in payload if c != "prior"],
    )


def _surface_best(dictionary: DataFrame) -> DataFrame:
    """Context-free rank-1 per surface (prior only, same deterministic
    tie-break) for mentions whose context a static ctx did not declare."""
    return (
        dictionary.groupBy("surface")
        .agg(
            F.min_by(
                F.struct("canonical", "namespace", "kind", "prior", "defs_state"),
                F.struct((-F.col("prior")).alias("s"), F.col("canonical"), F.col("namespace")),
            ).alias("b")
        )
        .select(
            "surface",
            F.col("b.canonical").alias("canonical"),
            F.col("b.namespace").alias("namespace"),
            F.col("b.kind").alias("kind"),
            F.col("b.defs_state").alias("defs_state"),
            F.col("b.prior").cast("double").alias("score"),
        )
    )


def _apply_link(mentions: DataFrame, best: DataFrame, best0: DataFrame | None) -> DataFrame:
    """Probe side of the link: broadcast hash join on (surface, role, tool)
    — null-safe via sentinel; with ``best0`` set, undeclared contexts fall
    back to the context-free winner instead of being dropped."""
    m = mentions.withColumn("_tool_key", F.coalesce(F.col("tool"), F.lit("\x00")))
    hit = m.join(F.broadcast(best), on=["surface", "role", "_tool_key"], how="inner").drop(
        "_tool_key"
    )
    if best0 is None:
        return hit
    miss = m.join(
        F.broadcast(best.select("surface", "role", "_tool_key")),
        on=["surface", "role", "_tool_key"],
        how="left_anti",
    ).drop("_tool_key")
    return hit.unionByName(miss.join(F.broadcast(best0), "surface", "inner"))


def make_context_linker(dictionary: DataFrame, ctx: DataFrame):
    """Repeated-linking closure for STATIC-context callers (micro-batch
    streaming): the dictionary-side rank-1 tables (``_context_best`` over
    the declared ctx, plus the context-free fallback) are built and
    persisted ONCE, so each micro-batch pays only the probe-side broadcast
    join — not a per-batch ctx distinct + dictionary crossJoin + rank
    aggregation. Semantics equal ``link_mentions(m, dictionary, ctx=ctx)``
    exactly (same tables, same join tree), pytest-gated.
    """
    from jcpg_spark.caching import swap_persist

    best = swap_persist("context_linker.best", _context_best(dictionary, ctx))
    best0 = swap_persist("context_linker.best0", _surface_best(dictionary))

    def link(mentions: DataFrame) -> DataFrame:
        return _apply_link(mentions, best, best0)

    return link


def import_triples(linked_mentions: DataFrame) -> DataFrame:
    """IMPORTS edges: (conversation, 'imports', ns:<namespace>) for every
    dictionary namespace the conversation's linked mentions touch.

    Reference analog: ``IMPORTS`` edges (``cpgCFGEdge.java:28``) emitted by
    the import semi-join over the compilation unit's import list
    (``JavacpgICFGBuilder.java:190-213``) — here the "import list" is the
    set of namespaces a conversation actually pulls entities from. A
    distinct projection off ``linked``: the aggregation keys on
    (conv_id, namespace), a strict reduction of the (conv, entity) exchange
    the reference layer shuffles on anyway — no new wide column.
    """
    return (
        linked_mentions.filter(F.col("namespace").isNotNull())
        .select("conv_id", "namespace")
        .distinct()
        .select(
            S.conv_node(F.col("conv_id")).alias("src"),
            F.lit("imports").alias("pred"),
            S.namespace_node(F.col("namespace")).alias("dst"),
            F.lit(None).cast("string").alias("var"),
            "conv_id",
        )
    )


def namespace_nodes(linked_mentions: DataFrame) -> DataFrame:
    """One global node per dictionary namespace observed in the linked
    mentions (IMPORTS edge targets)."""
    return (
        linked_mentions.filter(F.col("namespace").isNotNull())
        .select("namespace")
        .distinct()
        .select(
            S.namespace_node(F.col("namespace")).alias("node_id"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit("namespace").alias("kind"),
            F.col("namespace").alias("label"),
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit(None).cast("map<string,string>").alias("props"),
        )
    )


def link_asof(
    mentions: DataFrame,
    versioned_dictionary: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """SCD-2 entity linking: resolve each mention against the dictionary
    VERSION valid at the mention's own timestamp. -> mention columns +
    (canonical, score, valid_from).

    A production gazetteer is a slowly-changing dimension — entities are
    renamed, re-namespaced, re-weighted — and linking a 10^12-turn corpus
    against "the current dictionary" silently rewrites history (the
    classic SCD-2 mistake). ``versioned_dictionary`` carries one row per
    (surface, version): (surface, canonical, prior, valid_from,
    valid_to); a mention at time t takes the version with
    valid_from <= t < valid_to, ranked by (prior desc, canonical) within
    the valid window — the same total-order rule as ``link_mentions``.

    Plan: ONE broadcast hash join on surface (the dimension stays
    dimension-sized even versioned: |surfaces| x |versions|), with the
    validity range as a post-join filter — Spark keeps the equi-key
    broadcast strategy and evaluates the range residual map-side, so the
    corpus side sees zero shuffles. min_by picks the in-window best
    candidate without a window sort. Mentions with NO valid version at
    their timestamp are dropped (same contract as unresolvable mentions
    in ``link_mentions``).
    """
    cand = versioned_dictionary.select(
        "surface",
        F.col("canonical").alias("_cand_canonical"),
        F.col("prior").cast("double").alias("_cand_prior"),
        F.col("valid_from").alias("_vf"),
        F.col("valid_to").alias("_vt"),
    )
    joined = mentions.join(F.broadcast(cand), "surface").where(
        (F.col(ts_col) >= F.col("_vf")) & (F.col(ts_col) < F.col("_vt"))
    )
    keys = [c for c in mentions.columns]
    best = joined.groupBy(*keys).agg(
        F.min_by(
            F.struct(
                F.col("_cand_canonical").alias("canonical"),
                F.col("_cand_prior").alias("score"),
                F.col("_vf").alias("valid_from"),
            ),
            F.struct((-F.col("_cand_prior")).alias("s"), F.col("_cand_canonical")),
        ).alias("best")
    )
    return best.select(
        *keys,
        F.col("best.canonical").alias("canonical"),
        F.col("best.score").alias("score"),
        F.col("best.valid_from").alias("valid_from"),
    )


def _del_variants(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """-> (id, v): the <=k-deletion neighborhood of each string — the
    string itself plus every string reachable by deleting up to k
    characters (FastSS indexing; Bocek et al., "Fast Similarity Search
    in Large Dictionaries", 2007). Pure column expressions: one
    transform-over-sequence per deletion round, exploded and deduped, so
    the neighborhood never touches Python. ~len(s)^k variants per
    string — that is the documented cost model, which is why k is capped
    at 2."""
    out = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("v"))
    layers = [out]
    cur = out
    dels = (
        "IF(length(v) = 0, array(), "
        "transform(sequence(1, length(v)), "
        "i -> concat(substring(v, 1, i-1), substring(v, i+1, length(v)))))"
    )
    for _ in range(k):
        # the EMPTY variant is load-bearing: two length-1 strings at
        # substitution distance 1 intersect only at '' (delete the
        # edited position from both) — filtering empties would silently
        # lose those pairs; an empty v contributes no further deletions
        # (the IF guard yields array()), so rounds still terminate
        cur = cur.select("id", F.explode(F.expr(dels)).alias("v")).distinct()
        layers.append(cur)
    all_ = layers[0]
    for lay in layers[1:]:
        all_ = all_.unionByName(lay)
    return all_.distinct()


def fuzzy_link(
    queries: DataFrame,
    dictionary: DataFrame,
    k: int = 1,
    q_id: str = "qid",
    q_text: str = "qtext",
    d_id: str = "did",
    d_text: str = "dtext",
) -> DataFrame:
    """-> (qid, did, dist): EVERY pair with levenshtein(qtext, dtext)
    <= k — exact, never all-pairs. The entity-resolution fuzzy join the
    reference's exact-match dictionary lookup cannot express
    (``JavacpgSymbolResolver``-family resolves identifiers literally;
    transcripts carry typos).

    FastSS deletion-neighborhood blocking: lev(u, v) <= k implies the
    <=k-deletion neighborhoods of u and v intersect (delete the edited
    positions from both sides), so an equi-join on the variant string is
    a COMPLETE candidate generator — no false negatives by construction,
    unlike first-letter or length-band blocking. False positives are
    removed by verifying candidates with the JVM ``levenshtein``
    builtin.

    Scale posture: variants are ~len^k per string (k capped at 2);
    candidates go through the shuffle as (qid, did) ID PAIRS ONLY
    (the r3 LSH lesson — strings join back after the distinct); hub
    variants (short strings share deletions) widen candidates but never
    correctness, and the verify filter is a map-side column expression.
    """
    if k not in (1, 2):
        raise ValueError(f"k={k}: FastSS neighborhoods are len^k per "
                         "string; this engine caps k at 2")
    qv = _del_variants(queries, q_id, q_text, k).select(
        F.col("id").alias(q_id), "v"
    )
    dv = _del_variants(dictionary, d_id, d_text, k).select(
        F.col("id").alias(d_id), "v"
    )
    cand = qv.join(dv, "v").select(q_id, d_id).distinct()
    pairs = cand.join(
        queries.select(q_id, q_text), q_id
    ).join(dictionary.select(d_id, d_text), d_id)
    dist = F.levenshtein(F.col(q_text), F.col(d_text))
    return pairs.where(dist <= k).select(q_id, d_id, dist.alias("dist"))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    bucket: float,
    on: Sequence[str] = (),
    id_col: str = "id",
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Interval-overlap join without a cross product: -> one row per
    (left, right) pair whose [lo, hi] intervals overlap (closed-interval
    test ``l.lo <= r.hi AND r.lo <= l.hi``), optionally co-keyed on
    ``on`` equality columns. Spark has no native range-join strategy —
    a naive theta join plans as BroadcastNestedLoop/cartesian — so this
    is the standard bucket-expansion range join:

    - each interval replicates to every width-``bucket`` cell it covers
      (``explode(sequence(floor(lo/B), floor(hi/B)))`` — pure column
      expressions, ~(len/B + 1) replicas per interval);
    - candidates equi-join on (*on, bucket) — a plain hash join;
    - the exact overlap predicate filters map-side;
    - each qualifying pair is kept ONLY in its anchor cell — the bucket
      of ``max(l.lo, r.lo)``, which both sides necessarily cover when
      they overlap — so the output is duplicate-free WITHOUT a distinct
      shuffle.

    Pick ``bucket`` near the median interval length: too small multiplies
    replicas of long intervals, too large multiplies candidates per cell
    (the documented two-sided cost model). Rows with lo > hi are dropped
    (malformed intervals carry no extent). Reference analog: the scope
    containment checks the reference runs while walking block trees
    (``JavacpgCFGBuilder`` region handling) — here as one shuffle over
    bucketed cells at any scale."""
    if bucket <= 0:
        raise ValueError("bucket width must be > 0")
    if "bucket" in on:
        raise ValueError("'bucket' is a reserved column name in interval_join")

    def expand(df: DataFrame, side: str) -> DataFrame:
        ok = df.where(F.col(lo_col) <= F.col(hi_col))
        b0 = F.floor(F.col(lo_col) / F.lit(bucket))
        b1 = F.floor(F.col(hi_col) / F.lit(bucket))
        return ok.select(
            *on,
            F.col(id_col).alias(f"{side}_id"),
            F.col(lo_col).alias(f"{side}_lo"),
            F.col(hi_col).alias(f"{side}_hi"),
            F.explode(F.sequence(b0, b1)).alias("bucket"),
        )

    lhs = expand(left, "l")
    rhs = expand(right, "r")
    j = lhs.join(rhs, [*on, "bucket"])
    overlap = (F.col("l_lo") <= F.col("r_hi")) & (
        F.col("r_lo") <= F.col("l_hi")
    )
    anchor = F.col("bucket") == F.floor(
        F.greatest("l_lo", "r_lo") / F.lit(bucket)
    )
    return j.where(overlap & anchor).select(
        *on, "l_id", "l_lo", "l_hi", "r_id", "r_lo", "r_hi"
    )


def alias_priors(
    observations: DataFrame,
    surface_col: str = "surface",
    entity_col: str = "entity",
    min_count: int = 1,
) -> DataFrame:
    """Anchor-dictionary mining (the Milne&Witten commonness prior):
    from observed (surface, entity) link decisions, build the empirical
    P(entity | surface) table that bootstraps the NEXT generation of the
    J1 candidate dictionary — the feedback loop production entity
    linkers run (Wikipedia anchor statistics do exactly this). Emits
    (surface, entity, n, n_surface, prior, rank); rank 1 is the
    most-common sense with a deterministic entity tie-break.

    Totals are computed over ALL observations before the ``min_count``
    cut, so a surviving row's prior is its true share of the surface's
    mass, not a share of the survivors. Everything is keyed by surface:
    the pair agg, the marginal agg, the join, and the rank window all
    co-partition, so after the first exchange nothing reshuffles.
    """
    obs = observations.select(
        F.col(surface_col).alias("surface"), F.col(entity_col).alias("entity")
    )
    c = obs.groupBy("surface", "entity").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("surface").agg(F.sum("n").alias("n_surface"))
    w = Window.partitionBy("surface").orderBy(F.desc("n"), F.asc("entity"))
    out = (
        c.join(tot, "surface")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("n") >= min_count)
    )
    return out.select(
        "surface", "entity", "n", "n_surface",
        F.round(F.col("n") / F.col("n_surface"), 6).alias("prior"),
        "rank",
    )


def refresh_dictionary(
    dictionary: DataFrame,
    observations: DataFrame,
    blend: float = 0.5,
    surface_col: str = "surface",
    entity_col: str = "entity",
) -> DataFrame:
    """Dictionary refresh — the second half of the ``alias_priors``
    feedback loop: blend each candidate row's shipped prior with the
    EMPIRICAL commonness observed in production link decisions,
    ``prior' = blend * prior + (1 - blend) * P_obs(entity | surface)``,
    so the next linking generation ranks senses by how the corpus
    actually resolved them. Rows whose (surface, canonical) was never
    observed keep their shipped prior scaled by ``blend`` against the
    observed mass (P_obs = 0) IF the surface itself was observed, and
    keep it untouched when the surface never appeared (no evidence, no
    update) — the standard smoothing so one day of logs cannot zero out
    the long tail.

    Dictionary-sized end to end: the observation rollup is
    ``alias_priors`` (data-scale once, vocabulary-sized after), and the
    update join is dictionary-row-keyed. Output schema == input schema,
    so the result drops into ``link_mentions`` unchanged.
    """
    pri = alias_priors(observations, surface_col=surface_col, entity_col=entity_col)
    obs = pri.select(
        F.col("surface"),
        F.col("entity").alias("canonical"),
        F.col("prior").alias("p_obs"),
    )
    seen_surfaces = obs.select("surface").distinct().withColumn("s_seen", F.lit(True))
    j = (
        dictionary.join(obs, ["surface", "canonical"], "left")
        .join(seen_surfaces, "surface", "left")
    )
    new_prior = (
        F.when(F.col("s_seen").isNull(), F.col("prior"))
        .otherwise(
            F.round(
                F.lit(blend) * F.col("prior")
                + F.lit(1.0 - blend) * F.coalesce(F.col("p_obs"), F.lit(0.0)),
                6,
            )
        )
    )
    return j.select(
        "surface", "canonical", "namespace", "kind",
        new_prior.alias("prior"), "defs_state",
    )
