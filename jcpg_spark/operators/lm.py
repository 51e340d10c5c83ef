"""Statistical language-model quality scoring (CCNet-style, self-trained).

The production filter behind CCNet / CC-Net-derived corpora scores every
document by its perplexity under a small n-gram LM and drops the tail.
This is the dependency-free form of that operator: the corpus trains its
OWN add-alpha-smoothed bigram model in one aggregation pass, then every
document is scored by its mean bigram log-probability — high-scoring docs
look like the corpus's dominant register, low scores flag gibberish,
boilerplate-mangled text, or wrong-language content. No external model
file, no UDF: the whole computation is joins + hash-aggs over exploded
bigrams.

Scale posture: ONE explode pass over the corpus produces per-doc bigram
counts (the heaviest shuffle, keyed by (doc, w1, w2)); the model tables
are vocabulary-sized aggregates of that frame, and scoring joins the
per-doc counts back to the model on the bigram key — hash joins on
string pairs, no broadcast assumption (a 100 TB corpus's bigram
vocabulary can be large). The vocabulary scalar rides along as a 1-row
broadcast crossJoin (the ``pagerank`` idiom), so nothing collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jcpg_spark.functions.text import words


def bigram_lm_scores(
    docs: DataFrame, text_col: str = "text", alpha: float = 0.5
) -> DataFrame:
    """-> (doc_id, lm_score): mean bigram log-probability of each document
    under the corpus's own add-``alpha`` smoothed bigram model.

    For each document: score = sum_bigrams n(w1,w2) * ln P(w2|w1) / n_bigrams
    with P(w2|w1) = (c(w1,w2) + alpha) / (c(w1,.) + alpha * V), V = number
    of distinct successor words in the corpus. Documents with fewer than
    two word tokens have no bigrams and are absent from the result.

    Determinism: counts are exact integers; the only doubles are one ln and
    one division per model row plus the per-doc weighted mean — callers
    needing cross-engine equality round (the driver entry pins 6 dp, the
    same convention as ``pagerank``).
    """
    # per-doc bigram multiplicities: the corpus model is a pure rollup of
    # this frame, so it is computed once and persisted across its three
    # consumers (model build + the scoring join)
    from jcpg_spark.caching import swap_persist

    dbc = swap_persist("bigram_lm.dbc", _doc_bigram_counts(docs, text_col))
    cb = dbc.groupBy("w1", "w2").agg(F.sum("n").alias("cb"))
    cu = cb.groupBy("w1").agg(F.sum("cb").alias("cu"))
    v = cb.agg(F.count_distinct("w2").alias("v"))
    model = (
        cb.join(cu, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("cb") + F.lit(alpha))
                / (F.col("cu") + F.lit(alpha) * F.col("v"))
            ).alias("logp"),
        )
    )
    return (
        dbc.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg((F.sum(F.col("n") * F.col("logp")) / F.sum("n")).alias("lm_score"))
    )


def kn_bigram_scores(
    docs: DataFrame, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """-> (doc_id, kn_score): mean bigram log-probability under an
    interpolated Kneser-Ney bigram model self-trained on the corpus — the
    smoothing KenLM applies in the production perplexity filters
    (CCNet/RedPajama/Dolma), upgrading ``bigram_lm_scores``'s add-alpha:
    absolute discounting with the freed mass re-routed through the
    CONTINUATION distribution (how many contexts a word follows, not how
    often), the fix for high-count-but-single-context words.

        P_kn(w2|w1) = max(c(w1,w2) - D, 0)/c(w1.)
                      + D * N1+(w1.)/c(w1.) * N1+(.w2)/N1+(..)

    Scale: the model is three rollups of the same (w1, w2) count frame
    (forward marginal + fanout, continuation fanout, one global scalar);
    scoring joins per-doc bigram counts to the model on the bigram key —
    identical shuffle shape to ``bigram_lm_scores``, one extra
    vocabulary-sized join for the continuation table. Scoring covers
    observed bigrams (inner join), the same convention as the add-alpha
    scorer; every observed bigram has P > 0 because D < 1 leaves at least
    (1 - D)/c(w1.) plus a positive continuation term.
    """
    from jcpg_spark.caching import swap_persist

    dbc = swap_persist("kn_lm.dbc", _doc_bigram_counts(docs, text_col))
    cb = dbc.groupBy("w1", "w2").agg(F.sum("n").alias("cb"))
    cu = cb.groupBy("w1").agg(
        F.sum("cb").alias("cu"), F.count(F.lit(1)).alias("n1p_fw")
    )
    cont = cb.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bw"))
    tot = cb.agg(F.count(F.lit(1)).alias("n1p_all"))
    d = F.lit(discount)
    model = (
        cb.join(cu, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.log(
                F.greatest(F.col("cb") - d, F.lit(0.0)) / F.col("cu")
                + d * F.col("n1p_fw") / F.col("cu")
                * (F.col("n1p_bw") / F.col("n1p_all"))
            ).alias("logp"),
        )
    )
    return (
        dbc.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg((F.sum(F.col("n") * F.col("logp")) / F.sum("n")).alias("kn_score"))
    )


def ccnet_buckets(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    n_buckets: int = 3,
) -> DataFrame:
    """-> (doc_id, <group_col>, lm_score, bucket): CCNet's head/middle/tail
    partitioning (Wenzek et al. 2020) — within each language, rank documents
    by perplexity under the corpus's own LM and cut into ``n_buckets``
    equal-size tiers, so a curation policy can keep "head", sample "middle",
    and drop "tail" per language instead of applying one global threshold.

    Self-contained like ``bigram_lm_scores`` (no external model): the score
    is the mean bigram log-probability, higher = more fluent = lower
    perplexity, so head = highest score. Scores are pinned to 6 dp BEFORE
    ranking and tie-break on doc_id — the rank is then a pure function of
    values both engines agree on bit-for-bit (ordering raw IEEE doubles
    across engines risks last-ulp rank flips). ntile is the SQL-standard
    allocation (earlier tiles take the remainder). Documents with no
    bigrams have no score and are absent, matching ``bigram_lm_scores``.

    Plan: the scoring rollup plus one ranking window partitioned BY
    LANGUAGE — the partition key is low-cardinality but each partition is
    only ranked, not collected; at 10^12 docs swap the ntile for the
    two-pass approx-quantile cut (percentile_approx per lang, one tiny
    broadcast back) the same frame supports.
    """
    from pyspark.sql import Window

    scored = bigram_lm_scores(docs, text_col=text_col).select(
        "doc_id", F.round("lm_score", 6).alias("lm_score")
    )
    labels = F.array(
        *[F.lit(x) for x in ("head", "middle", "tail")[: n_buckets]]
    ) if n_buckets <= 3 else None
    w = Window.partitionBy(group_col).orderBy(
        F.col("lm_score").desc(), F.col("doc_id").asc()
    )
    out = (
        docs.select("doc_id", group_col)
        .join(scored, "doc_id")
        .withColumn("tile", F.ntile(n_buckets).over(w))
    )
    bucket = (
        F.element_at(labels, F.col("tile")) if labels is not None
        else F.concat(F.lit("q"), F.col("tile").cast("string"))
    )
    return out.select("doc_id", group_col, "lm_score", bucket.alias("bucket"))


def _doc_bigram_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2, n): per-document bigram multiplicities — the one
    explode pass both model training and scoring are rollups of."""
    ws = words(F.col(text_col))
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.struct(
                F.element_at(ws, (i + 1).cast("int")).alias("w1"),
                F.element_at(ws, (i + 2).cast("int")).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    b = docs.select("doc_id", F.explode(bigrams).alias("bg")).select(
        "doc_id", "bg.w1", "bg.w2"
    )
    return b.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n"))


def dsir_weights(
    docs: DataFrame,
    is_target,
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): every document is scored
    by its mean per-bigram log-likelihood RATIO between a model of the
    target domain (the ``is_target`` subset of this corpus) and a model of
    the raw corpus — high weight means "looks like the target domain,
    unlike the generic pool", and sampling proportional to the weight
    tilts a pretraining mixture toward the target without an external
    classifier. -> (doc_id, dsir_weight).

    Both models are add-``alpha`` smoothed bigram LMs trained in the same
    aggregation pass family as :func:`bigram_lm_scores`; the raw model is
    trained on the whole corpus, so every scored bigram has a raw-model
    row, while target-model probabilities for unseen bigrams fall back to
    the smoothed floor via left joins:
    ``P_t(w2|w1) = (c_t(w1,w2) + alpha) / (c_t(w1,.) + alpha * V_t)``
    with missing counts read as zero (an unseen conditioning word scores
    ``1 / V_t``).

    Scale posture: identical to ``bigram_lm_scores`` — one corpus explode
    shuffle keyed by (doc, w1, w2), vocabulary-sized model rollups, hash
    joins on the bigram key (no broadcast assumption on the model), and
    the two vocabulary scalars ride as 1-row broadcast crossJoins. The
    target subset adds one boolean column to the count pass, not a second
    scan of the text.

    Determinism: counts are exact integers; per-row doubles are two ln
    calls and two divisions — callers needing cross-engine equality round
    (the driver entry pins 6 dp, the ``doc_lm_score`` convention).
    """
    from jcpg_spark.caching import swap_persist

    flagged = docs.withColumn("_is_t", is_target)
    dbc = swap_persist(
        "dsir.dbc",
        _doc_bigram_counts(flagged, text_col).join(
            flagged.select("doc_id", "_is_t"), "doc_id"
        ),
    )
    raw_cb = dbc.groupBy("w1", "w2").agg(F.sum("n").alias("cb_r"))
    raw_cu = raw_cb.groupBy("w1").agg(F.sum("cb_r").alias("cu_r"))
    raw_v = raw_cb.agg(F.count_distinct("w2").alias("v_r"))
    tgt = dbc.filter(F.col("_is_t"))
    tgt_cb = tgt.groupBy("w1", "w2").agg(F.sum("n").alias("cb_t"))
    tgt_cu = tgt_cb.groupBy("w1").agg(F.sum("cb_t").alias("cu_t"))
    tgt_v = tgt_cb.agg(F.count_distinct("w2").alias("v_t"))
    a = F.lit(float(alpha))
    scored = (
        dbc.join(raw_cb, ["w1", "w2"])
        .join(raw_cu, "w1")
        .join(tgt_cb, ["w1", "w2"], "left")
        .join(tgt_cu, "w1", "left")
        .crossJoin(F.broadcast(raw_v))
        .crossJoin(F.broadcast(tgt_v))
        .select(
            "doc_id",
            "n",
            (
                F.log(
                    (F.coalesce(F.col("cb_t"), F.lit(0)) + a)
                    / (F.coalesce(F.col("cu_t"), F.lit(0)) + a * F.col("v_t"))
                )
                - F.log((F.col("cb_r") + a) / (F.col("cu_r") + a * F.col("v_r")))
            ).alias("llr"),
        )
    )
    return scored.groupBy("doc_id").agg(
        (F.sum(F.col("n") * F.col("llr")) / F.sum("n")).alias("dsir_weight")
    )


def skipgram_counts(
    docs: DataFrame,
    window: int = 2,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """-> (w_center, w_context, cnt): word2vec-style skip-gram pair counts
    — for every word position, each word within ``window`` positions on
    either side contributes one (center, context) observation (Mikolov et
    al. 2013's training-pair extraction, minus their distance subsampling,
    which is a train-time choice not a counting one). Counts are symmetric
    by construction: cnt(a, b) == cnt(b, a).

    The co-occurrence frame embedding trainers (word2vec SGNS, GloVe's
    X_ij matrix, PPMI-SVD) consume; ``cooccurrence_lift`` is the entity-
    granularity sibling, this is the token-granularity one.

    Plan: context words come from ``lead()`` frames over ONE per-document
    window partitioning (no positions self-join — a self-join on
    |pos diff| <= w is a range join Spark would planless-nested-loop),
    then one hash-agg on the pair. Two exchanges total; the 2*window
    struct array explodes map-side between them. ``min_count`` prunes the
    long tail (hapax pairs dominate raw skip-gram counts) AFTER the agg,
    map-side-free.
    """
    from pyspark.sql import Window

    ws = words(F.col(text_col))
    pw = docs.select("doc_id", F.posexplode(ws).alias("pos", "w"))
    wspec = Window.partitionBy("doc_id").orderBy("pos")
    # window expressions must be top-level select items — materialize the
    # lead columns first, assemble the struct array in a second projection
    # (both run inside the same window stage; no extra exchange)
    led = pw.select(
        "w", *[F.lead("w", o).over(wspec).alias(f"n{o}") for o in range(1, window + 1)]
    )
    pairs = []
    for o in range(1, window + 1):
        nxt = F.col(f"n{o}")
        pairs += [
            F.struct(F.col("w").alias("c"), nxt.alias("x")),
            F.struct(nxt.alias("c"), F.col("w").alias("x")),
        ]
    return (
        led.select(F.explode(F.array(*pairs)).alias("p"))
        .where(F.col("p.c").isNotNull() & F.col("p.x").isNotNull())
        .groupBy(
            F.col("p.c").alias("w_center"), F.col("p.x").alias("w_context")
        )
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def ppmi_weights(skipgrams: DataFrame) -> DataFrame:
    """-> (w_center, w_context, cnt, ppmi): positive pointwise mutual
    information over skip-gram pair counts — the count-based embedding
    weighting (Levy & Goldberg 2014 showed word2vec SGNS implicitly
    factorizes this matrix; LSA-family pipelines consume it directly).

    ppmi = max(0, ln(cnt * total / (cnt_center * cnt_context))), with the
    marginals and the grand total computed from the pair table itself
    (symmetric input -> symmetric marginals). Two tiny vocabulary-keyed
    hash-aggs + one broadcastable 1-row total; the only pair-scale
    operations are the two marginal joins, keyed on each word. Doubles
    pinned to 6 dp per the repo convention; all inputs to ln are exact
    integers, so both engines see identical operands.
    """
    pairs = skipgrams.select("w_center", "w_context", "cnt")
    center = pairs.groupBy("w_center").agg(F.sum("cnt").alias("cnt_center"))
    context = pairs.groupBy("w_context").agg(F.sum("cnt").alias("cnt_context"))
    total = pairs.agg(F.sum("cnt").alias("total"))
    pmi = F.log(
        F.col("cnt").cast("double") * F.col("total")
        / (F.col("cnt_center") * F.col("cnt_context"))
    )
    return (
        pairs.join(center, "w_center")
        .join(context, "w_context")
        .crossJoin(F.broadcast(total))
        .select(
            "w_center",
            "w_context",
            "cnt",
            F.round(F.greatest(F.lit(0.0), pmi), 6).alias("ppmi"),
        )
    )


def sequence_transitions(
    transcripts: DataFrame, category: Column | str = "role"
) -> DataFrame:
    """First-order behavioral transition model over conversations:
    P(next category | category) from adjacent-turn pairs, where
    ``category`` is any per-turn column or expression (role, event type,
    tool). The behavioral analog of the text bigram LM — the model
    behind bot/anomaly detection over agent logs ("this session's
    action sequence is nothing like the corpus").

    One conv-partitioned window pass emits the pairs; the model is a
    category-vocabulary-sized rollup (two hash-aggs + a join on the
    current-category key). Probabilities are one IEEE division of exact
    integers, rounded 6 dp per the repo convention.
    """
    from jcpg_spark.operators.flow import w_conv

    cat = F.col(category) if isinstance(category, str) else category
    pairs = (
        transcripts.select(
            "conv_id", "turn_idx", cat.alias("cat")
        )
        .withColumn("nxt", F.lead("cat").over(w_conv()))
        .filter(F.col("nxt").isNotNull())
    )
    c = pairs.groupBy("cat", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("cat").agg(F.sum("n").alias("n_cat"))
    return c.join(tot, "cat").select(
        "cat", "nxt", "n", "n_cat",
        F.round(F.col("n") / F.col("n_cat"), 6).alias("p"),
    )


def sequence_typicality(
    transcripts: DataFrame, category: Column | str = "role"
) -> DataFrame:
    """Per-conversation typicality under the corpus's own transition
    model: mean ln P(next | cur) over the conversation's observed
    transitions — low scores flag replayed/botted/broken sessions whose
    ACTION sequence is atypical even when every text looks fine.
    Single-transition conversations score over 1 pair; zero-transition
    conversations are absent (no evidence either way).

    The pair frame is computed once per call and feeds both the model
    rollup and the scoring join (same persisted-frame pattern as
    ``bigram_lm_scores``); scoring joins on the (cat, nxt) key — every
    observed transition has P > 0 by construction.
    """
    from jcpg_spark.caching import swap_persist
    from jcpg_spark.operators.flow import w_conv

    cat = F.col(category) if isinstance(category, str) else category
    pairs = swap_persist(
        "seq_typ.pairs",
        transcripts.select("conv_id", "turn_idx", cat.alias("cat"))
        .withColumn("nxt", F.lead("cat").over(w_conv()))
        .filter(F.col("nxt").isNotNull()),
    )
    c = pairs.groupBy("cat", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("cat").agg(F.sum("n").alias("n_cat"))
    model = c.join(tot, "cat").select(
        "cat", "nxt", F.log(F.col("n") / F.col("n_cat")).alias("logp")
    )
    return (
        pairs.join(model, ["cat", "nxt"])
        .groupBy("conv_id")
        .agg(F.avg("logp").alias("typicality"))
    )


def burrows_delta(
    docs: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Burrows' Delta stylometry: each document's mean absolute z-score
    of its relative frequencies over the corpus's top-``k`` words — the
    classic authorship/style distance, here against the corpus norm, so
    high delta = stylistic outlier (different author, different
    generator, bot register) even when every quality filter passes.

    Pipeline: one explode pass -> per-doc word counts; the top-k word
    list is a k-row TakeOrdered broadcast; the dense doc x top-word
    frequency grid comes from a broadcast crossJoin + left join (zeros
    where a doc lacks the word — REQUIRED: missing-as-zero is what makes
    the mean/std well-defined); per-word mu/sigma from power sums over
    the grid; delta is one more doc-keyed rollup. Everything data-scale
    is keyed by doc; the word dimension is k. sigma==0 words (constant
    across the corpus) are excluded from the mean.
    """
    from jcpg_spark.caching import swap_persist

    w = docs.select("doc_id", F.explode(words(F.col(text_col))).alias("word"))
    dw = swap_persist(
        "burrows.dw", w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("n"))
    )
    dlen = dw.groupBy("doc_id").agg(F.sum("n").alias("len"))
    topk = (
        dw.groupBy("word").agg(F.sum("n").alias("cn"))
        .orderBy(F.desc("cn"), F.asc("word"))
        .limit(k)
        .select("word")
    )
    grid = (
        dlen.crossJoin(F.broadcast(topk))
        .join(dw, ["doc_id", "word"], "left")
        .select(
            "doc_id", "word",
            (F.coalesce(F.col("n"), F.lit(0)) / F.col("len")).alias("f"),
        )
    )
    stats = grid.groupBy("word").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("f").alias("s1"),
        F.sum(F.col("f") * F.col("f")).alias("s2"),
    )
    mu = F.col("s1") / F.col("nd")
    var = (F.col("nd") * F.col("s2") - F.col("s1") * F.col("s1")) / (
        F.col("nd") * (F.col("nd") - 1)
    )
    wstats = stats.select(
        "word", mu.alias("mu"), F.sqrt(var).alias("sd")
    ).filter(F.col("sd") > 0)
    return (
        grid.join(F.broadcast(wstats), "word")
        .groupBy("doc_id")
        .agg(F.avg(F.abs((F.col("f") - F.col("mu")) / F.col("sd"))).alias("delta"))
    )


def absorbing_expected_steps(
    transitions: DataFrame, absorbing: str
) -> DataFrame:
    """Expected number of steps to reach the ``absorbing`` category from
    each transient category under the first-order model — the classic
    absorbing-Markov-chain fundamental-matrix solve, turning
    ``sequence_transitions`` into a forward-looking risk number
    ("expected turns until first error from a purchase state").

    The transition matrix is category-vocabulary-sized by construction
    (K x K for K event types/roles), so collecting it to the driver and
    solving (I - Q) t = 1 with numpy is the bounded-collect pattern the
    k-means/dictionary operators use — nothing data-scale leaves the
    cluster. A state gets t = null (infinite expectation) unless its
    absorption probability is 1: both states that cannot reach the
    absorbing state at all AND states that can reach it but can also
    wander into a non-reaching class (positive probability of never
    absorbing makes the expectation infinite — restricting the (I-Q)
    solve to reaching states alone would silently condition on
    absorption and report a finite number).
    """
    import numpy as np

    rows = transitions.select("cat", "nxt", "p").collect()
    cats = sorted({r["cat"] for r in rows} | {r["nxt"] for r in rows})
    if absorbing not in cats:
        raise ValueError(f"absorbing state {absorbing!r} not in the model")
    trans = [c for c in cats if c != absorbing]
    idx = {c: i for i, c in enumerate(trans)}
    p = {(r["cat"], r["nxt"]): r["p"] for r in rows}
    # reachability of the absorbing state through the transition graph
    reach, frontier = {absorbing}, {absorbing}
    while frontier:
        frontier = {
            a for (a, b) in p if b in reach and a not in reach
        }
        reach |= frontier
    # doomed closure: a state whose transition graph can reach any
    # NON-reaching state has absorption probability < 1, so its true
    # expectation is infinite even though it also reaches the absorbing
    # state (A->X 0.5 / A->B 0.5 / B->B 1.0: A must be null, not 1.0).
    # Non-reaching states never re-enter the reaching set (else they
    # would reach), so the doomed set is the backward closure of the
    # non-reaching states.
    doomed = {c for c in cats if c != absorbing and c not in reach}
    frontier = set(doomed)
    while frontier:
        frontier = {
            a for (a, b) in p
            if b in frontier and a not in doomed and a != absorbing
        }
        doomed |= frontier
    q = np.zeros((len(trans), len(trans)))
    for (a, b), v in p.items():
        if a != absorbing and b != absorbing:
            q[idx[a], idx[b]] = v
    t = np.full(len(trans), np.nan)
    solvable = [i for c, i in idx.items() if c in reach and c not in doomed]
    if solvable:
        sub = np.ix_(solvable, solvable)
        t_sub = np.linalg.solve(np.eye(len(solvable)) - q[sub], np.ones(len(solvable)))
        for j, i in enumerate(solvable):
            t[i] = t_sub[j]
    spark = transitions.sparkSession
    out = [
        (c, None if np.isnan(t[idx[c]]) else round(float(t[idx[c]]), 6))
        for c in trans
    ]
    return spark.createDataFrame(out, "cat string, expected_steps double")
