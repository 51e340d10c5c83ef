"""Composite corpus-curation decisions (C4/Gopher-style filter chains).

The individual quality signals live in ``functions/text.py`` (language ID,
duplicate-n-gram fraction, token counts) — this module composes them into
the per-document KEEP/DROP decision a training-data pipeline actually
ships, with the reason recorded so every drop is auditable (the standard
"filter report" a corpus card needs). First-failing-rule semantics keep
the reason deterministic and make rule precedence explicit.

Everything here is per-row column algebra: no shuffle, no UDF, no model
file — embarrassingly parallel at any scale, and the decision column can
ride along any existing scan without changing the plan's exchange count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jcpg_spark.functions.text import (
    dup_ngram_fraction,
    normalize_text,
    predict_language,
    words,
)


def curation_reason(
    text: Column,
    min_words: int = 10,
    max_word_len: int = 30,
    max_dup_fraction: float = 0.2,
) -> Column:
    """First-failing-rule verdict as a pure Column expression, so composed
    pipelines (``corpus_build``) can evaluate it map-side in the same scan
    as their other per-row columns — no decision join, no extra exchange."""
    ws = words(text)
    n_words = F.size(ws)
    mwl = F.array_max(F.transform(ws, lambda w: F.length(w)))
    return (
        F.when(n_words < min_words, "too_short")
        .when(mwl > max_word_len, "word_too_long")
        .when(dup_ngram_fraction(text) > max_dup_fraction, "repetitive")
        .when(predict_language(text) == "und", "lang_unknown")
        .otherwise("ok")
    )


def curation_decision(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_word_len: int = 30,
    max_dup_fraction: float = 0.2,
) -> DataFrame:
    """-> (doc_id, n_words, reason, keep): first-failing-rule curation
    verdict per document.

    Rules, in precedence order (the classic C4/Gopher chain):
      1. ``too_short``     — fewer than ``min_words`` word tokens
      2. ``word_too_long`` — any word longer than ``max_word_len``
                              (markup/base64 junk detector)
      3. ``repetitive``    — duplicate-bigram fraction above
                              ``max_dup_fraction`` (loop/boilerplate text)
      4. ``lang_unknown``  — the lexicon language ID cannot place it
      5. ``ok``            — keep.

    The repetition comparison uses the UNROUNDED fraction: it divides two
    exact integers, so the IEEE result — and therefore the threshold
    verdict — is identical on any engine, with no rounding-boundary
    ambiguity.
    """
    reason = curation_reason(
        F.col(text_col),
        min_words=min_words,
        max_word_len=max_word_len,
        max_dup_fraction=max_dup_fraction,
    )
    return docs.select(
        "doc_id",
        F.size(words(F.col(text_col))).alias("n_words"),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


def temperature_mix(
    docs: DataFrame,
    target_frac_ppm: int = 250_000,
    group_col: str = "lang",
) -> DataFrame:
    """-> (doc_id, grp, rate, u): deterministic temperature-flattened
    corpus mix at alpha = 1/2 — the T5/mT5/PaLM "temperature sampling"
    step that keeps low-resource groups from drowning under the head
    group. Where ``dsir_weights`` re-weights toward a TARGET register,
    this rebalances the group marginal itself: group g with n_g docs gets
    expected sample share proportional to sqrt(n_g), i.e. acceptance rate
    r_g = min(1, T * w_g / (sum_w * n_g)) with w_g = floor(sqrt(n_g)*1e6)
    and T = floor(N * target_frac_ppm / 1e6) total sampled docs.

    Every quantity the inclusion test touches is either an exact integer
    (w_g, sum_w, T, n_g — the float-sum ordering problem is designed out
    by scaling sqrt to an integer weight BEFORE summing) or a single
    correctly-rounded IEEE op on exact integers (the rate division; the
    md5-derived uniform is a 13-hex-digit / 2^52 power-of-two division,
    the ``doc_weighted_sample`` idiom) — so any engine selects the
    IDENTICAL sample, reproducible across reruns and partitionings.

    Scale posture: the group table is dimension-sized (one row per
    language/source), its totals ride a broadcast crossJoin, and the
    per-doc decision is a broadcast join + map-side filter — one scan of
    the corpus, no data-sized shuffle anywhere.
    """
    rates = temperature_rates(docs, target_frac_ppm=target_frac_ppm, group_col=group_col)
    u = doc_uniform()
    return (
        docs.select("doc_id", F.col(group_col).alias("grp"), u.alias("u"))
        .join(F.broadcast(rates), "grp")
        .where(F.col("u") < F.col("rate"))
        .select("doc_id", "grp", F.round("rate", 6).alias("rate"), F.round("u", 6).alias("u"))
    )


def doc_uniform(id_col: str = "doc_id") -> Column:
    """Deterministic uniform in [0, 1): 13 md5 hex digits / 2^52 — an exact
    power-of-two division of an exact integer, so the value (and any
    threshold comparison on it) is identical on every engine, rerun, and
    partitioning (the ``doc_weighted_sample`` idiom)."""
    return F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(float(16**13))


def temperature_rates(
    docs: DataFrame,
    target_frac_ppm: int = 250_000,
    group_col: str = "lang",
) -> DataFrame:
    """-> (grp, rate): the alpha=1/2 acceptance-rate table over ``docs``'s
    group marginal — min(1, T*w_g/(sum_w*n_g)), w_g = floor(sqrt(n_g)*1e6),
    T = floor(N*target_frac_ppm/1e6). Dimension-sized; every inclusion-
    relevant quantity is an exact integer or one correctly-rounded IEEE op
    on exact integers (see ``temperature_mix``)."""
    grp = F.col(group_col).alias("grp")
    counts = docs.groupBy(grp).agg(F.count("*").alias("n_g"))
    weighted = counts.select(
        "grp",
        "n_g",
        F.floor(F.sqrt(F.col("n_g").cast("double")) * F.lit(1e6)).cast("long").alias("w"),
    )
    totals = weighted.agg(
        F.sum("n_g").alias("n_total"), F.sum("w").alias("sum_w")
    )
    t_docs = F.floor(
        (F.col("n_total") * F.lit(target_frac_ppm)).cast("double") / F.lit(1e6)
    ).cast("long")
    return weighted.crossJoin(F.broadcast(totals)).select(
        "grp",
        F.least(
            F.lit(1.0),
            (F.col("w") * t_docs).cast("double")
            / (F.col("sum_w") * F.col("n_g")).cast("double"),
        ).alias("rate"),
    )


def corpus_build(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    target_frac_ppm: int = 250_000,
    decontam_n: int = 4,
) -> DataFrame:
    """-> (doc_id, grp, stage): the full training-corpus curation funnel as
    ONE composition — every input doc gets its exact disposition, in rule
    order:

      ``filtered:<reason>`` — failed the C4/Gopher chain (first failing
                              rule recorded: too_short / word_too_long /
                              repetitive / lang_unknown)
      ``duplicate``         — curated, but not the canonical (min doc_id)
                              of its normalized-text duplicate group
      ``contaminated``      — canonical, but shares >= 1 word
                              ``decontam_n``-gram with ``eval_docs``
                              (benchmark leakage)
      ``not_sampled``       — survived everything, lost the alpha=1/2
                              temperature-mix draw
      ``kept``              — in the final training corpus.

    This is the ledger a corpus card / data audit actually needs: the
    funnel is ``groupBy(stage).count()`` and the shipped corpus is
    ``where(stage = 'kept')`` — one operator call instead of five hand-
    wired stages with ad-hoc joins, with every per-stage semantics
    identical to the standalone operators (``curation_decision``,
    ``exact_duplicates``, ``decontaminate.contamination``,
    ``temperature_mix``).

    Scale posture — the document TEXT never crosses an exchange: one scan
    computes reason, the 16-byte normalized-text hash, and the md5 uniform
    map-side; dedup is a groupBy + join on that hash (24-byte rows);
    decontamination re-derives shingles map-side and broadcasts the
    (benchmark-sized) eval shingle set, so only (hash, id) pairs shuffle;
    contamination verdicts and the dimension-sized rate table join back by
    id. Mix rates are computed over the POST-filter survivor marginal (the
    distribution the sampler actually draws from), matching how a real
    pipeline rebalances after cleaning.
    """
    from jcpg_spark.caching import swap_persist
    from jcpg_spark.operators.decontaminate import contamination

    base = docs.select(
        "doc_id",
        F.col(group_col).alias("grp"),
        F.col(text_col).alias("text"),
        curation_reason(F.col(text_col)).alias("reason"),
        F.md5(normalize_text(F.col(text_col))).alias("norm_h"),
        doc_uniform().alias("u"),
    )
    # base feeds FOUR branches (canon agg, dedup join, contamination's
    # shingle derivation, the filtered union arm) and each branch would
    # otherwise re-scan the corpus and re-run the whole regex chain
    # (reason + normalize + md5) — the plan showed 26 duplicated parquet
    # scans before this persist. One scan, one regex pass.
    base = swap_persist("corpus_build.base", base)
    curated = base.where(F.col("reason") == "ok")
    canon = curated.groupBy("norm_h").agg(F.min("doc_id").alias("canonical_id"))
    dd = curated.select("doc_id", "grp", "norm_h", "u").join(canon, "norm_h")
    contaminated = (
        contamination(curated, eval_docs, n=decontam_n, text_col="text")
        .select("doc_id", F.lit(True).alias("is_contaminated"))
    )
    marked = (
        dd.join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            "grp",
            "u",
            (F.col("doc_id") == F.col("canonical_id")).alias("is_canon"),
            F.coalesce(F.col("is_contaminated"), F.lit(False)).alias("is_cont"),
        )
    )
    # marked feeds the survivor-marginal rate table AND the staged output,
    # and its tree holds the dedup join + contamination semi-join — persist
    # so the funnel upstream runs once, not once per consumer.
    marked = swap_persist("corpus_build.marked", marked)
    survivors = marked.where(F.col("is_canon") & ~F.col("is_cont"))
    rates = temperature_rates(survivors, target_frac_ppm=target_frac_ppm, group_col="grp")
    staged = marked.join(F.broadcast(rates), "grp", "left").select(
        "doc_id",
        "grp",
        F.when(~F.col("is_canon"), "duplicate")
        .when(F.col("is_cont"), "contaminated")
        .when(F.col("u") < F.col("rate"), "kept")
        .otherwise("not_sampled")
        .alias("stage"),
    )
    filtered = base.where(F.col("reason") != "ok").select(
        "doc_id", "grp", F.concat(F.lit("filtered:"), F.col("reason")).alias("stage")
    )
    return staged.unionByName(filtered)


def corpus_profile_approx(
    docs: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    rsd: float = 0.05,
    accuracy: int = 10000,
    text_col: str = "text",
) -> DataFrame:
    """-> per group: (n_docs, n_distinct_approx, total_tokens, tok_p50,
    tok_p90, tok_p99) — the sketch-state twin of ``corpus_card``. The card
    computes EXACT distinct-dup counts and an exact median, which buffers
    each group's values; at 100 TB an audit wants constant per-group
    state: HLL++ (``approx_count_distinct``, relative error ``rsd``) for
    the distinct normalized texts and KLL-style quantile summaries
    (``percentile_approx``, rank error ~1/``accuracy``) for the token
    percentiles. One scan, one partial-aggregating shuffle, sketch-sized
    state per group — no second pass, no join, no value buffering.

    Both sketches are merge-commutative, so results are independent of
    input partitioning; accuracy-vs-exact is pytest-gated rather than
    SQL-oracled (DuckDB's approx sketches are different algorithms, so
    this ships rows-only by design, like the LSH family).
    """
    from jcpg_spark.functions.text import whitespace_token_count

    toks = whitespace_token_count(F.col(text_col))
    return (
        docs.select(
            *group_cols,
            normalize_text(F.col(text_col)).alias("norm"),
            toks.alias("toks"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_docs"),
            F.approx_count_distinct("norm", rsd).alias("n_distinct_approx"),
            F.sum("toks").alias("total_tokens"),
            F.percentile_approx("toks", 0.5, accuracy).alias("tok_p50"),
            F.percentile_approx("toks", 0.9, accuracy).alias("tok_p90"),
            F.percentile_approx("toks", 0.99, accuracy).alias("tok_p99"),
        )
    )


def zipf_fit(
    docs: DataFrame,
    top_n: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """-> one row (n_terms, slope, intercept, r2): OLS fit of
    ln(frequency) on ln(rank) over the corpus's ``top_n`` most frequent
    words — the Zipf power-law diagnostic corpus audits use to spot
    template-dominated or synthetic-text corpora (natural language sits
    near slope -1; boilerplate floods flatten the head, generator loops
    steepen it).

    Rank ties break by word so the fit is deterministic across engines
    and partitionings. Plan: one word-count hash-agg (the corpus-scale
    pass), a single-partition window over the top_n surviving rows
    (vocabulary-head-sized by construction — top_n rows, not the corpus),
    and one closing 1-row aggregate computing the OLS sums; slope/
    intercept/r2 are the textbook closed forms, exactly reproducible in
    SQL (regr_slope & co in the oracle).
    """
    from pyspark.sql import Window

    wc = (
        docs.select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(top_n)
    )
    ranked = wc.select(
        F.log(
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("w"))
            ).cast("double")
        ).alias("lr"),
        F.log(F.col("n").cast("double")).alias("lf"),
    )
    n = F.count("*").cast("double")
    sx, sy = F.sum("lr"), F.sum("lf")
    sxx, sxy, syy = (
        F.sum(F.col("lr") * F.col("lr")),
        F.sum(F.col("lr") * F.col("lf")),
        F.sum(F.col("lf") * F.col("lf")),
    )
    cov = sxy - sx * sy / n
    varx = sxx - sx * sx / n
    vary = syy - sy * sy / n
    return ranked.agg(
        F.count("*").cast("int").alias("n_terms"),
        F.round(cov / varx, 6).alias("slope"),
        F.round((sy - (cov / varx) * sx) / n, 6).alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )


def sft_pairs(transcripts: DataFrame) -> DataFrame:
    """Instruction-tuning pair extraction from agent transcripts: every
    user turn immediately answered by an assistant turn becomes a
    (prompt, response) candidate, labeled with the observed OUTCOME —
    ``ok`` is false when the assistant's action failed (the very next
    turn after the response is a tool turn, which in this engine's
    transcript model carries the failure/result events the THROWS layer
    builds on). When the response is the conversation's LAST turn the
    outcome is unobserved and ``ok`` is null — not true: labeling open
    tails as success would feed optimistically-labeled pairs to SFT,
    and it is exactly the pending set the streaming twin
    (``streaming_sft_pairs``) withholds, so batch ``ok IS NOT NULL``
    equals the streamed output on any prefix. The standard mining step
    for turning 10^12 turns of agent logs into SFT / preference data:
    ok pairs feed SFT, (prompt, ok-response, failed-response)
    groupings feed DPO downstream.

    ONE exchange: a single conv-partitioned window pass computes both
    lead()s; everything else is map-side. Emits ``turn_idx`` of the
    prompt so pairs join back to the KG layers (e.g. per-pair entity
    mentions or CDG context) without re-deriving position.
    """
    from jcpg_spark.operators.flow import w_conv

    w = w_conv()
    d = transcripts.select(
        "conv_id", "turn_idx", "role", "text",
        F.lead("role").over(w).alias("nrole"),
        F.lead("text").over(w).alias("ntext"),
        F.lead("role", 2).over(w).alias("nnrole"),
    )
    return (
        d.filter((F.col("role") == "user") & (F.col("nrole") == "assistant"))
        .select(
            "conv_id",
            "turn_idx",
            F.col("text").alias("prompt"),
            F.col("ntext").alias("response"),
            (F.col("nnrole") != "tool").alias("ok"),  # null nnrole -> null ok
        )
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Release-gate audit: every quasi-identifier combination with its
    member count and an ``at_risk`` flag (count < k). A training-data
    release that carries quasi-identifying metadata columns (language,
    source, region, time bucket) re-identifies members of small groups;
    this is the k-anonymity check run before publishing. ONE hash-agg
    on the quasi key — vocabulary-sized output, safe at any corpus size.
    """
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("at_risk", F.col("n") < k)
    )


def k_anonymize(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Suppression-based k-anonymization: rows whose quasi-identifier
    combination has fewer than ``k`` members get those columns NULLED
    (cell suppression — the baseline mechanism; generalization ladders
    build on the same risky-group join). Non-quasi columns pass through
    untouched, so the output is the releasable table.

    Two exchanges total: the audit's hash-agg plus the group-keyed join
    back (co-partitioned with the agg). The join is on the GROUP key,
    not the row id, so no data-scale side is ever broadcast or
    collected; a null in a quasi column is itself a valid group value
    (null-safe join keys).
    """
    audit = k_anonymity_audit(df, quasi_cols, k)
    # a dedicated flag keeps the match test null-safe (a null quasi value
    # is a legitimate group; the marker column trick would misread it)
    risky = audit.filter(F.col("at_risk")).select(
        *[F.col(c).alias(f"_r_{c}") for c in quasi_cols], F.lit(True).alias("_risky")
    )
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_r_{c}"))
        cond = eq if cond is None else cond & eq
    j = df.join(risky, on=cond, how="left")
    out_cols = []
    for c in df.columns:
        if c in quasi_cols:
            out_cols.append(
                F.when(F.col("_risky"), F.lit(None)).otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return j.select(*out_cols)


def log_odds_drift(
    docs: DataFrame,
    group_a: str,
    group_col: str = "source",
    text_col: str = "text",
    alpha0: float = 100.0,
) -> DataFrame:
    """Corpus-drift / contrast-set mining via log-odds with an informative
    Dirichlet prior (Monroe, Colaresi & Quinn 2008 — the standard
    "what words distinguish corpus A from corpus B" statistic, better
    behaved than raw PMI or chi-square at both frequency extremes).
    Group A is ``group_col == group_a``; B is everything else. Per word:
    counts, the smoothed log-odds delta, and its z-score (delta /
    sqrt(1/(y_a + a_w) + 1/(y_b + a_w))), with the prior a_w allocating
    ``alpha0`` pseudo-counts by the POOLED word distribution. Positive z
    marks A-indicative vocabulary; use it for dataset cards, drift
    monitoring between snapshots, and leakage forensics.

    ONE data-scale shuffle: the exploded (word, is_a) count agg; the
    A/B pivot rides the same hash-agg as conditional sums, totals are a
    1-row broadcast crossJoin. Counts stay exact integers into the final
    double expressions, pinned 6 dp.
    """
    is_a = (F.col(group_col) == F.lit(group_a)).cast("long")
    w = docs.select(
        is_a.alias("ia"), F.explode(words(F.col(text_col))).alias("word")
    )
    c = w.groupBy("word").agg(
        F.sum("ia").alias("y_a"),
        F.sum(F.lit(1) - F.col("ia")).alias("y_b"),
    )
    tot = c.agg(
        F.sum("y_a").alias("n_a"), F.sum("y_b").alias("n_b")
    )
    j = c.crossJoin(F.broadcast(tot))
    a_w = (
        F.lit(alpha0)
        * (F.col("y_a") + F.col("y_b"))
        / (F.col("n_a") + F.col("n_b"))
    )
    la = F.log(
        (F.col("y_a") + a_w)
        / (F.col("n_a") + F.lit(alpha0) - F.col("y_a") - a_w)
    )
    lb = F.log(
        (F.col("y_b") + a_w)
        / (F.col("n_b") + F.lit(alpha0) - F.col("y_b") - a_w)
    )
    delta = la - lb
    z = delta / F.sqrt(1.0 / (F.col("y_a") + a_w) + 1.0 / (F.col("y_b") + a_w))
    return j.select(
        "word", "y_a", "y_b",
        F.round(delta, 6).alias("delta"),
        F.round(z, 6).alias("z"),
    )


def weighted_sample_topk(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    A-ES keys: each row gets key = ln(u) / w (u the deterministic md5
    uniform, w its positive weight) and the k LARGEST keys are the
    sample — distributionally exactly weighted-without-replacement,
    fully deterministic, and resumable (no RNG state), the standard
    distributed formulation. ``temperature_mix``/``doc_sample_hash``
    draw Bernoulli RATES (expected size); this draws an EXACT size k,
    per group when ``group_col`` is set (e.g. exactly k docs per
    language for an eval slice).

    One top-k window per group (TakeOrderedAndProject globally when
    ungrouped); ties are impossible up to md5 collisions because u is
    an injective function of the id's hash. Zero/negative weights are
    excluded (they have no sampling mass).
    """
    u = doc_uniform(id_col)
    w = F.col(weight_col).cast("double")
    key = F.log(F.greatest(u, F.lit(2.0 ** -52))) / w
    d = docs.filter(w > 0).withColumn("_key", key)
    if group_col is None:
        out = d.orderBy(F.desc("_key")).limit(k)
    else:
        win = Window.partitionBy(group_col).orderBy(F.desc("_key"))
        out = d.withColumn("_rk", F.row_number().over(win)).filter(
            F.col("_rk") <= k
        ).drop("_rk")
    return out.select(
        *[c for c in docs.columns], F.round("_key", 6).alias("es_key")
    )


def ks_statistic(
    docs: DataFrame,
    value_col: str,
    group_a: str,
    group_col: str = "source",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between group A
    (``group_col == group_a``) and the rest, over a DISCRETE/binned
    score column: D = max_x |F_A(x) - F_B(x)|, with the argmax value
    (min on ties) — the distribution-level drift test complementing
    ``log_odds_drift``'s per-word contrast (run it on length, LM score
    buckets, quality tiers between snapshots or feeds).

    Scale shape: one (value)-keyed hash-agg with the A/B split as
    conditional sums, then the cumulative window runs over the VALUE
    vocabulary, not the rows — which is why the contract demands a
    discrete/binned column (bin continuous scores first; a raw
    continuous column would make the window data-sized). CDFs are exact
    integer ratios; D and its location are deterministic.
    """
    is_a = (F.col(group_col) == F.lit(group_a)).cast("long")
    c = (
        docs.select(F.col(value_col).alias("x"), is_a.alias("ia"))
        .groupBy("x")
        .agg(
            F.sum("ia").alias("na_x"),
            F.sum(F.lit(1) - F.col("ia")).alias("nb_x"),
        )
    )
    tot = c.agg(F.sum("na_x").alias("n_a"), F.sum("nb_x").alias("n_b"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        c.crossJoin(F.broadcast(tot))
        .withColumn("ca", F.sum("na_x").over(w))
        .withColumn("cb", F.sum("nb_x").over(w))
        .withColumn(
            "gap",
            F.abs(F.col("ca") / F.col("n_a") - F.col("cb") / F.col("n_b")),
        )
    )
    return cum.agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.round(F.max("gap"), 6).alias("ks"),
        F.min_by("x", F.struct((-F.col("gap")).alias("g"), F.col("x"))).alias("at_value"),
    )
