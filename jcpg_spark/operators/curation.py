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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jcpg_spark.functions.text import dup_ngram_fraction, predict_language, words


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
    ws = words(F.col(text_col))
    n_words = F.size(ws)
    mwl = F.array_max(F.transform(ws, lambda w: F.length(w)))
    reason = (
        F.when(n_words < min_words, "too_short")
        .when(mwl > max_word_len, "word_too_long")
        .when(dup_ngram_fraction(F.col(text_col)) > max_dup_fraction, "repetitive")
        .when(predict_language(F.col(text_col)) == "und", "lang_unknown")
        .otherwise("ok")
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
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
    rates = weighted.crossJoin(F.broadcast(totals)).select(
        "grp",
        F.least(
            F.lit(1.0),
            (F.col("w") * t_docs).cast("double")
            / (F.col("sum_w") * F.col("n_g")).cast("double"),
        ).alias("rate"),
    )
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(float(16**13))
    return (
        docs.select("doc_id", grp, u.alias("u"))
        .join(F.broadcast(rates), "grp")
        .where(F.col("u") < F.col("rate"))
        .select("doc_id", "grp", F.round("rate", 6).alias("rate"), F.round("u", 6).alias("u"))
    )
