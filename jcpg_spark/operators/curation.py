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
