"""Scalar text functions (SURVEY §2.7 F1-F9 analogs) + training-data text
analysis (language-ID heuristic, quality scoring, token counting,
fingerprinting).

Everything here is a pure Column expression (JVM-side, whole-stage codegen) —
no Python in the hot path. The reference's equivalents are tiny Java string
helpers (utils/StringUtils.java:12-88, literal classification
JavacpgDDGBuilder.java:1329-1341).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F2/F3 analog: escape + removeConsecutiveSpaces (StringUtils.java:12-39)
def normalize_text(col: Column) -> Column:
    """lowercase, trim, collapse runs of whitespace to single spaces."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def words(col: Column) -> Column:
    """Array of alphabetic word tokens from lowercased text."""
    return F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+"), 0)


# F5 analog: literal classification -> $INT/$DBL/$STR sentinels
def classify_literal(col: Column) -> Column:
    return (
        F.when(col.rlike(r"^-?\d+$"), "$INT")
        .when(col.rlike(r"^-?\d*\.\d+$"), "$DBL")
        .when(F.lower(col).isin("true", "false"), "$BOL")
        .when(F.lower(col) == "null", "$NUL")
        .otherwise("$STR")
    )


# --- training-data text analysis -------------------------------------------

STOPWORDS_EN = ("the", "a", "of", "and", "is", "to", "in")

# function-word lexicons for the language-ID heuristic (argmax overlap)
LANG_LEXICONS = {
    "en": ("the", "and", "of", "is", "to", "in", "that"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "es"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "les", "et", "est", "une", "dans", "pour"),
}


def stopword_count(col: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Count of stopword tokens — the core of the n-gram/lexicon language-ID
    heuristic (vocabulary overlap with an English function-word list)."""
    pat = r"\b(?:" + "|".join(stopwords) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def predict_language(col: Column, min_hits: int = 2) -> Column:
    """Lexicon-overlap language ID: argmax of per-language function-word
    hit counts (ties broken by lexicon order en>es>de>fr); 'und'
    (undetermined) when the best score is below ``min_hits``. Pure column
    algebra — JVM-side, vectorizable, no UDF."""
    scores = [(lang, stopword_count(col, words)) for lang, words in LANG_LEXICONS.items()]
    best_lang, best_score = scores[0]
    best_lang = F.lit(best_lang)
    for lang, score in scores[1:]:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return F.when(best_score >= min_hits, best_lang).otherwise(F.lit("und"))


def whitespace_token_count(col: Column) -> Column:
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish segmentation count: alpha runs, digit runs, single punctuation."""
    return F.regexp_count(F.lower(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"))


def word_ngrams(col: Column, n: int = 2) -> Column:
    """Array of space-joined word n-grams (empty array when the document
    has fewer than n words). transform+slice stays JVM-side — the same
    no-UDF shape as the doc_chunks windower."""
    ws = words(col)
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_ngram_fraction(col: Column, n: int = 2) -> Column:
    """Within-document repetition score: fraction of word n-gram OCCURRENCES
    whose n-gram also occurs elsewhere in the same document — the
    Gopher/RefinedWeb "duplicate n-gram fraction" quality filter (a doc
    that loops the same phrases scores high and is dropped before
    training). 1 - distinct/total over the n-gram array; 0.0 for docs
    shorter than n words. Pure per-row column algebra: embarrassingly
    parallel, no shuffle, no UDF."""
    grams = word_ngrams(col, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double")
    )


def fingerprint_md5(col: Column) -> Column:
    """Normalized-content fingerprint (cross-engine checkable)."""
    return F.md5(normalize_text(col))


def rolling_fingerprint(col: Column, base: int = 257, mod: int = (1 << 61) - 1) -> Column:
    """Polynomial rolling hash over the word sequence (document fingerprint).

    fp = sum(hash(word_i) * base^(n-1-i)) mod p, computed with F.aggregate —
    stays JVM-side; deterministic; order-sensitive (unlike a bag-of-words
    md5), so reorderings produce different fingerprints.
    """
    ws = words(col)
    return F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * base + F.abs(F.xxhash64(w)) % mod) % mod,
    )


def compression_ratio_udf():
    """zlib compression ratio of the UTF-8 text — the Gopher-family
    repetition/boilerplate signal that n-gram fractions miss (long-range
    and approximate repeats compress away; high-entropy prose doesn't).
    ratio = compressed_len / raw_len in (0, ~1.1]; low = repetitive.

    This is the documented pandas-UDF slow path, used because zlib is
    not expressible in JVM column algebra: Arrow-batched (one python
    call per batch, zlib in C per row), deterministic (zlib level 6 is
    bit-stable for a given input on every platform), and pinned against
    a pure-python twin in pytest. Empty/whitespace text -> null.
    """
    import zlib

    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def _ratio(texts):
        # no type annotations: pandas is imported locally (this module is
        # otherwise pandas-free), so hint resolution would fail; the
        # explicit returnType + Series-in/Series-out body is sufficient
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw.strip():
                return None
            return len(zlib.compress(raw, 6)) / len(raw)

        return pd.Series([one(t) for t in texts])

    return _ratio
