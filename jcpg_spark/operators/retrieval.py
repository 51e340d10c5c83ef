"""Ranked retrieval over the document corpus (BM25 inverted-index style).

The training-data pipeline's lookup primitive: given a small query set,
score documents with Okapi BM25 (the Lucene/Elasticsearch default) and
return the top-k per query. The reference has no retrieval surface; this
is part of the LLM-data-pipeline operator family (like dedup/ANN), where
the corpus is web-scale and the query side is tiny.

Scale posture (100 TB corpus, O(10^2..10^4) queries):
- the query-term vocabulary BROADCASTS and semi-joins the token stream
  before any aggregation, so the per-(doc, term) counts — the only
  corpus-scale shuffle — carry query-relevant terms only (a few rows per
  document, not the whole posting list);
- document length and the global avgdl are one hash-agg + a 1-row
  broadcast (no second pass over text);
- per-term document frequencies aggregate over the ALREADY query-filtered
  tf table (vocabulary-sized output, broadcast back);
- the final top-k is a per-query window over candidate docs — partitioned
  by query_id, never a global sort.

Scores are pinned to 6 decimal places BEFORE ranking with a doc_id
tie-break (the repo's doubles convention: the rank must be a pure
function of cross-engine-equal values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RX = "[a-z]+"


def tokens(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """-> (id_col, term): the lowercase word stream, one row per
    occurrence. Map-side only (regexp_extract_all + explode)."""
    words = F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RX}', 0)")
    return docs.select(id_col, F.explode(words).alias("term"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k: ``queries`` is (query_id, term) — exploded,
    lowercase query terms. Returns (query_id, doc_id, score, rank) with
    rank 1..k per query (score desc, doc_id asc on the 6-dp-pinned score).

    idf uses the Lucene form ln(1 + (N - df + 0.5)/(df + 0.5)), which is
    positive for every df — a query term in every document still
    contributes, it just contributes little. A query term absent from the
    corpus has no tf rows and drops out of the sum on both engines.
    """
    toks = tokens(docs, text_col, id_col)
    # document length = token count, computable MAP-SIDE as the size of the
    # regex match array — no explode and no corpus-wide hash-agg shuffle for
    # the dl table (previously the full token stream was exploded twice:
    # once for dl, once for tf). Zero-token docs are excluded to match the
    # exploded form exactly (they contribute no token rows, so the groupBy
    # never saw them in n_docs/avgdl).
    dl = docs.select(
        F.col(id_col),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RX}', 0)")).alias("dl"),
    ).where(F.col("dl") > 0)
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qterms = queries.select("query_id", F.col("term")).distinct()
    vocab = qterms.select("term").distinct()
    tf = (
        toks.join(F.broadcast(vocab), "term")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count_distinct(id_col).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "term")
        .withColumn("w", idf * F.col("tf") * F.lit(k1 + 1.0) / norm)
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction: the ``k`` highest tf-idf terms,
    tfidf = n_dw * ln((N + 1) / (df_w + 1)) (the smoothed idf, so a
    corpus-universal word scores ~0 instead of -inf) — the doc-level
    twin of ``entity_salience``'s entity weighting, and the cheapest
    honest auto-tagger for corpus cards and retrieval facets.

    One explode + (doc, word) rollup at data scale; df and N are
    word-vocabulary- and scalar-sized rollups of it; top-k is a window
    on the doc key with the (score desc, word asc) deterministic
    tie-break on the 6-dp-pinned score (the bm25 convention).
    """
    from jcpg_spark.functions.text import words as _words

    w = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_words(F.col(text_col))).alias("word")
    )
    dw = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("n"))
    # df as a window count on dw (r6): dw's rows are distinct (doc, word)
    # pairs, so count-per-word over dw == document frequency — and the
    # former dfw agg + join-back computed the whole explode+agg subtree
    # TWICE (once per branch) plus two more word-keyed exchanges.
    dw = dw.withColumn("df", F.count("*").over(Window.partitionBy("word")))
    n_docs = docs.select(F.col(id_col)).distinct().count()
    scored = dw.select(
        "doc_id", "word",
        F.round(
            F.col("n") * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)), 6
        ).alias("tfidf"),
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("doc_id", "word", "tfidf", "rank")
    )
