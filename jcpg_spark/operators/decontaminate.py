"""Benchmark decontamination for training-data pipelines.

A training corpus must not contain the evaluation benchmarks it will be
scored against; the standard check is word n-gram containment (a training
document is contaminated if it shares at least one n-gram with any eval
document — the GPT-3/PaLM-style 8-to-13-gram overlap rule, here with a
configurable n).

Scale shape: the benchmark side is tiny by nature (benchmarks are MBs even
when the corpus is 100 TB), so the containment join is a BROADCAST hash
join on the n-gram — the 100-TB corpus side never shuffles; the only
exchange is the final per-doc aggregation, whose input is already reduced
to (doc_id, matched shingle) hits. Shingling reuses ``dedup.word_shingles``
(same tokenizer as the Jaccard dedup path, `functions/text.py:words`).

The reference has no analog (it is a code-graph generator); this operator
belongs to the LLM-pipeline family the rebuild adds on top (exact dedup,
MinHash, SimHash, embedding near-dup — see ``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jcpg_spark.operators.dedup import word_shingles


def contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_overlap, first_eval_match) for every training doc
    sharing >= 1 word n-gram with any eval doc.

    n_overlap counts DISTINCT overlapping n-grams (a train shingle hit by
    several eval docs counts once); first_eval_match = min eval doc_id,
    a deterministic exemplar for triage.
    """
    t = word_shingles(train, n=n, text_col=text_col)
    e = word_shingles(eval_docs, n=n, text_col=text_col).select(
        "shingle", F.col("doc_id").alias("eval_doc_id")
    )
    hits = t.join(F.broadcast(e), "shingle")
    return hits.groupBy("doc_id").agg(
        F.count_distinct("shingle").alias("n_overlap"),
        F.min("eval_doc_id").alias("first_eval_match"),
    )


def corpus_overlap(
    left: DataFrame,
    right: DataFrame,
    key: str = "text",
    lgk: int = 14,
) -> DataFrame:
    """-> ONE row (n_left, n_right, n_inter, n_union, jaccard,
    containment_left): theta-sketch estimates of the overlap between two
    corpora's key sets — the scalable screening pass in front of the
    exact ``contamination`` join (run this first over 100 TB to decide
    whether the n-gram containment sweep is even needed, and to size it).

    ``key`` is any SQL expression producing the comparable unit per row
    (normalized text, a shingle hash, a URL). Each side reduces to ONE
    mergeable theta sketch via ``theta_sketch_agg`` (a map-side-combined
    aggregation — the corpus never shuffles, only sketches move);
    intersection/difference are then sketch-algebra column expressions
    (``theta_intersection``/``theta_union``), which is the operation HLL
    cannot do (HLL unions only; theta's sampling retains the set algebra
    — the reason this is the right sketch here). Estimates are EXACT
    below the 2^lgk retention threshold (the pytest gate) and carry the
    published ~1/sqrt(2^lgk) relative error above it; ``containment_left``
    = |L∩R| / |L|, the contamination-rate reading."""
    ls = left.select(F.expr(key).alias("k")).agg(
        F.theta_sketch_agg("k", F.lit(lgk)).alias("ls")
    )
    rs = right.select(F.expr(key).alias("k")).agg(
        F.theta_sketch_agg("k", F.lit(lgk)).alias("rs")
    )
    row = ls.crossJoin(rs)
    n_l = F.theta_sketch_estimate(F.col("ls"))
    n_r = F.theta_sketch_estimate(F.col("rs"))
    n_i = F.theta_sketch_estimate(F.theta_intersection("ls", "rs"))
    n_u = F.theta_sketch_estimate(F.theta_union("ls", "rs"))
    return row.select(
        n_l.alias("n_left"),
        n_r.alias("n_right"),
        n_i.alias("n_inter"),
        n_u.alias("n_union"),
        F.when(n_u > 0, n_i.cast("double") / n_u.cast("double")).alias(
            "jaccard"
        ),
        F.when(n_l > 0, n_i.cast("double") / n_l.cast("double")).alias(
            "containment_left"
        ),
    )


def semantic_decontaminate(
    embeddings: DataFrame,
    eval_embeddings: DataFrame,
    threshold: float = 0.5,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed0: int = 7042,
) -> DataFrame:
    """Embedding-space decontamination: -> (vec_id, eval_id, cos) — every
    corpus vector whose cosine to SOME eval vector reaches ``threshold``,
    with its best match (max cosine; ties to the smallest eval id) as the
    triage exemplar.

    The semantic complement of ``contamination``'s n-gram containment:
    paraphrased or translated benchmark leakage shares no 13-gram but
    sits next to the eval set in embedding space (the LLM-decontamination
    setting of Yang et al. 2023, "Rethinking Benchmark and Contamination
    ... n-gram overlap is not enough"). Same scale shape too — the eval
    side is tiny by nature, the corpus side is the 100 TB one:

    - candidates come from multi-table random-hyperplane buckets
      (``similarity._rhp_buckets`` — the sha256-literal plane family, so
      the FULL candidate generation has an exact DuckDB twin, r5 seam);
      the eval cells BROADCAST, the corpus side never shuffles its
      vectors into candidate generation (ids only);
    - every emitted pair is verified by exact cosine, so LSH costs
      recall only, never precision (recall for a pair at cosine s:
      1-(1-p^n_planes)^n_tables, p = 1 - arccos(s)/pi);
    - the rank-1 pick shares the candidate join's partitioning (window
      over vec_id), so the whole operator is ONE corpus-side exchange.
    """
    from pyspark.sql import Window

    from jcpg_spark.operators.similarity import _dot, _rhp_buckets, _unit

    def cells(df: DataFrame, ident: str) -> DataFrame:
        b = _rhp_buckets(vec_col, dim, n_planes, n_tables, seed0=seed0)
        return df.select(F.col(id_col).alias(ident), F.explode(b).alias("tb")).select(
            ident, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
        )

    cand = (
        cells(embeddings, "vec_id")
        .join(F.broadcast(cells(eval_embeddings, "eval_id")), ["table", "bucket"])
        .select("vec_id", "eval_id")
        .distinct()
    )
    corp = _unit(embeddings, id_col, vec_col, "vec_id", "cv")
    ev = _unit(eval_embeddings, id_col, vec_col, "eval_id", "ev")
    scored = (
        cand.join(corp, "vec_id")
        .join(F.broadcast(ev), "eval_id")
        .withColumn("cos", _dot(F.col("cv"), F.col("ev")))
        .filter(F.col("cos") >= threshold)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("eval_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "eval_id", F.round("cos", 6).alias("cos"))
    )
