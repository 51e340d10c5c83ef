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
