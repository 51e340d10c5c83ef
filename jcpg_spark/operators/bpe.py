"""Corpus-scale BPE tokenizer training: the merge loop as DataFrame jobs.

A training-data engine does not just COUNT tokens (functions/text.py's
``bpe_ish_token_count``); it trains the tokenizer. Classic BPE (Sennrich et
al. 2016) greedily merges the most frequent adjacent symbol pair. The
scale-critical observation the implementation is built around: after ONE
corpus-scale word count, every merge round operates on the WORD VOCABULARY
(``(word, n)`` weighted types), which is orders of magnitude smaller than
the corpus and independent of corpus growth — 100 TB of text funnels
through a single explode+hash-agg shuffle, and the iterative part never
touches it again.

- ``word_counts``: the one corpus pass — explode alphabetic words, one
  hash-agg (map-side partials make this a count-distinct-free shuffle of
  word-cardinality data).
- ``pair_counts``: adjacent symbol pairs weighted by word frequency, a
  pure JVM expression (sequence+transform+explode) over the vocab frame.
- ``train``: the greedy loop. Each round collects exactly ONE row (the
  argmax pair — bounded driver data, same discipline as the kmeans
  centroid collect) and rewrites the symbol arrays with a JVM
  ``aggregate`` fold that merges non-overlapping occurrences
  LEFT-TO-RIGHT (the BPE contract: 'aaaa' + merge (a,a) -> ['aa','aa'],
  'aaa' -> ['aa','a']); ties on count break lexicographically so training
  is deterministic across partitionings and engines. Lineage is cut every
  few rounds with a lazy localCheckpoint, the same bound the pagerank
  loop uses.

Reference anchor: the reference has no tokenizer trainer — this is one of
the beyond-reference LLM-pipeline operators (brief §"training-data
pipeline"), next to dedup/decontamination/packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jcpg_spark.functions.text import words

_CHECKPOINT_EVERY = 4

# adjacent (l, r) symbol pairs from a `syms` array column, one struct per
# boundary; callers explode and weight by the word count
_PAIRS_EXPR = (
    "transform(sequence(1, size(syms) - 1),"
    " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
)

_CHARS_EXPR = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (word, n): the single corpus-scale pass (alphabetic word types)."""
    return (
        docs.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _pair_frame(vocab: DataFrame) -> DataFrame:
    """vocab (syms: array<string>, n) -> (l, r, cnt) weighted pair counts."""
    return (
        vocab.where(F.size("syms") >= 2)
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "n")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("n").alias("cnt"))
    )


def pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (l, r, cnt): round-0 BPE pair statistics (character bigrams over
    word types, weighted by word frequency). Exactly SQL-expressible —
    the driver entry's oracle unrolls the same expression."""
    vocab = word_counts(docs, text_col).select(F.expr(_CHARS_EXPR).alias("syms"), "n")
    return _pair_frame(vocab)


def _merge_expr(l: str, r: str) -> str:
    """One left-to-right non-overlapping merge pass over `syms` as a JVM
    aggregate fold: carry (emitted-prefix, pending-symbol); a pending `l`
    followed by `r` emits the merged token and clears the pending slot so
    the merged token cannot chain into the next occurrence."""
    for s in (l, r):
        if "'" in s or "\\" in s:  # words() yields [a-z]+ only; guard anyway
            raise ValueError(f"unsupported symbol for SQL literal: {s!r}")
    m = l + r
    return f"""
    aggregate(
      syms,
      named_struct('out', array_repeat('', 0), 'prev', ''),
      (a, s) -> CASE
          WHEN a.prev = '{l}' AND s = '{r}'
            THEN named_struct('out', array_append(a.out, '{m}'), 'prev', '')
          WHEN a.prev = '' THEN named_struct('out', a.out, 'prev', s)
          ELSE named_struct('out', array_append(a.out, a.prev), 'prev', s)
        END,
      a -> CASE WHEN a.prev = '' THEN a.out
                ELSE array_append(a.out, a.prev) END
    )
    """


def train(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Greedy BPE training -> [(l, r, cnt), ...] merge rules in order.

    Stops early when no adjacent pair remains. Determinism: argmax ties
    break on (l, r) ascending.
    """
    from jcpg_spark.caching import swap_persist

    vocab = swap_persist(
        "bpe.vocab",
        word_counts(docs, text_col).select(F.expr(_CHARS_EXPR).alias("syms"), "n"),
    )
    merges: list[tuple[str, str, int]] = []
    for k in range(n_merges):
        top = (
            _pair_frame(vocab)
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
        merges.append((l, r, cnt))
        vocab = vocab.withColumn("syms", F.expr(_merge_expr(l, r)))
        if (k + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def segment(docs: DataFrame, merges, text_col: str = "text") -> DataFrame:
    """-> (doc_id, tokens array<string>): tokenize with trained merges.

    The scale design mirrors training's vocabulary funnel in reverse: the
    merge rules are applied to the corpus's DISTINCT words (vocabulary-
    sized, each rule one JVM fold — ``n_merges`` narrow map stages over a
    small frame), and the resulting word->tokens map is BROADCAST back
    onto the corpus, so the 100 TB side pays one word split + one
    broadcast hash join and never sees the iterative part. Unseen words
    can't occur (the vocab comes from the same corpus); a pre-trained
    rule set applied to NEW data gets its vocab from that data too —
    merges only ever fire on pairs they were trained on.
    """
    base = docs.select("doc_id", words(F.col(text_col)).alias("ws"))
    vocab = base.select(F.explode("ws").alias("word")).distinct()
    seg = vocab.select("word", F.expr(_CHARS_EXPR).alias("syms"))
    for l, r, *_ in merges:
        seg = seg.withColumn("syms", F.expr(_merge_expr(l, r)))
    # collect_list order is partition-dependent, so the word position rides
    # through the join and an array_sort on (pos, …) structs restores it
    toks = (
        base.select("doc_id", F.posexplode("ws").alias("pos", "word"))
        .join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.expr("transform(array_sort(collect_list(struct(pos, syms))), x -> x.syms)")
            ).alias("tokens")
        )
    )
    return docs.select("doc_id").join(toks, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("tokens"), F.expr("array_repeat('', 0)")).alias("tokens"),
    )
