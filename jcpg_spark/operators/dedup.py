"""Deduplication operators for training-data pipelines over ``documents``.

Four strategies, increasing in fuzziness; all shuffle-aware:

- exact:       hash-groupBy on normalized text (one shuffle on the hash)
- ngram exact-Jaccard: shingle explode -> self-join on shingle (candidate
  generation) -> group pair -> Jaccard. Quadratic only within shingle
  buckets; at 100 TB the shingle join is the scale path IF shingles are
  salted/df-filtered — frequent-shingle stopping is applied (a shingle
  shared by > max_df docs is dropped, the standard trick to stop hub
  shingles from exploding the join).
- MinHash+LSH: k permutations via xxhash64(seed_i, shingle); band-hash ->
  bucket join -> candidate pairs -> optional exact verify. Linear in data,
  constant per-doc sketch size — the 100 TB default.
- SimHash:     64-bit sign-sketch of word hashes; near-dup = small Hamming
  distance; candidate generation by 4x16-bit band equality.
- embedding near-dup: ``embedding_lsh_pairs`` (multi-table random-
  hyperplane bucketing + exact cosine verify within buckets) is the 100 TB
  default; ``embedding_cosine_pairs`` (all-pairs crossJoin) is kept ONLY
  as the exactness baseline for oracle/pytest verification at tiny sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jcpg_spark.functions.text import normalize_text, words


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """-> (canonical_doc_id, n_dups) per distinct normalized text."""
    return (
        docs.select("doc_id", normalize_text(F.col(text_col)).alias("norm"))
        .groupBy("norm")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_dups"))
        .select("canonical_doc_id", "n_dups")
    )


def boilerplate_texts(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    min_groups: int = 2,
) -> DataFrame:
    """-> (canonical_doc_id, n_groups, n_docs): normalized texts that recur
    across >= ``min_groups`` DISTINCT groups (sources, domains, crawls).

    Cross-group repetition is the boilerplate signature (license headers,
    navigation chrome, templated notices): within-group duplicates may be
    legitimate re-crawls, but the same text appearing under many sources is
    near-certainly template material — C4/RefinedWeb-style pipelines drop
    or down-weight it before training. ``exact_duplicates`` answers "is
    this text repeated?"; this answers "is it repeated ACROSS corpora?".

    One shuffle on the normalized-text hash (md5 so the 16-byte key, not
    the document body, crosses the exchange), one hash-agg computing both
    the distinct-group count and the per-text canonical; output is
    dimension-sized (distinct boilerplate texts), never data-sized.
    """
    norm_hash = F.md5(normalize_text(F.col(text_col))).alias("h")
    return (
        docs.select("doc_id", F.col(group_col).alias("grp"), norm_hash)
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count_distinct("grp").alias("n_groups"),
            F.count("*").alias("n_docs"),
        )
        .where(F.col("n_groups") >= min_groups)
        .select("canonical_doc_id", "n_groups", "n_docs")
    )


def boilerplate_spans(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    group_col: str = "source",
    min_groups: int = 2,
) -> DataFrame:
    """-> (shingle, n_groups, n_docs): word n-gram spans recurring across
    >= ``min_groups`` DISTINCT groups — the span-granularity form of
    ``boilerplate_texts`` (RefinedWeb-style duplicated-span detection:
    whole-document repetition is rare long before span repetition is, so
    the span unit is what actually fires on mostly-distinct corpora).

    Same plan shape as the shingle side of ``jaccard_pairs``: one explode
    of per-doc DISTINCT n-grams, one hash-agg on the span computing the
    distinct-group count. Output is vocabulary-sized. Unlike the hashed
    jaccard path the span string itself is kept (the consumer's next step
    is usually to scrub the span from the text), so this shuffles strings
    by design; ``n_groups`` dominance means the agg is map-side partial
    like any hash-agg.
    """
    ws = words(F.col(text_col))
    shingles = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, (i + k + 1).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(F.array_distinct(shingles)).alias("shingle"),
        )
        .groupBy("shingle")
        .agg(
            F.count_distinct("grp").alias("n_groups"),
            F.count("*").alias("n_docs"),
        )
        .where(F.col("n_groups") >= min_groups)
    )


def word_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", hashed: bool = False
) -> DataFrame:
    """-> (doc_id, shingle) distinct word n-grams.

    ``hashed=True`` replaces each shingle string with its 64-bit xxhash
    BEFORE the cross-row distinct — consumers that only join/group/count
    shingles (jaccard_pairs) shuffle 8-byte longs instead of ~25-byte
    strings everywhere, at collision odds ~|shingles|^2 / 2^64.
    """
    ws = words(F.col(text_col))
    # guard size<n: sequence(0, negative) would generate a DESCENDING range
    # and element_at(_, 0) throws — short docs get an empty shingle set.
    shingles = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, (i + k + 1).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = F.array_distinct(shingles)
    if hashed:
        sh = F.transform(sh, lambda s: F.xxhash64(s))
    # no cross-row distinct (r6): array_distinct already dedupes WITHIN a
    # doc and doc_id is the documents primary key, so (doc_id, shingle)
    # rows are unique by construction — the closing .distinct() was a
    # full exchange of the corpus-scale shingle stream that changed
    # nothing, paid by every consumer (jaccard/minhash/decontaminate).
    return docs.select("doc_id", F.explode(sh).alias("shingle"))


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.4,
    max_df: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: -> (doc_a, doc_b, jaccard).

    ``max_df`` drops hub shingles (document frequency cap) so the candidate
    self-join stays near-linear at scale.
    """
    # shingles are joined/grouped by value only, never read back as text —
    # hashed=True shuffles 8-byte longs instead of strings through the
    # distinct, the df-count, the semi join, and the candidate self-join
    sh = word_shingles(docs, n=n, text_col=text_col, hashed=True)
    # document-frequency filter as ONE window pass (r6): count(*) over
    # (partition by shingle) is exactly the groupBy df; the former
    # agg + semi-join-back shape shuffled the shingle stream twice AND
    # re-ran the shingle derivation once per side (the stream fed both the
    # agg and the join's left input). Hub rows still colocate per shingle
    # either way; the cap drops them inside the task.
    sh = (
        sh.withColumn("df", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("df") <= max_df)
        .drop("df")
    )
    # the capped shingle set feeds four consumers (sizes + both self-join
    # sides, each otherwise re-running the regexp+explode+distinct chain) —
    # persist so shingling happens once; swap_persist releases the previous
    # call's cache so repeated calls never accumulate cached RDDs
    from jcpg_spark.caching import swap_persist

    sh = swap_persist("jaccard_pairs.shingles", sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh = sh.join(sizes, "doc_id")  # carry size for the ratio prune

    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle")
    # size-ratio prune (semantics-preserving): J(A,B) <= min(|A|,|B|)/max —
    # a pair whose shingle-set sizes differ by more than the threshold ratio
    # can never reach it, so drop it BEFORE the pair aggregation.
    inter = (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("na") >= threshold * F.col("nb"))
            & (F.col("nb") >= threshold * F.col("na"))
        )
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    jac = inter.withColumn(
        "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    ).filter(F.col("jaccard") >= threshold)
    return jac.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: -> (id_a, id_b, cos) with
    cosine >= threshold, exact (all-pairs). The correctness baseline; the
    scale path reuses similarity.lsh_topk's multi-table bucketing for
    candidate generation and this as the verify step within buckets.
    """
    from jcpg_spark.operators.similarity import _dot, _norm

    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def embedding_lsh_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    n_planes: int = 3,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Scale-path embedding near-dup: -> (id_a, id_b, cos), cos >= threshold.

    Candidate generation is multi-table random-hyperplane bucketing (the
    same signature family as ``similarity.lsh_topk``): each vector lands in
    ``n_tables`` (table, bucket) cells; only pairs sharing a cell are
    scored, and scoring is the exact cosine, so every emitted pair is a
    TRUE positive — LSH only costs recall, never precision. Expected
    recall for a pair at cosine s: 1-(1-p^n_planes)^n_tables with
    p = 1 - arccos(s)/pi (defaults: >= 0.95 at s = 0.4, higher above).

    O(N * n_tables) bucketing + ONE hash-aggregate shuffle — replaces the
    O(N^2) crossJoin of ``embedding_cosine_pairs``. Each (table, bucket)
    cell collects its sorted id list and expands ordered pairs inline
    (array transform, no self-join), so candidate generation costs a
    single exchange of (id, table, bucket) rows; pairs are then deduped
    across tables as (id_a, id_b) ONLY — the vectors (unit-normalized
    once, so the verify is one dot product) join back AFTER the distinct,
    and the wide payload never rides through the pair shuffle (carrying
    2x64 doubles per candidate row measured ~60x the shuffle bytes).
    ``max_bucket`` optionally drops cells larger than the cap — now a free
    ``size()`` filter on the collected cell (previously a second
    count+semi-join pass): at 100 TB a degenerate bucket — e.g. the
    all-zero region of a bad embedding model — would otherwise go
    quadratic in both the collected array and the pair expansion; capped
    cells only cost recall for pairs whose EVERY shared bucket is hot, and
    the multi-table OR keeps that rare. Set it whenever the id universe is
    unbounded (the collected cell must fit an executor's row buffer).
    """
    from jcpg_spark.caching import swap_persist
    from jcpg_spark.operators.similarity import _dot, _rhp_buckets, _unit

    buckets = _rhp_buckets(vec_col, dim, n_planes, n_tables, seed0=1042)
    cells = embeddings.select(
        F.col(id_col).alias("id"), F.explode(buckets).alias("tb")
    ).select("id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))
    # the signature pass (n_tables x n_planes projections per vector) feeds
    # both sides of the candidate join — persist so it runs once
    cells = swap_persist("embedding_lsh_pairs.cells", cells)

    # Candidate generation as a bucketed self-equi-join on (table, bucket)
    # — the same formulation as the MinHash/SimHash band joins. r5's
    # collect_set + inline pair expansion avoided the second shuffle of the
    # cell list, but the nested transform/slice/struct expansion is
    # interpreted (non-codegen) expression evaluation per emitted pair and
    # measured 3x slower than the codegen'd hash-join expansion at equal
    # candidate sets (3.3s vs 1.1s at sf0.1's 3.05M expansions); with
    # ``cells`` persisted the join re-reads the cached 12-bytes-per-row
    # frame, so the "two shuffles" the r5 note worried about are two cache
    # reads, and AQE's skew-join splitting handles hot cells the way the
    # band joins already rely on.
    if max_bucket is not None:
        ok_cells = (
            cells.groupBy("table", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= max_bucket)
            .select("table", "bucket")
        )
        cells = cells.join(ok_cells, ["table", "bucket"], "left_semi")
    cand = (
        cells.select(F.col("id").alias("id_a"), "table", "bucket")
        .join(
            cells.select(F.col("id").alias("id_b"), "table", "bucket"),
            ["table", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    e = _unit(embeddings, id_col, vec_col, "id", "nv")
    pairs = cand.join(
        e.select(F.col("id").alias("id_a"), F.col("nv").alias("va")), "id_a"
    ).join(e.select(F.col("id").alias("id_b"), F.col("nv").alias("vb")), "id_b")
    return (
        pairs.withColumn("cos", _dot(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def _hash64_sql(family: str, *parts: str) -> str:
    """SQL fragment producing a 64-bit signed long from the given column/
    literal fragments — the hash-family seam behind every LSH sketch here.

    ``xxhash64`` (production default): Spark's native seedable hash —
    fastest, but with no DuckDB twin, so sketches built on it can only be
    rows-only checked by the driver. ``md5``: a 60-bit non-negative long
    from the first 15 hex chars of md5 over the ':'-joined string-cast
    parts — bit-identical in DuckDB as
    ``CAST(('0x'||substr(md5(a||':'||b),1,15)) AS BIGINT)``, which makes
    the FULL candidate generation (signatures, band hashes, buckets)
    exactly oracle-checkable at driver scale. Same plan shape either way;
    only the hash expression differs, so the md5-certified pipeline is
    the xxhash64 pipeline users run at 100 TB.
    """
    if family == "xxhash64":
        return "xxhash64(" + ",".join(parts) + ")"
    if family == "md5":
        joined = ",':',".join(f"cast({p} as string)" for p in parts)
        return f"cast(conv(substr(md5(concat({joined})),1,15),16,10) as bigint)"
    raise ValueError(f"unknown hash family {family!r}")


def minhash_signatures(
    docs: DataFrame, num_perm: int = 32, n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """-> (doc_id, sig: array<bigint>) MinHash signatures over word shingles.

    Permutation i is ``hash(i, shingle)`` under ``hash_family`` (see
    ``_hash64_sql`` — xxhash64 in production, md5 for exact DuckDB
    oracles); min per doc per permutation. Computed as one explode +
    groupBy (single shuffle), sketch size constant.
    """
    sh = word_shingles(docs, n=n)
    # one JVM-parsed aggregate expression (array over the num_perm mins):
    # the per-Column form cost ~300 py4j round trips of serial driver time
    # per call. SQL integer literals hash identically to F.lit(i) (both
    # int32 inputs to xxhash64).
    mins = ",".join(
        f"min({_hash64_sql(hash_family, str(i), 'shingle')})"
        for i in range(num_perm)
    )
    return sh.groupBy("doc_id").agg(F.expr(f"array({mins})").alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame, num_perm: int = 32, bands: int = 8, n: int = 3,
    threshold: float = 0.4, hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash LSH candidate pairs verified by estimated Jaccard.

    -> (doc_a, doc_b, est_jaccard). Band hash -> bucket join generates
    candidates in ~linear time; the signature-agreement fraction estimates
    Jaccard and filters at ``threshold``.

    Shuffle discipline (same rule as ``embedding_lsh_pairs``): the bucketed
    frame carries (doc_id, band, bh) only; candidate ids are deduped as
    (doc_a, doc_b) and the 32x8 B signatures join back AFTER the distinct —
    the sketch payload never rides the bands-way-exploded candidate shuffle.
    """
    from jcpg_spark.caching import swap_persist

    rows_per_band = num_perm // bands
    # the signature frame feeds the bucketing AND both sides of the verify
    # join; exchange reuse does not dedupe it (measured: 4 recomputes of
    # the shingle aggregate), so persist — swap_persist releases the
    # previous call's cache, so repeated calls never accumulate
    sig = swap_persist(
        "minhash_lsh_pairs.sig",
        minhash_signatures(docs, num_perm=num_perm, n=n, hash_family=hash_family),
    )
    # band hashes + bucket explosion as ONE inline() expression (same py4j
    # round-trip collapse as minhash_signatures above; band ids as SQL int
    # literals hash identically to the previous F.lit form)
    entries = ",".join(
        f"struct({b} as band,"
        + _hash64_sql(
            hash_family, str(b),
            *[f"element_at(sig,{b * rows_per_band + r + 1})" for r in range(rows_per_band)],
        )
        + " as bh)"
        for b in range(bands)
    )
    bucketed = sig.select("doc_id", F.expr(f"inline(array({entries}))"))

    a = bucketed.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    b = bucketed.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sigs_only = sig.select("doc_id", "sig")
    cand = cand.join(
        sigs_only.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a"
    ).join(sigs_only.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b")
    cand = cand.withColumn(
        "est_jaccard",
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.size("sig_a"),
    )
    return cand.filter(F.col("est_jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def simhash(
    docs: DataFrame, text_col: str = "text", hash_family: str = "xxhash64"
) -> DataFrame:
    """-> (doc_id, simhash: bigint). 64-bit sign sketch over word hashes.

    Per word w: h = hash(w) under ``hash_family`` (see ``_hash64_sql``;
    the md5 family yields 60-bit hashes, so bits 60-63 are always clear —
    consistent on both engines); bit b contributes +1/-1 to counter b; the
    sketch sets bit b iff counter b > 0. Expressed as explode + groupBy with
    64 conditional sums (one shuffle; JVM-side).
    """
    w = docs.select("doc_id", F.explode(words(F.col(text_col))).alias("word"))
    w = w.withColumn("h", F.expr(_hash64_sql(hash_family, "word")))
    sums = [
        F.sum(F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(64)
    ]
    agg = w.groupBy("doc_id").agg(*sums)
    bit_terms = [
        F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (1 << b) if b < 63 else F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    sh = agg.select("doc_id", sum(bit_terms[1:], bit_terms[0]).alias("simhash"))
    return sh


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 8, hash_family: str = "xxhash64"
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, candidates via 4x16-bit
    band equality (a doc pair within Hamming<=3 of each other must agree on
    at least one band; wider radii still prune massively)."""
    sh = simhash(docs, hash_family=hash_family)
    bands = [
        (F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))).alias(f"band{i}")
        for i in range(4)
    ]
    banded = sh.select("doc_id", "simhash", *bands)
    stacked = banded.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("band"), F.col(f"band{i}").alias("bv")) for i in range(4)])
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    a = stacked.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"), "band", "bv")
    b = stacked.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"), "band", "bv")
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )


def jaccard_pairs_prefix(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.4,
    max_df: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PREFIX FILTERING (AllPairs/PPJoin):
    identical output to ``jaccard_pairs``, asymptotically fewer candidates.

    The inverted-index join in ``jaccard_pairs`` generates a candidate for
    EVERY shared shingle. Prefix filtering exploits a total order over
    shingles (rarest first, by (df, hash)): if J(A,B) >= t then — given
    the size-ratio bound |B| >= t|A| — the intersection is >= ceil(t|A|),
    so A and B MUST share a token inside each one's first
    |x| - ceil(t*|x|) + 1 sorted tokens. Only prefixes are exploded into
    the index join (for t=0.4 that is ~43% of tokens, and the rare-first
    order makes surviving collisions rarer still); candidates are ids-only
    pairs, then verified exactly with one array_intersect over the
    per-doc sorted shingle-hash arrays (two joins against a doc-sized
    table instead of a shared-shingle-sized aggregation).
    """
    from jcpg_spark.caching import swap_persist

    sh = word_shingles(docs, n=n, text_col=text_col, hashed=True)
    # df as ONE window pass keeping the count column for the global
    # rare-first order (r6; see jaccard_pairs — former agg + join-back
    # shuffled the stream twice and derived the shingles once per side)
    sh = sh.withColumn(
        "df", F.count("*").over(Window.partitionBy("shingle"))
    ).filter(F.col("df") <= max_df)
    # one row per doc: shingles sorted rare-first (df asc, hash asc), plus
    # the plain sorted-hash array for the exact verify step
    per_doc = sh.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("ordered"),
        F.sort_array(F.collect_list("shingle")).alias("arr"),
    )
    per_doc = swap_persist(
        "jaccard_prefix.per_doc",
        per_doc.select(
            "doc_id",
            F.transform("ordered", lambda s: s["shingle"]).alias("ordered"),
            "arr",
            F.size("arr").alias("n_sh"),
        ),
    )
    # prefix length |x| - ceil(t|x|) + 1; the 1e-9 nudge keeps a float
    # t*|x| that lands epsilon ABOVE the exact rational from shortening
    # the prefix by one (overshoot only ever adds candidates)
    plen = (
        F.col("n_sh")
        - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
        + F.lit(1)
    ).cast("int")
    prefix = per_doc.select(
        "doc_id", "n_sh", F.explode(F.slice("ordered", 1, plen)).alias("tok")
    )
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), "tok")
        .filter(
            (F.col("x.doc_id") < F.col("y.doc_id"))
            & (F.col("x.n_sh") >= threshold * F.col("y.n_sh"))
            & (F.col("y.n_sh") >= threshold * F.col("x.n_sh"))
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    docs_a = per_doc.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"),
                            F.col("n_sh").alias("na"))
    docs_b = per_doc.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"),
                            F.col("n_sh").alias("nb"))
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    return (
        cand.join(docs_a, "doc_a")
        .join(docs_b, "doc_b")
        .withColumn("jaccard", inter / (F.col("na") + F.col("nb") - inter))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def keep_list(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Final dedup decision: near-dup pairs -> duplicate clusters ->
    (doc_id, canonical_doc_id, keep), one kept doc (min id) per cluster.

    This is the composition a production pipeline actually ships: any pair
    generator above (exact / Jaccard / MinHash / SimHash / embedding LSH)
    feeds the union-find canonicalizer (``canonicalize.connected_components``
    — the reference analog is the transitive method-graph merge,
    JavacpgMethodLevel.java:272-290), and the resulting cluster map is
    joined back onto the corpus. The pair graph is dup-pair-sized (orders
    of magnitude below the corpus), so the CC fast path applies and the
    mapping is BROADCAST back — the corpus side contributes no shuffle.
    Docs in no pair are their own canonical and kept.
    """
    from jcpg_spark.operators.canonicalize import connected_components

    mapping, _rounds, _converged = connected_components(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    canon = F.coalesce(F.col("canonical_id"), F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(
            F.broadcast(mapping.select(F.col("entity").alias("doc_id"), "canonical_id")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            canon.alias("canonical_doc_id"),
            (canon == F.col("doc_id")).alias("keep"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    val_hex: tuple[str, ...] = ("c", "d"),
    test_hex: tuple[str, ...] = ("e", "f"),
) -> DataFrame:
    """-> (doc_id, canonical_doc_id, split): train/val/test assignment at
    near-duplicate-CLUSTER granularity.

    A per-document hash split (``doc_split_assign``'s family) leaks: two
    near-duplicates can land on opposite sides of the train/eval boundary,
    and the eval score then measures memorization. Here every document
    inherits the split of its cluster CANONICAL (union-find over the
    near-dup pairs, exactly ``keep_list``'s composition), so a whole
    duplicate cluster moves as one unit and no pair ever straddles the
    boundary. The hash family is the same md5-first-hex-char 12/2/2 split
    as the per-doc assigner, applied to the canonical id — singleton docs
    (in no pair) therefore get exactly their per-doc assignment, and the
    operator is a drop-in refinement. The cluster mapping is dup-pair-sized
    and broadcasts; the corpus side contributes no shuffle beyond
    ``keep_list``'s.
    """
    kl = keep_list(docs, pairs)
    c = F.substring(F.md5(F.col("canonical_doc_id").cast("string")), 1, 1)
    split = (
        F.when(c.isin(*val_hex), "val")
        .when(c.isin(*test_hex), "test")
        .otherwise("train")
    )
    return kl.select("doc_id", "canonical_doc_id", split.alias("split"))


def semantic_dedup(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]] | None = None,
    k: int = 16,
    iters: int = 3,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space with the IVF k-means quantizer, then within each cluster prune
    groups of semantically near-identical vectors (pairwise cosine >=
    ``threshold``), keeping per duplicate group the member LEAST similar
    to its cluster centroid — the paper's keep-low-centroid-similarity
    rule, which preserves the diverse boundary examples and drops the
    redundant core. -> (vec_id, centroid, canonical_id, keep).

    Composition: ``similarity.kmeans_centroids`` (or caller-supplied
    ``centroids``) -> ``similarity.ivf_assign`` (JVM literal-array argmin,
    no shuffle) -> within-cluster pair join -> union-find duplicate groups
    (``canonicalize.connected_components``) -> per-group argmin on
    (centroid_cos, id).

    Scale posture: the pair join is keyed by centroid, so the quadratic
    cost is O(sum_c |c|^2) = O(N^2/K) under balanced clusters — K is the
    dial, grown with N exactly as the paper scales its clustering (their
    LAION runs use K in the tens of thousands); ``max_cluster`` fences the
    degenerate-cluster blowup the way ``max_bucket`` fences hot LSH cells
    (an over-cap cluster is skipped and reported keep=true rather than
    going quadratic). Vectors are unit-normalized ONCE before the join so
    the verify is a single dot product; the duplicate-group mapping is
    dup-pair-sized and broadcasts back (``keep_list``'s argument) — the
    corpus side sees one exchange on centroid and nothing else.

    Determinism: assignment is the deterministic argmin of ``ivf_assign``;
    the keep rule totals-orders on (round(cos_to_centroid, 9), id), so
    results are partitioning-invariant given the same centroid list.
    """
    from jcpg_spark.operators.canonicalize import connected_components
    from jcpg_spark.operators.similarity import (
        _centroid_arr,
        _dot,
        _norm,
        _unit,
        ivf_assign,
        kmeans_centroids,
    )

    if centroids is None:
        centroids = kmeans_centroids(
            embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        )
    u = _unit(embeddings, id_col, vec_col, "vec_id", "uv")
    assigned = (
        ivf_assign(u, centroids, id_col="vec_id", vec_col="uv")
        .withColumnRenamed("vec", "uv")
    )
    carr = _centroid_arr(centroids)
    cvec = F.element_at(carr, F.col("centroid") + 1)
    withsim = assigned.select(
        "vec_id",
        "centroid",
        "uv",
        (_dot(F.col("uv"), cvec) / _norm(cvec)).alias("centroid_cos"),
    )
    from jcpg_spark.caching import swap_persist

    withsim = swap_persist("semantic_dedup.assigned", withsim)
    pool = withsim
    if max_cluster is not None:
        sizes = withsim.groupBy("centroid").agg(F.count("*").alias("_cn"))
        pool = withsim.join(
            F.broadcast(sizes.filter(F.col("_cn") <= max_cluster)).drop("_cn"),
            "centroid",
        )
    a = pool.select(
        "centroid",
        F.col("vec_id").alias("id_a"),
        F.col("uv").alias("va"),
    )
    b = pool.select(
        "centroid",
        F.col("vec_id").alias("id_b"),
        F.col("uv").alias("vb"),
    )
    pairs = (
        a.join(b, "centroid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(_dot(F.col("va"), F.col("vb")) >= threshold)
        .select("id_a", "id_b")
    )
    mapping, _rounds, _converged = connected_components(
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    grouped = withsim.join(
        F.broadcast(mapping.select(F.col("entity").alias("vec_id"), "canonical_id")),
        "vec_id",
        "left",
    ).withColumn("gid", F.coalesce(F.col("canonical_id"), F.col("vec_id")))
    # keep = the group member least similar to its centroid; min_by over a
    # (rounded cos, id) struct — a total order, so partitioning-invariant
    key = F.struct(
        F.round(F.col("centroid_cos"), 9).alias("c"), F.col("vec_id").alias("i")
    )
    keeper = grouped.groupBy("gid").agg(F.min_by("vec_id", key).alias("keep_id"))
    return (
        grouped.join(F.broadcast(keeper), "gid")
        .select(
            "vec_id",
            "centroid",
            F.col("gid").alias("canonical_id"),
            (F.col("vec_id") == F.col("keep_id")).alias("keep"),
        )
    )


def scrub_boilerplate_spans(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    group_col: str = "source",
    min_groups: int = 2,
) -> DataFrame:
    """-> (doc_id, clean_text, n_removed): rewrite each document with its
    cross-source boilerplate SPANS excised — every word position covered
    by any n-gram that ``boilerplate_spans`` flags (recurring across >=
    ``min_groups`` distinct sources) is dropped, and the survivors rejoin
    in order. The RefinedWeb/C4 scrubbing step that actually EDITS the
    corpus, where ``boilerplate_spans`` only reports: detection and
    removal ship as one composition.

    Output text is the normalized token stream (lowercased ``words()``
    rejoined with single spaces) — the form a training pipeline feeds the
    tokenizer anyway; position indices make removal exact under overlap
    (two flagged n-grams sharing words drop the union of their spans,
    counted once). Documents shorter than ``n`` words pass through whole;
    a fully-boilerplate document comes back as the empty string with
    ``n_removed`` = its word count, not as a dropped row.

    Scale posture: one posexplode of word positions (the same weight as
    the shingle pass), the hot-span set is vocabulary-sized and meets the
    per-doc n-grams on the span hash, covered positions explode n rows
    per flagged n-gram (bounded by n * flagged occurrences, not by corpus
    size), and the rebuild is one hash-agg with the sorted-collect_list
    reassembly idiom. No UDF anywhere.
    """
    ws = words(F.col(text_col))
    base = docs.select("doc_id", ws.alias("ws"))
    from jcpg_spark.caching import swap_persist

    pos_words = swap_persist(
        "scrub.pos_words",
        base.select("doc_id", F.posexplode(F.col("ws")).alias("pos", "w")),
    )
    grams = base.select(
        "doc_id",
        F.when(
            F.size(F.col("ws")) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(F.col("ws")) - n),
                lambda i: F.struct(
                    i.alias("i"),
                    F.concat_ws(
                        " ",
                        *[F.element_at(F.col("ws"), (i + k + 1).cast("int")) for k in range(n)],
                    ).alias("g"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<i:int,g:string>>")).alias("gs"),
    ).select("doc_id", F.explode(F.col("gs")).alias("ig")).select(
        "doc_id", F.col("ig.i").alias("i"), F.col("ig.g").alias("g")
    )
    hot = boilerplate_spans(
        docs, n=n, text_col=text_col, group_col=group_col, min_groups=min_groups
    ).select(F.col("shingle").alias("g"))
    covered = (
        grams.join(hot, "g", "left_semi")
        .select("doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + n - 1)).alias("pos"))
        .distinct()
    )
    return _excise_positions(docs, pos_words, covered)


def _excise_positions(
    docs: DataFrame, pos_words: DataFrame, covered: DataFrame
) -> DataFrame:
    """-> (doc_id, clean_text, n_removed): drop every ``covered``
    (doc_id, pos) word position from ``pos_words`` and rejoin the
    survivors in order — the shared rebuild tail of both span scrubbers
    (one anti-join, one hash-agg with the sorted-collect_list reassembly
    idiom, and a left join back to the full doc set so fully-scrubbed
    documents come back as empty strings, not dropped rows)."""
    kept = pos_words.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
            ),
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = pos_words.groupBy("doc_id").agg(F.count("*").alias("n_words"))
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (
                F.coalesce(F.col("n_words"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("int").alias("n_removed"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 16,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, span_start, span_end, span_len): maximal word-position
    intervals in which every length-``k`` word window occurs >=
    ``min_count`` times across the ENTIRE corpus (occurrences, not distinct
    documents — a verbatim repeat inside one document is a duplicate too).
    This is the ExactSubstr unit of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), re-expressed hash-first
    instead of via their monolithic suffix array: a shared substring of
    word length L >= k shows up as L-k+1 consecutive duplicated k-grams,
    so maximal duplicated regions are exactly the interval union of
    [p, p+k-1] over duplicated k-gram start positions p (positions merge
    while the gap between consecutive duplicated starts is <= k).

    Where ``boilerplate_spans`` asks "which n-gram strings recur across
    sources" (vocabulary-sized answer), this asks "which REGIONS of which
    documents are verbatim repeats" (corpus-addressed answer) — the form a
    scrubber or a span-level dedup policy consumes.

    Scale posture: the k-gram keys are 8-byte xxhash64 longs computed
    map-side (gram strings never cross a shuffle), global occurrence
    counting is one hash-agg with map-side partials, duplicated positions
    come back via one semi-join on the long key, and the interval merge is
    the sessionize idiom (lag + running sum over a per-document window)
    ending in one hash-agg. No UDF, no self-join, no pair table — hub
    k-grams cost one counter cell each, so no df-cap is needed (contrast
    jaccard_pairs, whose candidate join is quadratic per shingle bucket).
    Collision odds are the usual ~|grams|^2 / 2^64 of the hashed-key
    convention documented on word_shingles.

    Reference analog: region detection over an ordered token stream is the
    corpus-side twin of the DDG's reaching-definition interval logic
    (JavacpgDDGBuilder.java:102-117); in the training-data pipeline it
    feeds span removal the way boilerplate_spans feeds
    scrub_boilerplate_spans.
    """
    from pyspark.sql import Window

    from jcpg_spark.caching import swap_persist

    ws = words(F.col(text_col))
    grams = docs.select(
        "doc_id",
        F.when(
            F.size(ws) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - k),
                lambda i: F.xxhash64(
                    F.concat_ws(
                        " ",
                        *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(k)],
                    )
                ),
            ),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("hs"),
    ).select("doc_id", F.posexplode("hs").alias("pos", "h"))
    # two consumers (the global count and the semi-join) read the same
    # one-pass gram table; keyed persist per the caching convention
    grams = swap_persist("duplicate_spans.grams", grams)
    hot = (
        grams.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("h")
    )
    dup = grams.join(hot, "h", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    seg = dup.withColumn(
        "brk", F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0)
    ).withColumn("seg", F.sum("brk").over(w))
    return (
        seg.groupBy("doc_id", "seg")
        .agg(F.min("pos").alias("s"), (F.max("pos") + k - 1).alias("e"))
        .select(
            "doc_id",
            F.col("s").cast("int").alias("span_start"),
            F.col("e").cast("int").alias("span_end"),
            (F.col("e") - F.col("s") + 1).cast("int").alias("span_len"),
        )
    )


def scrub_duplicate_spans(
    docs: DataFrame,
    k: int = 16,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, clean_text, n_removed): rewrite each document with its
    ExactSubstr duplicated regions excised — every word position covered
    by a ``duplicate_spans`` interval (each k-gram occurring >=
    ``min_count`` times corpus-wide) is dropped from EVERY copy, and the
    survivors rejoin in order. Lee et al. 2022 cut the duplicated bytes
    out of the training stream the same way; dropping all copies (rather
    than all-but-one) is their published setting and keeps the operator a
    pure per-position filter — no global copy-election step, which at
    10^12 turns would be another CC-sized coordination problem for ~0.001
    residual mass.

    Output contract matches ``scrub_boilerplate_spans`` exactly (same
    normalized token stream, same empty-string-not-dropped-row rule), so
    downstream curation treats the two scrubbers interchangeably. Costs
    one extra posexplode of word positions on top of ``duplicate_spans``;
    covered positions come straight off the merged intervals (already
    distinct by construction — intervals within a document are disjoint).
    """
    from jcpg_spark.caching import swap_persist

    ws = words(F.col(text_col))
    pos_words = swap_persist(
        "scrub_dup.pos_words",
        docs.select("doc_id", F.posexplode(ws).alias("pos", "w")),
    )
    spans = duplicate_spans(docs, k=k, min_count=min_count, text_col=text_col)
    covered = spans.select(
        "doc_id",
        F.explode(F.sequence(F.col("span_start"), F.col("span_end"))).alias("pos"),
    )
    return _excise_positions(docs, pos_words, covered)


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_hits, contaminated): benchmark decontamination — flag
    training documents sharing any word ``n``-gram with a REFERENCE eval
    set (the GPT-3 appendix-C / PaLM protocol; 13-grams published). This
    is corpus-vs-reference overlap, not corpus-internal dedup: a training
    doc that quotes an eval question verbatim poisons the benchmark even
    if it is unique within the corpus.

    Plan: the eval side reduces to a DISTINCT hashed-shingle set —
    eval-suite sized, i.e. a dimension — and BROADCASTS to the corpus
    shingle scan, so at 100 TB the corpus side sees one explode + one
    map-side broadcast join + one doc_id hash-agg; the only data-scale
    shuffle is the per-doc hit count. Shingles cross as xxhash64 longs
    (the ``word_shingles(hashed=True)`` convention; collision odds
    ~|eval shingles| * |doc shingles| / 2^64).

    ``n_hits`` counts DISTINCT matching n-grams per doc; ``contaminated``
    is ``n_hits >= min_hits``. Docs with no match keep a row (0, false) —
    the output is a per-doc verdict table, joinable as a keep-filter.
    """
    eval_sh = (
        word_shingles(eval_docs, n=n, text_col=text_col, hashed=True)
        .select("shingle")
        .distinct()
    )
    doc_sh = word_shingles(docs, n=n, text_col=text_col, hashed=True)
    hits = (
        doc_sh.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .distinct()
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    max_df: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """ASYMMETRIC near-dup detection — shingle containment
    C(A in B) = |A∩B| / |A| — the quote/excerpt/subsumption relation
    Jaccard structurally misses: a paragraph quoted inside a 100x larger
    document has near-zero resemblance but containment ~1. Broder's
    second sketch measure, and the right primitive for "this doc is a
    fragment of that one" curation decisions (quote collapse, excerpt
    dedup, boilerplate-wrapper detection). Emits directed rows
    (doc_src, doc_sup, containment): doc_src's shingle set is >=
    ``threshold`` contained in doc_sup's.

    Same hashed-shingle plumbing as ``jaccard_pairs`` (8-byte longs
    through every shuffle, df-capped hub shingles, one persisted shingle
    frame, one unordered pair aggregation emitting both directions).
    NOTE the honest scale difference vs Jaccard: containment admits NO
    size-ratio prune (the small-in-large pair is exactly the target),
    so the ``max_df`` hub cap is the only bound on candidate volume —
    size it to the corpus's shingle df distribution.
    """
    from jcpg_spark.caching import swap_persist

    sh = word_shingles(docs, n=n, text_col=text_col, hashed=True)
    # df cap as ONE window pass (r6; see jaccard_pairs)
    sh = (
        sh.withColumn("df", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("df") <= max_df)
        .drop("df")
    )
    sh = swap_persist("containment_pairs.shingles", sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh = sh.join(sizes, "doc_id")

    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    ab = inter.select(
        F.col("doc_a").alias("doc_src"),
        F.col("doc_b").alias("doc_sup"),
        (F.col("inter") / F.col("na")).alias("containment"),
    )
    ba = inter.select(
        F.col("doc_b").alias("doc_src"),
        F.col("doc_a").alias("doc_sup"),
        (F.col("inter") / F.col("nb")).alias("containment"),
    )
    return (
        ab.unionByName(ba)
        .filter(F.col("containment") >= threshold)
        .select("doc_src", "doc_sup", F.round("containment", 6).alias("containment"))
    )
