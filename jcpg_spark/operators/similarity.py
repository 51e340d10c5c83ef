"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side is broadcast (queries are few); the dot product runs JVM-side
  via ``zip_with``/``aggregate`` in doubles, no Python.
- ``lsh_topk``: multi-table random-hyperplane LSH — the scale path. Each
  vector hashes to ``n_tables`` independent signed-projection signatures;
  candidates share any (table, bucket); exact cosine re-ranks deduped
  candidates. At 100 TB the bucket join replaces the O(N*Q) crossJoin with
  O(N * n_tables) bucketing + skew-safe equi-join.

Hyperplanes are generated deterministically from xxhash64(seed, plane, dim)
so results are partitioning-independent (no Math.random on executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    -> (query_id, neighbor_id, rank, score). Self-matches excluded.
    ``queries`` is broadcast (small); ranking window per query id.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    base = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", _dot(F.col("qvec"), F.col("nvec")) / (_norm(F.col("qvec")) * _norm(F.col("nvec"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("score", 6).alias("score"))
    )


def class_centroids(
    embeddings: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """-> (label, pos, c): per-label mean embedding in LONG form — c is the
    average of component ``pos`` (0-based) over the label's vectors.

    The prototype-embedding primitive (class centroids for nearest-
    centroid classification, contrastive anchor means, drift monitoring).
    Long form is deliberate: each output cell is ONE scalar double, so an
    exact cross-engine oracle compares rounded scalars instead of
    stringified float arrays; ``F.array_agg`` consumers can pivot back
    with one ``collect_list`` over ``pos`` order.

    One posexplode (dim x rows, map-side) + one hash-agg on (label, pos) —
    partial aggregation makes the shuffle carry at most
    |labels| x dim x partitions rows at any corpus size.
    """
    e = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    )
    return e.groupBy("label", "pos").agg(
        F.avg(F.col("x").cast("double")).alias("c")
    )


def _plane_signs(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic {-1,+1} hyperplane matrix, computed ONCE on the driver
    (sha256 of (seed, plane, dim) — partitioning-independent by
    construction). Inlined as literals so the executor-side signature is
    pure arithmetic; the previous form hashed xxhash64(seed, p, d) per ROW
    (dim x n_planes hashes per vector), which profiled as the dominant
    cost of the bucketing pass at sf0.1."""
    import hashlib

    return [
        [
            1.0 if hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()[0] % 2 == 0 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _rhp_signature_sql(vec_sql: str, dim: int, n_planes: int, seed: int = 42) -> str:
    """SQL-text form of the random-hyperplane bit signature: bit p =
    sign(vec . h_p) with h_p a literal {-1,+1} array from ``_plane_signs``.
    Emitted as ONE expression string (parsed JVM-side in a single py4j
    round trip): the previous Column-by-Column construction issued
    thousands of py4j calls per table set (64 literals x planes x tables)
    and profiled at ~4s of DRIVER time per query build at the default
    12-table geometry — pure Python-side overhead, invisible to executor
    metrics."""
    bits = []
    for p, signs in enumerate(_plane_signs(dim, n_planes, seed)):
        plane = "array(" + ",".join(f"{s:.0f}D" for s in signs) + ")"
        proj = f"aggregate(zip_with({vec_sql},{plane},(x,s)->double(x)*s),0D,(a,v)->a+v)"
        bits.append(f"if({proj}>=0,{1 << p},0)")
    return "(" + "+".join(bits) + ")"


def _rhp_signature(vec_sql, dim: int, n_planes: int, seed: int = 42) -> Column:
    """Column form of ``_rhp_signature_sql``. ``vec_sql`` is the vector
    column NAME (or any SQL fragment evaluating to array<numeric>)."""
    return F.expr(_rhp_signature_sql(vec_sql, dim, n_planes, seed))


def _rhp_buckets(
    vec_sql: str, dim: int, n_planes: int, n_tables: int, seed0: int
) -> Column:
    """array<struct<table:int, bucket:int>> of all ``n_tables`` signatures,
    built as a single JVM-parsed expression."""
    entries = ",".join(
        f"struct({t} as table,{_rhp_signature_sql(vec_sql, dim, n_planes, seed0 + t)} as bucket)"
        for t in range(n_tables)
    )
    return F.expr(f"array({entries})")


def _unit(df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str) -> DataFrame:
    """Project to (out_id, out_vec) with the vector scaled to unit norm —
    computed once per VECTOR so downstream pair scoring is a single dot
    product instead of dot + two norms (3x fewer elementwise ops on the
    pair-scale path; the norm column is materialized per row, not
    re-evaluated inside the transform lambda)."""
    n = _norm(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias("_v"), n.alias("_n")
    ).select(
        out_id, F.transform(F.col("_v"), lambda x: x.cast("double") / F.col("_n")).alias(out_vec)
    )


def _centroid_arr(centroids: list[tuple[int, list[float]]]):
    """Literal array<array<double>> of centroid vectors (tiny, inlined as
    ONE JVM-parsed expression — the per-literal Column form cost K x dim
    py4j round trips per k-means round)."""
    inner = ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in vec) + ")" for _cid, vec in centroids
    )
    return F.expr(f"array({inner})")


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantization: assign each vector to its nearest centroid.

    The argmin over K centroids is computed as a literal-array expression
    (per-row array of K dot products -> array_position of the max) —
    whole-stage-codegen JVM arithmetic, NO shuffle and no UDF, which is
    what makes the assignment pass free at 100 TB (a groupBy-argmin would
    hit the sort-fallback trap at data-scale group counts).
    """
    carr = _centroid_arr(centroids)
    sims = F.transform(carr, lambda c: _dot(F.col(vec_col), c) / (_norm(F.col(vec_col)) * _norm(c)))
    cid = F.array_position(sims, F.array_max(sims)).cast("int") - 1
    return embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"), cid.alias("centroid")
    )


def default_centroids(embeddings: DataFrame, k: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic centroid seed: the first k vectors by id (the cheap
    seed; ``kmeans_centroids`` below refines it with Lloyd rounds)."""
    rows = embeddings.orderBy(id_col).limit(k).collect()
    return [(i, list(map(float, r[vec_col]))) for i, r in enumerate(rows)]


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Distributed Lloyd refinement of the deterministic seed — the
    k-means training step for the IVF coarse quantizer.

    Each round: assign every vector to its nearest centroid with the same
    JVM-side literal-array argmin as ``ivf_assign`` (no UDF, no extra
    shuffle beyond the one groupBy), then recompute centroids as per-dimension
    means via ``posexplode`` + hash aggregation — one shuffle on
    (centroid, dim), map-side combinable, so a round costs two exchanges
    regardless of N. Only the K centroid vectors ever reach the driver.
    Empty clusters keep their previous centroid. The ASSIGNMENT each round
    is deterministic (seed is first-k by id; argmin over a fixed centroid
    list), but centroid VALUES use ``F.avg`` over doubles — a
    partition-order-dependent floating-point sum — so centroids can differ
    in final ulps across parallelism levels, and an argmin whose top-2
    distances tie within that error may flip. Callers needing bit-stable
    centroids should fold a sorted collect_list per (centroid, dim)
    instead; at IVF-probe granularity the ulp jitter is immaterial (the
    pytest gate asserts objective improvement and full-probe exactness,
    not centroid bits).
    """
    cents = default_centroids(embeddings, k=k, id_col=id_col, vec_col=vec_col)
    for _ in range(iters):
        assigned = ivf_assign(embeddings, cents, id_col=id_col, vec_col=vec_col)
        per_dim = assigned.select(
            "centroid", F.posexplode(F.col("vec")).alias("dim", "x")
        ).groupBy("centroid", "dim").agg(F.avg(F.col("x").cast("double")).alias("m"))
        rows = (
            per_dim.groupBy("centroid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
                ).alias("mean_vec")
            )
            .collect()
        )
        new = {r["centroid"]: list(map(float, r["mean_vec"])) for r in rows}
        cents = [(cid, new.get(cid, vec)) for cid, vec in cents]
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest centroid lists per query,
    exact cosine re-rank within the probed lists.

    -> (query_id, neighbor_id, rank, score). Recall dial = nprobe/K.
    """
    from pyspark.sql import Window

    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)

    carr = _centroid_arr(centroids)
    qsims = F.transform(carr, lambda c: _dot(F.col(vec_col), c) / (_norm(F.col(vec_col)) * _norm(c)))
    # nprobe nearest centroids: sort (sim, idx) descending, take prefix
    idxed = F.transform(
        qsims, lambda s, i: F.struct((-s).alias("neg"), i.alias("idx"))
    )
    probes = F.transform(
        F.slice(F.array_sort(idxed), 1, nprobe), lambda st: st["idx"].cast("int")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), probes.alias("probes")
    ).select("query_id", "qvec", F.explode("probes").alias("centroid"))

    scored = (
        assigned.join(F.broadcast(q), "centroid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", _dot(F.col("qvec"), F.col("vec")) / (_norm(F.col("qvec")) * _norm(F.col("vec"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", F.round("score", 6).alias("score"))
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH + exact re-rank.

    OR-amplification across ``n_tables`` independent signatures: a pair at
    angular similarity s collides in one table with s^n_planes, and in ANY
    table with 1-(1-s^n_planes)^n_tables — the standard recall/cost dial
    (more tables = higher recall; more planes = smaller buckets). Candidates
    are deduped before the exact cosine re-rank, so extra tables cost bucket
    I/O, not extra scoring. -> (query_id, neighbor_id, rank, score).

    Shuffle discipline (same rule as ``dedup.embedding_lsh_pairs``): the
    bucketed base side carries (neighbor_id, table, bucket) ONLY — never
    the embedding. Candidate ids are deduped first; the query vectors
    (small side) broadcast back and the neighbor vectors equi-join back
    AFTER the distinct. Carrying the two vectors through the candidate
    dedup measured ~60x the shuffle bytes on the dedup variant — at 100 TB
    with n_tables-way explode that payload IS the job.
    """
    from pyspark.sql import Window

    def cells(df, ident, with_seed):
        buckets = _rhp_buckets(vec_col, dim, n_planes, n_tables, seed0=with_seed)
        return df.select(F.col(id_col).alias(ident), F.explode(buckets).alias("tb")).select(
            ident, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
        )

    base = cells(embeddings, "neighbor_id", 42)
    q = cells(queries, "query_id", 42)
    cand = (
        base.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qvecs = _unit(queries, id_col, vec_col, "query_id", "qvec")
    nvecs = _unit(embeddings, id_col, vec_col, "neighbor_id", "nvec")
    scored = (
        cand.join(F.broadcast(qvecs), "query_id")
        .join(nvecs, "neighbor_id")
        .withColumn("score", _dot(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("score", 6).alias("score"))
    )


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization training (Jegou et al. 2011): split the vector
    into ``m`` contiguous subspaces and train an independent ``k``-word
    codebook per subspace with the existing distributed Lloyd trainer.
    Returns ``m`` codebooks, each ``kmeans_centroids``-shaped.

    Each subspace train is a full ``kmeans_centroids`` run over the SLICED
    column (``F.slice`` — a JVM projection, no UDF, no extra shuffle
    beyond the trainer's own per-round aggregation); only m*k sub-vectors
    ever reach the driver. The codebook payload is m*k*(dim/m) floats —
    constant in N — which is the whole point: a 100 TB vector corpus
    compresses to m log2(k)-bit codes per vector for in-memory ANN.
    """
    dim = len(embeddings.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = []
    for s in range(m):
        sliced = embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), s * sub + 1, sub).alias("subvec"),
        )
        books.append(
            kmeans_centroids(sliced, k=k, iters=iters, id_col="vec_id", vec_col="subvec")
        )
    return books


def _pq_dist_exprs(vec_col: str, s: int, sub: int, book) -> list:
    """One scalar L2-distance expression per codeword of subspace ``s`` —
    deliberately HOF-free (plain element_at + literal arithmetic): nested
    transform/aggregate lambdas across MULTIPLE columns of one projection
    collide on lambda-variable ids in this Spark version (observed live:
    two ADC tables in one select cross-contaminating entries), and the
    unrolled form is also the faster one under whole-stage codegen for
    the small sub-dims PQ uses. L2 on raw subvectors (the PQ convention;
    cosine is recovered by unit-normalizing inputs before train/encode)."""
    base = s * sub
    out = []
    for _cid, w in book:
        terms = None
        for d in range(sub):
            diff = F.element_at(F.col(vec_col), base + d + 1) - F.lit(float(w[d]))
            t = diff * diff
            terms = t if terms is None else terms + t
        out.append(terms)
    return out


def _pq_subspace_code(vec_col: str, s: int, sub: int, book) -> "Column":
    """Code (argmin L2 distance) of subspace ``s`` against its codebook —
    literal-array JVM argmin like ``ivf_assign`` (first minimum wins on
    exact ties via array_position)."""
    d2s = F.array(*_pq_dist_exprs(vec_col, s, sub, book))
    return (F.array_position(d2s, F.array_min(d2s)).cast("int") - 1).alias(f"c{s}")


def pq_encode(
    embeddings: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, codes array<int>): each vector compressed to its
    ``m`` nearest-codeword indices — map-side column algebra only (the
    codebooks inline as literal arrays exactly like ``ivf_assign``), so
    encoding a 10^12-row corpus adds ZERO exchanges to the scan that
    produces it. Deterministic: argmin over a fixed list with
    array_position tie-break (first minimum wins on exact ties)."""
    dim = len(embeddings.select(vec_col).first()[0])
    m = len(books)
    sub = dim // m
    cols = [_pq_subspace_code(vec_col, s, sub, books[s]) for s in range(m)]
    return embeddings.select(
        F.col(id_col).alias("vec_id"), F.array(*cols).alias("codes")
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    exact, every candidate's distance is the sum over subspaces of the
    query->codeword distance its code names. -> (query_id, neighbor_id,
    rank, adc_dist) ascending by approximate L2.

    The per-query distance TABLE (m x k doubles) is computed on the
    (small, broadcast) query side; the corpus side contributes only its
    codes — scoring is ``element_at(table[s], code_s)`` summed over m,
    pure JVM arithmetic on an 8-int payload instead of a dim-double
    vector. That asymmetry is the production ANN memory story: the
    billion-vector side never materializes floats at all.
    """
    from pyspark.sql import Window

    dim = len(queries.select(vec_col).first()[0])
    m = len(books)
    sub = dim // m
    # per-query distance tables, one array<double> of length k per
    # subspace — HOF-free scalar arithmetic (see _pq_dist_exprs)
    tables = queries.select(
        F.col(id_col).alias("query_id"),
        *[
            F.array(*_pq_dist_exprs(vec_col, s, sub, books[s])).alias(f"t{s}")
            for s in range(m)
        ],
    )
    scored = codes.crossJoin(F.broadcast(tables)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    adc = sum(
        F.element_at(F.col(f"t{s}"), F.element_at(F.col("codes"), s + 1) + 1)
        for s in range(m)
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("adc", adc)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("adc", 6).alias("adc_dist"),
        )
    )


def bitext_mine(
    embeddings: DataFrame,
    k_neigh: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    side: Column | None = None,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the CCMatrix /
    LASER protocol): align each side-A vector to its best side-B partner
    by the RATIO margin — cos(x, y) normalized by the mean of the two
    vectors' top-``k_neigh`` neighborhood densities — which suppresses
    hub vectors that are everyone's nearest neighbor (the failure mode of
    raw-cosine alignment in cross-lingual spaces).

    -> (a_id, b_id, cos, margin, mutual): the forward-best partner per
    side-A vector; ``mutual`` marks pairs that are also backward-best
    (the intersection criterion used for high-precision mining). ``side``
    is a boolean Column splitting the space (default: even/odd ``id_col``
    — the deterministic stand-in for a language split).

    This is the EXACT all-pairs formulation — the tiny-sf verification
    baseline only, quarantined exactly like ``dedup.embedding_cosine``.
    The scale path generates candidate pairs with the multi-table
    random-hyperplane buckets (``rhp_buckets`` / ``lsh_topk``) and feeds
    them through the same density + margin windows; densities computed
    over bucket candidates are the standard approximation (faiss-style),
    documented as such. Cosines are pinned to 6 dp before every window so
    ranks are a pure function of cross-engine-equal values.
    """
    from pyspark.sql import Window

    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if side is None:
        side = F.col("id") % 2 == 0
    a = e.where(side).select(F.col("id").alias("a_id"), F.col("v").alias("va"))
    b = e.where(~side).select(F.col("id").alias("b_id"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b).select(
        "a_id",
        "b_id",
        F.round(
            _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))),
            6,
        ).alias("cos"),
    )
    wa = Window.partitionBy("a_id").orderBy(F.col("cos").desc(), F.col("b_id").asc())
    wb = Window.partitionBy("b_id").orderBy(F.col("cos").desc(), F.col("a_id").asc())
    ranked = pairs.withColumn("rka", F.row_number().over(wa)).withColumn(
        "rkb", F.row_number().over(wb)
    )
    dens_a = (
        ranked.where(F.col("rka") <= k_neigh)
        .groupBy("a_id")
        .agg(F.avg("cos").alias("dens_a"))
    )
    dens_b = (
        ranked.where(F.col("rkb") <= k_neigh)
        .groupBy("b_id")
        .agg(F.avg("cos").alias("dens_b"))
    )
    m = (
        pairs.join(dens_a, "a_id")
        .join(dens_b, "b_id")
        .withColumn(
            "margin",
            F.round(F.col("cos") / ((F.col("dens_a") + F.col("dens_b")) / 2), 6),
        )
    )
    wfa = Window.partitionBy("a_id").orderBy(F.col("margin").desc(), F.col("b_id").asc())
    wfb = Window.partitionBy("b_id").orderBy(F.col("margin").desc(), F.col("a_id").asc())
    best = m.withColumn("fwd", F.row_number().over(wfa)).withColumn(
        "bwd", F.row_number().over(wfb)
    )
    return best.where(F.col("fwd") == 1).select(
        "a_id", "b_id", "cos", "margin", (F.col("bwd") == 1).alias("mutual")
    )
