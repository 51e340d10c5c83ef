"""Training-data curation operators: invariants beyond the DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from jcpg_spark.plans.driver_queries import (
    q_doc_chunks,
    q_doc_sample_hash,
    q_doc_split_assign,
)

SF = "/root/testdata/sf0.001"


def test_chunks_reassemble_to_normalized_text(spark):
    chunks = q_doc_chunks(spark, SF)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                    lambda s: s["chunk"],
                ),
            ).alias("rebuilt"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.trim("text") != "")
    norm = docs.select(
        "doc_id", F.regexp_replace(F.trim("text"), r"\s+", " ").alias("norm")
    )
    joined = rebuilt.join(norm, "doc_id")
    assert joined.filter(F.col("rebuilt") != F.col("norm")).count() == 0
    # token accounting: sum of chunk n_tokens == whitespace token count
    ws = docs.select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
    assert joined.join(ws, "doc_id").filter(F.col("total_tokens") != F.col("n")).count() == 0


def test_split_disjoint_exhaustive_and_stable(spark):
    split = q_doc_split_assign(spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert split.count() == n_docs  # exhaustive, one row per doc
    got = {r.split for r in split.select("split").distinct().collect()}
    assert got <= {"train", "val", "test"}
    # stable across invocations (hash-deterministic, no rand())
    a = {(r.doc_id, r.split) for r in split.collect()}
    b = {(r.doc_id, r.split) for r in q_doc_split_assign(spark, SF).collect()}
    assert a == b


def test_sample_is_subset_and_stable(spark):
    sample = {r.doc_id for r in q_doc_sample_hash(spark, SF).collect()}
    again = {r.doc_id for r in q_doc_sample_hash(spark, SF).collect()}
    assert sample == again
    all_ids = {
        r.doc_id for r in spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()
    }
    assert sample <= all_ids
    assert 0 < len(sample) < len(all_ids)


def test_pack_sequences_tile_contiguously(spark):
    from jcpg_spark.plans.driver_queries import q_doc_pack

    rows = q_doc_pack(spark, SF).collect()
    by_grp: dict[str, list] = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append(r)
    assert len(by_grp) == 16  # one stream per md5 hex digit
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: r["doc_id"])
        # concatenation invariant: each doc starts where the previous ended
        off = 0
        for r in rs:
            assert r["start_offset"] == off, (grp, r["doc_id"])
            assert r["seq_id"] == off // 64
            end = off + r["n_tokens"]
            want_cross = r["n_tokens"] > 0 and (end - 1) // 64 != off // 64
            assert r["crosses_boundary"] == want_cross
            off = end


def test_leakage_safe_split_never_straddles_pairs(spark):
    """The operator's whole contract: every near-dup pair (and transitively
    every dup cluster) lands in ONE split, while singleton docs keep their
    per-doc hash assignment."""
    from jcpg_spark.operators import dedup
    from jcpg_spark.plans.driver_queries import q_doc_split_assign

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = dedup.jaccard_pairs(docs, n=3, threshold=0.4).select("doc_a", "doc_b")
    split = dedup.leakage_safe_split(docs, pairs)
    straddle = (
        pairs.join(split.select(F.col("doc_id").alias("doc_a"),
                                F.col("split").alias("sa")), "doc_a")
        .join(split.select(F.col("doc_id").alias("doc_b"),
                           F.col("split").alias("sb")), "doc_b")
        .where(F.col("sa") != F.col("sb"))
    )
    assert straddle.count() == 0
    assert pairs.count() > 0  # the gate means something at this sf
    # singletons (docs in no pair) match the per-doc assigner exactly
    in_pair = pairs.select(F.col("doc_a").alias("doc_id")).unionByName(
        pairs.select(F.col("doc_b").alias("doc_id"))).distinct()
    per_doc = q_doc_split_assign(spark, sf).withColumnRenamed("split", "pd")
    diff = (
        split.join(in_pair, "doc_id", "left_anti")
        .join(per_doc, "doc_id")
        .where(F.col("split") != F.col("pd"))
    )
    assert diff.count() == 0


def test_compaction_plan_bin_bounds(spark):
    """Every packed bin's payload < target + partition's largest small file;
    big files are singleton bins; plan preserves every input row."""
    from jcpg_spark import io as jio

    target = 500
    files = spark.createDataFrame(
        [(i, "p", (i * 97) % 700 + 1) for i in range(200)],
        "file_id int, part string, size_bytes int",
    )
    plan = jio.compaction_plan(files, target, partition_cols=("part",))
    rows = plan.collect()
    assert len(rows) == 200
    big = [r for r in rows if r["size_bytes"] >= target]
    small = [r for r in rows if r["size_bytes"] < target]
    # big files: one per bin, all negative bin ids
    assert all(r["bin"] < 0 for r in big)
    assert len({r["bin"] for r in big}) == len(big)
    # packed bins: payload bounded by target + max small size
    from collections import defaultdict

    tot = defaultdict(int)
    for r in small:
        assert r["bin"] >= 0
        tot[r["bin"]] += r["size_bytes"]
    max_small = max(r["size_bytes"] for r in small)
    assert all(v < target + max_small for v in tot.values())
    # cumulative-sum sharding leaves no empty bin below the max bin id
    assert set(tot) == set(range(max(tot) + 1))


def test_boilerplate_requires_cross_group_repetition(spark):
    from jcpg_spark.operators.dedup import boilerplate_texts

    docs = spark.createDataFrame(
        [
            # same normalized text under two sources -> boilerplate
            (1, "All  Rights Reserved ", "web"),
            (2, "all rights reserved", "books"),
            (3, "all rights reserved", "web"),
            # repeated, but only within one source -> NOT boilerplate
            (4, "chapter one", "books"),
            (5, "chapter one", "books"),
            # unique text -> not boilerplate
            (6, "the actual content", "web"),
        ],
        "doc_id long, text string, source string",
    )
    rows = boilerplate_texts(docs, min_groups=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["canonical_doc_id"], r["n_groups"], r["n_docs"]) == (1, 2, 3)


def test_boilerplate_spans_cross_group_only(spark):
    from jcpg_spark.operators.dedup import boilerplate_spans

    docs = spark.createDataFrame(
        [
            (1, "all rights reserved by the author", "web"),
            (2, "content all rights reserved by me", "books"),
            (3, "totally unrelated text goes right here", "web"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["shingle"]: (r["n_groups"], r["n_docs"]) for r in
           boilerplate_spans(docs, n=3, min_groups=2).collect()}
    # the 3-grams shared by docs 1 and 2 (different sources), and only those
    assert got == {"all rights reserved": (2, 2), "rights reserved by": (2, 2)}


def test_bigram_lm_scores_closed_form(spark):
    """Hand-computed add-0.5 bigram model over a 3-doc corpus; the
    repeated-pattern doc must outscore the one-off word sequence."""
    import math

    from jcpg_spark.operators.lm import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c a")],
        "doc_id long, text string",
    )
    # corpus bigrams: (a,b) x3 [doc1 twice, doc2 once], (b,a) x1, (c,a) x1
    # prefix counts: a->4? no: c(a,.) = 3 [(a,b) x3]; c(b,.) = 1; c(c,.) = 1
    # V = distinct successors {b, a} = 2
    def p(cb, cu):
        return math.log((cb + 0.5) / (cu + 0.5 * 2))

    exp = {
        1: (2 * p(3, 3) + 1 * p(1, 1)) / 3,  # (a,b) n=2, (b,a) n=1
        2: p(3, 3),
        3: p(1, 1),
    }
    got = {r["doc_id"]: r["lm_score"] for r in bigram_lm_scores(docs).collect()}
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-12, d
    assert got[2] > got[3]  # the corpus-dominant bigram scores higher


def test_bigram_lm_scores_partitioning_invariant(spark):
    from jcpg_spark.operators.lm import bigram_lm_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {(r["doc_id"], round(r["lm_score"], 9))
         for r in bigram_lm_scores(docs.repartition(1)).collect()}
    b = {(r["doc_id"], round(r["lm_score"], 9))
         for r in bigram_lm_scores(docs.repartition(13)).collect()}
    assert a == b


def test_curation_decision_rule_precedence(spark):
    from jcpg_spark.operators.curation import curation_decision

    long_ok = ("the quick brown fox jumps over one lazy dog and that "
               "is of course fine to read in the park today")
    docs = spark.createDataFrame(
        [
            (1, "too few words"),                                   # too_short
            (2, "the " + "x" * 40 + " " + long_ok),                 # word_too_long
            (3, "the cat sat " * 20),                               # repetitive
            (4, "zz yy xx ww vv uu tt ss rr qq pp oo nn"),          # lang_unknown
            (5, long_ok),                                           # ok
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["reason"], r["keep"]) for r in
           curation_decision(docs).collect()}
    assert got == {
        1: ("too_short", False),
        2: ("word_too_long", False),
        3: ("repetitive", False),
        4: ("lang_unknown", False),
        5: ("ok", True),
    }


def test_class_centroids_closed_form(spark):
    from jcpg_spark.operators.similarity import class_centroids

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [3.0, 2.0], 0),
            (3, [10.0, -4.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {(r["label"], r["pos"]): r["c"] for r in class_centroids(emb).collect()}
    assert got == {(0, 0): 2.0, (0, 1): 1.0, (1, 0): 10.0, (1, 1): -4.0}


def test_dsir_weights_closed_form(spark):
    """Hand-computed DSIR log-likelihood ratio on a 3-doc corpus where the
    target register repeats (a,b): the target-looking doc must carry the
    highest weight, and a bigram unseen by the target model must score the
    smoothed floor (coalesced zero counts), not drop out."""
    import math

    from pyspark.sql import functions as F

    from jcpg_spark.operators.lm import dsir_weights

    docs = spark.createDataFrame(
        [(1, "a b a b", "en"), (2, "a b", "en"), (3, "c a b a", "fr")],
        "doc_id long, text string, lang string",
    )
    # raw bigrams: (a,b) x4 [d1 x2, d2, d3], (b,a) x2 [d1, d3], (c,a) x1 [d3]
    #   cu_r: a->4, b->2, c->1; V_r = |{b, a}| = 2
    # target (en) bigrams: (a,b) x3, (b,a) x1; cu_t: a->3, b->1; V_t = 2
    def lp(cb, cu, v):
        return math.log((cb + 0.5) / (cu + 0.5 * v))

    llr = {
        ("a", "b"): lp(3, 3, 2) - lp(4, 4, 2),
        ("b", "a"): lp(1, 1, 2) - lp(2, 2, 2),
        ("c", "a"): lp(0, 0, 2) - lp(1, 1, 2),  # unseen by target: floor
    }
    exp = {
        1: (2 * llr[("a", "b")] + llr[("b", "a")]) / 3,
        2: llr[("a", "b")],
        3: (llr[("a", "b")] + llr[("b", "a")] + llr[("c", "a")]) / 3,
    }
    got = {r["doc_id"]: r["dsir_weight"] for r in
           dsir_weights(docs, F.col("lang") == "en").collect()}
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-12, d
    # the doc containing the target-unseen bigram is pulled below the pure
    # target-register docs
    assert got[3] < got[2]


def test_dsir_weights_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from jcpg_spark.operators.lm import dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {(r["doc_id"], round(r["dsir_weight"], 9))
         for r in dsir_weights(docs.repartition(1), F.col("lang") == "en").collect()}
    b = {(r["doc_id"], round(r["dsir_weight"], 9))
         for r in dsir_weights(docs.repartition(13), F.col("lang") == "en").collect()}
    assert a == b


def test_scrub_boilerplate_spans_closed_form(spark):
    """Docs from two sources sharing a 5-gram license span: the span is
    excised from both (positional union under overlap), the unique tails
    survive in order, sub-5-word docs pass through whole, and a doc that
    is pure boilerplate comes back as the empty string."""
    from jcpg_spark.operators.dedup import scrub_boilerplate_spans

    lic = "all rights reserved by law"
    docs = spark.createDataFrame(
        [
            (1, f"{lic} alpha beta", "s1"),
            (2, f"gamma {lic} delta", "s2"),
            (3, lic, "s3"),
            (4, "tiny doc", "s4"),
            (5, "completely unrelated words here now", "s5"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in
           scrub_boilerplate_spans(docs, n=5).collect()}
    assert got[1] == ("alpha beta", 5)
    assert got[2] == ("gamma delta", 5)
    assert got[3] == ("", 5)
    assert got[4] == ("tiny doc", 0)
    assert got[5] == ("completely unrelated words here now", 0)


def test_scrub_boilerplate_spans_overlap_union(spark):
    """Two flagged overlapping 5-grams (a 6-word shared span) remove the
    6-position union once, not 10 positions."""
    from jcpg_spark.operators.dedup import scrub_boilerplate_spans

    span6 = "one two three four five six"
    docs = spark.createDataFrame(
        [
            (1, f"{span6} keepme", "s1"),
            (2, f"{span6} other", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in
           scrub_boilerplate_spans(docs, n=5).collect()}
    assert got[1] == ("keepme", 6)
    assert got[2] == ("other", 6)


def test_temperature_mix_flattens_and_caps(spark):
    """alpha=1/2 semantics: expected share proportional to sqrt(n_g) —
    minority groups keep a HIGHER fraction than the head group; rates
    never exceed 1; output is a subset keyed by the doc_id uniform; and
    the whole decision is partitioning-invariant (deterministic hash)."""
    from jcpg_spark.operators.curation import temperature_mix

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = temperature_mix(docs)
    rates = {r["grp"]: r["rate"] for r in out.select("grp", "rate").distinct().collect()}
    counts = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(rates) <= set(counts)
    assert all(0.0 < v <= 1.0 for v in rates.values())
    # tilt direction: the biggest group gets the smallest acceptance rate,
    # and rates order inversely with group size (r_g proportional to 1/sqrt(n_g))
    by_size = sorted(rates, key=lambda g: counts[g])
    assert rates[by_size[0]] == max(rates.values())
    assert rates[by_size[-1]] == min(rates.values())
    for small, big in zip(by_size, by_size[1:]):
        if counts[small] < counts[big]:
            assert rates[small] >= rates[big]
    # kept set is identical under a different partitioning
    out2 = temperature_mix(docs.repartition(7, "lang"))
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in out2.select("doc_id").collect()}
    assert ids == ids2
    # expected-count accounting: sum over groups of rate*n_g is within
    # rounding slack of the integer target T = floor(N * 0.25)
    n_total = sum(counts.values())
    expect = sum(rates[g] * counts[g] for g in rates)
    target = n_total * 250_000 // 1_000_000
    # capped groups can only LOWER the realized total vs T
    assert expect <= target + len(rates)
    assert expect > 0.5 * target


def test_corpus_build_funnel_consistent_with_standalone_ops(spark):
    """The one-call funnel must agree stage-by-stage with the standalone
    operators it composes: filtered == curation_decision's drops,
    duplicate == non-canonical curated docs, contaminated == contamination
    hits among canonicals, kept == temperature_mix over the survivors.
    Also: the ledger covers every train doc exactly once."""
    from jcpg_spark.operators.curation import (
        corpus_build,
        curation_decision,
        temperature_mix,
    )
    from jcpg_spark.operators.decontaminate import contamination

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "f"
    train, evald = docs.where(~is_eval), docs.where(is_eval)

    ledger = corpus_build(train, evald)
    rows = {r["doc_id"]: r["stage"] for r in ledger.collect()}
    assert len(rows) == train.count()  # total coverage, one row per doc

    verdict = {r["doc_id"]: r["reason"] for r in curation_decision(train).collect()}
    assert {d for d, s in rows.items() if s.startswith("filtered:")} == {
        d for d, v in verdict.items() if v != "ok"
    }
    for d, s in rows.items():
        if s.startswith("filtered:"):
            assert s == f"filtered:{verdict[d]}"

    curated = train.where(
        F.col("doc_id").isin([d for d, v in verdict.items() if v == "ok"])
    )
    from jcpg_spark.functions.text import normalize_text

    canon = {
        r["m"]
        for r in curated.select(normalize_text(F.col("text")).alias("n"), "doc_id")
        .groupBy("n").agg(F.min("doc_id").alias("m")).collect()
    }
    assert {d for d, s in rows.items() if s == "duplicate"} == {
        d for d, v in verdict.items() if v == "ok" and d not in canon
    }

    cont = {r["doc_id"] for r in contamination(curated, evald, n=4).collect()}
    assert {d for d, s in rows.items() if s == "contaminated"} == canon & cont

    survivors = curated.where(
        F.col("doc_id").isin(list(canon - cont))
    )
    kept = {r["doc_id"] for r in temperature_mix(survivors).select("doc_id").collect()}
    assert {d for d, s in rows.items() if s == "kept"} == kept
    assert {d for d, s in rows.items() if s == "not_sampled"} == (canon - cont) - kept

    # partitioning invariance of the whole ledger
    ledger2 = corpus_build(train.repartition(7, "lang"), evald.repartition(3))
    rows2 = {r["doc_id"]: r["stage"] for r in ledger2.collect()}
    assert rows == rows2


def test_corpus_build_every_stage_fires_on_fixture(spark):
    """Handcrafted corpus where each disposition branch provably fires:
    every filter reason, a normalized-whitespace duplicate, an eval-4-gram
    contamination hit, and a mix split into kept + not_sampled."""
    from jcpg_spark.operators.curation import corpus_build

    filler = "the cat and the dog is in the house that runs fast"
    train = [
        (1, "en", filler),                                  # canonical survivor
        (2, "en", "  the cat and  the dog is in the house that runs   fast "),  # dup of 1
        (3, "en", "the cat"),                               # filtered:too_short
        (4, "en", "the dog is in the house and it has " + "a" * 40),  # word_too_long
        (5, "en", "the cat " * 6),                          # filtered:repetitive
        (6, "en", "zz qq ww rr tt yy uu ii oo pp kk jj"),   # filtered:lang_unknown
        (8, "en", "the dog is in that house with purple monkey dishwasher xylophone sounds"),  # contaminated
    ] + [
        (100 + i, "en" if i % 2 else "es",
         ("the bird and the fish is in the water that swims here alone no " if i % 2
          else "el gato y la casa de que los pajaros es aqui mismo hoy bien ") + f"num{i} extra")
        for i in range(12)
    ]
    evald = [(7, "purple monkey dishwasher xylophone noise from the benchmark slice here")]
    tdf = spark.createDataFrame(train, ["doc_id", "lang", "text"])
    edf = spark.createDataFrame(evald, ["doc_id", "text"])
    out = {r["doc_id"]: r["stage"] for r in corpus_build(tdf, edf, target_frac_ppm=500_000).collect()}
    assert out[2] == "duplicate"
    assert out[3] == "filtered:too_short"
    assert out[4] == "filtered:word_too_long"
    assert out[5] == "filtered:repetitive"
    assert out[6] == "filtered:lang_unknown"
    assert out[8] == "contaminated"
    survivors = {1, *range(100, 112)}
    assert {d for d, s in out.items() if s in ("kept", "not_sampled")} == survivors
    stages = set(out.values())
    assert "kept" in stages and "not_sampled" in stages


def test_corpus_build_edge_inputs(spark):
    """Degenerate inputs must not crash or mislabel: an empty train side
    yields an empty ledger; a train side where every doc fails the filter
    yields only filtered:* rows (the mix stage sees zero survivors and
    must not divide by zero or drop rows); an empty eval side means no
    contamination stage fires but everything else proceeds."""
    from jcpg_spark.operators.curation import corpus_build

    schema = "doc_id long, lang string, text string"
    empty = spark.createDataFrame([], schema)
    evald = spark.createDataFrame([(9, "purple monkey dishwasher xylophone")],
                                  "doc_id long, text string")
    assert corpus_build(empty, evald).count() == 0

    all_bad = spark.createDataFrame([(1, "en", "too short"), (2, "es", "x y")], schema)
    out = {r["doc_id"]: r["stage"] for r in corpus_build(all_bad, evald).collect()}
    assert out == {1: "filtered:too_short", 2: "filtered:too_short"}

    ok_doc = "the cat and the dog is in the house that runs fast"
    train = spark.createDataFrame([(1, "en", ok_doc)], schema)
    no_eval = spark.createDataFrame([], "doc_id long, text string")
    out2 = {r["doc_id"]: r["stage"] for r in corpus_build(train, no_eval).collect()}
    assert set(out2.values()) <= {"kept", "not_sampled"}


# --- skipgram_counts (word2vec pair extraction) ---------------------------


def test_skipgram_counts_closed_form(spark):
    from jcpg_spark.operators.lm import skipgram_counts

    docs = spark.createDataFrame([(1, "aa bb cc")], "doc_id int, text string")
    got = {
        (r["w_center"], r["w_context"]): r["cnt"]
        for r in skipgram_counts(docs, window=1).collect()
    }
    assert got == {
        ("aa", "bb"): 1, ("bb", "aa"): 1, ("bb", "cc"): 1, ("cc", "bb"): 1,
    }
    got2 = {
        (r["w_center"], r["w_context"]): r["cnt"]
        for r in skipgram_counts(docs, window=2).collect()
    }
    assert got2 == {
        ("aa", "bb"): 1, ("bb", "aa"): 1, ("bb", "cc"): 1, ("cc", "bb"): 1,
        ("aa", "cc"): 1, ("cc", "aa"): 1,
    }


def test_skipgram_counts_symmetric_and_window_bounded(spark):
    from jcpg_spark.operators.lm import skipgram_counts

    docs = spark.createDataFrame(
        [(1, "aa bb aa bb aa"), (2, "bb cc dd bb cc")],
        "doc_id int, text string",
    )
    rows = skipgram_counts(docs, window=2).collect()
    got = {(r["w_center"], r["w_context"]): r["cnt"] for r in rows}
    # symmetry holds pair-by-pair
    for (c, x), n in got.items():
        assert got[(x, c)] == n, (c, x)
    # brute force on the python side
    import re
    from collections import Counter

    want = Counter()
    for _, text in [(1, "aa bb aa bb aa"), (2, "bb cc dd bb cc")]:
        ws = re.findall(r"[a-z]+", text.lower())
        for i, w in enumerate(ws):
            for j in range(max(0, i - 2), min(len(ws), i + 3)):
                if j != i:
                    want[(w, ws[j])] += 1
    assert got == dict(want)
    # min_count prunes the tail
    pruned = {
        (r["w_center"], r["w_context"]): r["cnt"]
        for r in skipgram_counts(docs, window=2, min_count=3).collect()
    }
    assert pruned == {k: v for k, v in want.items() if v >= 3}


# --- corpus_profile_approx / zipf_fit (audit operators) -------------------


def test_corpus_profile_approx_accuracy_and_invariance(spark):
    import re
    from collections import defaultdict

    from jcpg_spark.operators.curation import corpus_profile_approx

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("lang", "source", "text").collect()
    exact = defaultdict(lambda: {"n": 0, "texts": set(), "toks": []})
    for r in rows:
        g = exact[(r["lang"], r["source"])]
        g["n"] += 1
        g["texts"].add(" ".join(r["text"].split()).lower())
        g["toks"].append(len(re.findall(r"\S+", r["text"])))
    prof = {
        (r["lang"], r["source"]): r
        for r in corpus_profile_approx(docs).collect()
    }
    assert set(prof) == set(exact)
    for key, g in exact.items():
        p = prof[key]
        assert p["n_docs"] == g["n"]
        assert p["total_tokens"] == sum(g["toks"])
        # HLL++ at rsd=0.05: allow 3 sigma
        assert abs(p["n_distinct_approx"] - len(g["texts"])) <= max(
            3, 0.15 * len(g["texts"])
        ), key
        toks = sorted(g["toks"])
        # percentile_approx returns an actual data value near the rank
        lo, hi = toks[max(0, int(0.4 * len(toks)) - 1)], toks[
            min(len(toks) - 1, int(0.6 * len(toks)))
        ]
        assert lo <= p["tok_p50"] <= hi, key
        assert p["tok_p50"] <= p["tok_p90"] <= p["tok_p99"]
    # sketches are merge-commutative: partitioning must not change results
    a = sorted(map(tuple, corpus_profile_approx(docs.repartition(1)).collect()))
    b = sorted(map(tuple, corpus_profile_approx(docs.repartition(7)).collect()))
    assert a == b


def test_zipf_fit_exact_power_law_and_python_twin(spark):
    import math

    from jcpg_spark.operators.curation import zipf_fit

    # counts 12/6/4/3 = 12/r for ranks 1..4: a PERFECT power law — slope
    # -1, intercept ln(12), r2 = 1 up to the 6dp rounding
    text = " ".join(["aa"] * 12 + ["bb"] * 6 + ["cc"] * 4 + ["dd"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = zipf_fit(docs, top_n=4).collect()[0]
    assert r["n_terms"] == 4
    assert r["slope"] == -1.0
    assert r["intercept"] == round(math.log(12.0), 6)
    assert r["r2"] == 1.0

    # arbitrary counts vs a python OLS twin (also exercises the tie-break:
    # bb and cc share count 5 and must rank alphabetically)
    counts = {"aa": 9, "bb": 5, "cc": 5, "dd": 2, "ee": 1}
    text2 = " ".join(w for w, n in counts.items() for _ in range(n))
    docs2 = spark.createDataFrame([(1, text2)], "doc_id int, text string")
    got = zipf_fit(docs2, top_n=5).collect()[0]
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(n) for _, n in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    cov = sum(x * y for x, y in zip(xs, ys)) - sx * sy / n
    varx = sum(x * x for x in xs) - sx * sx / n
    vary = sum(y * y for y in ys) - sy * sy / n
    assert got["n_terms"] == 5
    assert got["slope"] == round(cov / varx, 6)
    assert got["intercept"] == round((sy - cov / varx * sx) / n, 6)
    assert got["r2"] == round(cov * cov / (varx * vary), 6)


def test_ccnet_buckets_tiering(spark):
    """Within each language the head tier holds the highest (most fluent)
    lm scores and tiers are ntile-sized; a doc with <2 word tokens has no
    bigrams and is absent (bigram_lm_scores contract)."""
    from jcpg_spark.operators.lm import ccnet_buckets

    docs = spark.createDataFrame(
        [  # en: "a b" bigram is corpus-frequent -> fluent; rare pairs score low
            ("d1", "en", "a b a b a b"),
            ("d2", "en", "a b a b"),
            ("d3", "en", "a b zz qq"),
            ("d4", "en", "zz qq"),
            ("d5", "en", "qq zz"),
            ("d6", "en", "a b"),
            ("d7", "fr", "le chat le chat"),
            ("d8", "fr", "le chat"),
            ("d9", "fr", "chat le zz"),
            ("dx", "fr", "single"),  # one token: no bigram, absent
        ],
        "doc_id string, lang string, text string",
    )
    out = ccnet_buckets(docs, group_col="lang")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert "dx" not in rows
    en = [r for r in rows.values() if r["lang"] == "en"]
    assert sorted(r["bucket"] for r in en) == sorted(
        ["head", "head", "middle", "middle", "tail", "tail"]
    )
    # ntile(3) over 3 fr docs -> one per tier, ordered by score desc
    fr = sorted((r for r in rows.values() if r["lang"] == "fr"),
                key=lambda r: -r["lm_score"])
    assert [r["bucket"] for r in fr] == ["head", "middle", "tail"]
    # every head score >= every tail score within a language
    en_head = min(r["lm_score"] for r in en if r["bucket"] == "head")
    en_tail = max(r["lm_score"] for r in en if r["bucket"] == "tail")
    assert en_head >= en_tail


def test_corpus_overlap_exact_below_threshold(spark):
    """Theta-sketch overlap must equal exact set algebra below the
    2^lgk retention threshold — counts, jaccard, containment — and on
    shingle sets it must agree with a python set computation."""
    from jcpg_spark.operators.decontaminate import corpus_overlap
    from jcpg_spark.operators.dedup import word_shingles

    l = spark.createDataFrame([(w,) for w in "a b c d e f".split()], "text string")
    r = spark.createDataFrame([(w,) for w in "d e f g h".split()], "text string")
    row = corpus_overlap(l, r).collect()[0]
    assert (row["n_left"], row["n_right"], row["n_inter"], row["n_union"]) \
        == (6, 5, 3, 8)
    assert abs(row["jaccard"] - 3 / 8) < 1e-12
    assert abs(row["containment_left"] - 0.5) < 1e-12

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown cat sleeps under the lazy dog"),
        (2, "a completely different sentence with no shared grams here"),
        (3, "the quick brown fox naps beside the lazy dog"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    sh = word_shingles(docs, n=3)
    even = sh.where("doc_id % 2 = 0")
    odd = sh.where("doc_id % 2 = 1")
    got = corpus_overlap(even, odd, key="shingle").collect()[0]

    def grams(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    le = grams(texts[0][1]) | grams(texts[2][1])
    ro = grams(texts[1][1]) | grams(texts[3][1])
    assert (got["n_left"], got["n_right"], got["n_inter"], got["n_union"]) \
        == (len(le), len(ro), len(le & ro), len(le | ro))


def test_kn_bigram_scores_closed_form(spark):
    """Hand-computed interpolated Kneser-Ney (D=0.75) on a 2-doc corpus:
    cb = {(a,b):2, (b,a):1, (a,c):1}; cu(a)=3 fanout 2, cu(b)=1 fanout 1;
    continuation N1+ = 1 for each of a,b,c over 3 distinct bigrams."""
    import math

    from jcpg_spark.operators.lm import kn_bigram_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], ["doc_id", "text"]
    )
    p_b_a = (2 - 0.75) / 3 + 0.75 * 2 / 3 * (1 / 3)
    p_a_b = (1 - 0.75) / 1 + 0.75 * 1 / 1 * (1 / 3)
    p_c_a = (1 - 0.75) / 3 + 0.75 * 2 / 3 * (1 / 3)
    want = {
        1: (2 * math.log(p_b_a) + math.log(p_a_b)) / 3,
        2: math.log(p_c_a),
    }
    got = {r["doc_id"]: r["kn_score"] for r in kn_bigram_scores(docs).collect()}
    assert set(got) == {1, 2}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    # KN leaves every observed bigram with positive probability < 1
    assert all(v < 0 for v in got.values())


def test_sft_pairs_adjacency_and_outcome_label(spark):
    """user->assistant adjacency only; ok flips to False exactly when the
    turn after the response is a tool turn; a conversation-tail response
    has no observed outcome -> ok is null, matching the streaming twin's
    pending semantics; one exchange for the whole extraction."""
    from jcpg_spark.operators.curation import sft_pairs

    rows = [
        ("c", 0, "user", "ask a"),
        ("c", 1, "assistant", "do a"),     # next is tool -> ok False
        ("c", 2, "tool", "event error"),
        ("c", 3, "user", "ask b"),
        ("c", 4, "assistant", "do b"),     # next is user -> ok True
        ("c", 5, "user", "ask c"),         # answered at tail
        ("c", 6, "assistant", "do c"),     # no next turn -> outcome unknown
        ("d", 0, "user", "unanswered"),    # next is user -> no pair
        ("d", 1, "user", "also unanswered"),
    ]
    t = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = sft_pairs(t)
    got = {(r["conv_id"], r["turn_idx"]): (r["prompt"], r["response"], r["ok"])
           for r in out.collect()}
    assert got == {
        ("c", 0): ("ask a", "do a", False),
        ("c", 3): ("ask b", "do b", True),
        ("c", 5): ("ask c", "do c", None),
    }
    final_plan = (
        out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    )
    assert final_plan.count("Exchange hashpartitioning") == 1, final_plan


def test_k_anonymity_audit_and_suppression(spark):
    """Groups under k flag and suppress; null quasi values form their own
    group and suppress null-safely; non-quasi columns pass through."""
    from jcpg_spark.operators.curation import k_anonymity_audit, k_anonymize

    rows = (
        [(i, "en", "web", i * 10) for i in range(5)]          # safe group
        + [(10, "de", "web", 7)]                              # risky (n=1)
        + [(11, None, "web", 8), (12, None, "web", 9)]        # null group, n=2
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source", "payload"])
    audit = {(r["lang"], r["source"]): (r["n"], r["at_risk"])
             for r in k_anonymity_audit(df, ["lang", "source"], k=3).collect()}
    assert audit[("en", "web")] == (5, False)
    assert audit[("de", "web")] == (1, True)
    assert audit[(None, "web")] == (2, True)

    out = {r["doc_id"]: (r["lang"], r["source"], r["payload"])
           for r in k_anonymize(df, ["lang", "source"], k=3).collect()}
    assert out[0] == ("en", "web", 0)          # released
    assert out[10] == (None, None, 7)          # suppressed, payload intact
    assert out[11] == (None, None, 8)          # null group suppressed too
    assert len(out) == 8                       # no row duplication from the join


def test_sequence_transitions_and_typicality_closed_form(spark):
    """Transition probabilities and per-conv mean log-prob on a
    hand-built corpus: a->b twice, a->a once, b->a once => P(b|a)=2/3,
    P(a|a)=1/3, P(a|b)=1."""
    import math

    from jcpg_spark.operators.lm import sequence_transitions, sequence_typicality

    rows = [
        ("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "a"), ("c1", 3, "a"),
        ("c2", 0, "a"), ("c2", 1, "b"),
        ("c3", 0, "a"),                 # no transitions -> absent from scores
    ]
    t = spark.createDataFrame(rows, ["conv_id", "turn_idx", "cat"])
    m = {(r["cat"], r["nxt"]): (r["n"], r["n_cat"], r["p"])
         for r in sequence_transitions(t, "cat").collect()}
    assert m[("a", "b")] == (2, 3, round(2 / 3, 6))
    assert m[("a", "a")] == (1, 3, round(1 / 3, 6))
    assert m[("b", "a")] == (1, 1, 1.0)

    s = {r["conv_id"]: r["typicality"] for r in sequence_typicality(t, "cat").collect()}
    want_c1 = (math.log(2 / 3) + math.log(1.0) + math.log(1 / 3)) / 3
    assert abs(s["c1"] - want_c1) < 1e-9
    assert abs(s["c2"] - math.log(2 / 3)) < 1e-9
    assert "c3" not in s


def test_log_odds_drift_closed_form(spark):
    """Monroe log-odds on a 2-doc corpus, checked against a python twin;
    the A-exclusive word gets positive z, the B-exclusive negative, and
    the shared word's delta reflects only the size imbalance."""
    import math

    from jcpg_spark.operators.curation import log_odds_drift

    docs = spark.createDataFrame(
        [(1, "apple apple shared", "A"), (2, "banana shared shared", "B")],
        ["doc_id", "text", "source"],
    )
    out = {r["word"]: r for r in log_odds_drift(docs, group_a="A", alpha0=10.0).collect()}

    def twin(y_a, y_b, n_a, n_b, a0=10.0):
        a_w = a0 * (y_a + y_b) / (n_a + n_b)
        d = math.log((y_a + a_w) / (n_a + a0 - y_a - a_w)) - math.log(
            (y_b + a_w) / (n_b + a0 - y_b - a_w)
        )
        return d, d / math.sqrt(1 / (y_a + a_w) + 1 / (y_b + a_w))

    for word, (ya, yb) in {"apple": (2, 0), "banana": (0, 1), "shared": (1, 2)}.items():
        d, z = twin(ya, yb, 3, 3)
        assert out[word]["y_a"] == ya and out[word]["y_b"] == yb
        assert abs(out[word]["delta"] - round(d, 6)) < 1e-9, word
        assert abs(out[word]["z"] - round(z, 6)) < 1e-9, word
    assert out["apple"]["z"] > 0 > out["banana"]["z"]


def test_compression_ratio_matches_python_twin_and_ranks_repetition(spark):
    """Arrow-batched zlib ratio equals the per-row python computation
    exactly, repetitive text scores lower than prose, and empty text
    is null."""
    import zlib

    from jcpg_spark.functions.text import compression_ratio_udf

    prose = "the quick brown fox jumps over a lazy dog while seven wizards vex"
    loop = "spam ham " * 40
    docs = spark.createDataFrame(
        [(1, prose), (2, loop), (3, "   "), (4, None)], ["doc_id", "text"]
    )
    ratio = compression_ratio_udf()
    got = {r["doc_id"]: r["cr"] for r in docs.select("doc_id", ratio("text").alias("cr")).collect()}

    def twin(t):
        raw = t.encode("utf-8")
        return len(zlib.compress(raw, 6)) / len(raw)

    assert got[1] == twin(prose)
    assert got[2] == twin(loop)
    assert got[2] < got[1]          # repetition compresses away
    assert got[3] is None and got[4] is None


def test_weighted_sample_topk_aes_semantics(spark):
    """A-ES keys match the python twin (md5-uniform, ln(u)/w), exactly k
    rows per group come back, zero-weight rows are excluded, and the
    selection is deterministic across calls."""
    import hashlib
    import math

    from jcpg_spark.operators.curation import weighted_sample_topk

    rows = [(i, "g1" if i < 6 else "g2", float(i * 10 + 1)) for i in range(10)]
    rows.append((99, "g1", 0.0))   # zero weight: excluded
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "w"])
    out = weighted_sample_topk(docs, k=2, weight_col="w", group_col="lang")
    got = [(r["doc_id"], r["lang"], r["es_key"]) for r in out.collect()]
    assert len(got) == 4 and 99 not in {g[0] for g in got}
    assert {g[1] for g in got} == {"g1", "g2"}

    def twin(doc_id, w):
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16) / 16**13
        return math.log(max(u, 2.0 ** -52)) / w

    keys = {(i, g): twin(i, w) for i, g, w in rows if w > 0}
    for grp in ("g1", "g2"):
        want = sorted(
            (k for (i, g), k in keys.items() if g == grp), reverse=True
        )[:2]
        have = sorted((k for i, g, k in got if g == grp), reverse=True)
        assert have == [round(w, 6) for w in want], grp

    again = [(r["doc_id"], r["lang"], r["es_key"])
             for r in weighted_sample_topk(docs, k=2, weight_col="w", group_col="lang").collect()]
    assert sorted(again) == sorted(got)


def test_ks_statistic_closed_form(spark):
    """Hand-computed D on discrete samples: A = {1,2,3}, B = {3,4,5,6}
    -> CDF gaps 1/3 (x=1), 2/3 (x=2), 3/4 (x=3, the max), ...; identical
    distributions give D = 0."""
    from jcpg_spark.operators.curation import ks_statistic

    rows = [(1, "A"), (2, "A"), (3, "A"), (3, "B"), (4, "B"), (5, "B"), (6, "B")]
    d = spark.createDataFrame(rows, ["n", "grp"])
    r = ks_statistic(d, "n", group_a="A", group_col="grp").first()
    assert (r["n_a"], r["n_b"]) == (3, 4)
    assert r["ks"] == 0.75 and r["at_value"] == 3

    same = spark.createDataFrame(
        [(1, "A"), (2, "A"), (1, "B"), (2, "B")], ["n", "grp"]
    )
    r2 = ks_statistic(same, "n", group_a="A", group_col="grp").first()
    assert r2["ks"] == 0.0 and r2["at_value"] == 1


def test_absorbing_expected_steps_closed_form(spark):
    """Hand-solved chain: a->b (1.0), b->error (0.5), b->a (0.5) gives
    t_b = 3, t_a = 4; a state with no path to the absorber gets null."""
    from jcpg_spark.operators.lm import absorbing_expected_steps

    rows = [
        ("a", "b", 2, 2, 1.0),
        ("b", "error", 1, 2, 0.5),
        ("b", "a", 1, 2, 0.5),
        ("z", "z", 1, 1, 1.0),          # closed: never reaches error
    ]
    tr = spark.createDataFrame(rows, ["cat", "nxt", "n", "n_cat", "p"])
    got = {r["cat"]: r["expected_steps"]
           for r in absorbing_expected_steps(tr, "error").collect()}
    assert got["a"] == 4.0 and got["b"] == 3.0
    assert got["z"] is None


def test_absorbing_expected_steps_leaky_state_is_null(spark):
    """A state that CAN reach the absorber but can also fall into a
    non-reaching closed class has absorption probability < 1, so its
    expectation is infinite -> null (dropping the leak from the (I-Q)
    solve would condition on absorption and report 1.0). The doomed
    closure also propagates backwards through pure predecessors."""
    from jcpg_spark.operators.lm import absorbing_expected_steps

    rows = [
        ("A", "X", 1, 2, 0.5),
        ("A", "B", 1, 2, 0.5),
        ("B", "B", 1, 1, 1.0),          # trap: never reaches X
        ("P", "A", 1, 1, 1.0),          # pure predecessor of the leaky A
        ("C", "X", 1, 1, 1.0),          # clean: absorbs surely in 1 step
    ]
    tr = spark.createDataFrame(rows, ["cat", "nxt", "n", "n_cat", "p"])
    got = {r["cat"]: r["expected_steps"]
           for r in absorbing_expected_steps(tr, "X").collect()}
    assert got["A"] is None            # advice case: was 1.0
    assert got["P"] is None            # doomed through A
    assert got["B"] is None
    assert got["C"] == 1.0
