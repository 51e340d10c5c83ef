"""Streaming variants: equivalence with batch operators (SURVEY §2.8)."""

from __future__ import annotations

import pytest

from jcpg_spark.operators import calls, flow
from jcpg_spark.streaming import incremental as inc
from jcpg_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    # two parquet files = two potential micro-batches; maxFilesPerTrigger
    # forces the split so cross-batch state is exercised.
    base = str(tmp_path_factory.mktemp("stream"))
    t = synth_transcripts(spark, 6, skew=False).orderBy("conv_id", "turn_idx").persist()
    t.filter("turn_idx < 5").coalesce(1).write.mode("overwrite").parquet(base + "/b1")
    t.filter("turn_idx >= 5").coalesce(1).write.mode("overwrite").parquet(base + "/b2")
    # single dir with both files
    import shutil, glob, os

    merged = base + "/all"
    os.makedirs(merged, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(base + "/b*/part-*.parquet"))):
        shutil.copy(f, f"{merged}/file{i}.parquet")
    return merged, t


def test_streaming_call_triples_match_batch(spark, stream_dir):
    path, t = stream_dir
    stream = inc.stream_transcripts(spark, path)
    inc.run_to_memory(inc.streaming_call_triples(stream), "calls_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM calls_out").collect()}
    want = {tuple(r) for r in calls.call_triples(t).collect()}
    assert got == want


def test_streaming_sentence_triples_match_batch(spark, stream_dir):
    from jcpg_spark.operators import structural

    path, t = stream_dir
    stream = inc.stream_transcripts(spark, path)
    inc.run_to_memory(inc.streaming_sentence_triples(stream), "sent_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM sent_out").collect()}
    want = {tuple(r) for r in structural.sentence_triples(t).collect()}
    assert got == want and want


def test_streaming_flow_next_matches_batch_across_batches(spark, stream_dir):
    path, t = stream_dir
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(path)
    )
    inc.run_to_memory(inc.streaming_flow_next(stream), "flow_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM flow_out").collect()}
    want = {tuple(r) for r in flow.flow_next(t).collect()}
    assert got == want


def test_streaming_segment_triples_match_batch_across_batches(spark, stream_dir):
    """The stateful CDG/segment layer must emit exactly the batch
    segment_triples even when a conversation's turns span micro-batches
    (segment counter + last_role carried in state)."""
    path, t = stream_dir
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    inc.run_to_memory(inc.streaming_segment_triples(stream), "seg_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM seg_out").collect()}
    want = {tuple(r) for r in flow.segment_triples(t).collect()}
    assert got == want


def test_streaming_reference_triples_match_batch_across_batches(spark, stream_dir, dictionary):
    """The stateful reaching-def layer (per-(conv, entity) state) must
    emit exactly the batch ref.* triples even when an entity's def and its
    uses arrive in different micro-batches."""
    from jcpg_spark.operators import linking, mentions, references

    path, t = stream_dir
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    inc.run_to_memory(inc.streaming_reference_triples(stream, dictionary), "ref_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM ref_out").collect()}

    surfaces = [r["surface"] for r in dictionary.select("surface").distinct().collect()]
    m = mentions.detect_mentions(spark, t, surfaces)
    linked = linking.link_mentions(m, dictionary)
    want = {tuple(r) for r in references.reference_triples(linked).collect()}
    assert got == want
    assert any(p == "ref.use" for (_s, p, _d, _v, _c) in want)  # non-trivial fixture


def test_streaming_act_counts_runs(spark, stream_dir):
    path, t = stream_dir
    stream = inc.stream_transcripts(spark, path)
    # append-mode windowed aggregation only emits on watermark advance; use
    # availableNow + update-mode memory sink to observe counts.
    q = (
        inc.streaming_act_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("acts_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # rows may be withheld by the watermark in append mode; the assertion is
    # that the query runs and the schema is right.
    assert [f.name for f in spark.sql("SELECT * FROM acts_out").schema.fields] == [
        "w_start",
        "w_end",
        "role",
        "n",
    ]


def test_streaming_typed_segment_entries_match_batch_across_batches(spark, stream_dir):
    """failure_rx mode: the stateful layer must additionally emit the typed
    region-entry edges (cdg.enter_true/false/throws), matching the batch
    segment_triples + segment_entry_triples union even when the region
    boundary and its predecessor land in different micro-batches."""
    path, t = stream_dir
    rx = r"^tool output: no results"
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    inc.run_to_memory(inc.streaming_segment_triples(stream, failure_rx=rx), "segt_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM segt_out").collect()}
    want = {
        tuple(r)
        for r in flow.segment_triples(t)
        .unionByName(flow.segment_entry_triples(t, failure_rx=rx))
        .collect()
    }
    assert got == want


def test_streaming_canonicalize_matches_batch_cc(spark, stream_dir, dictionary):
    """foreachBatch incremental canonicalization must reach the same
    mapping + same_as set as batch connected_components over the full
    input, with alias turns spread across micro-batches."""
    from jcpg_spark.operators import canonicalize, linking, mentions
    from jcpg_spark.synth import gazetteer_pdf

    path, t = stream_dir
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    canon, q = inc.streaming_canonicalize(stream, dictionary)
    q.processAllAvailable()
    q.stop()

    surfaces = gazetteer_pdf()["surface"].tolist()
    linked = linking.link_mentions(mentions.detect_mentions(spark, t, surfaces), dictionary)
    pairs = canonicalize.alias_pairs(t, linked)
    batch_mapping, _rounds, conv = canonicalize.connected_components(pairs)
    assert conv
    want = {(r.entity, r.canonical_id) for r in batch_mapping.collect()}
    got = set(canon.mapping().items())
    assert got == want
    want_sa = {tuple(r) for r in canonicalize.same_as_triples(batch_mapping).collect()}
    got_sa = {tuple(r) for r in canon.same_as_triples_df().collect()}
    assert got_sa == want_sa


def test_streaming_dedup_exact_first_seen_per_fingerprint(spark, tmp_path):
    """Cross-batch exact dedup: duplicate texts (modulo whitespace/case)
    arriving in a later micro-batch are suppressed by the watermark state;
    every distinct normalized text survives exactly once."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows_b1 = [
        ("c1", 0, "user", "Hello  World", None, base),
        ("c1", 1, "assistant", "unique one", None, base),
    ]
    rows_b2 = [
        ("c2", 0, "user", "hello world", None, base),     # dup of b1 modulo norm
        ("c2", 1, "assistant", "unique two", None, base),
        ("c2", 2, "user", "unique two", None, base),      # intra-batch dup
    ]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    d = str(tmp_path / "dd")
    spark.createDataFrame(rows_b1, schema).coalesce(1).write.mode("overwrite").parquet(d)
    import glob, shutil, os
    spark.createDataFrame(rows_b2, schema).coalesce(1).write.mode("overwrite").parquet(d + "_b2")
    for i, f in enumerate(sorted(glob.glob(d + "_b2/part-*.parquet"))):
        shutil.copy(f, os.path.join(d, f"zz_file{i}.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    inc.run_to_memory(inc.streaming_dedup_exact(stream), "dedup_out")
    got = spark.sql("SELECT fp, text FROM dedup_out").collect()
    fps = [r["fp"] for r in got]
    assert len(fps) == len(set(fps)) == 3  # hello-world, unique-one, unique-two
    texts = {r["text"].lower().replace("  ", " ") for r in got}
    assert texts == {"hello world", "unique one", "unique two"}


def test_streaming_curation_equals_batch(spark, tmp_path):
    """The ingest-side curation verdicts must equal the batch filter chain
    row-for-row (the chain is stateless column algebra, so streamed
    micro-batches cannot change it)."""
    import datetime as dt

    from jcpg_spark.operators.curation import curation_decision
    from pyspark.sql import functions as F

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    long_ok = ("the quick brown fox jumps over one lazy dog and that "
               "is of course fine to read in the park today")
    rows = [
        ("c1", 0, "user", long_ok, None, base),
        ("c1", 1, "assistant", "too short", None, base),
        ("c2", 0, "user", "word " + "x" * 40 + " " + long_ok, None, base),
        ("c2", 1, "user", ("spam ham " * 30).strip(), None, base),
    ]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    d = str(tmp_path / "cur")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    inc.run_to_memory(inc.streaming_curation(stream), "cur_out")
    got = {(r["doc_id"], r["reason"], r["keep"])
           for r in spark.sql("SELECT * FROM cur_out").collect()}
    batch = spark.read.parquet(d).withColumn(
        "doc_id", F.concat_ws(":", F.col("conv_id"), F.col("turn_idx")))
    want = {(r["doc_id"], r["reason"], r["keep"])
            for r in curation_decision(batch).collect()}
    assert got == want
    reasons = {r[0]: r[1] for r in got}
    assert reasons["c1:0"] == "ok" and reasons["c1:1"] == "too_short"
    assert reasons["c2:0"] == "word_too_long" and reasons["c2:1"] == "repetitive"


def test_streaming_novelty_matches_batch_set_algebra(spark, stream_dir):
    """Theta-sketch novelty under streaming must equal exact set algebra
    below the retention threshold: per window, n_keys = |window texts|,
    n_novel = |window texts \\ reference texts| (complete-mode memory
    sink so the windowed sketch aggregation is observable)."""
    path, t = stream_dir
    # reference = the user turns; stream keys = every turn's text
    ref = t.where("role = 'user'").select("text")
    stream = inc.stream_transcripts(spark, path)
    out = inc.streaming_novelty(stream, ref, key="text", window="10 minutes")
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("novelty_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM novelty_out").collect()
    assert got, "windowed sketch aggregation produced no rows"
    ref_set = {r["text"] for r in ref.collect()}
    import datetime as dt

    for row in got:
        lo, hi = row["w_start"], row["w_end"]
        win = {
            r["text"]
            for r in t.collect()
            if lo <= r["ts"] < hi
        }
        assert row["n_keys"] == len(win), (lo, hi)
        assert row["n_novel"] == len(win - ref_set), (lo, hi)
        want = len(win - ref_set) / len(win) if win else 0.0
        assert abs(row["novelty"] - want) < 1e-12


def test_streaming_sft_pairs_match_batch_closed_prefix(spark, stream_dir):
    """The stateful SFT miner must emit exactly the batch pairs whose
    outcome turn has arrived (the final pair of a conversation stays
    pending — its ok label is not yet observable), with pairs and their
    outcome turns spanning micro-batches."""
    from pyspark.sql import functions as F

    from jcpg_spark.operators.curation import sft_pairs

    path, t = stream_dir
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    inc.run_to_memory(inc.streaming_sft_pairs(stream), "sft_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM sft_out").collect()}
    mx = t.groupBy("conv_id").agg(F.max("turn_idx").alias("mx"))
    want = {
        tuple(r)
        for r in sft_pairs(t)
        .join(mx, "conv_id")
        .filter(F.col("turn_idx") + 1 < F.col("mx"))
        .drop("mx")
        .collect()
    }
    assert got == want and want


def test_streaming_topic_segments_match_batch_exactly(spark, stream_dir):
    """No lookahead in the cohesion boundary rule, so the streaming
    segmentation equals the batch operator row-for-row across
    micro-batches — including the 6 dp HALF_UP rounding and the word-set
    state carried over the batch split."""
    from jcpg_spark.operators.flow import topic_segments

    path, t = stream_dir
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    inc.run_to_memory(inc.streaming_topic_segments(stream), "topic_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM topic_out").collect()}
    want = {tuple(r) for r in topic_segments(t).collect()}
    assert got == want and want


def test_driver_stream_canonical_equals_batch_cc_entry(spark):
    """The r5 driver entry kg_stream_canonical (foreachBatch incremental
    canonicalization over micro-batched alias-introduction turns derived
    from the documents chain graph) must emit exactly the batch
    a6_cc_islands mapping — same graph, same min-label rule — which is
    why the two entries share one exact SQL oracle."""
    from jcpg_spark.plans.driver_queries import (
        q_a6_cc_islands,
        q_kg_stream_canonical,
    )

    sf = "/root/testdata/sf0.001"
    got = {(r.doc_id, r.canonical_id)
           for r in q_kg_stream_canonical(spark, sf).collect()}
    want = {(r.doc_id, r.canonical_id)
            for r in q_a6_cc_islands(spark, sf).collect()}
    assert got == want and got
    # the chain graph actually merged something (non-trivial components)
    assert any(a != b for a, b in got)


def test_streaming_canonicalize_fused_ctx_matches_generic(spark, stream_dir, dictionary):
    """The static-ctx FUSED extractor (r6: one map-side pass per
    micro-batch against broadcast rank-1 dictionaries) must produce
    exactly the generic detect->link->alias_pairs path's mapping. The ctx
    here covers every (role, tool) the synth transcripts contain, plus an
    undeclared-context probe is exercised by leaving one role out."""
    path, t = stream_dir

    def run(ctx):
        stream = (
            spark.readStream.schema(t.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        canon, q = inc.streaming_canonicalize(stream, dictionary, ctx=ctx)
        q.processAllAvailable()
        q.stop()
        return canon.mapping()

    # generic (per-batch observed ctx)
    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    canon_g, qg = inc.streaming_canonicalize(stream, dictionary)
    qg.processAllAvailable()
    qg.stop()
    want = canon_g.mapping()

    # full-coverage static ctx
    full_ctx = t.select("role", "tool").distinct()
    assert run(full_ctx) == want

    # partial ctx: uncovered contexts fall back to the context-free winner
    # — must match link_mentions' own fallback semantics run in batch
    from jcpg_spark.operators import canonicalize as cz, linking, mentions
    from jcpg_spark.synth import gazetteer_pdf

    part_ctx = t.select("role", "tool").distinct().filter("role <> 'user'")
    got_part = run(part_ctx)
    surfaces = gazetteer_pdf()["surface"].tolist()
    linked = linking.link_mentions(
        mentions.detect_mentions(spark, t, surfaces), dictionary, ctx=part_ctx
    )
    pairs = cz.alias_pairs(t, linked)
    batch_mapping, _r, _c = cz.connected_components(pairs)
    want_part = {r.entity: r.canonical_id for r in batch_mapping.collect()}
    assert got_part == want_part
