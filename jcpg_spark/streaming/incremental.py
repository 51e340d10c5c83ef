"""Incremental (Structured Streaming) variants of the triple extractors.

SURVEY §2.8: the reference is strictly batch; north_rule imposes no
streaming obligation, but the operators were deliberately designed so an
incremental variant drops in — stateless layers are identical plans under
``readStream``, and the only stateful layer (flow threading needs the
previous turn) carries one tiny state row per conversation via
``applyInPandasWithState``.

Ordering assumption (documented contract): turns of a conversation arrive
in non-decreasing ``turn_idx`` order across micro-batches (true for
append-only transcript logs). Within a batch, rows are sorted before
linking, so intra-batch disorder is tolerated.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from jcpg_spark import schema as S


def stream_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(S.TRANSCRIPT_SCHEMA).parquet(path)


def streaming_call_triples(stream: DataFrame) -> DataFrame:
    """Stateless: identical plan to calls.call_triples, just under
    readStream (filter + projection; no shuffle, no state)."""
    from jcpg_spark.operators.calls import call_triples

    return call_triples(stream)


def streaming_sentence_triples(stream: DataFrame) -> DataFrame:
    """Stateless: the within-turn sentence layer (r4) is a per-turn
    projection (JVM split+posexplode), so it streams with zero state —
    identical plan to structural.sentence_triples under readStream."""
    from jcpg_spark.operators.structural import sentence_triples

    return sentence_triples(stream)


def streaming_act_counts(stream: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Watermarked windowed speaker-act counts (late data tolerated 10m)."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "role",
            "n",
        )
    )


def streaming_dedup_exact(stream: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Streaming ingest dedup: keep the first-seen row per normalized-text
    fingerprint within the watermark horizon
    (``dropDuplicatesWithinWatermark`` keyed on the md5 of the normalized
    text — the batch analog is ``dedup.exact_duplicates``). State is
    bounded: a key is dropped once the watermark passes ``delay`` beyond
    its event time, so an unbounded stream holds only the horizon's keys —
    the standard exactly-once ingest-dedup shape for a 10^12-turn feed."""
    from jcpg_spark.functions.text import fingerprint_md5

    return (
        stream.withColumn("fp", fingerprint_md5(F.col("text")))
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["fp"])
    )


_FLOW_OUT = "src string, pred string, dst string, var string, conv_id string"
_FLOW_STATE = "last_idx int"


def _flow_fn(key, pdf_iter, state: GroupState):
    (conv_id,) = key
    last_idx = state.get[0] if state.exists else None
    out_src, out_dst = [], []
    for pdf in pdf_iter:
        for idx in sorted(pdf["turn_idx"].tolist()):
            if last_idx is not None:
                out_src.append(f"t:{conv_id}:{last_idx}")
                out_dst.append(f"t:{conv_id}:{idx}")
            last_idx = idx
    if last_idx is not None:
        state.update((int(last_idx),))
    if out_src:
        yield pd.DataFrame(
            {
                "src": out_src,
                "pred": "flow.next",
                "dst": out_dst,
                "var": None,
                "conv_id": conv_id,
            }
        )


def streaming_flow_next(stream: DataFrame) -> DataFrame:
    """Stateful flow threading: one state row (last turn idx) per
    conversation; emits (prev, 'flow.next', current) as turns arrive.
    The streaming analog of the batch lag window (W1)."""
    return (
        stream.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _flow_fn,
            outputStructType=_FLOW_OUT,
            stateStructType=_FLOW_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_SEG_STATE = "last_role string, seg int, last_tool string, last_idx int, last_failing boolean"


def _seg_fn(key, pdf_iter, state: GroupState):
    (conv_id,) = key
    last_role, seg, last_tool, last_idx, last_failing = (
        state.get if state.exists else (None, -1, None, None, None)
    )
    typed = False
    out = {"src": [], "pred": [], "dst": [], "var": []}

    def emit(src, pred, dst, var=None):
        out["src"].append(src)
        out["pred"].append(pred)
        out["dst"].append(dst)
        out["var"].append(var)

    for pdf in pdf_iter:
        typed = "failing" in pdf.columns
        cols = [pdf["turn_idx"].tolist(), pdf["role"].tolist()]
        if typed:
            cols += [pdf["tool"].tolist(), pdf["failing"].tolist()]
        else:
            cols += [[None] * len(pdf), [None] * len(pdf)]
        for idx, role, tool, failing in sorted(zip(*cols), key=lambda r: r[0]):
            brk = last_role is None or (role == "user" and last_role != "user")
            if brk:
                seg += 1
                if seg > 0:
                    emit(f"seg:{conv_id}:{seg - 1}", "cdg.follows", f"seg:{conv_id}:{seg}")
                    if typed:
                        # typed region entry from the predecessor (batch
                        # analog: flow.segment_entry_triples / the fused
                        # emitter's failure_rx kinds)
                        if last_role == "assistant" and isinstance(last_tool, str):
                            emit(
                                f"t:{conv_id}:{last_idx}", "cdg.enter_false",
                                f"seg:{conv_id}:{seg}", last_tool,
                            )
                        elif last_role == "tool":
                            pred = "cdg.enter_throws" if last_failing else "cdg.enter_true"
                            emit(f"t:{conv_id}:{last_idx}", pred, f"seg:{conv_id}:{seg}")
            emit(f"t:{conv_id}:{idx}", "cdg.in_segment", f"seg:{conv_id}:{seg}")
            last_role, last_tool, last_idx = role, tool, int(idx)
            last_failing = bool(failing) if failing is not None else None
    state.update((last_role, int(seg), last_tool, last_idx, last_failing))
    if out["src"]:
        yield pd.DataFrame(
            {
                "src": out["src"],
                "pred": out["pred"],
                "dst": out["dst"],
                "var": out["var"],
                "conv_id": conv_id,
            }
        )


def streaming_segment_triples(stream: DataFrame, failure_rx: str | None = None) -> DataFrame:
    """Stateful CDG/segment layer: one tiny state row per conversation
    (last role/tool/idx/failing + segment counter); emits cdg.in_segment
    per arriving turn and cdg.follows when a user turn re-takes the floor
    — the streaming analog of the batch running-boundary-sum window
    (flow.segment_triples), identical output under the ordered-arrival
    contract (pytest-gated across micro-batches).

    ``failure_rx`` additionally emits the TYPED region-entry edges
    (cdg.enter_true/enter_false/enter_throws — the batch
    flow.segment_entry_triples analog); the regex is evaluated map-side
    into a boolean before the stateful shuffle, same as the batch plan.
    """
    cols = ["conv_id", "turn_idx", "role"]
    src = stream
    if failure_rx is not None:
        src = stream.withColumn("failing", F.col("text").rlike(failure_rx))
        cols += ["tool", "failing"]
    return (
        src.select(*cols)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _seg_fn,
            outputStructType=_FLOW_OUT,
            stateStructType=_SEG_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_REF_STATE = "seen int, last_def string"


def _ref_fn(key, pdf_iter, state: GroupState):
    """Stateful reaching-definition per (conv_id, canonical): state carries
    (seen-any-turn, last def turn node). Mirrors references.reference_triples
    turn-rollup semantics exactly (intro rule, kill-at-redef, self-flow)."""
    conv_id, canonical = key
    seen, last_def = (state.get if state.exists else (0, None))
    out = {"src": [], "pred": [], "dst": []}
    rows = []
    for pdf in pdf_iter:
        rows.extend(
            zip(pdf["turn_idx"].tolist(), pdf["ordinal"].tolist(), pdf["defs_state"].tolist())
        )
    rows.sort()
    from itertools import groupby

    for turn_idx, grp in groupby(rows, key=lambda r: r[0]):
        ms = list(grp)
        n_mentions = len(ms)
        n_def = sum(1 for _t, _o, d in ms if d)
        first_def_state = bool(ms[0][2])
        if not seen and not first_def_state:
            n_def += 1  # intro rule: entity's first turn's first mention
        seen = 1
        has_def, has_use = n_def > 0, n_mentions > n_def
        turn = f"t:{conv_id}:{turn_idx}"
        if has_use and not has_def and last_def is not None:
            out["src"].append(last_def); out["pred"].append("ref.use"); out["dst"].append(turn)
        if has_def and last_def is not None:
            out["src"].append(last_def); out["pred"].append("ref.redef"); out["dst"].append(turn)
        if has_def and has_use:
            out["src"].append(turn); out["pred"].append("ref.self"); out["dst"].append(turn)
        if has_def:
            last_def = turn
    state.update((seen, last_def))
    if out["src"]:
        yield pd.DataFrame(
            {
                "src": out["src"],
                "pred": out["pred"],
                "dst": out["dst"],
                "var": canonical,
                "conv_id": conv_id,
            }
        )


def streaming_reference_triples(
    stream: DataFrame,
    dictionary: DataFrame,
    roles: tuple[str, ...] = ("user", "assistant", "tool"),
    tools: tuple[str | None, ...] | None = None,
) -> DataFrame:
    """Incremental DDG layer: detect mentions (stateless mapInPandas), link
    against the broadcast dictionary with a STATIC context table (the
    stream side cannot run distinct()), then a stateful reaching-def pass
    keyed (conv_id, canonical) with one tiny state row per live entity —
    the streaming analog of the batch as-of window in
    references.reference_triples, pytest-gated batch-equivalent across
    micro-batches under the ordered-arrival contract.

    The static context is derived from DECLARED vocabulary, not synth
    constants: ``roles`` is the closed role set of the transcript data
    model (input_hint), and ``tools`` defaults to the dictionary's
    tool-kind namespaces (+ None for tool-less turns). A streamed mention
    whose (role, tool) still falls outside the static table is NOT dropped
    — ``link_mentions`` falls back to the context-free best candidate for
    its surface, so an undeclared tool degrades ranking (no +0.3 context
    bonus), never recall.
    """
    from jcpg_spark.operators import linking, mentions

    spark = stream.sparkSession
    surfaces = [r["surface"] for r in dictionary.select("surface").distinct().collect()]
    m = mentions.detect_mentions(spark, stream, surfaces)
    if tools is None:
        tool_rows = (
            dictionary.filter(F.col("kind") == "tool")
            .select("namespace")
            .distinct()
            .collect()
        )
        tools = (None, *sorted(r["namespace"] for r in tool_rows if r["namespace"]))
    ctx = spark.createDataFrame(
        [(r, t) for r in roles for t in tools], "role string, tool string"
    )
    linked = linking.link_mentions(m, dictionary, ctx=ctx)
    return (
        linked.select("conv_id", "canonical", "turn_idx", "ordinal", "defs_state")
        .groupBy("conv_id", "canonical")
        .applyInPandasWithState(
            _ref_fn,
            outputStructType=_FLOW_OUT,
            stateStructType=_REF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str):
    """Drive a streaming query over all available input synchronously
    (local smoke-test harness; memory sink)."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


class IncrementalCanonicalizer:
    """Streaming entity canonicalization — the one stage SURVEY §2.8 had
    declared out of scope, made incremental here.

    Key observation: alias-pair EXTRACTION is turn-local (one
    'introducing X as Y' turn asserts one co-reference pair — see
    canonicalize.alias_pairs), so micro-batches need no cross-batch state
    for it; only the union-find over canonical ENTITIES accumulates. That
    state is dictionary-bounded by contract (canonicals come from the
    broadcast candidate dictionary), so it is driver-resident by the same
    argument as the reference's in-memory maps and the batch path's
    bytes-gated driver union-find (canonicalize.connected_components).

    Merge rule matches the batch CC exactly: min-label roots, so after any
    prefix of batches the mapping equals connected_components over the
    union of all pairs seen so far (pytest-gated batch equivalence).
    """

    def __init__(
        self, spark: SparkSession, dictionary: DataFrame, ctx: DataFrame | None = None
    ):
        from jcpg_spark.caching import swap_persist
        from jcpg_spark.operators import linking, mentions

        self._mentions = mentions
        self._linking = linking
        self.spark = spark
        # the dictionary plan is re-executed by EVERY micro-batch's linking
        # crossJoin (it may itself be a derived plan with its own scan and
        # exchanges); persist it for the canonicalizer's lifetime — the
        # surfaces collect below doubles as the materializing action.
        self.dictionary = swap_persist("incremental_canonicalizer.dictionary", dictionary)
        self.surfaces = [
            r["surface"] for r in self.dictionary.select("surface").distinct().collect()
        ]
        # static-context fast path (link_mentions' own streaming contract):
        # with a declared ctx the dictionary-side rank-1 tables are
        # DICTIONARY-sized, so they are collected once and broadcast into a
        # fused per-batch extractor (detection + linking + per-turn pair
        # collapse in ONE mapInPandas pass — no join, no exchange, no
        # per-batch AQE stage jobs; a micro-batch job is a single map
        # stage + driver collect). Identical pair semantics to
        # detect_mentions -> link_mentions -> alias_pairs, pytest-gated
        # (test_streaming fused-vs-generic equivalence); uncovered
        # contexts fall back to the context-free winner, mirroring
        # _apply_link's anti-join arm.
        self._best_ctx: dict | None = None
        self._best0: dict | None = None
        if ctx is not None:
            self._best_ctx = {
                (r["surface"], r["role"], r["_tool_key"]): r["canonical"]
                for r in linking._context_best(self.dictionary, ctx).collect()
            }
            self._best0 = {
                r["surface"]: r["canonical"]
                for r in linking._surface_best(self.dictionary).collect()
            }
        self.parent: dict[str, str] = {}

    def _find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def _fused_pairs(self, transcripts_batch: DataFrame) -> set:
        """Static-ctx fast path: one map-side pandas pass per micro-batch
        computing detection + linking + the per-turn (first, second) pair
        collapse, against the broadcast rank-1 dictionaries. Mirrors
        detect_mentions -> _apply_link -> alias_pairs exactly: intro-flag
        filter (INTRO_RX search), mentions in regex scan order, context hit
        -> context-free fallback -> drop, pair = (least, greatest) of the
        min-/max-ordinal LINKED canonicals when >= 2 linked and distinct."""
        import re as _re

        from jcpg_spark.operators import canonicalize, mentions as _m

        sc = self.spark.sparkContext
        bc_surf = sc.broadcast(sorted(set(self.surfaces)))
        bc_best = sc.broadcast(self._best_ctx)
        bc_best0 = sc.broadcast(self._best0)
        intro_src = canonicalize.INTRO_RX
        _local: dict = {}

        def extract(batches):
            import pandas as pd

            rx = _local.get("rx")
            if rx is None:
                rx = _m.compile_gazetteer(bc_surf.value)
                _local["rx"] = rx
            intro = _re.compile(intro_src)
            best, best0 = bc_best.value, bc_best0.value
            for pdf in batches:
                a_out, b_out = [], []
                for ro, to, tx in zip(
                    pdf["role"].values, pdf["tool"].values, pdf["text"].values
                ):
                    if not tx or not intro.search(tx):
                        continue
                    tool_key = to if isinstance(to, str) else "\x00"
                    linked = []
                    for m in rx.finditer(tx):
                        s = m.group(0).lower()
                        c = best.get((s, ro, tool_key))
                        if c is None:
                            c = best0.get(s)
                        if c is not None:
                            linked.append(c)
                    if len(linked) >= 2 and linked[0] != linked[-1]:
                        x, y = linked[0], linked[-1]
                        a_out.append(min(x, y))
                        b_out.append(max(x, y))
                yield pd.DataFrame({"a": a_out, "b": b_out})

        rows = (
            transcripts_batch.select("role", "tool", "text")
            .mapInPandas(extract, schema="a string, b string")
            .collect()
        )
        return {(r["a"], r["b"]) for r in rows}

    def update(self, transcripts_batch: DataFrame) -> int:
        """Fold one micro-batch's alias assertions into the union-find.
        Returns the number of (distinct) pairs observed in the batch."""
        from jcpg_spark.operators import canonicalize

        from jcpg_spark.caching import swap_persist

        if self._best_ctx is not None:
            pairs = self._fused_pairs(transcripts_batch)
        else:
            m = self._mentions.detect_mentions(
                self.spark, transcripts_batch, self.surfaces,
                turn_flag_rx=canonicalize.INTRO_RX,
            )
            # m feeds link_mentions' observed-context distinct AND its join
            # side; unpersisted, the mapInPandas detection pass ran TWICE
            # per micro-batch. The slot swap releases the previous batch's
            # cache.
            m = swap_persist("incremental_canonicalizer.mentions", m)
            linked = self._linking.link_mentions(m, self.dictionary)
            # dedupe=False drops alias_pairs' closing distinct — one fewer
            # exchange per MICRO-BATCH; the driver-side set dedupes the
            # tiny collected pair list instead (the union-find is
            # idempotent, and the returned count is the distinct count
            # either way).
            pairs = {
                (r["a"], r["b"])
                for r in canonicalize.alias_pairs(
                    transcripts_batch, linked, dedupe=False
                ).collect()
            }
        for a, b in pairs:
            ra, rb = self._find(a), self._find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                self.parent[hi] = lo
        return len(pairs)

    def mapping(self) -> dict[str, str]:
        """entity -> component root (min label), for every entity seen in a
        pair; identity entries are omitted only for never-seen entities."""
        return {e: self._find(e) for e in list(self.parent)}

    def same_as_triples_df(self) -> DataFrame:
        rows = [
            (f"e:{e}", "same_as", f"e:{root}", None, None)
            for e, root in sorted(self.mapping().items())
            if e != root
        ]
        return self.spark.createDataFrame(rows, schema=S.EDGES_SCHEMA)


def streaming_canonicalize(
    stream: DataFrame, dictionary: DataFrame, ctx: DataFrame | None = None
) -> tuple["IncrementalCanonicalizer", object]:
    """Drive IncrementalCanonicalizer over a transcript stream via
    foreachBatch (canonicalization is a fixpoint over global state — it is
    a sink-side fold, not a per-row transformation, so foreachBatch is the
    right streaming primitive). Returns (canonicalizer, streaming query);
    callers stop/await the query and then read the canonicalizer.

    ``ctx``: optional static (role, tool) context set — when the caller
    knows the stream's contexts up front, the linking build side is
    computed once instead of per micro-batch (see
    ``linking.make_context_linker``)."""
    canon = IncrementalCanonicalizer(stream.sparkSession, dictionary, ctx=ctx)
    q = (
        stream.writeStream.foreachBatch(lambda df, _id: canon.update(df))
        .trigger(availableNow=True)
        .start()
    )
    return canon, q


def streaming_curation(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Ingest-side curation verdicts: the batch ``curation_decision``
    filter chain (C4/Gopher rules: too_short / word_too_long / repetitive
    / lang_unknown / ok) applied to a stream. The chain is pure map-side
    column algebra — no state, no watermark, no aggregation — so the SAME
    expression tree runs on the stream as on the batch table and the two
    are equal row-for-row by construction (pytest-gated batch-equivalence
    like every streaming layer here). At ingest this is the cheapest
    possible placement: documents are scored before they ever land, and
    the drop decision rides the write."""
    from jcpg_spark.operators.curation import curation_decision

    df = stream.withColumnRenamed(text_col, "text") if text_col != "text" else stream
    if "doc_id" not in df.columns:
        # transcript streams: the per-turn document id is the turn key
        df = df.withColumn(
            "doc_id", F.concat_ws(":", F.col("conv_id"), F.col("turn_idx"))
        )
    return curation_decision(df)


def streaming_novelty(
    stream: DataFrame,
    reference: DataFrame,
    key: str = "text",
    window: str = "5 minutes",
    delay: str = "10 minutes",
    lgk: int = 12,
) -> DataFrame:
    """Streaming vocabulary-novelty monitor: per event-time window, the
    estimated number of distinct keys and the fraction NOT present in a
    static reference corpus — the live twin of
    ``decontaminate.corpus_overlap`` (drift / contamination telemetry
    for an ingest feed: novelty collapsing to ~0 means the feed is
    re-serving the reference corpus; spiking means distribution shift).

    The reference reduces ONCE to a single theta sketch (driver holds
    sketch BYTES, bounded by 2^lgk — never the key set) embedded as a
    binary literal; the stream side is a watermarked windowed
    ``theta_sketch_agg`` (mergeable partial aggregation — streaming
    state per window is one sketch, not a key set), and novelty =
    estimate(window_sketch \\ reference_sketch) / estimate(window_sketch)
    via ``theta_difference``, the set operation HLL cannot express.
    Same exactness contract as corpus_overlap: exact below the 2^lgk
    retention threshold (the batch-equivalence test), published
    ~1/sqrt(2^lgk) error above it."""
    ref = reference.select(F.expr(key).alias("k")).agg(
        F.theta_sketch_agg("k", F.lit(lgk)).alias("s")
    ).first()["s"]
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", window))
        .agg(F.theta_sketch_agg(F.expr(key), F.lit(lgk)).alias("ws"))
    )
    n_keys = F.theta_sketch_estimate(F.col("ws"))
    n_novel = F.theta_sketch_estimate(
        F.theta_difference(F.col("ws"), F.lit(bytes(ref)))
    )
    return agg.select(
        F.col("window.start").alias("w_start"),
        F.col("window.end").alias("w_end"),
        n_keys.alias("n_keys"),
        n_novel.alias("n_novel"),
        F.when(n_keys > 0, n_novel.cast("double") / n_keys.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("novelty"),
    )


_SFT_OUT = (
    "conv_id string, turn_idx int, prompt string, response string, ok boolean"
)
_SFT_STATE = (
    "prev_role string, prev_idx int, prev_text string, "
    "pa_prompt_idx int, pa_prompt string, pa_response string"
)


def _sft_fn(key, pdf_iter, state: GroupState):
    (conv_id,) = key
    prev_role = prev_text = pa_prompt = pa_response = None
    prev_idx = pa_prompt_idx = None
    if state.exists:
        prev_role, prev_idx, prev_text, pa_prompt_idx, pa_prompt, pa_response = state.get
    out = {k: [] for k in ("turn_idx", "prompt", "response", "ok")}
    rows = []
    for pdf in pdf_iter:
        rows.extend(
            zip(pdf["turn_idx"].tolist(), pdf["role"].tolist(), pdf["text"].tolist())
        )
    for idx, role, text in sorted(rows):
        if pa_prompt_idx is not None:
            out["turn_idx"].append(int(pa_prompt_idx))
            out["prompt"].append(pa_prompt)
            out["response"].append(pa_response)
            out["ok"].append(role != "tool")
            pa_prompt_idx = pa_prompt = pa_response = None
        if prev_role == "user" and role == "assistant":
            pa_prompt_idx, pa_prompt, pa_response = prev_idx, prev_text, text
        prev_role, prev_idx, prev_text = role, int(idx), text
    state.update(
        (prev_role, prev_idx, prev_text, pa_prompt_idx, pa_prompt, pa_response)
    )
    if out["turn_idx"]:
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": out["turn_idx"],
                "prompt": out["prompt"],
                "response": out["response"],
                "ok": out["ok"],
            }
        )


def streaming_sft_pairs(stream: DataFrame) -> DataFrame:
    """Stateful streaming SFT-pair mining: the batch ``curation.sft_pairs``
    semantics (user turn answered by the immediately following assistant
    turn, ok labeled by the turn AFTER the response) carried across
    micro-batches with one small state row per conversation (previous
    turn + the pair awaiting its outcome turn). A pair EMITS when its
    outcome turn arrives — so the final pair of a still-open conversation
    stays pending by design (its label is not yet observable); batch
    equivalence over closed prefixes is pytest-gated like every
    streaming layer here."""
    return (
        stream.select("conv_id", "turn_idx", "role", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _sft_fn,
            outputStructType=_SFT_OUT,
            stateStructType=_SFT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_TOPIC_OUT = "conv_id string, turn_idx int, seg_idx int, cohesion double"
_TOPIC_STATE = "prev_ws string, seg int"
_TOPIC_WORD_RX = re.compile(r"[a-z]+")


def _topic_fn(threshold):
    from decimal import ROUND_HALF_UP, Decimal

    def rnd6(x):
        # mirror Spark's F.round (HALF_UP), not python banker's rounding
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    def fn(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        prev_ws, seg = (state.get if state.exists else (None, -1))
        prev = set(prev_ws.split("\x1f")) - {""} if prev_ws is not None else None
        out = {k: [] for k in ("turn_idx", "seg_idx", "cohesion")}
        rows = []
        for pdf in pdf_iter:
            rows.extend(zip(pdf["turn_idx"].tolist(), pdf["text"].tolist()))
        for idx, text in sorted(rows):
            ws = set(_TOPIC_WORD_RX.findall((text or "").lower()))
            if prev is None:
                coh = None
            else:
                union = len(ws) + len(prev) - len(ws & prev)
                coh = 0.0 if union == 0 else len(ws & prev) / union
            if coh is None or coh < threshold:
                seg += 1
            out["turn_idx"].append(int(idx))
            out["seg_idx"].append(int(seg))
            out["cohesion"].append(None if coh is None else rnd6(coh))
            prev = ws
        state.update(("\x1f".join(sorted(prev)) if prev is not None else None, int(seg)))
        if out["turn_idx"]:
            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": out["turn_idx"],
                    "seg_idx": out["seg_idx"],
                    "cohesion": out["cohesion"],
                }
            )

    return fn


def streaming_topic_segments(stream: DataFrame, threshold: float = 0.15) -> DataFrame:
    """Stateful streaming topic segmentation: the batch
    ``flow.topic_segments`` lexical-cohesion boundaries carried across
    micro-batches with one state row per conversation (previous turn's
    word set + the running segment counter). Unlike the SFT miner there
    is no lookahead — cohesion only needs the PREVIOUS turn — so the
    stream emits every turn immediately and equals the batch operator
    row-for-row (pytest-gated), including the 6 dp HALF_UP rounding.
    The default threshold mirrors the batch operator's 0.15 (the r5
    advice fix — the twins' defaults must never diverge)."""
    return (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _topic_fn(threshold),
            outputStructType=_TOPIC_OUT,
            stateStructType=_TOPIC_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
