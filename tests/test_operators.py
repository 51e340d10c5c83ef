"""Per-operator semantics tests on hand-crafted fixtures (SURVEY §5.2 item 2)."""

from __future__ import annotations

import datetime as dt

import pytest

from jcpg_spark import schema as S
from jcpg_spark.operators import calls, canonicalize, flow, linking, mentions, references

TS = dt.datetime(2026, 1, 1)


def _t(spark, rows):
    """rows: (conv_id, turn_idx, role, text, tool)"""
    return spark.createDataFrame(
        [(c, i, r, x, tool, TS) for (c, i, r, x, tool) in rows], schema=S.TRANSCRIPT_SCHEMA
    )


def _edges(df):
    return {(r.src, r.pred, r.dst, r.var) for r in df.collect()}


# --- W1: flow threading ------------------------------------------------------
def test_flow_next_orders_by_turn_idx_not_input_order(spark):
    rows = [("c1", 2, "user", "x", None), ("c1", 0, "user", "x", None), ("c1", 1, "user", "x", None)]
    got = _edges(flow.flow_next(_t(spark, rows)))
    assert got == {
        ("t:c1:0", "flow.next", "t:c1:1", None),
        ("t:c1:1", "flow.next", "t:c1:2", None),
    }


def test_flow_next_no_cross_conversation_edges(spark):
    rows = [("c1", 0, "user", "x", None), ("c2", 0, "user", "x", None)]
    assert _edges(flow.flow_next(_t(spark, rows))) == set()


# --- W2: branch edges --------------------------------------------------------
def test_branch_true_and_false(spark):
    rows = [
        ("c1", 0, "assistant", "x", "search"),
        ("c1", 1, "tool", "out", None),
        ("c1", 2, "assistant", "x", "db"),
        ("c1", 3, "user", "declined", None),  # tool not run -> branch_false
    ]
    got = _edges(flow.flow_branch(_t(spark, rows)))
    assert got == {
        ("t:c1:0", "flow.branch_true", "t:c1:1", "search"),
        ("t:c1:2", "flow.branch_false", "t:c1:3", "db"),
    }


# --- J2/J3: call / return ----------------------------------------------------
def test_return_from_multi_turn_tool_run(spark):
    rows = [
        ("c1", 0, "assistant", "x", "db"),
        ("c1", 1, "tool", "part 1", None),
        ("c1", 2, "tool", "part 2", None),
        ("c1", 3, "user", "thanks", None),
    ]
    t = _t(spark, rows)
    assert _edges(calls.call_triples(t)) == {("t:c1:0", "call", "tool:db", "db")}
    assert _edges(calls.return_triples(t)) == {("t:c1:2", "return", "t:c1:0", "db")}


def test_orphan_tool_run_emits_no_return(spark):
    # tool turn not preceded by a tool-invoking assistant turn
    rows = [("c1", 0, "user", "x", None), ("c1", 1, "tool", "out", None)]
    assert _edges(calls.return_triples(_t(spark, rows))) == set()


def test_fused_call_return_matches_union(spark):
    # call_return_triples must be row-identical to call_triples UNION
    # return_triples on every shape the standalone tests exercise: multi-
    # turn runs, orphan runs, stale call sites, interleaved conversations.
    rows = [
        ("c1", 0, "assistant", "x", "db"),
        ("c1", 1, "tool", "part 1", None),
        ("c1", 2, "tool", "part 2", None),
        ("c1", 3, "user", "thanks", None),
        ("c1", 4, "assistant", "y", "search"),
        ("c1", 5, "tool", "out", None),
        ("c2", 0, "user", "x", None),
        ("c2", 1, "tool", "orphan", None),
        ("c2", 2, "assistant", "z", "db"),
        ("c2", 3, "tool", "ok", None),
        ("c2", 4, "user", "y", None),
        ("c2", 5, "tool", "orphan again", None),
        ("c3", 0, "assistant", "no tool", None),
    ]
    t = _t(spark, rows)
    fused = {tuple(r) for r in calls.call_return_triples(t).collect()}
    union = {
        tuple(r)
        for r in calls.call_triples(t).unionByName(calls.return_triples(t)).collect()
    }
    assert fused == union and fused


def test_stale_callsite_not_attributed_to_later_run(spark):
    # valid call+run, then an orphan run later: the orphan must NOT inherit
    # the earlier call site via the forward fill.
    rows = [
        ("c1", 0, "assistant", "x", "db"),
        ("c1", 1, "tool", "out", None),
        ("c1", 2, "user", "y", None),
        ("c1", 3, "tool", "orphan", None),
    ]
    assert _edges(calls.return_triples(_t(spark, rows))) == {
        ("t:c1:1", "return", "t:c1:0", "db")
    }


# --- within-turn AST depth: sentence split + mention containment ------------
def test_sentence_split_python_jvm_parity(spark):
    """The JVM split in structural.sentences and the Python boundary scan
    in detect_mentions share SENTENCE_SEP_RX; both must assign identical
    sentence indexes on every edge case (multi-punct runs, leading
    separator, trailing punctuation, no punctuation)."""
    from jcpg_spark.operators import structural

    texts = [
        "alpha here. beta there! gamma? delta",
        "alpha no punctuation at all beta",
        ". leading separator alpha",
        "alpha trailing punct.",
        "multi!?  punct...   runs alpha end",
    ]
    t = _t(spark, [("c1", i, "user", tx, None) for i, tx in enumerate(texts)])
    sents = {
        (r.turn_idx, r.sent_idx): r.sentence
        for r in structural.sentences(t).collect()
    }
    # fragment indexes are pre-filter positions; empty fragments dropped
    assert sents[(0, 0)] == "alpha here" and sents[(0, 3)] == "delta"
    assert sents[(1, 0)] == "alpha no punctuation at all beta"
    assert (2, 0) not in sents and sents[(2, 1)] == "leading separator alpha"
    assert sents[(3, 0)] == "alpha trailing punct"
    assert sents[(4, 2)] == "runs alpha end"
    # every mention's python-assigned sent_idx names an existing sentence
    # whose text contains the mention surface
    m = mentions.detect_mentions(spark, t, ["alpha", "beta", "gamma", "delta"])
    rows = m.collect()
    assert rows
    for r in rows:
        assert (r.turn_idx, r.sent_idx) in sents, (r.turn_idx, r.sent_idx)
        assert r.surface in sents[(r.turn_idx, r.sent_idx)].lower()


def test_in_sentence_triples_containment(spark):
    t = _t(spark, [("c1", 0, "user", "check alpha. then beta and alpha", None)])
    m = mentions.detect_mentions(spark, t, ["alpha", "beta"])
    got = {(r.src, r.dst) for r in mentions.in_sentence_triples(m).collect()}
    assert got == {
        ("m:c1:0:0", "sent:c1:0:0"),
        ("m:c1:0:1", "sent:c1:0:1"),
        ("m:c1:0:2", "sent:c1:0:1"),
    }


# --- S2/P3: mention detection ------------------------------------------------
def test_longest_match_shadows_embedded_surface(spark):
    t = _t(spark, [("c1", 0, "user", "please set alpha cache now", None)])
    m = mentions.detect_mentions(spark, t, ["alpha cache", "set alpha cache"])
    got = [(r.surface, r.start, r.end, r.ordinal) for r in m.collect()]
    assert got == [("set alpha cache", 7, 22, 0)]


def test_mentions_word_bounded_and_case_insensitive(spark):
    t = _t(spark, [("c1", 0, "user", "Alpha Cache vs alphacache", None)])
    m = mentions.detect_mentions(spark, t, ["alpha cache"])
    got = [(r.surface, r.start) for r in m.collect()]
    assert got == [("alpha cache", 0)]


# --- J1/W5: linking ranked pick ----------------------------------------------
@pytest.fixture()
def ambiguous_dict(spark):
    rows = [
        ("db tool", "tool_db", "db", "tool", 0.5, False),
        ("db tool", "generic_db", "core", "artifact", 0.6, False),
    ]
    return spark.createDataFrame(rows, schema=S.DICTIONARY_SCHEMA)


def test_link_context_bonus_beats_prior(spark, ambiguous_dict):
    # on an assistant turn invoking 'db', tool_db scores 0.5+0.3+0.05=0.85 > 0.65
    t = _t(spark, [("c1", 0, "assistant", "use the db tool", "db")])
    m = mentions.detect_mentions(spark, t, ["db tool"])
    linked = linking.link_mentions(m, ambiguous_dict)
    assert [r.canonical for r in linked.collect()] == ["tool_db"]


def test_link_prior_wins_without_context(spark, ambiguous_dict):
    t = _t(spark, [("c1", 0, "user", "use the db tool", None)])
    m = mentions.detect_mentions(spark, t, ["db tool"])
    linked = linking.link_mentions(m, ambiguous_dict)
    assert [r.canonical for r in linked.collect()] == ["generic_db"]


# --- J6: reaching-reference kill semantics ------------------------------------
@pytest.fixture()
def ref_dict(spark):
    rows = [
        ("alpha", "ent_a", "core", "artifact", 0.9, False),
        ("set alpha", "ent_a", "core", "artifact", 0.9, True),
    ]
    return spark.createDataFrame(rows, schema=S.DICTIONARY_SCHEMA)


def _ref_edges(spark, ref_dict, rows):
    t = _t(spark, rows)
    m = mentions.detect_mentions(spark, t, ["alpha", "set alpha"])
    linked = linking.link_mentions(m, ref_dict)
    return _edges(references.reference_triples(linked))


def test_use_binds_to_latest_def_and_redef_kills(spark, ref_dict):
    rows = [
        ("c1", 0, "user", "alpha is here", None),        # intro = def
        ("c1", 1, "user", "check alpha", None),          # use -> def@0
        ("c1", 2, "user", "set alpha to 5", None),       # redef (kills def@0)
        ("c1", 3, "user", "check alpha again", None),    # use -> def@2
    ]
    got = _ref_edges(spark, ref_dict, rows)
    assert got == {
        ("t:c1:0", "ref.use", "t:c1:1", "ent_a"),
        ("t:c1:0", "ref.redef", "t:c1:2", "ent_a"),
        ("t:c1:2", "ref.use", "t:c1:3", "ent_a"),
    }


def test_self_flow_when_turn_defs_and_uses(spark, ref_dict):
    rows = [
        ("c1", 0, "user", "alpha intro", None),
        ("c1", 1, "user", "set alpha using alpha", None),  # def + use same turn
    ]
    got = _ref_edges(spark, ref_dict, rows)
    assert ("t:c1:1", "ref.self", "t:c1:1", "ent_a") in got
    assert ("t:c1:0", "ref.redef", "t:c1:1", "ent_a") in got
    # the same-turn use binds to the old def (self), not a ref.use edge
    assert not any(p == "ref.use" for (_, p, _, _) in got)


# --- A6: connected components -------------------------------------------------
# threshold=0 forces the distributed min-label loop; default takes the
# driver union-find fast path. Both must produce identical labels.
@pytest.mark.parametrize("threshold", [1_000_000, 0])
def test_cc_path_graph_worst_case(spark, threshold):
    # path a-b-c-d-e: worst case for min-label propagation (diameter rounds)
    pairs = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("e", "d")], ["a", "b"]
    )
    mapping, rounds, converged = canonicalize.connected_components(
        pairs, driver_threshold=threshold
    )
    assert converged
    got = {r.entity: r.canonical_id for r in mapping.collect()}
    assert got == {k: "a" for k in "abcde"}


@pytest.mark.parametrize("threshold", [1_000_000, 0])
def test_cc_two_components(spark, threshold):
    pairs = spark.createDataFrame([("a", "b"), ("x", "y"), ("y", "z")], ["a", "b"])
    mapping, _, converged = canonicalize.connected_components(
        pairs, driver_threshold=threshold
    )
    assert converged
    got = {r.entity: r.canonical_id for r in mapping.collect()}
    assert got == {"a": "a", "b": "a", "x": "x", "y": "x", "z": "x"}


def test_throw_triples_failing_turns_only(spark):
    rows = [
        ("c1", 0, "assistant", "x", "db"),
        ("c1", 1, "tool", "tool output: no results", None),   # throws
        ("c1", 2, "tool", "tool output: part 2 ok", None),    # same run, ok
        ("c1", 3, "assistant", "x", "search"),
        ("c1", 4, "tool", "tool output: fine", None),         # ok run
        ("c2", 0, "tool", "tool output: no results", None),   # orphan run
    ]
    got = _edges(calls.throw_triples(_t(spark, rows)))
    assert got == {("t:c1:1", "flow.throws", "t:c1:0", "db")}


def test_resolve_tool_registry_aliases_and_passthrough(spark):
    rows = [
        ("c1", 0, "assistant", "x", "db"),
        ("c1", 1, "assistant", "x", "mystery_tool"),  # not in registry
        ("c1", 2, "user", "x", None),                 # not a call site
    ]
    registry = spark.createDataFrame([("db", "storage.kv")], ["alias", "canonical"])
    got = _edges(calls.resolve_tool_registry(_t(spark, rows), registry))
    assert got == {
        ("t:c1:0", "call", "tool:storage.kv", "db"),
        ("t:c1:1", "call", "tool:mystery_tool", "mystery_tool"),
    }


# --- dynamic DEF-effect propagation (signature fixpoint analog) ----------------
def test_def_effect_propagation_converges_to_curated_dictionary(spark):
    """A dictionary WITHOUT the defs_state bit must converge to the same
    ref.* triples as one WITH it, by learning the bit from tool-return
    re-mention evidence (JavacpgDDGBuilder.java:102-117, 1429-1441)."""
    from jcpg_spark.operators import def_effects

    rows = [
        ("c1", 0, "user", "we discuss alpha", None),
        ("c1", 1, "assistant", "querying", "db"),
        ("c1", 2, "tool", "db returned alpha state", None),   # tool mentions it
        ("c1", 3, "user", "alpha looks different now", None), # re-mention later
    ]
    t = _t(spark, rows)

    def dict_with(bit):
        return spark.createDataFrame(
            [("alpha", "ent_a", "core", "artifact", 0.9, bit)], schema=S.DICTIONARY_SCHEMA
        )

    def triples(d):
        m = mentions.detect_mentions(spark, t, ["alpha"])
        return _edges(references.reference_triples(linking.link_mentions(m, d)))

    curated = triples(dict_with(True))
    naive = triples(dict_with(False))
    assert curated != naive  # the bit matters on this fixture

    learned_dict, rounds, converged = def_effects.propagate_def_effects(
        spark, t, dict_with(False), min_evidence=1
    )
    assert converged and rounds >= 2  # >=1 flip round + the zero-change round
    assert [r.defs_state for r in learned_dict.collect()] == [True]
    assert triples(learned_dict) == curated


def test_def_effect_not_learned_without_later_remention(spark):
    """Tool mentions with no later re-mention are not def-effect evidence."""
    from jcpg_spark.operators import def_effects

    rows = [
        ("c1", 0, "user", "we discuss alpha", None),
        ("c1", 1, "assistant", "querying", "db"),
        ("c1", 2, "tool", "db returned alpha state", None),  # last mention
        ("c1", 3, "user", "thanks", None),
    ]
    t = _t(spark, rows)
    d = spark.createDataFrame(
        [("alpha", "ent_a", "core", "artifact", 0.9, False)], schema=S.DICTIONARY_SCHEMA
    )
    learned, rounds, converged = def_effects.propagate_def_effects(spark, t, d)
    assert converged and rounds == 1
    assert [r.defs_state for r in learned.collect()] == [False]


def test_cc_bts_log_rounds_on_long_chain(spark):
    """1024-node path graph: plain min-label propagation needs ~1023 rounds;
    the large-star/small-star alternation must converge in O(log n)."""
    import math

    n = 1024
    pairs = spark.createDataFrame(
        [(f"n{i:05d}", f"n{i + 1:05d}") for i in range(n - 1)], ["a", "b"]
    )
    mapping, rounds, converged = canonicalize.connected_components(
        pairs, max_iter=30, driver_threshold=0
    )
    assert converged
    assert rounds <= 2 * int(math.log2(n)) + 2  # 22 for n=1024
    got = {r.entity: r.canonical_id for r in mapping.collect()}
    assert got == {f"n{i:05d}": "n00000" for i in range(n)}


def test_cc_driver_byte_budget_falls_back_to_distributed(spark):
    """Row count under the cap but byte estimate over budget must take the
    distributed path and still produce the identical mapping."""
    pairs = spark.createDataFrame([("a", "b"), ("x", "y"), ("y", "z")], ["a", "b"])
    mapping, rounds, converged = canonicalize.connected_components(
        pairs, driver_threshold=1_000_000, driver_threshold_bytes=1
    )
    assert converged and rounds > 1  # distributed path ran
    got = {r.entity: r.canonical_id for r in mapping.collect()}
    assert got == {"a": "a", "b": "a", "x": "x", "y": "x", "z": "x"}


# --- skew: salted flow threading ----------------------------------------------
def test_flow_next_salted_equals_plain_on_skew(spark, dictionary):
    from jcpg_spark.synth import synth_transcripts

    # includes the 100x skew conversation (conv000000, 2000 turns)
    t = synth_transcripts(spark, 8, skew=True)
    plain = {tuple(r) for r in flow.flow_next(t).collect()}
    for chunk in (7, 100, 10_000):  # chunk < conv len, ~conv len, > conv len
        salted = {tuple(r) for r in flow.flow_next_salted(t, chunk_size=chunk).collect()}
        assert salted == plain, f"chunk_size={chunk}"


def test_flow_next_salted_noncontiguous_turn_idx(spark):
    import datetime as dt

    from jcpg_spark import schema as S

    # gaps across chunk boundaries must still produce correct threading
    rows = [("c1", i, "user", "x", None) for i in (0, 5, 9, 10, 23, 24)]
    t = spark.createDataFrame(
        [(c, i, r, x, to, dt.datetime(2026, 1, 1)) for (c, i, r, x, to) in rows],
        schema=S.TRANSCRIPT_SCHEMA,
    )
    plain = {tuple(r) for r in flow.flow_next(t).collect()}
    salted = {tuple(r) for r in flow.flow_next_salted(t, chunk_size=10).collect()}
    assert salted == plain


def test_link_mentions_context_fallback_for_undeclared_context(spark):
    """A mention whose (role, tool) is outside a caller-provided static ctx
    must link to the context-free best candidate, not silently drop
    (streaming vocabulary-gap contract); declared contexts still get the
    full context-scored winner."""
    from pyspark.sql import functions as F

    dic = spark.createDataFrame(
        [
            ("alpha cache", "alpha_cache", "core", "artifact", 0.9, False),
            ("alpha cache", "alpha_cache_alt", "alt", "tool", 0.7, False),
        ],
        "surface string, canonical string, namespace string, kind string, prior double, defs_state boolean",
    )
    ments = spark.createDataFrame(
        [
            ("c0", 0, 0, "alpha cache", "assistant", "alt"),       # declared ctx
            ("c1", 0, 0, "alpha cache", "assistant", "newtool"),   # undeclared
            ("c2", 0, 0, "alpha cache", "operator", None),         # undeclared role
        ],
        "conv_id string, turn_idx int, ordinal int, surface string, role string, tool string",
    )
    ctx = spark.createDataFrame([("assistant", "alt"), ("assistant", None)], "role string, tool string")
    out = {r.conv_id: r for r in linking.link_mentions(ments, dic, ctx=ctx).collect()}
    assert len(out) == 3  # nothing dropped
    # declared context: tool-kind candidate wins via the +0.3 namespace bonus
    assert out["c0"].canonical == "alpha_cache_alt"
    # undeclared contexts: context-free best = highest prior
    assert out["c1"].canonical == "alpha_cache" and out["c1"].score == 0.9
    assert out["c2"].canonical == "alpha_cache"


def test_def_use_rollup_matches_bruteforce(spark, dictionary):
    """def_use_rollup vs a plain-python recomputation over synth data:
    same def/use semantics as reference_triples (explicit defs_state OR
    first-mention intro; use when mentions > defs), serialized sorted."""
    from collections import defaultdict

    from jcpg_spark.operators import linking, mentions as M
    from jcpg_spark.synth import gazetteer_pdf, synth_transcripts

    tr = synth_transcripts(spark, 12, skew=False)
    surfaces = gazetteer_pdf()["surface"].tolist()
    linked = linking.link_mentions(M.detect_mentions(spark, tr, surfaces), dictionary)
    got = {
        (r.conv_id, r.turn_idx): (r.defs, r.uses)
        for r in references.def_use_rollup(linked).collect()
    }

    rows = sorted(
        linked.select("conv_id", "canonical", "turn_idx", "ordinal", "defs_state").collect(),
        key=lambda r: (r.conv_id, r.canonical, r.turn_idx, r.ordinal),
    )
    by_entity = defaultdict(list)
    for r in rows:
        by_entity[(r.conv_id, r.canonical)].append(r)
    per_turn = defaultdict(lambda: (set(), set()))  # (conv, turn) -> (defs, uses)
    for (conv, canonical), ms in by_entity.items():
        seen_turn = False
        for turn, grp in __import__("itertools").groupby(ms, key=lambda m: m.turn_idx):
            grp = list(grp)
            n_def = sum(1 for g in grp if g.defs_state)
            if not seen_turn and not grp[0].defs_state:
                n_def += 1  # intro rule
            seen_turn = True
            d, u = per_turn[(conv, turn)]
            if n_def > 0:
                d.add(canonical)
            if len(grp) > n_def:
                u.add(canonical)
    want = {}
    for k, (d, u) in per_turn.items():
        want[k] = (";".join(sorted(d)) if d else None, ";".join(sorted(u)) if u else None)
    want = {k: v for k, v in want.items() if v != (None, None)}
    assert got == want


def test_link_asof_versioned_dictionary(spark):
    """SCD-2 linking: the same surface resolves to DIFFERENT canonicals on
    either side of a dictionary version boundary; ties break on canonical
    asc; a mention with no valid version at its ts is dropped."""
    import datetime as dt

    from jcpg_spark.operators.linking import link_asof

    t = lambda d: dt.datetime(2024, 1, d, 12, 0, 0)
    mentions = spark.createDataFrame(
        [(1, "api", t(5)), (2, "api", t(20)), (3, "api", t(2)), (4, "ghost", t(5))],
        "mention_id long, surface string, ts timestamp",
    )
    vd = spark.createDataFrame(
        [
            # window 1: two candidates, clear winner
            ("api", "e:api_v1", 2.0, t(1), t(10)),
            ("api", "e:api_alt", 1.0, t(1), t(10)),
            # window 2: TIED priors -> canonical-asc tie-break
            ("api", "e:api_v2b", 5.0, t(10), t(30)),
            ("api", "e:api_v2a", 5.0, t(10), t(30)),
            # ghost's only version ended before the mention
            ("ghost", "e:ghost", 9.0, t(1), t(3)),
        ],
        "surface string, canonical string, prior double, valid_from timestamp, valid_to timestamp",
    )
    got = {r["mention_id"]: (r["canonical"], r["score"]) for r in
           link_asof(mentions, vd).collect()}
    assert got == {
        1: ("e:api_v1", 2.0),
        2: ("e:api_v2a", 5.0),  # tie -> lexicographically first canonical
        3: ("e:api_v1", 2.0),
    }


def test_link_asof_is_broadcast_join(spark):
    import datetime as dt

    from jcpg_spark.operators.linking import link_asof

    t0 = dt.datetime(2024, 1, 1)
    mentions = spark.createDataFrame(
        [(1, "x", t0)], "mention_id long, surface string, ts timestamp")
    vd = spark.createDataFrame(
        [("x", "e:x", 1.0, dt.datetime(2023, 1, 1), dt.datetime(2025, 1, 1))],
        "surface string, canonical string, prior double, valid_from timestamp, valid_to timestamp")
    plan = link_asof(mentions, vd)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# conversation_audit + bm25_topk (r4)
# ---------------------------------------------------------------------------


def test_conversation_audit_flags_each_defect(spark):
    """One conversation per defect class; every flag trips independently
    and only on its own conversation."""
    import datetime as dt

    from jcpg_spark.operators.structural import conversation_audit

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # ok: user/assistant alternation, clean everything
        ("ok", 0, "user", "hi", None, t0),
        ("ok", 1, "assistant", "hello", None, t0 + s),
        # stuck speaker (two user turns in a row)
        ("stuck", 0, "user", "a", None, t0),
        ("stuck", 1, "user", "b", None, t0 + s),
        # wrong first speaker
        ("first", 0, "assistant", "a", None, t0),
        ("first", 1, "user", "b", None, t0 + s),
        # blank turn
        ("blank", 0, "user", "  ", None, t0),
        ("blank", 1, "assistant", "b", None, t0 + s),
        # timestamp regression
        ("tsback", 0, "user", "a", None, t0 + s),
        ("tsback", 1, "assistant", "b", None, t0),
        # turn-index gap (0, 2)
        ("gap", 0, "user", "a", None, t0),
        ("gap", 2, "assistant", "b", None, t0 + s),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = {r["conv_id"]: r for r in conversation_audit(t).collect()}
    assert out["ok"]["wellformed"] is True
    expect_bad = {
        "stuck": "alternates_ok",
        "first": "first_role_ok",
        "blank": "nonempty_ok",
        "tsback": "ts_monotone_ok",
        "gap": "contiguous_ok",
    }
    flags = ["first_role_ok", "alternates_ok", "nonempty_ok",
             "ts_monotone_ok", "contiguous_ok"]
    for conv, bad in expect_bad.items():
        r = out[conv]
        assert r["wellformed"] is False, conv
        for f in flags:
            assert r[f] is (f != bad), (conv, f, r)


def test_bm25_prefers_term_dense_docs_and_ignores_absent_terms(spark):
    """The doc repeating the query term outranks a one-hit doc of equal
    length; a term absent from the corpus changes nothing; rank is dense
    1..k per query."""
    from jcpg_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "hash hash hash filler filler"),
            (2, "hash filler filler filler filler"),
            (3, "filler filler filler filler filler"),
        ],
        "doc_id int, text string",
    )
    q = spark.createDataFrame(
        [("q", "hash"), ("q", "zzzabsent")], "query_id string, term string"
    )
    rows = bm25_topk(docs, q, k=5).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [1, 2]  # doc 3 never scores
    assert rows[0]["score"] > rows[1]["score"] > 0
    assert [r["rank"] for r in rows] == [1, 2]
    # dropping the absent term changes no score (it has no tf rows)
    q2 = spark.createDataFrame([("q", "hash")], "query_id string, term string")
    rows2 = bm25_topk(docs, q2, k=5).orderBy("rank").collect()
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (r["doc_id"], r["score"]) for r in rows2
    ]


def test_fuzzy_link_exact_vs_brute_force(spark):
    """FastSS deletion-neighborhood join must equal brute-force
    Levenshtein for k=1 and k=2 — including empty strings and
    single-char substitutions (which intersect only at the empty
    variant); k=3 is rejected loudly."""
    from itertools import product

    import pytest

    from jcpg_spark.operators.linking import fuzzy_link

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)]

    words = ["search", "serch", "saerch", "searches", "tool", "toll",
             "tall", "databse", "database", "data", "date", "gate",
             "a", "ab", "", "b"]
    q = spark.createDataFrame([(w, w) for w in words], "qid string, qtext string")
    d = spark.createDataFrame([(w, w) for w in words], "did string, dtext string")
    for k in (1, 2):
        got = {(r["qid"], r["did"], r["dist"])
               for r in fuzzy_link(q, d, k=k).collect()}
        want = {(a, b, lev(a, b))
                for a, b in product(words, words) if lev(a, b) <= k}
        assert got == want, (k, want ^ got)
    with pytest.raises(ValueError, match="caps k at 2"):
        fuzzy_link(q, d, k=3)


def test_interval_join_matches_brute_force_across_buckets(spark):
    """Bucket-expansion range join must equal the brute-force theta join
    for ANY bucket width (the anchor-cell rule makes the output
    duplicate-free without a distinct), drop malformed intervals, and
    reject bucket <= 0 and the reserved column name."""
    from itertools import product

    import pytest

    from jcpg_spark.operators.linking import interval_join

    # deterministic fixture: varied lengths incl. zero-length and
    # bucket-straddling intervals, two co-key groups
    rows = []
    for i in range(40):
        lo = (i * 37) % 101 / 3.0
        rows.append((f"x{i}", lo, lo + (i * 13) % 29 / 2.0, f"u{i % 2}"))
    rows.append(("bad", 9.0, 3.0, "u0"))  # malformed: dropped
    L = spark.createDataFrame(rows, "id string, lo double, hi double, u string")
    R = spark.createDataFrame(
        [(f"y{i}", (i * 53) % 97 / 3.0, (i * 53) % 97 / 3.0 + (i * 7) % 23, f"u{i % 2}")
         for i in range(30)],
        "id string, lo double, hi double, u string",
    )
    lrows = [r for r in rows if r[1] <= r[2]]
    rrows = [(f"y{i}", (i * 53) % 97 / 3.0, (i * 53) % 97 / 3.0 + (i * 7) % 23,
              f"u{i % 2}") for i in range(30)]
    want = sorted(
        (a[3], a[0], b[0])
        for a, b in product(lrows, rrows)
        if a[3] == b[3] and a[1] <= b[2] and b[1] <= a[2]
    )
    for bucket in (0.7, 5.0, 50.0, 1000.0):
        out = interval_join(L, R, bucket=bucket, on=["u"]).collect()
        got = sorted((r["u"], r["l_id"], r["r_id"]) for r in out)
        assert got == want, (bucket, len(got), len(want))
    with pytest.raises(ValueError, match="bucket width"):
        interval_join(L, R, bucket=0.0)
    with pytest.raises(ValueError, match="reserved"):
        interval_join(L, R, bucket=1.0, on=["bucket"])


def test_read_transcripts_jsonl_flat_and_nested(spark, tmp_path):
    """JSONL source: flat per-turn lines and nested per-conversation
    lines both land in the canonical transcript schema (explicit schema,
    no inference pass); ISO timestamps parse; missing tool is null."""
    import json

    from jcpg_spark.sources.transcripts import read_transcripts_jsonl

    flat = tmp_path / "flat.jsonl"
    flat.write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"conv_id": "c1", "turn_idx": 0, "role": "user",
                 "text": "hi", "tool": None, "ts": "2026-01-01T12:00:00"},
                {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
                 "text": "run", "tool": "db", "ts": "2026-01-01T12:00:05"},
            ]
        )
    )
    f = read_transcripts_jsonl(spark, str(flat))
    assert [x.name for x in f.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    rows = {(r["conv_id"], r["turn_idx"], r["role"], r["tool"])
            for r in f.collect()}
    assert rows == {("c1", 0, "user", None), ("c1", 1, "assistant", "db")}
    assert all(r["ts"] is not None for r in f.collect())

    nested = tmp_path / "nested.jsonl"
    nested.write_text(
        json.dumps(
            {"conv_id": "c9", "turns": [
                {"turn_idx": 0, "role": "user", "text": "q"},
                {"turn_idx": 1, "role": "tool", "text": "event error x",
                 "tool": "search", "ts": "2026-02-02T01:02:03"},
            ]}
        )
    )
    n = read_transcripts_jsonl(spark, str(nested), nested=True)
    got = sorted((r["conv_id"], r["turn_idx"], r["role"], r["tool"])
                 for r in n.collect())
    assert got == [("c9", 0, "user", None), ("c9", 1, "tool", "search")]
    # the nested reader's output schema matches the flat one
    assert [x.name for x in n.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_er_quality_closed_form(spark):
    """Hand-computed scorecard: pred {1,2},{3},{4,5,6} vs gold
    {1,2,3},{4,5},{6} -> TP pairs {1,2},{4,5}; pred pairs 4; gold pairs 4
    -> pairwise P = R = F1 = 0.5; B-cubed all 14/18 = 0.777778."""
    from jcpg_spark.operators.canonicalize import er_quality

    pred = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "C"), (5, "C"), (6, "C")],
        ["item", "pred_id"],
    )
    gold = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "y"), (6, "z")],
        ["item", "gold_id"],
    )
    r = er_quality(pred, gold).first()
    assert (r["n_items"], r["n_pred_clusters"], r["n_gold_clusters"]) == (6, 3, 3)
    assert r["pairwise_precision"] == 0.5
    assert r["pairwise_recall"] == 0.5
    assert r["pairwise_f1"] == 0.5
    assert r["b3_precision"] == round(14 / 18, 6)
    assert r["b3_recall"] == round(14 / 18, 6)
    assert r["b3_f1"] == round(14 / 18, 6)

    # degenerate: all-singleton clusterings are vacuously perfect pairwise
    singles = spark.createDataFrame([(1, "a"), (2, "b")], ["item", "pred_id"])
    goldsing = singles.withColumnRenamed("pred_id", "gold_id")
    d = er_quality(singles, goldsing).first()
    assert d["pairwise_precision"] == 1.0 and d["pairwise_recall"] == 1.0
    assert d["b3_precision"] == 1.0 and d["b3_recall"] == 1.0


def test_topic_segments_closed_form(spark):
    """Cohesion and boundary math on a hand-built conversation: same-type
    adjacency coheres 1.0, type change 3/5, wordless turn forces 0.0; the
    first turn opens segment 0 with NULL cohesion; the plan keeps ONE
    exchange for both window passes."""
    from jcpg_spark.operators.flow import topic_segments

    rows = [
        ("c", 0, "alpha beta gamma"),
        ("c", 1, "alpha beta gamma"),      # identical -> 1.0, same segment
        ("c", 2, "alpha beta delta"),      # 2 shared / 4 union = 0.5 -> cut
        ("c", 3, "123 456"),               # no letters -> 0.0 -> cut
        ("d", 0, "solo"),                  # separate conversation
    ]
    t = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    out = topic_segments(t, threshold=0.8)
    got = {(r["conv_id"], r["turn_idx"]): (r["seg_idx"], r["cohesion"]) for r in out.collect()}
    assert got[("c", 0)] == (0, None)
    assert got[("c", 1)] == (0, 1.0)
    assert got[("c", 2)] == (1, 0.5)
    assert got[("c", 3)] == (2, 0.0)
    assert got[("d", 0)] == (0, None)
    final_plan = (
        out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    )
    assert final_plan.count("Exchange hashpartitioning") == 1, final_plan


def test_alias_priors_closed_form(spark):
    """Priors are true shares of the FULL surface mass even when
    min_count drops rows; rank is deterministic under count ties."""
    from jcpg_spark.operators.linking import alias_priors

    rows = (
        [("jaguar", "cat")] * 3
        + [("jaguar", "car")] * 2
        + [("jaguar", "os")] * 1        # dropped at min_count=2
        + [("python", "lang")] * 2
        + [("python", "snake")] * 2     # tie -> 'lang' ranks 1 (asc entity)
    )
    obs = spark.createDataFrame(rows, ["surface", "entity"])
    out = {(r["surface"], r["entity"]): (r["n"], r["n_surface"], r["prior"], r["rank"])
           for r in alias_priors(obs, min_count=2).collect()}
    assert out[("jaguar", "cat")] == (3, 6, 0.5, 1)
    assert out[("jaguar", "car")] == (2, 6, round(2 / 6, 6), 2)
    assert ("jaguar", "os") not in out       # filtered, but counted in n_surface
    assert out[("python", "lang")] == (2, 4, 0.5, 1)
    assert out[("python", "snake")] == (2, 4, 0.5, 2)


def test_interarrival_stats_closed_form(spark):
    """Exact-integer power-sum math: gaps (10, 10, 10) -> std 0, B = -1
    (metronome); gaps (1, 9) -> mean 5, std sqrt(32), B computed from
    them; single-gap conv -> null std and B."""
    import datetime as dtm
    import math

    from jcpg_spark.operators.flow import interarrival_stats

    base = dtm.datetime(2024, 1, 1)

    def conv(cid, offsets):
        return [(cid, i, "user", "x", None, base + dtm.timedelta(seconds=o))
                for i, o in enumerate(offsets)]

    rows = conv("m", [0, 10, 20, 30]) + conv("b", [0, 1, 10]) + conv("s", [0, 7])
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {r["conv_id"]: r for r in interarrival_stats(t).collect()}
    assert out["m"]["n_gaps"] == 3 and out["m"]["mean_gap"] == 10.0
    assert out["m"]["std_gap"] == 0.0 and out["m"]["burstiness"] == -1.0
    std_b = math.sqrt(((2 * 82) - 100) / 2)     # n=2, s1=10, s2=82
    assert out["b"]["mean_gap"] == 5.0
    assert abs(out["b"]["std_gap"] - round(std_b, 6)) < 1e-9
    want_b = (std_b - 5) / (std_b + 5)
    assert abs(out["b"]["burstiness"] - round(want_b, 6)) < 1e-9
    assert out["s"]["n_gaps"] == 1
    assert out["s"]["std_gap"] is None and out["s"]["burstiness"] is None


def test_refresh_dictionary_blend_semantics(spark):
    """Observed rows blend shipped prior with empirical share; an
    observed surface's unmatched row decays toward blend*prior; a never-
    observed surface keeps its prior bit-for-bit; schema passes through."""
    from jcpg_spark import schema as SS
    from jcpg_spark.operators.linking import refresh_dictionary

    d = spark.createDataFrame(
        [
            ("db", "tool_db", "core", "tool", 0.8, False),
            ("db", "generic_db", "core", "artifact", 0.2, False),
            ("ghost", "never_seen", "core", "artifact", 0.7, True),
        ],
        schema=SS.DICTIONARY_SCHEMA,
    )
    obs = spark.createDataFrame(
        [("db", "tool_db")] * 3 + [("db", "generic_db")],
        ["surface", "entity"],
    )
    out = {(r["surface"], r["canonical"]): (r["prior"], r["defs_state"])
           for r in refresh_dictionary(d, obs, blend=0.5).collect()}
    assert out[("db", "tool_db")] == (round(0.5 * 0.8 + 0.5 * 0.75, 6), False)
    assert out[("db", "generic_db")] == (round(0.5 * 0.2 + 0.5 * 0.25, 6), False)
    assert out[("ghost", "never_seen")] == (0.7, True)


def test_score_links_expr_matches_pandas_udf(spark):
    # the JVM-expression scoring twin (r6: no ArrowEvalPython stage per
    # link_mentions call) must be bit-identical to the declared pandas UDF,
    # including pandas' null semantics (null comparisons -> False bonus)
    import pyspark.sql.functions as F

    rows = [
        (0.5, "tool", "db", "assistant", "db"),      # both bonuses
        (0.6, "artifact", "core", "assistant", "db"),  # role bonus only
        (0.5, "tool", "db", "user", "db"),           # ns bonus only
        (0.7, "tool", "db", None, "db"),             # null role
        (0.7, "tool", None, "assistant", None),      # null ns AND null tool
        (0.7, None, "db", "assistant", "db"),        # null kind
        (0.7, "tool", "db", "assistant", None),      # null tool
        (0.31, "artifact", "x", "user", None),       # no bonus
    ]
    df = spark.createDataFrame(
        rows, "prior double, kind string, namespace string, role string, tool string"
    )
    both = df.select(
        linking.score_links(
            F.col("prior"), F.col("kind"), F.col("namespace"), F.col("role"), F.col("tool")
        ).alias("udf"),
        linking.score_links_expr(
            F.col("prior"), F.col("kind"), F.col("namespace"), F.col("role"), F.col("tool")
        ).alias("expr"),
    ).collect()
    for r in both:
        assert r.udf == r.expr, (r.udf, r.expr)


def test_make_context_linker_matches_link_mentions(spark):
    # the persisted-build-side closure (r6: micro-batch linking without a
    # per-batch dictionary aggregation) must emit exactly link_mentions'
    # rows for the same static ctx, declared and undeclared contexts alike
    dic = spark.createDataFrame(
        [
            ("alpha cache", "alpha_cache", "core", "artifact", 0.9, False),
            ("alpha cache", "alpha_cache_alt", "alt", "tool", 0.7, False),
        ],
        "surface string, canonical string, namespace string, kind string, prior double, defs_state boolean",
    )
    ments = spark.createDataFrame(
        [
            ("c0", 0, 0, "alpha cache", "assistant", "alt"),
            ("c1", 0, 0, "alpha cache", "assistant", "newtool"),
            ("c2", 0, 0, "alpha cache", "operator", None),
        ],
        "conv_id string, turn_idx int, ordinal int, surface string, role string, tool string",
    )
    ctx = spark.createDataFrame(
        [("assistant", "alt"), ("assistant", None)], "role string, tool string"
    )
    want = sorted(map(tuple, linking.link_mentions(ments, dic, ctx=ctx).collect()))
    link = linking.make_context_linker(dic, ctx)
    got = sorted(map(tuple, link(ments).collect()))
    assert got == want
