"""Slow, obviously-correct single-threaded oracle (FIXTURES.md §3).

Independent reimplementation of the transcript-KG semantics defined in
SURVEY.md §2 / jcpg_spark operator docstrings — deliberately written as
plain Python loops over pandas rows (the shape of the reference's own
single-JVM traversal, JavacpgDDGBuilder.java) so that agreement with the
distributed pipeline is meaningful. Do NOT import jcpg_spark operator
internals here.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd

Triple = tuple  # (src, pred, dst, var, conv_id)


def _turn(conv, idx):
    return f"t:{conv}:{idx}"


def _rx(surfaces):
    ordered = sorted(set(surfaces), key=len, reverse=True)
    return re.compile(r"\b(?:" + "|".join(re.escape(s) for s in ordered) + r")\b", re.IGNORECASE)


FAILURE_RX = re.compile(r"^tool output: no results")
SENT_SEP = re.compile(r"[.!?]+\s+")


def _sentence_bounds(text: str) -> list[int]:
    """Fragment-start offsets under the shared sentence separator."""
    return [0] + [m.end() for m in SENT_SEP.finditer(text)]


def oracle_graph(transcripts: pd.DataFrame, dictionary: pd.DataFrame):
    """-> (edges set[Triple], canonical dict[mention_id, canonical_id])."""
    t = transcripts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    edges: set[Triple] = set()

    def failing(r):
        return isinstance(r.text, str) and bool(FAILURE_RX.search(r.text))

    # --- structural + act + within-turn sentence depth
    for r in t.itertuples():
        edges.add((f"c:{r.conv_id}", "ast.has_turn", _turn(r.conv_id, r.turn_idx), None, r.conv_id))
        edges.add((_turn(r.conv_id, r.turn_idx), "act.role", f"role:{r.role}", None, r.conv_id))
        if isinstance(r.text, str) and r.text:
            frags = SENT_SEP.split(r.text)
            for k, frag in enumerate(frags):
                if frag != "":
                    edges.add(
                        (
                            _turn(r.conv_id, r.turn_idx),
                            "ast.has_sentence",
                            f"sent:{r.conv_id}:{r.turn_idx}:{k}",
                            None,
                            r.conv_id,
                        )
                    )

    # --- flow / branch / call / return / segments, per conversation in turn order
    for conv, g in t.groupby("conv_id"):
        rows = list(g.itertuples())
        # CDG/segment layer: a new region opens at the first turn, or at a
        # user turn whose predecessor was not a user turn
        seg = -1
        for i, r in enumerate(rows):
            if i == 0 or (r.role == "user" and rows[i - 1].role != "user"):
                seg += 1
                if seg > 0:
                    edges.add((f"seg:{conv}:{seg-1}", "cdg.follows", f"seg:{conv}:{seg}", None, conv))
                    # typed CDG region-entry edge from the predecessor
                    # (cdg.enter_true/false/throws; epsilon -> no edge)
                    p = rows[i - 1]
                    if p.role == "assistant" and isinstance(p.tool, str):
                        edges.add(
                            (_turn(conv, p.turn_idx), "cdg.enter_false",
                             f"seg:{conv}:{seg}", p.tool, conv)
                        )
                    elif p.role == "tool":
                        pred = "cdg.enter_throws" if failing(p) else "cdg.enter_true"
                        edges.add(
                            (_turn(conv, p.turn_idx), pred, f"seg:{conv}:{seg}", None, conv)
                        )
            edges.add((_turn(conv, r.turn_idx), "cdg.in_segment", f"seg:{conv}:{seg}", None, conv))
        for i, r in enumerate(rows):
            if i + 1 < len(rows):
                n = rows[i + 1]
                edges.add((_turn(conv, r.turn_idx), "flow.next", _turn(conv, n.turn_idx), None, conv))
                if r.role == "assistant" and isinstance(r.tool, str):
                    pred = "flow.branch_true" if n.role == "tool" else "flow.branch_false"
                    edges.add((_turn(conv, r.turn_idx), pred, _turn(conv, n.turn_idx), r.tool, conv))
            if r.role == "assistant" and isinstance(r.tool, str):
                edges.add((_turn(conv, r.turn_idx), "call", f"tool:{r.tool}", r.tool, conv))
        # return edges: last turn of each maximal tool run -> preceding call site
        i = 0
        while i < len(rows):
            if rows[i].role == "tool":
                j = i
                while j + 1 < len(rows) and rows[j + 1].role == "tool":
                    j += 1
                if i > 0 and rows[i - 1].role == "assistant" and isinstance(rows[i - 1].tool, str):
                    edges.add(
                        (
                            _turn(conv, rows[j].turn_idx),
                            "return",
                            _turn(conv, rows[i - 1].turn_idx),
                            rows[i - 1].tool,
                            conv,
                        )
                    )
                    # THROWS: every FAILING tool turn of the run -> call site
                    for k in range(i, j + 1):
                        if failing(rows[k]):
                            edges.add(
                                (
                                    _turn(conv, rows[k].turn_idx),
                                    "flow.throws",
                                    _turn(conv, rows[i - 1].turn_idx),
                                    rows[i - 1].tool,
                                    conv,
                                )
                            )
                i = j + 1
            else:
                i += 1

    # --- mentions
    rx = _rx(dictionary["surface"].tolist())
    mentions = []  # dicts
    for r in t.itertuples():
        if not isinstance(r.text, str):
            continue
        bounds = _sentence_bounds(r.text)
        for i, m in enumerate(rx.finditer(r.text)):
            mid = f"m:{r.conv_id}:{r.turn_idx}:{i}"
            mentions.append(
                dict(
                    conv_id=r.conv_id,
                    turn_idx=r.turn_idx,
                    ordinal=i,
                    surface=m.group(0).lower(),
                    mention_id=mid,
                    role=r.role,
                    tool=r.tool if isinstance(r.tool, str) else None,
                    text=r.text,
                )
            )
            edges.add(
                (_turn(r.conv_id, r.turn_idx), "ast.has_mention", mid, m.group(0).lower(), r.conv_id)
            )
            sent = sum(1 for b in bounds if b <= m.start()) - 1
            edges.add(
                (mid, "ast.in_sentence", f"sent:{r.conv_id}:{r.turn_idx}:{sent}", None, r.conv_id)
            )

    # --- linking (score = prior + 0.3*tool-context + 0.05*assistant; max score,
    #     tie-break canonical asc)
    cand_by_surface = defaultdict(list)
    for d in dictionary.itertuples():
        cand_by_surface[d.surface].append(d)
    linked = []
    for m in mentions:
        cands = cand_by_surface.get(m["surface"])
        if not cands:
            continue
        scored = []
        for c in cands:
            s = float(c.prior)
            if c.kind == "tool" and m["tool"] is not None and c.namespace == m["tool"]:
                s += 0.3
            if m["role"] == "assistant":
                s += 0.05
            scored.append((-s, c.canonical, c))
        scored.sort()
        best = scored[0][2]
        linked.append(
            {
                **m,
                "canonical": best.canonical,
                "defs_state": bool(best.defs_state),
                "namespace": best.namespace if isinstance(best.namespace, str) else None,
            }
        )

    # --- IMPORTS: conversation -> namespace of any linked mention
    for m in linked:
        ns = m.get("namespace")
        if isinstance(ns, str):
            edges.add((f"c:{m['conv_id']}", "imports", f"ns:{ns}", None, m["conv_id"]))

    # --- reference edges (reaching def with kill)
    by_entity = defaultdict(list)
    for m in linked:
        by_entity[(m["conv_id"], m["canonical"])].append(m)
    for (conv, canonical), ms in by_entity.items():
        ms.sort(key=lambda m: (m["turn_idx"], m["ordinal"]))
        for i, m in enumerate(ms):
            m["is_def"] = m["defs_state"] or i == 0
        per_turn = defaultdict(lambda: [0, 0])  # turn -> [n_def, n_use]
        for m in ms:
            per_turn[m["turn_idx"]][0 if m["is_def"] else 1] += 1
        prev_def = None
        for turn in sorted(per_turn):
            n_def, n_use = per_turn[turn]
            tn = _turn(conv, turn)
            if n_use and not n_def and prev_def is not None:
                edges.add((prev_def, "ref.use", tn, canonical, conv))
            if n_def and prev_def is not None:
                edges.add((prev_def, "ref.redef", tn, canonical, conv))
            if n_def and n_use:
                edges.add((tn, "ref.self", tn, canonical, conv))
            if n_def:
                prev_def = tn

    # --- alias pairs + union-find canonicalization
    by_turn = defaultdict(list)
    for m in linked:
        by_turn[(m["conv_id"], m["turn_idx"])].append(m)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-label root, matching the CC min propagation
            lo, hi = sorted([ra, rb])
            parent[hi] = lo

    for (conv, turn), ms in by_turn.items():
        if not re.match(r"^introducing\b", ms[0]["text"] or ""):
            continue
        if len(ms) >= 2:
            ms.sort(key=lambda m: m["ordinal"])
            a, b = ms[0]["canonical"], ms[-1]["canonical"]
            if a != b:
                union(a, b)
    for m in linked:
        find(m["canonical"])  # materialize
    for e in list(parent):
        root = find(e)
        if root != e:
            edges.add((f"e:{e}", "same_as", f"e:{root}", None, None))

    canonical = {m["mention_id"]: find(m["canonical"]) for m in linked}
    return edges, canonical
