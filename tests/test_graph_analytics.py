"""Graph-analytics kernels (triangles, k-hop, co-mention projection) and
benchmark decontamination.

Triangle correctness is pinned two ways: closed-form counts on known
graphs (complete graph, path), and equality of the degree-oriented wedge
implementation against an orientation-free naive count on a seeded random
graph — the invariance that lets the DuckDB oracle stay naive while the
engine runs the scale path.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from jcpg_spark.operators import decontaminate, graph_analytics


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a int, b int"
    ).distinct()


def _naive_triangle_counts(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    verts = sorted({v for e in es for v in e})
    out = {}
    for x, y, z in itertools.combinations(verts, 3):
        if (x, y) in es and (y, z) in es and (x, z) in es:
            for v in (x, y, z):
                out[v] = out.get(v, 0) + 1
    return out


def test_triangles_complete_graph(spark):
    # K5: C(5,3)=10 triangles, each vertex in C(4,2)=6.
    edges = _edges_df(spark, itertools.combinations(range(5), 2))
    got = {r["item"]: r["n_tri"] for r in graph_analytics.triangle_counts(edges).collect()}
    assert got == {v: 6 for v in range(5)}


def test_triangles_path_graph_empty(spark):
    edges = _edges_df(spark, [(i, i + 1) for i in range(10)])
    assert graph_analytics.triangle_counts(edges).count() == 0


def test_triangles_match_naive_on_random_graph(spark):
    rng = random.Random(42)
    pairs = {
        (a, b)
        for a, b in (sorted(rng.sample(range(30), 2)) for _ in range(150))
    }
    edges = _edges_df(spark, pairs)
    got = {r["item"]: r["n_tri"] for r in graph_analytics.triangle_counts(edges).collect()}
    assert got == _naive_triangle_counts(pairs)


def test_triangles_skewed_hub(spark):
    # A hub in a star plus one closing edge: exactly one triangle; the
    # degree orientation must not over- or under-count around the hub.
    pairs = [(0, i) for i in range(1, 20)] + [(1, 2)]
    edges = _edges_df(spark, pairs)
    got = {r["item"]: r["n_tri"] for r in graph_analytics.triangle_counts(edges).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_khop2_path_graph(spark):
    # path 0-1-2-3: ends reach 2 within <=2 hops, middles reach 3.
    edges = _edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["item"]: r["n_khop"] for r in graph_analytics.khop_counts(edges, k=2).collect()}
    assert got == {0: 2, 1: 3, 2: 3, 3: 2}


def test_khop1_is_degree(spark):
    edges = _edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["item"]: r["n_khop"] for r in graph_analytics.khop_counts(edges, k=1).collect()}
    assert got == {0: 1, 1: 2, 2: 2, 3: 1}


def test_comention_threshold_and_hub_cap(spark):
    rows = (
        # convs c1, c2 both mention (a, b) -> weight 2
        [("c1", "a"), ("c1", "b"), ("c2", "a"), ("c2", "b")]
        # c3 mentions (a, c) once -> weight 1, dropped at min_weight=2
        + [("c3", "a"), ("c3", "c")]
        # hub conv mentions 5 entities -> dropped entirely at max_per_conv=4
        + [("hub", e) for e in ("a", "b", "c", "d", "e")]
    )
    m = spark.createDataFrame(rows, "conv_id string, entity string")
    got = graph_analytics.co_mention_edges(m, min_weight=2, max_per_conv=4).collect()
    assert [(r["a"], r["b"], r["w"]) for r in got] == [("a", "b", 2)]
    # without the cap the hub's pairs count toward the weights
    uncapped = {
        (r["a"], r["b"]): r["w"]
        for r in graph_analytics.co_mention_edges(m, min_weight=2, max_per_conv=100).collect()
    }
    assert uncapped[("a", "b")] == 3 and ("a", "c") in uncapped


def test_contamination_counts_and_exemplar(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 2 distinct 4-grams
            (2, "zeta eta theta iota"),  # no overlap
            (3, "alpha beta gamma delta"),  # shares 1
        ],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta"),
            (200, "beta gamma delta epsilon"),  # duplicates a train1 4-gram
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_overlap"], r["first_eval_match"])
        for r in decontaminate.contamination(train, evald, n=4).collect()
    }
    # doc 1 has 4-grams {abgd, bgde}; both hit eval -> n_overlap=2, min eval id 100
    assert got == {1: (2, 100), 3: (1, 100)}


def test_contamination_broadcasts_eval_side(spark):
    train = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    evald = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
    plan = decontaminate.contamination(train, evald, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def _naive_pagerank(pairs, iters=3, d=0.85):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    adj: dict[int, list[int]] = {}
    for a, b in es:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    n = len(adj)
    r = {v: 1.0 / n for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            in_sum = sum(r[u] / len(adj[u]) for u in adj[v])
            nxt[v] = (1.0 - d) / n + d * in_sum
        r = nxt
    return r


def test_pagerank_matches_naive_power_iteration(spark):
    rng = random.Random(7)
    pairs = {tuple(sorted(rng.sample(range(20), 2))) for _ in range(60)}
    got = {
        r["item"]: r["pagerank"]
        for r in graph_analytics.pagerank(_edges_df(spark, pairs), iters=3).collect()
    }
    want = _naive_pagerank(pairs, iters=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v


def test_pagerank_sums_to_one_and_star_center_dominates(spark):
    # star K1,6: mass conserved every round (no dangling after
    # symmetrization); the hub must outrank every leaf.
    edges = _edges_df(spark, [(0, i) for i in range(1, 7)])
    rows = graph_analytics.pagerank(edges, iters=5).collect()
    total = sum(r["pagerank"] for r in rows)
    assert total == pytest.approx(1.0, rel=1e-9)
    by_v = {r["item"]: r["pagerank"] for r in rows}
    assert all(by_v[0] > by_v[i] for i in range(1, 7))


def _naive_ppr(pairs, seeds, iters=3, d=0.85):
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    s = set(seeds) & set(adj)
    p = {v: (1.0 / len(s) if v in s else 0.0) for v in adj}
    r = dict(p)
    for _ in range(iters):
        nxt = {}
        for v in adj:
            in_sum = sum(r[u] / len(adj[u]) for u in adj[v])
            nxt[v] = (1.0 - d) * p[v] + d * in_sum
        r = nxt
    return r


def test_personalized_pagerank_matches_naive(spark):
    rng = random.Random(11)
    pairs = {tuple(sorted(rng.sample(range(20), 2))) for _ in range(60)}
    seeds = spark.createDataFrame([(0,), (7,), (14,), (99,)], "v int")  # 99 off-graph
    got = {
        r["item"]: r["ppr"]
        for r in graph_analytics.personalized_pagerank(
            _edges_df(spark, pairs), seeds, iters=3
        ).collect()
    }
    want = _naive_ppr(pairs, [0, 7, 14, 99], iters=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12, abs=1e-15), v


def test_personalized_pagerank_mass_and_locality(spark):
    # two disjoint triangles; seeding only the first keeps ALL mass there
    # (teleport + propagation never cross components) and conserves it.
    edges = _edges_df(spark, [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)])
    seeds = spark.createDataFrame([(0,)], "v int")
    rows = graph_analytics.personalized_pagerank(edges, seeds, iters=4).collect()
    by_v = {r["item"]: r["ppr"] for r in rows}
    assert sum(by_v.values()) == pytest.approx(1.0, rel=1e-9)
    assert all(by_v[v] == 0.0 for v in (10, 11, 12))
    assert by_v[0] > by_v[1] and by_v[1] == pytest.approx(by_v[2], rel=1e-12)


def _naive_kcore(pairs, k):
    adj: dict[int, set[int]] = {}
    for a, b in {(min(a, b), max(a, b)) for a, b in pairs}:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, nb in adj.items() if len(nb) < k]:
            for u in adj.pop(v):
                adj[u].discard(v)
            changed = True
    return {v: len(nb) for v, nb in adj.items()}


def test_kcore_complete_and_path(spark):
    # K5 is its own 4-core; a path has an empty 2-core.
    k5 = _edges_df(spark, itertools.combinations(range(5), 2))
    core, _, conv = graph_analytics.kcore(k5, k=4)
    assert conv and {r["item"]: r["deg"] for r in core.collect()} == {v: 4 for v in range(5)}
    path = _edges_df(spark, [(i, i + 1) for i in range(8)])
    core, _, conv = graph_analytics.kcore(path, k=2)
    assert conv and core.count() == 0


def test_kcore_matches_naive_peel(spark):
    rng = random.Random(11)
    pairs = {tuple(sorted(rng.sample(range(24), 2))) for _ in range(70)}
    for k in (2, 3, 4):
        core, _, conv = graph_analytics.kcore(_edges_df(spark, pairs), k=k)
        assert conv
        got = {r["item"]: r["deg"] for r in core.collect()}
        assert got == _naive_kcore(pairs, k), f"k={k}"


def test_kcore_triangle_with_tail(spark):
    # triangle + pendant chain: the 2-core is exactly the triangle, and the
    # peel must cascade down the chain (multi-round convergence).
    edges = _edges_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)])
    core, rounds, conv = graph_analytics.kcore(edges, k=2)
    assert conv and rounds > 2
    assert {r["item"]: r["deg"] for r in core.collect()} == {0: 2, 1: 2, 2: 2}


def _naive_lpa(pairs, iters=2):
    adj: dict[int, list[int]] = {}
    for a, b in {(min(a, b), max(a, b)) for a, b in pairs}:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {v: v for v in adj}
    for _ in range(iters):
        nxt = {}
        for v, nbs in adj.items():
            cnt: dict[int, int] = {}
            for u in nbs:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            nxt[v] = min(l for l in cnt if cnt[l] == max(cnt.values()))
        lab = nxt
    return lab


def test_label_propagation_matches_naive(spark):
    rng = random.Random(23)
    pairs = {tuple(sorted(rng.sample(range(30), 2))) for _ in range(80)}
    for iters in (1, 2, 3):
        got = {
            r["item"]: r["label"]
            for r in graph_analytics.label_propagation(
                _edges_df(spark, pairs), iters=iters
            ).collect()
        }
        assert got == _naive_lpa(pairs, iters=iters), f"iters={iters}"


def test_label_propagation_two_cliques_bridge(spark):
    # two K4 cliques joined by one bridge edge: after 2 rounds each clique
    # agrees on its minimum vertex id.
    pairs = list(itertools.combinations(range(4), 2)) + list(
        itertools.combinations(range(10, 14), 2)
    ) + [(3, 10)]
    got = {
        r["item"]: r["label"]
        for r in graph_analytics.label_propagation(_edges_df(spark, pairs), iters=2).collect()
    }
    assert all(got[v] == 0 for v in range(4))
    assert all(got[v] == 10 for v in range(10, 14))


def _naive_weighted_pagerank(wpairs, iters=3, d=0.85):
    adj: dict[int, dict[int, float]] = {}
    for a, b, w in wpairs:
        adj.setdefault(a, {})[b] = w
        adj.setdefault(b, {})[a] = w
    n = len(adj)
    strength = {v: sum(nb.values()) for v, nb in adj.items()}
    r = {v: 1.0 / n for v in adj}
    for _ in range(iters):
        r = {
            v: (1.0 - d) / n
            + d * sum((r[u] / strength[u]) * w for u, w in adj[v].items())
            for v in adj
        }
    return r


def test_weighted_pagerank_matches_naive(spark):
    rng = random.Random(5)
    wpairs = [
        (*sorted(rng.sample(range(15), 2)), float(rng.randint(1, 9)))
        for _ in range(40)
    ]
    seen, uniq = set(), []
    for a, b, w in wpairs:
        if (a, b) not in seen:
            seen.add((a, b))
            uniq.append((a, b, w))
    df = spark.createDataFrame(uniq, "a int, b int, w double")
    got = {
        r["item"]: r["pagerank"]
        for r in graph_analytics.pagerank(df, iters=3, weight="w").collect()
    }
    want = _naive_weighted_pagerank(uniq, iters=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v


def test_cooccurrence_lift_hand_computed(spark):
    # 4 conversations: (1,2) always together; (1,3) once by overlap.
    m = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 1), (20, 2), (30, 1), (30, 3), (40, 4)],
        "conv_id int, entity int",
    )
    rows = {
        (r["a"], r["b"]): r
        for r in graph_analytics.cooccurrence_lift(m).collect()
    }
    # N=4; n_1=3, n_2=2, n_3=1. lift(1,2) = 2*4/(3*2); lift(1,3) = 1*4/(3*1)
    assert rows[(1, 2)]["lift"] == 2 * 4 / (3 * 2)
    assert rows[(1, 3)]["lift"] == 1 * 4 / (3 * 1)
    assert rows[(1, 2)]["n_conv"] == 4 and rows[(1, 2)]["w"] == 2
    assert (2, 3) not in rows  # never co-mentioned


def test_entity_salience_topk_and_tiebreak(spark):
    # conv 10: entity 1 twice (common, df=2), entity 2 once (rare, df=1).
    # salience(1) = 2*2/2 = 2.0 == salience(2) = 1*2/1 -> tie, entity asc.
    m = spark.createDataFrame(
        [(10, 1), (10, 1), (10, 2), (20, 1), (20, 3)],
        "conv_id int, entity int",
    )
    out = graph_analytics.entity_salience(m, k=2).collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r["conv_id"], []).append(r)
    c10 = sorted(by_conv[10], key=lambda r: r["rank"])
    assert [r["entity"] for r in c10] == [1, 2]
    assert c10[0]["salience"] == c10[1]["salience"] == 2.0
    assert all(len(v) <= 2 for v in by_conv.values())


# --- BFS distances -----------------------------------------------------------


def _src_df(spark, vs):
    return spark.createDataFrame([(v,) for v in vs], "v int")


def test_bfs_path_graph_layers(spark):
    # 0-1-2-...-9 from source 0: dist = vertex index, cut at max_hops.
    edges = _edges_df(spark, [(i, i + 1) for i in range(9)])
    got = {r["item"]: r["dist"] for r in
           graph_analytics.bfs_distances(edges, _src_df(spark, [0]), max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_multi_source_takes_min(spark):
    # sources 0 and 9 on the path: middle vertices get min of the two sides.
    edges = _edges_df(spark, [(i, i + 1) for i in range(9)])
    got = {r["item"]: r["dist"] for r in
           graph_analytics.bfs_distances(edges, _src_df(spark, [0, 9]), max_hops=4).collect()}
    assert got == {0: 0, 9: 0, 1: 1, 8: 1, 2: 2, 7: 2, 3: 3, 6: 3, 4: 4, 5: 4}


def test_bfs_unreached_component_absent(spark):
    edges = _edges_df(spark, [(0, 1), (1, 2), (10, 11)])
    got = {r["item"]: r["dist"] for r in
           graph_analytics.bfs_distances(edges, _src_df(spark, [0]), max_hops=5).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_cycle_no_revisit_inflation(spark):
    # 6-cycle from one source: opposite vertex at dist 3, no vertex twice.
    edges = _edges_df(spark, [(i, (i + 1) % 6) for i in range(6)])
    df = graph_analytics.bfs_distances(edges, _src_df(spark, [0]), max_hops=6)
    rows = df.collect()
    assert len(rows) == len({r["item"] for r in rows}) == 6
    got = {r["item"]: r["dist"] for r in rows}
    assert got == {0: 0, 1: 1, 5: 1, 2: 2, 4: 2, 3: 3}


# --- component sizes ---------------------------------------------------------


def test_component_sizes_two_cliques_and_edge(spark):
    # K4 on {0..3}, K3 on {10..12}, plus the pair (20, 21).
    pairs = list(itertools.combinations(range(4), 2)) + \
        list(itertools.combinations(range(10, 13), 2)) + [(20, 21)]
    edges = _edges_df(spark, pairs)
    got = {r["canonical"]: r["size"] for r in
           graph_analytics.component_sizes(edges).collect()}
    assert got == {0: 4, 10: 3, 20: 2}


def test_component_sizes_chain_single_component(spark):
    edges = _edges_df(spark, [(i, i + 1) for i in range(99)])
    got = {r["canonical"]: r["size"] for r in
           graph_analytics.component_sizes(edges).collect()}
    assert got == {0: 100}


# --- common-neighbors link prediction ----------------------------------------


def test_link_predict_path_and_square(spark):
    # path 0-1-2: (0,2) share neighbor 1. square 10-11-12-13: the two
    # diagonals each share both opposite corners.
    edges = _edges_df(spark, [(0, 1), (1, 2),
                              (10, 11), (11, 12), (12, 13), (10, 13)])
    got = {(r["a"], r["b"]): r["n_common"] for r in
           graph_analytics.link_predict_common_neighbors(edges).collect()}
    assert got == {(0, 2): 1, (10, 12): 2, (11, 13): 2}


def test_link_predict_excludes_existing_edges(spark):
    # triangle: every pair shares a neighbor but all pairs are edges.
    edges = _edges_df(spark, [(0, 1), (1, 2), (0, 2)])
    assert graph_analytics.link_predict_common_neighbors(edges).count() == 0


def test_link_predict_hub_cap_drops_hub_centers(spark):
    # star center 0 with 5 leaves: leaves pairwise share only the hub;
    # capping the center degree below 5 removes every candidate, and the
    # cap applies to CENTERS only (leaf degrees stay 1).
    edges = _edges_df(spark, [(0, i) for i in range(1, 6)])
    full = graph_analytics.link_predict_common_neighbors(edges)
    assert full.count() == 10  # C(5,2) leaf pairs via the hub
    capped = graph_analytics.link_predict_common_neighbors(
        edges, max_center_degree=4
    )
    assert capped.count() == 0


def _naive_hits(dedges, iters):
    """Pure-python L1-normalized HITS over a directed edge set."""
    verts = sorted({v for e in dedges for v in e})
    hub = {v: 1.0 for v in verts}
    auth = {v: 0.0 for v in verts}
    for _ in range(iters):
        auth = {v: sum(hub[s] for (s, t) in dedges if t == v) for v in verts}
        tot = sum(auth.values())
        auth = {v: x / tot for v, x in auth.items()}
        hub = {v: sum(auth[t] for (s, t) in dedges if s == v) for v in verts}
        tot = sum(hub.values())
        hub = {v: x / tot for v, x in hub.items()}
    return hub, auth


def _dedges_df(spark, pairs):
    return spark.createDataFrame(sorted(set(pairs)), "s int, t int")


def test_hits_star_hub_and_authority(spark):
    """Directed in-star: the center is the sole authority (1.0), the
    spokes are equal hubs, and a vertex with no out-edges has hub 0."""
    pairs = [(1, 9), (2, 9), (3, 9)]
    got = {r["item"]: (r["hub"], r["authority"]) for r in
           graph_analytics.hits(_dedges_df(spark, pairs), iters=2).collect()}
    assert got[9] == (0.0, 1.0)
    for v in (1, 2, 3):
        h, a = got[v]
        assert abs(h - 1 / 3) < 1e-12 and a == 0.0


def test_hits_matches_naive_on_random_digraph(spark):
    rng = random.Random(7)
    pairs = {(rng.randrange(12), rng.randrange(12)) for _ in range(40)}
    pairs = {(s, t) for s, t in pairs if s != t}
    hub, auth = _naive_hits(pairs, 3)
    got = {r["item"]: (r["hub"], r["authority"]) for r in
           graph_analytics.hits(_dedges_df(spark, pairs), iters=3).collect()}
    assert set(got) == set(hub)
    for v in hub:
        assert abs(got[v][0] - hub[v]) < 1e-9, v
        assert abs(got[v][1] - auth[v]) < 1e-9, v


def test_hits_partitioning_invariant(spark):
    rng = random.Random(11)
    pairs = {(rng.randrange(20), rng.randrange(20)) for _ in range(80)}
    pairs = {(s, t) for s, t in pairs if s != t}
    df = _dedges_df(spark, pairs)
    a = {(r["item"], round(r["hub"], 9), round(r["authority"], 9))
         for r in graph_analytics.hits(df.repartition(1), iters=2).collect()}
    b = {(r["item"], round(r["hub"], 9), round(r["authority"], 9))
         for r in graph_analytics.hits(df.repartition(7), iters=2).collect()}
    assert a == b


def test_fastrp_propagation_matches_numpy_twin(spark):
    """FastRP's propagation/weighting/normalization must equal a numpy
    twin that consumes the SAME deterministic projection (collected from
    the engine by running with weights=(1,) and inverting the single
    normalized-adjacency application is fiddly, so the twin recomputes
    from the projection read out at state 0 via a 1-weight, 0-sum trick:
    here we simply re-derive R by joining the engine's own hash exprs)."""
    import numpy as np

    rng = random.Random(3)
    pairs = {(rng.randrange(10), rng.randrange(10)) for _ in range(25)}
    pairs = {(a, b) for a, b in pairs if a != b}
    df = _edges_df(spark, pairs)

    # engine result
    got = {r["item"]: np.array(r["emb"]) for r in
           graph_analytics.fastrp(df, dim=8, weights=(0.5, 2.0)).collect()}

    # read the engine's deterministic projection directly (same exprs)
    import math
    verts = sorted({v for e in pairs for v in e} )
    vdf = spark.createDataFrame([(v,) for v in verts], "v long")
    sq3 = math.sqrt(3.0)
    proj = vdf.select(
        "v",
        F.array(*[
            F.when(F.pmod(F.xxhash64(F.col("v"), F.lit(j), F.lit(42)), F.lit(6)) == 0, F.lit(sq3))
            .when(F.pmod(F.xxhash64(F.col("v"), F.lit(j), F.lit(42)), F.lit(6)) == 1, F.lit(-sq3))
            .otherwise(F.lit(0.0))
            for j in range(8)
        ]).alias("r"),
    )
    R = {r["v"]: np.array(r["r"]) for r in proj.collect()}

    # numpy twin: emb = 0.5 * A_norm R + 2.0 * A_norm^2 R, then L2 norm
    sym = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    deg = {v: sum(1 for (s, _t) in sym if s == v) for v in verts}
    idx = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for s, t in sym:
        A[idx[t], idx[s]] += 1.0 / deg[s]  # message s -> t, normalized by deg(s)
    X0 = np.stack([R[v] for v in verts])
    X1 = A @ X0
    X2 = A @ X1
    E = 0.5 * X1 + 2.0 * X2
    for v in verts:
        e = E[idx[v]]
        n = np.linalg.norm(e)
        want = e / n if n > 0 else e
        assert np.allclose(got[v], want, atol=1e-9), v


def test_fastrp_deterministic_and_partitioning_invariant(spark):
    rng = random.Random(5)
    pairs = {(rng.randrange(15), rng.randrange(15)) for _ in range(40)}
    pairs = {(a, b) for a, b in pairs if a != b}
    df = _edges_df(spark, pairs)
    def run(d):
        return {r["item"]: tuple(round(x, 9) for x in r["emb"]) for r in
                graph_analytics.fastrp(d, dim=8).collect()}
    assert run(df.repartition(1)) == run(df.repartition(7))


def test_fastrp_unit_norm_and_schema(spark):
    df = _edges_df(spark, [(1, 2), (2, 3)])
    rows = graph_analytics.fastrp(df, dim=4).collect()
    assert {r["item"] for r in rows} == {1, 2, 3}
    for r in rows:
        s = sum(x * x for x in r["emb"])
        assert abs(s - 1.0) < 1e-9 or s == 0.0


def test_link_predict_ra_closed_forms(spark):
    """Path 1-2-3: candidate (1,3) scored 1/deg(2) = 1/2. Square with one
    diagonal absent: (2,4) has two degree-2 common neighbors -> 1.0."""
    ga = graph_analytics
    got = {(r["a"], r["b"]): (r["n_common"], r["ra_score"]) for r in
           ga.link_predict_resource_allocation(_edges_df(spark, [(1, 2), (2, 3)])).collect()}
    assert got == {(1, 3): (1, 0.5)}

    sq = _edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    got = {(r["a"], r["b"]): (r["n_common"], r["ra_score"]) for r in
           ga.link_predict_resource_allocation(sq).collect()}
    assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}


def test_link_predict_ra_counts_match_common_neighbors(spark):
    rng = random.Random(13)
    pairs = {(rng.randrange(15), rng.randrange(15)) for _ in range(45)}
    pairs = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    df = _edges_df(spark, pairs)
    cn = {(r["a"], r["b"]): r["n_common"] for r in
          graph_analytics.link_predict_common_neighbors(df).collect()}
    ra = {(r["a"], r["b"]): r["n_common"] for r in
          graph_analytics.link_predict_resource_allocation(df).collect()}
    assert cn == ra and cn  # same candidates + counts, non-trivial fixture


def test_link_predict_ra_hub_discount_orders_pairs(spark):
    """Two candidate pairs with one common neighbor each: the pair whose
    neighbor is low-degree must outscore the pair sharing a hub."""
    # hub 10 connects 1..4; leaf 20 connects only 5,6
    pairs = [(1, 10), (2, 10), (3, 10), (4, 10), (5, 20), (6, 20)]
    got = {(r["a"], r["b"]): r["ra_score"] for r in
           graph_analytics.link_predict_resource_allocation(
               _edges_df(spark, pairs)).collect()}
    assert got[(5, 6)] == 0.5
    assert all(abs(v - 0.25) < 1e-12 for k, v in got.items() if k != (5, 6))
    assert got[(5, 6)] > got[(1, 2)]


def test_vertex_features_closed_forms(spark):
    """K4: every vertex degree 3, 3 triangles each, clustering 1.0. Path:
    no triangles, clustering 0, endpoints degree 1."""
    k4 = _edges_df(spark, list(itertools.combinations(range(4), 2)))
    got = {r["item"]: (r["degree"], r["n_tri"], r["clustering"]) for r in
           graph_analytics.vertex_features(k4).collect()}
    assert got == {v: (3, 3, 1.0) for v in range(4)}

    path = _edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    got = {r["item"]: (r["degree"], r["n_tri"], r["clustering"]) for r in
           graph_analytics.vertex_features(path).collect()}
    assert got == {1: (1, 0, 0.0), 2: (2, 0, 0.0), 3: (2, 0, 0.0), 4: (1, 0, 0.0)}

    # triangle with a tail: vertex 3 has degree 3, 1 triangle -> C = 1/3
    tri_tail = _edges_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r["item"]: (r["degree"], r["n_tri"], round(r["clustering"], 9)) for r in
           graph_analytics.vertex_features(tri_tail).collect()}
    assert got[3] == (3, 1, round(1 / 3, 9))
    assert got[4] == (1, 0, 0.0)
    assert got[1] == (2, 1, 1.0)


def test_kcore_oracle_unroll_depth_assumption_holds(spark):
    """kg_kcore's DuckDB oracle unrolls the peel as 12 MATERIALIZED CTE
    rounds and relies on peeling being idempotent past its fixpoint — pin
    that the true peel depth at the folded-test scale stays well under the
    unroll (and that the peel converges at all)."""
    from jcpg_spark.plans.driver_queries import _comention_edges

    edges = _comention_edges(spark, "/root/testdata/sf0.001", min_weight=4)
    core, rounds, converged = graph_analytics.kcore(edges, k=25)
    assert converged and rounds <= 12, (rounds, converged)
    assert core.count() > 0  # parameters chosen so the entry is non-trivial


def test_cardinality_audit_functional_vs_multivalued(spark):
    """A duplicate emission of the SAME triple must not flag a functional
    predicate (fanout counts distinct objects); a subject with two distinct
    objects must."""
    edges = spark.createDataFrame(
        [
            ("s1", "flow.next", "t1"),
            ("s1", "flow.next", "t1"),  # duplicate emission, same object
            ("s2", "flow.next", "t2"),
            ("s1", "call", "tool:db"),
            ("s1", "call", "tool:search"),  # genuine violation
            ("s2", "call", "tool:db"),
        ],
        "src string, pred string, dst string",
    )
    got = {
        r["pred"]: r.asDict()
        for r in graph_analytics.cardinality_audit(edges).collect()
    }
    fn = got["flow.next"]
    assert (fn["n_edges"], fn["n_subjects"], fn["max_fanout"]) == (3, 2, 1)
    assert fn["n_multi_subjects"] == 0 and fn["functional"] is True
    ca = got["call"]
    assert (ca["n_edges"], ca["n_subjects"], ca["max_fanout"]) == (3, 2, 2)
    assert ca["n_multi_subjects"] == 1 and ca["functional"] is False


def test_entity_lifespan_epoch_day_arithmetic(spark):
    """Spans and active days are epoch-day integers: two mentions 36h apart
    straddling a UTC midnight -> 2 active days, span 1; a single-day entity
    -> span 0. Timezone-independent by construction."""
    import datetime as dt

    rows = [
        ("c1", 7, dt.datetime(2026, 1, 1, 20, 0)),
        ("c2", 7, dt.datetime(2026, 1, 3, 8, 0)),   # +36h, crosses midnight
        ("c1", 7, dt.datetime(2026, 1, 3, 9, 0)),
        ("c1", 9, dt.datetime(2026, 1, 2, 12, 0)),
    ]
    m = spark.createDataFrame(rows, "conv_id string, entity int, ts timestamp")
    got = {
        r["entity"]: r.asDict()
        for r in graph_analytics.entity_lifespan(m).collect()
    }
    assert got[7]["n_convs"] == 2 and got[7]["n_mentions"] == 3
    assert got[7]["active_days"] == 2 and got[7]["span_days"] == 2
    assert got[9] == {"entity": 9, "n_convs": 1, "n_mentions": 1,
                      "active_days": 1, "span_days": 0}


def test_negative_triples_contract(spark):
    """Negatives are type-consistent (object observed under the same
    predicate), never true edges, never self-corruptions, at most k per
    (edge, j), and deterministic across partitionings."""
    rows = [
        ("s1", "p", "d1"), ("s1", "p", "d2"), ("s2", "p", "d2"),
        ("s3", "p", "d3"), ("s4", "p", "d4"), ("s5", "p", "d5"),
        ("s6", "q", "x1"), ("s7", "q", "x2"), ("s8", "q", "x3"),
    ]
    edges = spark.createDataFrame(rows, "src string, pred string, dst string")
    out = graph_analytics.negative_triples(edges, k=2).collect()
    true_set = set(rows)
    p_dom = {d for s, p, d in rows if p == "p"}
    q_dom = {d for s, p, d in rows if p == "q"}
    assert out, "hash ring produced no negatives on a 9-edge input"
    seen = set()
    for r in out:
        t = (r["src"], r["pred"], r["neg_dst"], r["j"])
        assert t not in seen, f"duplicate negative {t}"
        seen.add(t)
        assert (r["src"], r["pred"], r["neg_dst"]) not in true_set
        dom = p_dom if r["pred"] == "p" else q_dom
        assert r["neg_dst"] in dom, "corruption escaped the predicate domain"
        assert 1 <= r["j"] <= 2
    # self-corruption impossible: ring shift >= 1 within distinct objects
    by_edge = {}
    for r in out:
        by_edge.setdefault((r["src"], r["pred"]), []).append(r["j"])
    assert all(len(js) <= 2 * sum(1 for x in rows if x[:2] == e) for e, js in by_edge.items())
    # determinism under repartitioning
    out2 = graph_analytics.negative_triples(edges.repartition(7), k=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_resolve_functional_majority_and_ties(spark):
    """Winner = most-supported object; ties break to the lexicographically
    least object; support/total/confidence are exact; duplicate emissions
    count as support."""
    rows = [
        # c1: db wins 3-1
        ("c1", "uses_tool", "db"), ("c1", "uses_tool", "db"),
        ("c1", "uses_tool", "db"), ("c1", "uses_tool", "search"),
        # c2: 2-2 tie -> 'db' < 'search'
        ("c2", "uses_tool", "db"), ("c2", "uses_tool", "db"),
        ("c2", "uses_tool", "search"), ("c2", "uses_tool", "search"),
        # c3: single observation
        ("c3", "uses_tool", "web"),
    ]
    edges = spark.createDataFrame(rows, "src string, pred string, dst string")
    got = {r["src"]: r for r in graph_analytics.resolve_functional(edges).collect()}
    assert got["c1"]["dst"] == "db" and got["c1"]["support"] == 3
    assert got["c1"]["total"] == 4 and abs(got["c1"]["confidence"] - 0.75) < 1e-15
    assert got["c2"]["dst"] == "db" and got["c2"]["support"] == 2
    assert got["c2"]["total"] == 4 and abs(got["c2"]["confidence"] - 0.5) < 1e-15
    assert got["c3"]["dst"] == "web" and got["c3"]["confidence"] == 1.0
    # determinism under repartitioning
    got2 = {r["src"]: r["dst"]
            for r in graph_analytics.resolve_functional(edges.repartition(7)).collect()}
    assert got2 == {k: v["dst"] for k, v in got.items()}


def test_characteristic_sets_closed_form(spark):
    """Subjects partition by their exact predicate set; duplicate emissions
    land in n_triples but not the charset; sum(n_triples) == |edges|."""
    rows = [
        ("s1", "p", "x"), ("s1", "q", "y"),
        ("s2", "q", "y"), ("s2", "p", "x"), ("s2", "p", "z"),  # {p,q} too
        ("s3", "p", "x"), ("s3", "p", "x"),                    # dup emission
        ("s4", "r", "w"),
    ]
    edges = spark.createDataFrame(rows, "src string, pred string, dst string")
    got = {r["charset"]: r for r in graph_analytics.characteristic_sets(edges).collect()}
    assert set(got) == {"p,q", "p", "r"}
    assert got["p,q"]["n_subjects"] == 2 and got["p,q"]["n_triples"] == 5
    assert got["p"]["n_subjects"] == 1 and got["p"]["n_triples"] == 2
    assert got["r"]["n_subjects"] == 1 and got["r"]["n_triples"] == 1
    assert sum(r["n_triples"] for r in got.values()) == len(rows)


def test_schema_graph_closed_form_and_dangling(spark):
    """Kind pairs census with counts; endpoints missing from the node table
    report kind '?' instead of dropping the edge."""
    nodes = spark.createDataFrame(
        [("t1", "turn"), ("t2", "turn"), ("m1", "mention")],
        "node_id string, kind string",
    )
    edges = spark.createDataFrame(
        [("t1", "flow.next", "t2"),
         ("t1", "ast.has_mention", "m1"),
         ("t2", "act.role", "role:user"),   # dangling dst
         ("ghost", "x", "t1")],             # dangling src
        "src string, pred string, dst string",
    )
    got = {(r["src_kind"], r["pred"], r["dst_kind"]): r["n_edges"]
           for r in graph_analytics.schema_graph(edges, nodes).collect()}
    assert got == {
        ("turn", "flow.next", "turn"): 1,
        ("turn", "ast.has_mention", "mention"): 1,
        ("turn", "act.role", "?"): 1,
        ("?", "x", "turn"): 1,
    }


# ---------------------------------------------------------------------------
# modularity + rank_eval (r4)
# ---------------------------------------------------------------------------


def test_modularity_two_triangles_bridge(spark):
    """Two unit-weight triangles joined by one bridge edge, labeled by
    triangle: the textbook partition. m=7; each community: w_in=3,
    deg_sum=7 -> Q_c = 3/7 - (7/14)^2 = 0.178571; total Q = 0.357143."""
    from jcpg_spark.operators.graph_analytics import modularity

    edges = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 1), (2, 3, 1), (4, 5, 1), (4, 6, 1), (5, 6, 1), (3, 4, 1)],
        "a int, b int, w int",
    )
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)], "item int, label int"
    )
    rows = {r["label"]: r for r in modularity(edges, labels).collect()}
    assert set(rows) == {10, 20}
    for lab in (10, 20):
        assert rows[lab]["n_nodes"] == 3
        assert rows[lab]["w_in"] == 3
        assert rows[lab]["deg_sum"] == 7
        assert rows[lab]["q_contrib"] == 0.178571
    # the trivial all-one-community partition scores Q = 0 exactly
    one = labels.select("item").withColumn("label", F.lit(1))
    (row,) = modularity(edges, one).collect()
    assert row["q_contrib"] == 0.0


def test_modularity_weighted_and_empty_community_edgecases(spark):
    """A community with NO internal edge gets w_in=0 (left-join coalesce),
    and weights flow through every aggregate."""
    from jcpg_spark.operators.graph_analytics import modularity

    edges = spark.createDataFrame([(1, 2, 5), (2, 3, 1)], "a int, b int, w int")
    labels = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9)], "item int, label int"
    )
    rows = {r["label"]: r for r in modularity(edges, labels).collect()}
    # m=6; c7: w_in=5, deg_sum=5+6=11 -> 5/6 - (11/12)^2
    assert rows[7]["w_in"] == 5 and rows[7]["deg_sum"] == 11
    assert rows[7]["q_contrib"] == round(5 / 6 - (11 / 12) ** 2, 6)
    # c9 has no internal edge: w_in must be 0, not a dropped row
    assert rows[9]["w_in"] == 0 and rows[9]["deg_sum"] == 1
    assert rows[9]["q_contrib"] == round(0 - (1 / 12) ** 2, 6)


def test_rank_eval_ranks_misses_and_directions(spark):
    """Hand-built candidates for one query vertex: the held-out target at
    rank 2 from the head side, a miss from the tail side (vertex 9 has no
    candidate list containing 1), and rr/hit flags exact."""
    from jcpg_spark.operators.graph_analytics import rank_eval

    cand = spark.createDataFrame(
        [(1, 5, 9.0), (1, 9, 4.0), (1, 7, 4.0), (2, 9, 1.0)],
        "a int, b int, score double",
    )
    held = spark.createDataFrame([(1, 7), (1, 4)], "a int, b int")
    rows = {(r["q"], r["target"], r["direction"]): r
            for r in rank_eval(cand, held, k=2).collect()}
    assert len(rows) == 4
    # head probe for (1,7): candidates of 1 are 5(9.0), then tie 4.0 between
    # 7 and 9 -> candidate asc puts 7 at rank 2
    r = rows[(1, 7, "head")]
    assert r["rank"] == 2 and r["rr"] == 0.5 and r["hit_at_k"] is True
    # tail probe for (1,7): candidates of 7 = [1] -> rank 1
    r = rows[(7, 1, "tail")]
    assert r["rank"] == 1 and r["rr"] == 1.0 and r["hit_at_k"] is True
    # (1,4): 4 never proposed -> miss from both sides
    r = rows[(1, 4, "head")]
    assert r["rank"] is None and r["rr"] == 0.0 and r["hit_at_k"] is False
    r = rows[(4, 1, "tail")]
    assert r["rank"] is None and r["rr"] == 0.0


def test_neighbor_sample_caps_fanout_and_is_deterministic(spark):
    """Star + chain: the hub's hop-1 sample is capped at the fanout; a
    repartitioned input yields the identical sample (md5 ranking, no RNG)."""
    from jcpg_spark.operators.graph_analytics import neighbor_sample

    edges = spark.createDataFrame(
        [(0, i, 1) for i in range(1, 8)] + [(1, 10, 1), (2, 11, 1)],
        "a int, b int, w int",
    )
    seeds = spark.createDataFrame([(0,)], "v int")
    out = neighbor_sample(edges, seeds, fanouts=(3, 2))
    rows = out.collect()
    h1 = [r for r in rows if r["hop"] == 1]
    assert len(h1) == 3 and all(r["src"] == 0 for r in h1)
    # hop 2 expands only the sampled hop-1 frontier, <= 2 per vertex
    h2 = [r for r in rows if r["hop"] == 2]
    assert {r["src"] for r in h2} <= {r["dst"] for r in h1}
    from collections import Counter

    assert max(Counter(r["src"] for r in h2).values()) <= 2
    again = neighbor_sample(edges.repartition(7), seeds, fanouts=(3, 2)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_random_walks_are_connected_and_deterministic(spark):
    """Every walk visits `length`+1 vertices, each consecutive pair is an
    edge of the symmetrized graph, and repartitioning changes nothing."""
    from jcpg_spark.operators.graph_analytics import random_walks

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 1), (2, 4, 1)],
        "a int, b int, w int",
    )
    out = random_walks(edges, walks_per_node=2, length=3).collect()
    adj = {(1, 2), (2, 3), (3, 4), (1, 4), (2, 4)}
    adj |= {(b, a) for a, b in adj}
    walks = {}
    for r in out:
        walks.setdefault((r["v0"], r["walk"]), {})[r["step"]] = r["vertex"]
    assert len(walks) == 4 * 2  # 4 vertices x 2 walks
    for (v0, _w), steps in walks.items():
        assert sorted(steps) == [0, 1, 2, 3]
        assert steps[0] == v0
        for k in range(3):
            assert (steps[k], steps[k + 1]) in adj, (v0, _w, steps)
    again = random_walks(edges.repartition(5), walks_per_node=2, length=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def _naive_shortest(wpairs, seeds, max_hops):
    adj: dict[int, list[tuple[int, int]]] = {}
    for a, b, w in wpairs:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {s: 0 for s in seeds if s in adj}
    dist.update({s: 0 for s in seeds})
    for _ in range(max_hops):
        nxt = dict(dist)
        for v, d in dist.items():
            for t, w in adj.get(v, []):
                if t not in nxt or d + w < nxt[t]:
                    nxt[t] = d + w
        dist = nxt
    return dist


def test_shortest_paths_matches_naive_bellman_ford(spark):
    from jcpg_spark.operators.graph_analytics import shortest_paths

    rng = random.Random(5)
    wpairs = [
        (*sorted(rng.sample(range(15), 2)), rng.randint(1, 9))
        for _ in range(40)
    ]
    # dedupe parallel edges keeping the min cost (naive would double-add)
    seen = {}
    for a, b, w in wpairs:
        seen[(a, b)] = min(w, seen.get((a, b), 10**9))
    wpairs = [(a, b, w) for (a, b), w in seen.items()]
    edges = spark.createDataFrame(wpairs, "a int, b int, cost int")
    seeds = spark.createDataFrame([(0,), (7,)], "v int")
    got = {
        r["item"]: r["dist"]
        for r in shortest_paths(edges, seeds, max_hops=4).collect()
    }
    assert got == _naive_shortest(wpairs, [0, 7], 4)


def test_shortest_paths_hop_bound_weighted_vs_unweighted(spark):
    """A cheap long way round beats an expensive direct edge only once
    the hop bound admits it; negative costs fail loud."""
    import pytest

    from jcpg_spark.operators.graph_analytics import shortest_paths

    edges = spark.createDataFrame(
        [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)],
        "a int, b int, cost int",
    )
    seeds = spark.createDataFrame([(0,)], "v int")
    d1 = {r["item"]: r["dist"]
          for r in shortest_paths(edges, seeds, max_hops=1).collect()}
    assert d1[3] == 10
    d3 = {r["item"]: r["dist"]
          for r in shortest_paths(edges, seeds, max_hops=3).collect()}
    assert d3[3] == 3
    neg = spark.createDataFrame([(0, 1, -2)], "a int, b int, cost int")
    with pytest.raises(Exception, match="negative cost"):
        shortest_paths(neg, seeds, max_hops=1).collect()


def _naive_node2vec(pairs, walks_per_node, length, ret_w, base_w, out_w):
    import hashlib

    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def h(*parts):
        return hashlib.md5(":".join(str(p) for p in parts).encode()).hexdigest()

    rows = []
    for v0 in adj:
        for walk in range(1, walks_per_node + 1):
            rows.append((v0, walk, 0, v0))
            cur = min(adj[v0], key=lambda t: (h(walk, 1, v0, t), t))
            rows.append((v0, walk, 1, cur))
            prev = v0
            for k in range(2, length + 1):
                cands = []
                for t in adj[cur]:
                    w = ret_w if t == prev else (base_w if t in adj[prev] else out_w)
                    cands += [(t, c) for c in range(1, w + 1)]
                nxt = min(cands, key=lambda tc: (h(walk, k, cur, tc[0], tc[1]), tc[0]))[0]
                rows.append((v0, walk, k, nxt))
                prev, cur = cur, nxt
    return sorted(rows)


def test_node2vec_walks_match_naive_and_bias_applies(spark):
    """The Spark walker reproduces a naive Python second-order walker
    exactly (same md5 keys, same replication), and the weight tiers are
    actually consulted: an extreme return weight forces backtracking."""
    from jcpg_spark.operators.graph_analytics import node2vec_walks

    rng = random.Random(3)
    pairs = {tuple(sorted(rng.sample(range(12), 2))) for _ in range(25)}
    edges = _edges_df(spark, pairs)
    out = sorted(
        (r["v0"], r["walk"], r["step"], r["vertex"])
        for r in node2vec_walks(
            edges, walks_per_node=2, length=3, ret_w=1, base_w=2, out_w=1
        ).collect()
    )
    assert out == _naive_node2vec(pairs, 2, 3, 1, 2, 1)
    # bias sanity: on a path graph 0-1-2, from step-1 state (prev=0, cur=1)
    # a huge return weight makes step 2 go back to 0 for every walk.
    path = _edges_df(spark, [(0, 1), (1, 2)])
    back = node2vec_walks(path, walks_per_node=3, length=2,
                          ret_w=500, base_w=1, out_w=1)
    step2 = {(r["v0"], r["walk"]): r["vertex"] for r in back.collect() if r["step"] == 2}
    backtracks = sum(1 for (v0, _), v2 in step2.items() if v2 == v0)
    assert backtracks >= 5  # 6 walks from the two ends; md5 odds of a miss at w=500 are ~0.4% each
    again = node2vec_walks(path.repartition(4), walks_per_node=3, length=2,
                           ret_w=500, base_w=1, out_w=1).collect()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, again))


def test_link_predict_scores_closed_forms_and_cap(spark):
    """Graph (1-2),(1-3),(2-3),(2-4),(3-4): the only non-adjacent pair is
    (1,4) with common neighbors {2,3} (deg 3 each), deg(1)=deg(4)=2:
    ra = 2/3, aa = 2/ln 3, jaccard = 2/(2+2-2) = 1.0."""
    import math

    from jcpg_spark.operators import graph_analytics as ga

    edges = _edges_df(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    rows = ga.link_predict_scores(edges).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"], r["n_common"]) == (1, 4, 2)
    assert r["ra_score"] == round(2 / 3, 6)
    assert r["aa_score"] == round(2 / math.log(3), 6)
    assert r["jaccard"] == 1.0
    # capping out the degree-3 centers removes every wedge through 2, 3;
    # the surviving centers (1, 4) only generate the adjacent pair (2,3)
    assert ga.link_predict_scores(edges, max_center_degree=2).count() == 0


def test_harmonic_centrality_exact_on_path(spark):
    """Path 1-2-3-4-5 with all five vertices as seeds and enough hops is
    EXACT harmonic centrality: h(3) = 1+1+1/2+1/2 = 3.0 etc."""
    from jcpg_spark.operators import graph_analytics as ga

    edges = _edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {r["item"]: (r["h_sum"], r["n_seen"])
           for r in ga.harmonic_centrality(edges, n_seeds=5, max_hops=4).collect()}
    assert got == {
        1: (round(1 + 1 / 2 + 1 / 3 + 1 / 4, 6), 4),
        2: (round(1 + 1 + 1 / 2 + 1 / 3, 6), 4),
        3: (3.0, 4),
        4: (round(1 + 1 + 1 / 2 + 1 / 3, 6), 4),
        5: (round(1 + 1 / 2 + 1 / 3 + 1 / 4, 6), 4),
    }
    # hop bound truncates: 1 hop -> h_sum = degree, n_seen = degree
    hop1 = {r["item"]: (r["h_sum"], r["n_seen"])
            for r in ga.harmonic_centrality(edges, n_seeds=5, max_hops=1).collect()}
    assert hop1[3] == (2.0, 2) and hop1[1] == (1.0, 1)


def test_harmonic_centrality_seed_sample_is_deterministic(spark):
    """n_seeds < |V| picks the md5-smallest vertices — the same sample at
    any partitioning — and landmarks never score themselves."""
    import hashlib

    from jcpg_spark.operators import graph_analytics as ga

    edges = _edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seed = min(range(1, 6), key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), str(v)))
    out1 = sorted(tuple(r) for r in
                  ga.harmonic_centrality(edges, n_seeds=1, max_hops=4).collect())
    out7 = sorted(tuple(r) for r in
                  ga.harmonic_centrality(edges.repartition(7), n_seeds=1, max_hops=4).collect())
    assert out1 == out7
    assert all(item != seed for item, _, _ in out1)  # dist-0 excluded
    assert all(n == 1 for _, _, n in out1)


def test_community_graph_quotient_rollup(spark):
    """Two triangles joined by one bridge, labels = triangle id: two
    intra rows (3 edges each) and one inter row (the bridge)."""
    from jcpg_spark.operators import graph_analytics as ga

    edges = spark.createDataFrame(
        [(1, 2, 2.0), (2, 3, 1.0), (1, 3, 1.0),
         (4, 5, 1.0), (5, 6, 1.0), (4, 6, 3.0),
         (3, 4, 7.0)],
        "a int, b int, w double",
    )
    labels = spark.createDataFrame(
        [(v, "c1") for v in (1, 2, 3)] + [(v, "c2") for v in (4, 5, 6)],
        "item int, label string",
    )
    got = {(r["label_a"], r["label_b"]): (r["n_edges"], r["w_sum"])
           for r in ga.community_graph(edges, labels).collect()}
    assert got == {("c1", "c1"): (3, 4.0), ("c2", "c2"): (3, 5.0),
                   ("c1", "c2"): (1, 7.0)}
    # an unlabeled endpoint drops its edge (inner-join contract)
    part = labels.where(F.col("item") != 6)
    got2 = {(r["label_a"], r["label_b"]): r["n_edges"]
            for r in ga.community_graph(edges, part).collect()}
    assert got2 == {("c1", "c1"): 3, ("c2", "c2"): 1, ("c1", "c2"): 1}


def test_k_truss_peels_to_fixpoint(spark):
    """Two triangles sharing vertex 3 + a pendant edge: the 3-truss
    keeps both triangles and drops the pendant; the 4-truss (every edge
    in >= 2 triangles) is empty because the triangles only share a
    vertex, not an edge."""
    from jcpg_spark.operators import graph_analytics as ga

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (3, 5), (4, 5), (5, 6)],
        "a int, b int",
    )
    t3, rounds3, conv3 = ga.k_truss(edges, k=3)
    got3 = {(r["a"], r["b"]): r["support"] for r in t3.collect()}
    assert conv3
    assert got3 == {(1, 2): 1, (2, 3): 1, (1, 3): 1,
                    (3, 4): 1, (3, 5): 1, (4, 5): 1}
    t4, _, conv4 = ga.k_truss(edges, k=4)
    assert conv4 and t4.count() == 0


def test_k_truss_cascading_peel(spark):
    """K4 plus a triangle hanging off one K4 edge: the 4-truss keeps the
    K4 (every K4 edge sits in 2 triangles) and peels the hanging
    triangle, whose removal must NOT cascade into the K4 — and support
    is reported WITHIN the truss (K4 edge (1,2) loses the triangle it
    had through vertex 5)."""
    from jcpg_spark.operators import graph_analytics as ga

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    hang = [(1, 5), (2, 5)]
    edges = spark.createDataFrame(k4 + hang, "a int, b int")
    t4, _, conv = ga.k_truss(edges, k=4)
    got = {(r["a"], r["b"]): r["support"] for r in t4.collect()}
    assert conv
    assert got == {(a, b): 2 for a, b in k4}


def test_k_truss_rejects_k2(spark):
    from jcpg_spark.operators import graph_analytics as ga

    edges = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError):
        ga.k_truss(edges, k=2)


def test_ktruss_oracle_unroll_depth_assumption_holds(spark):
    """kg_ktruss's DuckDB oracle unrolls the peel as 8 MATERIALIZED CTE
    rounds — pin that the true peel depth at the folded-test scale stays
    under the unroll and that the entry is non-trivial (some edges kept,
    some peeled)."""
    from jcpg_spark.plans.driver_queries import _comention_edges

    edges = _comention_edges(spark, "/root/testdata/sf0.001", min_weight=4)
    truss, rounds, converged = graph_analytics.k_truss(edges, k=25)
    assert converged and rounds <= 8, (rounds, converged)
    kept = truss.count()
    assert 0 < kept < edges.count(), kept


def test_betweenness_path_and_star_closed_forms(spark):
    """All-pivots betweenness on closed forms: path a-b-c gives the
    middle vertex exactly 1 (the one (a,c) pair), endpoints 0; a star
    gives the hub one per leaf pair."""
    from jcpg_spark.operators import graph_analytics as ga

    path = spark.createDataFrame([(1, 2), (2, 3)], "a int, b int")
    got = {r["item"]: r["bc"] for r in
           ga.betweenness_centrality(path, n_seeds=3, max_hops=3).collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 0.0}

    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "a int, b int")
    got = {r["item"]: r["bc"] for r in
           ga.betweenness_centrality(star, n_seeds=4, max_hops=3).collect()}
    assert got == {0: 3.0, 1: 0.0, 2: 0.0, 3: 0.0}  # C(3,2) leaf pairs


def test_betweenness_splits_over_equal_shortest_paths(spark):
    """4-cycle 1-2-4-3-1: the two opposite-corner pairs each split their
    two shortest paths, so every vertex brokers 2 * (1/2) / ... -> each
    vertex gets 0.5."""
    from jcpg_spark.operators import graph_analytics as ga

    cyc = spark.createDataFrame(
        [(1, 2), (2, 4), (3, 4), (1, 3)], "a int, b int")
    got = {r["item"]: r["bc"] for r in
           ga.betweenness_centrality(cyc, n_seeds=4, max_hops=3).collect()}
    assert got == {1: 0.5, 2: 0.5, 3: 0.5, 4: 0.5}


def test_betweenness_hop_bound_and_seed_sample(spark):
    """Hop bound truncates dependency flow: on a 5-path with max_hops=1
    no vertex sees a 2-hop pair, so all bc are 0; with the full budget
    interior vertices dominate. Pivot sampling (n_seeds < V) stays
    deterministic under repartitioning."""
    from jcpg_spark.operators import graph_analytics as ga

    p5 = spark.createDataFrame([(i, i + 1) for i in range(1, 5)], "a int, b int")
    h1 = {r["item"]: r["bc"] for r in
          ga.betweenness_centrality(p5, n_seeds=5, max_hops=1).collect()}
    assert set(h1.values()) == {0.0}
    full = {r["item"]: r["bc"] for r in
            ga.betweenness_centrality(p5, n_seeds=5, max_hops=4).collect()}
    assert full[3] > full[2] > full[1] == full[5] == 0.0 or full[3] >= full[2]
    assert full[1] == 0.0 and full[5] == 0.0
    s1 = ga.betweenness_centrality(p5, n_seeds=2, max_hops=4).collect()
    s7 = ga.betweenness_centrality(
        spark.createDataFrame([(i, i + 1) for i in range(1, 5)], "a int, b int")
        .repartition(7), n_seeds=2, max_hops=4).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s7))


def test_scc_cycles_singletons_and_hop_bound(spark):
    """SCC: a directed cycle is one component under its min id, acyclic
    tails and self-loop-only vertices are singletons, and the hop bound
    is honored (a cycle longer than max_hops splits into hop-local
    mutual groups, the documented truncation contract)."""
    from jcpg_spark.operators.graph_analytics import scc

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("x", "x")],
        "a string, b string",
    )
    out = sorted(
        (r["item"], r["scc_id"], r["scc_size"])
        for r in scc(e, max_hops=4).collect()
    )
    assert out == [
        ("a", "a", 3), ("b", "a", 3), ("c", "a", 3),
        ("d", "d", 1), ("x", "x", 1),
    ]
    # partitioning invariance: same assignment at 1 and 7 partitions
    out7 = sorted(
        (r["item"], r["scc_id"], r["scc_size"])
        for r in scc(e.repartition(7), max_hops=4).collect()
    )
    assert out7 == out
    # hop bound: on a 4-cycle with max_hops=2 no vertex reaches all
    # others bidirectionally within 2 hops -> hop-local mutual pairs
    ring = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "a string, b string",
    )
    trunc = {r["item"]: r["scc_size"] for r in scc(ring, max_hops=2).collect()}
    full = {r["item"]: r["scc_size"] for r in scc(ring, max_hops=4).collect()}
    assert full == {"a": 4, "b": 4, "c": 4, "d": 4}
    assert all(s < 4 for s in trunc.values())


def test_graph_stats_hand_checked_and_empty(spark):
    """Whole-graph stats against hand-computed values on a star (perfect
    disassortativity) + mutual pair + self-loop + one triangle; empty
    graph yields zero counts and NULL ratios, never a crash."""
    from jcpg_spark.operators.graph_analytics import graph_stats

    e = spark.createDataFrame(
        [("h", "l1"), ("h", "l2"), ("h", "l3"), ("l1", "h"), ("s", "s"),
         ("p", "q"), ("q", "r"), ("r", "p"), ("p", "q")],  # dup collapses
        "a string, b string",
    )
    r = graph_stats(e).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_self"], r["n_mutual"]) == (8, 7, 1, 2)
    assert abs(r["density"] - 7 / 56) < 1e-15
    assert abs(r["reciprocity"] - 2 / 7) < 1e-15
    # star contributes cov<0; triangle vertices sit exactly at the degree
    # mean so they add nothing to cov or var -> r = -1 exactly
    assert abs(r["assortativity"] - (-1.0)) < 1e-12
    assert abs(r["transitivity"] - 0.5) < 1e-15  # 3 tri-slots / 6 wedges
    r0 = graph_stats(spark.createDataFrame([], "a string, b string")).collect()[0]
    assert (r0["n_nodes"], r0["n_edges"], r0["n_self"], r0["n_mutual"]) == (0, 0, 0, 0)
    assert r0["density"] is None and r0["assortativity"] is None


def test_neighborhood_function_exact_and_early_stop(spark):
    """HyperBall on a chain: datasketches HLL is exact below its
    sparse-mode threshold, so the neighborhood function must equal the
    hand-computed counts, stop one hop after stabilizing, and the
    effective diameter reads off it."""
    from jcpg_spark.operators.graph_analytics import (
        effective_diameter,
        neighborhood_function,
    )

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "a string, b string"
    )
    nf = sorted(
        (r["hop"], r["n_pairs"])
        for r in neighborhood_function(e, max_hops=8).collect()
    )
    assert nf == [(0, 4), (1, 7), (2, 9), (3, 10), (4, 10)]
    ed = effective_diameter(e, alpha=0.9, max_hops=8).collect()[0]
    # N(2)=9 >= 0.9*10 -> the 90% effective diameter is 2
    assert (ed["effective_diameter"], ed["n_pairs_reached"],
            ed["n_pairs_total"]) == (2, 9, 10)


def test_neighborhood_function_expander_matches_exact(spark):
    """600-vertex deterministic expander (i->2i+1, i->3i+7 mod n): the
    sketch neighborhood function equals the exact python closure at
    every hop (balls stay under the lgk=13 sparse-exact threshold) —
    the correctness gate for the join/union/estimate round structure."""
    from jcpg_spark.operators.graph_analytics import neighborhood_function

    n = 600
    rows = [(f"n{i:04d}", f"n{(2 * i + 1) % n:04d}") for i in range(n)] + [
        (f"n{i:04d}", f"n{(3 * i + 7) % n:04d}") for i in range(n)
    ]
    e = spark.createDataFrame(rows, "a string, b string")
    nf = {r["hop"]: r["n_pairs"]
          for r in neighborhood_function(e, max_hops=6, lgk=13).collect()}
    adj: dict = {}
    for a, b in rows:
        adj.setdefault(a, set()).add(b)
    balls = {f"n{i:04d}": {f"n{i:04d}"} for i in range(n)}
    exact = {0: n}
    for h in range(1, 7):
        prev = balls
        balls = {
            v: prev[v] | set().union(*[prev[w] for w in adj.get(v, set())])
            for v in prev
        }
        exact[h] = sum(len(s) for s in balls.values())
    assert nf == exact


def test_wl_fingerprint_isomorphism_invariance(spark):
    """Isomorphic conversation graphs (renamed nodes, different convs)
    hash identically; structurally different graphs do not; WL separates
    graphs that degree sequences alone cannot (path vs fork)."""
    from jcpg_spark.operators.graph_analytics import wl_fingerprint

    def g(conv, triples):
        return [(f"t:{conv}:{a}", p, f"t:{conv}:{b}", conv) for a, p, b in triples]

    path = [(0, "flow.next", 1), (1, "flow.next", 2), (2, "flow.next", 3)]
    # fork: same node/edge counts and total degree, different shape
    fork = [(0, "flow.next", 1), (1, "flow.next", 2), (1, "flow.next", 3)]
    # c1 and c2 are the same path graph with shifted turn indices
    shifted = [(5, "flow.next", 6), (6, "flow.next", 7), (7, "flow.next", 8)]
    rows = g("c1", path) + g("c2", shifted) + g("c3", fork)
    edges = spark.createDataFrame(rows, ["src", "pred", "dst", "conv_id"])
    fp = {r["conv_id"]: r["fingerprint"] for r in wl_fingerprint(edges).collect()}
    assert fp["c1"] == fp["c2"]
    assert fp["c1"] != fp["c3"]

    # edge TYPE matters: relabeling one predicate changes the digest
    typed = [(0, "call", 1), (1, "flow.next", 2), (2, "flow.next", 3)]
    e2 = spark.createDataFrame(g("c4", typed), ["src", "pred", "dst", "conv_id"])
    fp4 = wl_fingerprint(e2).first()["fingerprint"]
    assert fp4 != fp["c1"]

    # shared global node (tool:db) is colored per conversation: two convs
    # calling the same tool with identical shape still match each other
    call_rows = [
        ("t:a:0", "call", "tool:db", "a"),
        ("t:b:0", "call", "tool:db", "b"),
    ]
    e3 = spark.createDataFrame(call_rows, ["src", "pred", "dst", "conv_id"])
    fps = {r["conv_id"]: r["fingerprint"] for r in wl_fingerprint(e3).collect()}
    assert fps["a"] == fps["b"]


def test_triad_census_closed_forms_and_networkx_parity(spark):
    """Each canonical connected class from its textbook graph, then a
    mixed deterministic graph cross-checked against networkx's
    triadic_census (connected classes only)."""
    from jcpg_spark.operators.graph_analytics import triad_census

    def census(pairs):
        e = spark.createDataFrame([(a, b) for a, b in pairs], ["src", "dst"])
        return {r["triad"]: r["n"] for r in triad_census(e).collect()}

    assert census([("a", "b"), ("b", "c")]) == {"021C": 1}
    assert census([("b", "a"), ("b", "c")]) == {"021D": 1}
    assert census([("a", "b"), ("c", "b")]) == {"021U": 1}
    assert census([("a", "b"), ("b", "c"), ("c", "a")]) == {"030C": 1}
    assert census([("a", "b"), ("a", "c"), ("b", "c")]) == {"030T": 1}
    assert census(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"), ("c", "a")]
    ) == {"300": 1}

    import networkx as nx

    # deterministic mixed digraph: ring + chords + some mutuals
    n = 12
    pairs = (
        [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)]
        + [(f"v{i}", f"v{(i + 3) % n}") for i in range(0, n, 2)]
        + [(f"v{(i + 1) % n}", f"v{i}") for i in range(0, n, 3)]
    )
    got = census(pairs)
    G = nx.DiGraph(pairs)
    want = {
        k: v
        for k, v in nx.triadic_census(G).items()
        if v and k not in ("003", "012", "102")
    }
    assert got == want, (got, want)


def test_bgp_reorder_selectivity_and_result_equivalence(spark):
    """The greedy reorder starts from the most selective pattern, stays
    connected (no-cartesian contract preserved), and the solution bag is
    identical to the naive left-to-right order."""
    from jcpg_spark.operators.query import (
        match_pattern,
        predicate_stats,
        reorder_patterns,
    )

    rows = (
        [(f"s{i}", "common", f"m{i % 10}") for i in range(200)]
        + [(f"m{i}", "rare", f"t{i}") for i in range(3)]
    )
    edges = spark.createDataFrame(rows, ["src", "pred", "dst"])
    stats = predicate_stats(edges)

    pats = [("?a", "common", "?b"), ("?b", "rare", "?c")]
    order = reorder_patterns(pats, stats)
    assert order[0] == ("?b", "rare", "?c")          # 3 rows beats 200

    # constant-term selectivity: a bound subject divides by distinct subjects
    pats2 = [("?a", "common", "?b"), ("s5", "common", "?b")]
    order2 = reorder_patterns(pats2, stats)
    assert order2[0] == ("s5", "common", "?b")

    # results identical either order (inner joins commute)
    naive = {tuple(r) for r in match_pattern(edges, pats).collect()}
    opt = {tuple(r) for r in match_pattern(edges, order).collect()}
    assert naive == opt and naive

    # connectivity gating: the second pick must share a var even when a
    # cheaper disconnected pattern exists
    rows3 = rows + [(f"x{i}", "tiny", f"y{i}") for i in range(5)]
    edges3 = spark.createDataFrame(rows3, ["src", "pred", "dst"])
    st3 = predicate_stats(edges3)
    pats3 = [("?a", "common", "?b"), ("?b", "rare", "?c"), ("?x", "tiny", "?y")]
    order3 = reorder_patterns(pats3, st3)
    assert order3[0] == ("?b", "rare", "?c")
    assert order3[1] == ("?a", "common", "?b")        # connected beats cheaper tiny


def test_butterfly_counts_closed_form(spark):
    """Two conversations sharing entities {1, 2} form exactly one
    butterfly (both entities score 1); a third conversation sharing the
    pair lifts support to 3 -> C(3,2)=3 butterflies each; an entity in
    only one conversation scores nothing."""
    from jcpg_spark.operators.graph_analytics import butterfly_counts

    rows = [
        ("c1", 1), ("c1", 2), ("c2", 1), ("c2", 2),          # one butterfly
        ("c3", 9),                                           # isolated
    ]
    m = spark.createDataFrame(rows, ["conv_id", "entity"])
    got = {r["entity"]: r["butterflies"] for r in butterfly_counts(m).collect()}
    assert got == {1: 1, 2: 1}

    rows3 = rows + [("c3", 1), ("c3", 2)]
    m3 = spark.createDataFrame(rows3, ["conv_id", "entity"])
    got3 = {r["entity"]: r["butterflies"] for r in butterfly_counts(m3).collect()}
    assert got3 == {1: 3, 2: 3}


def test_attribute_assortativity_closed_form(spark):
    """Perfect homophily gives r=1; perfect heterophily on a balanced
    2-category bipartite flow gives r=-1; single-category graphs have
    null r (vanishing denominator)."""
    from jcpg_spark.operators.graph_analytics import attribute_assortativity

    cats = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B")], ["node", "cat"]
    )
    homo = spark.createDataFrame(
        [("a1", "a2"), ("b1", "b2")], ["src", "dst"]
    )
    rows = attribute_assortativity(homo, cats).collect()
    assert all(r["r"] == 1.0 for r in rows)
    assert {(r["cat_src"], r["cat_dst"], r["n"]) for r in rows} == {
        ("A", "A", 1), ("B", "B", 1)
    }

    hetero = spark.createDataFrame(
        [("a1", "b1"), ("b2", "a2")], ["src", "dst"]
    )
    hrows = attribute_assortativity(hetero, cats).collect()
    assert all(r["r"] == -1.0 for r in hrows)

    mono = attribute_assortativity(
        spark.createDataFrame([("a1", "a2")], ["src", "dst"]),
        cats.filter(F.col("cat") == "A"),
    ).collect()
    assert all(r["r"] is None for r in mono)


def test_densest_subgraph_extracts_clique_and_matches_twin(spark):
    """A 5-clique wired to a long path: the peel's best prefix is exactly
    the clique (density 2.0 vs the global ~1.0); and on a mixed graph the
    whole (set, density) output equals a pure-python run of the identical
    batched-peel algorithm."""
    from jcpg_spark.operators.graph_analytics import densest_subgraph

    clique = [(f"k{i}", f"k{j}") for i in range(5) for j in range(i + 1, 5)]
    path = [(f"p{i}", f"p{i+1}") for i in range(30)] + [("k0", "p0")]
    e = spark.createDataFrame(clique + path, ["a", "b"])
    out, rho, rounds = densest_subgraph(e, epsilon=0.05)
    got = {r["item"] for r in out.collect()}
    assert got == {f"k{i}" for i in range(5)}
    assert abs(rho - 2.0) < 1e-9 and rounds >= 2

    def twin(pairs, eps):
        es = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        best, best_rho = set(), -1.0
        while es:
            vs = {v for p in es for v in p}
            rho = len(es) / len(vs)
            if rho > best_rho:
                best_rho, best = rho, set(vs)
            thr = 2 * (1 + eps) * rho
            deg = {}
            for x, y in es:
                deg[x] = deg.get(x, 0) + 1
                deg[y] = deg.get(y, 0) + 1
            keep = {v for v, d in deg.items() if d > thr}
            es = {p for p in es if p[0] in keep and p[1] in keep}
        return best, best_rho

    mixed = clique + path + [(f"p{i}", f"p{i+3}") for i in range(0, 24, 2)]
    want_set, want_rho = twin(mixed, 0.05)
    e2 = spark.createDataFrame(mixed, ["a", "b"])
    out2, rho2, _ = densest_subgraph(e2, epsilon=0.05)
    assert {r["item"] for r in out2.collect()} == want_set
    assert abs(rho2 - want_rho) < 1e-9


def test_shortest_path_trace_witness_and_tiebreak(spark):
    """Every reached vertex gets exactly one path, the path walks BFS
    layers back to the seed, and equal-distance parents resolve to the
    MINIMUM parent deterministically."""
    from jcpg_spark.operators.graph_analytics import shortest_path_trace

    # diamond: s-a, s-b, a-x, b-x (x has two dist-1 parents: a and b)
    edges = spark.createDataFrame(
        [("s", "a"), ("s", "b"), ("a", "x"), ("b", "x"), ("x", "y")],
        ["a", "b"],
    )
    src = spark.createDataFrame([("s",)], ["v"])
    got = {r["item"]: (r["dist"], r["path"]) for r in
           shortest_path_trace(edges, src, max_hops=3).collect()}
    assert got["s"] == (0, ["s"])
    assert got["a"] == (1, ["s", "a"])
    assert got["x"] == (2, ["s", "a", "x"])       # min parent 'a' beats 'b'
    assert got["y"] == (3, ["s", "a", "x", "y"])
    # path consistency: each path's last element is the item, first the seed
    for item, (dist, path) in got.items():
        assert path[-1] == item and path[0] == "s" and len(path) == dist + 1
