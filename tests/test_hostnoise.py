"""Unit tests for the bench noise instrumentation (plans/hostnoise.py)."""

from __future__ import annotations

import time

from jcpg_spark.plans import hostnoise as hn


def test_read_cpu_stat_shape_and_monotonicity():
    a = hn.read_cpu_stat()
    assert set(a) == {"user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal", "total"}
    assert all(v >= 0 for v in a.values())
    time.sleep(0.2)
    b = hn.read_cpu_stat()
    assert b["total"] >= a["total"]
    assert b["steal"] >= a["steal"]  # counters never go backwards


def test_probe_and_calibration_positive_and_bounded():
    # min over several probes: a single probe under full-suite CPU
    # contention (32 Spark threads) can land 3x off, which is exactly the
    # noise the probe exists to measure — bound the MINIMA, not one sample
    t = min(hn.probe_once() for _ in range(3))
    assert 0.005 < t < 5.0  # fixed workload: non-trivial, not hung
    calib = hn.calibrate_probe(n=3)
    assert 0 < calib <= max(t * 3, 1.0)


def test_sampler_report_scopes_to_window():
    s = hn.NoiseSampler(interval=0.2)
    # synthetic samples: clean early window, a steal burst later
    stat0 = {k: 0 for k in ("user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal")}
    stat0["total"] = 0

    def stat(total, steal, idle):
        d = dict(stat0)
        d.update(total=total, steal=steal, idle=idle)
        return d

    s.samples = [
        (100.0, 0.06, stat(0, 0, 0)),
        (110.0, 0.06, stat(1000, 5, 900)),     # clean decade
        (120.0, 0.20, stat(2000, 500, 1000)),  # burst decade: 50% steal
    ]
    clean = s.report(window=(100.0, 110.0))
    burst = s.report(window=(110.0, 120.0))
    assert clean["steal_frac"] == 0.005 and clean["probe_p50"] == 0.06
    assert burst["steal_frac"] == 0.495 and burst["probe_p50"] >= 0.06
    assert clean["n_probes"] == 2


def test_classify_gates():
    clean = {"n_probes": 10, "steal_frac": 0.004, "probe_p50": 0.062, "probe_p75": 0.066}
    stolen = {"n_probes": 10, "steal_frac": 0.08, "probe_p50": 0.062, "probe_p75": 0.066}
    slowed = {"n_probes": 10, "steal_frac": 0.004, "probe_p50": 0.09, "probe_p75": 0.1}
    assert hn.classify(clean, probe_clean=0.06) is None
    assert "steal" in hn.classify(stolen, probe_clean=0.06)
    assert "probe" in hn.classify(slowed, probe_clean=0.06)
    # no probes (degenerate) -> no verdict rather than a crash
    assert hn.classify({"n_probes": 0}, probe_clean=0.06) is None


def test_sampler_thread_collects_real_samples():
    with hn.NoiseSampler(interval=0.2) as s:
        time.sleep(0.7)
    assert len(s.samples) >= 3  # enter + ticks + exit
    rep = s.report()
    assert rep["n_probes"] == len(s.samples)
    assert 0 <= rep["steal_frac"] < 1


def test_wall_anchor_annotation():
    """bench.wall_vs_hist: committed clean-minimum walls annotate runs with
    their fractional excess; mismatched input or missing data -> None."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    anchor = {"turns": 6310262, "walls": {1: 200.0, 4: 50.0}}
    assert bench.wall_vs_hist({"wall_sec": 230.0, "turns": 6310262}, 1, anchor) == 0.15
    assert bench.wall_vs_hist({"wall_sec": 45.0, "turns": 6310262}, 4, anchor) == -0.1
    # different input size: anchor does not apply
    assert bench.wall_vs_hist({"wall_sec": 10.0, "turns": 44227}, 1, anchor) is None
    # unanchored level, blackout run, absent anchor
    assert bench.wall_vs_hist({"wall_sec": 60.0, "turns": 6310262}, 8, anchor) is None
    assert bench.wall_vs_hist({"wall_sec": None, "turns": 6310262}, 1, anchor) is None
    assert bench.wall_vs_hist({"wall_sec": 60.0, "turns": 6310262}, 1, None) is None

    # the committed anchor file parses and matches the standard scaling input
    a = bench.load_wall_anchor()
    assert a is not None and a["turns"] == 6310262
    assert all(isinstance(k, int) and v > 0 for k, v in a["walls"].items())


def test_hist_context_direction_honest():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert bench.hist_context(None, 0.2) is None
    assert bench.hist_context(0.02, 0.05) is None          # both near-clean
    both = bench.hist_context(0.16, 0.22)
    assert both and "session-wide" in both
    under = bench.hist_context(0.026, 0.102)               # live 0.771 case
    assert under and "UNDERSTATED" in under
    over = bench.hist_context(0.18, 0.03)
    assert over and "OVERSTATED" in over


def test_classify_run_wall_corroboration():
    """v4.4: a probe/bw flag is overridden when the wall sits within the
    corroboration bound of the committed clean anchor; a steal flag never
    is; past the bound the flag stands; no anchor -> flag stands."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    clean = {"n_probes": 10, "steal_frac": 0.0001, "probe_p50": 0.051,
             "bw_p50": 0.0085}
    hot_probe = dict(clean, probe_p50=0.070)
    hot_bw = dict(clean, bw_p50=0.0125)
    stolen = dict(clean, steal_frac=0.06)

    # clean window, clean verdict
    assert bench.classify_run(clean, 0.02, 0.05, 0.0083) == (None, None)
    # probe flag + wall at anchor -> corroborated clean
    why, note = bench.classify_run(hot_probe, 0.03, 0.05, 0.0083)
    assert why is None and "wall sits" in note
    # bw flag + wall at anchor -> corroborated clean
    why, note = bench.classify_run(hot_bw, -0.01, 0.05, 0.0083)
    assert why is None and note
    # probe flag + wall past the bound -> stays contaminated
    why, note = bench.classify_run(hot_probe, 0.15, 0.05, 0.0083)
    assert why and why.startswith("probe") and note is None
    # probe flag + no anchor -> stays contaminated
    why, note = bench.classify_run(hot_probe, None, 0.05, 0.0083)
    assert why and note is None
    # steal is a hard gate even at the anchor
    why, note = bench.classify_run(stolen, 0.0, 0.05, 0.0083)
    assert why and why.startswith("steal") and note is None


def _load_bench():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def test_compact_line_under_driver_tail_capture():
    """v5 (r4 verdict task 1): the ONE stdout line must survive the
    driver's ~4KB tail capture — BENCH_r04 recorded parsed:null because
    the line carried run logs + per-query noise (4.6-6.2KB) and its head
    fell off the capture. Worst-case synthetic record: every field at its
    widest observed value, 11 headline queries, long basis note."""
    bench = _load_bench()
    result = {
        "metric": "kg_pipeline_wall_sec",
        "value": 88.888,
        "unit": "sec",
        "queries": {f"a_very_long_query_name_number_{i:02d}": 123.456789
                    for i in range(16)},
        "sf": 0.1,
        "triples": 55_000_000,
        "scaling": {
            "local1_wall_sec": 198.61,
            "local4_wall_sec": 52.55,
            "local1_triples_per_sec": 275941,
            "local4_triples_per_sec": 1047332,
            "scaling_efficiency": 0.863,
            "efficiency_basis": "certified-common-mode-pair",
            "basis_note": "x" * 500,       # must NOT ride the stdout line
            "anchor_implied_efficiency": 0.856,
            "pair_match_gap": 0.008,
            "turns": 6310262,
            "minima_vs_hist": {"lo": 0.076, "hi": 0.068},
            "context": "y" * 400,          # ditto
            "gates": {f"g{i}": 0.123 for i in range(12)},
            "runs": [{"cpus": 1, "wall_sec": 198.61, "noise": {}}] * 14,
        },
        "query_noise": {f"q{i}": {"steal_frac": 0.0001} for i in range(12)},
    }
    line = bench.compact_line(result, 1, 4)
    assert len(line) < 2048
    import json

    parsed = json.loads(line)
    # the graded fields all survive
    assert parsed["metric"] == "kg_pipeline_wall_sec"
    assert parsed["scaling"]["scaling_efficiency"] == 0.863
    assert parsed["scaling"]["efficiency_basis"] == "certified-common-mode-pair"
    assert parsed["scaling"]["anchor_implied_efficiency"] == 0.856
    assert parsed["scaling"]["local1_wall_sec"] == 198.61
    assert parsed["scaling"]["runs_summary"] == {"n": 14, "clean": 14}
    # the bulk fields do not
    assert "runs" not in parsed["scaling"]
    assert "basis_note" not in parsed["scaling"]
    assert "query_noise" not in parsed
    assert "gates" not in parsed["scaling"]


def test_common_mode_pair_matches_r4_session():
    """v5 (r4 verdict task 2): the exact shape that produced r4's
    fallback-basis record — every lo probe flagged under session-wide
    pressure, walls +7.6..+17.8% over anchor, hi at +6.8% — now certifies
    via the matched-excess pair, and the pair picked is the closest gap."""
    bench = _load_bench()
    anchor = {"turns": 6310262, "walls": {1: 168.62, 4: 49.22}}

    def run(cpus, wall, steal=0.0001):
        return {"wall_sec": wall, "turns": 6310262,
                "triples_per_sec": int(52e6 / wall),
                "noise": {"n_probes": 10, "steal_frac": steal}}

    lo_runs = [run(1, 198.61), run(1, 181.44), run(1, 191.25)]
    hi_runs = [run(4, 52.55), run(4, 55.9)]
    got = bench.common_mode_pair(lo_runs, hi_runs, anchor, 1, 4)
    assert got is not None
    rl, rh, gap = got
    assert rl["wall_sec"] == 181.44 and rh["wall_sec"] == 52.55
    assert gap <= 0.01
    eff = (rh["triples_per_sec"] / rl["triples_per_sec"]) / 4
    assert 0.8 < eff < 0.95

    # a stolen run can never anchor the pair (steal is measured in-window)
    got = bench.common_mode_pair(
        [run(1, 181.44, steal=0.06)], hi_runs, anchor, 1, 4)
    assert got is None
    # gross excess breaks the common-mode model even if the gap matches
    got = bench.common_mode_pair(
        [run(1, 168.62 * 1.4)], [run(4, 49.22 * 1.4)], anchor, 1, 4)
    assert got is None
    # excess gap past PAIR_MATCH_MAX -> no certification
    got = bench.common_mode_pair(
        [run(1, 198.61)], [run(4, 49.5)], anchor, 1, 4)
    assert got is None
    # no anchor -> no pair
    assert bench.common_mode_pair(lo_runs, hi_runs, None, 1, 4) is None
