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
