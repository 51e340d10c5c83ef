"""Launch bench.py the moment the ambient window tests clean.

The sandbox host sees multi-hour contamination waves; the certified-
minimum protocol survives them, but the best records come from launching
into a quiet window. This watcher samples the same canary probe + steal
counters the bench gates use, and execs bench.py when a short window
passes the clean bar (probe p50 within 1.08x of the historical clean
floor, steal < 1%). One run per invocation; a max-wait fallback launches
anyway so a record always lands.

Usage: python tools/bench_watcher.py <out_log> [max_wait_sec]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from jcpg_spark.plans.hostnoise import _quantile, probe_once, read_cpu_stat  # noqa: E402

def _hist_floor() -> float:
    """Committed certified-clean probe floor (BENCH/probe_anchor.json) —
    the same anchor bench.py's gates use, so the watcher's launch bar
    tracks the anchor instead of rotting as cleaner windows are recorded
    (it previously hardcoded 0.0596 while the anchor had tightened to
    0.05)."""
    import json

    try:
        with open(os.path.join(REPO, "BENCH", "probe_anchor.json")) as f:
            return float(json.load(f)["probe_floor"])
    except (OSError, KeyError, ValueError):
        return 0.0596


HIST_FLOOR = _hist_floor()


def window_clean(n: int = 6, rel: float = 1.08, steal_max: float = 0.01) -> bool:
    s0 = read_cpu_stat()
    probes = []
    for _ in range(n):
        probes.append(probe_once())
        time.sleep(1.0)
    s1 = read_cpu_stat()
    steal = (s1["steal"] - s0["steal"]) / max(1, s1["total"] - s0["total"])
    p50 = _quantile(probes, 0.5)
    print(f"[watch] probe_p50={p50:.4f} steal={steal:.4f}", flush=True)
    return p50 <= HIST_FLOOR * rel and steal <= steal_max


def main() -> None:
    out_log = sys.argv[1]
    max_wait = int(sys.argv[2]) if len(sys.argv) > 2 else 7200
    probe_once()  # warmup: first call pays the numpy import + 128MB alloc
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if window_clean():
            print(f"[watch] clean window after {time.time() - t0:.0f}s — launching", flush=True)
            break
        time.sleep(45)
    else:
        print(f"[watch] max wait {max_wait}s exhausted — launching anyway", flush=True)
    with open(out_log, "w") as f:
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "bench.py")],
            stdout=f, stderr=subprocess.STDOUT, cwd=REPO,
        )
    print(f"[watch] bench rc={rc}", flush=True)


if __name__ == "__main__":
    main()
