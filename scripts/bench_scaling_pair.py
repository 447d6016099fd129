"""Same-window local[32] vs local[8] full-surface bench pair.

The r10 scaling block was unreadable because its two runs landed on
host windows ~2x apart (calibration 0.632 vs 0.307) — and the bench's
own calibration job is itself parallel (32 partitions), so it
conflates host speed with the core count under test. This script runs
the two benches BACK-TO-BACK in one window and brackets each with a
SINGLE-THREADED, Spark-independent host probe (fixed seeded NumPy
workload), so a reader can (a) check the two runs saw the same host
and (b) attribute per-query ratios to parallelism, not drift.

Usage: python scripts/bench_scaling_pair.py [sf_dir] [out_json]
Writes {"c32": <bench json>, "c8": <bench json>,
        "host_probe_sec": {...}} to out_json (default
BENCH_r11_scaling.json next to bench.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def host_probe() -> float:
    """Single-threaded fixed workload (~1 s on a healthy window)."""
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.standard_normal((600, 600))
    t0 = time.time()
    x = a.copy()
    for _ in range(12):
        x = x @ a
        x /= np.abs(x).max()
    acc = 0
    for i in range(2_000_000):  # pure-interpreter component
        acc = (acc * 1103515245 + i) & 0x7FFFFFFF
    assert x.shape == (600, 600) and acc >= 0
    return round(time.time() - t0, 3)


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(os.path.join(REPO, "BENCH_LAST.json")) as f:
        return json.load(f)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_r11_scaling.json"
    )
    probes = {"before_c32": host_probe()}
    c32 = run_bench(32, sf_dir)
    probes["between"] = host_probe()
    c8 = run_bench(8, sf_dir)
    probes["after_c8"] = host_probe()
    result = {"c32": c32, "c8": c8, "host_probe_sec": probes}
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    drift = max(probes.values()) / max(1e-9, min(probes.values()))
    print(
        json.dumps(
            {
                "c32_total": c32["value"],
                "c8_total": c8["value"],
                "ratio": round(c8["value"] / c32["value"], 3),
                "host_probe_drift": round(drift, 3),
                "out": out,
            }
        )
    )


if __name__ == "__main__":
    main()
