"""Record the canonical single-core CPU baseline (BASELINE_CPU.json).

The reference publishes no throughput numbers (BASELINE.md), so the stand-in
for "C++ single-core filter-updates/sec" is the same filter math jit-compiled
by XLA-CPU for a single f64 instance. Live re-measurement every bench run
proved too fragile on a shared host (VERDICT r2 "What's weak" #3: the
round-1 -> round-2 vs_baseline swing was denominator noise, not TPU speedup),
so this script takes the **median of N long runs** per scenario, stamps an
environment fingerprint, and writes the committed artifact that
``bench.py::load_canonical_baseline`` divides by. Re-run only deliberately
(new hardware, changed filter math) — ``bench.py`` logs a live sanity check
against this file on every run.

Usage:  python tools/measure_baseline.py [--runs N] [--scenarios a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import statistics
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402  (before bench so config wins over any sitecustomize)

# A TPU-terminal sitecustomize may have force-selected the hardware backend
# via jax.config; env vars alone don't undo that (same workaround as
# tests/conftest.py). The baseline is single-core CPU by definition.
jax.config.update("jax_platforms", "cpu")

SCENARIOS = ("pose_full", "pose", "velocity", "bottom", "indirect")


def _cpu_model() -> str:
    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith("model name"):
                return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return platform.processor() or "unknown"


def measure(scenario: str, runs: int) -> dict:
    import bench

    samples = []
    for i in range(runs):
        if scenario == "pose_full":
            v = bench.bench_pose_full_cpu_single(iters=3, repeats=3)
        else:
            v = bench.bench_cpu_single(scenario, iters=300)
        samples.append(v)
        print(f"  run {i + 1}/{runs}: {v:.1f} steps/s", file=sys.stderr)
    return {
        "steps_per_sec": round(statistics.median(samples), 1),
        "samples": [round(s, 1) for s in samples],
        "spread": round(max(samples) / min(samples), 3),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs", type=int, default=5, help="long runs per scenario (median wins)")
    ap.add_argument("--scenarios", default=",".join(SCENARIOS))
    ap.add_argument("--out", default=str(ROOT / "BASELINE_CPU.json"))
    args = ap.parse_args(argv)

    import jax

    out = {
        "what": (
            "canonical single-instance f64 XLA-CPU baseline (C++-semantics "
            "stand-in); median of long runs on this host. bench.py divides "
            "its TPU number by scenarios[*].steps_per_sec."
        ),
        "recorded_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "environment": {
            "cpu": _cpu_model(),
            "cores": os.cpu_count(),
            "platform": platform.platform(),
            "python": platform.python_version(),
            "jax": jax.__version__,
            "load_avg_at_start": os.getloadavg()[0],
        },
        "method": {
            "runs_per_scenario": args.runs,
            "aggregate": "median of per-run best-of-repeats",
            "single_run": "bench.bench_cpu_single / bench.bench_pose_full_cpu_single",
        },
        "scenarios": {},
    }
    for sc in args.scenarios.split(","):
        sc = sc.strip()
        print(f"measuring {sc} ...", file=sys.stderr)
        out["scenarios"][sc] = measure(sc, args.runs)

    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)
    print(json.dumps({k: v["steps_per_sec"] for k, v in out["scenarios"].items()}))


if __name__ == "__main__":
    main()
