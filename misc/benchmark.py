"""Example-suite benchmark driver (parity: misc/benchmark.py of the
reference, which runs the four example executables under psutil and records
process metrics to results.csv).

Runs the four example configurations end-to-end (quadrotor LMPC single +
fleet, Van der Pol, UGV, networked oscillators), several repetitions each,
and records wall time, per-solve statistics and peak RSS to ``results.csv``.

Usage:  python misc/benchmark.py [--runs N] [--out results.csv]
"""

import argparse
import csv
import importlib
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

TARGETS = [
    "quadrotor_ex",
    "vanderpol_ex",
    "ugv_ex",
    "networked_oscillators_ex",
]


def run_once(name: str) -> dict:
    mod = importlib.import_module(name)
    t0 = time.perf_counter()
    mod.main()
    elapsed = time.perf_counter() - t0
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    return {"target": name, "exec_time_s": round(elapsed, 3),
            "peak_rss_mb": round(peak_rss_mb, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default="results.csv")
    args = ap.parse_args()

    rows = []
    for target in TARGETS:
        for run in range(args.runs):
            row = run_once(target)
            row["run"] = run
            rows.append(row)
            print(row, flush=True)

    with open(args.out, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
