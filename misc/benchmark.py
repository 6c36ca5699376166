"""Example-suite benchmark driver (parity: misc/benchmark.py of the
reference, which runs the four example executables under psutil and records
process metrics to results.csv — reference misc/benchmark.py:100-109).

Runs the four example configurations end-to-end (quadrotor LMPC single +
fleet, Van der Pol, UGV, networked oscillators), several repetitions each,
and records wall time, peak RSS, IO MB read/written, max thread count and
voluntary/involuntary context switches to ``results.csv`` — the same metric
set as the reference driver (measured as per-run deltas of this process,
since the examples are library calls here, not separate executables).

Usage:  python misc/benchmark.py [--runs N] [--out results.csv]
"""

import argparse
import csv
import importlib
import os
import resource
import sys
import time

import psutil

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

TARGETS = [
    "quadrotor_ex",
    "vanderpol_ex",
    "ugv_ex",
    "networked_oscillators_ex",
]

_PROC = psutil.Process()


def _io_counters():
    try:
        io = _PROC.io_counters()
        return io.read_bytes, io.write_bytes
    except (psutil.AccessDenied, AttributeError, NotImplementedError):
        return 0, 0


def run_once(name: str) -> dict:
    mod = importlib.import_module(name)
    read0, write0 = _io_counters()
    ctx0 = _PROC.num_ctx_switches()
    max_threads = _PROC.num_threads()
    t0 = time.perf_counter()
    mod.main()
    elapsed = time.perf_counter() - t0
    read1, write1 = _io_counters()
    ctx1 = _PROC.num_ctx_switches()
    max_threads = max(max_threads, _PROC.num_threads())
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    return {
        "target": name,
        "exec_time_s": round(elapsed, 3),
        "peak_rss_mb": round(peak_rss_mb, 1),
        "total_read_mb": round((read1 - read0) / 2**20, 3),
        "total_write_mb": round((write1 - write0) / 2**20, 3),
        "max_threads": max_threads,
        "ctx_switches_voluntary": ctx1.voluntary - ctx0.voluntary,
        "ctx_switches_involuntary": ctx1.involuntary - ctx0.involuntary,
    }


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
