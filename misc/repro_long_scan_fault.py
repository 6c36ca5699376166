"""Minimal reproducer for the long-scan transport fault (round-5 task #7).

Context (docs/performance.md): one-shot UGV closed-loop rollouts past ~30
steps at batch 256 fault deterministically on the axon TPU transport with
``jax.errors.JaxRuntimeError: UNAVAILABLE: TPU device error`` at the first
``block_until_ready`` — while the same loop chunked into <=30-step device
programs (bench.py::_ugv_run_chunks) completes.  The workaround is
contained (rollout.py ``chunk_steps``, bit-identical-tested); this script
pins down the smallest faulting configuration so the attribution is
recorded, not anecdotal.

Protocol: each probe runs in a SUBPROCESS (a faulting run can wedge the
tunnel client state), binary-searching the smallest K that faults for the
UGV rollout at B=256.  A healthy probe prints the rollout checksum; a
faulting one prints the exception type/message.

Run on hardware:  python misc/repro_long_scan_fault.py
"""

import json
import os
import subprocess
import sys

_PROBE = r"""
import sys, json, dataclasses
sys.path.insert(0, {repo!r})
import numpy as np, jax, jax.numpy as jnp
from bench import _make_ugv
from libmpc_tpu.rollout import nlmpc_rollout

K = int(sys.argv[1]); B = int(sys.argv[2])
dtype = jnp.float32
c, plant, params_fn, x0, *_ = _make_ugv(dtype, B)
# pin the round-4 configuration the fault was characterized with (the
# banded-IPM engine; program device-time per step is what trips the
# transport, so the probe must hold the per-step cost constant)
c.set_optimizer_parameters(dataclasses.replace(
    c._params, hessian_reg="gershgorin", inner_qp="riccati",
    cold_restart_on_failure=False, rescue_iters=0))
try:
    r = nlmpc_rollout(c, plant, x0, jnp.zeros((B, 2), dtype), K,
                      params_fn=params_fn)
    jax.block_until_ready(r.inputs)
    print(json.dumps({{"ok": True,
                       "checksum": float(np.asarray(r.inputs).sum())}}))
except Exception as exc:
    print(json.dumps({{"ok": False, "type": type(exc).__name__,
                       "msg": str(exc)[:300]}}))
"""


def probe(K, B=256, timeout=1200):
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    code = _PROBE.format(repo=repo)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code, str(K), str(B)],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"ok": False, "type": "Timeout", "msg": f">{timeout}s"}
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {"ok": False, "type": "NoOutput",
            "msg": (out.stderr or "")[-300:]}


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    results = {}
    # bracket: 30 is known-good (the production chunk size), 60 known-bad
    lo, hi = 30, 60
    r_lo, r_hi = probe(lo, B), probe(hi, B)
    results[lo], results[hi] = r_lo, r_hi
    print(f"K={lo}: {r_lo}", flush=True)
    print(f"K={hi}: {r_hi}", flush=True)
    if not r_lo.get("ok") or r_hi.get("ok"):
        print("bracket assumption violated — fault is not reproducing "
              "as documented; record this run as evidence either way")
    else:
        while hi - lo > 1:
            mid = (lo + hi) // 2
            r = probe(mid, B)
            results[mid] = r
            print(f"K={mid}: {r}", flush=True)
            if r.get("ok"):
                lo = mid
            else:
                hi = mid
        print(f"\nsmallest faulting K at B={B}: {hi} "
              f"(largest passing: {lo})")
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", f"long_scan_fault_B{B}.json")
    with open(out_path, "w") as fh:
        json.dump({"B": B, "probes": {str(k): v for k, v in
                                      sorted(results.items())}}, fh, indent=1)
    print(f"recorded -> {out_path}")


if __name__ == "__main__":
    main()
