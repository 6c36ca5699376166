"""Diagnose the NLMPC matched-state command-error tail (round-5 task #6).

BENCH_r04: ``nlmpc_closed_loop_cmd_err_matched_max`` = 3.2e-3 vs mean
3.2e-5 — round 4 attributed the tail to near-degenerate activity of the
``u <= 0.5`` constraint in one sentence.  This script produces the
per-instance evidence (the LMPC tail got in round 4):

* re-runs the matched-state shadow rollout (plant teleported onto the f64
  oracle's trajectory, so every step solves the oracle's exact problem);
* ranks (instance, step) pairs by command error;
* for each tail member reports: both commands' distance to the 0.5 bound
  (active-set disagreement = one side clipped, the other not), the SQP
  iteration count/status, and whether the error is explained by the
  constraint-activity flip rather than solve inaccuracy.

Run on hardware:  python misc/diagnose_nlmpc_tail.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import _make_vdp, _vdp_closed_loop_inputs
    from libmpc_tpu import NLParameters
    from libmpc_tpu.rollout import nlmpc_rollout

    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "vdp_closed_loop_ref_f64.npz")
    ref = np.load(ref_path)
    B0, K0 = int(ref["B"]), int(ref["K"])
    dtype = jnp.float32
    params = NLParameters(maximum_iteration=30, enable_warm_start=True,
                          inner_qp="fused", hessian_reg="gershgorin")

    ostates = jnp.asarray(ref["states"], dtype)

    def plant_shadow(x, u, k):
        return ostates[:, k + 1]

    cs, _ = _make_vdp(dtype, params)
    rs = nlmpc_rollout(cs, plant_shadow, ostates[:, 0],
                       jnp.zeros((B0, 1), dtype), K0)
    u32 = np.asarray(rs.inputs)[:, :, 0]          # (B, K)
    u64 = np.asarray(ref["inputs"])[:, :, 0]
    its = np.asarray(rs.iterations)
    sts = np.asarray(rs.statuses)
    err = np.abs(u32 - u64)

    warm = err[:, 1:]
    print(f"matched-state warm-step error: mean={warm.mean():.3e} "
          f"p99={np.quantile(warm, 0.99):.3e} max={warm.max():.3e}")

    # the tail: all warm (instance, step) pairs in the top decade below
    # the max (the 3.2e-3-vs-3.2e-5 gap the round-4 verdict flagged)
    thr = max(float(warm.max()) / 10.0, 1e-4)
    bi, ki = np.nonzero(err > thr)
    keep = ki > 0
    bi, ki = bi[keep], ki[keep]
    order = np.argsort(-err[bi, ki])
    print(f"\ntail members (err > {thr:.1e}): {len(bi)} of {warm.size} "
          f"instance-steps")
    UB = 0.5
    n_flip = 0
    n_both_active = 0
    for j in order[:25]:
        b, k = int(bi[j]), int(ki[j])
        d32 = UB - u32[b, k]
        d64 = UB - u64[b, k]
        active32 = abs(d32) < 1e-6
        active64 = abs(d64) < 1e-6
        flip = active32 != active64
        n_flip += int(flip)
        n_both_active += int(active32 and active64)
        print(f"  inst {b:4d} step {k:2d}: err={err[b, k]:.2e}  "
              f"u32={u32[b, k]:+.6f} (bound dist {d32:+.2e}, "
              f"active={active32})  u64={u64[b, k]:+.6f} "
              f"(bound dist {d64:+.2e}, active={active64})  "
              f"flip={flip}  iters={its[b, k]}  status={sts[b, k]}")
    total = len(order)
    # classify the whole tail
    d32_all = UB - u32[bi, ki]
    d64_all = UB - u64[bi, ki]
    act32 = np.abs(d32_all) < 1e-6
    act64 = np.abs(d64_all) < 1e-6
    flips = act32 != act64
    near = (np.abs(d64_all) < 5e-3) | (np.abs(d32_all) < 5e-3)
    print(f"\ntail classification over all {total} members:")
    print(f"  active-set flip (one side clipped at 0.5, other free): "
          f"{int(flips.sum())}")
    print(f"  both clipped: {int((act32 & act64).sum())}")
    print(f"  within 5e-3 of the bound on either side: {int(near.sum())}")
    print(f"  status!=SUCCESS in tail: "
          f"{int((sts[bi, ki] != 0).sum())}")
    # error explained by bound distance: if the oracle's u sits eps below
    # 0.5 and f32 clips (or vice versa), |err| <= |d64| + |d32|
    explained = err[bi, ki] <= np.abs(d64_all) + np.abs(d32_all) + 1e-6
    print(f"  |err| bounded by the two bound distances (pure activity "
          f"disagreement): {int(explained.sum())}")


if __name__ == "__main__":
    main()
