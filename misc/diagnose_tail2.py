"""Tail diagnosis, part 2: separate solver error from trajectory divergence.

Part 1 (diagnose_tail.py) showed the f32-vs-f64 closed-loop command error is
NOT concentrated on cap-pegged steps — the worst errors occur on steps that
converged in 20 iterations.  Hypothesis: the error is closed-loop
*trajectory divergence* (tiny early command differences compound through the
marginally-stable quadrotor plant and the two loops visit different states),
not per-solve inaccuracy.

Test: a "shadow rollout" — run the f32 production solver along the ORACLE's
state trajectory (plant teleports to the oracle's next state, warm starts
evolve on that same trajectory), so each step solves the IDENTICAL problem
the f64 oracle solved.  The matched-state command error isolates pure solver
accuracy.

Also re-runs the real rollout capturing exit residuals per step to see where
the cap-pegged instances' residuals sit relative to the f32 floor.

Usage:  python misc/diagnose_tail2.py   (on the TPU)
"""

from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def main():
    from __graft_entry__ import _quadrotor_setup
    from bench import _closed_loop_params
    from libmpc_tpu.rollout import lmpc_rollout

    ref = np.load(os.path.join(RESULTS, "closed_loop_ref_f64.npz"))
    B, K = int(ref["B"]), int(ref["K"])
    ostates = jnp.asarray(ref["states"], jnp.float32)  # (B, K+1, nx)
    oinputs = np.asarray(ref["inputs"])  # (B, K, nu)

    dtype = jnp.float32
    c = _quadrotor_setup(dtype)
    c.set_optimizer_parameters(_closed_loop_params())

    # shadow rollout: teleport the plant onto the oracle trajectory
    def plant(x, u, k):
        return ostates[:, k + 1]

    r = lmpc_rollout(c, plant, ostates[:, 0], jnp.zeros((B, 4), dtype), K)
    jax.block_until_ready(r.inputs)
    err = np.abs(np.asarray(r.inputs) - oinputs).max(axis=-1)  # (B, K)
    iters = np.asarray(r.iterations)
    warm_err = err[:, 1:]
    capped = iters[:, 1:] >= c._params.maximum_iteration
    print(f"matched-state (shadow) command error, B={B} K={K}:")
    print(f"  all warm : mean={warm_err.mean():.2e} "
          f"p50={np.percentile(warm_err,50):.2e} "
          f"p99={np.percentile(warm_err,99):.2e} max={warm_err.max():.2e}")
    print(f"  cold     : mean={err[:,0].mean():.2e} max={err[:,0].max():.2e}")
    print(f"  cap_frac (shadow): {capped.mean():.5f}")
    if capped.any():
        print(f"  capped steps err: mean={warm_err[capped].mean():.2e} "
              f"max={warm_err[capped].max():.2e}")
        print(f"  uncapped err    : mean={warm_err[~capped].mean():.2e} "
              f"max={warm_err[~capped].max():.2e}")

    # per-step growth of the REAL rollout error (from part 1's npz)
    diag = np.load("/tmp/tail_diag.npz")
    err_real = diag["err"]  # (B, K)
    print("\nreal closed-loop error growth by step (mean / max over batch):")
    for k in range(K):
        print(f"  step {k:2d}: mean={err_real[:,k].mean():.2e} "
              f"max={err_real[:,k].max():.2e}")

    # state divergence of the real rollout vs oracle
    states_real = diag["states"]  # (B, K+1, nx)
    sd = np.abs(states_real - np.asarray(ref["states"])).max(axis=-1)
    print("\nreal state divergence by step (mean / max):")
    for k in range(0, K + 1, 3):
        print(f"  step {k:2d}: mean={sd[:,k].mean():.2e} max={sd[:,k].max():.2e}")


if __name__ == "__main__":
    main()
