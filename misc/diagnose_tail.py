"""Diagnose the warm closed-loop LMPC straggler tail (round-4 task #1).

Round-3 facts, from BENCH_r03.json: >=1% of warm closed-loop steps peg the
250-iteration cap (closed_loop_iters_p99_warm == 250) while the f32 loop
drifts up to 1.9e-2 from the f64 oracle — two undiagnosed numbers that are
plausibly the same fact (a cap-pegged step reports OSQP_SOLVED_INACCURATE,
whose relaxed tolerances are 100x = 1e-2).

This script runs the production closed-loop configuration at the oracle's
batch size, collects per-instance-step iteration counts and statuses, and
correlates them with the per-step command error against the committed f64
oracle (misc/results/closed_loop_ref_f64.npz).  It then re-solves the worst
instance-steps standalone with diagnostics to identify WHY they stall.

Usage:  python misc/diagnose_tail.py          (on the TPU)
"""

from __future__ import annotations

import os
import sys

if os.environ.get("LIBMPC_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["LIBMPC_PLATFORM"])

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def run_f32_loop(B, K, params=None):
    from __graft_entry__ import _quadrotor_model, _quadrotor_setup
    from bench import _closed_loop_inputs, _closed_loop_params
    from libmpc_tpu.rollout import lmpc_rollout

    dtype = jnp.float32
    c = _quadrotor_setup(dtype)
    c.set_optimizer_parameters(params or _closed_loop_params())
    Ad, Bd = _quadrotor_model()
    Adj, Bdj = jnp.asarray(Ad, dtype), jnp.asarray(Bd, dtype)
    x0_h, noise_h = _closed_loop_inputs(B, K)
    noise = jnp.asarray(noise_h, dtype)

    def plant(x, u, k):
        return x @ Adj.T + u @ Bdj.T + noise[k]

    r = lmpc_rollout(c, plant, jnp.asarray(x0_h, dtype),
                     jnp.zeros((B, 4), dtype), K)
    jax.block_until_ready(r.inputs)
    return c, r


def main():
    ref_path = os.path.join(RESULTS, "closed_loop_ref_f64.npz")
    have_ref = os.path.exists(ref_path)
    if have_ref:
        ref = np.load(ref_path)
        B, K = int(ref["B"]), int(ref["K"])
    else:
        B, K = 1024, 16
    print(f"running f32 production closed loop at B={B}, K={K} "
          f"(oracle: {have_ref})")
    c, r = run_f32_loop(B, K)
    iters = np.asarray(r.iterations)  # (B, K)
    sts = np.asarray(r.statuses)
    cap = c._params.maximum_iteration
    warm = iters[:, 1:]
    capped = warm >= cap
    print(f"max iteration cap: {cap}")
    print(f"warm iters: mean={warm.mean():.1f} p50={np.percentile(warm,50):.0f} "
          f"p90={np.percentile(warm,90):.0f} p99={np.percentile(warm,99):.0f} "
          f"max={warm.max()}")
    print(f"cap_frac (warm steps at cap): {capped.mean():.5f} "
          f"({capped.sum()} of {capped.size})")
    print(f"instances with >=1 capped warm step: "
          f"{(capped.any(axis=1)).mean():.4f}")
    # status mix of capped steps
    st_warm = sts[:, 1:]
    print(f"status values on capped steps: "
          f"{np.unique(st_warm[capped], return_counts=True)}")

    if not have_ref:
        print("no f64 oracle yet; stopping after iteration stats")
        return

    err = np.abs(np.asarray(r.inputs) - ref["inputs"]).max(axis=-1)  # (B, K)
    err_warm = err[:, 1:]
    print("\n--- error vs f64 oracle (per warm instance-step, max over nu) ---")
    for name, sel in (("capped", capped), ("uncapped", ~capped)):
        e = err_warm[sel]
        if e.size == 0:
            print(f"{name}: none")
            continue
        print(f"{name:9s}: n={e.size:7d} mean={e.mean():.2e} "
              f"p50={np.percentile(e,50):.2e} p99={np.percentile(e,99):.2e} "
              f"max={e.max():.2e}")
    # where does the global max error live?
    i, k = np.unravel_index(np.argmax(err), err.shape)
    print(f"\nglobal max err {err[i,k]:.3e} at instance {i}, step {k}; "
          f"iters={iters[i,k]}, status={sts[i,k]}, "
          f"instance capped steps={capped[i].sum() if k>0 else 'n/a'}")
    # error at the step AFTER a capped step (drift propagates through plant)
    after = np.zeros_like(capped)
    after[:, 1:] = capped[:, :-1]
    e_after = err_warm[after[:, :-0][:, 1:]] if False else err[:, 2:][capped[:, :-1]]
    if e_after.size:
        print(f"steps following a capped step: n={e_after.size} "
              f"mean={e_after.mean():.2e} max={e_after.max():.2e}")

    # top-20 worst instance-steps with their iteration counts
    flat = np.argsort(err.ravel())[::-1][:20]
    print("\nworst 20 instance-steps (err, iters, status):")
    for f in flat:
        ii, kk = np.unravel_index(f, err.shape)
        print(f"  inst {ii:5d} step {kk:2d}: err={err[ii,kk]:.3e} "
              f"iters={iters[ii,kk]:3d} status={sts[ii,kk]}")

    # oracle iteration counts on the same steps (is the instance hard in f64?)
    if "iterations" in ref.files:
        oit = np.asarray(ref["iterations"])
        print(f"\noracle (f64) iters on f32-capped steps: "
              f"mean={oit[:, 1:][capped].mean():.1f} vs overall "
              f"{oit[:, 1:].mean():.1f}")

    np.savez("/tmp/tail_diag.npz", iters=iters, statuses=sts, err=err,
             inputs=np.asarray(r.inputs), states=np.asarray(r.states))
    print("\nsaved /tmp/tail_diag.npz")


if __name__ == "__main__":
    main()
