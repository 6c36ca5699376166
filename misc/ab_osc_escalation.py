"""Hardware A/B (round-5 task #2): oscillator throughput vs IPM cap policy.

Round-4 record (docs/performance.md): flat IPM cap 30 -> 461 solves/s at
0.991 success; flat 45 + stall freeze -> 327.9 at 0.999.  The escalating
per-lane cap (NLParameters.inner_iters / inner_iters_recovery) aims to
keep both.  Also reports the B-scaling curve (task #2's second half).

Run on hardware:  python misc/ab_osc_escalation.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def build(B, **upd):
    from bench import _oscillator_dynamics
    from libmpc_tpu import NLMPC, NLParameters

    dtype = jnp.float32
    ph, ch, nx, nu = 20, 10, 12, 6
    c = NLMPC(nx, nu, nx, ph, ch, (ph + 1) * nu, 0, dtype=dtype)
    c.set_discretization_sampling_time(0.1)
    c.set_state_space_function(_oscillator_dynamics)
    c.set_objective_function(lambda X, Y, U, e: jnp.sum(X**2) + jnp.sum(U**2))
    c.set_ineq_con_function(lambda X, Y, U, e: (U - 0.5).reshape(-1))
    c.set_optimizer_parameters(NLParameters(
        maximum_iteration=30, enable_warm_start=True,
        hessian_reg="gauss_newton", inner_qp="fused", **upd))
    return c


def run(name, B=256, K=8, **upd):
    from bench import _oscillator_dynamics
    from libmpc_tpu.rollout import nlmpc_rollout

    dtype = jnp.float32
    nx, nu, ts = 12, 6, 0.1
    c = build(B, **upd)
    rng = np.random.default_rng(13)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, nx)), dtype)
    noise = jnp.asarray(0.01 * rng.normal(size=(K, B, nx)), dtype)

    def plant(x, u, k):
        step = jax.vmap(_oscillator_dynamics, in_axes=(0, 0, None))(x, u, k)
        return x + ts * step + noise[k]

    u0 = jnp.zeros((B, nu), dtype)
    try:
        r = nlmpc_rollout(c, plant, x0, u0, K)
        jax.block_until_ready(r.inputs)
        t0 = time.perf_counter()
        r = nlmpc_rollout(c, plant, x0 + jnp.asarray(1e-6, dtype), u0, K)
        jax.block_until_ready(r.inputs)
        rate = B * K / (time.perf_counter() - t0)
    except Exception as e:
        print(f"{name}: FAULT {type(e).__name__}", flush=True)
        return
    sts = np.asarray(r.statuses)
    its = np.asarray(r.iterations)
    print(f"{name}: B={B} {rate:7.1f} solves/s  success="
          f"{(sts == 0).mean():.4f}  sqp_iters={its.mean():.2f}", flush=True)


if __name__ == "__main__":
    # NOTE: the recorded round-5 run (misc/results/ROUND5_MEASUREMENTS.txt)
    # predates the engine-default change from esc30/60 back to flat 45 —
    # every arm is therefore explicit here so the script stays
    # reproducible regardless of the defaults.
    run("flat45      ", inner_iters=45, inner_iters_recovery=45)
    run("esc30/60    ", inner_iters=30, inner_iters_recovery=60)
    run("esc30/45    ", inner_iters=30, inner_iters_recovery=45)
    run("esc30/60 rst", inner_iters=30, inner_iters_recovery=60,
        cold_restart_on_failure=True)
    run("flat30      ", inner_iters=30, inner_iters_recovery=30)
    run("30+rescue45 ", inner_iters=30, inner_iters_recovery=30,
        rescue_iters=45)
    # B-scaling of the shipped config (round-5 task #2 second half)
    for B in (512, 1024):
        run("30+rescue45 ", B=B, K=4, inner_iters=30,
            inner_iters_recovery=30, rescue_iters=45)
