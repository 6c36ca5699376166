"""Float64 oracles for the plant-coupled closed-loop benchmarks.

Generates, on CPU in double precision with accuracy-reference solver
settings, the closed-loop input trajectories that ``bench.py``'s
``closed_loop_cmd_max_err_vs_f64`` / ``nlmpc_closed_loop_cmd_max_err_vs_f64``
fields compare against.  The benchmark inputs are deterministic
(``bench._closed_loop_inputs`` / ``bench._vdp_closed_loop_inputs`` with fixed
seeds), so the oracles are computed once and committed.

Usage:
  LIBMPC_PLATFORM=cpu JAX_ENABLE_X64=1 python misc/closed_loop_ref.py
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

# oracle sub-batch: first B0 instances / first K0 steps of the bench inputs
B0 = 64
K0 = 16


def lmpc_oracle():
    from __graft_entry__ import _quadrotor_model, _quadrotor_setup
    from bench import _closed_loop_inputs
    from libmpc_tpu import LParameters
    from libmpc_tpu.rollout import lmpc_rollout

    dtype = jnp.float64
    c = _quadrotor_setup(dtype)
    # accuracy-reference settings: tight tolerances, dense per-instance
    # polish, plenty of iterations — NOT the production configuration
    c.set_optimizer_parameters(LParameters(
        maximum_iteration=4000, enable_warm_start=True, warm_start_shift=True,
        eps_abs=1e-9, eps_rel=1e-9, rho=0.1,
        polish=True, polish_mode="dense", use_pallas=False,
    ))
    Ad, Bd = _quadrotor_model()
    Adj, Bdj = jnp.asarray(Ad, dtype), jnp.asarray(Bd, dtype)
    x0_h, noise_h = _closed_loop_inputs(B0, K0)
    noise = jnp.asarray(noise_h, dtype)

    def plant(x, u, k):
        return x @ Adj.T + u @ Bdj.T + noise[k]

    r = lmpc_rollout(c, plant, jnp.asarray(x0_h, dtype),
                     jnp.zeros((B0, 4), dtype), K0)
    sts = np.asarray(r.statuses)
    assert (sts == 0).all(), f"oracle not fully solved: {np.bincount(sts.ravel())}"
    path = os.path.join(RESULTS, "closed_loop_ref_f64.npz")
    np.savez(path, inputs=np.asarray(r.inputs), states=np.asarray(r.states),
             B=B0, K=K0)
    print(f"saved LMPC closed-loop f64 oracle (B={B0}, K={K0}) -> {path}")


def nlmpc_oracle():
    from bench import _make_vdp, _vdp_closed_loop_inputs
    from libmpc_tpu import NLParameters
    from libmpc_tpu.rollout import nlmpc_rollout

    dtype = jnp.float64
    # accuracy-reference engine: exact-eigh curvature + interior-point QP
    params = NLParameters(maximum_iteration=100, enable_warm_start=True,
                          inner_qp="pdip", hessian_reg="eigh")
    c, vdp = _make_vdp(dtype, params)
    x0_h, noise_h = _vdp_closed_loop_inputs(B0, K0)
    noise = jnp.asarray(noise_h, dtype)
    ts = 0.1

    def plant(x, u, k):
        return x + ts * jax.vmap(vdp, in_axes=(0, 0, None))(x, u, k) + noise[k]

    r = nlmpc_rollout(c, plant, jnp.asarray(x0_h, dtype),
                      jnp.zeros((B0, 1), dtype), K0)
    sts = np.asarray(r.statuses)
    ok = (sts == 0).mean()
    assert ok == 1.0, f"oracle success fraction {ok}"
    path = os.path.join(RESULTS, "vdp_closed_loop_ref_f64.npz")
    np.savez(path, inputs=np.asarray(r.inputs), states=np.asarray(r.states),
             B=B0, K=K0)
    print(f"saved NLMPC closed-loop f64 oracle (B={B0}, K={K0}) -> {path}")


if __name__ == "__main__":
    assert jnp.zeros(()).dtype == jnp.float64, "run with JAX_ENABLE_X64=1"
    os.makedirs(RESULTS, exist_ok=True)
    lmpc_oracle()
    nlmpc_oracle()
