"""Stage-by-stage timing of one batched LMPC control step on the TPU.

Isolates where a production step's time goes at the bench configuration
(quadrotor, B=16384): q/l/u assembly, ADMM iterations (no polish), the
shared-factorization polish, solution unpack, and the full solve_body.

Measurement rules for the axon tunnel (see project notes): every jitted
program returns a SCALAR, every timed call uses a DISTINCT input (identical
(executable, input) pairs are result-cached), and every program is warmed
before timing.

Usage: python misc/profile_lmpc.py [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, args_list, reps=6):
    """Median wall time of fn over distinct pre-staged arg tuples."""
    for a in args_list[:2]:
        jax.block_until_ready(fn(*a))
    ts = []
    for i in range(reps):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    from __graft_entry__ import _quadrotor_setup
    from libmpc_tpu import LParameters
    from libmpc_tpu.lmpc import problem as qp
    from libmpc_tpu.lmpc.controller import build_prepared, solve_body
    from libmpc_tpu.ops import admm

    dtype = jnp.float32
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    c = _quadrotor_setup(dtype)
    base = dict(maximum_iteration=100, enable_warm_start=True, rho=0.01)
    p_no = LParameters(polish=False, **base)
    p_sh = LParameters(polish=True, polish_mode="shared", **base)
    c.set_optimizer_parameters(p_sh)
    dims, prob = c.dims, c._prob
    built = build_prepared(dims, p_sh, prob, c._y_ref, c._u_ref, c._du_ref, c._u_meas)
    P, A, lineq, uineq, prep = built
    eq_mask = jnp.arange(dims.m) < dims.n_eq

    rng = np.random.default_rng(0)
    n_inputs = 6
    x0s = [jnp.asarray(0.05 * rng.normal(size=(B, 12)), dtype) for _ in range(n_inputs)]
    u0 = jnp.zeros((B, 4), dtype)

    # pre-stage q/l/u and a converged warm start for the solver stages
    @jax.jit
    def assemble(x0):
        q, l, u = qp.build_time_varying(
            dims, prob, lineq, uineq, x0, u0, c._y_ref, c._u_ref, c._du_ref, c._u_meas
        )
        return q, l, u

    # the warm solve MUST be jitted: an eager batched solve dispatches
    # thousands of individual programs over the device tunnel (>25 min at
    # B=16384, measured) where the compiled program takes ~0.1 s
    @jax.jit
    def stage_warm(q, l, u):
        with jax.default_matmul_precision("highest"):
            sol = admm.admm_solve(
                P, A, q, l, u, params=p_no, prepared=prep, eq_mask=eq_mask
            )
            return sol.x, sol.y

    with jax.default_matmul_precision("highest"):
        staged = [jax.block_until_ready(assemble(x)) for x in x0s]
        print("staged q/l/u", flush=True)
        warm_x, warm_y = jax.block_until_ready(stage_warm(*staged[0]))
        print("staged warm start", flush=True)

    @jax.jit
    def t_assemble(x0):
        with jax.default_matmul_precision("highest"):
            q, l, u = qp.build_time_varying(
                dims, prob, lineq, uineq, x0, u0,
                c._y_ref, c._u_ref, c._du_ref, c._u_meas,
            )
            return jnp.sum(q) + jnp.sum(jnp.where(jnp.isfinite(l), l, 0.0))

    def make_solver(params):
        @jax.jit
        def run(q, l, u):
            with jax.default_matmul_precision("highest"):
                sol = admm.admm_solve(
                    P, A, q, l, u, params=params, prepared=prep,
                    eq_mask=eq_mask, warm_x=warm_x, warm_y=warm_y,
                )
                return jnp.sum(sol.x) + jnp.sum(sol.iters)
        return run

    @jax.jit
    def t_unpack(q):
        with jax.default_matmul_precision("highest"):
            states, inputs, outputs = qp.unpack_solution(
                dims, prob, warm_x, c._u_meas
            )
            return jnp.sum(inputs) + jnp.sum(states) + jnp.sum(outputs) + q[0, 0]

    def make_body(params, b):
        @jax.jit
        def run(x0):
            result, seq, sx, sy, iters = solve_body(
                dims, params, prob, x0, u0,
                c._y_ref, c._u_ref, c._du_ref, c._u_meas,
                warm_x, warm_y, jnp.asarray(True), jnp.zeros((B, 4), dtype),
                built=b,
            )
            return jnp.sum(result.cmd) + jnp.sum(sx)
        return run

    print(f"B={B} device={jax.devices()[0]}", flush=True)
    stages = [
        ("assemble q/l/u", t_assemble, [(x,) for x in x0s]),
        ("admm no polish", make_solver(p_no), staged),
        ("admm + shared polish", make_solver(p_sh), staged),
        ("unpack sequences", t_unpack, [(s[0],) for s in staged]),
        ("solve_body no polish", make_body(p_no, built), [(x,) for x in x0s]),
        ("solve_body polish", make_body(p_sh, built), [(x,) for x in x0s]),
    ]
    for name, fn, args in stages:
        ms = timeit(fn, args)
        print(f"{name:26s} {ms:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
