"""One-process TPU tuning sweep (run when the chip is available).

Batches every open tuning question into a single process (the axon tunnel
allows one TPU client at a time; each compiled program costs minutes of
remote compile, so everything runs from one script with flushed output so a
timeout still leaves partial results):

  1. LMPC polish_active_cap sweep (polish cost vs cap) at the bench config;
  2. LMPC maximum_iteration sweep (lockstep-tail cost of stragglers);
  3. NLMPC batch-size scaling (1024 / 2048 / 4096);
  4. NLMPC hessian_reg A/B (gershgorin vs power) at the bench config.

Every timed program returns device arrays consumed once at the end of the
rep loop; inputs differ per rep (identical (executable, input) pairs are
result-cached by the transport).

Usage: python misc/tpu_sweep.py [section ...]   (default: all)
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: harmless if the backend ignores it, an
# hours-level saving per session if it works over the remote-compile path
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8


def _rate_lmpc(params, B=16384, reps=REPS):
    """Pipelined steady-state LMPC solves/s at the bench configuration."""
    from __graft_entry__ import _quadrotor_setup
    from libmpc_tpu.lmpc.controller import build_prepared, solve_body

    dtype = jnp.float32
    c = _quadrotor_setup(dtype)
    c.set_optimizer_parameters(params)
    dims, prob = c.dims, c._prob
    built = build_prepared(dims, params, prob,
                           c._y_ref, c._u_ref, c._du_ref, c._u_meas)

    @jax.jit
    def step(x0, u0, warm_x, warm_y, have_warm):
        result, seq, sol_x, sol_y, iters = solve_body(
            dims, params, prob, x0, u0,
            c._y_ref, c._u_ref, c._du_ref, c._u_meas,
            warm_x, warm_y, have_warm, jnp.zeros_like(u0), built=built,
        )
        return result.cmd, sol_x, sol_y, iters

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.05 * rng.normal(size=(B, 12)), dtype)
    u = jnp.zeros((B, 4), dtype)
    wx = jnp.zeros((B, dims.nz), dtype)
    wy = jnp.zeros((B, dims.m), dtype)
    u, wx, wy, it = step(x0, u, wx, wy, jnp.asarray(False))
    jax.block_until_ready(u)
    u, wx, wy, it = step(x0, u, wx, wy, jnp.asarray(True))
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    for _ in range(reps):
        u, wx, wy, it = step(x0, u, wx, wy, jnp.asarray(True))
    jax.block_until_ready(u)
    dt = time.perf_counter() - t0
    return B * reps / dt, float(jnp.mean(it))


def _rate_nlmpc(params, B=1024, reps=6):
    """Pipelined steady-state VdP NLMPC solves/s."""
    from libmpc_tpu import NLMPC

    def vdp(x, u, k):
        return jnp.stack([(1.0 - x[1] * x[1]) * x[0] - x[1] + u[0], x[0]])

    c = NLMPC(2, 1, 2, 10, 5, 11, 0, dtype=jnp.float32)
    c.set_discretization_sampling_time(0.1)
    c.set_optimizer_parameters(params)
    c.set_state_space_function(vdp)
    c.set_objective_function(lambda X, Y, U, e: jnp.sum(X**2) + jnp.sum(U**2))
    c.set_ineq_con_function(lambda X, Y, U, e: U[:, 0] - 0.5)
    c.set_stats_mode("lazy")
    rng = np.random.default_rng(0)
    x0 = np.asarray(rng.uniform(-1, 1, size=(B, 2)), np.float32)
    res = c.optimize(x0, np.zeros((B, 1), np.float32))
    res = c.optimize(x0, res.cmd)
    jax.block_until_ready(res.cmd)
    t0 = time.perf_counter()
    for _ in range(reps):
        res = c.optimize(x0, res.cmd)
    jax.block_until_ready(res.cmd)
    rate = B * reps / (time.perf_counter() - t0)
    success = float(np.mean(np.asarray(res.status) == 0))
    return rate, success


def section_polish_cap():
    from libmpc_tpu import LParameters

    for cap in (24, 32, 40, 56):
        p = LParameters(maximum_iteration=100, enable_warm_start=True,
                        polish=True, polish_mode="shared", rho=0.01,
                        polish_active_cap=cap)
        r, it = _rate_lmpc(p)
        print(f"polish_active_cap={cap:3d}: {r:9.1f} solves/s "
              f"(iters {it:.1f})", flush=True)


def section_max_iter():
    from libmpc_tpu import LParameters

    for mi in (75, 100, 150):
        p = LParameters(maximum_iteration=mi, enable_warm_start=True,
                        polish=True, polish_mode="shared", rho=0.01)
        r, it = _rate_lmpc(p)
        print(f"maximum_iteration={mi:3d}: {r:9.1f} solves/s "
              f"(iters {it:.1f})", flush=True)


def section_nlmpc_batch():
    from libmpc_tpu import NLParameters

    p = NLParameters(maximum_iteration=30, enable_warm_start=True,
                     inner_qp="fused", hessian_reg="gershgorin")
    for B in (1024, 2048, 4096):
        r, s = _rate_nlmpc(p, B=B)
        print(f"nlmpc B={B:5d}: {r:9.1f} solves/s (success {s:.3f})",
              flush=True)


def section_hessian_reg():
    from libmpc_tpu import NLParameters

    for reg in ("gershgorin", "power", "eigh"):
        p = NLParameters(maximum_iteration=30, enable_warm_start=True,
                         inner_qp="fused", hessian_reg=reg)
        r, s = _rate_nlmpc(p)
        print(f"hessian_reg={reg:10s}: {r:9.1f} solves/s (success {s:.3f})",
              flush=True)


def _golden_err(params):
    from __graft_entry__ import _quadrotor_setup
    from libmpc_tpu.lmpc import problem as qp
    from libmpc_tpu.ops import admm

    dtype = jnp.float32
    c = _quadrotor_setup(dtype)
    golden = np.array([-0.9916, 1.74839, -0.9916, 1.74839])
    dims, prob = c.dims, c._prob
    P, A, lineq, uineq = qp.build_time_invariant(dims, prob)
    with jax.default_matmul_precision("highest"):
        q, l, u = qp.build_time_varying(
            dims, prob, lineq, uineq, jnp.zeros((12,), dtype),
            jnp.zeros((4,), dtype),
            c._y_ref, c._u_ref, c._du_ref, c._u_meas)
    sol = admm.admm_solve(P, A, q, l, u, params,
                          eq_mask=jnp.arange(dims.m) < dims.n_eq)
    _, inputs, _ = qp.unpack_solution(dims, prob, sol.x, c._u_meas)
    return float(np.abs(np.asarray(inputs)[0] - golden).max())


def section_polish_passes():
    """Rate AND golden accuracy per compensated-refinement pass count —
    CPU-f32 pre-screen: 4 passes 4.0e-5, 8 passes 2.1e-5 (target <1e-4)."""
    from libmpc_tpu import LParameters

    for passes in (4, 6, 8):
        p = LParameters(maximum_iteration=100, enable_warm_start=True,
                        polish=True, polish_mode="shared", rho=0.01,
                        polish_comp_passes=passes)
        r, it = _rate_lmpc(p)
        err = _golden_err(p)
        print(f"polish_comp_passes={passes}: {r:9.1f} solves/s "
              f"golden_err={err:.2e}", flush=True)


def section_x_refine():
    """Per-iteration x-update refinement on/off: ~25% of iteration FLOPs
    vs iteration count / golden accuracy (polish repairs the endpoint)."""
    from libmpc_tpu import LParameters

    for refine in (True, False):
        p = LParameters(maximum_iteration=100, enable_warm_start=True,
                        polish=True, polish_mode="shared", rho=0.01,
                        x_refine=refine)
        r, it = _rate_lmpc(p)
        err = _golden_err(p)
        print(f"x_refine={str(refine):5s}: {r:9.1f} solves/s "
              f"(iters {it:.1f}) golden_err={err:.2e}", flush=True)


def section_check_every():
    """With straggler compaction, an earlier first check compacts sooner
    (trading a few extra residual evaluations for fewer full-batch
    iteration blocks)."""
    from libmpc_tpu import LParameters

    for ce in (10, 15, 25, 50):
        p = LParameters(maximum_iteration=100, enable_warm_start=True,
                        polish=True, polish_mode="shared", rho=0.01,
                        check_termination=ce)
        r, it = _rate_lmpc(p)
        err = _golden_err(p)
        print(f"check_termination={ce:2d}: {r:9.1f} solves/s "
              f"(iters {it:.1f}) golden_err={err:.2e}", flush=True)


def section_scan_steps():
    """Dispatch-overhead isolation: K control steps fused into ONE jitted
    lax.scan (one tunnel round trip) vs K pipelined dispatches.  If the
    per-execution fixed cost (~32 ms over the tunnel) dominates, the scan
    rate is the solver's true ceiling and rollout.py-style serving is the
    production shape."""
    from __graft_entry__ import _quadrotor_setup
    from libmpc_tpu import LParameters
    from libmpc_tpu.lmpc.controller import build_prepared, solve_body

    dtype = jnp.float32
    B, K = 16384, 8
    c = _quadrotor_setup(dtype)
    params = LParameters(maximum_iteration=100, enable_warm_start=True,
                         polish=True, polish_mode="shared", rho=0.01)
    c.set_optimizer_parameters(params)
    dims, prob = c.dims, c._prob
    built = build_prepared(dims, params, prob,
                           c._y_ref, c._u_ref, c._du_ref, c._u_meas)

    @jax.jit
    def run(x0s, u0, warm_x, warm_y):
        def step(carry, x0):
            u, wx, wy = carry
            result, seq, sx, sy, iters = solve_body(
                dims, params, prob, x0, u,
                c._y_ref, c._u_ref, c._du_ref, c._u_meas,
                wx, wy, jnp.asarray(True), jnp.zeros_like(u), built=built,
            )
            return (result.cmd, sx, sy), iters
        (u, wx, wy), its = jax.lax.scan(step, (u0, warm_x, warm_y), x0s)
        return u, wx, wy, its

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.05 * rng.normal(size=(K, B, 12)), dtype)
    u = jnp.zeros((B, 4), dtype)
    wx = jnp.zeros((B, dims.nz), dtype)
    wy = jnp.zeros((B, dims.m), dtype)
    u, wx, wy, its = run(x0s, u, wx, wy)
    jax.block_until_ready(u)
    reps = 4
    t0 = time.perf_counter()
    for i in range(reps):
        u, wx, wy, its = run(x0s, u, wx, wy)
    jax.block_until_ready(u)
    dt = time.perf_counter() - t0
    print(f"scan({K} steps, B={B}): {B * K * reps / dt:9.1f} solves/s "
          f"({dt / (reps * K) * 1e3:.1f} ms/step, iters {float(jnp.mean(its)):.1f})",
          flush=True)


def section_compaction():
    """Straggler-compaction A/B on hardware for both solvers (CPU showed
    1.86x for LMPC; the NLMPC gain is tile-count-bound and TPU-only)."""
    from libmpc_tpu import LParameters, NLParameters

    for compact in (True, False):
        p = LParameters(maximum_iteration=100, enable_warm_start=True,
                        polish=True, polish_mode="shared", rho=0.01,
                        compact_stragglers=compact)
        r, it = _rate_lmpc(p)
        print(f"lmpc compact={str(compact):5s}: {r:9.1f} solves/s "
              f"(iters {it:.1f})", flush=True)
    for compact in (True, False):
        p = NLParameters(maximum_iteration=30, enable_warm_start=True,
                         inner_qp="fused", hessian_reg="gershgorin",
                         compact_stragglers=compact)
        r, srate = _rate_nlmpc(p)
        print(f"nlmpc compact={str(compact):5s}: {r:9.1f} solves/s "
              f"(success {srate:.3f})", flush=True)


def section_warm_shift(B=16384, K=8):
    """Closed-loop A/B for LParameters.warm_start_shift: realigning the
    warm start with the receding horizon compresses the lockstep iteration
    tail (CPU f64 30-step loop: 775 vs 825 total iteration blocks; the
    batch-level p99 effect is what a TPU lockstep batch actually pays)."""
    from __graft_entry__ import _quadrotor_setup
    from libmpc_tpu import LParameters
    from libmpc_tpu.lmpc.controller import build_prepared, solve_body
    from tests.test_lmpc import quadrotor_model

    dtype = jnp.float32
    Ad_np, Bd_np, _ = quadrotor_model()
    Ad = jnp.asarray(Ad_np, dtype)
    Bd = jnp.asarray(Bd_np, dtype)
    for shift in (False, True):
        c = _quadrotor_setup(dtype)
        params = LParameters(maximum_iteration=100, enable_warm_start=True,
                             polish=True, polish_mode="shared", rho=0.01,
                             warm_start_shift=shift)
        c.set_optimizer_parameters(params)
        dims, prob = c.dims, c._prob
        built = build_prepared(dims, params, prob,
                               c._y_ref, c._u_ref, c._du_ref, c._u_meas)

        @jax.jit
        def run(x0, u0, warm_x, warm_y):
            def step(carry, _):
                x, u, wx, wy = carry
                result, seq, sx, sy, iters = solve_body(
                    dims, params, prob, x, u,
                    c._y_ref, c._u_ref, c._du_ref, c._u_meas,
                    wx, wy, jnp.asarray(True), jnp.zeros_like(u),
                    built=built)
                xn = x @ Ad.T + result.cmd @ Bd.T
                return (xn, result.cmd, sx, sy), iters

            return jax.lax.scan(step, (x0, u0, warm_x, warm_y), None,
                                length=K)

        rng = np.random.default_rng(0)
        x = jnp.asarray(0.05 * rng.normal(size=(B, 12)), dtype)
        u = jnp.zeros((B, 4), dtype)
        wx = jnp.zeros((B, dims.nz), dtype)
        wy = jnp.zeros((B, dims.m), dtype)
        (x, u, wx, wy), its = run(x, u, wx, wy)
        jax.block_until_ready(u)
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):  # keep rolling the same closed loop
            (x, u, wx, wy), its = run(x, u, wx, wy)
        jax.block_until_ready(u)
        dt = time.perf_counter() - t0
        print(f"warm_start_shift={str(shift):5s}: "
              f"{B * K * reps / dt:9.1f} solves/s "
              f"(iters {float(jnp.mean(its)):.1f})", flush=True)


def section_closed_loop_shift(B=16384, K=16):
    """Plant-coupled A/B of the warm-start shift: the full disturbed
    closed loop of bench._closed_loop_bench, shift on vs off."""
    import dataclasses

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench as bench_mod
    from __graft_entry__ import _quadrotor_model, _quadrotor_setup
    from libmpc_tpu.rollout import lmpc_rollout

    dtype = jnp.float32
    Ad, Bd = _quadrotor_model()
    Adj, Bdj = jnp.asarray(Ad, dtype), jnp.asarray(Bd, dtype)
    x0_h, noise_h = bench_mod._closed_loop_inputs(B, K)
    noise = jnp.asarray(noise_h, dtype)

    def plant(x, u, k):
        return x @ Adj.T + u @ Bdj.T + noise[k]

    x0 = jnp.asarray(x0_h, dtype)
    u0 = jnp.zeros((B, 4), dtype)
    for shift in (True, False):
        c = _quadrotor_setup(dtype)
        c.set_optimizer_parameters(dataclasses.replace(
            bench_mod._closed_loop_params(), warm_start_shift=shift))
        r = lmpc_rollout(c, plant, x0, u0, K)
        jax.block_until_ready(r.inputs)
        t0 = time.perf_counter()
        r = lmpc_rollout(c, plant, x0, u0, K)
        jax.block_until_ready(r.inputs)
        dt = time.perf_counter() - t0
        iters = np.asarray(r.iterations)
        print(f"shift={str(shift):5s}: {B * K / dt:9.1f} solves/s  "
              f"iters warm mean {iters[:, 1:].mean():.1f} "
              f"p99 {np.quantile(iters[:, 1:], 0.99):.0f}", flush=True)


def section_fused_size_limit():
    """Hardware validation of the fused inner-QP VMEM gate: run the raw
    kernel at growing nz and report where it stops lowering, next to what
    supported() predicts.  (Failures are caught — this section MAPS the
    limit, it must not kill the sweep.)"""
    from libmpc_tpu.ops import qp_inner_pallas

    rng = np.random.default_rng(0)
    B = 128
    for n in (26, 40, 48, 56, 64, 80, 96, 112):
        m = 2 * n + 5
        L = rng.normal(size=(B, n, n)).astype(np.float32)
        P = jnp.asarray(L @ np.transpose(L, (0, 2, 1))) + 0.5 * jnp.eye(n)
        A = jnp.asarray(rng.normal(size=(B, m, n)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
        zc = jnp.einsum("bmn,bn->bm", A, rng.normal(size=(B, n)).astype(np.float32))
        l, u = zc - 0.5, zc + 0.5
        rho = jnp.full((B, m), 0.1, jnp.float32)
        x0 = jnp.zeros((B, n), jnp.float32)
        y0 = jnp.zeros((B, m), jnp.float32)
        pred = qp_inner_pallas.supported(n, m)
        try:
            t0 = time.perf_counter()
            out = qp_inner_pallas.solve_batched(
                P, A, q, l, u, rho, x0, y0, max_iter=100)
            jax.block_until_ready(out[0])
            dt = time.perf_counter() - t0
            done = float(jnp.mean(out[4]))
            print(f"n={n:4d} m={m:4d}: OK ({dt:6.1f}s first call, "
                  f"done={done:.2f}, supported()={pred})", flush=True)
        except Exception as e:
            print(f"n={n:4d} m={m:4d}: FAILS {type(e).__name__} "
                  f"(supported()={pred})", flush=True)


def section_osc_engine(B=128):
    """Networked-oscillators (nz=301) engine A/B: curvature model x inner
    QP engine, warm re-solve throughput + success."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench as bench_mod
    from libmpc_tpu import NLMPC, NLParameters

    rng = np.random.default_rng(13)
    x0 = np.asarray(rng.uniform(-0.5, 0.5, size=(B, 12)), np.float32)
    for hreg, engine in (("gauss_newton", "pdip"), ("gershgorin", "pdip"),
                         ("gauss_newton", "admm")):
        c = NLMPC(12, 6, 12, 20, 10, 21 * 6, 0, dtype=jnp.float32)
        c.set_discretization_sampling_time(0.1)
        c.set_state_space_function(bench_mod._oscillator_dynamics)
        c.set_objective_function(
            lambda X, Y, U, e: jnp.sum(X**2) + jnp.sum(U**2))
        c.set_ineq_con_function(lambda X, Y, U, e: (U - 0.5).reshape(-1))
        c.set_optimizer_parameters(NLParameters(
            maximum_iteration=30, enable_warm_start=True,
            hessian_reg=hreg, inner_qp=engine))
        c.set_stats_mode("lazy")
        try:
            res = c.optimize(x0, np.zeros((B, 6), np.float32))
            res = c.optimize(x0, res.cmd)
            jax.block_until_ready(res.cmd)
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                res = c.optimize(x0, res.cmd)
            jax.block_until_ready(res.cmd)
            dt = time.perf_counter() - t0
            ok = float(np.mean(np.asarray(res.status) == 0))
            print(f"hreg={hreg:12s} engine={engine:5s}: "
                  f"{B * reps / dt:8.1f} solves/s  success={ok:.2f}",
                  flush=True)
        except Exception as e:
            print(f"hreg={hreg:12s} engine={engine:5s}: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)


def section_cold_start(B=4096):
    """Cold-solve initialization A/B (LParameters.cold_start): the
    KKT-seeded start vs OSQP's origin, measured on a purely-cold batch
    (round-4 task #7).  Measured verdict on TPU v5e: the seed INCREASES
    cold iterations (209.8 vs 195.1 mean at the closed-loop settings) —
    a good primal with zero duals starts the ADMM off the central path —
    which is why "zeros" is the default."""
    import dataclasses as dc

    from __graft_entry__ import _quadrotor_setup
    from bench import _closed_loop_params
    from libmpc_tpu.lmpc.controller import build_prepared, solve_body

    dtype = jnp.float32
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(0.05 * rng.normal(size=(B, 12)), dtype)
    u0 = jnp.zeros((B, 4), dtype)
    for cs in ("zeros", "kkt", "kkt_duals"):
        c = _quadrotor_setup(dtype)
        params = dc.replace(_closed_loop_params(), cold_start=cs)
        c.set_optimizer_parameters(params)
        dims, prob = c.dims, c._prob
        built = build_prepared(dims, params, prob, c._y_ref, c._u_ref,
                               c._du_ref, c._u_meas)

        @jax.jit
        def step(x0, u0):
            result, seq, sx, sy, iters = solve_body(
                dims, params, prob, x0, u0, c._y_ref, c._u_ref, c._du_ref,
                c._u_meas, jnp.zeros((B, dims.nz), dtype),
                jnp.zeros((B, dims.m), dtype), jnp.asarray(False), u0,
                built=built)
            return result, iters

        res, iters = step(x0, u0)
        jax.block_until_ready(iters)
        it = np.asarray(iters)
        print(f"  cold_start={cs:6s}: iters mean={it.mean():.1f} "
              f"p50={np.percentile(it, 50):.0f} "
              f"p99={np.percentile(it, 99):.0f} "
              f"success={float(np.mean(np.asarray(res.status) == 0)):.4f}",
              flush=True)


def section_stall_checks(B=16384, K=16):
    """Straggler stall detection A/B (LParameters.stall_checks) on the
    plant-coupled closed loop: the warm iteration tail with and without
    the f32 floor-stall freeze (round-4 task #1)."""
    import dataclasses as dc

    from __graft_entry__ import _quadrotor_model, _quadrotor_setup
    from bench import _closed_loop_inputs, _closed_loop_params
    from libmpc_tpu.rollout import lmpc_rollout

    dtype = jnp.float32
    Ad, Bd = _quadrotor_model()
    Adj, Bdj = jnp.asarray(Ad, dtype), jnp.asarray(Bd, dtype)
    x0_h, noise_h = _closed_loop_inputs(B, K)
    noise = jnp.asarray(noise_h, dtype)

    def plant(x, u, k):
        return x @ Adj.T + u @ Bdj.T + noise[k]

    for sc in (0, 3):
        c = _quadrotor_setup(dtype)
        c.set_optimizer_parameters(
            dc.replace(_closed_loop_params(), stall_checks=sc))
        r = lmpc_rollout(c, plant, jnp.asarray(x0_h, dtype),
                         jnp.zeros((B, 4), dtype), K)
        jax.block_until_ready(r.inputs)
        t0 = time.perf_counter()
        r = lmpc_rollout(c, plant, jnp.asarray(x0_h, dtype),
                         jnp.zeros((B, 4), dtype), K)
        jax.block_until_ready(r.inputs)
        rate = B * K / (time.perf_counter() - t0)
        it = np.asarray(r.iterations)[:, 1:]
        cap = c._params.maximum_iteration
        print(f"  stall_checks={sc}: {rate:,.0f} solves/s, warm iters "
              f"mean={it.mean():.1f} p99={np.percentile(it, 99):.0f} "
              f"cap_frac={np.mean(it >= cap):.5f}", flush=True)


SECTIONS = {
    "closed_loop_shift": section_closed_loop_shift,
    "cold_start": section_cold_start,
    "stall_checks": section_stall_checks,
    "fused_size_limit": section_fused_size_limit,
    "osc_engine": section_osc_engine,
    "compaction": section_compaction,
    "warm_shift": section_warm_shift,
    "polish_cap": section_polish_cap,
    "max_iter": section_max_iter,
    "nlmpc_batch": section_nlmpc_batch,
    "hessian_reg": section_hessian_reg,
    "polish_passes": section_polish_passes,
    "x_refine": section_x_refine,
    "check_every": section_check_every,
    "scan_steps": section_scan_steps,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(SECTIONS)
    print(f"device={jax.devices()[0]}", flush=True)
    for name in names:
        print(f"== {name} ==", flush=True)
        try:
            SECTIONS[name]()
        except Exception as e:  # keep later sections alive past one failure
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
