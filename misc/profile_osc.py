"""Time attribution for the large-NLMPC (networked oscillators, nz=301) path.

Round-3 left the nz=301 solve at 73.9 closed-loop solves/s with dense
O(nz^3) inner-QP algebra; before re-architecting (round-4 task #2: banded /
Riccati KKT) this script measures where one SQP iteration's time actually
goes on the hardware, as separately jitted programs with the production
shapes (B=256, nz=301, me=240, mi=126):

  * exact Jacobians (jacfwd of defects + user inequalities)
  * the once-per-solve Gauss-Newton objective Hessian
  * inner-ADMM prepare (Ruiz + blocked-Schur KKT inverse), per rho rebuild
  * a 25-iteration ADMM block + termination check
  * the SOC CG solve and one merit evaluation
  * the whole sqp body for comparison (one full solve / iters)

Usage:  python misc/profile_osc.py  (on the TPU)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("LIBMPC_PROF_B", 256))


def timed(fn, *args, reps=5, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:50s} {dt*1e3:10.2f} ms")
    return dt, out


def main():
    from bench import _oscillator_dynamics
    from libmpc_tpu import NLMPC, NLParameters
    from libmpc_tpu.nlmpc import problem as nlp
    from libmpc_tpu.ops import admm, sqp

    dtype = jnp.float32
    ph, ch, nx, nu = 20, 10, 12, 6
    c = NLMPC(nx, nu, nx, ph, ch, (ph + 1) * nu, 0, dtype=dtype)
    c.set_discretization_sampling_time(0.1)
    c.set_state_space_function(_oscillator_dynamics)
    c.set_objective_function(lambda X, Y, U, e: jnp.sum(X**2) + jnp.sum(U**2))
    c.set_ineq_con_function(lambda X, Y, U, e: (U - 0.5).reshape(-1))
    params = NLParameters(maximum_iteration=30, enable_warm_start=True,
                          hessian_reg="gauss_newton", inner_qp="fused")
    c.set_optimizer_parameters(params)

    dims, fns = c.dims, c._fns
    ss, us = c._state_scaling, c._input_scaling
    nz = dims.nz
    me = ph * nx
    mi = (ph + 1) * nu
    m_qp = me + mi + nz
    print(f"B={B} nz={nz} me={me} mi={mi} m_qp={m_qp}")

    rng = np.random.default_rng(13)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, nx)), dtype)
    u0 = jnp.zeros((B, nu), dtype)
    lb, ub, _ = c._bounds_args()
    lb = jnp.broadcast_to(lb, (B, nz)) if lb.ndim == 1 else lb
    ub = jnp.broadcast_to(ub, (B, nz)) if ub.ndim == 1 else ub

    z0 = jax.vmap(lambda x, u: nlp.initial_guess(dims, x, u, 0.0, dtype))(x0, u0)

    def f_one(z, x):
        return nlp.objective(dims, fns, ss, us, z, x, None)

    def ce_one(z, x):
        return nlp.state_defects(dims, fns, ss, us, z, x, None)

    def ci_one(z, x):
        return nlp.user_ineq(dims, fns, ss, us, z, x, None)

    # ---- derivatives -----------------------------------------------------
    jac_ce = jax.jit(jax.vmap(jax.jacfwd(ce_one), in_axes=(0, 0)))
    jac_ci = jax.jit(jax.vmap(jax.jacfwd(ci_one), in_axes=(0, 0)))
    grad_f = jax.jit(jax.vmap(jax.value_and_grad(f_one), in_axes=(0, 0)))
    hess_f = jax.jit(jax.vmap(jax.hessian(f_one), in_axes=(0, 0)))

    with jax.default_matmul_precision("highest"):
        _, Je = timed(jac_ce, z0, x0, label="jacfwd defects (B,240,301)")
        _, Ji = timed(jac_ci, z0, x0, label="jacfwd ineq (B,126,301)")
        timed(grad_f, z0, x0, label="value_and_grad objective")
        _, Hf = timed(hess_f, z0, x0, label="hessian objective (once/solve)")

        Bmat = jax.jit(jax.vmap(
            lambda H: sqp._gershgorin_convexify(0.5 * (H + H.T), nz, dtype)
        ))(Hf)
        jax.block_until_ready(Bmat)

        ce = jax.jit(jax.vmap(ce_one))(z0, x0)
        ci = jax.jit(jax.vmap(ci_one))(z0, x0)
        _, g = jax.jit(jax.vmap(jax.value_and_grad(f_one)))(z0, x0)

        qp_par = sqp._qp_params(True)
        eq_mask = jnp.arange(m_qp) < me
        eye = jnp.eye(nz, dtype=dtype)

        def build_qp(Bm, Jei, Jii, gi, cei, cii, lbi, ubi, zi):
            A_qp = jnp.concatenate([Jei, Jii, eye], axis=0)
            l_qp = jnp.concatenate(
                [-cei, jnp.full((mi,), -jnp.inf, dtype), lbi - zi])
            u_qp = jnp.concatenate([-cei, -cii, ubi - zi])
            return A_qp, l_qp, u_qp

        A_qp, l_qp, u_qp = jax.jit(jax.vmap(build_qp))(
            Bmat, Je, Ji, g, ce, ci, lb, ub, z0)

        # ---- inner-ADMM pieces ------------------------------------------
        def prepare_one(Bm, Aq, gi, lqi, uqi):
            loose = (lqi <= -admm.INF_BOUND) & (uqi >= admm.INF_BOUND)
            return admm.prepare_qp(Bm, Aq, jnp.abs(gi), eq_mask, loose, qp_par)

        prep_fn = jax.jit(jax.vmap(prepare_one))
        with jax.default_matmul_precision("highest"):
            _, prep = timed(prep_fn, Bmat, A_qp, g, l_qp, u_qp,
                            label="inner-QP prepare (Ruiz + KKT inverse)")

            # KKT inverse alone (what each adaptive-rho update pays)
            def kkt_one(Ps, As):
                rho_v = admm._rho_vec_of(
                    jnp.asarray(0.1, dtype), eq_mask,
                    jnp.zeros((m_qp,), bool))
                return admm._build_kkt_inverse(
                    Ps, As, rho_v, jnp.asarray(1e-5, dtype))[1]

            timed(jax.jit(jax.vmap(kkt_one)), prep.Ps, prep.As,
                  label="KKT inverse alone (per rho update)")

            # full inner ADMM solve (the per-SQP-iteration cost)
            def admm_full(Bm, Aq, gi, lqi, uqi):
                return admm.admm_solve(Bm, Aq, gi, lqi, uqi, params=qp_par,
                                       eq_mask=eq_mask).x

            timed(jax.jit(jax.vmap(admm_full)), Bmat, A_qp, g, l_qp, u_qp,
                  label="inner ADMM full solve (cold)")

            # 25 iterations alone at fixed rho (no checks): lower bound
            import dataclasses as dc
            par_fixed = dc.replace(qp_par, adaptive_rho=False,
                                   maximum_iteration=25, polish=False,
                                   check_termination=25, scaling_iters=0)

            def admm_25(Bm, Aq, gi, lqi, uqi):
                return admm.admm_solve(Bm, Aq, gi, lqi, uqi, params=par_fixed,
                                       eq_mask=eq_mask).x

            timed(jax.jit(jax.vmap(admm_25)), Bmat, A_qp, g, l_qp, u_qp,
                  label="ADMM 25 iters, fixed rho, no polish")

        # ---- SOC CG -------------------------------------------------------
        def soc_one(Jei, cei):
            def _cg_mv(v):
                return Jei @ (v @ Jei) + 1e-10 * v

            def _cg_body(_, c):
                x, r, p, rs = c
                Ap = _cg_mv(p)
                alpha = rs / jnp.maximum(jnp.dot(p, Ap), 1e-30)
                x = x + alpha * p
                r = r - alpha * Ap
                rs_new = jnp.dot(r, r)
                p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
                return (x, r, p, rs_new)

            x_cg = jnp.zeros((me,), dtype)
            x_cg, _, _, _ = jax.lax.fori_loop(
                0, 40, _cg_body, (x_cg, cei, cei, jnp.dot(cei, cei)))
            return Jei.T @ x_cg

        timed(jax.jit(jax.vmap(soc_one)), Je, ce, label="SOC CG-40 solve")

        # ---- merit eval ----------------------------------------------------
        def merit_one(z, x):
            return f_one(z, x), ce_one(z, x), ci_one(z, x)

        timed(jax.jit(jax.vmap(merit_one)), z0, x0, label="merit evaluation")

        # ---- whole solve ----------------------------------------------------
        solve_one = c._make_solve_one()
        solve = jax.jit(jax.vmap(
            solve_one, in_axes=(0, None, 0, 0, 0, None, None, None)))
        lb1, ub1, _ = c._bounds_args()

        def whole(x0, u0):
            return solve(z0, jnp.asarray(False), x0, u0,
                         jnp.zeros((B,), dtype), None, lb1, ub1)

        dt, out = timed(jax.jit(whole), x0, u0, reps=3,
                        label="whole batched SQP solve (cold)")
        sol = out[0]
        it = np.asarray(sol.iters)
        print(f"  iters mean={it.mean():.2f} max={it.max()} "
              f"success={float(np.mean(np.asarray(sol.status) > 0)):.3f} "
              f"-> {dt*1e3/it.mean():.1f} ms per SQP iteration")


if __name__ == "__main__":
    main()
