"""Batched SQP solver for the nonlinear MPC problem.

The TPU-native replacement for NLopt's LD_SLSQP driving the reference's NLMPC
(reference: include/mpc/NLMPC/NLOptimizer.hpp:64, :519).  Same solver family —
sequential quadratic programming with an l1-merit line search — re-built
around what the hardware and autodiff make cheap:

* derivatives are exact: gradient, constraint Jacobians AND the Lagrangian
  Hessian come from autodiff (the reference approximates curvature with BFGS
  inside SLSQP and Jacobians with finite differences,
  Constraints.hpp:844-905);  the exact-Hessian SQP converges quadratically,
  so a control step costs a handful of QP solves;
* the Hessian is convexified by eigenvalue clipping (small dense ``eigh`` —
  decision vectors are tens of entries for MPC problems);
* the inner QP reuses the batched ADMM kernel (`ops/admm.py`), sharing one QP
  engine between LMPC and NLMPC;
* the line search evaluates a fixed ladder of step lengths *plus a
  second-order-correction candidate* in one vmapped batch (no Maratos
  stalling), and the whole solve is a single ``lax.while_loop``;
* a batch of instances is solved by ``vmap`` of this function.

Status codes mirror nlopt's enum values so ``Result.solver_status`` matches
the reference's (reference: include/mpc/NLMPC/NLOptimizer.hpp:729-750).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..types import LParameters, NLParameters
from . import admm

# -- nlopt result values (nlopt.hpp) ----------------------------------------
NLOPT_FAILURE = -1
NLOPT_ROUNDOFF_LIMITED = -4
NLOPT_SUCCESS = 1
NLOPT_STOPVAL_REACHED = 2
NLOPT_FTOL_REACHED = 3
NLOPT_XTOL_REACHED = 4
NLOPT_MAXEVAL_REACHED = 5
NLOPT_MAXTIME_REACHED = 6

_LS_STEPS = 12  # step ladder 2^0 .. 2^-11 (+1 SOC candidate)
_INTERNAL_ACC = 1e-7  # optimality tolerance when no user tol is set
_MAX_LS_FAILS = 4
_ARMIJO_C1 = 1e-4


class SQPSolution(NamedTuple):
    z: jax.Array  # (nz,) final decision vector
    obj: jax.Array  # scalar objective value
    status: jax.Array  # int32 nlopt-style code
    iters: jax.Array  # int32 SQP iterations
    kkt_res: jax.Array  # final constraint violation (inf-norm)


def _qp_params(f32: bool = False) -> LParameters:
    """Inner-QP settings: tight tolerances, polish for exact active sets.
    float32 runs get reachable tolerances (1e-9 is below the f32 noise
    floor and would force every subproblem to max-iter)."""
    if f32:
        return LParameters(
            maximum_iteration=500,
            enable_warm_start=True,
            eps_abs=5e-6,
            eps_rel=5e-6,
            eps_prim_inf=1e-5,
            eps_dual_inf=1e-5,
            polish=False,
            adaptive_rho=True,
            check_termination=25,
            scaling_iters=10,
            rho=0.1,
            use_pallas=False,
        )
    return LParameters(
        maximum_iteration=1000,
        enable_warm_start=True,
        eps_abs=1e-9,
        eps_rel=1e-9,
        eps_prim_inf=1e-6,
        eps_dual_inf=1e-6,
        polish=True,
        adaptive_rho=True,
        check_termination=25,
        scaling_iters=10,  # subproblem Hessians can be badly scaled
        rho=0.1,
        use_pallas=False,  # inner QPs are vmapped and tiny
    )


def sqp_solve(
    f_fn: Callable,  # f_fn(z) -> scalar objective
    ceq_fn: Callable,  # ceq_fn(z) -> (me,) equality residuals (== 0)
    cin_fn: Optional[Callable],  # cin_fn(z) -> (mi,) inequalities (<= 0)
    z0: jax.Array,
    lb: jax.Array,
    ub: jax.Array,
    params: NLParameters,
) -> SQPSolution:
    """Solve  min f(z)  s.t.  ceq(z)=0, cin(z)<=0, lb<=z<=ub  from z0.

    All callables must be JAX-traceable; x0/refs enter through their
    closures.  ``vmap`` over instances batches everything, including the
    inner QP and the Hessian eigendecompositions.

    Runs at ``highest`` matmul precision — TPU's default bf16 matmul passes
    cannot drive an optimizer to 1e-7 stationarity.
    """
    with jax.default_matmul_precision("highest"):
        return _sqp_solve_hp(f_fn, ceq_fn, cin_fn, z0, lb, ub, params)


def _sqp_solve_hp(f_fn, ceq_fn, cin_fn, z0, lb, ub, params) -> SQPSolution:
    nz = z0.shape[0]
    dtype = z0.dtype
    me = ceq_fn(z0).shape[0]
    mi = cin_fn(z0).shape[0] if cin_fn is not None else 0
    m_qp = me + mi + nz

    grad_f = jax.value_and_grad(f_fn)
    jac_eq = jax.jacfwd(ceq_fn)
    jac_in = jax.jacfwd(cin_fn) if cin_fn is not None else None

    def lagrangian(z, lam_e, lam_i):
        L = f_fn(z) + jnp.dot(lam_e, ceq_fn(z))
        if cin_fn is not None:
            L = L + jnp.dot(lam_i, cin_fn(z))
        return L

    hess_L = jax.hessian(lagrangian)

    f32 = dtype == jnp.float32
    qp_par = _qp_params(f32)
    acc = 1e-5 if f32 else _INTERNAL_ACC
    eq_mask = jnp.arange(m_qp) < me
    big = jnp.asarray(1e20, dtype)
    finite_lb = jnp.maximum(lb, -big)
    finite_ub = jnp.minimum(ub, big)

    def constraint_viol(ce, ci):
        return jnp.max(
            jnp.concatenate(
                [jnp.abs(ce), jnp.maximum(ci, 0.0), jnp.zeros((1,), dtype)]
            )
        )

    def merit_terms(z):
        f = f_fn(z)
        ce = ceq_fn(z)
        ci = cin_fn(z) if cin_fn is not None else jnp.zeros((0,), dtype)
        return f, ce, ci

    class Carry(NamedTuple):
        z: jax.Array
        lam_e: jax.Array
        lam_i: jax.Array
        f: jax.Array
        mu_e: jax.Array
        mu_i: jax.Array
        it: jax.Array
        status: jax.Array
        ls_fails: jax.Array
        viol: jax.Array
        qp_x: jax.Array  # inner-QP warm start: previous direction
        qp_y: jax.Array  # inner-QP warm start: previous duals

    f0, ce0, ci0 = merit_terms(z0)
    init = Carry(
        z=z0,
        lam_e=jnp.zeros((me,), dtype),
        lam_i=jnp.zeros((mi,), dtype),
        f=f0,
        mu_e=jnp.full((me,), 1.0, dtype),
        mu_i=jnp.full((mi,), 1.0, dtype),
        it=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(0, jnp.int32),
        ls_fails=jnp.asarray(0, jnp.int32),
        viol=constraint_viol(ce0, ci0),
        qp_x=jnp.zeros((nz,), dtype),
        qp_y=jnp.zeros((m_qp,), dtype),
    )

    def body(s: Carry) -> Carry:
        f, g = grad_f(s.z)
        ce = ceq_fn(s.z)
        Je = jac_eq(s.z)
        if cin_fn is not None:
            ci = cin_fn(s.z)
            Ji = jac_in(s.z)
        else:
            ci = jnp.zeros((0,), dtype)
            Ji = jnp.zeros((0, nz), dtype)

        # -- convexified exact Hessian --------------------------------------
        H = hess_L(s.z, s.lam_e, s.lam_i)
        H = 0.5 * (H + H.T)
        if params.hessian_reg == "gershgorin":
            # shift by a Gershgorin bound: tau >= -lambda_min guarantees PSD
            # without an eigendecomposition; more conservative when H is
            # indefinite
            diag = jnp.diagonal(H)
            radius = jnp.sum(jnp.abs(H), axis=1) - jnp.abs(diag)
            gersh_lo = jnp.min(diag - radius)
            scale = jnp.max(diag + radius)
            tau = jnp.maximum(-gersh_lo, 0.0) + jnp.maximum(1e-6 * scale, 1e-8)
            B = H + tau * jnp.eye(nz, dtype=dtype)
        else:
            # clip eigenvalues to a 1e-6-relative floor: the tightest convex
            # model of H (costs an eigh per iteration)
            w, V = jnp.linalg.eigh(H)
            tau = jnp.maximum(1e-8, 1e-6 * jnp.max(jnp.abs(w)))
            B = (V * jnp.maximum(w, tau)[None, :]) @ V.T

        # -- QP subproblem:  min 1/2 d'Bd + g'd
        #    s.t. Je d = -ce ; Ji d <= -ci ; lb-z <= d <= ub-z ---------------
        A_qp = jnp.concatenate([Je, Ji, jnp.eye(nz, dtype=dtype)], axis=0)
        l_qp = jnp.concatenate(
            [-ce, jnp.full((mi,), -jnp.inf, dtype), finite_lb - s.z]
        )
        u_qp = jnp.concatenate([-ce, -ci, finite_ub - s.z])
        # warm-start each subproblem from the previous SQP iteration's
        # direction/duals — across iterations the QP changes slowly, so the
        # inner ADMM typically converges in a fraction of the cold iterations
        sol = admm.admm_solve(
            B, A_qp, g, l_qp, u_qp, params=qp_par, eq_mask=eq_mask,
            warm_x=s.qp_x, warm_y=s.qp_y,
        )
        d = sol.x
        lam_e = sol.y[:me]
        lam_i = sol.y[me : me + mi]

        # -- penalty update (SLSQP rule: mu = max(|lam|, (mu+|lam|)/2));
        # after a stalled line search, drop the accumulated history and
        # restart from the current multipliers (stale-large penalties are a
        # classic cause of persistent step rejection near active sets) ------
        stalled = s.ls_fails > 0
        mu_e = jnp.where(
            stalled,
            jnp.abs(lam_e) + 1.0,
            jnp.maximum(jnp.abs(lam_e), 0.5 * (s.mu_e + jnp.abs(lam_e))),
        )
        mu_i = jnp.where(
            stalled,
            jnp.abs(lam_i) + 1.0,
            jnp.maximum(jnp.abs(lam_i), 0.5 * (s.mu_i + jnp.abs(lam_i))),
        )

        # -- line search over the step ladder + one SOC candidate ------------
        def phi(fv, cev, civ):
            return (
                fv
                + jnp.sum(mu_e * jnp.abs(cev))
                + jnp.sum(mu_i * jnp.maximum(civ, 0.0))
            )

        viol0 = jnp.sum(mu_e * jnp.abs(ce)) + jnp.sum(mu_i * jnp.maximum(ci, 0.0))
        phi0 = f + viol0
        D = jnp.dot(g, d) - viol0

        # second-order correction: after a unit step, remove the remaining
        # (curvature-induced) equality residual with a least-norm correction
        ce_full = ceq_fn(s.z + d)
        JJt = Je @ Je.T + 1e-10 * jnp.eye(me, dtype=dtype)
        d_soc = d - Je.T @ jnp.linalg.solve(JJt, ce_full)

        alphas = 2.0 ** -jnp.arange(_LS_STEPS, dtype=dtype)
        cand = jnp.concatenate(
            [s.z[None, :] + alphas[:, None] * d[None, :], (s.z + d_soc)[None, :]]
        )
        # the candidate count is small and static: evaluate by unrolled loop
        # rather than a nested vmap — when sqp_solve itself is vmapped over a
        # fleet, the doubly-nested vmap of the user model miscompiles on the
        # experimental TPU plugin (wrong merit values), and the unrolled form
        # fuses just as well
        terms = [merit_terms(cand[i]) for i in range(_LS_STEPS + 1)]
        fs = jnp.stack([t[0] for t in terms])
        ces = jnp.stack([t[1] for t in terms])
        cis = jnp.stack([t[2] for t in terms])
        phis = jnp.stack([phi(*t) for t in terms])
        # Armijo thresholds; SOC candidate judged as a unit step
        ath = phi0 + _ARMIJO_C1 * jnp.concatenate([alphas, alphas[:1]]) * D
        ok = phis <= ath
        # prefer the SOC candidate, then the largest accepted alpha
        pick_soc = ok[_LS_STEPS]
        first_ok = jnp.argmax(ok[:_LS_STEPS])
        any_ok = jnp.any(ok[:_LS_STEPS])
        best = jnp.argmin(phis)
        idx = jnp.where(
            pick_soc, _LS_STEPS, jnp.where(any_ok, first_ok, best)
        )
        decreased = phis[idx] < phi0
        idx = jnp.where(decreased, idx, 0)
        z_new = jnp.where(decreased, cand[idx], s.z)
        f_new = jnp.where(decreased, fs[idx], f)
        ls_fails = jnp.where(decreased, 0, s.ls_fails + 1)
        viol_new = constraint_viol(ces[idx], cis[idx])
        viol_new = jnp.where(decreased, viol_new, s.viol)
        step_norm = jnp.max(jnp.abs(z_new - s.z))

        # -- convergence tests ------------------------------------------------
        scale = 1.0 + jnp.max(jnp.abs(s.z))
        kkt_ok = (jnp.max(jnp.abs(d)) <= acc * scale) & (
            s.viol <= jnp.sqrt(acc)
        )
        df = jnp.abs(f_new - f)
        ftol_ok = jnp.asarray(False)
        if params.absolute_ftol > 0:
            ftol_ok = ftol_ok | (df <= params.absolute_ftol)
        if params.relative_ftol > 0:
            ftol_ok = ftol_ok | (df <= params.relative_ftol * jnp.abs(f_new))
        xtol_ok = jnp.asarray(False)
        if params.absolute_xtol > 0:
            xtol_ok = xtol_ok | (step_norm <= params.absolute_xtol)
        if params.relative_xtol > 0:
            xtol_ok = xtol_ok | (
                step_norm <= params.relative_xtol * jnp.max(jnp.abs(z_new))
            )
        near_feas = viol_new <= jnp.sqrt(acc)
        roundoff = ls_fails >= _MAX_LS_FAILS

        status = jnp.where(
            kkt_ok,
            NLOPT_SUCCESS,
            jnp.where(
                decreased & ftol_ok & near_feas,
                NLOPT_FTOL_REACHED,
                jnp.where(
                    decreased & xtol_ok & near_feas,
                    NLOPT_XTOL_REACHED,
                    jnp.where(roundoff, NLOPT_ROUNDOFF_LIMITED, 0),
                ),
            ),
        ).astype(jnp.int32)

        return Carry(
            z=z_new,
            lam_e=lam_e,
            lam_i=lam_i,
            f=f_new,
            mu_e=mu_e,
            mu_i=mu_i,
            it=s.it + 1,
            status=status,
            ls_fails=ls_fails,
            viol=viol_new,
            qp_x=sol.x,
            qp_y=sol.y,
        )

    def cond(s: Carry):
        return (s.status == 0) & (s.it < params.maximum_iteration)

    out = jax.lax.while_loop(cond, body, init)
    status = jnp.where(out.status == 0, NLOPT_MAXEVAL_REACHED, out.status)
    # a "roundoff" exit at an already-feasible, stationary-ish point is a
    # successful solve in practice (the step simply could not improve the
    # merit any further) — matching how SLSQP reports small final steps
    status = jnp.where(
        (status == NLOPT_ROUNDOFF_LIMITED) & (out.viol <= jnp.sqrt(acc)),
        NLOPT_XTOL_REACHED,
        status,
    )

    return SQPSolution(
        z=out.z, obj=out.f, status=status, iters=out.it, kkt_res=out.viol
    )
