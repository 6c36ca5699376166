"""Fused batched small-QP ADMM solver — one Pallas kernel per solve.

The SQP inner QP (ops/sqp.py) is a *per-instance* problem: every batch
element has its own Hessian ``P`` and constraint matrix ``A`` (tens of rows
and columns).  The XLA path (``vmap`` of :func:`ops.admm.admm_solve`) is
correct but latency-bound on TPU: each of its hundreds of lockstep
iterations lowers to many small kernels, and per-kernel overhead (~tens of
microseconds on a TPU program of this size) dwarfs the arithmetic.  This
module runs the ENTIRE solve — KKT assembly, Cholesky factorization,
explicit inverse, the ADMM iteration loop with periodic convergence checks
and per-instance freeze — as a single Pallas kernel, so the sequential-op
overhead is paid once instead of thousands of times.

Layout: batch-in-lanes.  All arrays are transposed so the batch tile is the
trailing (lane) dimension — a (m, n, TILE_B) constraint tensor holds lane
``b``'s matrix in ``[:, :, b]``.  Matrix dimensions live on the major /
sublane axes where static Python loops can index them, and every operation
is vectorized across the 128-lane batch tile: a Cholesky factorization of
1024 27x27 matrices costs 27 sequential steps of (27,27,128) vector work
instead of 1024 factorizations.

Algorithm (identical to ops/admm.py's ``one_iteration``, reference OSQP
v0.6.3 / LOptimizer.hpp): x-update through the explicit KKT inverse with
one refinement pass, over-relaxation ``alpha``, box projection, exact-zero
inactive duals.  No Ruiz scaling and no adaptive rho — the SQP subproblems
are eigenvalue-floored convexified Hessians with O(1) constraint rows, and
the warm-started iterations converge at fixed rho; the XLA path remains the
reference behavior for everything else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 128
INF_BOUND = 1e18
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024  # of the ~16MB/core (see admm_pallas)


def _tile_bytes(n: int, m: int) -> int:
    """Estimated VMEM footprint of one TILE_B-lane grid step (float32).

    Inputs (P, A, q, l, u, rho, x0, y0, dinv, einv, cinv) and outputs
    (x, y, z, meta) are double-buffered by the pipeline; scratch (M, Minv, L
    at (n, n, TILE_B) plus the x/z/y/done/rho vectors) is allocated once.
    """
    words_in = n * n + m * n + 3 * n + 5 * m + 1
    words_out = n + 2 * m + 4
    words_scratch = 3 * n * n + n + 3 * m + 1
    return 4 * TILE_B * (2 * (words_in + words_out) + words_scratch)


def supported(n: int, m: int) -> bool:
    """Whether the fused kernel fits this (n, m) subproblem in VMEM.

    The dominant term is the 3x (n, n, TILE_B) factorization scratch —
    quadratic in the decision size.  Callers (ops/sqp.py) must fall back to
    an XLA engine when this returns False: a too-large kernel fails at
    Mosaic lowering on real hardware, which a user-facing solve must never
    do.  Mirrors ops/admm_pallas.supported() for the LMPC kernel.
    """
    return _tile_bytes(n, m) < _VMEM_BUDGET_BYTES


def _kernel(
    P_ref, A_ref, q_ref, l_ref, u_ref, rho_ref, x0_ref, y0_ref,
    dinv_ref, einv_ref, cinv_ref,
    x_out, y_out, z_out, meta_out,
    M_s, Minv_s, L_s, x_s, z_s, y_s, done_s, rho_s,
    *, n, m, sigma, alpha, eps_abs, eps_rel, max_iter, check_every, refine,
):
    f1 = jnp.float32
    eye_cols = [
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == j for j in range(n)
    ]

    def factorize():
        """(Re)build M = P + sigma I + A' diag(rho) A from rho_s, factor it
        and store the explicit inverse.  Fully vectorized across lanes —
        one factorization pass costs ~4n sequential vector steps."""
        # ---- assemble M --------------------------------------------------
        Arho = A_ref[:] * rho_s[:, :][:, None, :]  # (m, n, TB)
        for i in range(n):
            # M[i, :] = P[i, :] + sigma e_i + sum_r A[r, i] * Arho[r, :]
            col_i = (Arho * A_ref[:, i : i + 1, :]).sum(axis=0)  # (n, TB)
            M_s[i, :, :] = (
                P_ref[i, :, :] + sigma * eye_cols[i].astype(f1) + col_i
            )

        # ---- Cholesky via right-looking full-matrix rank-1 updates ------
        # The symmetric full update zeroes eliminated columns, so after
        # pivot k the saved row satisfies L_s[k, j] = L[j, k] for j >= k
        # (~0 below): L_s is the upper factor U = L' stored row-wise.
        for k in range(n):
            row = M_s[k, :, :]  # (n, TB)
            dkk = row[k : k + 1, :]  # (1, TB)
            inv = jax.lax.rsqrt(jnp.maximum(dkk, 1e-30))
            lrow = row * inv  # (n, TB); lrow[k] = sqrt(dkk)
            L_s[k, :, :] = lrow
            M_s[:, :, :] = M_s[:] - lrow[None, :, :] * lrow[:, None, :]

        # ---- Minv = M^-1: solve U'U X = I, n RHS at once ----------------
        # forward (U'Y = I): Y[k] = (I[k] - sum_{j<k} U[j,k] Y[j]) / U[k,k]
        for k in range(n):
            if k:
                acc = (
                    L_s[:k, k : k + 1, :] * Minv_s[:k, :, :]
                ).sum(axis=0)  # (n, TB): sum_j U[j,k] * Y[j]
            else:
                acc = jnp.zeros((n, TILE_B), f1)
            rhs_row = eye_cols[k].astype(f1)  # (n, 1) broadcasts over lanes
            Minv_s[k, :, :] = (rhs_row - acc) / L_s[k, k : k + 1, :]
        # backward (U X = Y): X[k] = (Y[k] - sum_{j>k} U[k,j] X[j]) / U[k,k]
        for k in range(n - 1, -1, -1):
            if k < n - 1:
                Urow = L_s[k, k + 1 :, :]  # (n-k-1, TB): U[k, j], j > k
                acc = (Urow[:, None, :] * Minv_s[k + 1 :, :, :]).sum(axis=0)
            else:
                acc = jnp.zeros((n, TILE_B), f1)
            Minv_s[k, :, :] = (Minv_s[k, :, :] - acc) / L_s[k, k : k + 1, :]

        # ---- rebuild M for the refinement passes (factored in place) ----
        for i in range(n):
            col_i = (Arho * A_ref[:, i : i + 1, :]).sum(axis=0)
            M_s[i, :, :] = (
                P_ref[i, :, :] + sigma * eye_cols[i].astype(f1) + col_i
            )

    rho_s[:, :] = rho_ref[:]
    factorize()

    # ---- ADMM loop -------------------------------------------------------
    x_s[:, :] = x0_ref[:]
    y_s[:, :] = y0_ref[:]
    z_s[:, :] = (A_ref[:] * x0_ref[:][None, :, :]).sum(axis=1)
    done_s[:, :] = jnp.zeros((1, TILE_B), f1)
    meta_out[:, :] = jnp.zeros((4, TILE_B), f1)

    n_blocks = max(1, (max_iter + check_every - 1) // check_every)

    def one_iter(_, carry):
        it_done = carry
        x = x_s[:, :]
        z = z_s[:, :]
        y = y_s[:, :]
        rho = rho_s[:, :]
        rz_y = rho * z - y  # (m, TB)
        rhs = (
            sigma * x
            - q_ref[:]
            + (A_ref[:] * rz_y[:, None, :]).sum(axis=0)
        )  # (n, TB)
        xt = (Minv_s[:, :, :] * rhs[None, :, :]).sum(axis=1)  # (n, TB)
        if refine:
            resid = rhs - (M_s[:, :, :] * xt[None, :, :]).sum(axis=1)
            xt = xt + (Minv_s[:, :, :] * resid[None, :, :]).sum(axis=1)
        zt = (A_ref[:] * xt[None, :, :]).sum(axis=1)  # (m, TB)
        x_new = alpha * xt + (1.0 - alpha) * x
        z_relax = alpha * zt + (1.0 - alpha) * z
        z_unc = z_relax + y / rho
        z_new = jnp.clip(z_unc, l_ref[:], u_ref[:])
        clipped = (z_unc < l_ref[:]) | (z_unc > u_ref[:])
        y_new = jnp.where(clipped, y + rho * (z_relax - z_new), 0.0)
        act = done_s[0:1, :] < 0.5  # (1, TB)
        x_s[:, :] = jnp.where(act, x_new, x)
        z_s[:, :] = jnp.where(act, z_new, z)
        y_s[:, :] = jnp.where(act, y_new, y)
        return it_done

    def block(carry):
        k, _ = carry
        jax.lax.fori_loop(0, check_every, one_iter, 0)
        # convergence check on UNSCALED residuals (OSQP semantics): the
        # iteration runs on the Ruiz-scaled problem, the stopping test
        # multiplies back by D^-1 / E^-1 / c^-1 (identity when unscaled)
        x = x_s[:, :]
        z = z_s[:, :]
        y = y_s[:, :]
        dinv = dinv_ref[:]  # (n, TB)
        einv = einv_ref[:]  # (m, TB)
        cinv = cinv_ref[:]  # (1, TB)
        Ax = einv * (A_ref[:] * x[None, :, :]).sum(axis=1)  # (m, TB)
        Px = dinv * (
            (P_ref[:, :, :] * x[None, :, :]).sum(axis=1)
        )  # (n, TB)
        Aty = dinv * (A_ref[:] * y[:, :, None].transpose(0, 2, 1)).sum(axis=0)
        pri = jnp.max(jnp.abs(Ax - einv * z), axis=0, keepdims=True)
        dua = cinv * jnp.max(
            jnp.abs(Px + dinv * q_ref[:] + Aty), axis=0, keepdims=True
        )
        pri_rel = jnp.maximum(
            jnp.max(jnp.abs(Ax), axis=0, keepdims=True),
            jnp.max(jnp.abs(einv * z), axis=0, keepdims=True),
        )
        dua_rel = cinv * jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(Px), axis=0, keepdims=True),
                jnp.max(jnp.abs(Aty), axis=0, keepdims=True),
            ),
            jnp.max(jnp.abs(dinv * q_ref[:]), axis=0, keepdims=True),
        )
        conv = (pri <= eps_abs + eps_rel * pri_rel) & (
            dua <= eps_abs + eps_rel * dua_rel
        )
        newly = (done_s[0:1, :] < 0.5) & conv

        # -- adaptive rho (OSQP 5.2): scale the whole per-row rho vector by
        # sqrt(scaled-primal / scaled-dual residual) per lane; refactor only
        # when some active, unconverged lane moves by more than 5x.  The
        # multiplicative update preserves the equality-boost / loose-floor
        # structure the caller baked into rho_vec.
        tiny = 1e-30
        ratio = jnp.sqrt(
            (pri / jnp.maximum(pri_rel, tiny))
            / jnp.maximum(dua / jnp.maximum(dua_rel, tiny), tiny)
        )
        ratio = jnp.clip(ratio, 1e-4, 1e4)
        adapt = (
            (done_s[0:1, :] < 0.5)
            & ~conv
            & ((ratio > 5.0) | (ratio < 0.2))
        )
        scale_l = jnp.where(adapt, ratio, 1.0)  # (1, TB)

        def do_refactor():
            rho_s[:, :] = jnp.clip(rho_s[:, :] * scale_l, 1e-6, 1e6)
            factorize()

        jax.lax.cond(jnp.any(adapt), do_refactor, lambda: None)
        done_s[:, :] = jnp.where(conv, 1.0, done_s[:, :])
        # iters counter (meta row 0) advances only for active instances
        meta_out[0:1, :] = jnp.where(
            done_s[0:1, :] > 0.5,
            jnp.where(
                newly, meta_out[0:1, :] + float(check_every), meta_out[0:1, :]
            ),
            meta_out[0:1, :] + float(check_every),
        )
        meta_out[2:3, :] = pri
        meta_out[3:4, :] = dua
        all_done = jnp.all(done_s[0:1, :] > 0.5)
        return k + 1, all_done

    def cond(carry):
        k, all_done = carry
        return jnp.logical_and(k < n_blocks, jnp.logical_not(all_done))

    jax.lax.while_loop(
        cond, block, (jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )

    meta_out[1:2, :] = done_s[0:1, :]
    x_out[:, :] = x_s[:, :]
    y_out[:, :] = y_s[:, :]
    z_out[:, :] = z_s[:, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "sigma", "alpha", "eps_abs", "eps_rel", "max_iter", "check_every",
        "refine", "ruiz_iters", "interpret",
    ),
)
def solve_batched(
    P, A, q, l, u, rho_vec, x0, y0,
    *, sigma=1e-5, alpha=1.6, eps_abs=5e-6, eps_rel=5e-6,
    max_iter=500, check_every=25, refine=True, ruiz_iters=10,
    interpret=False,
):
    """Solve a batch of small dense QPs, one fused kernel per batch tile.

    Args (batch axis leading): P (B,n,n), A (B,m,n), q (B,n), l/u/rho_vec
    (B,m), warm starts x0 (B,n), y0 (B,m) — all UNSCALED.  Ruiz
    equilibration runs here on the host/XLA side (once per problem, batched
    ops), the kernel iterates on the scaled problem and applies the stopping
    test to unscaled residuals, and the returned (x, y, z, iters, done, pri,
    dua) are unscaled with the batch axis leading.

    ``rho_vec`` carries the per-row penalty (equality rows boosted, loose
    rows at the minimum — ops/admm.py's ``_rho_vec_of`` semantics, computed
    by the caller from masks, which are scale-invariant).
    """
    from .admm import _ruiz_equilibration

    B, n = q.shape
    m = A.shape[1]
    dtype = jnp.float32
    Bp = ((B + TILE_B - 1) // TILE_B) * TILE_B
    pad = Bp - B

    P = P.astype(dtype)
    A = A.astype(dtype)
    q = q.astype(dtype)
    if ruiz_iters > 0:
        d, e, c = jax.vmap(
            lambda Pb, Ab, qb: _ruiz_equilibration(Pb, Ab, qb, ruiz_iters)
        )(P, A, q)
    else:
        d = jnp.ones((B, n), dtype)
        e = jnp.ones((B, m), dtype)
        c = jnp.ones((B,), dtype)
    cb = c[:, None]
    P = cb[:, :, None] * P * d[:, None, :] * d[:, :, None]
    A = A * e[:, :, None] * d[:, None, :]
    q = cb * q * d
    l = e * l.astype(dtype)
    u = e * u.astype(dtype)
    # warm starts into scaled space: xbar = x/d, ybar = c*y/e
    x0 = x0.astype(dtype) / d
    y0 = cb * y0.astype(dtype) / e
    dinv = 1.0 / d
    einv = 1.0 / e
    cinv = (1.0 / c)[:, None]

    def prep(arr, move):
        arr = arr.astype(dtype)
        if pad:
            # edge-replicate the last real instance: pad lanes then solve a
            # well-posed problem and converge with the rest of the tile
            # (all-zero or all-one padding would be singular and pin every
            # tile at max_iter)
            arr = jnp.concatenate(
                [arr, jnp.broadcast_to(arr[-1:], (pad,) + arr.shape[1:])],
                axis=0,
            )
        return jnp.moveaxis(arr, 0, -1) if move else arr

    P_t = prep(P, True)  # (n, n, Bp)
    A_t = prep(A, True)  # (m, n, Bp)
    q_t = prep(q, True)  # (n, Bp)
    l_t = prep(jnp.maximum(l, -INF_BOUND), True)
    u_t = prep(jnp.minimum(u, INF_BOUND), True)
    r_t = prep(rho_vec, True)
    x_t = prep(x0, True)
    y_t = prep(y0, True)
    di_t = prep(dinv, True)  # (n, Bp)
    ei_t = prep(einv, True)  # (m, Bp)
    ci_t = prep(cinv, True)  # (1, Bp)

    grid = Bp // TILE_B
    kern = functools.partial(
        _kernel, n=n, m=m, sigma=float(sigma), alpha=float(alpha),
        eps_abs=float(eps_abs), eps_rel=float(eps_rel),
        max_iter=int(max_iter), check_every=int(check_every),
        refine=bool(refine),
    )

    def spec(*shape):
        ndim = len(shape)
        return pl.BlockSpec(
            shape + (TILE_B,),
            (lambda i, _nd=ndim: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            spec(n, n), spec(m, n), spec(n), spec(m), spec(m), spec(m),
            spec(n), spec(m), spec(n), spec(m), spec(1),
        ],
        out_specs=(spec(n), spec(m), spec(m), spec(4)),
        out_shape=(
            jax.ShapeDtypeStruct((n, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((m, Bp), dtype),
            jax.ShapeDtypeStruct((4, Bp), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, TILE_B), dtype),  # M
            pltpu.VMEM((n, n, TILE_B), dtype),  # Minv
            pltpu.VMEM((n, n, TILE_B), dtype),  # L
            pltpu.VMEM((n, TILE_B), dtype),  # x
            pltpu.VMEM((m, TILE_B), dtype),  # z
            pltpu.VMEM((m, TILE_B), dtype),  # y
            pltpu.VMEM((1, TILE_B), dtype),  # done
            pltpu.VMEM((m, TILE_B), dtype),  # rho (adapted in-kernel)
        ],
        interpret=interpret,
    )(P_t, A_t, q_t, l_t, u_t, r_t, x_t, y_t, di_t, ei_t, ci_t)

    x_o, y_o, z_o, meta = (jnp.moveaxis(o, -1, 0)[:B] for o in out)
    # unscale: x = D xbar, z = E^-1 zbar, y = E ybar / c
    x_o = x_o * d
    z_o = z_o * einv
    y_o = y_o * e * cinv
    iters = meta[:, 0].astype(jnp.int32)
    done = meta[:, 1] > 0.5
    pri, dua = meta[:, 2], meta[:, 3]
    return x_o, y_o, z_o, iters, done, pri, dua


@functools.lru_cache(maxsize=None)
def make_inner_qp_solver(
    sigma=1e-5, alpha=1.6, eps_abs=5e-6, eps_rel=5e-6,
    max_iter=500, check_every=25, interpret=False,
):
    """A per-instance QP solve whose ``vmap`` is the fused batched kernel.

    The SQP driver (ops/sqp.py) is written per-instance and batched with an
    outer ``vmap``; ``jax.custom_batching.custom_vmap`` lets that vmap (and
    the batched ``while_loop`` body it produces) dispatch the whole inner-QP
    batch to ONE :func:`solve_batched` kernel call instead of hundreds of
    tiny lockstep XLA ops.  The unbatched call path runs the same kernel on
    a batch of one, so batched and unbatched numerics are identical.
    """
    kw = dict(
        sigma=sigma, alpha=alpha, eps_abs=eps_abs, eps_rel=eps_rel,
        max_iter=max_iter, check_every=check_every, interpret=interpret,
    )

    @jax.custom_batching.custom_vmap
    def solve(P, A, q, l, u, rho_vec, x0, y0):
        outs = solve_batched(
            P[None], A[None], q[None], l[None], u[None], rho_vec[None],
            x0[None], y0[None], **kw,
        )
        return tuple(o[0] for o in outs)

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        )
        outs = solve_batched(*args, **kw)
        return tuple(outs), tuple(True for _ in outs)

    return solve
