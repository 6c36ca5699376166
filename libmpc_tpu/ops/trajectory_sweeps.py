"""Fused Pallas kernels for the trajectory-KKT solve sweeps.

The bordered block-tridiagonal solve (ops/trajectory_kkt.traj_solve) is a
forward and a backward recursion over the ``ph`` horizon stages.  As XLA
ops the recursion is ~6 small batched ops per stage — ~200 ops of ~8 us
dispatch each inside the IPM while-loop, ~3 ms per solve at B=256 on TPU
v5e (profiler trace, round 4).  These kernels run each sweep as ONE
``pallas_call`` with a sequential grid over (batch tile, stage): the TPU
grid executes in order, so a VMEM scratch buffer carries the recursion
state ``u_{k-1}`` / ``x_{k+1}`` across grid steps while stage blocks
stream through double-buffered windows — the same batch-in-lanes layout
as ops/batched_linalg.

Forward kernel:  ``u_k = Sinv_k (r_k - L_k u_{k-1})`` plus the border
reduction ``xtr = sum_k X_k^T r_k`` accumulated in scratch.
Backward kernel: ``xT_k = u_k - Sinv_k (L_{k+1}^T xT_{k+1})`` emitting
``x_k = xT_k - X_k g``.

Both are exact restatements of the XLA recursion (no reordering), so
results match the unrolled path to the usual fused-vs-unfused rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 128
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def sweeps_supported(ph: int, bs: int, w: int) -> bool:
    """Whether the sweep kernels' VMEM working set fits (double-buffered
    Sinv/L windows dominate)."""
    if ph < 2:
        return False
    window = (2 * bs * bs + bs * w + 3 * bs + w * w) * TILE_B * 4
    return 2 * window + 2 * bs * TILE_B * 4 <= _VMEM_BUDGET_BYTES


def _mm(A, Bm):
    """Lane-batched matmul: (a, k, TB) x (k, b, TB) -> (a, b, TB)."""
    return jnp.stack(
        [(A * Bm[:, j, :][None, :, :]).sum(axis=1)
         for j in range(Bm.shape[1])],
        axis=1,
    )


def _mmT(A, Bm):
    """Lane-batched A @ B^T: (a, k, TB) x (b, k, TB) -> (a, b, TB)."""
    return jnp.stack(
        [(A * Bm[j][None, :, :]).sum(axis=1) for j in range(Bm.shape[0])],
        axis=1,
    )


def _chol_inv_vals(M, p):
    """In-kernel inverse of a lane-batched SPD matrix (p, p, TB) — the
    value-level restatement of batched_linalg._chol_inv_kernel (right-
    looking rank-1 Cholesky + two triangular inversions)."""
    f1 = M.dtype
    X = M
    rows = []
    for i in range(p):
        row = X[i]  # (p, TB)
        inv = jax.lax.rsqrt(jnp.maximum(row[i : i + 1], 1e-30))
        lrow = row * inv
        rows.append(lrow)
        X = X - lrow[None, :, :] * lrow[:, None, :]
    eye_cols = [
        (jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) == i).astype(f1)
        for i in range(p)
    ]
    inv_rows = [None] * p
    for i in range(p):
        acc = 0.0
        for j in range(i):
            acc = acc + rows[j][i : i + 1, :] * inv_rows[j]
        inv_rows[i] = (eye_cols[i] - acc) / rows[i][i : i + 1, :]
    for i in range(p - 1, -1, -1):
        acc = 0.0
        for j in range(i + 1, p):
            acc = acc + rows[i][j : j + 1, :] * inv_rows[j]
        inv_rows[i] = (inv_rows[i] - acc) / rows[i][i : i + 1, :]
    return jnp.stack(inv_rows, axis=0)


def _qd_inv_vals(S, p):
    """In-kernel quasi-definite block inverse (positive leading p slots,
    negative trailing) — mirrors trajectory_kkt._qd_inverse."""
    A = S[:p, :p]
    Bl = S[p:, :p]
    C = -S[p:, p:]
    Ai = _chol_inv_vals(0.5 * (A + jnp.swapaxes(A, 0, 1)), p)
    W = _mm(Bl, Ai)  # (n, p, TB)
    S2 = C + _mmT(W, Bl)
    S2i = _chol_inv_vals(0.5 * (S2 + jnp.swapaxes(S2, 0, 1)), S.shape[0] - p)
    TR = _mm(jnp.swapaxes(W, 0, 1), S2i)  # (p, n, TB)
    TL = Ai - _mm(TR, W)
    top = jnp.concatenate([TL, TR], axis=1)
    bot = jnp.concatenate([jnp.swapaxes(TR, 0, 1), -S2i], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _factor_kernel(D_ref, L_ref, C_ref, Sinv_ref, U_ref, Gsum_ref,
                   Sprev, Zprev, acc, *, ph, bs_p):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        Sprev[...] = jnp.zeros_like(Sprev)
        Zprev[...] = jnp.zeros_like(Zprev)
        acc[...] = jnp.zeros_like(acc)

    Dk = D_ref[0]
    Lk = L_ref[0]  # L[k-1]; garbage duplicate at k=0, masked below
    Ck = C_ref[0]
    LS = _mm(Lk, Sprev[...])
    mask = (k > 0).astype(Dk.dtype)
    Sk = Dk - mask * _mmT(LS, Lk)
    Zk = Ck - mask * _mm(LS, Zprev[...])
    Ski = _qd_inv_vals(Sk, bs_p)
    Uk = _mm(Ski, Zk)
    acc[...] += _mm(jnp.swapaxes(Zk, 0, 1), Uk)
    Sprev[...] = Ski
    Zprev[...] = Zk
    Sinv_ref[0] = Ski
    U_ref[0] = Uk

    @pl.when(k == ph - 1)
    def _emit():
        Gsum_ref[...] = acc[...]


def _xsweep_kernel(U_ref, Sinv_ref, L_ref, X_ref, x_next, *, ph):
    """Backward sweep building X = T^-1 B_border from U (w rhs columns)."""
    k = pl.program_id(1)
    Uk = U_ref[0]

    @pl.when(k == 0)
    def _last():
        x_next[...] = Uk

    @pl.when(k > 0)
    def _rest():
        Ln = L_ref[0]  # L[kk], kk = ph-1-k
        t = jnp.stack(
            [(Ln * x_next[...][:, j, :][:, None, :]).sum(axis=0)
             for j in range(Uk.shape[1])],
            axis=1,
        )  # L^T x_{kk+1}: (bs, w, TB)
        x_next[...] = Uk - _mm(Sinv_ref[0], t)

    X_ref[0] = x_next[...]


def factor_supported(ph: int, bs: int, w: int) -> bool:
    if ph < 2:
        return False
    window = (3 * bs * bs + 2 * bs * w + w * w) * TILE_B * 4
    scratch = (bs * bs + bs * w + w * w + 4 * bs * bs) * TILE_B * 4
    return 2 * window + scratch <= _VMEM_BUDGET_BYTES


@functools.partial(jax.jit, static_argnames=("bs_p", "interpret"))
def batched_factor(D, L, C, G, bs_p: int, interpret=False):
    """Batched bordered block-tridiagonal quasi-definite factorization.

    Args (batch axis 0): ``D`` (B, ph, bs, bs), ``L`` (B, ph-1, bs, bs),
    ``C`` (B, ph, bs, w), ``G`` (B, w, w).  Returns
    (Sinv (B,ph,bs,bs), X (B,ph,bs,w), Ghat (B,w,w)) — the caller inverts
    Ghat (ops/batched_linalg.chol_inverse) and assembles TrajFactors.
    """
    B, ph, bs, _ = D.shape
    w = C.shape[-1]
    dtype = D.dtype
    Bp = ((B + TILE_B - 1) // TILE_B) * TILE_B
    pad = Bp - B

    def lanes(a, pad_arr=None):
        if pad:
            if pad_arr is None:
                pad_arr = jnp.zeros((pad,) + a.shape[1:], dtype)
            a = jnp.concatenate([a, pad_arr], axis=0)
        return jnp.moveaxis(a, 0, -1)

    # padded lanes factor a benign identity-like quasi-definite system
    eye_qd = jnp.eye(bs, dtype=dtype).at[bs_p:, bs_p:].mul(-1.0)
    D_t = lanes(D, jnp.broadcast_to(eye_qd, (pad, ph, bs, bs)))
    L_t = lanes(L)
    L_ext = jnp.concatenate([L_t[:1], L_t], axis=0)
    C_t = lanes(C)
    nt = Bp // TILE_B
    grid = (nt, ph)

    Sinv_t, U_t, Gsum_t = pl.pallas_call(
        functools.partial(_factor_kernel, ph=ph, bs_p=bs_p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, bs, TILE_B), lambda t, k: (k, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, bs, TILE_B), lambda t, k: (k, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, w, TILE_B), lambda t, k: (k, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bs, bs, TILE_B), lambda t, k: (k, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, w, TILE_B), lambda t, k: (k, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w, TILE_B), lambda t, k: (0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ph, bs, bs, Bp), dtype),
            jax.ShapeDtypeStruct((ph, bs, w, Bp), dtype),
            jax.ShapeDtypeStruct((w, w, Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bs, bs, TILE_B), dtype),
            pltpu.VMEM((bs, w, TILE_B), dtype),
            pltpu.VMEM((w, w, TILE_B), dtype),
        ],
        interpret=interpret,
    )(D_t, L_ext, C_t)

    (X_t,) = pl.pallas_call(
        functools.partial(_xsweep_kernel, ph=ph),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, w, TILE_B), lambda t, k: (ph - 1 - k, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, bs, TILE_B), lambda t, k: (ph - 1 - k, 0, 0, t),
                         memory_space=pltpu.VMEM),
            # L_ext[j] = L[j-1]; stage kk needs L[kk] -> index kk+1
            pl.BlockSpec((1, bs, bs, TILE_B),
                         lambda t, k: (jnp.minimum(ph - k, ph - 1), 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bs, w, TILE_B), lambda t, k: (ph - 1 - k, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((ph, bs, w, Bp), dtype)],
        scratch_shapes=[pltpu.VMEM((bs, w, TILE_B), dtype)],
        interpret=interpret,
    )(U_t, Sinv_t, L_ext)

    Sinv = jnp.moveaxis(Sinv_t, -1, 0)[:B]
    X = jnp.moveaxis(X_t, -1, 0)[:B]
    Ghat = G - jnp.moveaxis(Gsum_t, -1, 0)[:B]
    return Sinv, X, Ghat


def _fwd_kernel(Sinv_ref, L_ref, r_ref, X_ref, u_ref, xtr_ref, u_prev, acc,
                *, ph):
    k = pl.program_id(1)
    rk = r_ref[0]  # (bs, TB)

    @pl.when(k == 0)
    def _init():
        u_prev[...] = jnp.zeros_like(u_prev)
        acc[...] = jnp.zeros_like(acc)

    Lk = L_ref[0]  # (bs, bs, TB); the k=0 window is a clamped duplicate
    lu = (Lk * u_prev[...][None, :, :]).sum(axis=1)
    v = jnp.where(k == 0, rk, rk - lu)
    u = (Sinv_ref[0] * v[None, :, :]).sum(axis=1)
    u_prev[...] = u
    u_ref[0] = u
    acc[...] += (X_ref[0] * rk[:, None, :]).sum(axis=0)

    @pl.when(k == ph - 1)
    def _emit():
        xtr_ref[...] = acc[...]


def _bwd_kernel(u_ref, Sinv_ref, L_ref, X_ref, g_ref, xs_ref, x_next, *, ph):
    k = pl.program_id(1)  # kk = ph-1-k via the index maps
    uk = u_ref[0]

    @pl.when(k == 0)
    def _last():
        x_next[...] = uk  # xT_{ph-1} = u_{ph-1}

    @pl.when(k > 0)
    def _rest():
        Ln = L_ref[0]  # L[kk] couples stage kk+1 -> kk
        t = (Ln * x_next[...][:, None, :]).sum(axis=0)  # L^T x_{kk+1}
        x_next[...] = uk - (Sinv_ref[0] * t[None, :, :]).sum(axis=1)

    xg = (X_ref[0] * g_ref[...][None, :, :]).sum(axis=1)
    xs_ref[0] = x_next[...] - xg


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_sweep_solve(Sinv, L, X, Ghat_inv, r_stage, r_g, interpret=False):
    """Batched bordered block-tridiagonal solve.

    Args (batch axis 0): ``Sinv`` (B, ph, bs, bs), ``L`` (B, ph-1, bs, bs),
    ``X`` (B, ph, bs, w), ``Ghat_inv`` (B, w, w), ``r_stage`` (B, ph, bs),
    ``r_g`` (B, w).  Returns (``xs`` (B, ph, bs), ``g`` (B, w)).
    """
    B, ph, bs, _ = Sinv.shape
    w = X.shape[-1]
    dtype = Sinv.dtype
    Bp = ((B + TILE_B - 1) // TILE_B) * TILE_B
    pad = Bp - B

    def lanes(a, pad_value=0.0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], pad_value, dtype)], axis=0
            )
        return jnp.moveaxis(a, 0, -1)  # (..., Bp)

    # padded lanes solve a trivial identity-ish system; Sinv=I keeps the
    # recursion finite on them
    eyes = jnp.broadcast_to(jnp.eye(bs, dtype=dtype), (pad, ph, bs, bs))
    Sinv_t = jnp.moveaxis(
        jnp.concatenate([Sinv, eyes], axis=0) if pad else Sinv, 0, -1
    )
    L_t = lanes(L)  # (ph-1, bs, bs, Bp)
    # clamped duplicate for the k=0 window (masked out in-kernel)
    L_ext = jnp.concatenate([L_t[:1], L_t], axis=0)  # (ph, bs, bs, Bp)
    X_t = lanes(X)
    r_t = lanes(r_stage)
    nt = Bp // TILE_B
    grid = (nt, ph)

    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, ph=ph),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, bs, TILE_B), lambda t, k: (k, 0, 0, t),
                         memory_space=pltpu.VMEM),
            # L_ext[j] holds L[j-1]; stage k consumes L[k-1] -> index k
            # (the k=0 window is a clamped duplicate, masked in-kernel)
            pl.BlockSpec((1, bs, bs, TILE_B), lambda t, k: (k, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, TILE_B), lambda t, k: (k, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, w, TILE_B), lambda t, k: (k, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bs, TILE_B), lambda t, k: (k, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, TILE_B), lambda t, k: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ph, bs, Bp), dtype),
            jax.ShapeDtypeStruct((w, Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bs, TILE_B), dtype),
            pltpu.VMEM((w, TILE_B), dtype),
        ],
        interpret=interpret,
    )
    u_t, xtr_t = fwd(Sinv_t, L_ext, r_t, X_t)

    # border solve (tiny, XLA): g = Ghat_inv (r_g - xtr)
    xtr = jnp.moveaxis(xtr_t, -1, 0)[:B]
    g = jnp.einsum("bij,bj->bi", Ghat_inv, r_g - xtr)
    g_t = lanes(g)

    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, ph=ph),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, TILE_B), lambda t, k: (ph - 1 - k, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, bs, TILE_B),
                         lambda t, k: (ph - 1 - k, 0, 0, t),
                         memory_space=pltpu.VMEM),
            # L_ext[j] holds L[j-1]; stage kk needs L[kk] -> index kk+1
            # (clamped duplicate at kk = ph-1, where @pl.when skips it)
            pl.BlockSpec((1, bs, bs, TILE_B),
                         lambda t, k: (jnp.minimum(ph - k, ph - 1), 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, w, TILE_B),
                         lambda t, k: (ph - 1 - k, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, TILE_B), lambda t, k: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bs, TILE_B), lambda t, k: (ph - 1 - k, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((ph, bs, Bp), dtype)],
        scratch_shapes=[pltpu.VMEM((bs, TILE_B), dtype)],
        interpret=interpret,
    )
    (xs_t,) = bwd(u_t, Sinv_t, L_ext, X_t, g_t)
    xs = jnp.moveaxis(xs_t, -1, 0)[:B]
    return xs, g
