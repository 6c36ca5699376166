"""Pallas TPU kernel: fused ADMM iteration blocks.

The ADMM hot loop runs ``check_termination`` iterations between convergence
checks.  Under plain XLA each iteration is 3 batched matmuls plus ~10
elementwise ops over (B, m) arrays — every one of them a round-trip through
HBM, which dominates the step time for production batch sizes.  This kernel
keeps a *tile of the batch resident in VMEM for all K iterations*: per tile
it loads x/z/y/q/l/u once, loops K times entirely on-chip (MXU matmuls +
VPU elementwise), and writes x/z/y back once — cutting HBM traffic by ~K x.

Shared operands (the constraint matrix, the KKT inverse, the rho vector) are
broadcast to every grid step and stay in VMEM throughout.

Used by ``ops/admm.py`` on the TPU float32 path; the XLA ``fori_loop``
remains the reference implementation (CPU, float64, odd batch sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_BUDGET_BYTES = 8 * 1024 * 1024  # of the ~16MB/core


def _tile_bytes(bt: int, n: int, m: int) -> int:
    # input blocks (x,z,y,done,q,l,u) + output blocks (x,z,y), all
    # double-buffered by the pipeline, plus shared operands (A, M, Minv, rho)
    # and the iteration body's live intermediates (rhs/xt/zt/z_unc ~ 2n+3m).
    # The 8MB budget leaves headroom for Mosaic's own scratch: tile 256 was
    # observed to blow the 16MB scoped limit at large grids despite a
    # 13MB-budget estimate.
    words_in = bt * (2 * n + 4 * m + 1)
    words_out = bt * (n + 2 * m)
    words_body = bt * (2 * n + 3 * m)
    words_shared = m * n + 2 * n * n + m
    return 4 * (2 * (words_in + words_out) + words_body + words_shared)


def _pick_tile(B: int, n: int, m: int) -> int:
    """Largest power-of-two tile dividing the batch that fits VMEM."""
    for bt in (512, 256, 128, 64, 32, 16, 8):
        if B % bt == 0 and _tile_bytes(bt, n, m) < _VMEM_BUDGET_BYTES:
            return bt
    return 0


def supported(B: int, n: int, m: int, dtype) -> bool:
    return dtype == jnp.float32 and _pick_tile(B, n, m) > 0


def _kernel(x_ref, z_ref, y_ref, done_ref, q_ref, l_ref, u_ref,
            A_ref, M_ref, Minv_ref, rho_ref,
            ox_ref, oz_ref, oy_ref,
            *, k_iters: int, sigma: float, alpha: float, refine: bool):
    x = x_ref[:]
    z = z_ref[:]
    y = y_ref[:]
    q = q_ref[:]
    l = l_ref[:]
    u = u_ref[:]
    A = A_ref[:]
    Minv = Minv_ref[:]
    rho = rho_ref[:]  # (1, m)
    frozen = done_ref[:] != 0  # (bt, 1)

    hi = jax.lax.Precision.HIGHEST

    def body(_, carry):
        x, z, y = carry
        # x-update: (P + sigma I + A' R A) xt = sigma x - q + A'(R z - y)
        w = rho * z - y
        rhs = sigma * x - q + jax.lax.dot_general(
            w, A, (((1,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32,
        )
        xt = jax.lax.dot_general(
            rhs, Minv, (((1,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32,
        )
        if refine:
            M = M_ref[:]
            resid = rhs - jax.lax.dot_general(
                xt, M, (((1,), (0,)), ((), ())), precision=hi,
                preferred_element_type=jnp.float32,
            )
            xt = xt + jax.lax.dot_general(
                resid, Minv, (((1,), (0,)), ((), ())), precision=hi,
                preferred_element_type=jnp.float32,
            )
        # zt = A xt, computed as xt contracted with A's columns
        zt = jax.lax.dot_general(
            xt, A, (((1,), (1,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32,
        )
        x_new = alpha * xt + (1.0 - alpha) * x
        zr = alpha * zt + (1.0 - alpha) * z
        z_unc = zr + y / rho
        z_new = jnp.clip(z_unc, l, u)
        clipped = (z_unc < l) | (z_unc > u)
        y_new = jnp.where(clipped, y + rho * (zr - z_new), 0.0)
        return (
            jnp.where(frozen, x, x_new),
            jnp.where(frozen, z, z_new),
            jnp.where(frozen, y, y_new),
        )

    x, z, y = jax.lax.fori_loop(0, k_iters, body, (x, z, y))
    ox_ref[:] = x
    oz_ref[:] = z
    oy_ref[:] = y


def fused_iterations(x, z, y, done, q, l, u, A, M, Minv, rho_vec,
                     *, sigma: float, alpha: float, k_iters: int,
                     refine: bool = True, interpret: bool = False):
    """Run ``k_iters`` ADMM iterations for the whole batch on-chip.

    Args shapes: x/q (B, n); z/y/l/u (B, m); done (B,) bool; A (m, n);
    M/Minv (n, n); rho_vec (m,).  Returns updated (x, z, y).
    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend) — used by the CPU test-suite.
    """
    B, n = x.shape
    m = A.shape[0]
    bt = _pick_tile(B, n, m)
    grid = (B // bt,)

    batch_spec_n = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    batch_spec_m = pl.BlockSpec((bt, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shared = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, k_iters=k_iters, sigma=float(sigma), alpha=float(alpha),
        refine=refine,
    )
    flops_iter = 2 * B * (n * n * (3 if refine else 1) + 2 * n * m)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            batch_spec_n,  # x
            batch_spec_m,  # z
            batch_spec_m,  # y
            pl.BlockSpec((bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),  # done
            batch_spec_n,  # q
            batch_spec_m,  # l
            batch_spec_m,  # u
            shared((m, n)),  # A
            shared((n, n)),  # M
            shared((n, n)),  # Minv
            shared((1, m)),  # rho
        ],
        out_specs=[batch_spec_n, batch_spec_m, batch_spec_m],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), x.dtype),
            jax.ShapeDtypeStruct((B, m), x.dtype),
            jax.ShapeDtypeStruct((B, m), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=k_iters * flops_iter,
            bytes_accessed=4 * B * (2 * n + 4 * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x, z, y,
        done.astype(jnp.int32).reshape(B, 1),
        q, l, u, A, M, Minv, rho_vec.reshape(1, m),
    )
    return out[0], out[1], out[2]
