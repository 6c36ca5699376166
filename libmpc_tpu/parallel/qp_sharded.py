"""Model-parallel (row-sharded) ADMM for large QPs.

The scenario/data axis is the primary scaling dimension for MPC fleets
(SURVEY §2.3), but very large single problems — long horizons, plant-wide
MPC with thousands of constraint rows — can outgrow one chip.  This solver
shards the *constraint-row* dimension of ``A``/``z``/``y``/``l``/``u`` over
the mesh's ``model`` axis (the tensor-parallel analog):

* each device holds a block of constraint rows; the x-space quantities stay
  replicated;
* the two cross-space products per iteration reduce over ICI:
  ``A' (rho z - y)`` via ``psum`` and the KKT assembly ``A' R A`` via one
  ``psum`` at factorization time;
* residual inf-norms combine with ``pmax``; every device reaches identical
  convergence decisions, so no divergence between shards.

Composable with the data axis: inputs may carry a batch dimension sharded
over ``data`` while rows shard over ``model`` — one ``shard_map`` over the
2D mesh runs fleet × row parallelism together.

Simplifications vs ``ops/admm.py`` (the single-chip kernel remains the
full-featured path): no Ruiz equilibration (pre-scale if needed), fixed
per-row rho (eq rows x1e3), no infeasibility certificates, no polish.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..types import LParameters
from . import mesh as mesh_lib
from ..ops.admm import OSQP_MAX_ITER_REACHED, OSQP_SOLVED, RHO_EQ_OVER_RHO_INEQ, RHO_MIN


class ShardedQPSolution(NamedTuple):
    x: jax.Array  # (B, n)
    y: jax.Array  # (B, m) (unpadded)
    iters: jax.Array  # (B,)
    status: jax.Array  # (B,)
    pri_res: jax.Array  # (B,)
    dua_res: jax.Array  # (B,)


def solve_sharded(
    P_mat: jax.Array,
    A: jax.Array,
    q: jax.Array,
    l: jax.Array,
    u: jax.Array,
    mesh: Mesh,
    params: LParameters = LParameters(),
    eq_mask: Optional[jax.Array] = None,
) -> ShardedQPSolution:
    """Solve a batch of QPs with constraint rows sharded over ``model`` and
    the batch sharded over ``data``.

    Shapes: P (n, n); A (m, n); q (B, n); l/u (B, m).  B must divide the
    data-axis size; rows are zero-padded to a multiple of the model-axis
    size (pad rows are unconstrained and never active).
    """
    n_model = mesh.shape[mesh_lib.MODEL_AXIS]
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    B, n = q.shape
    m = A.shape[0]
    dtype = P_mat.dtype
    if B % n_data:
        raise ValueError(f"batch {B} must divide over data axis {n_data}")

    if eq_mask is None:
        eq_mask = (l[0] == u[0]) & jnp.isfinite(l[0])

    # pad rows to a multiple of the model axis with unconstrained zero rows
    m_pad = mesh_lib.pad_to_multiple(m, n_model)
    if m_pad != m:
        pad = m_pad - m
        A = jnp.concatenate([A, jnp.zeros((pad, n), dtype)], axis=0)
        l = jnp.concatenate([l, jnp.full((B, pad), -jnp.inf, dtype)], axis=1)
        u = jnp.concatenate([u, jnp.full((B, pad), jnp.inf, dtype)], axis=1)
        eq_mask = jnp.concatenate([eq_mask, jnp.zeros((pad,), bool)])

    rho = jnp.clip(jnp.asarray(params.rho, dtype), 1e-3 if dtype == jnp.float32 else RHO_MIN, 1e6)
    rho_vec_full = jnp.where(eq_mask, RHO_EQ_OVER_RHO_INEQ * rho, rho)
    # loose rows (including padding) get the minimum rho
    loose_rows = (l[0] == -jnp.inf) & (u[0] == jnp.inf)
    rho_vec_full = jnp.where(loose_rows, RHO_MIN, rho_vec_full)

    sigma = jnp.asarray(max(params.sigma, 1e-5 if dtype == jnp.float32 else 0.0), dtype)
    alpha = jnp.asarray(params.alpha, dtype)
    check = min(params.check_termination, params.maximum_iteration)
    n_blocks = max(1, (params.maximum_iteration + check - 1) // check)

    def body(P_mat, A_loc, q_loc, l_loc, u_loc, rho_loc):
        """Runs on each device: full x-space, local constraint rows."""
        with jax.default_matmul_precision("highest"):
            # shared KKT: M = P + sigma I + sum_shards A_loc' R_loc A_loc
            AtRA = jax.lax.psum(
                (A_loc.T * rho_loc[None, :]) @ A_loc, mesh_lib.MODEL_AXIS
            )
            M = P_mat + sigma * jnp.eye(n, dtype=dtype) + AtRA
            cho = jax.scipy.linalg.cho_factor(M)
            Minv = jax.scipy.linalg.cho_solve(cho, jnp.eye(n, dtype=dtype))

            Bl = q_loc.shape[0]
            ml = A_loc.shape[0]
            x = jnp.zeros((Bl, n), dtype)
            z = jnp.zeros((Bl, ml), dtype)
            y = jnp.zeros((Bl, ml), dtype)

            def one_iter(carry):
                x, z, y, done = carry
                w = rho_loc * z - y
                rhs = sigma * x - q_loc + jax.lax.psum(
                    w @ A_loc, mesh_lib.MODEL_AXIS
                )
                xt = rhs @ Minv
                zt = xt @ A_loc.T
                xn = alpha * xt + (1 - alpha) * x
                zr = alpha * zt + (1 - alpha) * z
                z_unc = zr + y / rho_loc
                zn = jnp.clip(z_unc, l_loc, u_loc)
                clipped = (z_unc < l_loc) | (z_unc > u_loc)
                yn = jnp.where(clipped, y + rho_loc * (zr - zn), 0.0)
                keep = done[:, None]
                return (
                    jnp.where(keep, x, xn),
                    jnp.where(keep, z, zn),
                    jnp.where(keep, y, yn),
                    done,
                )

            def check_fn(x, z, y):
                Ax = x @ A_loc.T
                Px = x @ P_mat
                Aty = jax.lax.psum(y @ A_loc, mesh_lib.MODEL_AXIS)
                pmax = lambda v: jax.lax.pmax(
                    jnp.max(jnp.abs(v), axis=-1), mesh_lib.MODEL_AXIS
                )
                pri = pmax(Ax - z)
                dua = jnp.max(jnp.abs(Px + q_loc + Aty), axis=-1)
                pri_rel = jnp.maximum(pmax(Ax), pmax(z))
                dua_rel = jnp.maximum(
                    jnp.max(jnp.abs(Px), axis=-1),
                    jnp.maximum(
                        jnp.max(jnp.abs(Aty), axis=-1),
                        jnp.max(jnp.abs(q_loc), axis=-1),
                    ),
                )
                solved = (pri <= params.eps_abs + params.eps_rel * pri_rel) & (
                    dua <= params.eps_abs + params.eps_rel * dua_rel
                )
                return solved, pri, dua

            def block(state):
                x, z, y, done, iters, pri, dua, k = state
                x, z, y, done = jax.lax.fori_loop(
                    0, check, lambda _, c: one_iter(c), (x, z, y, done)
                )
                solved, pri_n, dua_n = check_fn(x, z, y)
                newly = ~done
                iters = iters + jnp.where(done, 0, check)
                pri = jnp.where(newly, pri_n, pri)
                dua = jnp.where(newly, dua_n, dua)
                return (x, z, y, done | solved, iters, pri, dua, k + 1)

            def cond(state):
                return (state[7] < n_blocks) & ~jnp.all(state[3])

            state = (
                x, z, y,
                jnp.zeros((Bl,), bool),
                jnp.zeros((Bl,), jnp.int32),
                jnp.full((Bl,), jnp.inf, dtype),
                jnp.full((Bl,), jnp.inf, dtype),
                jnp.asarray(0, jnp.int32),
            )
            x, z, y, done, iters, pri, dua, _ = jax.lax.while_loop(
                cond, block, state
            )
            status = jnp.where(done, OSQP_SOLVED, OSQP_MAX_ITER_REACHED).astype(
                jnp.int32
            )
            return x, y, iters, status, pri, dua

    data, model = mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),  # P replicated
            P(model, None),  # A rows sharded
            P(data, None),  # q batch sharded
            P(data, model),  # l
            P(data, model),  # u
            P(model),  # rho rows
        ),
        out_specs=(
            P(data, None),  # x (replicated over model)
            P(data, model),  # y rows sharded
            P(data), P(data), P(data), P(data),
        ),
        check_vma=False,
    )
    x, y, iters, status, pri, dua = jax.jit(sharded)(
        P_mat, A, q, l, u, rho_vec_full
    )
    return ShardedQPSolution(
        x=x, y=y[:, :m], iters=iters, status=status, pri_res=pri, dua_res=dua
    )
