"""Exact ZOH discretization of linear systems via the matrix exponential.

Mirrors the three overloads of ``mpc::discretization``
(reference: include/mpc/Utils.hpp:24-118) using ``jax.scipy.linalg.expm``:
the block matrix ``[[A, B], [0, 0]] * Ts`` is exponentiated and the discrete
(Ad, Bd) blocks read back.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import expm


def discretization(A, B, Ts):
    """ZOH-discretize ``dx = A x + B u`` (reference: include/mpc/Utils.hpp:24-47).

    Returns ``(Ad, Bd)`` with ``x+ = Ad x + Bd u``.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    nx, nu = A.shape[0], B.shape[1]
    top = jnp.concatenate([A, B], axis=1) * Ts
    block = jnp.zeros((nx + nu, nx + nu), dtype=top.dtype).at[:nx].set(top)
    e = expm(block)
    return e[:nx, :nx], e[:nx, nx : nx + nu]


def discretization_with_disturbance(A, B, Be, Ts):
    """ZOH with disturbance input (reference: include/mpc/Utils.hpp:63-89).

    Returns ``(Ad, Bd, Bed)``.
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    Be = jnp.asarray(Be)
    nx, nu, nud = A.shape[0], B.shape[1], Be.shape[1]
    n = nx + nu + nud
    top = jnp.concatenate([A, B, Be], axis=1) * Ts
    block = jnp.zeros((n, n), dtype=top.dtype).at[:nx].set(top)
    e = expm(block)
    return e[:nx, :nx], e[:nx, nx : nx + nu], e[:nx, nx + nu :]


def discretization_with_output(A, B, C, D, Ts):
    """ZOH of the state equation, pass-through C/D
    (reference: include/mpc/Utils.hpp:108-118).

    Returns ``(Ad, Bd, Cd, Dd)``.
    """
    Ad, Bd = discretization(A, B, Ts)
    return Ad, Bd, jnp.asarray(C), jnp.asarray(D)
