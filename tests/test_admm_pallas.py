"""Pallas fused-ADMM kernel tests (interpreter mode, CPU).

The kernel must reproduce the XLA reference iteration exactly (same update
equations on the same state); on hardware only the float32 rounding order
differs.  Here both run in float32 on CPU via the Pallas interpreter, where
they should agree to tight tolerance over a full iteration block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libmpc_tpu.ops import admm_pallas


def _xla_reference(x, z, y, done, q, l, u, A, M, Minv, rho, sigma, alpha,
                   k_iters, refine):
    frozen = done[:, None]

    def one(carry):
        x, z, y = carry
        rhs = sigma * x - q + (rho * z - y) @ A
        xt = rhs @ Minv
        if refine:
            xt = xt + (rhs - xt @ M) @ Minv
        zt = xt @ A.T
        xn = alpha * xt + (1 - alpha) * x
        zr = alpha * zt + (1 - alpha) * z
        z_unc = zr + y / rho
        zn = jnp.clip(z_unc, l, u)
        clipped = (z_unc < l) | (z_unc > u)
        yn = jnp.where(clipped, y + rho * (zr - zn), 0.0)
        return (
            jnp.where(frozen, x, xn),
            jnp.where(frozen, z, zn),
            jnp.where(frozen, y, yn),
        )

    carry = (x, z, y)
    for _ in range(k_iters):
        carry = one(carry)
    return carry


def _random_problem(B, n, m, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(n, n)).astype(np.float32)
    P = L @ L.T + 0.5 * np.eye(n, dtype=np.float32)
    A = rng.normal(size=(m, n)).astype(np.float32)
    rho = np.full(m, 0.1, np.float32)
    sigma = 1e-5
    M = P + sigma * np.eye(n, dtype=np.float32) + (A.T * rho) @ A
    Minv = np.linalg.inv(M).astype(np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    zc = (rng.normal(size=(B, n)).astype(np.float32)) @ A.T
    w = rng.uniform(0.3, 1.0, size=(B, m)).astype(np.float32)
    l, u = zc - w, zc + w
    # a few infinite bounds to exercise the clip path
    l[:, 0] = -np.inf
    u[:, 1] = np.inf
    return (jnp.asarray(v) for v in
            (P, A, q, l, u, M, Minv, rho))


class TestFusedIterations:
    @pytest.mark.parametrize("B,n,m", [(16, 8, 12), (32, 24, 40)])
    def test_matches_xla_reference(self, B, n, m):
        P, A, q, l, u, M, Minv, rho = _random_problem(B, n, m)
        x = jnp.zeros((B, n), jnp.float32)
        z = jnp.zeros((B, m), jnp.float32)
        y = jnp.zeros((B, m), jnp.float32)
        done = jnp.zeros((B,), bool).at[3].set(True)  # one frozen lane

        xp, zp, yp = admm_pallas.fused_iterations(
            x, z, y, done, q, l, u, A, M, Minv, rho,
            sigma=1e-5, alpha=1.6, k_iters=10, refine=True, interpret=True,
        )
        xr, zr, yr = _xla_reference(
            x, z, y, done, q, l, u, A, M, Minv, rho, 1e-5, 1.6, 10, True
        )
        assert np.allclose(np.asarray(xp), np.asarray(xr), atol=1e-4)
        assert np.allclose(np.asarray(zp), np.asarray(zr), atol=1e-4)
        assert np.allclose(np.asarray(yp), np.asarray(yr), atol=1e-4)
        # frozen lane untouched
        assert np.all(np.asarray(xp)[3] == 0)
        assert np.all(np.asarray(yp)[3] == 0)

    def test_tile_selection(self):
        assert admm_pallas._pick_tile(4096, 216, 535) in (128, 256)
        assert admm_pallas._pick_tile(100, 8, 8) == 0 or 100 % admm_pallas._pick_tile(100, 8, 8) == 0
        assert admm_pallas.supported(4096, 216, 535, jnp.float32)
        assert not admm_pallas.supported(4096, 216, 535, jnp.float64)
        assert not admm_pallas.supported(7, 216, 535, jnp.float32)
