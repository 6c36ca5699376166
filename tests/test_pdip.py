"""Interior-point inner-QP solver tests: KKT optimality on random problems
and agreement with the ADMM kernel (the two engines must interchange under
the SQP driver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libmpc_tpu.ops import admm, pdip
from libmpc_tpu.types import LParameters

from test_admm import random_qp, kkt_error

TIGHT = LParameters(maximum_iteration=8000, eps_abs=1e-9, eps_rel=1e-9)


def _pdip_as_box(P, A, q, l, u):
    """Solve the OSQP-form box QP with pdip by splitting rows into
    eq (l==u) and two one-sided inequality families."""
    eq = (l == u) & np.isfinite(l)
    Je = A[eq]
    be = l[eq]
    Ai = A[~eq]
    li, ui = l[~eq], u[~eq]
    Ji = np.concatenate([Ai, -Ai], axis=0)
    bi = np.concatenate([ui, -li])
    mask = np.concatenate([np.isfinite(ui), np.isfinite(li)])
    bi = np.where(mask, bi, 1e3)
    sol = pdip.pdip_solve(
        jnp.asarray(P), jnp.asarray(q), jnp.asarray(Je), jnp.asarray(be),
        jnp.asarray(Ji), jnp.asarray(bi), jnp.asarray(mask),
    )
    mi = Ai.shape[0]
    y = np.zeros(A.shape[0])
    lam = np.asarray(sol.lam)
    y[~eq] = lam[:mi] - lam[mi:]
    y[eq] = np.asarray(sol.nu)
    return np.asarray(sol.d), y, int(sol.status), int(sol.iters)


class TestPDIP:
    @pytest.mark.parametrize("seed", range(5))
    def test_random_kkt(self, seed):
        rng = np.random.default_rng(seed)
        n, m = 8, 12
        P, A, q, l, u = random_qp(rng, n, m)
        x, y, status, iters = _pdip_as_box(P, A, q, l, u)
        assert status == admm.OSQP_SOLVED
        err = kkt_error(P, A, q, l, u, x, y)
        assert err < 1e-6, err

    def test_matches_admm(self):
        rng = np.random.default_rng(42)
        n, m = 10, 14
        P, A, q, l, u = random_qp(rng, n, m)
        # mix in equality rows
        l[:3] = u[:3] = (l[:3] + u[:3]) / 2
        x, y, status, _ = _pdip_as_box(P, A, q, l, u)
        ref = admm.admm_solve(*map(jnp.asarray, (P, A, q, l, u)), TIGHT)
        assert status == admm.OSQP_SOLVED
        assert np.allclose(x, np.asarray(ref.x), atol=1e-6)

    def test_active_bounds(self):
        """A problem whose solution pins several inequality rows."""
        rng = np.random.default_rng(7)
        n = 6
        L = rng.normal(size=(n, n))
        P = L @ L.T + 0.5 * np.eye(n)
        q = -10.0 * np.ones(n)  # pushes x up hard
        A = np.eye(n)
        l = np.full(n, -1.0)
        u = np.full(n, 1.0)
        x, y, status, _ = _pdip_as_box(P, A, q, l, u)
        assert status == admm.OSQP_SOLVED
        assert np.all(x <= 1.0 + 1e-7)
        err = kkt_error(P, A, q, l, u, x, y)
        assert err < 1e-6

    def test_vmapped_batch(self):
        """pdip under vmap (the SQP usage pattern): lockstep convergence."""
        rng = np.random.default_rng(3)
        n, me, mi, B = 6, 2, 8, 16
        Lm = rng.normal(size=(n, n))
        P = Lm @ Lm.T + 0.3 * np.eye(n)
        Je = rng.normal(size=(me, n))
        Ji = rng.normal(size=(mi, n))
        be = rng.normal(size=(B, me)) * 0.1
        x_hat = rng.normal(size=(B, n)) * 0.2
        bi = x_hat @ Ji.T + rng.uniform(0.1, 1.0, size=(B, mi))
        g = rng.normal(size=(B, n))
        mask = jnp.ones((mi,), bool)

        solve = jax.vmap(
            lambda gg, bbe, bbi: pdip.pdip_solve(
                jnp.asarray(P), gg, jnp.asarray(Je), bbe,
                jnp.asarray(Ji), bbi, mask,
            )
        )
        # feasibility of the random eq rows is not guaranteed; just check
        # the solver returns finite iterates and solves most instances
        sol = solve(jnp.asarray(g), jnp.asarray(be), jnp.asarray(bi))
        assert np.all(np.isfinite(np.asarray(sol.d)))
        ok = np.asarray(sol.status) == admm.OSQP_SOLVED
        assert ok.mean() > 0.8
        # KKT check on the solved ones
        for i in np.nonzero(ok)[0][:5]:
            rd = P @ np.asarray(sol.d[i]) + g[i] + np.asarray(sol.nu[i]) @ Je \
                + np.asarray(sol.lam[i]) @ Ji
            assert np.max(np.abs(rd)) < 1e-6
