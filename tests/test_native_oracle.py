"""Cross-validation of the JAX ADMM kernel against the native C++ oracle.

Two fully independent implementations of the same algorithm (different
language, arithmetic order and code lineage) must agree on the optimum —
the framework's analog of the reference's MATLAB cross-check (SURVEY §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from libmpc_tpu import LParameters
from libmpc_tpu import native_qp
from libmpc_tpu.ops import admm

from test_admm import random_qp, kkt_error

pytestmark = pytest.mark.skipif(
    not native_qp.available(), reason="native toolchain unavailable"
)

TIGHT = LParameters(maximum_iteration=4000, eps_abs=1e-9, eps_rel=1e-9)


class TestOracleAgreement:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_qp_agreement(self, seed):
        rng = np.random.default_rng(seed)
        P, A, q, l, u = random_qp(rng, 8, 12)
        jax_sol = admm.admm_solve(
            *map(jnp.asarray, (P, A, q, l, u)), TIGHT
        )
        native_sol = native_qp.solve(P, A, q, l, u)
        assert native_sol.status == 1
        assert np.allclose(np.asarray(jax_sol.x), native_sol.x, atol=1e-6)
        assert kkt_error(P, A, q, l, u, native_sol.x, native_sol.y) < 1e-6

    def test_equality_constrained_agreement(self):
        rng = np.random.default_rng(5)
        n, m = 6, 3
        P, A, q, _, _ = random_qp(rng, n, m)
        b = rng.normal(size=m)
        jax_sol = admm.admm_solve(
            jnp.asarray(P), jnp.asarray(A), jnp.asarray(q),
            jnp.asarray(b), jnp.asarray(b), TIGHT
        )
        native_sol = native_qp.solve(P, A, q, b, b)
        assert np.allclose(np.asarray(jax_sol.x), native_sol.x, atol=1e-6)

    def test_quadrotor_qp_agreement(self):
        """The flagship QP: both solvers within 1e-5 of each other."""
        from test_lmpc import make_quadrotor_controller
        from libmpc_tpu.lmpc import problem as qp

        c = make_quadrotor_controller()
        dims, prob = c.dims, c._prob
        P, A, lineq, uineq = qp.build_time_invariant(dims, prob)
        q, l, u = qp.build_time_varying(
            dims, prob, lineq, uineq,
            jnp.zeros(12), jnp.zeros(4),
            c._y_ref, c._u_ref, c._du_ref, c._u_meas,
        )
        jax_sol = admm.admm_solve(P, A, q, l, u, TIGHT,
                                  eq_mask=jnp.arange(dims.m) < dims.n_eq)
        native_sol = native_qp.solve(
            np.asarray(P), np.asarray(A), np.asarray(q),
            np.asarray(l), np.asarray(u),
        )
        assert native_sol.status == 1
        assert np.abs(np.asarray(jax_sol.x) - native_sol.x).max() < 1e-5
        # and the native solution reproduces the golden command
        states, inputs, _ = qp.unpack_solution(
            dims, prob, jnp.asarray(native_sol.x), c._u_meas
        )
        golden = np.array([-0.9916, 1.74839, -0.9916, 1.74839])
        assert np.allclose(np.asarray(inputs)[0], golden, atol=1e-4)
