"""Model-parallel (row-sharded) ADMM tests on the virtual CPU mesh.

The 2D-mesh solver must agree with the single-chip kernel on the same
problems; padding rows and mixed data x model layouts are exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libmpc_tpu import LParameters
from libmpc_tpu.ops import admm
from libmpc_tpu.parallel import mesh as mesh_lib
from libmpc_tpu.parallel.qp_sharded import solve_sharded

from test_admm import random_qp, kkt_error

PAR = LParameters(
    maximum_iteration=4000, eps_abs=1e-8, eps_rel=1e-8,
    rho=0.1, adaptive_rho=False, scaling_iters=0, polish=False,
)


class TestShardedQP:
    @pytest.mark.parametrize("data,model", [(4, 2), (2, 4), (1, 8)])
    def test_matches_unsharded(self, data, model):
        rng = np.random.default_rng(0)
        B = 8
        P, A, q, l, u = random_qp(rng, 10, 17, batch=B)  # 17 rows: padding hit
        m = mesh_lib.make_mesh(data=data, model=model)
        sol = solve_sharded(
            jnp.asarray(P), jnp.asarray(A), jnp.asarray(q),
            jnp.asarray(l), jnp.asarray(u), m, PAR,
        )
        ref = admm.admm_solve(
            jnp.asarray(P), jnp.asarray(A), jnp.asarray(q),
            jnp.asarray(l), jnp.asarray(u), PAR,
        )
        assert np.all(np.asarray(sol.status) == 1)
        assert np.allclose(np.asarray(sol.x), np.asarray(ref.x), atol=1e-6)
        for i in range(B):
            err = kkt_error(P, A, q[i], l[i], u[i],
                            np.asarray(sol.x[i]), np.asarray(sol.y[i]))
            assert err < 1e-5

    def test_quadrotor_qp_sharded(self):
        from test_lmpc import make_quadrotor_controller
        from libmpc_tpu.lmpc import problem as qp

        c = make_quadrotor_controller()
        dims, prob = c.dims, c._prob
        P, A, lineq, uineq = qp.build_time_invariant(dims, prob)
        B = 4
        q, l, u = qp.build_time_varying(
            dims, prob, lineq, uineq,
            jnp.zeros((B, 12)), jnp.zeros((B, 4)),
            c._y_ref, c._u_ref, c._du_ref, c._u_meas,
        )
        m = mesh_lib.make_mesh(data=2, model=4)
        sol = solve_sharded(P, A, q, l, u, m, PAR,
                            eq_mask=jnp.arange(dims.m) < dims.n_eq)
        assert np.all(np.asarray(sol.status) == 1)
        states, inputs, _ = qp.unpack_solution(dims, prob, sol.x, c._u_meas)
        golden = np.array([-0.9916, 1.74839, -0.9916, 1.74839])
        for i in range(B):
            assert np.allclose(np.asarray(inputs)[i, 0], golden, atol=1e-4)

    def test_badly_scaled_full_feature_parity(self):
        """The row-sharded path is the SAME kernel as the single-chip one:
        on a badly scaled QP (needing Ruiz + adaptive rho + polish) status
        and solution must match the unsharded solve."""
        rng = np.random.default_rng(5)
        n, m, B = 12, 21, 8
        P, A, q, l, u = random_qp(rng, n, m, batch=B)
        # wreck the scaling: 1e4 dynamic range on rows and columns
        row_s = 10.0 ** rng.uniform(-2, 2, size=(m, 1))
        col_s = 10.0 ** rng.uniform(-2, 2, size=(1, n))
        A = row_s * A * col_s
        P = col_s.T * P * col_s
        l, u = l * row_s[:, 0], u * row_s[:, 0]
        full = LParameters(
            maximum_iteration=4000, eps_abs=1e-8, eps_rel=1e-8,
            rho=0.1, adaptive_rho=True, scaling_iters=10, polish=True,
        )
        mesh = mesh_lib.make_mesh(data=2, model=4)
        args = tuple(map(jnp.asarray, (P, A, q, l, u)))
        sol = solve_sharded(*args, mesh, full)
        ref = admm.admm_solve(*args, full)
        assert np.array_equal(np.asarray(sol.status), np.asarray(ref.status))
        assert np.all(np.asarray(sol.status) == admm.OSQP_SOLVED)
        assert np.allclose(np.asarray(sol.x), np.asarray(ref.x), atol=1e-6)
        for i in range(B):
            err = kkt_error(P, A, q[i], l[i], u[i],
                            np.asarray(sol.x[i]), np.asarray(sol.y[i]))
            assert err < 1e-5, f"instance {i}: {err}"

    def test_infeasibility_certificate_sharded(self):
        """Primal-infeasibility certificates work across row shards."""
        rng = np.random.default_rng(6)
        n, m, B = 6, 10, 4
        P, A, q, _, _ = random_qp(rng, n, m, batch=B)
        # contradictory rows: a x <= -1 and a x >= 1
        A = np.asarray(A)
        A[1] = A[0]
        l = np.full((B, m), -np.inf)
        u = np.full((B, m), np.inf)
        l[:, 0], u[:, 0] = -np.inf, -1.0
        l[:, 1], u[:, 1] = 1.0, np.inf
        full = LParameters(maximum_iteration=4000, eps_abs=1e-8,
                           eps_rel=1e-8, rho=0.1)
        mesh = mesh_lib.make_mesh(data=2, model=4)
        sol = solve_sharded(jnp.asarray(P), jnp.asarray(A), jnp.asarray(q),
                            jnp.asarray(l), jnp.asarray(u), mesh, full)
        assert np.all(np.asarray(sol.status) == admm.OSQP_PRIMAL_INFEASIBLE)

    def test_uneven_batch_raises(self):
        rng = np.random.default_rng(1)
        P, A, q, l, u = random_qp(rng, 6, 9, batch=3)
        m = mesh_lib.make_mesh(data=2, model=2)
        with pytest.raises(ValueError):
            solve_sharded(jnp.asarray(P), jnp.asarray(A), jnp.asarray(q),
                          jnp.asarray(l), jnp.asarray(u), m, PAR)

    def test_primal_only_warm_start(self):
        """warm_x without warm_y defaults the duals to zero (the same
        semantics as ops/admm.py) instead of tripping the shard_map spec
        structure check."""
        rng = np.random.default_rng(0)
        B = 8
        P, A, q, l, u = random_qp(rng, 10, 17, batch=B)
        m = mesh_lib.make_mesh(data=4, model=2)
        args = tuple(map(jnp.asarray, (P, A, q, l, u)))
        cold = solve_sharded(*args, m, PAR)
        assert np.all(np.asarray(cold.status) == 1)
        warm = solve_sharded(*args, m, PAR, warm_x=cold.x)
        assert np.all(np.asarray(warm.status) == 1)
        assert np.allclose(np.asarray(warm.x), np.asarray(cold.x), atol=1e-6)
        # and the fully-warm call still accepts (x, y) like before
        warm2 = solve_sharded(*args, m, PAR, warm_x=cold.x, warm_y=cold.y)
        assert np.all(np.asarray(warm2.status) == 1)
        assert np.all(np.asarray(warm2.iters) <= np.asarray(cold.iters))
