"""Closed-loop example-configuration tests (parity: the reference CI builds
and runs all four examples, .gitlab-ci.yml:5-33).  The quadrotor and VdP
configs are covered in test_lmpc/test_nlmpc; here: UGV obstacle avoidance
with runtime parameters, and the networked-oscillators config (reduced
horizon to keep CI time sane)."""

import jax.numpy as jnp
import numpy as np
import pytest

from libmpc_tpu import NLMPC, NLParameters, discretization


class TestUGV:
    def make_controller(self, ph=6):
        n_obs = 2
        Tineq = (ph + 1) * n_obs
        c = NLMPC(4, 2, 4, ph, ph, Tineq, 0)
        A = np.zeros((4, 4))
        A[0:2, 2:4] = np.eye(2)
        B = np.zeros((4, 2))
        B[2:4, 0:2] = np.eye(2)
        Ad, Bd = map(np.asarray, discretization(A, B, 0.1))
        Ad_j, Bd_j = jnp.asarray(Ad), jnp.asarray(Bd)
        c.set_state_space_function(lambda x, u, k: Ad_j @ x + Bd_j @ u)
        c.set_output_function(lambda x, u, k: x)

        obstacles = jnp.asarray([[2.0, 1.0], [1.0, 1.0]])
        radii = jnp.asarray([0.3, 0.3])

        def objective(X, Y, U, e, p):
            v_err = X[:, 2:4] - p["v_pref"][None, :]
            return 1e3 * jnp.sum(v_err**2) + 1e-2 * jnp.sum(U**2) + 1e-5 * e * e

        def ineq(X, Y, U, e):
            pos = X[:, 0:2]
            d = jnp.sqrt(jnp.sum((pos[:, None, :] - obstacles[None]) ** 2, -1))
            return (radii[None, :] - d).reshape(-1)

        c.set_objective_function(objective)
        c.set_ineq_con_function(ineq)
        c.set_runtime_params({"v_pref": jnp.zeros(2)})
        c.set_optimizer_parameters(
            NLParameters(maximum_iteration=60, hard_constraints=False,
                         enable_warm_start=True)
        )
        return c, Ad, Bd, np.asarray(obstacles), np.asarray(radii)

    def test_reaches_goal_avoiding_obstacles(self):
        # (parity: examples/ugv_ex.cpp:143-166 closed loop)
        c, Ad, Bd, obstacles, radii = self.make_controller()
        yref = np.array([2.0, 2.0])
        x = np.zeros(4)
        cmd = np.zeros(2)
        traj = [x[:2].copy()]
        for _ in range(120):
            v = yref - x[:2]
            v = v / max(np.linalg.norm(v), 1e-9)
            c.set_runtime_params({"v_pref": jnp.asarray(v)})
            res = c.optimize(x, cmd)
            cmd = np.asarray(res.cmd)
            x = Ad @ x + Bd @ cmd
            traj.append(x[:2].copy())
            if np.linalg.norm(x[:2] - yref) < 0.05:
                break
        traj = np.array(traj)
        assert np.linalg.norm(x[:2] - yref) < 0.05, f"goal not reached: {x[:2]}"
        # trajectory clear of both obstacles (small soft-constraint margin)
        for o, r in zip(obstacles, radii):
            dmin = np.linalg.norm(traj - o, axis=1).min()
            assert dmin > r - 0.05, (o, dmin)

    def test_runtime_params_no_retrace(self):
        c, Ad, Bd, _, _ = self.make_controller()
        c.set_runtime_params({"v_pref": jnp.asarray([1.0, 0.0])})
        c.optimize(np.zeros(4), np.zeros(2))
        fn_before = c._solve_fn
        c.set_runtime_params({"v_pref": jnp.asarray([0.0, 1.0])})
        c.optimize(np.zeros(4), np.zeros(2))
        # same compiled closure reused — value changes don't invalidate
        assert c._solve_fn is fn_before

    def test_runtime_params_change_affects_solution(self):
        c, Ad, Bd, _, _ = self.make_controller()
        c.set_runtime_params({"v_pref": jnp.asarray([1.0, 0.0])})
        r1 = c.optimize(np.zeros(4), np.zeros(2))
        c2, *_ = self.make_controller()
        c2.set_runtime_params({"v_pref": jnp.asarray([0.0, 1.0])})
        r2 = c2.optimize(np.zeros(4), np.zeros(2))
        # accelerating toward +x vs +y gives different commands
        assert not np.allclose(np.asarray(r1.cmd), np.asarray(r2.cmd), atol=1e-3)


class TestNetworkedOscillators:
    def test_input_cap_and_progress(self):
        # (parity: examples/networked_oscillators_ex.cpp, shrunk horizon)
        N = 3
        nx, nu = 2 * N, N
        ph, ch = 8, 4
        mu, k, ts = 1.0, 0.1, 0.1

        def dyn(x, u, step):
            pos = x[0::2]
            vel = x[1::2]
            coupling = k * (jnp.sum(pos) - N * pos)
            dvel = mu * (1.0 - pos**2) * vel - pos + u + coupling
            dx = jnp.zeros_like(x)
            dx = dx.at[0::2].set(vel)
            return dx.at[1::2].set(dvel)

        c = NLMPC(nx, nu, nx, ph, ch, (ph + 1) * nu, 0)
        c.set_discretization_sampling_time(ts)
        c.set_state_space_function(dyn)
        c.set_objective_function(lambda X, Y, U, e: jnp.sum(X**2) + jnp.sum(U**2))
        c.set_ineq_con_function(lambda X, Y, U, e: (U - 0.5).reshape(-1))
        c.set_optimizer_parameters(NLParameters(maximum_iteration=60))

        x = np.zeros(nx)
        x[0] = 1.0
        cmd = np.zeros(nu)
        e0 = np.sum(x**2)
        for _ in range(10):
            res = c.optimize(x, cmd)
            cmd = np.asarray(res.cmd)
            assert cmd.max() <= 0.5 + 1e-6
            x = x + np.asarray(dyn(jnp.asarray(x), jnp.asarray(cmd), 0)) * ts
        assert np.sum(x**2) < e0  # energy decreased under control


class TestPerInstanceRuntimeParams:
    def test_batched_obstacle_sets(self):
        """Each fleet instance avoids its own obstacle (batched runtime
        params), covering BASELINE's 'randomized obstacle sets' scenario."""
        import jax

        ph = 6
        c = NLMPC(4, 2, 4, ph, ph, ph + 1, 0)
        A = np.zeros((4, 4))
        A[0:2, 2:4] = np.eye(2)
        B = np.zeros((4, 2))
        B[2:4, 0:2] = np.eye(2)
        Ad, Bd = map(np.asarray, discretization(A, B, 0.1))
        Ad_j, Bd_j = jnp.asarray(Ad), jnp.asarray(Bd)
        c.set_state_space_function(lambda x, u, k: Ad_j @ x + Bd_j @ u)

        def objective(X, Y, U, e, p):
            v_err = X[:, 2:4] - jnp.array([1.0, 0.0])[None, :]
            return 1e3 * jnp.sum(v_err**2) + 1e-2 * jnp.sum(U**2) + 1e-5 * e * e

        def ineq(X, Y, U, e, p):
            pos = X[:, 0:2]
            d = jnp.sqrt(jnp.sum((pos - p["obstacle"][None, :]) ** 2, -1))
            return 0.3 - d

        c.set_objective_function(objective)
        c.set_ineq_con_function(ineq)
        c.set_optimizer_parameters(
            NLParameters(maximum_iteration=50, hard_constraints=False)
        )
        Bn = 3
        obstacles = jnp.asarray([[0.6, 0.05], [0.6, -0.05], [10.0, 10.0]])
        c.set_runtime_params({"obstacle": obstacles}, batched=True)
        res = c.optimize(np.zeros((Bn, 4)), np.zeros((Bn, 2)))
        seqs = c.get_optimal_sequence()
        X = np.asarray(seqs.state)
        # instances with a near obstacle plan around it; the far-obstacle
        # instance drives straight: its planned y-deviation is the smallest
        dev = np.abs(X[:, :, 1]).max(axis=1)
        assert dev[2] <= dev[0] + 1e-9 and dev[2] <= dev[1] + 1e-9
        # every plan respects its own obstacle (soft margin)
        for i in range(Bn):
            d = np.linalg.norm(X[i, :, 0:2] - np.asarray(obstacles[i]), axis=1)
            assert d.min() > 0.3 - 0.06, (i, d.min())
