"""LMPC tests.

Parity models: test/LMPC/test_lmpc.cpp (setter contracts across a dimension
sweep), test/LMPC/test_constraints.cpp (QP vector layout + behavioral e2e),
test/LMPC/test_common.cpp (quadrotor golden command, output mapping).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libmpc_tpu import LMPC, HorizonSlice, LParameters, ResultStatus, discretization, inf
from libmpc_tpu.dims import LDims
from libmpc_tpu.lmpc import problem as qp

# dimension sweep mirroring test/LMPC/test_lmpc.cpp:10-16
DIM_SWEEP = [
    (1, 1, 1, 1, 1, 1),
    (5, 1, 1, 1, 1, 1),
    (5, 3, 1, 1, 1, 1),
    (5, 3, 1, 7, 1, 1),
    (5, 3, 3, 7, 7, 5),
    (5, 3, 3, 7, 7, 7),
]


def quadrotor_model():
    """The 12-state quadrotor from examples/quadrotor_ex.cpp:19-45."""
    Ad = np.array([
        [1, 0, 0, 0, 0, 0, 0.1, 0, 0, 0, 0, 0],
        [0, 1, 0, 0, 0, 0, 0, 0.1, 0, 0, 0, 0],
        [0, 0, 1, 0, 0, 0, 0, 0, 0.1, 0, 0, 0],
        [0.0488, 0, 0, 1, 0, 0, 0.0016, 0, 0, 0.0992, 0, 0],
        [0, -0.0488, 0, 0, 1, 0, 0, -0.0016, 0, 0, 0.0992, 0],
        [0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0.0992],
        [0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0],
        [0.9734, 0, 0, 0, 0, 0, 0.0488, 0, 0, 0.9846, 0, 0],
        [0, -0.9734, 0, 0, 0, 0, 0, -0.0488, 0, 0, 0.9846, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0.9846],
    ])
    Bd = np.array([
        [0, -0.0726, 0, 0.0726],
        [-0.0726, 0, 0.0726, 0],
        [-0.0152, 0.0152, -0.0152, 0.0152],
        [0, -0.0006, -0.0000, 0.0006],
        [0.0006, 0, -0.0006, 0],
        [0.0106, 0.0106, 0.0106, 0.0106],
        [0, -1.4512, 0, 1.4512],
        [-1.4512, 0, 1.4512, 0],
        [-0.3049, 0.3049, -0.3049, 0.3049],
        [0, -0.0236, 0, 0.0236],
        [0.0236, 0, -0.0236, 0],
        [0.2107, 0.2107, 0.2107, 0.2107],
    ])
    Cd = np.eye(12)
    return Ad, Bd, Cd


def make_quadrotor_controller():
    """Full setup from examples/quadrotor_ex.cpp / test_common.cpp:93-224."""
    Tnx, Tnu, Tndu, Tny, Tph, Tch = 12, 4, 4, 12, 10, 10
    c = LMPC(Tnx, Tnu, Tndu, Tny, Tph, Tch)
    Ad, Bd, Cd = quadrotor_model()
    assert c.set_state_space_model(Ad, Bd, Cd)
    assert c.set_disturbances(np.zeros((Tnx, Tndu)), np.zeros((Tny, Tndu)))

    out_w = np.array([0, 0, 10, 10, 10, 10, 0, 0, 0, 5, 5, 5], float)
    in_w = np.full(4, 0.1)
    din_w = np.zeros(4)
    assert c.set_objective_weights(out_w, in_w, din_w, HorizonSlice(0, Tph))

    xmin = np.array([-np.pi / 6, -np.pi / 6, -inf, -inf, -inf, -1,
                     -inf, -inf, -inf, -inf, -inf, -inf])
    xmax = np.array([np.pi / 6, np.pi / 6, inf, inf, inf, inf,
                     inf, inf, inf, inf, inf, inf])
    ymin = np.full(12, -inf)
    ymax = np.full(12, inf)
    u0 = 10.5916
    umin = np.full(4, 9.6) - u0
    umax = np.full(4, 13.0) - u0
    assert c.set_state_bounds(xmin, xmax, HorizonSlice(0, Tph))
    assert c.set_output_bounds(ymin, ymax, HorizonSlice(0, Tph))
    assert c.set_input_bounds(umin, umax, HorizonSlice(0, Tch))

    assert c.set_references(np.zeros((Tny, Tph)), np.zeros((Tnu, Tph)), np.zeros((Tnu, Tph)))
    y_ref = np.zeros(12)
    y_ref[2] = 1.0
    assert c.set_references(y_ref, np.zeros(4), np.zeros(4), HorizonSlice(0, Tph))

    c.set_optimizer_parameters(LParameters(maximum_iteration=250))
    return c


class TestGolden:
    def test_quadrotor_first_command(self):
        """THE parity anchor (test/LMPC/test_common.cpp:230-236)."""
        c = make_quadrotor_controller()
        res = c.optimize(np.zeros(12), np.zeros(4))
        expected = np.array([-0.9916, 1.74839, -0.9916, 1.74839])
        assert np.allclose(np.asarray(res.cmd), expected, atol=1e-4), np.asarray(res.cmd)
        assert bool(res.is_feasible)
        assert int(res.status) == int(ResultStatus.SUCCESS)

    def test_quadrotor_batched_matches_single(self):
        c = make_quadrotor_controller()
        rng = np.random.default_rng(0)
        x0s = 0.05 * rng.normal(size=(4, 12))
        u0s = np.zeros((4, 4))
        res_b = c.optimize(x0s, u0s)
        cmds = []
        for i in range(4):
            ci = make_quadrotor_controller()
            cmds.append(np.asarray(ci.optimize(x0s[i], u0s[i]).cmd))
        assert np.allclose(np.asarray(res_b.cmd), np.stack(cmds), atol=1e-6)

    def test_quadrotor_closed_loop_regulates(self):
        """Closed-loop behavior: altitude reference z=1 is reached."""
        c = make_quadrotor_controller()
        Ad, Bd, _ = quadrotor_model()
        x = np.zeros(12)
        u = np.zeros(4)
        for _ in range(60):
            res = c.optimize(x, u)
            u = np.asarray(res.cmd)
            x = Ad @ x + Bd @ u
        assert abs(x[2] - 1.0) < 5e-2


class TestQPLayout:
    """Vector layout of the generated QP (test/LMPC/test_constraints.cpp:169-295)."""

    def _build(self, dims, prob, x0, u0):
        P, A, lineq, uineq = qp.build_time_invariant(dims, prob)
        ph = dims.ph
        zeros = lambda f: jnp.zeros((ph, f))
        q, l, u = qp.build_time_varying(
            dims, prob, lineq, uineq,
            jnp.asarray(x0), jnp.asarray(u0),
            zeros(dims.ny), zeros(dims.nu), zeros(dims.nu), zeros(dims.ndu),
        )
        return np.asarray(P), np.asarray(A), np.asarray(q), np.asarray(l), np.asarray(u)

    def test_default_constraints(self):
        # (parity: test/LMPC/test_constraints.cpp:169-204)
        nx, nu, ndu, ny, ph, ch = 3, 5, 6, 4, 5, 5
        dims = LDims(nx, nu, ndu, ny, ph, ch)
        prob = qp.init_problem(dims)
        x0 = np.ones(nx)
        u0 = -np.ones(nu)
        _, _, _, l, u = self._build(dims, prob, x0, u0)
        # equality RHS: [-x0; -u0; zeros]
        assert np.all(l[:nx] == -1)
        assert np.all(l[nx : nx + nu] == 1)
        assert np.all(l[nx + nu : (ph + 1) * (nx + nu)] == 0)
        assert np.all(l[: (ph + 1) * (nx + nu)] == u[: (ph + 1) * (nx + nu)])
        # default inequality rows are +-inf
        n_eq = (ph + 1) * (nx + nu)
        assert np.all(l[n_eq:] == -inf)
        assert np.all(u[n_eq:] == inf)

    def test_bound_segments(self):
        # (parity: test/LMPC/test_constraints.cpp:206-295)
        nx, nu, ndu, ny, ph, ch = 2, 4, 0, 3, 3, 3
        dims = LDims(nx, nu, ndu, ny, ph, ch)
        prob = qp.init_problem(dims)

        prob = prob.__class__(**{
            **{f.name: getattr(prob, f.name) for f in __import__("dataclasses").fields(prob)},
            "min_x": jnp.full((ph + 1, nx), -1.0),
            "max_x": jnp.full((ph + 1, nx), 1.0),
            "min_y": jnp.full((ph + 1, ny), -2.0),
            "max_y": jnp.full((ph + 1, ny), 2.0),
            "min_u": jnp.full((ph, nu), -3.0),
            "max_u": jnp.full((ph, nu), 3.0),
            "s_min": jnp.full((ph + 1,), -4.0),
            "s_max": jnp.full((ph + 1,), 4.0),
            "s_mult": jnp.concatenate([jnp.full(nx, 42.0), jnp.full(nu, -42.0)]),
        })
        x0 = np.full(nx, 42.0)
        u0 = np.full(nu, -42.0)
        _, _, _, l, u = self._build(dims, prob, x0, u0)

        n_eq = (ph + 1) * (nx + nu)
        # box segment: [-1,-1,-3,-3,-3,-3] per step
        box_l = l[n_eq : n_eq + (ph + 1) * (nx + nu)].reshape(ph + 1, nx + nu)
        assert np.all(box_l[:, :nx] == -1)
        assert np.all(box_l[:, nx:] == -3)
        box_u = u[n_eq : n_eq + (ph + 1) * (nx + nu)].reshape(ph + 1, nx + nu)
        assert np.all(box_u[:, :nx] == 1)
        assert np.all(box_u[:, nx:] == 3)
        # output segment
        o0 = n_eq + (ph + 1) * (nx + nu)
        assert np.all(l[o0 : o0 + (ph + 1) * ny] == -2)
        assert np.all(u[o0 : o0 + (ph + 1) * ny] == 2)
        # du rows free when ch >= ph
        d0 = o0 + (ph + 1) * ny
        assert np.all(l[d0 : d0 + ph * nu] == -inf)
        assert np.all(u[d0 : d0 + ph * nu] == inf)
        # scalar rows
        assert np.all(l[-(ph + 1) :] == -4)
        assert np.all(u[-(ph + 1) :] == 4)

    def test_du_rows_pinned_beyond_control_horizon(self):
        # du forced to 0 for steps i > ch (ProblemBuilder.hpp:782-793)
        nx, nu, ndu, ny, ph, ch = 2, 1, 0, 2, 6, 2
        dims = LDims(nx, nu, ndu, ny, ph, ch)
        prob = qp.init_problem(dims)
        _, _, _, l, u = self._build(dims, prob, np.zeros(nx), np.zeros(nu))
        d0 = dims.n_eq + dims.n_box + dims.n_out
        du_l = l[d0 : d0 + ph * nu].reshape(ph, nu)
        du_u = u[d0 : d0 + ph * nu].reshape(ph, nu)
        for i in range(ph):
            if i > ch:
                assert np.all(du_l[i] == 0) and np.all(du_u[i] == 0)
            else:
                assert np.all(du_l[i] == -inf) and np.all(du_u[i] == inf)

    def test_equality_rows_encode_dynamics(self):
        # A random z satisfying x_{k+1} = ssA x_k + ssB du_k must give
        # A_eq z == rhs rows exactly
        nx, nu, ndu, ny, ph, ch = 3, 2, 0, 3, 4, 4
        dims = LDims(nx, nu, ndu, ny, ph, ch)
        rng = np.random.default_rng(0)
        A = rng.normal(size=(nx, nx)) * 0.5
        B = rng.normal(size=(nx, nu))
        C = np.eye(ny, nx)
        prob = qp.init_problem(dims)
        ssA, ssB, ssC = qp.make_augmented_model(A, B, C)
        import dataclasses
        prob = dataclasses.replace(prob, ssA=ssA, ssB=ssB, ssC=ssC)
        Pm, Am, q, l, u = self._build(dims, prob, np.zeros(nx), np.zeros(nu))

        x0 = rng.normal(size=nx)
        u_prev = rng.normal(size=nu)
        dus = rng.normal(size=(ph, nu))
        xa = np.concatenate([x0, u_prev])
        xs = [xa]
        for k in range(ph):
            xs.append(np.asarray(ssA) @ xs[-1] + np.asarray(ssB) @ dus[k])
        z = np.concatenate([np.concatenate(xs), dus.reshape(-1)])
        eq_rows = Am[: dims.n_eq] @ z
        expected = np.zeros(dims.n_eq)
        expected[: nx + nu] = -xa
        assert np.allclose(eq_rows, expected, atol=1e-10)


class TestOutputMapping:
    def test_map_to_output(self):
        # (parity: test/LMPC/test_common.cpp:239-280)
        nx, nu, ndu, ny, ph, ch = 3, 1, 7, 6, 1, 1
        dims = LDims(nx, nu, ndu, ny, ph, ch)
        rng = np.random.default_rng(3)
        Cd = rng.normal(size=(ny, nx))
        Ddv = rng.normal(size=(ny, ndu))
        prob = qp.init_problem(dims)
        ssA, ssB, ssC = qp.make_augmented_model(np.zeros((nx, nx)), np.zeros((nx, nu)), Cd)
        ssBv, ssDv = qp.make_disturbance_model(np.zeros((nx, ndu)), Ddv, nu)
        import dataclasses
        prob = dataclasses.replace(prob, ssA=ssA, ssB=ssB, ssC=ssC, ssBv=ssBv, ssDv=ssDv)
        x = rng.normal(size=nx)
        du = rng.normal(size=ndu)
        y = qp.map_to_output(prob, ny, nx, jnp.asarray(x), jnp.asarray(du))
        assert np.allclose(np.asarray(y), Cd @ x + Ddv @ du)


@pytest.mark.parametrize("nx,nu,ndu,ny,ph,ch", DIM_SWEEP)
class TestInterface:
    """Setter contracts across the dimension sweep (test/LMPC/test_lmpc.cpp)."""

    def test_setters(self, nx, nu, ndu, ny, ph, ch):
        c = LMPC(nx, nu, ndu, ny, ph, ch)
        rng = np.random.default_rng(0)
        assert c.set_state_space_model(
            rng.normal(size=(nx, nx)), rng.normal(size=(nx, nu)), rng.normal(size=(ny, nx))
        )
        assert c.set_disturbances(np.zeros((nx, ndu)), np.zeros((ny, ndu)))
        # matrix forms
        assert c.set_objective_weights(
            np.ones((ny, ph)), np.ones((nu, ph)), np.ones((nu, ph))
        )
        assert c.set_state_bounds(np.full((nx, ph), -1.0), np.full((nx, ph), 1.0))
        assert c.set_input_bounds(np.full((nu, ch), -1.0), np.full((nu, ch), 1.0))
        assert c.set_output_bounds(np.full((ny, ph), -1.0), np.full((ny, ph), 1.0))
        # vector + full-horizon slice
        assert c.set_state_bounds(np.full(nx, -2.0), np.full(nx, 2.0), HorizonSlice(0, ph))
        assert c.set_input_bounds(np.full(nu, -2.0), np.full(nu, 2.0), HorizonSlice(0, ch))
        assert c.set_output_bounds(np.full(ny, -2.0), np.full(ny, 2.0), HorizonSlice(0, ph))
        # vector + unset slice
        assert c.set_state_bounds(np.full(nx, -2.0), np.full(nx, 2.0), HorizonSlice.all())
        # sub-slice
        assert c.set_state_bounds(np.full(nx, -2.0), np.full(nx, 2.0), HorizonSlice(0, 1))
        assert c.set_input_bounds(np.full(nu, -2.0), np.full(nu, 2.0), HorizonSlice(0, 1))
        assert c.set_output_bounds(np.full(ny, -2.0), np.full(ny, 2.0), HorizonSlice(0, 1))
        # invalid slice fails
        assert not c.set_state_bounds(
            np.full(nx, -2.0), np.full(nx, 2.0), HorizonSlice(0, ph + 1)
        )
        # scalar constraint
        assert c.set_scalar_constraint(-inf, inf, np.ones(nx), np.ones(nu), HorizonSlice.all())
        assert c.set_scalar_constraint(-inf, inf, np.ones(nx), np.ones(nu), index=0)
        # references / exogenous
        assert c.set_references(np.zeros((ny, ph)), np.zeros((nu, ph)), np.zeros((nu, ph)))
        assert c.set_references(np.zeros(ny), np.zeros(nu), np.zeros(nu), HorizonSlice(0, ph))
        assert c.set_exogenous_inputs(np.zeros((ndu, ph)))
        assert c.set_exogenous_inputs(np.zeros(ndu), HorizonSlice(0, ch))

    def test_unavailable_setters_throw(self, nx, nu, ndu, ny, ph, ch):
        c = LMPC(nx, nu, ndu, ny, ph, ch)
        with pytest.raises(RuntimeError):
            c.set_discretization_sampling_time(0.1)
        with pytest.raises(RuntimeError):
            c.set_input_scale(np.ones(nu))
        with pytest.raises(RuntimeError):
            c.set_state_scale(np.ones(nx))


class TestBehavioral:
    def test_terminal_constraint_drives_state_to_zero(self):
        # (parity: test/LMPC/test_constraints.cpp:9-93)
        Tnx, Tnu, Tndu, Tny, Tph, Tch = 2, 1, 1, 2, 15, 15
        c = LMPC(Tnx, Tnu, Tndu, Tny, Tph, Tch)
        A = np.array([[0.0, 1.0], [0.0, 2.0]])
        B = np.array([[0.0], [1.0]])
        Ad, Bd = map(np.asarray, discretization(A, B, 0.01))
        assert c.set_state_space_model(Ad, Bd, np.eye(2))
        assert c.set_objective_weights(
            np.zeros((2, Tph)), np.zeros((1, Tph)), np.zeros((1, Tph))
        )
        xmin = np.full((2, Tph), -inf)
        xmax = np.full((2, Tph), inf)
        xmin[:, -1] = 0.0
        xmax[:, -1] = 0.0
        assert c.set_state_bounds(xmin, xmax)
        c.set_optimizer_parameters(LParameters(maximum_iteration=4000))
        res = c.optimize(np.array([2.0, 0.0]), np.zeros(1))
        seq = c.get_optimal_sequence()
        assert bool(res.is_feasible)
        # terminal state reaches 0 (the bound applies from the terminal row)
        assert np.allclose(np.asarray(seq.state)[-1], 0.0, atol=1e-4)

    def test_scalar_constraint_respected(self):
        # (parity: test/LMPC/test_constraints.cpp:95-167)
        Tnx, Tnu, Tndu, Tny, Tph, Tch = 2, 1, 0, 2, 5, 5
        c = LMPC(Tnx, Tnu, Tndu, Tny, Tph, Tch)
        A = np.array([[0.0, 1.0], [0.0, 2.0]])
        B = np.array([[0.0], [1.0]])
        Ad, Bd = map(np.asarray, discretization(A, B, 0.001))
        assert c.set_state_space_model(Ad, Bd, np.eye(2))
        assert c.set_objective_weights(
            np.array([1.0, 0.0]), np.array([0.1]), np.array([0.0]), HorizonSlice.all()
        )
        assert c.set_scalar_constraint(-0.5, 0.1, np.ones(2), np.ones(1), HorizonSlice.all())
        assert c.set_references(np.zeros((2, Tph)), np.zeros((1, Tph)), np.zeros((1, Tph)))
        c.set_optimizer_parameters(LParameters(maximum_iteration=4000))
        c.optimize(np.array([10.0, 0.0]), np.zeros(1))
        seq = c.get_optimal_sequence()
        state = np.asarray(seq.state)
        inp = np.asarray(seq.input)
        # the QP row is X.x_i + U.u_{i-1} (x_u(i) = u(i-1)); row 0 is excluded:
        # the scalar bound also binds the *initial* state row, which with
        # x0 = (10, 0) is unsatisfiable (the reference formulation shares this
        # initial-row conflict; its test tolerances happen to mask it)
        u_prev = np.vstack([np.zeros((1, 1)), inp[:-1]])
        s_true = state.sum(axis=1) + u_prev.sum(axis=1)
        assert np.all(s_true[1:] <= 0.1 + 1e-3)
        assert np.all(s_true[1:] >= -0.5 - 1e-3)
        # the reference test's (shifted) quantity stays within its loose band
        # up to the step-to-step du (test/LMPC/test_constraints.cpp:161-166)
        s_ref = state.sum(axis=1) + inp.sum(axis=1)
        assert np.all(s_ref[1:] <= 0.1 + 1.5e-2)
        assert np.all(s_ref[1:] >= -0.5 - 1e-3)


class TestWarmStartAPI:
    def test_roundtrip(self):
        c = make_quadrotor_controller()
        c.set_optimizer_parameters(
            LParameters(maximum_iteration=250, enable_warm_start=True)
        )
        c.optimize(np.zeros(12), np.zeros(4))
        wp = c.get_solver_warm_start_primal()
        wd = c.get_solver_warm_start_dual()
        assert wp.size > 0 and wd.size > 0
        c2 = make_quadrotor_controller()
        c2.set_optimizer_parameters(
            LParameters(maximum_iteration=250, enable_warm_start=True)
        )
        c2.set_solver_warm_start(wp, wd)
        res = c2.optimize(np.zeros(12), np.zeros(4))
        expected = np.array([-0.9916, 1.74839, -0.9916, 1.74839])
        assert np.allclose(np.asarray(res.cmd), expected, atol=1e-4)


class TestSliceValidation:
    def test_truth_table(self):
        # (parity: test/NLMPC/test_common.cpp:108-169, LMPC side)
        for (nx, nu, ph, ch) in [(1, 1, 1, 1), (5, 3, 7, 4), (5, 3, 7, 7)]:
            c = LMPC(nx, nu, 1, nx, ph, ch)
            s = HorizonSlice.all()
            assert c.is_slice_unset(s)
            assert not c.is_prediction_horizon_slice_valid(s)
            assert not c.is_control_horizon_slice_valid(s)
            assert c.is_prediction_horizon_slice_valid(HorizonSlice(0, ph))
            assert c.is_control_horizon_slice_valid(HorizonSlice(0, ch))
            assert not c.is_prediction_horizon_slice_valid(HorizonSlice(0, ph + 1))
            assert not c.is_control_horizon_slice_valid(HorizonSlice(0, ch + 1))


class TestInfeasibleHandling:
    def test_primal_infeasible_reports_nan_cmd(self):
        """Contradictory state bounds: INFEASIBLE status and NaN command,
        matching OSQP v0.6.3's NaN solution store that the reference
        forwards verbatim (LOptimizer.hpp:292-347)."""
        c = LMPC(2, 1, 0, 2, 4, 4)
        c.set_state_space_model(np.eye(2), np.array([[1.0], [1.0]]), np.eye(2))
        c.set_objective_weights(np.ones(2), np.ones(1), np.ones(1), HorizonSlice.all())
        # require x in [5, 6] from step 1 onward while dynamics from x0=0
        # with |u| <= 0.01 cannot reach it
        assert c.set_state_bounds(np.full(2, 5.0), np.full(2, 6.0), HorizonSlice.all())
        assert c.set_input_bounds(np.full(1, -0.01), np.full(1, 0.01), HorizonSlice.all())
        c.set_optimizer_parameters(LParameters(maximum_iteration=4000))
        res = c.optimize(np.zeros(2), np.zeros(1))
        assert int(res.status) == int(ResultStatus.INFEASIBLE)
        assert not bool(res.is_feasible)
        assert np.all(np.isnan(np.asarray(res.cmd)))
        assert np.isinf(float(res.cost))

    def test_batched_mixed_feasibility(self):
        """A batch mixing feasible and infeasible instances: each gets its
        own verdict."""
        c = LMPC(2, 1, 0, 2, 4, 4)
        c.set_state_space_model(np.eye(2), np.array([[1.0], [1.0]]), np.eye(2))
        c.set_objective_weights(np.ones(2), np.ones(1), np.ones(1), HorizonSlice.all())
        # bounds near the initial state: instance at origin is feasible,
        # instance far outside [-1, 1] cannot enter with |u| <= 0.01
        assert c.set_state_bounds(np.full(2, -1.0), np.full(2, 1.0), HorizonSlice.all())
        assert c.set_input_bounds(np.full(1, -0.01), np.full(1, 0.01), HorizonSlice.all())
        c.set_optimizer_parameters(LParameters(maximum_iteration=4000))
        x0 = np.array([[0.0, 0.0], [30.0, 30.0]])
        res = c.optimize(x0, np.zeros((2, 1)))
        sts = np.asarray(res.status)
        assert sts[0] == int(ResultStatus.SUCCESS)
        assert sts[1] == int(ResultStatus.INFEASIBLE)
        assert np.all(np.isfinite(np.asarray(res.cmd[0])))
        assert np.all(np.isnan(np.asarray(res.cmd[1])))


class TestPerInstanceBounds:
    def test_batched_bounds_match_per_instance_setters(self):
        """Per-instance input caps via set_instance_bounds reproduce separate
        controllers configured with the same caps."""
        B = 3
        caps = np.array([0.5, 1.0, 2.0])
        ph = 10
        c = make_quadrotor_controller()
        u0hover = 10.5916
        umin_b = np.tile(np.full((1, ph, 4), 9.6 - u0hover), (B, 1, 1))
        umax_b = np.stack([np.full((ph, 4), cap) for cap in caps])
        c.set_instance_bounds(input=(umin_b, umax_b))
        res_b = c.optimize(np.zeros((B, 12)), np.zeros((B, 4)))
        for i, cap in enumerate(caps):
            ci = make_quadrotor_controller()
            ci.set_input_bounds(
                np.full(4, 9.6 - u0hover), np.full(4, cap), HorizonSlice(0, ph)
            )
            ri = ci.optimize(np.zeros(12), np.zeros(4))
            assert np.allclose(
                np.asarray(res_b.cmd[i]), np.asarray(ri.cmd), atol=1e-6
            ), (i, cap)
        # tighter caps actually bind
        assert np.asarray(res_b.cmd[0]).max() <= 0.5 + 1e-7

    def test_fleet_with_batched_bounds(self):
        import jax as _jax

        from libmpc_tpu.parallel import mesh as mesh_lib
        from libmpc_tpu.parallel.fleet import LMPCFleet

        B = 8
        ph = 10
        u0hover = 10.5916
        caps = np.linspace(0.5, 2.0, B)
        c = make_quadrotor_controller()
        umin_b = np.tile(np.full((1, ph, 4), 9.6 - u0hover), (B, 1, 1))
        umax_b = np.stack([np.full((ph, 4), cap) for cap in caps])
        c.set_instance_bounds(input=(umin_b, umax_b))

        fleet = LMPCFleet(c, mesh_lib.make_mesh(data=8))
        res_f, stats = fleet.optimize(np.zeros((B, 12)), np.zeros((B, 4)))
        res_p = c.optimize(np.zeros((B, 12)), np.zeros((B, 4)))
        assert np.allclose(np.asarray(res_f.cmd), np.asarray(res_p.cmd), atol=1e-8)
        assert int(stats.n_success) == B


class TestSetConstraintsPerIndex:
    def test_combined_per_index_setter(self):
        """setConstraints(index, ...) combined box setter
        (reference: include/mpc/LMPC.hpp:328-340)."""
        c = LMPC(2, 1, 0, 2, 5, 5)
        assert c.set_constraints(
            2,
            np.full(2, -1.0), np.full(1, -2.0), np.full(2, -3.0),
            np.full(2, 1.0), np.full(1, 2.0), np.full(2, 3.0),
        )
        # out-of-range index refused
        assert not c.set_constraints(
            5,
            np.full(2, -1.0), np.full(1, -2.0), np.full(2, -3.0),
            np.full(2, 1.0), np.full(1, 2.0), np.full(2, 3.0),
        )
        prob = c._prob
        assert np.allclose(np.asarray(prob.min_x)[3], -1.0)
        assert np.allclose(np.asarray(prob.max_x)[3], 1.0)
        assert np.allclose(np.asarray(prob.min_u)[2], -2.0)
        assert np.allclose(np.asarray(prob.max_u)[2], 2.0)
        assert np.allclose(np.asarray(prob.min_y)[3], -3.0)
        assert np.allclose(np.asarray(prob.max_y)[3], 3.0)
        # other steps untouched
        assert np.isinf(np.asarray(prob.min_x)[1]).all()


class TestLazyStatsMode:
    """LMPC set_stats_mode("lazy"): deferred status readback must record the
    same stats counts as the default sync mode."""

    def test_counts_and_statuses_match_sync(self):
        def run(mode):
            c = make_quadrotor_controller()
            c.set_stats_mode(mode)
            x = np.zeros(12)
            u = np.zeros(4)
            for _ in range(3):
                res = c.optimize(x, u)
                u = np.asarray(res.cmd)
            return c.get_execution_stats()

        lazy = run("lazy")
        sync = run("sync")
        assert lazy.number_of_solutions == sync.number_of_solutions == 3
        assert sum(lazy.solutions_states.values()) == 3
        assert lazy.solutions_states == sync.solutions_states
