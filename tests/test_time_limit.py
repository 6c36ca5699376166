"""time_limit enforcement tests.

The reference forwards ``Parameters::time_limit`` to its solvers (OSQP
``settings->time_limit``, LOptimizer.hpp:256; nlopt ``set_maxtime``,
NLMPC.hpp:142-144) and maps the resulting statuses
(LOptimizer.hpp:406 -> UNKNOWN, NLOptimizer.hpp:744-746 -> MAX_ITERATION).
Here the contract is honored with a measured-cost iteration budget; these
tests drive both the solver-level traced budget and the controller-level
calibration path.
"""

import jax.numpy as jnp
import numpy as np

from libmpc_tpu import LParameters, NLParameters, ResultStatus
from libmpc_tpu.ops import admm, sqp

from test_lmpc import make_quadrotor_controller
from test_nlmpc import make_vdp_controller


class TestSolverBudget:
    def test_admm_budget_stops_with_time_limit_status(self):
        rng = np.random.default_rng(0)
        n, m = 12, 18
        L = rng.normal(size=(n, n))
        P = L @ L.T + 0.05 * np.eye(n)
        A = rng.normal(size=(m, n))
        q = rng.normal(size=n)
        x_hat = rng.normal(size=n)
        z = A @ x_hat
        l, u = z - 0.01, z + 0.01
        params = LParameters(maximum_iteration=4000, eps_abs=1e-9, eps_rel=1e-9,
                             check_termination=5, polish=False)
        full = admm.admm_solve(*map(jnp.asarray, (P, A, q, l, u)), params)
        assert int(full.iters) > 10  # needs real work
        capped = admm.admm_solve(*map(jnp.asarray, (P, A, q, l, u)), params,
                                 iter_budget=jnp.asarray(10, jnp.int32))
        assert int(capped.status) == admm.OSQP_TIME_LIMIT_REACHED
        assert int(capped.iters) <= 10
        # partial-but-valid iterate
        assert np.all(np.isfinite(np.asarray(capped.x)))

    def test_admm_generous_budget_is_no_op(self):
        rng = np.random.default_rng(1)
        n, m = 8, 12
        L = rng.normal(size=(n, n))
        P = L @ L.T + 0.1 * np.eye(n)
        A = rng.normal(size=(m, n))
        q = rng.normal(size=n)
        z = A @ rng.normal(size=n)
        l, u = z - 0.5, z + 0.5
        params = LParameters(maximum_iteration=4000, eps_abs=1e-8, eps_rel=1e-8)
        free = admm.admm_solve(*map(jnp.asarray, (P, A, q, l, u)), params)
        capped = admm.admm_solve(*map(jnp.asarray, (P, A, q, l, u)), params,
                                 iter_budget=jnp.asarray(10**6, jnp.int32))
        assert int(capped.status) == int(free.status) == admm.OSQP_SOLVED
        assert np.allclose(np.asarray(capped.x), np.asarray(free.x))

    def test_sqp_budget_yields_maxtime_status(self):
        # unconstrained-ish Rosenbrock needs many SQP iterations
        def f(z):
            return 100.0 * (z[1] - z[0] ** 2) ** 2 + (1.0 - z[0]) ** 2

        ceq = lambda z: jnp.zeros((0,))
        z0 = jnp.asarray([-1.2, 1.0])
        lb = jnp.asarray([-10.0, -10.0])
        ub = jnp.asarray([10.0, 10.0])
        params = NLParameters(maximum_iteration=200)
        full = sqp.sqp_solve(f, ceq, None, z0, lb, ub, params)
        assert int(full.iters) > 3
        capped = sqp.sqp_solve(f, ceq, None, z0, lb, ub, params,
                               iter_budget=jnp.asarray(2, jnp.int32))
        assert int(capped.status) == sqp.NLOPT_MAXTIME_REACHED
        assert int(capped.iters) == 2
        assert np.all(np.isfinite(np.asarray(capped.z)))


class TestControllerTimeLimit:
    def test_lmpc_time_limit_enforced_after_calibration(self):
        c = make_quadrotor_controller()
        # converge slowly so the budget genuinely bites
        c.set_optimizer_parameters(LParameters(
            maximum_iteration=4000, eps_abs=1e-9, eps_rel=1e-9,
            check_termination=5, polish=False, adaptive_rho=False,
            time_limit=1.0,
        ))
        x0 = 0.1 * np.ones(12)
        u0 = np.zeros(4)
        r1 = c.optimize(x0, u0)  # compile (never recorded)
        r2 = c.optimize(x0, u0)  # calibration measurement
        assert c._budgeter.seconds_per_iteration is not None
        # force a micro-deadline through the calibrated path
        c._params = LParameters(
            maximum_iteration=4000, eps_abs=1e-9, eps_rel=1e-9,
            check_termination=5, polish=False, adaptive_rho=False,
            time_limit=c._budgeter.seconds_per_iteration * 6,
        )
        # fresh start (no warm state) so the solve genuinely needs many iters
        c._warm_x = c._warm_y = None
        r3 = c.optimize(np.linspace(-0.2, 0.2, 12), u0)
        assert int(np.asarray(r3.solver_status)) == admm.OSQP_TIME_LIMIT_REACHED
        assert int(np.asarray(r3.status)) == int(ResultStatus.UNKNOWN)
        assert np.all(np.isfinite(np.asarray(r3.cmd)))
        assert int(np.asarray(c._last_iters)) <= 10  # 6 rounds to ck=5 grid

    def test_nlmpc_time_limit_enforced_after_calibration(self):
        c = make_vdp_controller()
        p = NLParameters(maximum_iteration=200, time_limit=1.0)
        c.set_optimizer_parameters(p)
        x0 = np.array([0.5, -0.4])
        u0 = np.zeros(1)
        c.optimize(x0, u0)  # compile
        c.optimize(np.array([0.3, 0.2]), u0)  # calibrate
        assert c._budgeter.seconds_per_iteration is not None
        # micro-deadline: budget of one SQP iteration
        c._params = NLParameters(
            maximum_iteration=200,
            time_limit=c._budgeter.seconds_per_iteration * 1.5,
        )
        r = c.optimize(np.array([-1.4, 1.3]), u0)
        assert int(np.asarray(r.solver_status)) == sqp.NLOPT_MAXTIME_REACHED
        assert int(np.asarray(r.status)) == int(ResultStatus.MAX_ITERATION)
        assert np.all(np.isfinite(np.asarray(r.cmd)))

    def test_zero_time_limit_means_unlimited(self):
        c = make_quadrotor_controller()
        r1 = c.optimize(np.zeros(12), np.zeros(4))
        r2 = c.optimize(np.zeros(12), np.zeros(4))
        assert int(np.asarray(r2.status)) == int(ResultStatus.SUCCESS)


class TestBudgeter:
    def test_budget_clamps_to_int32(self):
        """A generous deadline over a fast solve must clamp at NO_BUDGET:
        callers stage the budget as an int32 device scalar, so an unclamped
        value would raise OverflowError on every subsequent solve."""
        from libmpc_tpu.utils import deadline

        b = deadline.IterationBudgeter()
        b.record(1.0, 10)  # compile-polluted: skipped by design
        b.record(5e-4, 500)  # 1e-6 s/iteration
        cap = b.budget(3600.0)  # naive budget 3.6e9 > int32 max
        assert cap == deadline.NO_BUDGET
        jnp.asarray(cap, jnp.int32)  # must stage without overflow
        assert b.budget(1e-3) == 1000


class TestFleetTimeLimit:
    """Fleet-path deadline enforcement: both fleet classes carry their own
    IterationBudgeter (parallel/fleet.py); a budget-stopped fleet solve must
    surface the reference's statuses in FleetStats — LMPC time-limit stops
    count as UNKNOWN (LOptimizer.hpp:406-407), NLMPC ones as MAX_ITERATION
    (NLOptimizer.hpp:744-746) — with finite commands."""

    def test_lmpc_fleet_deadline_counts_unknown(self):
        import dataclasses

        from libmpc_tpu.parallel.fleet import LMPCFleet
        from libmpc_tpu.parallel.mesh import make_mesh

        c = make_quadrotor_controller()
        c.set_optimizer_parameters(LParameters(
            maximum_iteration=4000, eps_abs=1e-9, eps_rel=1e-9,
            check_termination=5, polish=False, adaptive_rho=False,
            time_limit=10.0,
        ))
        fleet = LMPCFleet(c, make_mesh(data=8))
        rng = np.random.default_rng(0)
        B = 16
        x0 = 0.2 * rng.normal(size=(B, 12))
        u0 = np.zeros((B, 4))
        fleet.optimize(x0, u0)  # compile (never recorded)
        fleet.optimize(x0, u0)  # calibration measurement
        assert fleet._budgeter.seconds_per_iteration is not None
        # micro-deadline through the calibrated fleet path; cold start so
        # every instance genuinely needs many iterations
        c.set_optimizer_parameters(dataclasses.replace(
            c._params,
            time_limit=fleet._budgeter.seconds_per_iteration * 6,
        ))
        fleet._warm_x = fleet._warm_y = None
        res, stats = fleet.optimize(x0, u0)
        assert int(stats.n_unknown) == B, str(stats)
        assert int(stats.n_success) == 0
        assert np.all(np.asarray(res.solver_status)
                      == admm.OSQP_TIME_LIMIT_REACHED)
        assert np.all(np.isfinite(np.asarray(res.cmd)))

    def test_nlmpc_fleet_deadline_counts_max_iteration(self):
        import dataclasses

        from libmpc_tpu.parallel.fleet import NLMPCFleet
        from libmpc_tpu.parallel.mesh import make_mesh

        c = make_vdp_controller()
        c.set_optimizer_parameters(NLParameters(
            maximum_iteration=200, time_limit=10.0,
        ))
        fleet = NLMPCFleet(c, make_mesh(data=8))
        rng = np.random.default_rng(1)
        B = 16
        x0 = np.stack([rng.uniform(0.8, 1.4, B), rng.uniform(-1.4, -0.8, B)],
                      axis=1)
        u0 = np.zeros((B, 1))
        fleet.optimize(x0, u0)  # compile
        fleet.optimize(x0, u0)  # calibrate
        assert fleet._budgeter.seconds_per_iteration is not None
        c.set_optimizer_parameters(dataclasses.replace(
            c._params,
            time_limit=fleet._budgeter.seconds_per_iteration * 1.5,
        ))
        fleet._opt_vector = fleet._slack = None
        res, stats = fleet.optimize(x0, u0)
        assert int(stats.n_max_iteration) == B, str(stats)
        assert np.all(np.asarray(res.solver_status)
                      == sqp.NLOPT_MAXTIME_REACHED)
        assert np.all(np.isfinite(np.asarray(res.cmd)))
