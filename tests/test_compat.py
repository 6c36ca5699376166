"""pympcxx compatibility-layer tests: reference-binding-style scripts run
against libmpc_tpu.compat (modeled on python/examples/example.py and
example_nl.py of the reference)."""

import jax.numpy as jnp
import numpy as np
import pytest

import libmpc_tpu.compat as mpc


class TestNLMPCScript:
    def test_example_nl(self):
        """python/examples/example_nl.py against the compat layer."""
        nx, nu, ny = 2, 1, 2
        ph, ch = 10, 5
        ineq_c, eq = ph + 1, 0
        ts = 0.1

        nlmpc = mpc.NLMPC(nx, nu, ny, ph, ch, ineq_c, eq)
        nlmpc.setLoggerLevel(mpc.LoggerLevel.NONE)
        nlmpc.setDiscretizationSamplingTime(ts)

        def state_space(x, u, i):
            return jnp.stack([
                (1.0 - x[1] * x[1]) * x[0] - x[1] + u[0],
                x[0],
            ])

        def cost(x, y, u, slack):
            return jnp.sum(jnp.square(x)) + jnp.sum(jnp.square(u))

        def ineq_con(x, y, u, slack):
            return u[:, 0] - 0.5

        nlmpc.setStateSpaceFunction(state_space, 1e-10)
        nlmpc.setObjectiveFunction(cost)
        nlmpc.setIneqConFunction(ineq_con, 1e-10)

        params = mpc.NLParameters()
        params.maximum_iteration = 200
        nlmpc.setOptimizerParameters(params)

        m_x = np.array([0.0, 1.0])
        m_u = np.array([0.0])
        for step in range(200):
            res = nlmpc.optimize(m_x, m_u)
            m_u = np.asarray(res.cmd)
            dx = np.array([
                (1.0 - m_x[1] ** 2) * m_x[0] - m_x[1] + m_u[0],
                m_x[0],
            ])
            m_x = m_x + dx * ts
            if abs(m_x[0]) <= 1e-2 and abs(m_x[1]) <= 1e-1:
                break
        else:
            pytest.fail(f"did not converge: {m_x}")

        stats = nlmpc.getExecutionStats()
        assert stats.number_of_solutions == step + 1


class TestLMPCScript:
    def test_quadrotor_golden_via_compat(self):
        from test_lmpc import quadrotor_model

        Tnx, Tnu, Tndu, Tny, Tph, Tch = 12, 4, 4, 12, 10, 10
        lmpc = mpc.LMPC(Tnx, Tnu, Tndu, Tny, Tph, Tch)
        Ad, Bd, Cd = quadrotor_model()
        assert lmpc.setStateSpaceModel(Ad, Bd, Cd)

        OutputW = np.array([0, 0, 10, 10, 10, 10, 0, 0, 0, 5, 5, 5], float)
        assert lmpc.setObjectiveWeights(
            OutputW, np.full(4, 0.1), np.zeros(4), mpc.HorizonSlice(0, Tph)
        )
        inf = float("inf")
        xmin = np.array([-np.pi / 6, -np.pi / 6, -inf, -inf, -inf, -1,
                         -inf, -inf, -inf, -inf, -inf, -inf])
        xmax = np.array([np.pi / 6, np.pi / 6] + [inf] * 10)
        u0 = 10.5916
        assert lmpc.setStateBounds(xmin, xmax, mpc.HorizonSlice(0, Tph))
        assert lmpc.setInputBounds(
            np.full(4, 9.6 - u0), np.full(4, 13.0 - u0), mpc.HorizonSlice(0, Tch)
        )
        yRef = np.zeros(12)
        yRef[2] = 1.0
        assert lmpc.setReferences(
            yRef, np.zeros(4), np.zeros(4), mpc.HorizonSlice(0, Tph)
        )

        params = mpc.LParameters()
        params.maximum_iteration = 250
        lmpc.setOptimizerParameters(params)

        res = lmpc.optimize(np.zeros(12), np.zeros(4))
        golden = np.array([-0.9916, 1.74839, -0.9916, 1.74839])
        assert np.allclose(np.asarray(res.cmd), golden, atol=1e-4)
        assert res.status_enum == mpc.SUCCESS

        seq = lmpc.getOptimalSequence()
        assert np.asarray(seq.state).shape == (Tph + 1, Tnx)

    def test_scalar_constraint_overloads(self):
        lmpc = mpc.LMPC(2, 1, 0, 2, 5, 5)
        assert lmpc.setScalarConstraint(
            -1.0, 1.0, np.ones(2), np.ones(1), mpc.HorizonSlice.all()
        )
        assert lmpc.setScalarConstraint(0, -1.0, 1.0, np.ones(2), np.ones(1))

    def test_parameter_objects_mutable(self):
        p = mpc.LParameters()
        p.maximum_iteration = 42
        p.rho = 0.5
        frozen = p._frozen()
        assert frozen.maximum_iteration == 42 and frozen.rho == 0.5
        np_ = mpc.NLParameters()
        np_.hard_constraints = False
        assert np_._frozen().hard_constraints is False


def test_module_scope_types_match_pybind_export():
    """Every module-scope type of the reference binding exists here
    (reference: python/pybind_export.cpp:129-212)."""
    for name in ("LMPC", "NLMPC", "Parameters", "LParameters",
                 "NLParameters", "Result", "OptSequence", "SolutionStats",
                 "ResultStatus", "LoggerLevel", "HorizonSlice"):
        assert hasattr(mpc, name), name
    # enum members exported at module scope (export_values parity)
    assert mpc.SUCCESS == mpc.ResultStatus.SUCCESS
    assert mpc.NORMAL == mpc.LoggerLevel.NORMAL
