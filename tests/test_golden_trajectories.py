"""Closed-loop golden-trajectory regression.

`golden_trajectories.npz` stores 20-step float64 closed-loop command
sequences (quadrotor LMPC, Van der Pol NLMPC) produced by this framework at
a known-good revision whose single-step commands match the reference's
goldens.  Any future solver change that drifts the closed loop beyond
tolerance fails here — the trajectory-level regression SURVEY §7 calls for
("validate on trajectories, not iterates").
"""

import os

import jax.numpy as jnp
import numpy as np

from test_lmpc import make_quadrotor_controller, quadrotor_model
from test_nlmpc import make_vdp_controller, vdp_continuous

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden_trajectories.npz"))


class TestClosedLoopGoldens:
    def test_quadrotor_20_step_commands(self):
        c = make_quadrotor_controller()
        Ad, Bd, _ = quadrotor_model()
        x = np.zeros(12)
        u = np.zeros(4)
        for k in range(20):
            res = c.optimize(x, u)
            u = np.asarray(res.cmd)
            assert np.allclose(u, GOLDEN["quadrotor_cmds"][k], atol=1e-6), k
            x = Ad @ x + Bd @ u

    def test_vdp_20_step_commands(self):
        c = make_vdp_controller()
        x = np.array([0.0, 1.0])
        u = np.zeros(1)
        for k in range(20):
            res = c.optimize(x, u)
            u = np.asarray(res.cmd)
            assert np.allclose(u, GOLDEN["vdp_cmds"][k], atol=1e-6), k
            dx = np.asarray(vdp_continuous(jnp.asarray(x), jnp.asarray(u), 0))
            x = x + dx * 0.1

    def test_first_quadrotor_command_matches_reference_golden(self):
        # the stored trajectory is anchored to the reference's golden
        expected = np.array([-0.9916, 1.74839, -0.9916, 1.74839])
        assert np.allclose(GOLDEN["quadrotor_cmds"][0], expected, atol=1e-4)
