"""Checkpoint/resume tests: a resumed controller continues identically."""

import numpy as np
import pytest

from libmpc_tpu import LParameters, NLParameters
from libmpc_tpu.utils import checkpoint

from test_lmpc import make_quadrotor_controller, quadrotor_model
from test_nlmpc import make_vdp_controller, vdp_continuous

import jax.numpy as jnp


class TestLMPCCheckpoint:
    def test_resume_continues_identically(self, tmp_path):
        path = str(tmp_path / "lmpc.npz")
        Ad, Bd, _ = quadrotor_model()

        c1 = make_quadrotor_controller()
        c1.set_optimizer_parameters(
            LParameters(maximum_iteration=250, enable_warm_start=True)
        )
        x = np.zeros(12)
        u = np.zeros(4)
        for _ in range(3):
            res = c1.optimize(x, u)
            u = np.asarray(res.cmd)
            x = Ad @ x + Bd @ u
        c1.save_state(path)
        x_ck, u_ck = x.copy(), u.copy()
        r_next = c1.optimize(x, u)

        c2 = make_quadrotor_controller()
        c2.set_optimizer_parameters(
            LParameters(maximum_iteration=250, enable_warm_start=True)
        )
        c2.load_state(path)
        r_resumed = c2.optimize(x_ck, u_ck)
        assert np.allclose(np.asarray(r_next.cmd), np.asarray(r_resumed.cmd), atol=1e-10)

    def test_dims_mismatch_refused(self, tmp_path):
        from libmpc_tpu import LMPC

        path = str(tmp_path / "lmpc.npz")
        c = make_quadrotor_controller()
        c.optimize(np.zeros(12), np.zeros(4))
        c.save_state(path)
        other = LMPC(2, 1, 0, 2, 3, 3)
        with pytest.raises(ValueError, match="mismatch"):
            other.load_state(path)


class TestNLMPCCheckpoint:
    def test_resume_continues_identically(self, tmp_path):
        path = str(tmp_path / "nlmpc.npz")
        ts = 0.1

        def run_steps(c, x, u, steps):
            for _ in range(steps):
                res = c.optimize(x, u)
                u = np.asarray(res.cmd)
                dx = np.asarray(vdp_continuous(jnp.asarray(x), jnp.asarray(u), 0))
                x = x + dx * ts
            return x, u

        c1 = make_vdp_controller()
        c1.set_optimizer_parameters(
            NLParameters(maximum_iteration=100, enable_warm_start=True)
        )
        x, u = run_steps(c1, np.array([0.0, 1.0]), np.zeros(1), 3)
        c1.save_state(path)
        r_next = c1.optimize(x, u)

        c2 = make_vdp_controller()
        c2.set_optimizer_parameters(
            NLParameters(maximum_iteration=100, enable_warm_start=True)
        )
        c2.load_state(path)
        r_resumed = c2.optimize(x, u)
        assert np.allclose(np.asarray(r_next.cmd), np.asarray(r_resumed.cmd), atol=1e-10)


class TestFleetCheckpoint:
    def test_fleet_roundtrip(self, tmp_path):
        import jax

        from libmpc_tpu.parallel import mesh as mesh_lib
        from libmpc_tpu.parallel.fleet import LMPCFleet

        path = str(tmp_path / "fleet.npz")
        m = mesh_lib.make_mesh(data=8)
        c = make_quadrotor_controller()
        c.set_optimizer_parameters(
            LParameters(maximum_iteration=250, enable_warm_start=True)
        )
        fleet = LMPCFleet(c, m)
        x0 = np.zeros((8, 12))
        u0 = np.zeros((8, 4))
        fleet.optimize(x0, u0)
        checkpoint.save_fleet(fleet, path)

        fleet2 = LMPCFleet(make_quadrotor_controller(), m)
        fleet2.controller.set_optimizer_parameters(
            LParameters(maximum_iteration=250, enable_warm_start=True)
        )
        checkpoint.load_fleet(fleet2, path)
        r1, _ = fleet.optimize(x0, u0)
        r2, _ = fleet2.optimize(x0, u0)
        assert np.allclose(np.asarray(r1.cmd), np.asarray(r2.cmd), atol=1e-10)
