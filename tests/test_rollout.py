"""On-device closed-loop rollout tests: one fused scan must reproduce the
step-by-step host loop exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libmpc_tpu import LParameters, NLParameters
from libmpc_tpu.rollout import lmpc_rollout, nlmpc_rollout

from test_lmpc import make_quadrotor_controller, quadrotor_model
from test_nlmpc import make_vdp_controller, vdp_continuous


class TestLMPCRollout:
    def test_matches_host_loop(self):
        Ad, Bd, _ = quadrotor_model()
        Ad_j, Bd_j = jnp.asarray(Ad), jnp.asarray(Bd)
        plant = lambda x, u, k: x @ Ad_j.T + u @ Bd_j.T

        n_steps = 5
        c1 = make_quadrotor_controller()
        c1.set_optimizer_parameters(
            LParameters(maximum_iteration=250, enable_warm_start=True)
        )
        roll = lmpc_rollout(c1, plant, np.zeros(12), np.zeros(4), n_steps)
        assert roll.states.shape == (n_steps + 1, 12)
        assert roll.inputs.shape == (n_steps, 4)

        c2 = make_quadrotor_controller()
        c2.set_optimizer_parameters(
            LParameters(maximum_iteration=250, enable_warm_start=True)
        )
        x = np.zeros(12)
        u = np.zeros(4)
        for k in range(n_steps):
            res = c2.optimize(x, u)
            u = np.asarray(res.cmd)
            assert np.allclose(u, np.asarray(roll.inputs[k]), atol=1e-9), k
            x = Ad @ x + Bd @ u
        assert np.allclose(x, np.asarray(roll.states[-1]), atol=1e-9)

    def test_batched_rollout(self):
        Ad, Bd, _ = quadrotor_model()
        Ad_j, Bd_j = jnp.asarray(Ad), jnp.asarray(Bd)
        plant = lambda x, u, k: x @ Ad_j.T + u @ Bd_j.T
        c = make_quadrotor_controller()
        rng = np.random.default_rng(0)
        B = 4
        x0 = 0.02 * rng.normal(size=(B, 12))
        roll = lmpc_rollout(c, plant, x0, np.zeros((B, 4)), 40)
        assert roll.states.shape == (B, 41, 12)
        # every instance reaches the altitude reference
        assert np.all(np.abs(np.asarray(roll.states)[:, -1, 2] - 1.0) < 5e-2)
        assert np.all(np.asarray(roll.statuses) == 0)


class TestNLMPCRollout:
    def test_matches_host_loop(self):
        ts = 0.1
        plant = lambda x, u, k: x + vdp_continuous(x, u, k) * ts

        n_steps = 5
        c1 = make_vdp_controller()
        c1.set_optimizer_parameters(
            NLParameters(maximum_iteration=100, enable_warm_start=True)
        )
        roll = nlmpc_rollout(c1, plant, np.array([0.0, 1.0]), np.zeros(1), n_steps)

        c2 = make_vdp_controller()
        c2.set_optimizer_parameters(
            NLParameters(maximum_iteration=100, enable_warm_start=True)
        )
        x = np.array([0.0, 1.0])
        u = np.zeros(1)
        for k in range(n_steps):
            res = c2.optimize(x, u)
            u = np.asarray(res.cmd)
            assert np.allclose(u, np.asarray(roll.inputs[k]), atol=1e-9), k
            x = np.asarray(plant(jnp.asarray(x), jnp.asarray(u), k))

    def test_batched_regulation(self):
        import jax

        ts = 0.1
        vdp_b = jax.vmap(vdp_continuous, in_axes=(0, 0, None))
        plant = lambda x, u, k: x + vdp_b(x, u, k) * ts
        c = make_vdp_controller()
        c.set_optimizer_parameters(
            NLParameters(maximum_iteration=60, enable_warm_start=True)
        )
        rng = np.random.default_rng(1)
        B = 4
        x0 = rng.uniform(-0.5, 0.5, size=(B, 2))
        roll = nlmpc_rollout(c, plant, x0, np.zeros((B, 1)), 120)
        finals = np.asarray(roll.states)[:, -1]
        assert np.all(np.abs(finals[:, 0]) < 5e-2)
        # command cap respected everywhere
        assert np.asarray(roll.inputs).max() <= 0.5 + 1e-6


class TestRunnerCaching:
    """Repeated rollout calls with the same configuration must reuse ONE
    compiled program (the runner closures are cached; jit keeps its own
    per-shape cache on the cached callable)."""

    def test_lmpc_runner_cached(self):
        from libmpc_tpu import rollout as rollout_mod

        Ad, Bd, _ = quadrotor_model()
        Adj, Bdj = jnp.asarray(Ad), jnp.asarray(Bd)
        plant = lambda x, u, k: x @ Adj.T + u @ Bdj.T
        c = make_quadrotor_controller()
        rollout_mod._lmpc_runner.cache_clear()
        x0 = np.zeros((2, 12))
        u0 = np.zeros((2, 4))
        r1 = lmpc_rollout(c, plant, x0, u0, 3)
        r2 = lmpc_rollout(c, plant, x0, u0, 3)
        info = rollout_mod._lmpc_runner.cache_info()
        assert info.misses == 1 and info.hits >= 1
        assert np.array_equal(np.asarray(r1.inputs), np.asarray(r2.inputs))

    def test_nlmpc_runner_cached(self):
        ts = 0.1
        vdp_b = jax.vmap(vdp_continuous, in_axes=(0, 0, None))
        plant = lambda x, u, k: x + vdp_b(x, u, k) * ts
        c = make_vdp_controller()
        x0 = np.array([[0.2, -0.1], [0.1, 0.3]])
        u0 = np.zeros((2, 1))
        r1 = nlmpc_rollout(c, plant, x0, u0, 2)
        cache = c._rollout_runner_cache
        assert len(cache) == 1
        fn = next(iter(cache.values()))
        r2 = nlmpc_rollout(c, plant, x0, u0, 2)
        assert len(cache) == 1
        assert next(iter(cache.values())) is fn  # same compiled runner
        assert np.array_equal(np.asarray(r1.inputs), np.asarray(r2.inputs))

    def test_chunked_rollout_matches_one_shot(self):
        """chunk_steps partitions the identical per-instance solve
        sequence: the warm-start carry (z, slack, have-warm flag, step
        index) threads through the host boundary, so a 6-step rollout in
        three 2-step device programs reproduces the one-shot scan
        bitwise."""
        ts = 0.1
        vdp_b = jax.vmap(vdp_continuous, in_axes=(0, 0, None))
        plant = lambda x, u, k: x + vdp_b(x, u, k) * ts
        x0 = np.array([[0.2, -0.1], [0.1, 0.3], [-0.4, 0.2]])
        u0 = np.zeros((3, 1))
        c1 = make_vdp_controller()
        r_full = nlmpc_rollout(c1, plant, x0, u0, 6)
        c2 = make_vdp_controller()
        r_chunk = nlmpc_rollout(c2, plant, x0, u0, 6, chunk_steps=2)
        assert np.array_equal(np.asarray(r_full.inputs),
                              np.asarray(r_chunk.inputs))
        assert np.array_equal(np.asarray(r_full.states),
                              np.asarray(r_chunk.states))
        assert np.array_equal(np.asarray(r_full.iterations),
                              np.asarray(r_chunk.iterations))
        # ragged final chunk: 5 steps as 2/2/1 device programs, still
        # bitwise-identical to the one-shot prefix of the same loop
        c3 = make_vdp_controller()
        r5_full = nlmpc_rollout(c3, plant, x0, u0, 5)
        c4 = make_vdp_controller()
        r5_chunk = nlmpc_rollout(c4, plant, x0, u0, 5, chunk_steps=2)
        assert np.array_equal(np.asarray(r5_full.inputs),
                              np.asarray(r5_chunk.inputs))
        assert np.array_equal(np.asarray(r5_full.states),
                              np.asarray(r5_chunk.states))


class TestRescuePhase:
    """NLParameters.rescue_iters: compacted two-phase rescue in
    nlmpc_rollout (round 5)."""

    def _mk(self, rescue, restart=False):
        from libmpc_tpu import NLMPC

        c = NLMPC(2, 1, 2, 10, 5, 11, 0, dtype=jnp.float32)
        c.set_discretization_sampling_time(0.1)
        c.set_optimizer_parameters(NLParameters(
            maximum_iteration=30, enable_warm_start=True,
            inner_qp="riccati", hessian_reg="gauss_newton",
            inner_iters=30, inner_iters_recovery=30,
            rescue_iters=rescue,
            cold_restart_on_failure=restart,
        ))
        c.set_state_space_function(vdp_continuous)
        c.set_objective_function(
            lambda X, Y, U, e: jnp.sum(X**2) + jnp.sum(U**2)
        )
        c.set_ineq_con_function(lambda X, Y, U, e: U[:, 0] - 0.5)
        return c

    def test_rescue_no_worse_and_healthy_lanes_bitwise(self):
        """The rescue phase may only IMPROVE failed lanes: lanes that are
        healthy in both runs must be bitwise identical (the fast phase is
        untouched), and the rescued run's failing-lane set is a subset of
        the control's."""
        ts = 0.1
        vdp_b = jax.vmap(vdp_continuous, in_axes=(0, 0, None))
        plant = lambda x, u, k: x + ts * vdp_b(x, u, k)
        rng = np.random.default_rng(5)
        x0 = np.asarray(rng.uniform(-1, 1, size=(32, 2)), np.float32)
        u0 = np.zeros((32, 1), np.float32)
        r1 = nlmpc_rollout(self._mk(rescue=45), plant, x0, u0, 4)
        r0 = nlmpc_rollout(self._mk(rescue=0), plant, x0, u0, 4)
        s1 = np.asarray(r1.statuses)
        s0 = np.asarray(r0.statuses)
        fail1 = set(np.nonzero((s1 != 0).any(1))[0].tolist())
        fail0 = set(np.nonzero((s0 != 0).any(1))[0].tolist())
        # this f32 cap-30 configuration produces failures by design (the
        # rescue path must actually execute, not no-op through the cond)
        assert fail0, "expected the fast config to produce failures"
        assert fail1 <= fail0
        healthy = [i for i in range(32) if i not in (fail0 | fail1)]
        assert np.array_equal(np.asarray(r1.inputs)[healthy],
                              np.asarray(r0.inputs)[healthy])

    def test_cold_restart_rollout_runs(self):
        ts = 0.1
        vdp_b = jax.vmap(vdp_continuous, in_axes=(0, 0, None))
        plant = lambda x, u, k: x + ts * vdp_b(x, u, k)
        rng = np.random.default_rng(5)
        x0 = np.asarray(rng.uniform(-1, 1, size=(8, 2)), np.float32)
        r = nlmpc_rollout(self._mk(rescue=0, restart=True), plant, x0,
                          np.zeros((8, 1), np.float32), 3)
        assert np.isfinite(np.asarray(r.inputs)).all()
