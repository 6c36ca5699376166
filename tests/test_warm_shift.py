"""LMPC warm-start shift (LParameters.warm_start_shift).

The reference warm-starts OSQP with the unshifted previous solution
(include/mpc/LMPC/LOptimizer.hpp:372); `warm_start_shift` re-aligns the
guess with the receding horizon before each solve.  These tests pin the
block semantics of the shift and its closed-loop behavior: same commands,
no more iterations than the unshifted warm start.
"""

import jax.numpy as jnp
import numpy as np

from libmpc_tpu import LParameters
from libmpc_tpu.dims import LDims
from libmpc_tpu.lmpc import problem as qp

from tests.test_lmpc import make_quadrotor_controller, quadrotor_model


class TestShiftSemantics:
    def test_primal_blocks_roll_one_stage(self):
        dims = LDims(2, 1, 0, 2, 3, 2).validate()
        # stage-tagged primal: augmented block k filled with k, move k with 10+k
        aug = np.repeat(np.arange(dims.ph + 1, dtype=float), dims.nxu)
        du = np.repeat(10.0 + np.arange(dims.ph, dtype=float), dims.nu)
        warm_x = jnp.asarray(np.concatenate([aug, du]))
        warm_y = jnp.zeros((dims.m,))
        sx, _ = qp.shift_warm_start(dims, warm_x, warm_y)
        aug_s = np.asarray(sx[: dims.n_aug]).reshape(dims.ph + 1, dims.nxu)
        du_s = np.asarray(sx[dims.n_aug :]).reshape(dims.ph, dims.nu)
        # stages advance by one, the terminal stage is duplicated
        np.testing.assert_array_equal(aug_s[:, 0], [1, 2, 3, 3])
        np.testing.assert_array_equal(du_s[:, 0], [11, 12, 12])

    def test_dual_segments_roll_independently(self):
        dims = LDims(2, 1, 0, 2, 3, 2).validate()
        # tag each dual row with segment*100 + stage so cross-segment leakage
        # or mis-sized segments change some row's value
        segments = (
            (dims.ph + 1, dims.nxu),
            (dims.ph + 1, dims.nxu),
            (dims.ph + 1, dims.ny),
            (dims.ph, dims.nu),
            (dims.ph + 1, 1),
        )
        rows = []
        for seg_idx, (n_stages, width) in enumerate(segments):
            for stage in range(n_stages):
                rows.extend([100.0 * seg_idx + stage] * width)
        warm_y = jnp.asarray(np.array(rows))
        assert warm_y.shape == (dims.m,)
        _, sy = qp.shift_warm_start(dims, jnp.zeros((dims.nz,)), warm_y)
        expected = []
        for seg_idx, (n_stages, width) in enumerate(segments):
            for stage in range(n_stages):
                shifted = min(stage + 1, n_stages - 1)
                expected.extend([100.0 * seg_idx + shifted] * width)
        np.testing.assert_array_equal(np.asarray(sy), np.array(expected))

    def test_batched_shift_matches_unbatched(self):
        dims = LDims(3, 2, 0, 3, 4, 2).validate()
        rng = np.random.default_rng(0)
        wx = jnp.asarray(rng.normal(size=(5, dims.nz)))
        wy = jnp.asarray(rng.normal(size=(5, dims.m)))
        bx, by = qp.shift_warm_start(dims, wx, wy)
        for i in range(5):
            sx, sy = qp.shift_warm_start(dims, wx[i], wy[i])
            np.testing.assert_array_equal(np.asarray(bx[i]), np.asarray(sx))
            np.testing.assert_array_equal(np.asarray(by[i]), np.asarray(sy))


class TestClosedLoop:
    def _rollout(self, shift: bool, steps: int = 25):
        c = make_quadrotor_controller()
        c.set_optimizer_parameters(
            LParameters(
                maximum_iteration=400,
                enable_warm_start=True,
                warm_start_shift=shift,
                compact_stragglers=False,
                polish=False,
                rho=0.01,
            )
        )
        Ad, Bd, _ = quadrotor_model()
        x = np.full(12, 0.05)
        u = np.zeros(4)
        cmds, iters = [], []
        for _ in range(steps):
            res = c.optimize(jnp.asarray(x), jnp.asarray(u))
            assert res.status == 0
            u = np.asarray(res.cmd)
            cmds.append(u)
            iters.append(int(c._last_iters))
            x = Ad @ x + Bd @ u
        return np.array(cmds), np.array(iters)

    def test_shift_preserves_trajectory_and_cuts_iterations(self):
        cmds_plain, iters_plain = self._rollout(shift=False)
        cmds_shift, iters_shift = self._rollout(shift=True)
        # same closed-loop trajectory (both solve to the same tolerance)
        np.testing.assert_allclose(cmds_shift, cmds_plain, atol=5e-3)
        # the realigned start must never need more iteration blocks overall
        assert iters_shift.sum() <= iters_plain.sum()
