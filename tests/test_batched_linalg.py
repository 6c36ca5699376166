"""Tests for the fused batched small-linalg Pallas kernels and the
compensated (double-single) residual arithmetic used by the LMPC polish.

Reference context: OSQP's polish solves its active-set KKT systems with a
float64 sparse LDL factorization (osqp polish.c); the TPU-native design
reaches the same accuracy class from float32 via exact-product splits and
error-free additions (ops/admm.py::_comp_mm) plus a batched Pallas Cholesky
(ops/batched_linalg.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libmpc_tpu.ops import admm, batched_linalg


class TestCholInverse:
    def _spd_batch(self, B, k, seed=0):
        rng = np.random.default_rng(seed)
        Q = rng.normal(size=(B, k, k)).astype(np.float32)
        return Q @ np.transpose(Q, (0, 2, 1)) / k + 0.5 * np.eye(
            k, dtype=np.float32
        )

    def test_xla_path_matches_numpy(self):
        C = self._spd_batch(5, 12)
        Ci = np.asarray(batched_linalg.chol_inverse(jnp.asarray(C)))
        ref = np.linalg.inv(C.astype(np.float64))
        assert np.abs(Ci - ref).max() < 1e-4 * np.abs(ref).max()

    def test_pallas_kernel_interpret_matches(self):
        # the TPU kernel path, run through the interpreter on CPU
        C = self._spd_batch(7, 17, seed=3)
        Ci = np.asarray(
            batched_linalg._chol_inverse_pallas(jnp.asarray(C), interpret=True)
        )
        ref = np.linalg.inv(C.astype(np.float64))
        resid = np.einsum("bij,bjk->bik", C.astype(np.float64), Ci)
        assert np.abs(resid - np.eye(17)).max() < 1e-4
        assert np.abs(Ci - ref).max() < 1e-3 * np.abs(ref).max()

    def test_vmem_size_gate(self):
        # working set is 6 * k^2 * 128 * 4 bytes against the 8 MB scoped
        # budget: the polish (k ~ 48) and small-SOC (k ~ 20) sizes pass,
        # a (128,128) block (rejected on hardware with "Scoped allocation
        # 31.68M, limit 16.00M") and the oscillators SOC size (k = 240)
        # must be gated out
        assert batched_linalg.kernel_supported(20)
        assert batched_linalg.kernel_supported(48)
        assert not batched_linalg.kernel_supported(128)
        assert not batched_linalg.kernel_supported(160)
        assert not batched_linalg.kernel_supported(240)

    def test_oversized_matrix_takes_blocked_path_even_forced(self):
        # k past the gate: force_kernel must NOT attempt the monolithic
        # Pallas kernel (it cannot lower on TPU — VMEM OOM at compile
        # time); the blocked Schur recursion answers instead
        C = self._spd_batch(2, 160, seed=9)
        Ci = np.asarray(
            batched_linalg.chol_inverse(jnp.asarray(C), force_kernel=True)
        )
        resid = np.einsum("bij,bjk->bik", C.astype(np.float64), Ci)
        assert np.abs(resid - np.eye(160)).max() < 1e-2

    def test_blocked_inverse_two_level_recursion(self):
        # k=301 (the networked-oscillators KKT size): 128 + (128 + 45)
        # blocks — two recursion levels, partial trailing block
        C = self._spd_batch(2, 301, seed=11)
        Ci = np.asarray(batched_linalg._chol_inverse_blocked(
            jnp.asarray(C), interpret=True))
        resid = np.einsum("bij,bjk->bik", C.astype(np.float64), Ci)
        assert np.abs(resid - np.eye(301)).max() < 5e-3

    def test_spd_inverse_routes_under_vmap(self):
        C = self._spd_batch(6, 24, seed=13)
        Ci = np.asarray(jax.vmap(batched_linalg.spd_inverse)(jnp.asarray(C)))
        ref = np.linalg.inv(C.astype(np.float64))
        assert np.abs(Ci - ref).max() < 1e-3 * np.abs(ref).max()

    def test_pallas_kernel_pads_partial_tile(self):
        # batch not a multiple of the 128-lane tile: padding must not
        # corrupt the real instances
        C = self._spd_batch(3, 9, seed=5)
        Ci = np.asarray(
            batched_linalg._chol_inverse_pallas(jnp.asarray(C), interpret=True)
        )
        resid = np.einsum("bij,bjk->bik", C.astype(np.float64), Ci)
        assert np.abs(resid - np.eye(9)).max() < 1e-4


class TestCompensatedMatmul:
    def test_comp_mm_beats_plain_rounding(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(64, 96)).astype(np.float32)
        M = rng.normal(size=(96, 80)).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            hi, lo = admm._comp_mm(jnp.asarray(X), jnp.asarray(M))
            plain = jnp.asarray(X) @ jnp.asarray(M)
        truth = X.astype(np.float64) @ M.astype(np.float64)
        comp = np.asarray(hi).astype(np.float64) + np.asarray(lo).astype(
            np.float64
        )
        err_comp = np.abs(comp - truth).max()
        err_plain = np.abs(np.asarray(plain) - truth).max()
        assert err_comp < err_plain
        # compensation target: ~eps-level of the TERM scale, well under the
        # plain accumulation error
        assert err_comp < 5e-6

    def test_two_sum_is_error_free(self):
        a = jnp.asarray(np.float32(1.0))
        b = jnp.asarray(np.float32(3e-8))
        s, e = admm._two_sum(a, b)
        # s + e reproduces the exact sum of the float32 inputs in double
        assert float(s) + float(e) == float(a) + float(b)

    def test_split_heads_are_bf16_exact(self):
        x = jnp.asarray(np.float32(1.2345678))
        hi, lo = admm._split12(x)
        # head survives a bfloat16 round trip unchanged
        assert float(jnp.asarray(hi).astype(jnp.bfloat16).astype(jnp.float32)) == float(hi)
        assert float(hi) + float(lo) == pytest.approx(1.2345678, abs=1e-7)


class TestPolishAccuracy:
    def test_f32_polish_reaches_data_floor(self):
        """Random equality-constrained QP: the float32 shared polish must
        land ~10x under the 1e-4-class plain-f32 stall."""
        rng = np.random.default_rng(7)
        n, me, B = 24, 10, 4
        Q = rng.normal(size=(n, n))
        P = (Q @ Q.T / n + 0.5 * np.eye(n)).astype(np.float32)
        A = np.concatenate(
            [rng.normal(size=(me, n)), np.eye(n)], axis=0
        ).astype(np.float32)
        m = me + n
        q = rng.normal(size=(B, n)).astype(np.float32)
        be = rng.normal(size=(B, me)).astype(np.float32) * 0.1
        l = np.concatenate([be, -5 * np.ones((B, n))], axis=1).astype(np.float32)
        u = np.concatenate([be, 5 * np.ones((B, n))], axis=1).astype(np.float32)
        eq = jnp.arange(m) < me
        from libmpc_tpu.types import LParameters

        par = LParameters(maximum_iteration=500, polish=True,
                          polish_mode="shared", rho=0.1)
        sol = jax.vmap(
            lambda qq, ll, uu: admm.admm_solve(
                jnp.asarray(P), jnp.asarray(A), qq, ll, uu, par, eq_mask=eq
            ),
            in_axes=(0, 0, 0),
        )(jnp.asarray(q), jnp.asarray(l), jnp.asarray(u))
        # f64 reference by KKT solve on the equality-active set (bounds are
        # not active at these scales)
        for b in range(B):
            K = np.block([
                [P.astype(np.float64), A[:me].T.astype(np.float64)],
                [A[:me].astype(np.float64), np.zeros((me, me))],
            ])
            rhs = np.concatenate([-q[b].astype(np.float64), be[b].astype(np.float64)])
            xs = np.linalg.solve(K, rhs)[:n]
            err = np.abs(np.asarray(sol.x)[b] - xs).max()
            assert err < 2e-5, (b, err)
