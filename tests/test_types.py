"""Type-layer tests: pytree registration, parameters, dims arithmetic."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libmpc_tpu import (
    HorizonSlice,
    LParameters,
    NLParameters,
    OptSequence,
    Parameters,
    Result,
    ResultStatus,
)
from libmpc_tpu.dims import LDims, NLDims


class TestHorizonSlice:
    def test_all_sentinel(self):
        s = HorizonSlice.all()
        assert s.start == -1 and s.end == -1 and s.is_unset

    def test_regular(self):
        s = HorizonSlice(0, 5)
        assert not s.is_unset


class TestParameters:
    def test_reference_defaults(self):
        # (reference: include/mpc/Types.hpp:99-161)
        p = Parameters()
        assert p.maximum_iteration == 100
        assert p.time_limit == 0
        assert not p.enable_warm_start

        lp = LParameters()
        assert (lp.alpha, lp.rho) == (1.6, 1e-6)
        assert (lp.eps_rel, lp.eps_abs) == (1e-4, 1e-4)
        assert (lp.eps_prim_inf, lp.eps_dual_inf) == (1e-3, 1e-3)
        assert lp.adaptive_rho and lp.polish and not lp.verbose

        nl = NLParameters()
        assert nl.relative_ftol == -1 and nl.relative_xtol == -1
        assert nl.absolute_ftol == -1 and nl.absolute_xtol == -1
        assert nl.hard_constraints

    def test_hashable_static_args(self):
        # parameters select compiled programs -> must be hashable
        assert hash(LParameters()) == hash(LParameters())
        assert hash(LParameters(rho=0.2)) != hash(LParameters())


class TestResultPytree:
    def _mk(self):
        return Result(
            cmd=jnp.ones(3),
            cost=jnp.asarray(2.0),
            status=jnp.asarray(int(ResultStatus.SUCCESS), jnp.int32),
            solver_status=jnp.asarray(1, jnp.int32),
            is_feasible=jnp.asarray(True),
        )

    def test_tree_map(self):
        r = self._mk()
        doubled = jax.tree.map(lambda a: a * 2, r)
        assert np.allclose(np.asarray(doubled.cmd), 2.0)
        assert doubled.solver_status_msg == ""

    def test_jit_through(self):
        r = self._mk()

        @jax.jit
        def f(res):
            return dataclasses.replace(res, cost=res.cost + 1)

        out = f(r)
        assert float(out.cost) == 3.0

    def test_status_enum(self):
        assert self._mk().status_enum == ResultStatus.SUCCESS

    def test_vmap_batch(self):
        r = self._mk()
        batched = jax.tree.map(lambda a: jnp.stack([a, a]), r)
        summed = jax.vmap(lambda res: res.cost)(batched)
        assert summed.shape == (2,)


class TestDims:
    def test_lmpc_qp_sizes_quadrotor(self):
        d = LDims(12, 4, 4, 12, 10, 10)
        assert d.nz == (10 + 1) * 16 + 10 * 4  # 216
        assert d.nz == 216
        assert d.n_eq == 176
        assert d.m == 176 + 176 + 132 + 40 + 11  # 535

    def test_nlmpc_sizes_vdp(self):
        d = NLDims(2, 1, 2, 10, 5, 11, 0)
        assert d.nz == 10 * 2 + 1 * 5 + 1  # 26
        assert d.n_defect == 20

    def test_validation(self):
        with pytest.raises(ValueError):
            LDims(0, 1, 0, 1, 1, 1).validate()
        with pytest.raises(ValueError):
            LDims(1, 1, 0, 1, 2, 3).validate()  # ch > ph
        with pytest.raises(ValueError):
            NLDims(1, 1, 1, 1, 1, -1, 0).validate()
