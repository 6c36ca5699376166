"""Driver entry-point contract tests.

`__graft_entry__.entry()` must return a jittable fn + example args and
`dryrun_multichip(n)` must compile and run the sharded fleet step — the
external driver depends on both; keep them from silently breaking.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


class TestEntry:
    def test_entry_compiles_and_runs(self):
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        cmd, cost, iters = out
        assert cmd.shape == (64, 4)
        assert np.all(np.isfinite(np.asarray(cmd)))

    def test_dryrun_multichip(self):
        n = len(jax.devices())
        assert n == 8
        ge.dryrun_multichip(n)
        ge.dryrun_multichip(2)
