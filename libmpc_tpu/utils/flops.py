"""Analytic FLOP models for the benchmark sections (round-4 task #3).

BASELINE.json's north star asks for "rollout and ADMM iteration kernels at
speed-of-light per chip"; proving distance-to-light needs a FLOP count.
These models count the *useful algorithm FLOPs* of each solver's dominant
dense-algebra terms (matmul-level operations; elementwise vector work and
control flow excluded), so ``tflops = flops / time`` is a lower bound on
the sustained rate and ``pct_matmul_peak`` relates it to the chip's
*measured* f32 matmul ceiling (``measure_matmul_peak``), which is the
honest roofline for a highest-precision-matmul workload: TPU f32 matmuls
at ``highest`` precision decompose into multiple bf16 MXU passes, so the
nominal bf16 peak is not reachable by construction.

Models (per instance, per iteration; B and measured iteration counts
multiply in the caller):

* ADMM iteration (ops/admm.py::one_iteration, shared KKT inverse):
  rhs build ``(rho z - y) @ A`` = 2mn, x-update ``rhs @ Minv`` = 2n^2,
  refinement pass (x_refine) ``xt @ M`` + ``· @ Minv`` = 4n^2,
  ``xt @ A.T`` = 2mn  ->  4mn + 6n^2 (+2n^2 without refine).
* ADMM termination check (every check_termination iterations):
  Ax, Px, A'y, A'dy, P dx, A dx ~ 6 matvecs -> 8mn + 4n^2 (counted via
  iters/check_every).
* Banded-IPM SQP iteration (ops/trajectory_kkt.py, per inner-IPM
  iteration): Gram assembly 6·mi·bs_p^2·ph, stage factorization
  ~14·ph·bs^3 (two SPD inverses + block products per stage), 3 solve
  sweeps ~12·ph·bs^2·(2+w), residual matvecs 4·(me+mi)·nz.
* SQP outer iteration extras: exact Jacobians by forward-mode over nz
  tangents ~ 2·nz·(me+mi)·c_model with c_model ~ 3 ops per output
  (tracking-cost/polynomial models), line-search/merit ~ (me+mi)·nz.

The models are documented here once and unit-tested for shape consistency
(tests/test_misc_harness.py); bench.py multiplies them by measured
iteration counts so every throughput row carries a FLOP/s figure.
"""

from __future__ import annotations

import time


def admm_iter_flops(n: int, m: int, x_refine: bool = True) -> float:
    """FLOPs of one ADMM iteration for one instance (shared (n,n)/(m,n))."""
    base = 4.0 * m * n + 2.0 * n * n
    if x_refine:
        base += 4.0 * n * n
    return base


def admm_check_flops(n: int, m: int) -> float:
    """FLOPs of one termination check for one instance."""
    return 8.0 * m * n + 4.0 * n * n


def admm_solve_flops(n: int, m: int, iters: float, check_every: int,
                     x_refine: bool = True) -> float:
    """Useful FLOPs of one ADMM solve at a measured iteration count."""
    checks = max(iters / max(check_every, 1), 1.0)
    return iters * admm_iter_flops(n, m, x_refine) + checks * admm_check_flops(n, m)


def traj_ipm_iter_flops(ph: int, ch: int, nx: int, nu: int, mi: int) -> float:
    """FLOPs of one banded-IPM (Mehrotra) iteration for one instance."""
    bs_p = nx + nu
    bs = bs_p + nx
    w = nu + 2
    me = ph * nx
    nz = ph * nx + ch * nu + 1
    gram = 6.0 * mi * bs_p * bs_p * ph
    factor = 14.0 * ph * bs**3
    sweeps = 12.0 * ph * bs * bs * (2 + w)
    resid = 4.0 * (me + mi) * nz
    return gram + factor + sweeps + resid


def sqp_iter_flops(ph: int, ch: int, nx: int, nu: int, mi: int,
                   ipm_iters: float = 20.0) -> float:
    """FLOPs of one SQP iteration with the banded-IPM inner engine."""
    nz = ph * nx + ch * nu + 1
    me = ph * nx
    jac = 2.0 * nz * (me + mi) * 3.0
    merit = 2.0 * (me + mi) * nz
    return jac + merit + ipm_iters * traj_ipm_iter_flops(ph, ch, nx, nu, mi)


def fused_sqp_iter_flops(nz: int, me: int, mi: int,
                         admm_iters: float = 60.0) -> float:
    """FLOPs of one SQP iteration with the fused Pallas inner-ADMM engine
    (small problems): per inner iteration ~ 4 m_qp nz + 2 nz^2 plus one
    (nz,nz) factorization per subproblem."""
    m_qp = me + mi + nz
    inner = admm_iters * (4.0 * m_qp * nz + 2.0 * nz * nz)
    factor = (2.0 / 3.0) * nz**3 + 2.0 * m_qp * nz * nz  # chol + A'RA
    jac = 2.0 * nz * (me + mi) * 3.0
    return inner + factor + jac


def measure_matmul_peak(dtype_str: str = "float32", size: int = 4096,
                        reps: int = 6) -> float:
    """Measured sustained TFLOP/s of a large square matmul at the solver's
    ``highest`` precision — the achievable ceiling every ``pct_matmul_peak``
    figure is computed against.  ~1 s of device time.

    Transport-robust protocol (the axon tunnel defeats naive timing three
    ways — ``block_until_ready`` can return before short programs execute,
    identical (executable, input) pairs are result-cached, and saturated
    chained values revisit a cached fixed point):

    * data-DEPENDENT chain ``out = mm(out, b)`` with magnitude-preserving
      random operands (1/sqrt(size) scaling -> no saturation, no repeated
      digests) forces genuinely sequential device work;
    * the time is taken to a host-fetched SCALAR of the final result (the
      only reliable sync on this transport);
    * two chain lengths are timed and differenced, cancelling the constant
      dispatch/sync/transfer overheads: dt = (t_long - t_short)/(n_l-n_s).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(12345)
    a = jnp.asarray(rng.normal(size=(size, size)) / np.sqrt(size), dtype_str)
    b = jnp.asarray(rng.normal(size=(size, size)) / np.sqrt(size), dtype_str)

    @jax.jit
    def mm(x, y):
        with jax.default_matmul_precision("highest"):
            return x @ y

    @jax.jit
    def sm(x):
        return jnp.sum(x)

    float(sm(mm(a, b)))  # warm both programs

    def chain_time(n):
        out = a
        t0 = time.perf_counter()
        for _ in range(n):
            out = mm(out, b)
        float(sm(out))
        return time.perf_counter() - t0

    n_s, n_l = max(reps, 8), 4 * max(reps, 8)
    t_s = chain_time(n_s)
    t_l = chain_time(n_l)
    dt = max((t_l - t_s) / (n_l - n_s), 1e-9)
    return 2.0 * size**3 / dt / 1e12
