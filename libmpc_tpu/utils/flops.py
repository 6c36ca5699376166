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

The models are documented here once and unit-tested for structural sanity
(tests/test_utils.py::TestRooflineModels); bench.py multiplies them by
measured iteration counts so every throughput row carries FLOP/s and
bytes/s figures against the measured matmul and HBM ceilings.
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


# ---------------------------------------------------------------------------
# HBM-traffic (bytes) models — the second roofline axis (round-5 task #3).
#
# Counting rule: bytes of BATCHED (B, n)/(B, m) arrays crossing the HBM
# boundary at kernel/fusion boundaries, per instance per iteration, f32.
# Elementwise chains are assumed fused into their producing matmul's
# epilogue (XLA does this); every matmul boundary materializes its output.
# Shared (n,n)/(m,n) matrices are read once per GRID, amortized over the
# batch — negligible per instance at production batch sizes (<=1% at
# B=16384) and excluded.  The models are therefore *lower bounds* on true
# traffic (spills and non-fused epilogues add), matching the FLOP models'
# lower-bound convention: pct_hbm_peak is a floor on how close the kernel
# runs to its memory-bound light speed.
# ---------------------------------------------------------------------------


def admm_xla_iter_bytes(n: int, m: int, x_refine: bool = True,
                        itemsize: int = 4) -> float:
    """HBM bytes of one XLA-path ADMM iteration for one instance.

    Op-by-op (ops/admm.py::one_iteration): rhs build reads z,y,x,q writes
    rhs (2m+3n+n); x-update reads rhs writes xt (2n); zt=xt@A' reads xt
    writes zt (n+m); z/y/x epilogue reads zt,z,y,l,u,xt,x writes x,z,y
    (5m+2n + n+2m).  Refinement adds xt@M and the correction matmul
    (reads 3n, writes 2n).
    """
    floats = 10.0 * m + 14.0 * n
    if x_refine:
        floats += 5.0 * n
    return itemsize * floats


def admm_pallas_block_bytes(n: int, m: int, itemsize: int = 4) -> float:
    """HBM bytes of one fused-Pallas iteration BLOCK for one instance.

    The kernel (ops/admm_pallas.py) keeps the batch tile resident in VMEM
    for all ``check_termination`` iterations: per block it reads
    (x,z,y,done,q,l,u) and writes (x,z,y) exactly once — iteration-loop
    traffic is amortized over the whole block.
    """
    reads = 2.0 * n + 4.0 * m + 1.0
    writes = n + 2.0 * m
    return itemsize * (reads + writes)


def admm_check_bytes(n: int, m: int, itemsize: int = 4) -> float:
    """HBM bytes of one termination check for one instance (XLA ops).

    Three matvecs materialize Ax, Px, Aty (reads 2n+m, writes 2n+m); the
    residual/certificate pass reads Ax,z,Px,q,Aty,l,u,x,y,x_prev,y_prev
    and the infeasibility matvecs add Adx/Atdy/Pdx traffic — counted as
    ~12m + 10n reads and ~4m + 5n writes.
    """
    return itemsize * (16.0 * m + 15.0 * n)


def admm_solve_bytes(n: int, m: int, iters: float, check_every: int,
                     use_pallas: bool = True, x_refine: bool = True) -> float:
    """HBM bytes of one ADMM solve at a measured iteration count."""
    checks = max(iters / max(check_every, 1), 1.0)
    if use_pallas:
        # one block's traffic per check window, independent of how many
        # iterations the window ran (the tile stays VMEM-resident)
        iter_bytes = checks * admm_pallas_block_bytes(n, m)
    else:
        iter_bytes = iters * admm_xla_iter_bytes(n, m, x_refine)
    return iter_bytes + checks * admm_check_bytes(n, m)


def measure_hbm_peak(size_mb: int = 256, reps: int = 6) -> float:
    """Measured sustained HBM bandwidth (GB/s) of a streaming triad
    ``out = b + 0.5*out`` — the achievable ceiling every ``pct_hbm_peak``
    figure is computed against.  Uses the same transport-robust protocol
    as :func:`measure_matmul_peak`: data-dependent chain, scalar fetch
    sync, two chain lengths differenced to cancel dispatch overheads.
    Traffic per chain step: read out + read b + write out = 3 arrays.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = size_mb * 1024 * 1024 // 4
    rng = np.random.default_rng(99)
    b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    out0 = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    @jax.jit
    def triad(out, bb):
        return bb + 0.5 * out

    @jax.jit
    def sm(x):
        return x[0] + x[-1]

    float(sm(triad(out0, b)))  # warm

    def chain_time(k):
        out = out0
        t0 = time.perf_counter()
        for _ in range(k):
            out = triad(out, b)
        float(sm(out))
        return time.perf_counter() - t0

    n_s, n_l = max(reps, 8), 4 * max(reps, 8)
    t_s = chain_time(n_s)
    t_l = chain_time(n_l)
    dt = max((t_l - t_s) / (n_l - n_s), 1e-9)
    return 3.0 * n * 4 / dt / 1e9


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
