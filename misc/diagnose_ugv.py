"""Per-instance diagnosis of the UGV f32 obstacle violations (round-5 #1).

BENCH_r04: ``ugv_avoid_frac`` 0.957 (f32) vs 1.0 (f64 oracle) — ~4-5% of
instances enter an obstacle disk by more than the 1 cm grazing allowance on
the reference's safety-critical constraint (examples/ugv_ex.cpp:98-115).

This script answers, per violating instance:
  * how deep is the incursion (r - dmin), and at which steps;
  * did the solver FAIL around those steps (status != SUCCESS), or did it
    report success with a violating trajectory;
  * what the per-step predicted-vs-realized constraint margin was.

Run on hardware:  python misc/diagnose_ugv.py [B] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import _make_ugv, _ugv_run_chunks

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    dtype = jnp.float32
    c, plant, params_fn, x0, obstacles, radii, yref = _make_ugv(dtype, B)

    t0 = time.perf_counter()
    pieces = _ugv_run_chunks(c, plant, params_fn, x0, K)
    wall = time.perf_counter() - t0
    states = np.concatenate(
        [np.asarray(p.states)[:, :-1] for p in pieces]
        + [np.asarray(pieces[-1].states)[:, -1:]], axis=1)  # (B, K+1, 4)
    statuses = np.concatenate([np.asarray(p.statuses) for p in pieces], axis=1)
    iters = np.concatenate([np.asarray(p.iterations) for p in pieces], axis=1)

    pos = states[:, :, 0:2]
    obs = np.asarray(obstacles)
    r0 = float(np.asarray(radii)[0])
    # per-instance, per-step distance to the NEAREST obstacle
    d = np.linalg.norm(pos[:, :, None, :] - obs[None, None], axis=-1).min(axis=2)
    dmin = d.min(axis=1)  # (B,)
    viol = dmin < r0 - 1e-2
    goal = np.linalg.norm(pos[:, -1] - np.asarray(yref), axis=-1) < 0.05

    print(f"B={B} K={K} wall={wall:.1f}s rate={B*K/wall:.1f}/s")
    print(f"avoid_frac={1-viol.mean():.4f} goal_frac={goal.mean():.4f} "
          f"success_frac={(statuses == 0).mean():.4f}")
    print(f"violators: {viol.sum()} / {B}")

    fail_any = (statuses != 0).any(axis=1)
    print("\ncorrelation: instance had ANY failed solve x violated obstacle")
    for v in (False, True):
        for f in (False, True):
            n = int(((viol == v) & (fail_any == f)).sum())
            print(f"  viol={v} fail_any={f}: {n}")

    vidx = np.nonzero(viol)[0]
    print("\nper-violator detail (depth = r - dmin, in cm):")
    for i in vidx[:30]:
        steps = np.nonzero(d[i] < r0 - 1e-2)[0]
        lo, hi = steps.min(), steps.max()
        # statuses/iters on the 3 steps leading into the incursion
        s0 = max(0, lo - 3)
        st_in = statuses[i, s0:min(hi + 1, K)]
        it_in = iters[i, s0:min(hi + 1, K)]
        nfail = int((statuses[i] != 0).sum())
        print(f"  inst {i:4d}: depth {100*(r0-dmin[i]):5.2f} cm, steps "
              f"{lo}-{hi} ({len(steps)} steps), fails(total)={nfail}, "
              f"status[in]={st_in.tolist()}, iters[in]={it_in.tolist()}")

    # depth histogram of all violators
    depths = 100 * (r0 - dmin[viol])
    if len(depths):
        qs = np.quantile(depths, [0.0, 0.25, 0.5, 0.75, 0.9, 1.0])
        print(f"\nincursion depth cm quantiles [min,q25,q50,q75,q90,max]: "
              f"{np.round(qs, 2).tolist()}")
    # how close do NON-violators get? (margin distribution)
    margins = 100 * (dmin[~viol] - r0)
    qs2 = np.quantile(margins, [0.0, 0.05, 0.25, 0.5])
    print(f"non-violator clearance cm quantiles [min,q05,q25,q50]: "
          f"{np.round(qs2, 2).tolist()}")


if __name__ == "__main__":
    main()
