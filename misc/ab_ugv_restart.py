"""Hardware A/B (round-5 #1): UGV obstacle violations vs failure recovery.

Arms:
  A: escalating IPM cap (30/60) only
  B: escalation + cold_restart_on_failure (failed lanes drop their warm
     start next step)

Each arm runs the full 150-step closed loop at B=256 and reports
avoid/goal/success fractions.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def run_arm(name, restart, ii=0, ir=0, max_iter=None, B=256, K=150):
    from bench import _make_ugv, _ugv_run_chunks

    dtype = jnp.float32
    c, plant, params_fn, x0, obstacles, radii, yref = _make_ugv(dtype, B)
    upd = dict(cold_restart_on_failure=restart, inner_iters=ii,
               inner_iters_recovery=ir)
    if max_iter:
        upd["maximum_iteration"] = max_iter
    c.set_optimizer_parameters(dataclasses.replace(c._params, **upd))
    t0 = time.perf_counter()
    pieces = _ugv_run_chunks(c, plant, params_fn, x0, K)
    wall = time.perf_counter() - t0
    states = np.concatenate(
        [np.asarray(p.states)[:, :-1] for p in pieces]
        + [np.asarray(pieces[-1].states)[:, -1:]], axis=1)
    statuses = np.concatenate([np.asarray(p.statuses) for p in pieces], axis=1)
    pos = states[:, :, 0:2]
    obs = np.asarray(obstacles)
    r0 = float(np.asarray(radii)[0])
    d = np.linalg.norm(pos[:, :, None, :] - obs[None, None], axis=-1).min(axis=2)
    dmin = d.min(axis=1)
    viol = dmin < r0 - 1e-2
    goal = np.linalg.norm(pos[:, -1] - np.asarray(yref), axis=-1) < 0.05
    print(f"{name}: avoid={1-viol.mean():.4f} goal={goal.mean():.4f} "
          f"success={(statuses == 0).mean():.4f} violators={int(viol.sum())} "
          f"wall={wall:.1f}s rate~{B*K/wall:.1f}/s", flush=True)
    if viol.any():
        depths = 100 * (r0 - dmin[viol])
        print(f"  depths cm: {np.round(np.sort(depths), 2).tolist()}",
              flush=True)


if __name__ == "__main__":
    run_arm("A esc-only         ", restart=False)
    run_arm("B esc+cold-restart ", restart=True)
