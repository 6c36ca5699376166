"""Subprocess-isolated UGV config grid (a faulted run wedges the tunnel
client, so every arm gets a fresh process).  Usage:

  python misc/ugv_grid.py '{"name": "...", "K": 60, "chunk": 15, "upd": {...}}'

or with no argv: runs the round-5 grid sequentially.
"""

import json
import os
import subprocess
import sys

_ARM = r"""
import dataclasses, json, sys, time
sys.path.insert(0, {repo!r})
import numpy as np, jax, jax.numpy as jnp
spec = json.loads(sys.argv[1])
import os
os.environ["LIBMPC_UGV_CHUNK"] = str(spec.get("chunk", 30))
from bench import _make_ugv, _ugv_run_chunks
dtype = jnp.float32
B, K = spec.get("B", 256), spec.get("K", 60)
c, plant, params_fn, x0, obstacles, radii, yref = _make_ugv(dtype, B)
c.set_optimizer_parameters(dataclasses.replace(c._params, **spec["upd"]))
t0 = time.perf_counter()
try:
    pieces = _ugv_run_chunks(c, plant, params_fn, x0, K)
except Exception as e:
    print(json.dumps({{"name": spec["name"], "fault": type(e).__name__}}))
    raise SystemExit(0)
wall = time.perf_counter() - t0
states = np.concatenate([np.asarray(p.states)[:, :-1] for p in pieces]
                        + [np.asarray(pieces[-1].states)[:, -1:]], axis=1)
statuses = np.concatenate([np.asarray(p.statuses) for p in pieces], axis=1)
pos = states[:, :, 0:2]
d = np.linalg.norm(pos[:, :, None, :] - np.asarray(obstacles)[None, None],
                   axis=-1).min(axis=2)
dmin = d.min(axis=1)
viol = dmin < float(radii[0]) - 1e-2
goal = np.linalg.norm(pos[:, -1] - np.asarray(yref), axis=-1) < 0.05
print(json.dumps({{
    "name": spec["name"], "B": B, "K": K,
    "avoid": round(float(1 - viol.mean()), 4),
    "goal": round(float(goal.mean()), 4),
    "success": round(float((statuses == 0).mean()), 4),
    "violators": int(viol.sum()), "wall_s": round(wall, 1),
}}))
"""

GRID = [
    {"name": "gauss_newton+rst", "chunk": 30,
     "upd": {"hessian_reg": "gauss_newton", "cold_restart_on_failure": True}},
    {"name": "pdip+gersh+rst", "chunk": 15,
     "upd": {"inner_qp": "pdip", "hessian_reg": "gershgorin",
             "cold_restart_on_failure": True}},
    {"name": "power+rst_c15", "chunk": 15,
     "upd": {"hessian_reg": "power", "cold_restart_on_failure": True}},
    {"name": "admm+eigh+rst_c15", "chunk": 15,
     "upd": {"hessian_reg": "eigh", "cold_restart_on_failure": True}},
]


def run_spec(spec, timeout=1800):
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    code = _ARM.format(repo=repo)
    try:
        out = subprocess.run([sys.executable, "-c", code, json.dumps(spec)],
                             capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(json.dumps({"name": spec["name"], "fault": "Timeout"}),
              flush=True)
        return
    printed = False
    for line in out.stdout.splitlines():
        if line.strip().startswith("{"):
            print(line.strip(), flush=True)
            printed = True
    if not printed:
        print(json.dumps({"name": spec["name"], "fault": "NoOutput",
                          "stderr": (out.stderr or "")[-200:]}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_spec(json.loads(sys.argv[1]))
    else:
        for spec in GRID:
            run_spec(spec)
