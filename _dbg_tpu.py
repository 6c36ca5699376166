import time, json, functools, numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _quadrotor_setup
from libmpc_tpu import LParameters
from libmpc_tpu.lmpc.controller import solve_body

dtype = jnp.float32
for B, pol in ((4096, True), (4096, False), (8192, False), (16384, False)):
    c = _quadrotor_setup(dtype)
    c.set_optimizer_parameters(LParameters(maximum_iteration=250, enable_warm_start=True, polish=pol))
    dims, params, prob = c.dims, c._params, c._prob

    @jax.jit
    def step(prob, x0, u0, warm_x, warm_y, have_warm):
        result, seq, sol_x, sol_y, iters = solve_body(
            dims, params, prob, x0, u0, c._y_ref, c._u_ref, c._du_ref, c._u_meas,
            warm_x, warm_y, have_warm, jnp.zeros_like(u0))
        return result, sol_x, sol_y, iters

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.05*rng.normal(size=(B,12)), dtype)
    u0 = jnp.zeros((B,4), dtype)
    wx = jnp.zeros((B,dims.nz), dtype); wy = jnp.zeros((B,dims.m), dtype)
    r, wx, wy, it = step(prob, x0, u0, wx, wy, jnp.asarray(False)); jax.block_until_ready(wx)
    r, wx, wy, it = step(prob, x0, r.cmd, wx, wy, jnp.asarray(True)); jax.block_until_ready(wx)
    ts = []
    u = r.cmd
    for _ in range(5):
        t0=time.perf_counter()
        r, wx, wy, it = step(prob, x0, u, wx, wy, jnp.asarray(True))
        jax.block_until_ready(r.cmd)
        ts.append(time.perf_counter()-t0); u = r.cmd
    golden = np.array([-0.9916, 1.74839, -0.9916, 1.74839])
    x00 = jnp.zeros((B,12), dtype)
    r0, *_ = step(prob, x00, jnp.zeros((B,4),dtype), jnp.zeros((B,dims.nz),dtype), jnp.zeros((B,dims.m),dtype), jnp.asarray(False))
    err = np.abs(np.asarray(r0.cmd[0])-golden).max()
    lat = np.mean(ts)
    print(f"B={B} polish={pol}: {lat*1e3:.1f} ms/step -> {B/lat:.0f} solves/s, iters={float(jnp.mean(it)):.0f}, cold_err={err:.1e}", flush=True)
