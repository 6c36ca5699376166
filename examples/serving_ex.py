"""Production-serving example: deadlines, async stats, checkpoint, failures.

Runs a quadrotor LMPC fleet the way a serving deployment would, exercising
the operational features together (no reference counterpart — the reference
is a single-process library):

* ``time_limit`` — a per-solve deadline enforced as a measured-cost
  iteration budget; deadline-stopped solves return the reference's
  time-limit status with the partial iterate;
* lazy execution stats — ``optimize`` returns right after dispatch (no
  host<->device sync per step); statuses resolve in one stacked readback
  when the stats are printed;
* checkpoint / resume — the warm-start state snapshots to disk mid-run and
  a fresh fleet resumes from it bit-identically;
* failure containment — one instance's state estimate turns NaN mid-run;
  that instance holds its last command (ResultStatus.ERROR) while the rest
  of the fleet keeps solving.

Run on any backend; on CPU set
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` for an 8-device mesh.
"""

import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from libmpc_tpu import LParameters, ResultStatus
from libmpc_tpu.parallel import mesh as mesh_lib
from libmpc_tpu.parallel.fleet import LMPCFleet
from libmpc_tpu.utils import checkpoint

from quadrotor_ex import build_controller


def main():
    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh(data=n_dev)
    controller = build_controller()
    controller.set_optimizer_parameters(LParameters(
        maximum_iteration=100, enable_warm_start=True,
        polish=True, polish_mode="shared", rho=0.01,
        time_limit=5.0,            # generous per-solve deadline: the
        # budget machinery runs (calibration, traced cap) without
        # deadline-stopping healthy instances on slow CI hosts
    ))
    controller.set_stats_mode("lazy")
    fleet = LMPCFleet(controller, mesh)

    B = 8 * n_dev
    rng = np.random.default_rng(0)
    x = 0.03 * rng.normal(size=(B, 12))
    u = np.zeros((B, 4))

    ckpt = os.path.join(tempfile.mkdtemp(), "fleet_state.npz")
    for step in range(12):
        result, stats = fleet.optimize(x, u)
        u = np.asarray(result.cmd)
        # plant step: double-integrator-ish decay toward the setpoint
        x = 0.9 * x + 0.05 * rng.normal(size=x.shape) * 0.01
        if step == 5:
            checkpoint.save_fleet(fleet, ckpt)
            print(f"[step {step}] checkpointed warm state -> {ckpt}")
        if step == 8:
            x[3] = np.nan  # instance 3's estimator fails
    statuses = np.asarray(result.status)
    held = np.asarray(result.cmd)[3]
    print(f"instance 3 status: {ResultStatus(int(statuses[3])).name} "
          f"(holds last command, |cmd|={np.abs(held).max():.3f})")
    print(f"fleet statuses: { {ResultStatus(s).name: int((statuses == s).sum()) for s in np.unique(statuses)} }")
    print(stats)  # one stacked readback resolves every lazy record

    # resume from the checkpoint in a brand-new fleet
    fleet2 = LMPCFleet(controller, mesh)
    checkpoint.load_fleet(fleet2, ckpt)
    r2, _ = fleet2.optimize(np.nan_to_num(x), u)
    print(f"resumed fleet solved: "
          f"{int(np.sum(np.asarray(r2.status) == 0))}/{B} SUCCESS")


if __name__ == "__main__":
    main()
