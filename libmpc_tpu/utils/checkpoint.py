"""Checkpoint / resume for controllers and fleets.

The reference's only persistent solver state is the warm start: OSQP
primal/dual vectors for LMPC (reference: include/mpc/LMPC.hpp:677-722) and
the shifted ``opt_vector`` for NLMPC (NLOptimizer.hpp:426-507).  For fleet
jobs that run for hours, this module snapshots that state — plus enough
metadata to refuse a mismatched restore — to a single ``.npz`` file, so a
long scenario-rollout can resume mid-trajectory after preemption.

Functional design: the checkpoint is just the pytree of warm-state arrays;
controllers expose ``save_state``/``load_state`` built on this.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree: Dict[str, Any], meta: Dict[str, Any]) -> None:
    """Save a flat dict of arrays (None values skipped) with JSON metadata."""
    arrays = {
        k: np.asarray(v) for k, v in tree.items() if v is not None
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_pytree(path: str) -> tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
    arrays = {k: data[k] for k in data.files if k != "__meta__"}
    return arrays, meta


def check_meta(meta: Dict[str, Any], expected: Dict[str, Any]) -> None:
    for key, val in expected.items():
        if meta.get(key) != val:
            raise ValueError(
                f"checkpoint mismatch on {key!r}: saved {meta.get(key)!r}, "
                f"expected {val!r}"
            )


# ---------------------------------------------------------------------------
# controller-level helpers
# ---------------------------------------------------------------------------

def save_lmpc(controller, path: str) -> None:
    """Snapshot an LMPC controller's warm-start state and last result."""
    tree = {
        "warm_x": controller._warm_x,
        "warm_y": controller._warm_y,
        "last_cmd": controller._result.cmd,
    }
    meta = {
        "kind": "lmpc",
        "dims": list(controller.dims),
    }
    save_pytree(path, tree, meta)


def load_lmpc(controller, path: str) -> None:
    arrays, meta = load_pytree(path)
    check_meta(meta, {"kind": "lmpc", "dims": list(controller.dims)})
    if "warm_x" in arrays:
        controller._warm_x = jnp.asarray(arrays["warm_x"], controller.dtype)
    if "warm_y" in arrays:
        controller._warm_y = jnp.asarray(arrays["warm_y"], controller.dtype)
    if "last_cmd" in arrays:
        import dataclasses

        controller._result = dataclasses.replace(
            controller._result,
            cmd=jnp.asarray(arrays["last_cmd"], controller.dtype),
        )


def save_nlmpc(controller, path: str) -> None:
    """Snapshot an NLMPC controller's warm-start state."""
    tree = {
        "opt_vector": controller._opt_vector,
        "current_slack": jnp.asarray(controller._current_slack),
        "last_cmd": controller._result.cmd,
    }
    meta = {
        "kind": "nlmpc",
        "dims": list(controller.dims),
        "first_iteration": bool(controller._first_iteration),
    }
    save_pytree(path, tree, meta)


def load_nlmpc(controller, path: str) -> None:
    arrays, meta = load_pytree(path)
    check_meta(meta, {"kind": "nlmpc", "dims": list(controller.dims)})
    if "opt_vector" in arrays:
        controller._opt_vector = jnp.asarray(arrays["opt_vector"], controller.dtype)
    if "current_slack" in arrays:
        controller._current_slack = jnp.asarray(
            arrays["current_slack"], controller.dtype
        )
    controller._first_iteration = meta.get("first_iteration", False)
    if "last_cmd" in arrays:
        import dataclasses

        controller._result = dataclasses.replace(
            controller._result,
            cmd=jnp.asarray(arrays["last_cmd"], controller.dtype),
        )


def save_fleet(fleet, path: str) -> None:
    """Snapshot a fleet's warm state (works for LMPCFleet and NLMPCFleet)."""
    if hasattr(fleet, "_warm_x"):
        tree = {"warm_x": fleet._warm_x, "warm_y": fleet._warm_y}
        kind = "lmpc_fleet"
    else:
        tree = {"opt_vector": fleet._opt_vector, "slack": fleet._slack}
        kind = "nlmpc_fleet"
    save_pytree(path, tree, {"kind": kind, "dims": list(fleet.controller.dims)})


def load_fleet(fleet, path: str) -> None:
    arrays, meta = load_pytree(path)
    check_meta(meta, {"dims": list(fleet.controller.dims)})
    dtype = fleet.controller.dtype
    if meta["kind"] == "lmpc_fleet":
        fleet._warm_x = jnp.asarray(arrays["warm_x"], dtype)
        fleet._warm_y = jnp.asarray(arrays["warm_y"], dtype)
    else:
        fleet._opt_vector = jnp.asarray(arrays["opt_vector"], dtype)
        fleet._slack = jnp.asarray(arrays["slack"], dtype)
