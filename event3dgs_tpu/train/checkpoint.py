"""Training-state checkpointing.

Two artifacts, mirroring the reference (SURVEY §5 checkpoint/resume):

- **Full train state** (`chkpnt{N}.npz`): every pytree leaf of
  :class:`TrainState` — parameters + alive mask, Adam moments, densify
  stats, step, and (fixing the reference's omission, `train.py:71`) the
  learnable event contrast ``c`` and its optimizer state.
- **Inference artifact**: `point_cloud/iteration_{N}/point_cloud.ply` with
  the reference-compatible schema (see data/ply.py) — written by the caller
  via :func:`save_point_cloud`.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from event3dgs_tpu.data.ply import save_gaussian_ply
from event3dgs_tpu.train.state import TrainState


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p.name if hasattr(p, "name") else p.key) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, state: TrainState, iteration: int) -> None:
    """Write the full train state to ``{path}`` (npz + sidecar meta)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = _flatten_with_paths(state)
    np.savez_compressed(path, **arrays)
    meta = {
        "iteration": iteration,
        "capacity": state.params.capacity,
        "spatial_lr_scale": state.spatial_lr_scale,
        "max_sh_degree": state.max_sh_degree,
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, template: TrainState) -> tuple[TrainState, int]:
    """Restore a checkpoint into the structure of ``template``."""
    data = np.load(path)
    with open(path + ".json") as f:
        meta = json.load(f)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = "/".join(str(x.name if hasattr(x, "name") else x.key) for x in p)
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {key} shape {arr.shape} != template "
                f"{np.shape(leaf)} (capacity mismatch? saved capacity "
                f"{meta['capacity']})"
            )
        leaves.append(jnp.asarray(arr))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, int(meta["iteration"])


def save_point_cloud(model_path: str, iteration: int, state: TrainState) -> str:
    """Write the inference PLY at the reference layout
    (`scene/__init__.py:95-98`)."""
    out = os.path.join(
        model_path, "point_cloud", f"iteration_{iteration}", "point_cloud.ply"
    )
    save_gaussian_ply(out, state.params)
    return out


def find_max_iteration(model_path: str) -> int:
    """Latest saved iteration (reference `searchForMaxIteration`,
    `utils/system_utils.py:26-28`)."""
    d = os.path.join(model_path, "point_cloud")
    iters = [
        int(f.split("_")[-1]) for f in os.listdir(d) if f.startswith("iteration_")
    ]
    if not iters:
        raise FileNotFoundError(f"no saved iterations under {d}")
    return max(iters)
