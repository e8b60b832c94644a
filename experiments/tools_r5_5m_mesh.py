#!/usr/bin/env python
"""R5 scale rehearsal: config-5 capacity (C = 5,242,880) on the 8-device
CPU mesh — the sharded step, the exchange path, and the O(N/K) memory
contract have never been instantiated at spec scale before (SCALING.md's
fit table was arithmetic).

- mesh: gauss=8 (maximal Gaussian sharding; per-device state C/8 = 655,360
  splats), gray mode, oracle rasterizer, 32x24 images (compute shrinks with
  resolution; the capacity-scaled paths — exchange, state, optimizer —
  are what this exercises).
- asserts the compiled per-device argument/output sizes reflect C/K state,
  then RUNS one real step and checks the loss is finite and state stays
  sharded.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python experiments/tools_r5_5m_mesh.py
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from event3dgs_tpu.core.camera import make_camera, stack_cameras
from event3dgs_tpu.models import init_from_point_cloud
from event3dgs_tpu.parallel.mesh import make_mesh
from event3dgs_tpu.parallel.sharded_train import (
    _is_capacity_leaf,
    make_sharded_train_step,
    shard_train_state,
)
from event3dgs_tpu.train import SceneData, init_train_state
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig

C = int(os.environ.get("CAP", 5_242_880))
K = 8
W = int(os.environ.get("W", 32))
H = int(os.environ.get("H", 24))
N_VIEWS = int(os.environ.get("VIEWS", 16))


def main():
    assert len(jax.devices()) == K, jax.devices()
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(C, 3)) * np.array([0.9, 0.6, 0.9])).astype(
        np.float32)
    cols = rng.uniform(0.1, 1.0, (C, 3)).astype(np.float32)

    cams = []
    for i in range(N_VIEWS):
        th = 2 * np.pi * i / N_VIEWS
        pos = np.array([4.0 * np.sin(th), 0.6, -4.0 * np.cos(th)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        r = np.stack([right, np.cross(fwd, right), fwd], axis=1)
        cams.append(make_camera(r, -r.T @ pos, 1.0, 0.75, W, H))
    cameras = stack_cameras(cams)
    images = jnp.asarray(rng.uniform(0, 1, (N_VIEWS, H, W, 3)), jnp.float32)

    t0 = time.perf_counter()
    params = init_from_point_cloud(pts, cols, capacity=C)
    state = init_train_state(params, spatial_lr_scale=4.4)
    state_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(state))
    print(f"C={C:,}: full state {state_bytes/2**30:.2f} GiB "
          f"(init {time.perf_counter()-t0:.0f}s)", flush=True)

    data = SceneData(cameras=cameras, images=images)
    mesh = make_mesh(K, gauss=K)
    ss = shard_train_state(state, mesh)
    step = make_sharded_train_step(
        "gray", OptimizationConfig(), EventConfig(), mesh,
        spatial_lr_scale=4.4, rasterizer="reference",
    )
    idx = jnp.arange(K, dtype=jnp.int32)
    t0 = time.perf_counter()
    ss2, m = step(ss, data, idx, idx, idx + 1, jnp.zeros(3))
    jax.block_until_ready(ss2.params.xyz)
    step_s = time.perf_counter() - t0

    # memory contract at spec scale: per-device args/outputs ~ C/K state
    expected_device_state = sum(
        (x.size // (K if _is_capacity_leaf(x, K) and x.shape[0] == C else 1))
        * x.dtype.itemsize
        for x in jax.tree.leaves(state)
    )
    data_bytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(data)) + 64
    comp = next(iter(step.compiled_cache.values()))
    ma = comp.memory_analysis()
    print(f"per-device arg bytes {ma.argument_size_in_bytes/2**30:.2f} GiB, "
          f"expected device state {expected_device_state/2**30:.2f} GiB, "
          f"full state {state_bytes/2**30:.2f} GiB", flush=True)
    assert ma.argument_size_in_bytes < (
        expected_device_state + data_bytes + state_bytes * 0.05
    )
    assert ma.argument_size_in_bytes < state_bytes / 2
    assert ma.output_size_in_bytes < expected_device_state * 1.1 + 4096

    # state stayed sharded through the step
    for leaf in jax.tree.leaves(ss2):
        if _is_capacity_leaf(leaf, K) and leaf.shape[0] == C:
            shapes = {s.data.shape[0] for s in leaf.addressable_shards}
            assert shapes == {C // K}, shapes
    loss = float(m["loss"])
    assert np.isfinite(loss)
    print(f"OK: C={C:,} gauss={K} sharded step ran in {step_s:.0f}s "
          f"(B={K} views), loss={loss:.4f}; memory contract holds at "
          f"spec scale", flush=True)


if __name__ == "__main__":
    main()
