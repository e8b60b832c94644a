"""Worker process for the 2-process CPU multi-host test.

Usage: python _distributed_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; together they form the 8-device
("data", "gauss") global mesh.  Every process builds the identical scene and
state, contributes its addressable shards, runs ONE rgb-mode sharded train
step, and prints the loss — the parent test asserts cross-process agreement
and parity with a single-process run of the same configuration.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from event3dgs_tpu.parallel.distributed import (  # noqa: E402
    init_distributed,
    make_global_mesh,
    make_global_view_batch,
    process_data_ranks,
)

init_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from event3dgs_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from event3dgs_tpu.models import init_from_point_cloud  # noqa: E402
from event3dgs_tpu.parallel import (  # noqa: E402
    make_sharded_train_step,
    repartition_by_depth,
    shard_train_state,
)
from event3dgs_tpu.train import SceneData, init_train_state  # noqa: E402
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc

mesh = make_global_mesh(gauss=2)
assert mesh.shape == {"data": 2 * nproc, "gauss": 2}

scene = make_synthetic_scene(
    n_gaussians=40, n_views=12, width=64, height=32, arc=0.5
)
params = init_from_point_cloud(scene.points, scene.colors, capacity=64)
state = init_train_state(params, spatial_lr_scale=scene.extent)
state = repartition_by_depth(state, scene.cameras, 2)
state = shard_train_state(state, mesh)

# host-local data: every process holds the same replicated copy
data = jax.tree.map(np.asarray, SceneData(
    cameras=scene.cameras, images=scene.images,
))

step = make_sharded_train_step(
    "rgb", OptimizationConfig(), EventConfig(), mesh,
    spatial_lr_scale=scene.extent,
)

# per-host view sampling: this host supplies indices for its own data ranks
ranks = process_data_ranks(mesh)
local_idx = np.asarray([2 + r for r in ranks], np.int32)
idx = make_global_view_batch(mesh, local_idx)

new_state, metrics = step(state, data, idx, idx, idx, np.zeros(3))
jax.block_until_ready(new_state.params.xyz)
loss = float(metrics["loss"])
assert np.isfinite(loss)
# step counts reference iterations (views consumed): one batched step = B
assert int(new_state.step) == 2 * nproc
print(f"WORKER_RESULT {pid} loss={loss:.8f}", flush=True)
