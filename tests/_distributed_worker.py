"""Worker process for the N-process CPU multi-host tests.

Usage: python _distributed_worker.py <process_id> <num_processes> <port>
                                     <devices_per_process>

The processes form an 8-device ("data", "gauss") global mesh (gauss=2).
Every process builds the identical scene and state, contributes its
addressable shards, supplies view indices for ITS OWN devices only
(distinct per-host batches through ``make_global_view_batch``), and runs a
short ``train_loop_sharded`` that crosses a densification boundary and a
log tick — exercising the multi-host ``unshard_state`` (process_allgather)
path.  Prints the loss history and final-state digests; the parent test
asserts cross-process agreement and parity with a single-process run of
the identical configuration.
"""

import os
import sys

pid, nproc, port, devs = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
)
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs}"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from event3dgs_tpu.parallel.distributed import (  # noqa: E402
    init_distributed,
    make_global_mesh,
    make_global_view_batch,
    process_view_slots,
)

init_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np  # noqa: E402

from event3dgs_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from event3dgs_tpu.models import init_from_point_cloud  # noqa: E402
from event3dgs_tpu.train import (  # noqa: E402
    SceneData,
    init_train_state,
    train_loop_sharded,
)
from event3dgs_tpu.train.loop import TrainCallbacks  # noqa: E402
from event3dgs_tpu.utils.config import TrainConfig  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == devs * nproc == 8

mesh = make_global_mesh(gauss=2)
assert mesh.shape == {"data": 4, "gauss": 2}

scene = make_synthetic_scene(
    n_gaussians=40, n_views=12, width=64, height=32, arc=0.5
)
params = init_from_point_cloud(scene.points, scene.colors, capacity=64)
state = init_train_state(params, spatial_lr_scale=scene.extent)

# host-local data: every process holds the same replicated copy
data = jax.tree.map(np.asarray, SceneData(
    cameras=scene.cameras, images=scene.images,
    event_cameras=scene.cameras, event_images=scene.images,
))

cfg = TrainConfig()
cfg.pipeline.rasterizer = "tiled"
cfg.optimization.densify_from_iter = 4
cfg.optimization.densification_interval = 8

# per-host view sampling: this host supplies indices for its own DEVICES
# only (exact gauss strategy: one view per device slot)
slots = process_view_slots(mesh)


def view_batch_fn(it):
    local_idx = np.asarray([2 + s for s in slots], np.int32)
    idx = make_global_view_batch(mesh, local_idx)
    return idx, idx, idx  # event pair (i, i) keeps gt deterministic

ticks = []
cb = TrainCallbacks(
    on_metrics=lambda it, m: ticks.append(it),
    on_tick=lambda it, host_state: ticks.append(-it),  # forces unshard_state
    log_every=8,
)

res = train_loop_sharded(
    state, data, cfg, "event", scene.extent, mesh,
    iterations=24, callbacks=cb, view_batch_fn=view_batch_fn,
)

assert int(res.state.step) == 24
assert len(res.history) == 3
assert any(t < 0 for t in ticks), "on_tick (unshard_state) never fired"
hist = ",".join(f"{h:.8f}" for h in res.history)
xyz_sum = float(np.abs(np.asarray(res.state.params.xyz)).sum())
opa_sum = float(np.asarray(res.state.params.opacity).sum())
print(
    f"WORKER_RESULT {pid} hist={hist} xyz={xyz_sum:.6f} opa={opa_sum:.6f}",
    flush=True,
)
