"""Multi-host bootstrap: jax.distributed wiring + process-aware meshes.

The reference is strictly single-process/single-GPU (SURVEY §2.4).  The
TPU-native framework scales across hosts of a pod slice with JAX's standard
multi-controller model: every host runs the same program,
``jax.distributed.initialize`` connects them through the coordination
service, ``jax.devices()`` then lists the *global* device set, and the
``("data", "gauss")`` mesh spans all of it — collectives ride ICI within a
slice and DCN across slices, inserted by the same shard_map train step that
runs single-host (``parallel/sharded_train.py``; nothing in the step is
host-count-aware).

Data loading is per-host: each process materializes only the views its
local data-axis ranks consume and assembles global arrays with
``make_global_view_batch``.  Replicated arrays (the scene data pytree,
backgrounds) are formed with ``host_local_to_global`` from identical
per-host copies.

On TPU pods ``initialize()`` autodetects everything from the environment;
CPU/GPU clusters (and the 2-process CPU test in
``tests/test_distributed.py``) pass coordinator/process counts explicitly.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from event3dgs_tpu.parallel.mesh import DATA_AXIS, GAUSS_AXIS


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Connect this process to the cluster (idempotent).

    On TPU pods all arguments autodetect from the runtime environment; on
    CPU/GPU clusters pass them explicitly.  Must be called before any other
    JAX operation in every process of the job.
    """
    # idempotence probe that does NOT touch the XLA backend (jax.process_count
    # would initialize it, which jax.distributed.initialize forbids)
    try:
        from jax._src import distributed as _distributed

        if _distributed.global_state.client is not None:
            return  # already initialized
    except (ImportError, AttributeError):
        pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def make_global_mesh(
    data: int | None = None,
    gauss: int | None = None,
) -> Mesh:
    """A ("data", "gauss") mesh over the job's GLOBAL device set.

    Device order follows ``jax.devices()`` (process-major), so with the
    default factorization each host's local devices form consecutive data
    ranks — per-host view loading then maps 1:1 onto contiguous batch
    slices.  The gauss axis is laid out innermost (fastest-varying) so the
    compositing collectives stay within a host's ICI domain whenever
    ``gauss`` divides the local device count.
    """
    devices = jax.devices()
    n = len(devices)
    if data is None and gauss is None:
        data, gauss = n, 1
    elif data is None:
        data = n // gauss
    elif gauss is None:
        gauss = n // data
    if data * gauss != n:
        raise ValueError(f"mesh {data}x{gauss} != {n} global devices")
    arr = np.array(devices).reshape(data, gauss)
    return Mesh(arr, (DATA_AXIS, GAUSS_AXIS))


def process_data_ranks(mesh: Mesh) -> list[int]:
    """The data-axis ranks whose devices live on THIS process.

    Tells the host-side loop which global view indices this host must
    supply in each batch (partials gauss strategy: one view per data rank).
    """
    me = jax.process_index()
    mesh_devices = mesh.devices  # [data, gauss] ndarray of Devices
    ranks = [
        d for d in range(mesh_devices.shape[0])
        if any(dev.process_index == me for dev in mesh_devices[d])
    ]
    return ranks


def process_view_slots(mesh: Mesh) -> list[int]:
    """The flat (data, gauss) view slots whose devices live on THIS process.

    Under the exact gauss strategy every device renders its own view, so
    the global batch has one slot per device, flattened data-major
    (slot = data_rank · gauss + gauss_rank).  Tells the host-side loop
    which global view indices this host must supply in each batch.
    """
    me = jax.process_index()
    mesh_devices = mesh.devices  # [data, gauss] ndarray of Devices
    gauss = mesh_devices.shape[1]
    return [
        d * gauss + g
        for d in range(mesh_devices.shape[0])
        for g in range(gauss)
        if mesh_devices[d, g].process_index == me
    ]


def host_local_to_global(mesh: Mesh, spec: P, per_host_value):
    """Assemble a global array from per-host pieces.

    For replicated specs (``P()``) every host passes an identical copy; for
    data-sharded specs each host passes the rows of its own data ranks in
    rank order.  Thin wrapper over
    ``jax.make_array_from_process_local_data``.
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(per_host_value)
    )


def make_global_view_batch(
    mesh: Mesh, local_indices, gauss_mode: str = "exact"
) -> jax.Array:
    """Build the global [B] view-index batch from this host's indices.

    Exact gauss strategy (default): ``local_indices`` holds one view id per
    local *device* (the host's sampler output for
    ``process_view_slots(mesh)``) and the result shards over both mesh
    axes.  Partials strategy: one view id per local data rank
    (``process_data_ranks(mesh)``), sharded over ``data`` only.
    """
    spec = (
        P((DATA_AXIS, GAUSS_AXIS)) if gauss_mode == "exact" else P(DATA_AXIS)
    )
    local = np.asarray(local_indices, np.int32)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local
    )
