"""Multi-host bootstrap test: 2 CPU processes × 4 virtual devices.

Spawns two worker processes that connect through ``jax.distributed``
(Gloo collectives over localhost), form the 8-device global ("data",
"gauss") mesh, and run one sharded train step.  Asserts: both processes
compute the same loss, and that loss matches a single-process run of the
identical configuration on this process's own 8-device mesh — i.e. the
sharded step's math is host-count-invariant (BASELINE "scaling 1→N
hosts").
"""

import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

WORKER = Path(__file__).parent / "_distributed_worker.py"
REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_step_matches_single_process():
    port = _free_port()
    import os

    env = dict(
        os.environ,
        PYTHONPATH=str(REPO),
        # no axon/TPU registration or grants in workers (see skills/verify)
        PALLAS_AXON_POOL_IPS="",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    losses = {}
    for out in outs:
        m = re.search(r"WORKER_RESULT (\d+) loss=([0-9.eE+-]+)", out)
        assert m, out[-2000:]
        losses[int(m.group(1))] = float(m.group(2))
    assert set(losses) == {0, 1}
    # replicated metrics must agree bit-for-bit across hosts
    assert losses[0] == losses[1]

    # single-process reference on this process's local 8-device mesh
    from event3dgs_tpu.data.synthetic import make_synthetic_scene
    from event3dgs_tpu.models import init_from_point_cloud
    from event3dgs_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        repartition_by_depth,
        shard_train_state,
    )
    from event3dgs_tpu.train import SceneData, init_train_state
    from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig

    scene = make_synthetic_scene(
        n_gaussians=40, n_views=12, width=64, height=32, arc=0.5
    )
    params = init_from_point_cloud(scene.points, scene.colors, capacity=64)
    state = init_train_state(params, spatial_lr_scale=scene.extent)
    state = repartition_by_depth(state, scene.cameras, 2)
    mesh = make_mesh(8, gauss=2)
    state = shard_train_state(state, mesh)
    data = SceneData(cameras=scene.cameras, images=scene.images)
    step = make_sharded_train_step(
        "rgb", OptimizationConfig(), EventConfig(), mesh,
        spatial_lr_scale=scene.extent,
    )
    idx = jnp.asarray([2, 3, 4, 5], jnp.int32)
    _, metrics = step(state, data, idx, idx, idx, jnp.zeros(3))
    assert losses[0] == pytest.approx(float(metrics["loss"]), rel=1e-5)
