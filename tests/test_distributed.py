"""Multi-host bootstrap tests: N CPU processes forming one 8-device mesh.

Spawns worker processes that connect through ``jax.distributed`` (Gloo
collectives over localhost), form the 8-device global ("data", "gauss")
mesh, and run a short sharded training LOOP with *distinct per-host view
batches* (each host supplies indices only for its own devices through
``make_global_view_batch``), crossing a densification boundary and a log
tick — so the multi-host ``unshard_state`` (process_allgather) path and
the host densify round-trip both execute.  Asserts: all processes compute
identical results, and those match a single-process run of the identical
configuration on this process's own 8-device mesh — i.e. the sharded loop
is host-count-invariant (BASELINE "scaling 1→N hosts") at 1, 2 and 4
processes.
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


def _single_process_reference():
    """The same 24-view loop on this process's local 8-device mesh."""
    from event3dgs_tpu.data.synthetic import make_synthetic_scene
    from event3dgs_tpu.models import init_from_point_cloud
    from event3dgs_tpu.parallel import make_mesh
    from event3dgs_tpu.train import (
        SceneData,
        init_train_state,
        train_loop_sharded,
    )
    from event3dgs_tpu.utils.config import TrainConfig

    scene = make_synthetic_scene(
        n_gaussians=40, n_views=12, width=64, height=32, arc=0.5
    )
    params = init_from_point_cloud(scene.points, scene.colors, capacity=64)
    state = init_train_state(params, spatial_lr_scale=scene.extent)
    data = SceneData(cameras=scene.cameras, images=scene.images,
                     event_cameras=scene.cameras, event_images=scene.images)
    cfg = TrainConfig()
    cfg.pipeline.rasterizer = "tiled"
    cfg.optimization.densify_from_iter = 4
    cfg.optimization.densification_interval = 8
    mesh = make_mesh(8, gauss=2)
    fixed = jnp.arange(2, 10, dtype=jnp.int32)  # slot s -> view 2+s
    res = train_loop_sharded(
        state, data, cfg, "event", scene.extent, mesh,
        iterations=24,
        view_batch_fn=lambda it: (fixed, fixed, fixed),
    )
    return (
        [float(h) for h in res.history],
        float(np.abs(np.asarray(res.state.params.xyz)).sum()),
        float(np.asarray(res.state.params.opacity).sum()),
    )


@pytest.mark.slow
@pytest.mark.parametrize("nproc,devs", [(2, 4), (4, 2)])
def test_multi_process_sharded_loop_matches_single_process(nproc, devs):
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
            [sys.executable, str(WORKER), str(i), str(nproc), str(port),
             str(devs)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        m = re.search(
            r"WORKER_RESULT (\d+) hist=(\S+) xyz=(\S+) opa=(\S+)", out
        )
        assert m, out[-2000:]
        results[int(m.group(1))] = (
            [float(x) for x in m.group(2).split(",")],
            float(m.group(3)),
            float(m.group(4)),
        )
    assert set(results) == set(range(nproc))
    # replicated metrics and final state digests must agree bit-for-bit
    # across hosts (each host gathered the same global state)
    for i in range(1, nproc):
        assert results[0] == results[i]

    hist, xyz_sum, opa_sum = _single_process_reference()
    w_hist, w_xyz, w_opa = results[0]
    # Single-vs-multi-process agreement is f32-tolerance, not bitwise:
    # since the round-5 NDC grad-scale fix the densify crossing in this
    # run actually clones/splits, and the state surgery amplifies the
    # reduction-order ulps between the multi-process collectives and the
    # single-process psum (~5e-4 relative on the loss history).  The
    # strong invariant — every PROCESS computes bit-identical results —
    # is asserted above and remains exact.
    np.testing.assert_allclose(w_hist, hist, rtol=2e-3)
    # the |xyz|/opacity digests include clone/split products: one flipped
    # borderline densify decision shifts them by ~1%, so the digest bound
    # is structural (few-percent), not numeric
    assert w_xyz == pytest.approx(xyz_sum, rel=5e-2)
    assert w_opa == pytest.approx(opa_sum, rel=1e-1)
