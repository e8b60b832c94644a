"""Checkpoint round-trip/resume, capacity growth, and the GUI wire protocol.

Covers the previously-untested surfaces (VERDICT r2 items 5/8): checkpoint
save→load→resume equivalence, densify overflow→capacity growth with zero
candidate loss, and `train/network_gui.py` against a scripted fake SIBR
client speaking the reference protocol
(`/root/reference/gaussian_renderer/network_gui.py:43-86`).
"""

import json
import socket

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from event3dgs_tpu.data.synthetic import make_synthetic_scene
from event3dgs_tpu.models import init_from_point_cloud
from event3dgs_tpu.models.densify import DensifyStats
from event3dgs_tpu.models.gaussians import grow_params, num_alive
from event3dgs_tpu.train import SceneData, init_train_state, make_train_step
from event3dgs_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from event3dgs_tpu.train.loop import densify_with_growth
from event3dgs_tpu.train.state import grow_state
from event3dgs_tpu.train.step import make_densify_step
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig, TrainConfig


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(n_gaussians=30, n_views=10, width=48, height=32,
                                arc=0.4)


def trained_state(scene, n_steps=3, capacity=48):
    params = init_from_point_cloud(scene.points, scene.colors, capacity=capacity)
    state = init_train_state(params, spatial_lr_scale=scene.extent)
    data = SceneData(cameras=scene.cameras, images=scene.images,
                     event_cameras=scene.cameras, event_images=scene.images)
    step = make_train_step("event", OptimizationConfig(), EventConfig(),
                           spatial_lr_scale=scene.extent)
    for i in range(n_steps):
        state, _ = step(state, data, jnp.asarray(2 + i), jnp.asarray(2 + i),
                        jnp.asarray(3 + i), jnp.zeros(3))
    return state, data, step


class TestCheckpoint:
    def test_roundtrip_and_resume_equivalence(self, scene, tmp_path):
        state, data, step = trained_state(scene)
        path = str(tmp_path / "chkpnt3.npz")
        save_checkpoint(path, state, 3)

        template = init_train_state(
            init_from_point_cloud(scene.points, scene.colors, capacity=48),
            spatial_lr_scale=scene.extent,
        )
        loaded, it = load_checkpoint(path, template)
        assert it == 3
        # every leaf restored exactly (incl. contrast + its Adam state,
        # which the reference checkpoint forgets, train.py:71)
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(state)[0],
            jax.tree_util.tree_flatten_with_path(loaded)[0],
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(pa))

        # resume: two more identical steps from both states agree bitwise
        s_cont, s_res = state, loaded
        for i in range(2):
            s_cont, _ = step(s_cont, data, jnp.asarray(4), jnp.asarray(4),
                             jnp.asarray(5), jnp.zeros(3))
            s_res, _ = step(s_res, data, jnp.asarray(4), jnp.asarray(4),
                            jnp.asarray(5), jnp.zeros(3))
        np.testing.assert_array_equal(
            np.asarray(s_cont.params.xyz), np.asarray(s_res.params.xyz)
        )
        np.testing.assert_array_equal(
            np.asarray(s_cont.contrast), np.asarray(s_res.contrast)
        )

    def test_capacity_mismatch_raises(self, scene, tmp_path):
        state, _, _ = trained_state(scene)
        path = str(tmp_path / "c.npz")
        save_checkpoint(path, state, 1)
        template = init_train_state(
            init_from_point_cloud(scene.points, scene.colors, capacity=64),
            spatial_lr_scale=scene.extent,
        )
        with pytest.raises(ValueError, match="capacity"):
            load_checkpoint(path, template)


class TestCapacityGrowth:
    def test_grow_params_preserves_live_slots(self, scene):
        params = init_from_point_cloud(scene.points, scene.colors, capacity=48)
        grown = grow_params(params, 96)
        assert grown.capacity == 96
        np.testing.assert_array_equal(
            np.asarray(grown.xyz[:48]), np.asarray(params.xyz)
        )
        assert not bool(grown.alive[48:].any())
        # new slots must have unit-norm-able quaternions (no NaN on use)
        assert np.allclose(np.asarray(grown.rotation[48:, 0]), 1.0)
        assert int(num_alive(grown)) == int(num_alive(params))

    def test_grown_state_still_trains(self, scene):
        state, data, _ = trained_state(scene)
        state = grow_state(state, 96)
        step = make_train_step("event", OptimizationConfig(), EventConfig(),
                               spatial_lr_scale=scene.extent)
        new_state, metrics = step(state, data, jnp.asarray(2), jnp.asarray(2),
                                  jnp.asarray(3), jnp.zeros(3))
        assert np.isfinite(float(metrics["loss"]))
        assert new_state.params.capacity == 96

    def test_densify_overflow_grows_without_candidate_loss(self, scene):
        """Force more clone candidates than free slots: growth must claim
        every candidate the large-capacity control run claims."""
        params = init_from_point_cloud(scene.points, scene.colors, capacity=32)
        state = init_train_state(params, spatial_lr_scale=scene.extent)
        # every alive Gaussian is a hot clone candidate (30 alive, 2 free)
        hot = np.asarray(state.params.alive, np.float32)
        state = state.replace(stats=DensifyStats(
            grad_accum=jnp.asarray(hot * 1.0),
            denom=jnp.asarray(hot),
            max_radii2d=jnp.zeros(32),
        ))
        densify_fn = make_densify_step(OptimizationConfig(), scene.extent)
        rng = jax.random.PRNGKey(0)

        grown_state, grew = densify_with_growth(state, densify_fn, rng, False)
        assert grew
        assert grown_state.params.capacity > 32

        # control: same densify with capacity that was always sufficient
        big = init_from_point_cloud(scene.points, scene.colors,
                                    capacity=grown_state.params.capacity)
        big_state = init_train_state(big, spatial_lr_scale=scene.extent)
        hot_b = np.zeros(big.capacity, np.float32)
        hot_b[: len(hot)] = hot
        big_state = big_state.replace(stats=DensifyStats(
            grad_accum=jnp.asarray(hot_b),
            denom=jnp.asarray(hot_b),
            max_radii2d=jnp.zeros(big.capacity),
        ))
        control, overflow = densify_fn(big_state, rng, False)
        assert int(overflow) == 0
        assert int(num_alive(grown_state.params)) == int(
            num_alive(control.params)
        )


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


class TestNetworkGui:
    def test_serves_fake_sibr_client(self, scene):
        from event3dgs_tpu.core.camera import make_camera
        from event3dgs_tpu.train.network_gui import NetworkGui

        state, _, _ = trained_state(scene, n_steps=1)
        cfg = TrainConfig()
        cfg.model.source_path = "/data/test_scene"
        port = _free_port()
        gui = NetworkGui("127.0.0.1", port, state, None, cfg)
        gui.start()
        try:
            client = socket.create_connection(("127.0.0.1", port), timeout=10)
            try:
                w, h = 48, 32
                fovx, fovy = 1.0, 0.8
                cam = make_camera(np.eye(3), np.asarray([0.0, 0.0, 4.0]),
                                  fovx, fovy, w, h)
                # the client wire format negates view/proj columns 1 and 2
                # (reference network_gui.py:74-77 undoes it server-side)
                view = np.asarray(cam.world_view, np.float64).copy()
                view[:, 1] *= -1
                view[:, 2] *= -1
                proj = np.asarray(cam.full_proj, np.float64).copy()
                proj[:, 1] *= -1
                proj[:, 2] *= -1
                msg = {
                    "resolution_x": w, "resolution_y": h,
                    "train": True, "fov_y": fovy, "fov_x": fovx,
                    "z_near": 0.01, "z_far": 100.0,
                    "shs_python": False, "rot_scale_python": False,
                    "keep_alive": True, "scaling_modifier": 1.0,
                    "view_matrix": view.reshape(-1).tolist(),
                    "view_projection_matrix": proj.reshape(-1).tolist(),
                }
                payload = json.dumps(msg).encode("utf-8")
                client.sendall(len(payload).to_bytes(4, "little") + payload)

                gui.poll(state)  # one service round on the "training" side

                img = _recv_exact(client, w * h * 3)
                assert len(img) == w * h * 3
                vlen = int.from_bytes(_recv_exact(client, 4), "little")
                verify = _recv_exact(client, vlen).decode("ascii")
                assert verify == "/data/test_scene"
                # something was rendered (scene gaussians in front of cam)
                assert np.frombuffer(img, np.uint8).max() > 0

                # zero-resolution message -> verify string only, no image
                msg0 = dict(msg, resolution_x=0, resolution_y=0)
                p0 = json.dumps(msg0).encode("utf-8")
                client.sendall(len(p0).to_bytes(4, "little") + p0)
                gui.poll(state)
                vlen = int.from_bytes(_recv_exact(client, 4), "little")
                assert _recv_exact(client, vlen).decode("ascii") == \
                    "/data/test_scene"
            finally:
                client.close()
        finally:
            gui.stop()


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("server closed")
        buf += chunk
    return buf


def test_empty_model_ply_roundtrip(tmp_path):
    """A fully-pruned (0-alive) model must save/load without crashing
    (regression: reshape(0, -1) in the PLY writer)."""
    import jax.numpy as jnp

    from event3dgs_tpu.data.ply import load_gaussian_ply, save_gaussian_ply
    from event3dgs_tpu.models import init_from_point_cloud

    params = init_from_point_cloud(
        np.zeros((4, 3)), np.zeros((4, 3)), capacity=8
    )
    params = params.replace(alive=jnp.zeros(8, bool))
    path = str(tmp_path / "empty.ply")
    save_gaussian_ply(path, params)
    loaded = load_gaussian_ply(path)
    assert int(loaded.alive.sum()) == 0
