"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from event3dgs_tpu.data.synthetic import make_synthetic_scene
from event3dgs_tpu.models import init_from_point_cloud
from event3dgs_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_train_state,
)
from event3dgs_tpu.train import SceneData, init_train_state, make_train_step
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(n_gaussians=40, n_views=12, width=64, height=48,
                                arc=0.5)


def build_state(scene, capacity=64):
    params = init_from_point_cloud(scene.points, scene.colors, capacity=capacity)
    return init_train_state(params, spatial_lr_scale=scene.extent)


class TestMesh:
    def test_mesh_shapes(self):
        assert len(jax.devices()) == 8
        m = make_mesh(8)
        assert m.shape == {"data": 8, "gauss": 1}
        m = make_mesh(8, gauss=2)
        assert m.shape == {"data": 4, "gauss": 2}
        with pytest.raises(ValueError):
            make_mesh(8, data=3, gauss=3)


class TestShardedStep:
    @pytest.mark.parametrize("gauss", [1, 2])
    def test_sharded_event_step_runs(self, scene, gauss):
        mesh = make_mesh(8, gauss=gauss)
        state = shard_train_state(build_state(scene), mesh)
        data = SceneData(
            cameras=scene.cameras, images=scene.images,
            event_cameras=scene.cameras, event_images=scene.images,
        )
        with mesh:
            step = make_sharded_train_step(
                "event", OptimizationConfig(), EventConfig(), mesh,
                spatial_lr_scale=scene.extent,
            )
            b = mesh.shape["data"]
            idx = jnp.arange(b, dtype=jnp.int32) + 1
            new_state, metrics = step(state, data, idx, idx, idx + 1, jnp.zeros(3))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1
        # the parameter sharding survived the update
        shard_shapes = {
            s.data.shape for s in new_state.params.xyz.addressable_shards
        }
        if gauss == 2:
            assert all(sh[0] == state.params.capacity // 2 for sh in shard_shapes)

    def test_sharded_matches_single_device_math(self, scene):
        """A B=1 sharded step on a 1-device mesh must equal the plain step."""
        mesh = make_mesh(1)
        state = build_state(scene)
        data = SceneData(cameras=scene.cameras, images=scene.images)
        opt, ev = OptimizationConfig(), EventConfig()

        plain = make_train_step("rgb", opt, ev, spatial_lr_scale=scene.extent)
        s1, m1 = plain(state, data, jnp.asarray(3), jnp.asarray(3),
                       jnp.asarray(4), jnp.zeros(3))

        with mesh:
            sharded = make_sharded_train_step(
                "rgb", opt, ev, mesh, spatial_lr_scale=scene.extent
            )
            s2, m2 = sharded(
                state, data, jnp.asarray([3]), jnp.asarray([3]),
                jnp.asarray([4]), jnp.zeros(3),
            )
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        np.testing.assert_allclose(
            np.array(s1.params.xyz), np.array(s2.params.xyz), atol=1e-6
        )
