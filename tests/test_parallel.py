"""Multi-device tests on the virtual 8-device CPU mesh.

The correctness claims under test (SURVEY §2.4, SCALING.md):

- exact gauss strategy (default): the per-view projected-splat exchange
  reproduces the single-device renderer — loss, gradients, parameter
  updates, densify stats — on ANY geometry, including full-orbit (arc=2π)
  rigs where image-partials merging is provably approximate
  (TestOrbitSharding);
- partials gauss strategy (opt-in): exact on depth-separable rigs
  (layered/narrow-arc fixtures), approximate on orbits with the per-view
  rank order never worse than the scene-static order;
- batched densify stats equal the per-view sum at fixed parameters
  (regression for the round-3 replicated-tap AD inflation).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from event3dgs_tpu.core.sh import rgb_to_sh
from event3dgs_tpu.data.synthetic import make_synthetic_scene, orbit_cameras
from event3dgs_tpu.core.camera import stack_cameras
from event3dgs_tpu.models import init_from_point_cloud
from event3dgs_tpu.models.gaussians import (
    GaussianParams,
    activated,
    trainable_dict,
    with_trainable,
)
from event3dgs_tpu.ops.render import render, render_partials
from event3dgs_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    merge_depth_partials,
    repartition_by_depth,
    shard_train_state,
)
from event3dgs_tpu.parallel.mesh import GAUSS_AXIS
from event3dgs_tpu.parallel.partition import depth_partition_perm
from event3dgs_tpu.train import SceneData, init_train_state, make_train_step
from event3dgs_tpu.utils.config import EventConfig, OptimizationConfig


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(n_gaussians=40, n_views=12, width=64, height=48,
                                arc=0.5)


@pytest.fixture(scope="module")
def layered_scene():
    """Two depth-separated Gaussian clusters: the gauss=2 quantile partition
    is then exactly depth-ordered for every view, so the cross-shard merge
    must be *exact* (up to f32)."""
    rng = np.random.default_rng(7)
    near = np.c_[rng.uniform(-0.6, 0.6, 20), rng.uniform(-0.4, 0.4, 20),
                 rng.uniform(-1.5, -1.0, 20)]
    far = np.c_[rng.uniform(-0.8, 0.8, 20), rng.uniform(-0.6, 0.6, 20),
                rng.uniform(1.0, 1.6, 20)]
    points = np.concatenate([near, far], axis=0)
    colors = rng.uniform(0.1, 1.0, (40, 3))
    cams = orbit_cameras(6, radius=4.0, width=64, img_height=32, arc=0.3)
    cameras = stack_cameras(cams)
    images = jnp.asarray(rng.uniform(0, 1, (6, 32, 64, 3)), jnp.float32)
    return cameras, images, points, colors


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


class TestDepthPartition:
    def test_perm_is_valid_and_quantile_ordered(self, layered_scene):
        cameras, _, points, colors = layered_scene
        params = init_from_point_cloud(points, colors, capacity=64)
        perm = depth_partition_perm(
            np.asarray(params.xyz), np.asarray(params.alive), cameras, 2
        )
        assert sorted(perm.tolist()) == list(range(64))
        alive = np.asarray(params.alive)
        # shard 0 holds the 20 near points, shard 1 the 20 far points
        xyz = np.asarray(params.xyz)
        s0 = perm[:32][alive[perm[:32]]]
        s1 = perm[32:][alive[perm[32:]]]
        assert len(s0) == 20 and len(s1) == 20
        assert xyz[s0][:, 2].max() < xyz[s1][:, 2].min()

    def test_repartition_permutes_all_state_leaves(self, scene):
        state = build_state(scene)
        out = repartition_by_depth(state, scene.cameras, 4)
        # same multiset of parameters, alive count preserved
        assert int(out.params.alive.sum()) == int(state.params.alive.sum())
        a = np.sort(np.asarray(state.params.xyz), axis=0)
        b = np.sort(np.asarray(out.params.xyz), axis=0)
        np.testing.assert_array_equal(a, b)


class TestMergePartials:
    def test_merge_matches_sequential_compositing(self):
        """The shard_map merge must equal front-to-back over-compositing of
        the per-shard partials, including gradients through OTHER shards'
        transmittance prefixes."""
        mesh = make_mesh(8, data=1, gauss=8)
        k = 8
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.uniform(0, 0.3, (k, 4, 8, 3)), jnp.float32)
        logt = jnp.asarray(-rng.uniform(0, 1.0, (k, 4, 8)), jnp.float32)
        bg = jnp.asarray([0.2, 0.4, 0.6])

        def ref(rgb, logt):
            prefix = jnp.cumsum(logt, axis=0) - logt
            img = jnp.sum(jnp.exp(prefix)[..., None] * rgb, axis=0)
            return img + jnp.exp(logt.sum(0))[..., None] * bg[None, None, :]

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(GAUSS_AXIS), P(GAUSS_AXIS)), out_specs=P(),
        )
        def sharded(rgb, logt):
            return merge_depth_partials(rgb[0], logt[0], bg, GAUSS_AXIS, k)

        with mesh:
            np.testing.assert_allclose(
                np.asarray(sharded(rgb, logt)), np.asarray(ref(rgb, logt)),
                atol=1e-6,
            )
            loss_s = lambda r, l: jnp.sum(sharded(r, l) ** 2)
            loss_r = lambda r, l: jnp.sum(ref(r, l) ** 2)
            gs = jax.grad(loss_s, argnums=(0, 1))(rgb, logt)
            gr = jax.grad(loss_r, argnums=(0, 1))(rgb, logt)
            for a, b in zip(gs, gr):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5)


@pytest.mark.slow
class TestMemoryContract:
    def test_state_is_never_replicated_per_device(self):
        """Pin the SCALING.md promise: per-device *state* is O(N/K).

        The compiled step's per-device argument/output sizes must reflect
        the gauss-sharded state (C/K per capacity leaf), not a replicated
        O(N) copy — this test fails if someone reintroduces a full
        parameter gather into the step's inputs/outputs or re-replicates a
        capacity leaf in state_partition_specs."""
        from event3dgs_tpu.parallel.sharded_train import _is_capacity_leaf

        C, K = 8192, 8
        scene = make_synthetic_scene(
            n_gaussians=64, n_views=12, width=48, height=32, arc=0.5
        )
        params = init_from_point_cloud(
            scene.points, scene.colors, capacity=C
        )
        state = init_train_state(params, spatial_lr_scale=scene.extent)
        data = SceneData(cameras=scene.cameras, images=scene.images,
                         event_cameras=scene.cameras,
                         event_images=scene.images)
        mesh = make_mesh(8, gauss=K)
        ss = shard_train_state(state, mesh)
        step = make_sharded_train_step(
            "event", OptimizationConfig(), EventConfig(), mesh,
            spatial_lr_scale=scene.extent, rasterizer="reference",
        )
        idx = jnp.arange(8, dtype=jnp.int32) + 1
        ss2, _ = step(ss, data, idx, idx, idx + 1, jnp.zeros(3))

        # sharding survived the step: every capacity leaf is C/K per device
        for leaf in jax.tree.leaves(ss2):
            if _is_capacity_leaf(leaf, K) and leaf.shape[0] == C:
                shapes = {s.data.shape[0] for s in leaf.addressable_shards}
                assert shapes == {C // K}

        nbytes = lambda t: sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(t)
        )
        state_bytes = nbytes(state)
        expected_device_state = sum(
            (x.size // (K if _is_capacity_leaf(x, K) and x.shape[0] == C
                        else 1)) * x.dtype.itemsize
            for x in jax.tree.leaves(state)
        )
        data_bytes = nbytes(data) + 64  # replicated scene data + idx/bg
        comp = next(iter(step.compiled_cache.values()))
        ma = comp.memory_analysis()
        # per-device inputs = this shard's state + the replicated scene
        # data; a replicated parameter set would blow past full state size
        assert ma.argument_size_in_bytes < (
            expected_device_state + data_bytes + state_bytes * 0.05
        )
        assert ma.argument_size_in_bytes < state_bytes / 2
        # per-device outputs = this shard's updated state + scalar metrics
        assert ma.output_size_in_bytes < expected_device_state * 1.1 + 4096


@pytest.mark.slow
class TestShardedRenderGrads:
    def test_sharded_render_loss_and_grads_match(self, layered_scene):
        """Gauss-sharded tiled rendering + merge ≡ unsharded tiled render:
        loss and raw parameter gradients (no Adam amplification)."""
        cameras, images, points, colors = layered_scene
        params = init_from_point_cloud(points, colors, capacity=64)
        state = init_train_state(params, spatial_lr_scale=3.0)
        state = repartition_by_depth(state, cameras, 2)
        params = state.params
        mesh = make_mesh(8, gauss=2)
        bg = jnp.zeros(3)
        cam0 = jax.tree.map(lambda x: x[0], cameras)
        gt = images[0]
        tree = trainable_dict(params)

        def loss_u(tree):
            p = with_trainable(params, tree)
            act = activated(p)
            out = render(
                act.means3d, act.features, act.opacities, act.scales,
                act.rotations, cam0, bg, sh_degree=3, rasterizer="tiled",
            )
            return jnp.mean(jnp.abs(out.image - gt))

        lu, gu = jax.value_and_grad(loss_u)(tree)

        spec = jax.tree.map(lambda _: P(GAUSS_AXIS), tree)

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec, P(GAUSS_AXIS)), out_specs=P(),
        )
        def loss_s(tree, alive):
            local = GaussianParams(alive=alive, **tree)
            act = activated(local)
            pr = render_partials(
                act.means3d, act.features, act.opacities, act.scales,
                act.rotations, cam0, sh_degree=3, rasterizer="tiled",
            )
            img = merge_depth_partials(pr.rgb, pr.logt, bg, GAUSS_AXIS, 2)
            return jnp.mean(jnp.abs(img - gt))[None]

        ls, gs = jax.value_and_grad(
            lambda t: loss_s(t, params.alive)[0]
        )(tree)
        assert float(lu) == pytest.approx(float(ls), rel=1e-5)
        for k in gu:
            np.testing.assert_allclose(
                np.asarray(gs[k]), np.asarray(gu[k]), atol=2e-5,
                err_msg=f"grad mismatch in {k}",
            )


class TestShardedStep:
    @pytest.mark.parametrize(
        "gauss,gauss_mode",
        [(1, "exact"), (2, "exact"), (2, "partials")],
    )
    def test_sharded_event_step_runs(self, scene, gauss, gauss_mode):
        mesh = make_mesh(8, gauss=gauss)
        state = build_state(scene)
        if gauss_mode == "partials":
            state = repartition_by_depth(state, scene.cameras, gauss)
        state = shard_train_state(state, mesh)
        data = SceneData(
            cameras=scene.cameras, images=scene.images,
            event_cameras=scene.cameras, event_images=scene.images,
        )
        step = make_sharded_train_step(
            "event", OptimizationConfig(), EventConfig(), mesh,
            spatial_lr_scale=scene.extent, gauss_mode=gauss_mode,
        )
        # exact: every device renders its own view; partials: the gauss
        # group shares one view
        b = mesh.shape["data"] * (gauss if gauss_mode == "exact" else 1)
        idx = jnp.arange(b, dtype=jnp.int32) + 1
        new_state, metrics = step(state, data, idx, idx, idx + 1, jnp.zeros(3))
        assert np.isfinite(float(metrics["loss"]))
        # step counts reference iterations: one batched step = B views
        assert int(new_state.step) == b
        # the parameter sharding survived the update
        shard_shapes = {
            s.data.shape for s in new_state.params.xyz.addressable_shards
        }
        if gauss == 2:
            assert all(sh[0] == state.params.capacity // 2 for sh in shard_shapes)

    @pytest.mark.slow
    def test_batched_stats_match_per_view_sum(self, scene):
        """Densify stats of a batched sharded step over DISTINCT views must
        equal the sum of single-view stats at fixed parameters.

        Regression test for a round-3 bug the identical-view equivalence
        tests could not see: mesh-invariant tap zeros made shard_map AD
        psum every device's screen gradients into every device's tap
        (norm-of-sum ≈ B× inflated grad_accum → runaway densification)."""
        state0 = build_state(scene)
        data = SceneData(cameras=scene.cameras, images=scene.images,
                         event_cameras=scene.cameras,
                         event_images=scene.images)
        opt, ev = OptimizationConfig(), EventConfig()

        plain = make_train_step("event", opt, ev,
                                spatial_lr_scale=scene.extent,
                                rasterizer="tiled")
        acc = np.zeros(64)
        for v in range(2, 10):
            s, _ = plain(state0, data, jnp.asarray(v), jnp.asarray(v),
                         jnp.asarray(v + 1), jnp.zeros(3))
            acc += np.asarray(s.stats.grad_accum)

        mesh = make_mesh(8, gauss=2)
        from event3dgs_tpu.parallel import unshard_state
        ss = shard_train_state(state0, mesh)
        step = make_sharded_train_step(
            "event", opt, ev, mesh, spatial_lr_scale=scene.extent
        )
        idx = jnp.arange(2, 10, dtype=jnp.int32)
        ss, _ = step(ss, data, idx, idx, idx + 1, jnp.zeros(3))
        ssh = unshard_state(ss)
        np.testing.assert_allclose(
            np.asarray(ssh.stats.grad_accum), acc, rtol=1e-4, atol=1e-9
        )
        # every alive splat is visible in all 8 views of this scene
        assert float(ssh.stats.denom.sum()) == pytest.approx(
            8 * float(np.asarray(state0.params.alive).sum()), abs=0.1
        )

    def test_sharded_matches_single_device_math(self, scene):
        """A B=1 sharded step on a 1-device mesh must equal the plain step."""
        mesh = make_mesh(1)
        state = build_state(scene)
        data = SceneData(cameras=scene.cameras, images=scene.images)
        opt, ev = OptimizationConfig(), EventConfig()

        plain = make_train_step("rgb", opt, ev, spatial_lr_scale=scene.extent,
                                rasterizer="tiled")
        s1, m1 = plain(state, data, jnp.asarray(3), jnp.asarray(3),
                       jnp.asarray(4), jnp.zeros(3))

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
        np.testing.assert_allclose(
            np.array(s1.stats.grad_accum), np.array(s2.stats.grad_accum),
            atol=1e-6,
        )

    def test_sharded_event_step_matches_plain(self, layered_scene):
        """gauss=2, data=2, event mode vs the single-device step.

        All four devices get the SAME view, so the batched mean loss and
        its gradients equal the single-view ones, and the stats accumulate
        exactly 8 reference iterations' worth.  Parameter tolerance is
        Adam-step-sized where gradients are ~0 (first-step Adam normalizes
        any gradient to ±lr, amplifying f32-level gradient differences);
        loss/stats pin the tight comparison.
        """
        cameras, images, points, colors = layered_scene
        params = init_from_point_cloud(points, colors, capacity=64)
        state0 = init_train_state(params, spatial_lr_scale=3.0)
        data = SceneData(cameras=cameras, images=images,
                         event_cameras=cameras, event_images=images)
        opt, ev = OptimizationConfig(), EventConfig()

        plain = make_train_step("event", opt, ev, spatial_lr_scale=3.0,
                                rasterizer="tiled")
        s1, m1 = plain(state0, data, jnp.asarray(2), jnp.asarray(2),
                       jnp.asarray(3), jnp.zeros(3))

        # data=2 x gauss=2 (4 devices): same semantics as the former
        # 8-device variant at half the interpret-mode cost (suite-budget
        # trim, VERDICT r4 item 8); the 8-device mesh is still exercised
        # by the slow-marked loop/orbit tests.
        mesh = make_mesh(4, gauss=2)
        state_s = shard_train_state(state0, mesh)
        sharded = make_sharded_train_step(
            "event", opt, ev, mesh, spatial_lr_scale=3.0
        )
        idx = jnp.full((4,), 2, jnp.int32)
        s2, m2 = sharded(state_s, data, idx, idx, idx + 1, jnp.zeros(3))

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
        assert float(s1.contrast) == pytest.approx(float(s2.contrast), abs=1e-6)
        for f in ("xyz", "features_dc", "scaling", "opacity", "rotation"):
            a = np.asarray(getattr(s1.params, f))
            b = np.asarray(getattr(s2.params, f))
            np.testing.assert_allclose(a, b, atol=3e-3, err_msg=f)
        # stats: exactly B=4 single-view accumulations
        np.testing.assert_allclose(
            np.asarray(s2.stats.denom), 4 * np.asarray(s1.stats.denom),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(s2.stats.grad_accum),
            4 * np.asarray(s1.stats.grad_accum), atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(s2.stats.max_radii2d),
            np.asarray(s1.stats.max_radii2d), atol=1e-4,
        )


@pytest.mark.slow
class TestShardedLoop:
    def test_sharded_loop_trains_and_densifies(self, scene):
        """train_loop_sharded on the 8-device mesh: loss decreases, a
        densify crossing fires (host round-trip + repartition + re-shard),
        and the final state is host-usable."""
        from event3dgs_tpu.train import train_loop_sharded
        from event3dgs_tpu.train.loop import TrainCallbacks
        from event3dgs_tpu.utils.config import TrainConfig

        state = build_state(scene, capacity=64)
        data = SceneData(cameras=scene.cameras, images=scene.images,
                         event_cameras=scene.cameras,
                         event_images=scene.images)
        cfg = TrainConfig()
        cfg.pipeline.rasterizer = "tiled"
        cfg.optimization.densify_from_iter = 4
        cfg.optimization.densification_interval = 8
        # reference-default threshold: stats are NDC-scaled since the
        # round-5 grad-scale fix, so 2e-4 is now the calibrated value (the
        # old 1e-5 was tuned to the pre-fix pixel-space norms and fires on
        # every visible splat after the fix, churning the model)
        cfg.optimization.densify_grad_threshold = 2e-4
        mesh = make_mesh(8, gauss=2)
        seen = []
        cb = TrainCallbacks(
            on_metrics=lambda it, m: seen.append((it, m)), log_every=4,
        )

        # fixed view batch -> loss decrease is deterministic, not
        # sampling noise (B = data*gauss = 8 views per step in exact mode)
        fixed = jnp.asarray([2, 3, 4, 5, 6, 7, 8, 9], jnp.int32)
        res = train_loop_sharded(
            state, data, cfg, "event", scene.extent, mesh,
            iterations=64, callbacks=cb,
            view_batch_fn=lambda it: (fixed, fixed, fixed + 1),
        )
        assert len(res.history) == 8  # 64 views / B=8 per step
        assert np.isfinite(res.history).all()
        assert res.history[-1] < res.history[0]
        assert int(res.state.step) == 64
        # densify fired (grew past the 40 init splats) and stayed sane
        # (bounded well below capacity-runaway)
        n_alive = int(res.state.params.alive.sum())
        assert 40 < n_alive <= 256, n_alive


@pytest.mark.slow
class TestFourWayShards:
    def test_gauss4_render_grads_match(self):
        """4-way depth-layered shards: merge + grads still exact."""
        rng = np.random.default_rng(11)
        layers = [
            np.c_[rng.uniform(-0.6, 0.6, 10), rng.uniform(-0.4, 0.4, 10),
                  rng.uniform(z0, z0 + 0.4, 10)]
            for z0 in (-1.6, -0.6, 0.4, 1.4)
        ]
        points = np.concatenate(layers, axis=0)
        colors = rng.uniform(0.1, 1.0, (40, 3))
        cams = orbit_cameras(4, radius=4.0, width=64, img_height=32, arc=0.2)
        cameras = stack_cameras(cams)
        gt = jnp.asarray(rng.uniform(0, 1, (32, 64, 3)), jnp.float32)

        params = init_from_point_cloud(points, colors, capacity=64)
        state = init_train_state(params, spatial_lr_scale=3.0)
        state = repartition_by_depth(state, cameras, 4)
        params = state.params
        mesh = make_mesh(8, gauss=4)
        bg = jnp.asarray([0.3, 0.3, 0.3])
        cam0 = jax.tree.map(lambda x: x[0], cameras)
        tree = trainable_dict(params)

        def loss_u(tree):
            act = activated(with_trainable(params, tree))
            out = render(
                act.means3d, act.features, act.opacities, act.scales,
                act.rotations, cam0, bg, sh_degree=3, rasterizer="tiled",
            )
            return jnp.mean((out.image - gt) ** 2)

        lu, gu = jax.value_and_grad(loss_u)(tree)

        spec = jax.tree.map(lambda _: P(GAUSS_AXIS), tree)

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec, P(GAUSS_AXIS)), out_specs=P(),
        )
        def loss_s(tree, alive):
            local = GaussianParams(alive=alive, **tree)
            act = activated(local)
            pr = render_partials(
                act.means3d, act.features, act.opacities, act.scales,
                act.rotations, cam0, sh_degree=3, rasterizer="tiled",
            )
            img = merge_depth_partials(pr.rgb, pr.logt, bg, GAUSS_AXIS, 4)
            return jnp.mean((img - gt) ** 2)[None]

        ls, gs = jax.value_and_grad(
            lambda t: loss_s(t, params.alive)[0]
        )(tree)
        assert float(lu) == pytest.approx(float(ls), rel=1e-5)
        for k in gu:
            np.testing.assert_allclose(
                np.asarray(gs[k]), np.asarray(gu[k]), atol=2e-5,
                err_msg=f"grad mismatch in {k}",
            )


@pytest.mark.slow
class TestShardedTrainingEquivalence:
    def test_sharded_loop_reaches_single_device_quality(self, scene):
        """System-level equivalence: a short sharded training run (gauss=2,
        data=4) reaches the same loss region as the single-device loop on
        the same view schedule.  Not bitwise (batched Adam != sequential
        Adam), but the optimization trajectory must be healthy."""
        from event3dgs_tpu.train import train_loop, train_loop_sharded
        from event3dgs_tpu.utils.config import TrainConfig

        data = SceneData(cameras=scene.cameras, images=scene.images,
                         event_cameras=scene.cameras,
                         event_images=scene.images)
        cfg = TrainConfig(
            optimization=OptimizationConfig(
                densify_from_iter=10_000, densify_until_iter=0,
            )
        )
        cfg.pipeline.rasterizer = "tiled"

        res_single = train_loop(
            build_state(scene), data, cfg, "event", scene.extent,
            iterations=40,
        )
        mesh = make_mesh(8, gauss=2)
        fixed = jnp.asarray([3, 4, 5, 6, 7, 8, 9, 10], jnp.int32)
        res_shard = train_loop_sharded(
            build_state(scene), data, cfg, "event", scene.extent, mesh,
            iterations=40,
            view_batch_fn=lambda it: (fixed, fixed, fixed + 1),
        )
        # both runs converge: final loss below the initial loss, and the
        # sharded endpoint is in the same region as the single-device one
        assert res_single.history[-1] < res_single.history[0]
        assert res_shard.history[-1] < res_shard.history[0]
        assert res_shard.history[-1] == pytest.approx(
            res_single.history[-1], rel=0.25
        )


class TestOrbitSharding:
    """Full-orbit (arc=2π) scene — the geometry where round 3's scene-static
    shard-order merge was measurably wrong (VERDICT r3 #1).  The exact
    exchange path must match the unsharded renderer at the layered-test
    tolerance on this geometry; the partials path's error is measured and
    its per-view rank order must beat the scene-static order."""

    @pytest.fixture(scope="class")
    def orbit(self):
        scene = make_synthetic_scene(
            n_gaussians=48, n_views=8, width=64, height=48, arc=2 * np.pi
        )
        params = init_from_point_cloud(scene.points, scene.colors, capacity=64)
        return scene, params

    @pytest.mark.parametrize("gauss", [2, 4])
    def test_exact_exchange_matches_unsharded_full_orbit(self, orbit, gauss):
        """render + grads at gauss=2 and gauss=4 vs the unsharded renderer,
        ≤1e-4 (the same tolerance as the layered-scene tests), on several
        views around the full orbit."""
        from event3dgs_tpu.parallel import render_view_exchange

        scene, params = orbit
        cameras = scene.cameras
        mesh = make_mesh(8, gauss=gauss)
        bg = jnp.asarray([0.15, 0.25, 0.35])
        tree = trainable_dict(params)
        spec = jax.tree.map(lambda _: P(GAUSS_AXIS), tree)

        def loss_u(tree, view):
            cam = jax.tree.map(lambda x: x[view], cameras)
            act = activated(with_trainable(params, tree))
            out = render(
                act.means3d, act.features, act.opacities, act.scales,
                act.rotations, cam, bg, sh_degree=3, rasterizer="tiled",
            )
            return jnp.mean(jnp.abs(out.image - scene.images[view]))

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec, P(GAUSS_AXIS), P()), out_specs=P(),
        )
        def loss_s(tree, alive, view):
            local = GaussianParams(alive=alive, **tree)
            act = activated(local)
            ex = render_view_exchange(
                act.means3d, act.features, act.opacities, act.scales,
                act.rotations, cameras, view, GAUSS_AXIS, gauss, 3,
            )
            img = ex.rgb + jnp.exp(ex.logt)[:, :, None] * bg[None, None, :]
            loss = jnp.mean(jnp.abs(img - scene.images[view]))
            # every gauss peer rendered the same view here → pmean is a
            # vma-invariance marker, numerically the identity
            return jax.lax.pmean(loss, GAUSS_AXIS)[None]

        grad_u = jax.jit(jax.value_and_grad(loss_u))
        grad_s = jax.jit(
            jax.value_and_grad(lambda t, v: loss_s(t, params.alive, v)[0])
        )
        for view in (0, 3, 6):
            v = jnp.int32(view)
            lu, gu = grad_u(tree, v)
            ls, gs = grad_s(tree, v)
            assert float(lu) == pytest.approx(float(ls), rel=1e-5)
            for k in gu:
                np.testing.assert_allclose(
                    np.asarray(gs[k]), np.asarray(gu[k]), atol=1e-4,
                    err_msg=f"grad mismatch in {k} (view {view})",
                )

    def test_partials_rank_order_beats_static_order(self, orbit):
        """The partials merge is approximate on orbits; per-view depth ranks
        must not be worse than the scene-static shard order, and the error
        magnitude is pinned so regressions (and silent 'exact' claims)
        surface."""
        from event3dgs_tpu.parallel import view_depth_ranks
        from event3dgs_tpu.train import init_train_state as _init

        scene, params = orbit
        cameras = scene.cameras
        state = _init(params, spatial_lr_scale=scene.extent)
        state = repartition_by_depth(state, cameras, 2)
        rparams = state.params
        mesh = make_mesh(8, gauss=2)
        bg = jnp.zeros(3)

        @jax.jit
        def ref_img(view):
            cam = jax.tree.map(lambda x: x[view], cameras)
            act = activated(rparams)
            return render(
                act.means3d, act.features, act.opacities, act.scales,
                act.rotations, cam, bg, sh_degree=3, rasterizer="tiled",
            ).image

        @jax.jit
        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(GAUSS_AXIS),
                                   trainable_dict(rparams)),
                      P(GAUSS_AXIS), P()),
            out_specs=(P(), P()),
        )
        def both(tree, alive, view):
            cam = jax.tree.map(lambda x: x[view], cameras)
            local = GaussianParams(alive=alive, **tree)
            a = activated(local)
            pm = render_partials(
                a.means3d, a.features, a.opacities, a.scales,
                a.rotations, cam, sh_degree=3, rasterizer="tiled",
            )
            img_static = merge_depth_partials(
                pm.rgb, pm.logt, bg, GAUSS_AXIS, 2
            )
            ranks = view_depth_ranks(
                pm.depth, pm.visibility, GAUSS_AXIS, 2
            )
            img_ranked = merge_depth_partials(
                pm.rgb, pm.logt, bg, GAUSS_AXIS, 2, ranks=ranks
            )
            return img_static, img_ranked

        static_err, ranked_err = [], []
        for view in range(0, 8, 2):
            v = jnp.int32(view)
            ref = ref_img(v)
            img_s, img_r = both(trainable_dict(rparams), rparams.alive, v)
            static_err.append(float(jnp.max(jnp.abs(img_s - ref))))
            ranked_err.append(float(jnp.max(jnp.abs(img_r - ref))))

        # rank order never loses to static order, and wins somewhere
        assert all(r <= s + 1e-6 for r, s in zip(ranked_err, static_err))
        assert max(ranked_err) < max(static_err) or max(static_err) < 1e-4
        # the approximation is real on orbits — documented, not hidden
        assert max(ranked_err) < 0.1
