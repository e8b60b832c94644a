import time
import numpy as np
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax, jax.numpy as jnp
from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.core.transforms import quat_to_rotmat

W, H = 1920, 1080
cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
rng = np.random.default_rng(0)

def timed(name, fn, *args, iters=20):
    out = fn(*args, jnp.float32(0.0)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms")

for N in (100_000, 400_000):
    means = jnp.asarray(np.c_[rng.uniform(-3, 3, N), rng.uniform(-1.8, 1.8, N),
                              rng.uniform(2, 10, N)], jnp.float32)
    scales = jnp.asarray(rng.uniform(0.005, 0.03, (N, 3)), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, N), jnp.float32)

    @jax.jit
    def proj(m, s, r, o, eps):
        p = project_gaussians(m + eps, s, r, cam, opacities=o)
        return sum(jnp.sum(x) for x in (p.mean2d, p.depth, p.conic, p.radius))

    @jax.jit
    def quat_only(r, eps):
        return quat_to_rotmat(r + eps).sum()

    @jax.jit
    def matmuls(m, eps):
        hom = jnp.concatenate([m + eps, jnp.ones((N, 1), m.dtype)], axis=-1)
        pv = jnp.matmul(hom, cam.world_view, precision=jax.lax.Precision.HIGHEST)
        pc = jnp.matmul(hom, cam.full_proj, precision=jax.lax.Precision.HIGHEST)
        return pv.sum() + pc.sum()

    print(f"--- N={N}")
    timed("project_gaussians", proj, means, scales, rots, opac)
    timed("quat_to_rotmat", quat_only, rots)
    timed("two HIGHEST matmuls", matmuls, means)
