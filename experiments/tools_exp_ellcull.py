"""Within-process A/B of the exact ellipse-tile cull (round 4).

Cross-process bench comparisons on the TPU relay are only good to
±10-20% (PROFILE_r3 measurement discipline), so this measures, in ONE
process with randomized order:

- instance counts: radius-rect vs alpha-bbox rect vs live-after-expansion;
- full fwd+bwd step time with the cull (conic passed) vs without
  (conic=None), each at its own adaptively-sized instance cap.

Run on TPU: python experiments/tools_exp_ellcull.py
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.binning import count_instances, suggest_instance_cap
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.rasterize_tiled import rasterize_tiled

N = int(os.environ.get("BENCH_GAUSSIANS", 100_000))
W, H = 1920, 1080
ITERS = 8
REPS = 3


def scene():
    rng = np.random.default_rng(0)
    means = np.c_[rng.uniform(-3, 3, N), rng.uniform(-1.8, 1.8, N),
                  rng.uniform(2, 10, N)]
    scales = (np.exp(rng.uniform(np.log(0.005), np.log(0.03), (N, 1)))
              * rng.uniform(0.7, 1.4, (N, 3)))
    rots = rng.normal(size=(N, 4))
    # OPAQUE=1: near-opaque splats — the per-tile chunk early-out regime
    # (transmittance saturates after a few composites per pixel)
    if os.environ.get("OPAQUE", "") not in ("", "0"):
        opac = rng.uniform(0.85, 0.99, N)
    else:
        opac = rng.uniform(0.3, 0.9, N)
    colors = rng.uniform(0, 1, (N, 3))
    return map(lambda a: jnp.asarray(a, jnp.float32),
               (means, scales, rots, opac, colors))


def main():
    cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
    means, scales, rots, opac, colors = scene()
    bg = jnp.zeros(3)
    proj = jax.jit(
        lambda m, s, r, o: project_gaussians(m, s, r, cam, opacities=o)
    )(means, scales, rots, opac)

    rect = int(count_instances(proj.mean2d, proj.radius, proj.valid, W, H))
    bbox = int(count_instances(proj.mean2d, proj.radius, proj.valid, W, H,
                               conic=proj.conic, opacities=opac))
    print(f"counts: rect={rect} bbox={bbox} ({bbox/rect:.3f}x)")

    def build(use_cull):
        icap = suggest_instance_cap(bbox if use_cull else rect)

        @jax.jit
        def fwdbwd(m, s, r, o, c, eps):
            def loss(m, s, r, o, c):
                p = project_gaussians(m + eps, s, r, cam, opacities=o)
                if not use_cull:
                    p = p._replace(conic=p.conic)  # same math either way
                img = rasterize_tiled(p, c, o, bg, W, H, instance_cap=icap,
                                      interpret=False)
                return jnp.sum(img * img)

            g = jax.grad(loss, argnums=(0, 3, 4))(m, s, r, o, c)
            return jax.tree.map(lambda x: x.sum(), g)

        return fwdbwd, icap

    # NOTE rasterize_tiled always passes conic now; to A/B the cull itself
    # we monkeypatch bin_gaussians' conic argument off for the baseline.
    import event3dgs_tpu.ops.rasterize_tiled as rt
    import event3dgs_tpu.ops.binning as binning

    orig_bin = binning.bin_gaussians

    def bin_nocull(*a, **kw):
        kw["conic"] = None
        return orig_bin(*a, **kw)

    results = {"cull": [], "nocull": []}
    for rep in range(REPS):
        for name in (("cull", "nocull") if rep % 2 == 0
                     else ("nocull", "cull")):
            rt.bin_gaussians = orig_bin if name == "cull" else bin_nocull
            fwdbwd, icap = build(name == "cull")
            out = fwdbwd(means, scales, rots, opac, colors, jnp.float32(0.0))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for i in range(ITERS):
                out = fwdbwd(means, scales, rots, opac, colors,
                             jnp.float32(1e-6 * (i + 1)))
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / ITERS * 1e3
            results[name].append(dt)
            print(f"rep{rep} {name}: {dt:.2f} ms (icap={icap})")
    rt.bin_gaussians = orig_bin
    for name, ts in results.items():
        print(f"{name}: min={min(ts):.2f} med={sorted(ts)[len(ts)//2]:.2f}")


if __name__ == "__main__":
    main()
