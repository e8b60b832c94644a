"""Event-3DGS TPU — a TPU-native event-based 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference Event-3DGS codebase (lanpokn/Event-3DGS): differentiable 3D Gaussian
splatting, event-camera training losses with a learnable contrast threshold,
grayscale and event-assisted-deblur modes, a DVS event-camera simulator, and
dataset/render/eval tooling — all designed TPU-first:

- the differentiable rasterizer is a chunked, tile-binned compositing sweep
  with static shapes (``ops/``), with Pallas kernels for the hot path and a
  pure-jnp oracle for correctness testing;
- the Gaussian model lives in fixed-capacity buffers with an alive-mask so
  densify/clone/split/prune are jit-compatible masked scatters (``models/``);
- multi-chip scaling uses ``jax.sharding`` meshes: views/event-pairs over a
  ``data`` axis and Gaussians over a ``gauss`` axis (``parallel/``).

Layout:
    core/      pure math: cameras, projection, SH, quaternions, schedules
    ops/       differentiable rasterizer (slow jnp oracle + Pallas kernels)
    models/    Gaussian parameter pytree, optimizer, densification
    data/      COLMAP/Blender/PLY readers, camera lists, synthetic scenes
    losses/    L1/SSIM (+gray), differentiable event simulation loss
    events/    event data model, file codecs, DVS simulator (JAX + C++)
    parallel/  device mesh construction and sharding rules
    train/     training loop / train-state
    cli/       train/render/eval/metrics entry points
    utils/     misc utilities (config, image io, logging)
    tools/     dataset prep and benchmark helpers
"""

__version__ = "0.1.0"
