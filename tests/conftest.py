"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere, so this file performs
the setup at import time (pytest imports conftest first).
"""

import os

# Force CPU: the ambient environment may pin JAX_PLATFORMS to a TPU tunnel
# (e.g. "axon"); tests must be fast, local, and run on a virtual 8-device
# mesh.  Override EVENT3DGS_TEST_PLATFORM to test on real hardware.
_platform = os.environ.get("EVENT3DGS_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# pytest plugin loading may import jax._src BEFORE this conftest runs, in
# which case the jax_platforms config default was already captured from the
# ambient JAX_PLATFORMS (e.g. a TPU tunnel) — override it explicitly too.
jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", False)
