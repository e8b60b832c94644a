"""Device mesh construction and canonical shardings."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GAUSS_AXIS = "gauss"


def make_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    gauss: int | None = None,
) -> Mesh:
    """Build a ("data", "gauss") mesh over the available devices.

    Defaults: all devices on the ``data`` axis (pure view-parallelism), the
    degenerate single-chip mesh when one device is present.  Pass explicit
    factors to split (e.g. ``data=2, gauss=4`` on 8 chips).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if data is None and gauss is None:
        data, gauss = n, 1
    elif data is None:
        data = n // gauss
    elif gauss is None:
        gauss = n // data
    if data * gauss != n:
        raise ValueError(f"mesh {data}x{gauss} != {n} devices")
    arr = np.array(devices).reshape(data, gauss)
    return Mesh(arr, (DATA_AXIS, GAUSS_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (view batches, images)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the gauss axis (parameter capacity dim)."""
    return NamedSharding(mesh, P(GAUSS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
