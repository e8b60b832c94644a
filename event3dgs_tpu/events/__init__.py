"""Event-camera subsystem: data model, codecs, DVS simulation, metrics.

TPU-native equivalent of the reference's `Event_sensor/` package (SURVEY
§2.2): a SoA event buffer, Prophesee `.dat`/CSV/HDF5 codecs, a vectorized
JAX DVS simulator (with a C++ twin in `events/native/` for bit-level parity
with the reference's `dsi` extension), event-frame accumulation, readout
arbiters, and event-stream distance metrics.
"""

from event3dgs_tpu.events.buffer import EventBuffer
from event3dgs_tpu.events.dvs_model import DvsSimulator, DvsParams
from event3dgs_tpu.events.accumulate import (
    accumulation_frame,
    polarity_frame,
    event_count_image,
)

__all__ = [
    "EventBuffer",
    "DvsSimulator",
    "DvsParams",
    "accumulation_frame",
    "polarity_frame",
    "event_count_image",
]
