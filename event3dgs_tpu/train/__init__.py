"""Training engine: state pytree, jitted train step, host-side loop."""

from event3dgs_tpu.train.state import TrainState, init_train_state, SceneData
from event3dgs_tpu.train.step import make_train_step, make_densify_step
from event3dgs_tpu.train.loop import train_loop
from event3dgs_tpu.train.loop_sharded import train_loop_sharded

__all__ = [
    "TrainState",
    "init_train_state",
    "SceneData",
    "make_train_step",
    "make_densify_step",
    "train_loop",
    "train_loop_sharded",
]
