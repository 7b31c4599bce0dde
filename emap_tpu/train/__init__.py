from emap_tpu.train.schedules import (
    cos_anneal_ratio,
    flip_saturation,
    lr_factor,
    lr_factor_geo,
)
from emap_tpu.train.state import TrainState, init_train_state
from emap_tpu.train.step import build_train_step

__all__ = [
    "cos_anneal_ratio",
    "flip_saturation",
    "lr_factor",
    "lr_factor_geo",
    "TrainState",
    "init_train_state",
    "build_train_step",
]
