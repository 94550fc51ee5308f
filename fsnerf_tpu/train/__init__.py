"""Training layer (reference: run-nerf.py train loop)."""

from fsnerf_tpu.train.state import TrainState
from fsnerf_tpu.train.step import (
    init_state,
    make_optimizer,
    make_train_chunk,
    make_train_step,
)
from fsnerf_tpu.train.loop import train, train_scanned, MetricsLogger
