"""Training state pytree.

Replaces the reference's scattered mutable state (torch module params, Adam
state inside the optimizer, the CUDA occupancy grid inside the estimator, the
global step counter `k` at run-nerf.py:31) with one immutable pytree that
threads through jit/scan and checkpoints atomically.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax

from fsnerf_tpu.ops.occgrid import OccGrid


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    grid: OccGrid
    step: jax.Array          # int32 scalar
    key: jax.Array           # jax.random key
