"""Compute ops: sampling, occupancy grid, volume integration.

TPU-native replacement for the nerfacc 0.5.3 CUDA backend the reference
delegates to (SURVEY.md section 2.2). Everything is dense/static-shape: rays x
samples tensors with validity masks instead of nerfacc's ragged packed
(ray_indices, t_starts, t_ends) layout. Each hot op has a pure-jnp reference
implementation; Pallas kernels (ops/pallas/) are drop-in equivalents.
"""

from fsnerf_tpu.ops.sampling import (
    uniform_samples,
    stratified_samples,
    sample_pdf,
)
from fsnerf_tpu.ops.volrend import render_weights, composite, volume_render
from fsnerf_tpu.ops.occgrid import OccGrid
