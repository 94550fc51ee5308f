"""Parallelism layer: device mesh, sharded training, tiled rendering.

The reference has NO distributed layer (single GPU, run-nerf.py:471-474;
SURVEY.md section 2.3). This module is the additive TPU capability:
  * data-parallel ray sharding for training — the per-step ray batch is
    sharded over the mesh 'data' axis; XLA inserts the gradient all-reduce
    over ICI (the TPU-native replacement for NCCL allreduce).
  * tiled full-frame rendering — each test frame's H*W rays are sharded
    across chips and gathered back (replaces the sequential chunk loop at
    reference rendering.py:152-171).

Single-chip runs bypass this module entirely — the train step and renderer
are collective-free unless wrapped here (SURVEY.md section 5 requirement).
"""

from fsnerf_tpu.parallel.mesh import make_mesh, shard_batch, replicate
