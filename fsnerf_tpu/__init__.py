"""fsnerf_tpu — a TPU-native (JAX/XLA/Pallas) few-shot NeRF framework.

A from-scratch rebuild of the capabilities of a-lemus96/fs-nerf (PyTorch +
nerfacc/CUDA) designed for TPU hardware: dense static-shape sampling,
occupancy-grid masking, fused volume integration, mesh-sharded data-parallel
training over rays, and chip-tiled full-frame rendering.

Layer map (mirrors reference layers, re-architected):
  cli.py          — experiment driver (reference: src/run-nerf.py)
  config.py       — dataclass config + CLI (reference: src/utils/parser.py)
  data/           — datasets, splitter, rays (reference: src/nerfdata/, src/utils/utilities.py)
  render/         — ray/frame/path/video rendering (reference: src/render/rendering.py)
  core/           — models, losses, schedules (reference: src/core/)
  ops/            — sampling, occupancy grid, volume integration (reference: nerfacc CUDA)
  parallel/       — device mesh + sharding (new; no distributed layer in reference)
  train/, eval/   — train loop, metrics (reference: run-nerf.py train()/evaluation())
"""

__version__ = "0.1.0"
