"""Data layer: ray geometry, dataset loaders, view splitting, ray pools.

Reference counterparts: src/nerfdata/ (datasets + splitter) and the ray
helpers in src/utils/utilities.py. The torch DataLoader worker pipeline
(splitter.py:123-132) is replaced by a device-resident ray pool sampled with
jax.random — all rays for a few-shot split fit comfortably in HBM.
"""

from fsnerf_tpu.data.rays import get_rays, to_ndc, get_rays_batch
from fsnerf_tpu.data.pool import RayPool
