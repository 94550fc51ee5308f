"""Ray geometry: pinhole ray generation and NDC projection (pure jnp).

Behavioral parity with reference src/utils/utilities.py:
  * get_rays  — utilities.py:36-82. Pinhole grid with dirs
      [(i - W/2)/f, -(j - H/2)/f, -1], **normalized to unit length**
      (utilities.py:72 — deliberate deviation from the original NeRF repo),
      rotated into world frame by the camera-to-world rotation.
  * to_ndc    — utilities.py:84-120. Shift origins to the near plane, then the
      standard NeRF NDC projection.

TPU-first notes: everything is vectorized and jit-safe; `get_rays_batch` maps
over a stack of poses in one shot (the reference loops per pose on the host,
blender.py:187).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def get_rays(
    pose: jax.Array,
    hwf: Tuple[int, int, float],
) -> Tuple[jax.Array, jax.Array]:
    """Compute world-frame ray origins/directions for one camera pose.

    Args:
      pose: [4, 4] or [3, 4] camera-to-world matrix.
      hwf: (H, W, focal) intrinsics. H, W must be static Python ints.

    Returns:
      origins: [H, W, 3] ray origins (camera center broadcast).
      dirs: [H, W, 3] unit-norm ray directions in world coordinates.
    """
    H, W, focal = hwf
    # pixel grid: i indexes width (x), j indexes height (y); shape [H, W]
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = jnp.stack(
        [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -jnp.ones_like(i)],
        axis=-1,
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rot = pose[:3, :3]
    # world dir component m = sum_k dirs_k * R[m, k]  (i.e. R @ d).
    # Elementwise multiply-sum, NOT a matmul: a 3x3 rotation on the MXU would
    # run at default (bf16-input) matmul precision and quantize ray
    # directions; the VPU form is exact f32 and just as fast at this size.
    dirs_w = jnp.sum(dirs[..., None, :] * rot, axis=-1)
    origins_w = jnp.broadcast_to(pose[:3, -1], dirs_w.shape)
    return origins_w, dirs_w


def get_rays_batch(
    poses: jax.Array,
    hwf: Tuple[int, int, float],
) -> Tuple[jax.Array, jax.Array]:
    """Vectorized get_rays over [N, 4, 4] (or [N, 3, 4]) poses.

    Returns origins/dirs of shape [N, H, W, 3].
    """
    return jax.vmap(lambda p: get_rays(p, hwf))(poses)


def to_ndc(
    rays_o: jax.Array,
    rays_d: jax.Array,
    hwf: Tuple[int, int, float],
    near: float,
) -> Tuple[jax.Array, jax.Array]:
    """Project world rays into NeRF normalized device coordinates.

    Args:
      rays_o: [..., 3] ray origins (world).
      rays_d: [..., 3] ray directions (world).
      hwf: (H, W, focal).
      near: near-plane distance (reference uses 1.0 for LLFF).

    Returns:
      (ndc_o, ndc_d): [..., 3] each.
    """
    H, W, focal = hwf
    # shift origins to the near plane
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    o0 = -1.0 / (W / (2.0 * focal)) * ox / oz
    o1 = -1.0 / (H / (2.0 * focal)) * oy / oz
    o2 = 1.0 + 2.0 * near / oz

    d0 = -1.0 / (W / (2.0 * focal)) * (dx / dz - ox / oz)
    d1 = -1.0 / (H / (2.0 * focal)) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    ndc_o = jnp.stack([o0, o1, o2], axis=-1)
    ndc_d = jnp.stack([d0, d1, d2], axis=-1)
    return ndc_o, ndc_d


def ray_aabb_intersect(
    rays_o: jax.Array,
    rays_d: jax.Array,
    aabb: jax.Array,
    near: float = 0.0,
    far: float = 1e10,
) -> Tuple[jax.Array, jax.Array]:
    """Slab-method ray/AABB intersection, clamped to [near, far].

    Replaces the implicit clipping done by nerfacc's grid traversal
    (reference rendering.py:66-74 marches with near_plane=0, far_plane=1e10 and
    the occupancy grid's ROI bounds the samples).

    Args:
      rays_o: [..., 3]; rays_d: [..., 3]; aabb: [6] (xmin,ymin,zmin,xmax,ymax,zmax).

    Returns:
      (t_min, t_max): [...] entry/exit distances; t_min > t_max means a miss.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) > 1e-10, rays_d,
                            jnp.where(rays_d >= 0, 1e-10, -1e-10))
    t0 = (aabb[:3] - rays_o) * inv_d
    t1 = (aabb[3:] - rays_o) * inv_d
    t_small = jnp.minimum(t0, t1)
    t_big = jnp.maximum(t0, t1)
    t_min = jnp.maximum(jnp.max(t_small, axis=-1), near)
    t_max = jnp.minimum(jnp.min(t_big, axis=-1), far)
    return t_min, t_max
