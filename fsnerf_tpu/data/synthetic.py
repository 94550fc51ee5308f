"""Procedural analytic test scene: a Lambertian-shaded sphere.

No NeRF datasets ship with this environment, so end-to-end convergence tests
and benchmarks train against an analytically ray-traced scene whose ground
truth is exact: a unit-scale sphere at the origin, colored by surface normal,
viewed from cameras on an orbit shell (same geometry regime as Blender lego:
radius ~4, near 2 / far 6, AABB [-1.5, 1.5]^3 — blender.py:104-106,140).

The public surface mirrors BlenderDataset (scene metadata + images + poses +
render path) so the training/eval stack is exercised identically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np

from fsnerf_tpu.data.poses import pose_from_spherical, spherical_path


def _numpy_get_rays(pose: np.ndarray, hwf) -> Tuple[np.ndarray, np.ndarray]:
    H, W, f = hwf
    j, i = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    dirs = np.stack([(i - W * 0.5) / f, -(j - H * 0.5) / f,
                     -np.ones_like(i)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_w = np.sum(dirs[..., None, :] * pose[:3, :3], axis=-1)
    origins = np.broadcast_to(pose[:3, 3], dirs_w.shape)
    return origins, dirs_w


def render_sphere_image(
    pose: np.ndarray,
    hwf,
    radius: float = 1.0,
    white_bkgd: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Analytically ray-trace the sphere: color = 0.5 * (normal + 1).

    Returns:
      rgb: [H, W, 3] in [0, 1]; depth: [H, W] (0 where no hit).
    """
    o, d = _numpy_get_rays(pose, hwf)
    b = np.sum(o * d, axis=-1)
    c = np.sum(o * o, axis=-1) - radius ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0
    p = o + t[..., None] * d
    n = p / radius
    rgb = 0.5 * (n + 1.0)
    bg = 1.0 if white_bkgd else 0.0
    rgb = np.where(hit[..., None], rgb, bg).astype(np.float32)
    depth = np.where(hit, t, 0.0).astype(np.float32)
    return rgb, depth


@dataclass
class SphereScene:
    """Analytic dataset with the BlenderDataset interface surface."""

    n_imgs: int = 8
    hw: int = 64
    white_bkgd: bool = True
    radius: float = 4.0311289
    seed: int = 0
    near: float = 2.0
    far: float = 6.0
    ndc: bool = False
    imgs: np.ndarray = field(init=False)
    poses: np.ndarray = field(init=False)
    depths: np.ndarray = field(init=False)
    hwf: tuple = field(init=False)
    aabb: np.ndarray = field(init=False)
    path_poses: np.ndarray = field(init=False)

    def __post_init__(self):
        H = W = self.hw
        focal = 0.5 * W / np.tan(0.5 * 0.6911112)   # lego-like 39.6 deg fov
        self.hwf = (H, W, float(focal))
        rng = np.random.default_rng(self.seed)
        thetas = rng.uniform(30.0, 75.0, self.n_imgs)
        phis = np.linspace(0.0, 360.0, self.n_imgs, endpoint=False)
        phis = phis + rng.uniform(0, 360.0 / self.n_imgs, self.n_imgs)
        self.poses = np.stack([
            pose_from_spherical(self.radius, t, p)
            for t, p in zip(thetas, phis)
        ])
        rendered = [render_sphere_image(p, self.hwf, 1.0, self.white_bkgd)
                    for p in self.poses]
        self.imgs = np.stack([r[0] for r in rendered])
        self.depths = np.stack([r[1] for r in rendered])
        self.aabb = np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], np.float32)
        self.path_poses = spherical_path(self.radius, 50.0, 12)

    def holdout(self, n: int = 2, seed: int = 1) -> "SphereScene":
        """A fresh set of views from different angles for validation."""
        return SphereScene(n_imgs=n, hw=self.hw, white_bkgd=self.white_bkgd,
                           radius=self.radius, seed=seed)
