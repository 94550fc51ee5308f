"""Blender (NeRF-synthetic) dataset loader.

Behavioral parity with reference BlenderDataset (src/nerfdata/datasets/
blender.py:72-277):
  * loads <root>/synthetic/<scene>/transforms_<split>.json + PNG frames;
    focal = 0.5 * W / tan(0.5 * camera_angle_x) (blender.py:250-252);
  * near 2.0 / far 6.0, ndc off, AABB [-1.5, 1.5]^3 (blender.py:104-106,140);
  * white-background alpha compositing rgb*a + (1-a) (blender.py:113-117);
  * few-shot K-means view selection: n_imgs clusters over camera positions,
    closest view per center (blender.py:124-137) — here with a SEEDED
    deterministic k-means (data/kmeans.py) so the benchmark split is stable;
  * spherical orbit render path: radius 4.0311289, theta 50 deg, 90 frames
    (blender.py:260-277).

Fixed reference quirks: the testimg index used an unseeded np.random.randint
(blender.py:120, broke the global seed discipline) — here it is seeded;
the positive-z pose filter read z of the rotation column not the position
(blender.py:126 `x[:, -1, -1]` on an [N,3] array is actually position z —
kept: filter poses with negative z position).

Image loading can run through the native C++ decoder when built
(fsnerf_tpu/native) and falls back to imageio.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from fsnerf_tpu.data.kmeans import select_representative_views
from fsnerf_tpu.data.poses import spherical_path


def load_images(paths, loader: str = "auto") -> np.ndarray:
    """Decode a list of image files to [N, H, W, C] float32 in [0, 1]."""
    if loader in ("auto", "native"):
        try:
            from fsnerf_tpu.native import decode_images
            return decode_images(paths)
        except Exception:
            if loader == "native":
                raise
    import imageio.v2 as iio
    return (np.stack([iio.imread(p) for p in paths], 0) / 255.0).astype(
        np.float32)


@dataclass
class BlenderDataset:
    """Few-shot Blender scene: images, poses, intrinsics, render path."""

    scene: str
    split: str = "train"
    n_imgs: Optional[int] = None
    white_bkgd: bool = False
    data_root: str = "../datasets"
    downsample: int = 1
    seed: int = 42
    near: float = 2.0
    far: float = 6.0
    ndc: bool = False

    imgs: np.ndarray = field(init=False)
    poses: np.ndarray = field(init=False)
    hwf: tuple = field(init=False)
    aabb: np.ndarray = field(init=False)
    path_poses: np.ndarray = field(init=False)
    testimg: np.ndarray = field(init=False)
    testpose: np.ndarray = field(init=False)

    def __post_init__(self):
        imgs, poses, hwf = self._load()
        self.hwf = hwf
        self.path_poses = spherical_path(4.0311289, 50.0, 90)

        if imgs.shape[-1] == 4 and self.white_bkgd:
            imgs = imgs[..., :3] * imgs[..., -1:] + (1.0 - imgs[..., -1:])
        else:
            imgs = imgs[..., :3]

        rng = np.random.default_rng(self.seed)
        idx = int(rng.integers(0, imgs.shape[0]))
        self.testimg = imgs[idx]
        self.testpose = poses[idx]

        if self.n_imgs is not None and self.n_imgs < len(imgs):
            x = poses[:, :3, 3]
            keep = x[:, -1] > 0        # drop below-ground poses
            kept_idx = np.nonzero(keep)[0]
            sel = select_representative_views(x[keep], self.n_imgs, self.seed)
            idxs = kept_idx[sel]
            imgs = imgs[idxs]
            poses = poses[idxs]

        self.imgs = imgs
        self.poses = poses
        self.aabb = np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], np.float32)

    def _load(self) -> Tuple[np.ndarray, np.ndarray, tuple]:
        path = os.path.join(self.data_root, "synthetic", self.scene)
        with open(os.path.join(path, f"transforms_{self.split}.json")) as fh:
            meta = json.load(fh)

        poses = np.stack([np.array(f["transform_matrix"], np.float32)
                          for f in meta["frames"]], 0)
        files = [os.path.join(path, f["file_path"] + ".png")
                 for f in meta["frames"]]
        imgs = load_images(files)

        if self.downsample > 1:
            d = self.downsample
            H, W = imgs.shape[1] // d, imgs.shape[2] // d
            # box-filter downsample (exact average pooling)
            imgs = imgs[:, :H * d, :W * d].reshape(
                imgs.shape[0], H, d, W, d, imgs.shape[-1]).mean((2, 4))

        H, W = imgs.shape[1:3]
        focal = 0.5 * W / np.tan(0.5 * float(meta["camera_angle_x"]))
        return imgs, poses, (H, W, float(focal))
