"""LLFF (forward-facing real scenes) ingest pipeline.

Behavioral parity with reference Splitter._load_llff_dataset +
postprocess_poses (src/nerfdata/utils/splitter.py:174-328) and LLFFDataset
(src/nerfdata/datasets/llff.py:16-112):
  * parse poses_bounds.npy: [N, 17] -> poses [N, 3, 5] (rotation | position |
    hwf column) + bounds [N, 2] (splitter.py:194-196);
  * images from images_8/ (downsample 8), focal scaled by 1/8
    (splitter.py:199-218);
  * column reorder [y, -x, z] from the LLFF convention to NeRF's
    (splitter.py:220-222);
  * rescale positions + bounds by 1/(min_bound * bd_factor=0.75)
    (splitter.py:311-314), recenter to the average pose (splitter.py:316-317);
  * spiral render path (data/poses.py::spiral_path <- splitter.py:338-388);
  * bounds: NDC mode near 0 / far 1; non-NDC near = 0.9*min_bound
    (llff.py:47-53);
  * NDC AABB derived from projected ray extents scaled by 2^(levels-1)
    (llff.py:75-84).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from fsnerf_tpu.data.blender import load_images
from fsnerf_tpu.data.poses import recenter_poses, spiral_path


def load_llff_scene(
    scene_dir: str,
    factor: int = 8,
    bd_factor: float = 0.75,
    recenter: bool = True,
) -> dict:
    """Load + normalize one LLFF scene directory.

    Expects `poses_bounds.npy` and `images_{factor}/`.

    Returns dict(imgs [N,H,W,3], poses [N,3,4], bounds [N,2],
    hwf, path_poses [F,3,4]).
    """
    data = np.load(os.path.join(scene_dir, "poses_bounds.npy"))
    poses = data[:, :-2].reshape([-1, 3, 5]).astype(np.float32)  # [N, 3, 5]
    bounds = data[:, -2:].astype(np.float32)                     # [N, 2]

    img_dir = os.path.join(scene_dir, f"images_{factor}")
    if not os.path.isdir(img_dir):
        raise FileNotFoundError(f"images_{factor}/ not found in {scene_dir}")
    files = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))
             if f.lower().endswith(("jpg", "jpeg", "png"))]
    if len(files) != len(poses):
        raise ValueError(
            f"{len(files)} images vs {len(poses)} poses in {scene_dir}")
    imgs = load_images(files)[..., :3]

    # refresh hwf column from actual image size; focal scaled by 1/factor
    H, W = imgs.shape[1:3]
    poses[:, 0, 4] = H
    poses[:, 1, 4] = W
    poses[:, 2, 4] = poses[:, 2, 4] / factor

    # LLFF [x_down, y_right] -> NeRF [right, up, back]: columns [y, -x, z]
    poses = np.concatenate(
        [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], axis=2)

    # rescale so the closest scene content sits near depth 1/bd_factor
    scale = 1.0 / (bounds.min() * bd_factor)
    poses[:, :3, 3] *= scale
    bounds = bounds * scale

    hwf_col = poses[0, :3, 4].copy()
    pose_mats = poses[:, :3, :4]
    if recenter:
        pose_mats = recenter_poses(pose_mats)

    path_poses = spiral_path(pose_mats, bounds)
    return {
        "imgs": imgs,
        "poses": pose_mats,
        "bounds": bounds,
        "hwf": (int(hwf_col[0]), int(hwf_col[1]), float(hwf_col[2])),
        "path_poses": path_poses,
    }


@dataclass
class LLFFDataset:
    """One split of an LLFF scene (reference llff.py:16-112).

    Rays/NDC conversion happen in the device-side pool
    (data/pool.py::pool_from_images); this object carries split images, poses,
    bounds and the occupancy-grid AABB.
    """

    imgs: np.ndarray
    poses: np.ndarray
    hwf: tuple
    min_bound: float
    max_bound: float
    white_bkgd: bool = False
    ndc: bool = True

    near: float = field(init=False)
    far: float = field(init=False)
    aabb: np.ndarray = field(init=False)

    def __post_init__(self):
        if self.ndc:
            self.near, self.far = 0.0, 1.0
            self.aabb = self._ndc_aabb()
        else:
            self.near = float(self.min_bound) * 0.9
            self.far = float(self.max_bound)
            self.aabb = np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5],
                                 np.float32)

    def _ndc_aabb(self, levels: int = 4) -> np.ndarray:
        """Base AABB sized so the occupancy grid's OUTERMOST of `levels`
        levels covers the projected ray extents (llff.py:75-84)."""
        import jax.numpy as jnp
        from fsnerf_tpu.data.rays import get_rays_batch, to_ndc

        o, d = get_rays_batch(jnp.asarray(self.poses), self.hwf)
        o = np.asarray(o).reshape(-1, 3)
        d = np.asarray(d).reshape(-1, 3)
        no, nd = to_ndc(jnp.asarray(o), jnp.asarray(d), self.hwf, 1.0)
        no, nd = np.asarray(no), np.asarray(nd)
        ends = no + nd
        lo = np.minimum(no.min(0), ends.min(0))
        hi = np.maximum(no.max(0), ends.max(0))
        return (np.concatenate([lo, hi]) / 2 ** (levels - 1)).astype(
            np.float32)
