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
        levels covers the projected ray extents (llff.py:75-84).

        Pure NUMPY on purpose: this is host-side metadata computed at
        dataset-ingest time. The original jnp version ran dozens of EAGER
        ops on the default (axon) device — per-op remote dispatch/compile
        through the tunnel stalled ingest for 10+ minutes, and the
        full-res ray grids it pulled back (~180 MB at 20 fern-scale
        views) ride the DEVICE->HOST path that degrades to ~300 KB/s
        (measured r4, benchmarks/bench_llff.py). Parity with the jnp
        get_rays_batch/to_ndc pipeline is pinned by
        tests/test_llff_e2e.py::test_ndc_aabb_numpy_matches_jnp."""
        from fsnerf_tpu.data.synthetic import _numpy_get_rays

        H, W, focal = self.hwf
        lo = np.full(3, np.inf, np.float32)
        hi = np.full(3, -np.inf, np.float32)
        for pose in np.asarray(self.poses):
            o, d = _numpy_get_rays(pose, self.hwf)
            o, d = o.reshape(-1, 3), d.reshape(-1, 3)
            # mirror of data/rays.py::to_ndc at near=1.0
            t = -(1.0 + o[:, 2]) / d[:, 2]
            o = o + t[:, None] * d
            ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
            dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
            no = np.stack([-(2.0 * focal / W) * ox / oz,
                           -(2.0 * focal / H) * oy / oz,
                           1.0 + 2.0 / oz], axis=-1)
            nd = np.stack([-(2.0 * focal / W) * (dx / dz - ox / oz),
                           -(2.0 * focal / H) * (dy / dz - oy / oz),
                           -2.0 / oz], axis=-1)
            ends = no + nd
            lo = np.minimum(lo, np.minimum(no.min(0), ends.min(0)))
            hi = np.maximum(hi, np.maximum(no.max(0), ends.max(0)))
        return (np.concatenate([lo, hi]) / 2 ** (levels - 1)).astype(
            np.float32)
