"""CLI end-to-end test: main() over a tiny on-disk Blender scene.

Covers the full reference driver flow (run-nerf.py main()): splits -> pool ->
train -> eval metrics -> checkpoint -> camera plot -> path video frames.
Small shapes keep this tractable on the 1-core CPU backend.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fsnerf_tpu.data.poses import pose_from_spherical


@pytest.fixture(scope="module")
def blender_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets")
    scene_dir = root / "synthetic" / "clilego"
    os.makedirs(scene_dir / "train")
    H = W = 10
    frames = []
    rng = np.random.default_rng(0)
    for i in range(12):
        pose = pose_from_spherical(4.0, 30.0 + 3 * i, 30.0 * i)
        img = rng.integers(0, 255, (H, W, 4), dtype=np.uint8)
        img[..., 3] = 255
        Image.fromarray(img, "RGBA").save(scene_dir / f"train/r_{i}.png")
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": pose.tolist()})
    with open(scene_dir / "transforms_train.json", "w") as fh:
        json.dump({"camera_angle_x": 0.6911112, "frames": frames}, fh)
    return str(root)


def _patch_short_path(monkeypatch):
    """Shorten the 90-frame orbit path for test speed."""
    from fsnerf_tpu.data import blender as B
    orig = B.spherical_path
    monkeypatch.setattr(
        B, "spherical_path",
        lambda radius=4.0311289, theta_deg=50.0, frames=90:
            orig(radius, theta_deg, 2))


def test_cli_main_blender_end_to_end(blender_root, tmp_path, monkeypatch):
    _patch_short_path(monkeypatch)
    from fsnerf_tpu.cli import main

    out_dir = str(tmp_path / "out")
    rc = main([
        "--dataset", "synthetic", "--scene", "clilego",
        "--data_root", blender_root, "--n_imgs", "4",
        "--n_iters", "6", "--batch_size", "64",
        "--n_samples", "24", "--n_compact", "16",
        "--grid_resolution", "8", "--n_freqs", "3", "--n_freqs_views", "2",
        "--n_layers", "2", "--d_filter", "16", "--skip", "1",
        "--out_dir", out_dir, "--white_bkgd",
    ])
    assert rc == 0
    run_dir = os.path.join(out_dir, "nerf", "synthetic", "clilego",
                           "n_imgs_4")
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    with open(os.path.join(run_dir, "final_metrics.json")) as fh:
        metrics = json.load(fh)
    assert np.isfinite(metrics["psnr"])
    assert 0 <= metrics["ssim"] <= 1
    ckpts = os.listdir(os.path.join(run_dir, "ckpt"))
    assert ckpts, "final checkpoint written"
    video = os.listdir(os.path.join(run_dir, "video"))
    assert any(v.startswith("rgb") for v in video)

    # --render_only restores from the checkpoint (reference path was broken)
    rc = main([
        "--dataset", "synthetic", "--scene", "clilego",
        "--data_root", blender_root, "--n_imgs", "4",
        "--n_iters", "6", "--batch_size", "64",
        "--n_samples", "24", "--n_compact", "16",
        "--grid_resolution", "8", "--n_freqs", "3", "--n_freqs_views", "2",
        "--n_layers", "2", "--d_filter", "16", "--skip", "1",
        "--out_dir", out_dir, "--white_bkgd", "--render_only",
    ])
    assert rc == 0
