"""Verify drive: train on the analytic sphere scene -> render a HELD-OUT
view -> score it (see .claude/skills/verify/SKILL.md). Runs on the TPU."""

import jax.numpy as jnp
import numpy as np

from fsnerf_tpu.cli import make_render_model_fn
from fsnerf_tpu.config import Config, DataConfig, SamplingConfig, TrainConfig
from fsnerf_tpu.core.models import make_model
from fsnerf_tpu.data.pool import pool_from_images
from fsnerf_tpu.data.synthetic import SphereScene
from fsnerf_tpu.eval.metrics import evaluate_frames
from fsnerf_tpu.render.renderer import render_frame
from fsnerf_tpu.train.loop import train

cfg = Config(
    data=DataConfig(dataset="sphere", white_bkgd=True),
    sampling=SamplingConfig(strategy="occgrid"),
    train=TrainConfig(n_iters=1500, batch_size=1024),
)

scene = SphereScene(n_imgs=9, hw=96)
model = make_model(cfg)

# hold out the last view
class _TrainScene:
    near, far = scene.near, scene.far
    aabb = scene.aabb

pool = pool_from_images(scene.imgs[:-1], scene.poses[:-1], scene.hwf)
state = train(model, cfg, pool, scene, log_every=500)

model_fn = make_render_model_fn(model, state.params, cfg)
img, depth = render_frame(
    model_fn, jnp.asarray(scene.poses[-1]), scene.hwf, scene.near, scene.far,
    strategy=cfg.sampling.strategy, grid=state.grid,
    n_samples=cfg.sampling.n_samples, n_fine=cfg.sampling.n_fine,
    render_step_size=cfg.sampling.render_step_size,
    white_bkgd=True, n_compact=cfg.sampling.n_compact)
rgb = np.asarray(img)
gt = np.asarray(scene.imgs[-1])
m = evaluate_frames(jnp.asarray(rgb[None]), jnp.asarray(gt[None]))
print(f"held-out PSNR {m['psnr']:.2f} SSIM {m['ssim']:.3f}")

try:
    import imageio.v2 as imageio
    imageio.imwrite("/tmp/val0.png", (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    imageio.imwrite("/tmp/val0_gt.png", (np.clip(gt, 0, 1) * 255).astype(np.uint8))
    print("wrote /tmp/val0.png /tmp/val0_gt.png")
except Exception as e:
    print("png save skipped:", e)

assert m["psnr"] > 25.0, m
assert m["ssim"] > 0.9, m
print("VERIFY DRIVE OK")
