"""Verify drive: train on the analytic sphere scene -> render a HELD-OUT
view -> score it (see .claude/skills/verify/SKILL.md). Runs on the TPU.

Also drives the Pallas render kernels (compiled, not interpret mode):
  * ops/pallas/render.py fused ray-march kernel vs the XLA path
  * ops/pallas/volrend.py compositing kernel vs ops/volrend.py
"""

import time

import jax
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

pool = pool_from_images(scene.imgs[:-1], scene.poses[:-1], scene.hwf)
state = train(model, cfg, pool, scene, log_every=500)

model_fn = make_render_model_fn(model, state.params, cfg)
frame_kw = dict(
    strategy=cfg.sampling.strategy, grid=state.grid,
    n_samples=cfg.sampling.n_samples, n_fine=cfg.sampling.n_fine,
    render_step_size=cfg.sampling.render_step_size,
    white_bkgd=True, n_compact=cfg.sampling.n_compact)
img, depth = render_frame(
    model_fn, jnp.asarray(scene.poses[-1]), scene.hwf, scene.near, scene.far,
    **frame_kw)
rgb = np.asarray(img)
gt = np.asarray(scene.imgs[-1])
m = evaluate_frames(jnp.asarray(rgb[None]), jnp.asarray(gt[None]))
print(f"held-out PSNR {m['psnr']:.2f} SSIM {m['ssim']:.3f}")

# --- fused ray-march render kernel (compiled on the TPU) ------------------
from fsnerf_tpu.ops.pallas.render import make_fused_ray_renderer

fused_fn = make_fused_ray_renderer(
    state.params, n_layers=cfg.model.n_layers, skip=tuple(cfg.model.skip),
    n_freqs=cfg.encoder.n_freqs, n_freqs_views=cfg.encoder.n_freqs_views,
    early_stop_eps=cfg.sampling.early_stop_eps)
t0 = time.perf_counter()
img_f, _ = render_frame(
    None, jnp.asarray(scene.poses[-1]), scene.hwf, scene.near, scene.far,
    fused_render_fn=fused_fn, **frame_kw)
jax.block_until_ready(img_f)
print(f"fused render compiled+ran in {time.perf_counter() - t0:.1f}s")
rgb_f = np.asarray(img_f)
m_f = evaluate_frames(jnp.asarray(rgb_f[None]), jnp.asarray(gt[None]))
diff = float(np.abs(rgb_f - rgb).max())
print(f"fused held-out PSNR {m_f['psnr']:.2f} | max|fused-xla| {diff:.4f}")
assert diff < 0.02, diff

# --- standalone volrend kernel (compiled on the TPU) ----------------------
from fsnerf_tpu.ops.pallas.volrend import volume_render_pallas
from fsnerf_tpu.ops.volrend import volume_render

rng = np.random.default_rng(0)
R, S = 1024, 192
sig = jnp.asarray(rng.normal(0, 3, (R, S)), jnp.float32)
rgbs = jnp.asarray(rng.uniform(0, 1, (R, S, 3)), jnp.float32)
t = jnp.asarray(np.sort(rng.uniform(2, 6, (R, S)), -1), jnp.float32)
dl = jnp.asarray(rng.uniform(1e-3, 0.1, (R, S)), jnp.float32)
mask = jnp.asarray(rng.uniform(size=(R, S)) > 0.4)
a = volume_render(sig, rgbs, t, dl, mask, 1.0)
b = volume_render_pallas(sig, rgbs, t, dl, mask, 1.0)
for k in ("rgb", "opacity", "depth", "weights", "trans_final"):
    # rtol covers f32 summation-order differences: the kernel's Hillis-Steele
    # scan associates differently from XLA's cumsum
    np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]),
                               rtol=1e-3, atol=1e-5, err_msg=k)
print("volrend pallas kernel == jnp on TPU")

try:
    import imageio.v2 as imageio
    imageio.imwrite("/tmp/val0.png", (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    imageio.imwrite("/tmp/val0_fused.png",
                    (np.clip(rgb_f, 0, 1) * 255).astype(np.uint8))
    imageio.imwrite("/tmp/val0_gt.png", (np.clip(gt, 0, 1) * 255).astype(np.uint8))
    print("wrote /tmp/val0.png /tmp/val0_fused.png /tmp/val0_gt.png")
except Exception as e:
    print("png save skipped:", e)

assert m["psnr"] > 25.0, m
assert m["ssim"] > 0.9, m
assert m_f["psnr"] > 25.0, m_f
print("VERIFY DRIVE OK")
