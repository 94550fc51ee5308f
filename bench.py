"""Benchmark: training throughput (rays/sec/chip) at the reference workload.

Workload = the reference's default training configuration (SURVEY.md section
6): NeRF 8x256 (skip@4, n_freqs 10/4), 1024 rays/step, occupancy grid res 128
with 5e-3 march step, Adam + exp LR decay — trained on an analytic scene in
the Blender-lego geometry regime (cameras at r~4, AABB [-1.5,1.5]^3).

Baseline: the reference publishes NO numbers (BASELINE.md); its A100
rays/sec must be measured on CUDA hardware we don't have. Anchor used here:
A100_TRAIN_RAYS_PER_SEC = 50_000 — an estimate for torch+nerfacc vanilla-NeRF
training at the reference config (~150 MFLOP effective fwd+bwd per ray after
grid pruning against A100 fp32-era NeRF MFU; see BASELINE.md measurement
plan). vs_baseline = measured / (5x50_000): the driver north star is >=5x
A100, so vs_baseline 1.0 == target met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_TRAIN_RAYS_PER_SEC = 50_000.0
TARGET_MULTIPLE = 5.0


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import (Config, DataConfig, SamplingConfig,
                                   TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.loop import train_scanned
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    batch_size = 1024
    warm_steps = 200
    bench_steps = 600

    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        sampling=SamplingConfig(strategy="occgrid", n_samples=512,
                                grid_resolution=128, grid_levels=1),
        train=TrainConfig(n_iters=warm_steps + bench_steps,
                          batch_size=batch_size, dtype="bfloat16"),
    )
    scene = SphereScene(n_imgs=8, hw=128, white_bkgd=True)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))

    step_fn = make_train_step(model, cfg, optimizer, pool, scene)
    chunk = 100
    chunk_fn = jax.jit(make_train_chunk(step_fn, chunk), donate_argnums=0)

    # compile + warmup (grid warms past its full-update phase)
    for _ in range(warm_steps // chunk):
        state, metrics = chunk_fn(state)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(bench_steps // chunk):
        state, metrics = chunk_fn(state)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    n_chips = 1  # bench runs single-chip
    rays_per_sec = bench_steps * batch_size / dt / n_chips
    vs = rays_per_sec / (TARGET_MULTIPLE * A100_TRAIN_RAYS_PER_SEC)

    # secondary metric: steady-state render throughput (stderr only; the
    # driver consumes the single stdout JSON line)
    from fsnerf_tpu.render.renderer import make_chunk_renderer
    import jax.numpy as jnp
    def model_fn(x, d=None):
        return model.apply(state.params, x, d)
    chunk_renderer = make_chunk_renderer(
        model_fn, grid=state.grid, n_samples=cfg.sampling.n_samples,
        white_bkgd=True, near=scene.near, far=scene.far,
        n_compact=cfg.sampling.n_compact)
    from fsnerf_tpu.data.rays import get_rays
    render_rays_sec = 0.0
    poses = scene.path_poses[:9]
    # compile once on the first frame's first chunk
    o, d0 = get_rays(jnp.asarray(poses[0]), scene.hwf)
    o = o.reshape(-1, 3)[:16384]; d0 = d0.reshape(-1, 3)[:16384]
    jax.block_until_ready(chunk_renderer(o, d0))
    t0 = time.perf_counter()
    n_rendered = 0
    for pose in poses[1:]:
        ro, rd = get_rays(jnp.asarray(pose), scene.hwf)
        ro = ro.reshape(-1, 3); rd = rd.reshape(-1, 3)
        n = (ro.shape[0] // 16384) * 16384
        for c in range(n // 16384):
            sl = slice(c * 16384, (c + 1) * 16384)
            out = chunk_renderer(ro[sl], rd[sl])
        jax.block_until_ready(out)
        n_rendered += n
    render_rays_sec = n_rendered / (time.perf_counter() - t0)

    final_psnr = float(jax.device_get(metrics)["psnr"])
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
    }))
    print(f"# {bench_steps} steps in {dt:.2f}s | "
          f"steps/s {bench_steps / dt:.1f} | train_psnr {final_psnr:.2f} | "
          f"render {render_rays_sec:.0f} rays/s | "
          f"baseline anchor: 5x A100@{A100_TRAIN_RAYS_PER_SEC:.0f} rays/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
