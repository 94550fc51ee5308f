"""LLFF/NDC (BASELINE.json config 5) throughput at TPU scale.

VERDICT r3 item 5: the levels=4 NDC pipeline was covered only by tiny CPU
fixtures — the 4-level occupancy query unroll (ops/occgrid.py), the NDC AABB
sizing (data/llff.py:120-135), and the auto query plan at NDC cell sizes had
zero measured TPU behavior. No real LLFF data exists in this environment, so
this builds a FULL-RES synthetic LLFF-shaped scene (378x504 images_8 +
poses_bounds.npy — the fern geometry regime) whose content is multi-view
consistent (analytically ray-traced spheres + a checkered back wall in the
POSTPROCESSED camera frame), then runs the exact product pipeline on it:
Splitter ingest -> K-means splits -> NDC ray pool -> levels-4 occupancy grid
-> default flagship training (8x256, 1024 rays/step, adaptive compaction) ->
full-frame NDC rendering.

Reference semantics exercised: splitter.py:174-328 (poses_bounds parse,
rescale/recenter), llff.py:75-84 (NDC AABB from ray extents),
run-nerf.py:92-93 (nlvl=4 for llff).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bench_llff.py
Prints JSON lines: llff_train_rays_per_sec, llff_render_rays_per_sec.
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np


def _write_poses_bounds(scene_dir, n_views, H, W, focal, rng):
    """poses_bounds.npy in the RAW LLFF convention such that the loader's
    column reorder [y, -x, z] (data/llff.py:65-67) lands on NeRF-convention
    forward-facing cameras looking along -z with jittered positions."""
    rows = []
    for _ in range(n_views):
        # desired NeRF-convention c2w: identity rotation + jittered position
        r = np.array([1.0, 0, 0], np.float32)      # right
        u = np.array([0, 1.0, 0], np.float32)      # up
        b = np.array([0, 0, 1.0], np.float32)      # back (camera looks -z)
        t = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.35, 0.35),
                      rng.uniform(-0.1, 0.1)], np.float32)
        # invert the loader reorder: raw_col0 = -u, raw_col1 = r
        raw = np.stack([-u, r, b, t, [H, W, focal]], axis=1)  # [3, 5]
        rows.append(np.concatenate([raw.flatten(), [2.0, 12.0]]))
    np.save(os.path.join(scene_dir, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))


def _trace_scene(o, d, far):
    """Analytic forward-facing content in the postprocessed frame: three
    Lambertian spheres at staggered depths + a checkered wall at z=-0.93*far.
    Returns rgb [H, W, 3] float in [0, 1]."""
    spheres = [  # (center, radius)
        (np.array([-0.9, -0.3, -2.2], np.float32), 0.55),
        (np.array([0.8, 0.4, -3.6], np.float32), 0.9),
        (np.array([-0.2, -0.8, -5.4], np.float32), 1.3),
    ]
    t_hit = np.full(o.shape[:-1], np.inf, np.float32)
    rgb = np.zeros((*o.shape[:-1], 3), np.float32)
    for c, r in spheres:
        oc = o - c
        b = np.sum(oc * d, axis=-1)
        q = np.sum(oc * oc, axis=-1) - r * r
        disc = b * b - q
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        hit = (disc > 0) & (t > 0) & (t < t_hit)
        p = o + t[..., None] * d
        n = (p - c) / r
        col = 0.5 * (n + 1.0)
        rgb = np.where(hit[..., None], col, rgb)
        t_hit = np.where(hit, t, t_hit)
    # back wall
    zw = -0.93 * far
    tw = (zw - o[..., 2]) / d[..., 2]
    wall_hit = (tw > 0) & (tw < t_hit)
    pw = o + tw[..., None] * d
    checker = ((np.floor(pw[..., 0] * 1.5) + np.floor(pw[..., 1] * 1.5))
               % 2).astype(np.float32)
    wall_col = np.stack([0.25 + 0.5 * checker,
                         0.35 + 0.3 * checker,
                         0.55 - 0.2 * checker], axis=-1)
    rgb = np.where(wall_hit[..., None], wall_col, rgb)
    return np.clip(rgb, 0.0, 1.0)


def build_scene(root, n_views=20, H=378, W=504, focal=407.0):
    """Write root/llff/synthfern/ (poses_bounds.npy + images_8/). Two-pass:
    poses first, then images traced through the loader's own postprocessed
    poses so the multi-view content is exactly consistent with what the
    pipeline reconstructs."""
    from PIL import Image

    from fsnerf_tpu.data.llff import load_llff_scene
    from fsnerf_tpu.data.synthetic import _numpy_get_rays

    scene_dir = os.path.join(root, "llff", "synthfern")
    img_dir = os.path.join(scene_dir, "images_8")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(3)
    _write_poses_bounds(scene_dir, n_views, H * 8, W * 8, focal * 8, rng)
    # pass 1: placeholder images so the loader can run
    blank = np.zeros((H, W, 3), np.uint8)
    for i in range(n_views):
        Image.fromarray(blank).save(os.path.join(img_dir, f"im_{i:03d}.png"))
    scene = load_llff_scene(scene_dir)
    far = float(scene["bounds"].max())
    # pass 2: trace the real images in the postprocessed frame
    for i, pose in enumerate(scene["poses"]):
        o, d = _numpy_get_rays(pose, scene["hwf"])
        rgb = _trace_scene(o, d, far)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"im_{i:03d}.png"))
    return scene_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/llff_bench")
    ap.add_argument("--n_views", type=int, default=20)
    ap.add_argument("--n_imgs", type=int, default=12)
    ap.add_argument("--warm", type=int, default=1200)
    ap.add_argument("--bench", type=int, default=400)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import (Config, DataConfig, SamplingConfig,
                                   TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.splitter import Splitter
    from fsnerf_tpu.ops.occgrid import resolve_query_plan
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    if args.rebuild and os.path.isdir(args.root):
        shutil.rmtree(args.root)
    if not os.path.isdir(os.path.join(args.root, "llff", "synthfern")):
        t0 = time.perf_counter()
        build_scene(args.root, n_views=args.n_views)
        print(f"# scene built in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

    cfg = Config(
        data=DataConfig(dataset="llff", scene="synthfern",
                        data_root=args.root, n_imgs=args.n_imgs),
        sampling=SamplingConfig(strategy="occgrid", n_samples=512,
                                grid_resolution=128, grid_levels=4),
        train=TrainConfig(n_iters=args.warm + args.bench, batch_size=1024,
                          dtype="bfloat16"),
    )
    sp = Splitter("llff", "synthfern", n_training_views=args.n_imgs,
                  data_root=args.root, seed=0)
    sp.split()
    train_split, val_split, _ = sp.get_splits()
    assert train_split.ndc
    stride, dil = resolve_query_plan(cfg.sampling, train_split.aabb)
    print(f"# ndc aabb {np.asarray(train_split.aabb).round(3).tolist()} "
          f"query plan stride {stride} dilation {dil}",
          file=sys.stderr, flush=True)

    model = make_model(cfg)
    pool = pool_from_images(train_split.imgs, train_split.poses,
                            train_split.hwf, ndc=True)
    optimizer = make_optimizer(cfg)
    state = init_state(model, cfg, optimizer, train_split.aabb,
                       jax.random.key(0))

    chunk = 100

    def build_chunk(c):
        step_fn = make_train_step(model, c, optimizer, pool, train_split)
        return jax.jit(make_train_chunk(step_fn, chunk), donate_argnums=0)

    compactor = CompactionController(cfg)
    chunk_fn = build_chunk(cfg)
    for _ in range(args.warm // chunk):
        state, metrics = chunk_fn(state, pool)
        if compactor.observe(float(jax.device_get(metrics["n_valid_mean"]))):
            chunk_fn = build_chunk(compactor.apply(cfg))
    state, metrics = chunk_fn(state, pool)
    jax.block_until_ready(metrics)
    k_settled = compactor.k
    psnr = float(jax.device_get(metrics)["psnr"])
    occ = float(jax.device_get(metrics)["occupancy"])
    print(f"# warm done: K settled {k_settled} train_psnr {psnr:.2f} "
          f"occupancy {occ:.3f}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(args.bench // chunk):
        state, metrics = chunk_fn(state, pool)
    # fetch fence (CLAUDE.md: block_until_ready alone can lie on axon)
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    train_rays = args.bench * 1024 / dt
    print(json.dumps({"metric": "llff_train_rays_per_sec",
                      "value": round(train_rays, 1), "unit": "rays/s",
                      "k_settled": k_settled,
                      "train_psnr": round(psnr, 2)}), flush=True)

    # full-frame NDC render throughput (the config-5 eval path)
    from fsnerf_tpu.cli import derive_eval_n_compact
    from fsnerf_tpu.data.rays import get_rays, to_ndc
    from fsnerf_tpu.render.renderer import make_chunk_renderer

    def model_fn(x, d=None):
        return model.apply(state.params, x, d)

    eval_k = derive_eval_n_compact(state.grid, val_split, cfg)
    renderer = make_chunk_renderer(
        model_fn, grid=state.grid, n_samples=cfg.sampling.n_samples,
        white_bkgd=False, near=train_split.near, far=train_split.far,
        n_compact=eval_k, query_stride=stride)
    chunks = []
    for pose in val_split.poses[:3]:
        ro, rd = get_rays(jnp.asarray(pose), train_split.hwf)
        ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
        ro, rd = to_ndc(ro, rd, train_split.hwf, 1.0)
        n = (ro.shape[0] // 16384) * 16384
        for c in range(n // 16384):
            sl = slice(c * 16384, (c + 1) * 16384)
            chunks.append((ro[sl], rd[sl]))
    jax.block_until_ready(chunks)
    out = renderer(*chunks[0])
    jax.block_until_ready(out)                     # compile
    t0 = time.perf_counter()
    for ro, rd in chunks:
        out = renderer(ro, rd)
    float(np.asarray(out[0]).ravel()[0])           # fetch fence
    render_rays = len(chunks) * 16384 / (time.perf_counter() - t0)
    print(json.dumps({"metric": "llff_render_rays_per_sec",
                      "value": round(render_rays, 1), "unit": "rays/s",
                      "eval_k": eval_k}), flush=True)

    # quality sanity: held-out view PSNR (the content is learnable, so a
    # collapsing pipeline would show here rather than in rays/s)
    from fsnerf_tpu.eval.metrics import evaluate_frames
    from fsnerf_tpu.render.renderer import render_frame
    img, _ = render_frame(
        model_fn, jnp.asarray(val_split.poses[0]), train_split.hwf,
        train_split.near, train_split.far, strategy="occgrid",
        grid=state.grid, n_samples=cfg.sampling.n_samples,
        render_step_size=cfg.sampling.render_step_size, ndc=True,
        white_bkgd=False, n_compact=eval_k, query_stride=stride,
        early_stop_eps=cfg.sampling.early_stop_eps)
    m = evaluate_frames(img[None], jnp.asarray(val_split.imgs[:1]))
    print(json.dumps({"metric": "llff_heldout_psnr",
                      "value": round(float(m["psnr"]), 2),
                      "ssim": round(float(m["ssim"]), 4),
                      "iters": args.warm + args.bench}), flush=True)


if __name__ == "__main__":
    main()
