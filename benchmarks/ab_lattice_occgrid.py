"""Isolate the occgrid-path quality collapse on the lattice scene (TPU).

r5 finding (quality_fewshot.jsonl): on the lego-like LatticeScene at
n=8/800^2/8k iters the occgrid strategy collapses to ~7.7-8.0 dB held-out
while the hierarchical strategy (no occupancy grid, no compaction, no
dilated query tables) reaches 18.2-20.1 dB on the SAME scene with the SAME
model — an occgrid-pipeline failure the smooth convex sphere never exposed
(occgrid beats hierarchical there, 28.1 vs 27.6, BASELINE.md r3/r4).

Arms toggle one occgrid mechanism each:

  base      defaults (adaptive compaction margin 1.0, auto dilation/stride,
            early stop) — reproduces the collapse.
  nocompact adapt_compact=False, K fixed at the n_compact ceiling 192.
  fullk     n_compact=0: march the full 512-sample lattice (no compaction
            at all; definitive for any compaction-truncation hypothesis).
  undil     query_dilation=0, query_stride=1: exact per-sample occupancy
            queries (kills the dilated tables' false-positive shells and
            any stride decimation).
  noearly   early_stop_eps=0.
  margin2   compact_margin=2.0 (adaptive, double headroom).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_lattice_occgrid.py \
          [--iters 8000] [--hw 800] [--arms ...] [--nviews 8]
Appends JSON lines to benchmarks/ab_lattice_occgrid.jsonl.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "ab_lattice_occgrid.jsonl")

ARMS = {
    "base": {},
    # post-erosion-fix defaults (r5): identical config to "base", separate
    # key so the jsonl keeps the pre-fix collapse row for the record.
    "fixed": {},
    # occ_thre=-1 makes the binarization threshold min(-1, mean) = -1, so
    # EVERY cell stays occupied forever: the definitive no-culling arm. If
    # quality recovers here, the grid's EMA/refresh loop is culling thin
    # structure before the MLP can learn it (chicken-and-egg).
    "allocc": dict(occ_thre=-1.0),
    "nocompact": dict(adapt_compact=False),
    "fullk": dict(n_compact=0, adapt_compact=False),
    "undil": dict(query_dilation=0, query_stride=1),
    "noearly": dict(early_stop_eps=0.0),
    "margin2": dict(compact_margin=2.0),
}


def run_one(arm: str, nviews: int, seed: int, iters: int, scene,
            eval_scene, eval_gt) -> dict:
    from fsnerf_tpu.cli import make_render_model_fn
    from fsnerf_tpu.config import (Config, DataConfig, SamplingConfig,
                                   TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.eval.metrics import evaluate_frames
    from fsnerf_tpu.render.renderer import render_frame
    from fsnerf_tpu.train.loop import train

    cfg = Config(
        data=DataConfig(dataset="lattice", white_bkgd=True),
        sampling=SamplingConfig(**ARMS[arm]),
        train=TrainConfig(n_iters=iters, seed=seed),
    )
    model = make_model(cfg)
    idx = np.round(np.linspace(0, len(scene.poses), nviews,
                               endpoint=False)).astype(int)
    pool = pool_from_images(scene.imgs[idx], scene.poses[idx], scene.hwf)
    t0 = time.perf_counter()
    state = train(model, cfg, pool, scene, log_every=2000)
    jax.block_until_ready(state.params)
    train_s = time.perf_counter() - t0

    model_fn = make_render_model_fn(model, state.params, cfg)
    from fsnerf_tpu.ops import occgrid as og
    grid = og.conservative(state.grid)
    # common conservative eval for every arm (as quality_fewshot.py)
    frames, train_frames = [], []
    for pose in eval_scene.poses:
        img, _ = render_frame(
            model_fn, jnp.asarray(pose), scene.hwf, scene.near, scene.far,
            strategy="occgrid", grid=grid, n_samples=cfg.sampling.n_samples,
            render_step_size=cfg.sampling.render_step_size,
            white_bkgd=True, n_compact=192, query_stride=1,
            early_stop_eps=cfg.sampling.early_stop_eps)
        frames.append(img)
    m = evaluate_frames(jnp.stack(frames), eval_gt)
    # train-view PSNR separates "can't fit" from "overfits/floaters"
    img, _ = render_frame(
        model_fn, jnp.asarray(scene.poses[idx[0]]), scene.hwf, scene.near,
        scene.far, strategy="occgrid", grid=grid,
        n_samples=cfg.sampling.n_samples,
        render_step_size=cfg.sampling.render_step_size,
        white_bkgd=True, n_compact=192, query_stride=1,
        early_stop_eps=cfg.sampling.early_stop_eps)
    mt = evaluate_frames(img[None], jnp.asarray(scene.imgs[idx[0]][None]))
    return {
        "arm": arm, "nviews": nviews, "seed": seed, "iters": iters,
        "heldout_psnr": round(float(m["psnr"]), 3),
        "heldout_ssim": round(float(m["ssim"]), 4),
        "train_view_psnr": round(float(mt["psnr"]), 3),
        "train_s": round(train_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="base,nocompact,fullk,undil,noearly")
    ap.add_argument("--nviews", type=int, default=8)
    ap.add_argument("--seeds", default="0")
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--hw", type=int, default=800)
    args = ap.parse_args()

    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.data.synthetic import LatticeScene

    scene = LatticeScene(n_imgs=8, hw=args.hw)
    eval_scene = scene.holdout(n=3, seed=101)
    eval_gt = jnp.asarray(eval_scene.imgs)

    done = set()
    if os.path.exists(OUT):
        with open(OUT) as fh:
            done = {(r["arm"], r["nviews"], r["seed"], r["iters"])
                    for r in map(json.loads, fh)}
    for seed in [int(s) for s in args.seeds.split(",")]:
        for arm in args.arms.split(","):
            if (arm, args.nviews, seed, args.iters) in done:
                print(f"skip {arm} seed {seed}")
                continue
            rec = run_one(arm, args.nviews, seed, args.iters, scene,
                          eval_scene, eval_gt)
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
