"""Few-shot regularizer quality study (VERDICT r3 item 1).

The project's reason to exist is *frequency regularization for few-shot
NeRF* (/root/reference/README.md:1-2): FreeNeRF-style annealed frequency
masking (our core/encoding.py::freq_mask), the occlusion regularizer
(/root/reference/src/core/loss.py:6-60 -> core/losses.py::occlusion_reg),
and weight-decay frequency regularization
(/root/reference/src/run-nerf.py:266-279 -> core/losses.py::weight_reg).
All three mechanisms are implemented and unit-tested, but until this study
none had measured quality evidence in the few-shot regime they were built
for. This measures them at convergence: 8000 iters x 800^2 renders on the
analytic sphere scene at n_train_views in {3, 8}, multi-seed.

Protocol (identical EVALUATION for every arm; arms differ in TRAINING only):
  * train views: n evenly-azimuth-spread views from an 8-view orbit shell
    (n=3 -> indices [0,3,6]; n=8 -> all). The even spread stands in for the
    reference's K-means pose-diverse selection (splitter.py:134-156).
  * eval views: 3 held-out views from a DIFFERENT orbit seed (fixed across
    arms/seeds) — mean held-out PSNR/SSIM over the 3 frames, rendered with
    the conservative protocol (XLA renderer, fixed K 192, stride 1,
    undilated grid), as in benchmarks/quality_study.py.

Arms:
  base  no regularizers (current defaults).
  freq  FreeNeRF annealed frequency masking, freq_reg_end = 0.9 * n_iters
        (the FreeNeRF paper's ~90%-of-schedule duration).
  occ   occlusion regularizer, exp weight a=1, b=2 (w(t)=e^{-2t}: ~20x decay
        across the [aabb-entry, surface] floater region; beta gates per the
        reference quirk, run-nerf.py:261-264).
  wreg  weight-decay regularization ao=1e-6, reg_ratio 0.5, l1 — the
        reference's own --ao mechanism at its documented operating point.
  both  freq + occ.

r5 extensions (VERDICT r4 missing #1/#2):
  --scene lattice   the procedural lego-like box lattice (thin rods, holes,
                    self-occlusion, high-frequency checker albedo,
                    data/synthetic.py::LatticeScene) — the geometry regime
                    of the reference's headline `lego` benchmark
                    (/root/reference/src/utils/parser.py:62-64) that the
                    smooth convex sphere cannot exercise.
  --floaters        composite view-INCONSISTENT translucent blobs into the
                    TRAINING images only (data/synthetic.py::add_floaters);
                    held-out GT stays clean. This is the occlusion
                    regularizer's DESIGN regime (reference loss.py:6-60):
                    the photometric optimum for inconsistent content is
                    density parked just inside the AABB in front of each
                    camera — a near-camera floater occ reg exists to kill.
  --strategy hierarchical   train AND eval with classic coarse/fine
                    sampling instead of the occupancy grid.

Run:  python benchmarks/quality_fewshot.py [--arms base,freq,occ,both]
                                           [--nviews 3,8] [--seeds 0,1]
                                           [--iters 8000] [--hw 800]
                                           [--scene sphere|lattice]
                                           [--floaters] [--strategy ...]
Appends one JSON line per run to benchmarks/quality_fewshot.jsonl and
prints a BASELINE.md-ready table at the end.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "quality_fewshot.jsonl")


def arm_config(arm: str, seed: int, iters: int, strategy: str = "occgrid"):
    from fsnerf_tpu.config import (Config, DataConfig, EncoderConfig,
                                   SamplingConfig, TrainConfig)
    enc_kw = {}
    train_kw = {}
    base_arm = arm.split("-")[0]
    # "occ-0.01" / "both-0.01" override the exp-weight amplitude a
    # (calibration: a=1.0 collapses training on the sphere scene —
    # held-out 10.0 dB at 1k iters — the term needs to sit well below
    # the MSE scale)
    occ_a = float(arm.split("-", 1)[1]) if "-" in arm else 1.0
    if base_arm in ("freq", "both"):
        # "freq-0.4" = anneal ends at 0.4*iters (short-anneal calibration,
        # VERDICT r4 weak #5); bare "freq" keeps the FreeNeRF-paper ~90%.
        frac = occ_a if (base_arm == "freq" and "-" in arm) else 0.9
        enc_kw["freq_reg_end"] = int(frac * iters)
    if base_arm in ("occ", "both"):
        train_kw.update(occ_a=occ_a, occ_b=2.0, occ_func="exp", beta=1.0)
    if base_arm == "wreg":
        train_kw.update(ao=occ_a if "-" in arm else 1e-6,
                        reg_ratio=0.5, reg="l1")
    if base_arm not in ("base", "freq", "occ", "wreg", "both"):
        raise ValueError(arm)
    samp = (dict(strategy="hierarchical", n_samples=64, n_fine=128)
            if strategy == "hierarchical" else dict(strategy="occgrid"))
    return Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        encoder=EncoderConfig(**enc_kw),
        train=TrainConfig(n_iters=iters, seed=seed, **train_kw),
        sampling=SamplingConfig(**samp),
    )


def train_indices(n: int, total: int = 8):
    """n evenly-spread view indices out of `total` (pose-diverse few-shot)."""
    return np.round(np.linspace(0, total, n, endpoint=False)).astype(int)


def run_one(arm: str, nviews: int, seed: int, iters: int, scene,
            eval_scene, eval_gt, scene_name: str = "sphere",
            floaters: bool = False, strategy: str = "occgrid") -> dict:
    from fsnerf_tpu.cli import make_render_model_fn
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.eval.metrics import evaluate_frames
    from fsnerf_tpu.render.renderer import render_frame
    from fsnerf_tpu.train.loop import train

    cfg = arm_config(arm, seed, iters, strategy)
    model = make_model(cfg)
    idx = train_indices(nviews, len(scene.poses))
    train_imgs = scene.imgs[idx]
    if floaters:
        from fsnerf_tpu.data.synthetic import add_floaters
        train_imgs = add_floaters(train_imgs, scene.poses[idx], scene.hwf,
                                  seed=97)
    pool = pool_from_images(train_imgs, scene.poses[idx], scene.hwf)

    t0 = time.perf_counter()
    state = train(model, cfg, pool, scene, log_every=2000)
    jax.block_until_ready(state.params)
    train_s = time.perf_counter() - t0

    model_fn = make_render_model_fn(model, state.params, cfg)
    from fsnerf_tpu.ops import occgrid as og
    grid = (og.conservative(state.grid)
            if state.grid is not None else None)
    frames = []
    for pose in eval_scene.poses:
        if strategy == "hierarchical":
            img, _ = render_frame(
                model_fn, jnp.asarray(pose), scene.hwf, scene.near,
                scene.far, strategy="hierarchical",
                n_samples=cfg.sampling.n_samples,
                n_fine=cfg.sampling.n_fine, white_bkgd=True)
        else:
            img, _ = render_frame(
                model_fn, jnp.asarray(pose), scene.hwf, scene.near,
                scene.far, strategy="occgrid", grid=grid,
                n_samples=cfg.sampling.n_samples,
                render_step_size=cfg.sampling.render_step_size,
                white_bkgd=True, n_compact=192, query_stride=1,
                early_stop_eps=cfg.sampling.early_stop_eps)
        frames.append(img)
    m = evaluate_frames(jnp.stack(frames), eval_gt)
    return {
        "arm": arm, "nviews": nviews, "seed": seed, "iters": iters,
        "scene": scene_name, "floaters": floaters, "strategy": strategy,
        "heldout_psnr": round(float(m["psnr"]), 3),
        "heldout_ssim": round(float(m["ssim"]), 4),
        "train_s": round(train_s, 1),
        "train_rays_per_s": round(iters * cfg.train.batch_size / train_s),
    }


def main():
    global OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="base,freq,occ,both")
    ap.add_argument("--nviews", default="3,8")
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--hw", type=int, default=800)
    ap.add_argument("--scene", choices=["sphere", "lattice"],
                    default="sphere")
    ap.add_argument("--floaters", action="store_true")
    ap.add_argument("--strategy", choices=["occgrid", "hierarchical"],
                    default="occgrid")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    OUT = args.out

    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    if args.scene == "sphere":
        from fsnerf_tpu.data.synthetic import SphereScene
        scene = SphereScene(n_imgs=8, hw=args.hw)
        eval_scene = SphereScene(n_imgs=3, hw=args.hw, seed=101)
    else:
        from fsnerf_tpu.data.synthetic import LatticeScene
        scene = LatticeScene(n_imgs=8, hw=args.hw)
        eval_scene = scene.holdout(n=3, seed=101)
    eval_gt = jnp.asarray(eval_scene.imgs)

    def key(r):
        return (r["arm"], r["nviews"], r["seed"], r["iters"],
                r.get("scene", "sphere"), r.get("floaters", False),
                r.get("strategy", "occgrid"))

    done = set()
    if os.path.exists(OUT):
        with open(OUT) as fh:
            done = {key(json.loads(line)) for line in fh}

    for nviews in [int(s) for s in args.nviews.split(",")]:
        for seed in [int(s) for s in args.seeds.split(",")]:
            for arm in args.arms.split(","):
                if (arm, nviews, seed, args.iters, args.scene,
                        args.floaters, args.strategy) in done:
                    print(f"skip {arm} n={nviews} seed {seed}")
                    continue
                rec = run_one(arm, nviews, seed, args.iters, scene,
                              eval_scene, eval_gt, scene_name=args.scene,
                              floaters=args.floaters,
                              strategy=args.strategy)
                with open(OUT, "a") as fh:
                    fh.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)

    with open(OUT) as fh:
        allr = [json.loads(l) for l in fh]
    allr = [r for r in allr
            if r["iters"] == args.iters and r.get("scene", "sphere") ==
            args.scene and r.get("floaters", False) == args.floaters
            and r.get("strategy", "occgrid") == args.strategy]
    seeds = sorted({r["seed"] for r in allr})
    print("\n| n | arm | " + " | ".join(f"seed {s}" for s in seeds)
          + " | mean PSNR | mean SSIM |")
    for nviews in [int(s) for s in args.nviews.split(",")]:
        for arm in args.arms.split(","):
            rs = {r["seed"]: r for r in allr
                  if r["arm"] == arm and r["nviews"] == nviews}
            if not rs:
                continue
            cells = " | ".join(
                f"{rs[s]['heldout_psnr']:.2f}" if s in rs else "-"
                for s in seeds)
            vals = [r["heldout_psnr"] for r in rs.values()]
            ssims = [r["heldout_ssim"] for r in rs.values()]
            print(f"| {nviews} | {arm} | {cells} | {np.mean(vals):.2f} "
                  f"| {np.mean(ssims):.4f} |")


if __name__ == "__main__":
    main()
