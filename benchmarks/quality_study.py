"""Full-scale speed-vs-quality study (VERDICT r2 item 4).

Settles whether the round-2/3 speed defaults (adaptive compaction, query
stride/dilation, late-phase grid refresh) cost held-out quality at
CONVERGENCE, not just in 3k-step A/Bs: 8000 iters x 800^2 x 8 training
views on the analytic sphere scene, 3 seeds per arm.

Arms (training path only — the evaluation protocol is IDENTICAL for all
arms: XLA chunk renderer, fixed K=192, query stride 1, undilated grid):
  r3fix   current defaults: auto query plan (radius-1 dilated tables,
          stride 4 at this config), late refresh interval 64, adaptive K.
  r2def   round-2 defaults: stride 2 undilated, fixed refresh interval 16,
          adaptive K.
  K192s1  conservative anchor: fixed K 192, stride 1, undilated,
          interval 16.

Run:  python benchmarks/quality_study.py [--arms r3fix,r2def,K192s1]
                                         [--seeds 0,1,2] [--iters 8000]
Appends one JSON line per run to benchmarks/quality_study_r3.jsonl and
prints a BASELINE.md-ready table at the end. ~2-8 min per run on the v5e
chip (train + held-out render; the first run of each arm pays the adaptive
ladder's compile chain — see data/pool.py's pool-as-argument note for why
this is minutes and not hours).
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "quality_study_r3.jsonl")


def arm_config(arm: str, seed: int, iters: int):
    from fsnerf_tpu.config import (Config, DataConfig, SamplingConfig,
                                   TrainConfig)
    samp = dict(strategy="occgrid")
    train_kw = {}
    model_kw = {}
    if arm == "r3fix":
        samp.update(query_stride=4, query_dilation=1)   # pre-r3s8 defaults
    elif arm == "r3s8":
        # radius-2 dilated tables, stride 8 (the default since the r3s8
        # study arm won — benchmarks/ab_query_radius.py)
        samp.update(query_stride=8, query_dilation=2)
    elif arm == "r3s8sync":
        # wall-clock A/B arm: same training math, compile-blocking ladder
        samp.update(query_stride=8, query_dilation=2)
        train_kw["async_ladder"] = False
    elif arm == "r2def":
        samp.update(query_stride=2, query_dilation=0, update_interval_late=0)
    elif arm == "K192s1":
        samp.update(query_stride=1, query_dilation=0, update_interval_late=0,
                    adapt_compact=False, n_compact=192)
    elif arm in ("sinerf_sa", "sinerf_rc"):
        # SiNeRF backward-mode quality guard: saved-acts (bf16 cos factor)
        # vs recompute (f32 cos) — ops/pallas/siren.py
        model_kw = {"model": "sinerf",
                    "siren_save_acts": arm == "sinerf_sa"}
    elif arm == "hier":
        # hierarchical full-scale convergence guard: the custom-VJP
        # sorted-union merge + shared-network coarse reuse
        # (renderer.py::_merge_sorted_union) validated at 8k iters — the
        # dilated-od regression showed 1.8k-step benches hide collapse
        samp = dict(strategy="hierarchical", n_samples=64, n_fine=128)
    else:
        raise ValueError(arm)
    from fsnerf_tpu.config import ModelConfig
    return Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        model=ModelConfig(**model_kw),
        sampling=SamplingConfig(**samp),
        train=TrainConfig(n_iters=iters, seed=seed, **train_kw),
    )


def run_one(arm: str, seed: int, iters: int, scene, eval_cache) -> dict:
    from fsnerf_tpu.cli import make_render_model_fn
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.eval.metrics import evaluate_frames
    from fsnerf_tpu.render.renderer import render_frame

    cfg = arm_config(arm, seed, iters)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs[:-1], scene.poses[:-1], scene.hwf)

    from fsnerf_tpu.train.loop import train
    t0 = time.perf_counter()
    state = train(model, cfg, pool, scene, log_every=1000)
    jax.block_until_ready(state.params)
    train_s = time.perf_counter() - t0

    model_fn = make_render_model_fn(model, state.params, cfg)
    if cfg.sampling.strategy == "hierarchical":
        # hierarchical arms: the strategy's own coarse/fine eval path
        img, _ = render_frame(
            model_fn, jnp.asarray(scene.poses[-1]), scene.hwf, scene.near,
            scene.far, strategy="hierarchical",
            n_samples=cfg.sampling.n_samples, n_fine=cfg.sampling.n_fine,
            white_bkgd=True)
    else:
        # common eval protocol: undilated grid, stride 1, fixed K 192, XLA
        from fsnerf_tpu.ops import occgrid as og
        grid = og.conservative(state.grid)
        img, _ = render_frame(
            model_fn, jnp.asarray(scene.poses[-1]), scene.hwf, scene.near,
            scene.far, strategy="occgrid", grid=grid,
            n_samples=cfg.sampling.n_samples,
            render_step_size=cfg.sampling.render_step_size,
            white_bkgd=True, n_compact=192, query_stride=1,
            early_stop_eps=cfg.sampling.early_stop_eps)
    m = evaluate_frames(img[None], eval_cache["gt"])
    rec = {
        "arm": arm, "seed": seed, "iters": iters,
        "heldout_psnr": round(float(m["psnr"]), 3),
        "heldout_ssim": round(float(m["ssim"]), 4),
        "train_s": round(train_s, 1),
        "train_rays_per_s": round(iters * cfg.train.batch_size / train_s),
    }
    return rec


def main():
    global OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="r3fix,r2def,K192s1")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--hw", type=int, default=800)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    OUT = args.out

    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.data.synthetic import SphereScene

    scene = SphereScene(n_imgs=9, hw=args.hw)
    eval_cache = {"gt": jnp.asarray(scene.imgs[-1])[None]}

    done = set()
    if os.path.exists(OUT):
        with open(OUT) as fh:
            for line in fh:
                r = json.loads(line)
                done.add((r["arm"], r["seed"], r["iters"]))

    results = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        for arm in args.arms.split(","):
            if (arm, seed, args.iters) in done:
                print(f"skip {arm} seed {seed} (already recorded)")
                continue
            rec = run_one(arm, seed, args.iters, scene, eval_cache)
            results.append(rec)
            with open(OUT, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)

    # summary table over EVERYTHING recorded (incl. prior sessions)
    with open(OUT) as fh:
        allr = [json.loads(l) for l in fh]
    print("\n| arm | " + " | ".join(
        f"seed {s}" for s in sorted({r['seed'] for r in allr})) + " | mean |")
    for arm in args.arms.split(","):
        rs = sorted([r for r in allr if r["arm"] == arm],
                    key=lambda r: r["seed"])
        if not rs:
            continue
        vals = [r["heldout_psnr"] for r in rs]
        cells = " | ".join(f"{v:.2f}" for v in vals)
        print(f"| {arm} | {cells} | {np.mean(vals):.2f} |")


if __name__ == "__main__":
    main()
