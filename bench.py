"""Benchmark: training throughput (rays/sec/chip) at the reference workload.

Workload = the reference's default training configuration (SURVEY.md section
6): NeRF 8x256 (skip@4, n_freqs 10/4), 1024 rays/step, occupancy grid res 128
with 5e-3 march step, Adam + exp LR decay — trained on an analytic scene in
the Blender-lego geometry regime (cameras at r~4, AABB [-1.5,1.5]^3). The
solid sphere is a WORST case for occupancy pruning (volumetric interior);
real lego-like scenes prune more.

Adaptive compaction (the default training path, train/loop.py) is active
during warmup; the measured window runs at the settled compaction K — i.e.
this reports the steady-state throughput a user's run spends >90% of its
steps at.

Baseline: the reference publishes NO numbers (BASELINE.md); its A100
rays/sec must be measured on CUDA hardware we don't have. Anchor used here:
A100_TRAIN_RAYS_PER_SEC = 50_000 — an estimate for torch+nerfacc vanilla-NeRF
training at the reference config (~150 MFLOP effective fwd+bwd per ray after
grid pruning against A100 fp32-era NeRF MFU; see BASELINE.md measurement
plan). vs_baseline = measured / (5x50_000): the driver north star is >=5x
A100, so vs_baseline 1.0 == target met.

Also reports MFU (stderr): analytic fwd+bwd MLP FLOPs actually executed
(batch x K samples/step + the amortized occupancy-grid refresh) against the
chip's bf16 peak — separates "physics" from unexploited levers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

_T0 = time.perf_counter()


def _stamp(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)

import jax
import jax.numpy as jnp
import numpy as np

A100_TRAIN_RAYS_PER_SEC = 50_000.0
TARGET_MULTIPLE = 5.0
V5E_BF16_PEAK_FLOPS = 197e12   # TPU v5e: 197 TFLOP/s bf16


def mlp_flops_per_sample(cfg, full=True, heads_only=False):
    """Analytic fwd MAC count of the NeRF MLP per sample (x2 for FLOPs).

    full=False: density-only pass (trunk + sigma head) — the occupancy-grid
    refresh workload. heads_only=True: just the connection/branch/rgb head
    stack — what the saved-activations backward recomputes."""
    e = cfg.encoder
    m = cfg.model
    d_enc = 3 * (1 + 2 * e.n_freqs)
    d_dir = 3 * (1 + 2 * e.n_freqs_views)
    D = m.d_filter
    macs = 0
    if not heads_only:
        macs += d_enc * D                                # layer 0
        for i in range(1, m.n_layers):
            d_in = D + (d_enc if (i - 1) in m.skip else 0)
            macs += d_in * D
        macs += D * 1                                    # sigma head
    if full:
        macs += D * D                                    # connection
        macs += (D + d_dir) * (D // 2)                   # view branch
        macs += (D // 2) * 3                             # rgb head
    return 2 * macs


def train_flops_per_sample(cfg):
    """EXECUTED fwd+bwd FLOPs per training sample.

    Backward GEMMs (dW + dx chains) are 2x the forward; on top of that the
    fused kernel re-materializes activations: the recompute backward re-runs
    the whole forward (+1x), the saved-acts default re-runs only the head
    stack (ops/pallas/mlp_train.py)."""
    fwd = mlp_flops_per_sample(cfg, full=True)
    rematerialize = (mlp_flops_per_sample(cfg, heads_only=True)
                     if getattr(cfg.model, "fused_save_acts", False)
                     else fwd)
    return 3 * fwd + rematerialize


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import (Config, DataConfig, SamplingConfig,
                                   TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    batch_size = 1024
    warm_steps = 1200   # past grid warmup (256), adaptation settling, and
                        # the late refresh-interval switch (1024) — the timed
                        # window is the steady state a full run spends >85%
                        # of its steps in
    bench_steps = 600
    chunk = 100

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

    def build_chunk(c):
        step_fn = make_train_step(model, c, optimizer, pool, scene)
        return jax.jit(make_train_chunk(step_fn, chunk), donate_argnums=0)

    # warmup with adaptive compaction live (the default train path)
    compactor = CompactionController(cfg)
    chunk_fn = build_chunk(cfg)
    for _ in range(warm_steps // chunk):
        state, metrics = chunk_fn(state, pool)
        if compactor.observe(float(jax.device_get(metrics["n_valid_mean"]))):
            chunk_fn = build_chunk(compactor.apply(cfg))
    # one extra untimed chunk: if the controller re-laddered on the LAST warm
    # observation, the settled-K executable hasn't compiled yet — its first
    # call must not land inside the timed window
    state, metrics = chunk_fn(state, pool)
    jax.block_until_ready(metrics)
    k_settled = compactor.k

    t0 = time.perf_counter()
    for _ in range(bench_steps // chunk):
        state, metrics = chunk_fn(state, pool)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    _stamp("train section done")
    n_chips = 1  # bench runs single-chip
    rays_per_sec = bench_steps * batch_size / dt / n_chips
    steps_per_sec = bench_steps / dt
    vs = rays_per_sec / (TARGET_MULTIPLE * A100_TRAIN_RAYS_PER_SEC)

    # analytic MFU: executed MLP FLOPs (fwd + 2x-fwd backward + the
    # backward's activation rematerialization on the B x K train batch,
    # + amortized density-only grid refresh) / bf16 peak
    s = cfg.sampling
    train_flops = batch_size * k_settled * train_flops_per_sample(cfg)
    interval = s.update_interval_late or s.update_interval  # bench window is
    grid_samples = (s.grid_resolution ** 3) * s.grid_levels \
        / s.update_parts / interval                         # post-late-start
    grid_flops = grid_samples * mlp_flops_per_sample(cfg, full=False)
    mfu = steps_per_sec * (train_flops + grid_flops) / V5E_BF16_PEAK_FLOPS

    # secondary metric: steady-state render throughput (stderr only; the
    # driver consumes the single stdout JSON line). Rays are pre-built on
    # device so this times the render program, not host-side ray setup.
    from fsnerf_tpu.data.rays import get_rays
    from fsnerf_tpu.ops.occgrid import resolve_query_stride
    from fsnerf_tpu.render.renderer import make_chunk_renderer

    def model_fn(x, d=None):
        return model.apply(state.params, x, d)
    chunk_renderer = make_chunk_renderer(
        model_fn, grid=state.grid, n_samples=cfg.sampling.n_samples,
        white_bkgd=True, near=scene.near, far=scene.far,
        n_compact=k_settled,
        query_stride=resolve_query_stride(cfg.sampling, scene.aabb))
    chunks = []
    for pose in scene.path_poses[:9]:
        ro, rd = get_rays(jnp.asarray(pose), scene.hwf)
        ro = ro.reshape(-1, 3); rd = rd.reshape(-1, 3)
        n = (ro.shape[0] // 16384) * 16384
        for c in range(n // 16384):
            sl = slice(c * 16384, (c + 1) * 16384)
            chunks.append((jnp.asarray(ro[sl]), jnp.asarray(rd[sl])))
    jax.block_until_ready(chunks)
    jax.block_until_ready(chunk_renderer(*chunks[0]))   # compile
    t0 = time.perf_counter()
    for ro, rd in chunks:
        out = chunk_renderer(ro, rd)
    jax.block_until_ready(out)
    render_rays_sec = len(chunks) * 16384 / (time.perf_counter() - t0)
    _stamp("xla render section done")

    # fused ray-march kernel (MLP + compositing + exact early exit in one
    # Pallas kernel, ops/pallas/render.py) on the same chunks
    from fsnerf_tpu.ops.pallas.render import make_fused_ray_renderer
    fused_fn = make_fused_ray_renderer(
        state.params, n_layers=cfg.model.n_layers,
        skip=tuple(cfg.model.skip), n_freqs=cfg.encoder.n_freqs,
        n_freqs_views=cfg.encoder.n_freqs_views, early_stop_eps=1e-4)
    fused_renderer = make_chunk_renderer(
        None, grid=state.grid, n_samples=cfg.sampling.n_samples,
        white_bkgd=True, near=scene.near, far=scene.far,
        n_compact=k_settled,
        query_stride=resolve_query_stride(cfg.sampling, scene.aabb),
        fused_render_fn=fused_fn)
    jax.block_until_ready(fused_renderer(*chunks[0]))   # compile
    t0 = time.perf_counter()
    for ro, rd in chunks:
        out = fused_renderer(ro, rd)
    jax.block_until_ready(out)
    fused_render_rays_sec = len(chunks) * 16384 / (time.perf_counter() - t0)
    _stamp("fused render section done")

    # secondary metric: hierarchical-strategy training throughput (stderr) —
    # BASELINE.json config 2 (classic coarse/fine inverse-CDF resampling),
    # 64 coarse + 128 fine (the classic-NeRF split). Total MLP evals/ray =
    # 64 + 128 = 192 with the shared-network coarse-output reuse
    # (render/renderer.py::render_rays_hierarchical).
    h_warm, h_bench = 100, 200
    cfg_h = cfg.replace(
        sampling=SamplingConfig(strategy="hierarchical", n_samples=64,
                                n_fine=128),
        train=TrainConfig(n_iters=h_warm + h_bench, batch_size=batch_size,
                          dtype="bfloat16"))
    state_h = init_state(model, cfg_h, optimizer, scene.aabb,
                         jax.random.key(0))
    step_h = make_train_step(model, cfg_h, optimizer, pool, scene)
    chunk_h = jax.jit(make_train_chunk(step_h, chunk), donate_argnums=0)
    for _ in range(h_warm // chunk):
        state_h, m_h = chunk_h(state_h, pool)
    jax.block_until_ready(m_h)
    t0 = time.perf_counter()
    for _ in range(h_bench // chunk):
        state_h, m_h = chunk_h(state_h, pool)
    jax.block_until_ready(m_h)
    hier_rays_sec = h_bench * batch_size / (time.perf_counter() - t0)
    _stamp("hierarchical section done")

    # hierarchical RENDER throughput (VERDICT r4 weak #3): config-2
    # eval/video rendering through the XLA coarse/fine pipeline — the same
    # path cli.evaluate_split/render_path take for strategy=hierarchical
    # (the reference renders eval frames through the training path,
    # rendering.py:110-177). Fusion decision: see BASELINE.md r5. Guarded:
    # a failure here must not cost the headline JSON line.
    hier_render_rays_sec = float("nan")
    hier_fused_render_rays_sec = float("nan")
    try:
        def model_fn_h(x, d=None):
            return model.apply(state_h.params, x, d)
        hier_renderer = make_chunk_renderer(
            model_fn_h, strategy="hierarchical", n_samples=cfg_h.sampling.n_samples,
            n_fine=cfg_h.sampling.n_fine, white_bkgd=True,
            near=scene.near, far=scene.far)
        jax.block_until_ready(hier_renderer(*chunks[0]))   # compile
        t0 = time.perf_counter()
        for ro, rd in chunks:
            out = hier_renderer(ro, rd)
        # fetch fence (CLAUDE.md: block_until_ready can lie on axon)
        float(np.asarray(out[0]).ravel()[0])
        hier_render_rays_sec = len(chunks) * 16384 / (time.perf_counter()
                                                      - t0)
        _stamp("hierarchical render section done")

        # r5: fused fine pass — the ray-march kernel marches the sorted
        # coarse+fine union (renderer.py::render_rays_hierarchical)
        fused_h = make_fused_ray_renderer(
            state_h.params, n_layers=cfg.model.n_layers,
            skip=tuple(cfg.model.skip), n_freqs=cfg.encoder.n_freqs,
            n_freqs_views=cfg.encoder.n_freqs_views, early_stop_eps=1e-4)
        hier_fused_renderer = make_chunk_renderer(
            model_fn_h, strategy="hierarchical",
            n_samples=cfg_h.sampling.n_samples,
            n_fine=cfg_h.sampling.n_fine, white_bkgd=True,
            near=scene.near, far=scene.far, fused_render_fn=fused_h)
        jax.block_until_ready(hier_fused_renderer(*chunks[0]))   # compile
        t0 = time.perf_counter()
        for ro, rd in chunks:
            out = hier_fused_renderer(ro, rd)
        float(np.asarray(out[0]).ravel()[0])
        hier_fused_render_rays_sec = len(chunks) * 16384 / (
            time.perf_counter() - t0)
        _stamp("hierarchical fused render section done")
    except Exception as e:
        _stamp(f"hierarchical render section FAILED: {type(e).__name__}: {e}")

    # secondary metric: SiNeRF training throughput (stderr) — the SIREN
    # model family through its fused saved-acts kernel (ops/pallas/siren.py).
    # Same steady-state protocol as the headline: warm past grid warmup +
    # the adaptive ladder with sinerf's OWN grid/compactor, then time.
    from fsnerf_tpu.config import ModelConfig
    s_bench = 200
    cfg_s = cfg.replace(
        model=ModelConfig(model="sinerf"),
        train=TrainConfig(n_iters=warm_steps + s_bench,
                          batch_size=batch_size, dtype="bfloat16"))
    model_s = make_model(cfg_s)
    state_s = init_state(model_s, cfg_s, optimizer, scene.aabb,
                         jax.random.key(0))

    def build_chunk_s(c):
        step_fn = make_train_step(model_s, c, optimizer, pool, scene)
        return jax.jit(make_train_chunk(step_fn, chunk), donate_argnums=0)

    compactor_s = CompactionController(cfg_s)
    chunk_s = build_chunk_s(cfg_s)
    for _ in range(warm_steps // chunk):
        state_s, m_s = chunk_s(state_s, pool)
        if compactor_s.observe(
                float(jax.device_get(m_s["n_valid_mean"]))):
            chunk_s = build_chunk_s(compactor_s.apply(cfg_s))
    state_s, m_s = chunk_s(state_s, pool)
    jax.block_until_ready(m_s)
    t0 = time.perf_counter()
    for _ in range(s_bench // chunk):
        state_s, m_s = chunk_s(state_s, pool)
    jax.block_until_ready(m_s)
    sinerf_rays_sec = s_bench * batch_size / (time.perf_counter() - t0)
    _stamp("sinerf section done")

    # sinerf rendering through the fused SIREN ray-march kernel (the
    # cli.make_fused_render_fn eval/video path since r4 — MLP + compositing
    # + exact early exit; previously the plain fused forward at 293k).
    # Guarded: a failure here must not cost the headline JSON line.
    sinerf_render_rays_sec = float("nan")
    try:
        from fsnerf_tpu.ops.pallas.render import make_fused_siren_ray_renderer
        fused_s = make_fused_siren_ray_renderer(
            state_s.params, n_layers=cfg_s.model.n_layers,
            early_stop_eps=1e-4)
        renderer_s = make_chunk_renderer(
            None, grid=state_s.grid, n_samples=cfg.sampling.n_samples,
            white_bkgd=True, near=scene.near, far=scene.far,
            n_compact=compactor_s.k,
            query_stride=resolve_query_stride(cfg.sampling, scene.aabb),
            fused_render_fn=fused_s)
        jax.block_until_ready(renderer_s(*chunks[0]))   # compile
        t0 = time.perf_counter()
        for ro, rd in chunks:
            out = renderer_s(ro, rd)
        # fetch fence: block_until_ready alone is unreliable for isolated
        # render loops through the axon tunnel (CLAUDE.md)
        float(np.asarray(out[0]).ravel()[0])
        sinerf_render_rays_sec = len(chunks) * 16384 / (time.perf_counter()
                                                        - t0)
        _stamp("sinerf render section done")
    except Exception as e:
        _stamp(f"sinerf render section FAILED: {type(e).__name__}: {e}")

    final_psnr = float(jax.device_get(metrics)["psnr"])
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
    }))
    print(f"# {bench_steps} steps in {dt:.2f}s | steps/s {steps_per_sec:.1f}"
          f" | K settled {k_settled} | mfu {mfu:.3f}"
          f" | train_psnr {final_psnr:.2f}"
          f" | render {render_rays_sec:.0f} rays/s"
          f" | fused_render {fused_render_rays_sec:.0f} rays/s"
          f" | hierarchical {hier_rays_sec:.0f} rays/s"
          f" | hier_render {hier_render_rays_sec:.0f} rays/s"
          f" | hier_fused_render {hier_fused_render_rays_sec:.0f} rays/s"
          f" | sinerf {sinerf_rays_sec:.0f} rays/s"
          f" | sinerf_render {sinerf_render_rays_sec:.0f} rays/s"
          f" | baseline anchor: 5x A100@{A100_TRAIN_RAYS_PER_SEC:.0f} rays/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
