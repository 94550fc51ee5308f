"""A/B: hierarchical train throughput — isolate the r3 regression.

r2 measured 95.2k rays/s (no coarse reuse, recompute backward); the r3
bench measured 82.2k (coarse reuse + saved-acts backward). Arms:

  reuse+sa     current default (shared-network coarse-output reuse, payload
               sort merge; saved-acts fused backward)
  reuse        coarse reuse, recompute backward
  noreuse+sa   classic two-pass union (256 MLP evals/ray), saved-acts
  noreuse      classic two-pass union, recompute backward (the r2 path)

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_hier.py
"""

import time

import jax


def run_arm(reuse: bool, save_acts: bool):
    from fsnerf_tpu.config import (Config, DataConfig, ModelConfig,
                                   SamplingConfig, TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    import fsnerf_tpu.train.step as ts
    from fsnerf_tpu.render.renderer import render_rays_hierarchical as rrh

    if reuse:
        ts.render_rays_hierarchical = rrh
    else:
        # classic two-pass union: a distinct coarse_model_fn disables the
        # shared-network coarse-output reuse (renderer.py)
        def no_reuse(model_fn, *a, **kw):
            kw["coarse_model_fn"] = model_fn
            return rrh(model_fn, *a, **kw)
        ts.render_rays_hierarchical = no_reuse

    B, chunk = 1024, 100
    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        model=ModelConfig(fused_save_acts=save_acts),
        sampling=SamplingConfig(strategy="hierarchical", n_samples=64,
                                n_fine=128),
        train=TrainConfig(n_iters=300, batch_size=B, dtype="bfloat16"),
    )
    scene = SphereScene(n_imgs=8, hw=128, white_bkgd=True)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))
    step_fn = make_train_step(model, cfg, optimizer, pool, scene)
    chunk_fn = jax.jit(make_train_chunk(step_fn, chunk), donate_argnums=0)

    state, m = chunk_fn(state, pool)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(2):
        state, m = chunk_fn(state, pool)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    rays = 2 * chunk * B / dt
    tag = f"reuse={int(reuse)} save_acts={int(save_acts)}"
    print(f"{tag}: {rays:,.0f} rays/s ({dt / 2 * 10:.2f} ms/step)",
          flush=True)
    return rays


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    for reuse in (True, False):
        for sa in (True, False):
            run_arm(reuse, sa)


if __name__ == "__main__":
    main()
