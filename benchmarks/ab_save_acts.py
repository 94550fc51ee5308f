"""A/B: fused train kernel backward — recompute vs saved activations (TPU).

Times the settled steady-state 100-step train chunk at the bench workload
(bench.py config) with ModelConfig.fused_save_acts off/on. Gradients are
bitwise identical between the arms (tests/test_pallas.py::
test_fused_train_saved_acts_bitwise_matches_recompute); this measures speed
only.

Run:  python benchmarks/ab_save_acts.py     (~4 min on the v5e chip)
"""

import time

import jax


def settle_and_time(save_acts: bool, block_rows=None):
    from fsnerf_tpu.config import (Config, DataConfig, ModelConfig,
                                   SamplingConfig, TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    B, chunk = 1024, 100
    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        model=ModelConfig(fused_save_acts=save_acts,
                          fused_block_rows=block_rows),
        sampling=SamplingConfig(strategy="occgrid", n_samples=512,
                                grid_resolution=128, grid_levels=1),
        train=TrainConfig(n_iters=1800, batch_size=B, dtype="bfloat16"),
    )
    scene = SphereScene(n_imgs=8, hw=128, white_bkgd=True)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))

    def build_chunk(c):
        step_fn = make_train_step(model, c, optimizer, pool, scene)
        return jax.jit(make_train_chunk(step_fn, chunk), donate_argnums=0)

    compactor = CompactionController(cfg)
    chunk_fn = build_chunk(cfg)
    for _ in range(12):
        state, metrics = chunk_fn(state, pool)
        if compactor.observe(float(jax.device_get(metrics["n_valid_mean"]))):
            chunk_fn = build_chunk(compactor.apply(cfg))
    state, metrics = chunk_fn(state, pool)        # prime the settled executable
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(6):
        state, metrics = chunk_fn(state, pool)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    rays = 6 * chunk * B / dt
    print(f"save_acts={save_acts} block_rows={block_rows}: "
          f"K={compactor.k} {rays:,.0f} rays/s "
          f"({dt / 6 * 10:.2f} ms/step)", flush=True)
    return rays


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    settle_and_time(False, 1024)
    settle_and_time(True, 512)
    settle_and_time(True, 1024)


if __name__ == "__main__":
    main()
