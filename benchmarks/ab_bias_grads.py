"""A/B: backward-kernel bias grads — VPU cross-sublane sum vs MXU ones-GEMM.

The fused train backward computes 13 bias gradients per block; as VPU
reductions ([bN, 256] -> [1, 256]) they sit on the critical path between
dependent GEMMs. The MXU variant contracts a ones column against the bf16
cotangent already cast for the dW GEMMs (mlp_train.MXU_BIAS_GRADS).

Measures the default bench workload (NeRF, occgrid, adaptive K) and the
hierarchical config, both modes.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_bias_grads.py
"""

import time

import jax


def run_arm(mxu_bias: bool, strategy: str):
    import fsnerf_tpu.ops.pallas.mlp_train as mt
    from fsnerf_tpu.config import (Config, DataConfig, SamplingConfig,
                                   TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    mt.MXU_BIAS_GRADS = mxu_bias
    B, chunk = 1024, 100
    if strategy == "occgrid":
        s_cfg = SamplingConfig(strategy="occgrid", n_samples=512,
                               grid_resolution=128, grid_levels=1)
    else:
        s_cfg = SamplingConfig(strategy="hierarchical", n_samples=64,
                               n_fine=128)
    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        sampling=s_cfg,
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
        if strategy == "occgrid" and compactor.observe(
                float(jax.device_get(metrics["n_valid_mean"]))):
            chunk_fn = build_chunk(compactor.apply(cfg))
    state, metrics = chunk_fn(state, pool)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(5):
        state, metrics = chunk_fn(state, pool)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    m = jax.device_get(metrics)
    rays = 5 * chunk * B / dt
    print(f"{strategy} mxu_bias={mxu_bias}: {rays:,.0f} rays/s "
          f"({dt / 5 * 10:.2f} ms/step) K={compactor.k} "
          f"train_psnr={float(m['psnr']):.2f}", flush=True)


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    for strategy in ("occgrid", "hierarchical"):
        for mxu in (False, True):
            run_arm(mxu, strategy)


if __name__ == "__main__":
    main()
