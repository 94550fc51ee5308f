"""A/B: positional encoding XLA-side vs IN-KERNEL (fused train path, TPU).

sol_hier_kernel.py pinned ~5.7 ns/row of per-apply glue (encode + cast +
pad + HBM round-trip) that the hierarchical step pays twice; the in-kernel
encoding (ops/pallas/mlp_train.py::_encode_block, periodic-4 lane layout,
_sincos_fast) is the fix. This measures settled steady-state e2e train
throughput for BOTH strategies with ModelConfig.fused_encode off/on.
Numerics differ only by the <= 9e-5 sincos polynomial (below bf16 feature
rounding); equivalence incl. grads is tested in
tests/test_pallas.py::test_fused_encode_in_kernel_matches_xla_encoding.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_encode_kernel.py
"""

import time

import jax


def settle_and_time(strategy: str, fused_encode: bool):
    from fsnerf_tpu.config import (Config, DataConfig, ModelConfig,
                                   SamplingConfig, TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    B, chunk = 1024, 100
    samp = dict(strategy="occgrid", n_samples=512, grid_resolution=128,
                grid_levels=1)
    if strategy == "hierarchical":
        samp = dict(strategy="hierarchical", n_samples=64, n_fine=128)
    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        model=ModelConfig(fused_encode=fused_encode),
        sampling=SamplingConfig(**samp),
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
    state, metrics = chunk_fn(state, pool)       # prime settled executable
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(6):
        state, metrics = chunk_fn(state, pool)
    # fetch fence: block_until_ready can lie through the axon tunnel
    psnr = float(jax.device_get(metrics["psnr"]))
    dt = time.perf_counter() - t0
    rays = 6 * chunk * B / dt
    print(f"{strategy:13s} fused_encode={fused_encode}: "
          f"K={compactor.k} {rays:,.0f} rays/s "
          f"({dt / 6 * 10:.2f} ms/step, train psnr {psnr:.1f})", flush=True)
    return rays


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    for strategy in ("occgrid", "hierarchical"):
        off = settle_and_time(strategy, False)
        on = settle_and_time(strategy, True)
        print(f"  -> {strategy}: {off:,.0f} -> {on:,.0f} rays/s "
              f"({(on / off - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
