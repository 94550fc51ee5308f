"""A/B: saved-acts stream stride for the fused train kernel (TPU).

The saved-activations backward is HBM-bound on the [N, 8x256] bf16 acts
stream (isolation: saved bwd 1.73 ms vs recompute 1.58 ms despite half the
FLOPs). acts_stride=2 saves only layers {1,3,5,7} and regenerates {0,2,4,6}
in the backward — one GEMM each from the saved predecessor
(ops/pallas/mlp_train.py::_reconstruct_h) — halving the stream for +4/8
trunk GEMMs. Gradients bitwise identical across strides
(tests/test_pallas.py::test_fused_train_acts_stride_bitwise); this measures
speed only, at the settled steady-state bench workload, occgrid AND
hierarchical strategies.

RESULT (v5e, 2026-08-18): measured DEAD END — stride>1 forces block<=768
(the reconstruction's f32 intermediates OOM the 16M scoped-VMEM stack at
1024) and every stride>1 arm loses e2e: occgrid 374.6k (1@1024) vs
345.8/339.1/336.9k (2@768/2@512/4@768); hierarchical 145.7k vs
132.0/130.2/127.9k. Default stays stride 1.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_acts_stride.py
"""

import time

import jax


def settle_and_time(acts_stride, strategy="occgrid", block_rows=None):
    from fsnerf_tpu.config import (Config, DataConfig, ModelConfig,
                                   SamplingConfig, TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    B, chunk = 1024, 100
    if strategy == "occgrid":
        sampling = SamplingConfig(strategy="occgrid", n_samples=512,
                                  grid_resolution=128, grid_levels=1)
    else:
        sampling = SamplingConfig(strategy="hierarchical", n_samples=64,
                                  n_fine=128)
    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        model=ModelConfig(fused_save_acts=True,
                          fused_acts_stride=acts_stride,
                          fused_block_rows=block_rows),
        sampling=sampling,
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
    warm = 12 if strategy == "occgrid" else 3
    for _ in range(warm):
        state, metrics = chunk_fn(state, pool)
        if compactor.observe(float(jax.device_get(metrics["n_valid_mean"]))):
            chunk_fn = build_chunk(compactor.apply(cfg))
    state, metrics = chunk_fn(state, pool)        # prime the settled program
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(6):
        state, metrics = chunk_fn(state, pool)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    rays = 6 * chunk * B / dt
    print(f"{strategy} acts_stride={acts_stride} block={block_rows}: "
          f"K={compactor.k} {rays:,.0f} rays/s ({dt / 6 * 10:.2f} ms/step)",
          flush=True)
    return rays


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    # stride>1 at block 1024 is VMEM-infeasible: the backward's gap
    # reconstruction keeps ~4 f32 [1024,256] y-intermediates live on the
    # scoped-vmem stack (measured 18.21M vs the 16M limit) — so the stride
    # arms run at smaller row blocks and must beat stride1/1024 e2e to win.
    for strategy in ("occgrid", "hierarchical"):
        for stride, block in ((1, None), (2, 768), (2, 512), (4, 768)):
            try:
                settle_and_time(stride, strategy, block)
            except Exception as e:  # noqa: BLE001 — survey sweep
                print(f"{strategy} acts_stride={stride} block={block}: "
                      f"FAILED {type(e).__name__}: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
