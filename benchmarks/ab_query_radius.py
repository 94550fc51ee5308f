"""A/B: occupancy-query dilation radius 1/stride 4 vs radius 2/stride 8.

The query row-gather is row-count-bound (~5 ns/row) and the profiler puts
it at ~0.66 ms/step (20%) at radius 1/stride 4. Radius 2 admits stride 8
(each dilation unit doubles the lossless stride) — half the rows — at the
cost of a 2-cell XY false-positive shell. The od-based early termination
stays point-accurate either way (packed own-occ half of the table), so the
risk is purely settled-K inflation from the wider shell.

Reports steady-state rays/s, settled K, n_valid, and train PSNR at 1.8k
steps for both arms.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_query_radius.py
"""

import time

import jax


def run_arm(stride: int, radius: int):
    from fsnerf_tpu.config import (Config, DataConfig, SamplingConfig,
                                   TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    B, chunk = 1024, 100
    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        sampling=SamplingConfig(strategy="occgrid", n_samples=512,
                                grid_resolution=128, grid_levels=1,
                                query_stride=stride, query_dilation=radius),
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
    state, metrics = chunk_fn(state, pool)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(5):
        state, metrics = chunk_fn(state, pool)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    m = jax.device_get(metrics)
    rays = 5 * chunk * B / dt
    print(f"stride={stride} radius={radius}: {rays:,.0f} rays/s "
          f"({dt / 5 * 10:.2f} ms/step) K={compactor.k} "
          f"n_valid={float(m['n_valid_mean']):.1f} "
          f"train_psnr={float(m['psnr']):.2f}", flush=True)


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    import sys
    arms = sys.argv[1] if len(sys.argv) > 1 else "4:1,8:2"
    for a in arms.split(","):
        st, rad = a.split(":")
        run_arm(int(st), int(rad))


if __name__ == "__main__":
    main()
