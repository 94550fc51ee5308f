"""A/B: eval/video render throughput vs chunk size (TPU).

The occgrid render chunk was capped at 16384 rays while the occupancy
query materialized an unblocked [chunk*S/stride, res] row-gather transient;
the query now runs blocked (lax.map over 4096-ray groups inside
_masked_lattice) so the transient is bounded at ANY chunk size. Larger
chunks amortize per-dispatch latency (~1.3 ms on the axon path) over more
rays and give XLA a longer program to overlap.

Times a converged-grid frame workload (800^2 rays, settled K) at chunk
sizes 16k/32k/64k for both the XLA pipeline and the fused ray-march
kernel.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_render_chunk.py
"""

import time

import jax
import jax.numpy as jnp


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import (Config, DataConfig, SamplingConfig,
                                   TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.rays import get_rays
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.ops.occgrid import resolve_query_stride
    from fsnerf_tpu.ops.pallas.render import make_fused_ray_renderer
    from fsnerf_tpu.render.renderer import make_chunk_renderer
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    B = 1024
    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        sampling=SamplingConfig(strategy="occgrid", n_samples=512,
                                grid_resolution=128, grid_levels=1),
        train=TrainConfig(n_iters=1500, batch_size=B, dtype="bfloat16"),
    )
    scene = SphereScene(n_imgs=8, hw=128, white_bkgd=True)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))

    def build_chunk(c):
        step_fn = make_train_step(model, c, optimizer, pool, scene)
        return jax.jit(make_train_chunk(step_fn, 100), donate_argnums=0)

    compactor = CompactionController(cfg)
    chunk_fn = build_chunk(cfg)
    for _ in range(15):
        state, metrics = chunk_fn(state, pool)
        if compactor.observe(float(jax.device_get(metrics["n_valid_mean"]))):
            chunk_fn = build_chunk(compactor.apply(cfg))
    jax.block_until_ready(metrics)
    K = compactor.k
    q_stride = resolve_query_stride(cfg.sampling, scene.aabb)
    print(f"settled K={K} stride={q_stride}")

    def model_fn(x, d=None):
        return model.apply(state.params, x, d)

    fused_fn = make_fused_ray_renderer(
        state.params, n_layers=cfg.model.n_layers,
        skip=tuple(cfg.model.skip), n_freqs=cfg.encoder.n_freqs,
        n_freqs_views=cfg.encoder.n_freqs_views, early_stop_eps=1e-4)

    # frame workload: 9 poses x 800^2 rays, pre-chunked on device
    hwf = [800, 800, 800.0]
    all_rays = []
    for pose in scene.path_poses[:3]:
        ro, rd = get_rays(jnp.asarray(pose), hwf)
        all_rays.append((ro.reshape(-1, 3), rd.reshape(-1, 3)))
    jax.block_until_ready(all_rays)

    for chunksize in (16384, 32768, 65536):
        for name, ffn in (("xla", None), ("fused", fused_fn)):
            renderer = make_chunk_renderer(
                None if ffn is not None else model_fn, grid=state.grid,
                n_samples=cfg.sampling.n_samples, white_bkgd=True,
                near=scene.near, far=scene.far, n_compact=K,
                query_stride=q_stride, fused_render_fn=ffn)
            chunks = []
            for ro, rd in all_rays:
                n = (ro.shape[0] // chunksize) * chunksize
                for c in range(n // chunksize):
                    sl = slice(c * chunksize, (c + 1) * chunksize)
                    chunks.append((ro[sl], rd[sl]))
            jax.block_until_ready(renderer(*chunks[0]))     # compile
            t0 = time.perf_counter()
            for ro, rd in chunks:
                out = renderer(ro, rd)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            rays = len(chunks) * chunksize / dt
            print(f"chunk {chunksize:>6} {name:>5}: {rays:,.0f} rays/s",
                  flush=True)


if __name__ == "__main__":
    main()
