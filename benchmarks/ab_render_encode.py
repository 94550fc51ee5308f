"""A/B: fused ray-march render kernel with XLA-side vs IN-KERNEL encoding.

The render kernel's dominant HBM input stream is the per-sample positional
encoding ([., 64] bf16 = 128 B/sample plus the XLA-side encode/pad/transpose
glue per render chunk); in-kernel encoding (mlp_train.py::_encode_block,
periodic-4 lane layout) streams raw [., 16] f32 coordinates instead
(64 B/sample) and encodes inside the alive predicate so early-exited chunks
skip the encode too. Same methodology as bench.py's fused render section:
9 frames x 16384-ray chunks at the settled eval K over a trained grid.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_render_encode.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fsnerf_tpu.config import (Config, DataConfig, SamplingConfig,
                                   TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.rays import get_rays
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.ops.pallas.render import make_fused_ray_renderer
    from fsnerf_tpu.render.renderer import make_chunk_renderer
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)
    from fsnerf_tpu.ops.occgrid import resolve_query_stride

    B, chunk = 1024, 100
    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        sampling=SamplingConfig(strategy="occgrid", n_samples=512,
                                grid_resolution=128, grid_levels=1),
        train=TrainConfig(n_iters=600, batch_size=B, dtype="bfloat16"),
    )
    scene = SphereScene(n_imgs=8, hw=800, white_bkgd=True)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))

    compactor = CompactionController(cfg)

    def build_chunk(c):
        step_fn = make_train_step(model, c, optimizer, pool, scene)
        return jax.jit(make_train_chunk(step_fn, chunk), donate_argnums=0)

    chunk_fn = build_chunk(cfg)
    for _ in range(6):
        state, metrics = chunk_fn(state, pool)
        if compactor.observe(float(jax.device_get(metrics["n_valid_mean"]))):
            chunk_fn = build_chunk(compactor.apply(cfg))
    k_settled = compactor.k
    print(f"# trained 600 steps, settled K {k_settled}")

    chunks = []
    for pose in scene.path_poses[:9]:
        ro, rd = get_rays(jnp.asarray(pose), scene.hwf)
        ro = ro.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        n = (ro.shape[0] // 16384) * 16384
        for c in range(n // 16384):
            sl = slice(c * 16384, (c + 1) * 16384)
            chunks.append((jnp.asarray(ro[sl]), jnp.asarray(rd[sl])))
    jax.block_until_ready(chunks)

    qs = resolve_query_stride(cfg.sampling, scene.aabb)
    for arm in (False, True):
        fused_fn = make_fused_ray_renderer(
            state.params, n_layers=cfg.model.n_layers,
            skip=tuple(cfg.model.skip), n_freqs=cfg.encoder.n_freqs,
            n_freqs_views=cfg.encoder.n_freqs_views, early_stop_eps=1e-4,
            fused_encode=arm)
        renderer = make_chunk_renderer(
            None, grid=state.grid, n_samples=cfg.sampling.n_samples,
            white_bkgd=True, near=scene.near, far=scene.far,
            n_compact=k_settled, query_stride=qs, fused_render_fn=fused_fn)
        out = renderer(*chunks[0])                      # compile
        jax.block_until_ready(out)
        out = renderer(*chunks[1])                      # prime steady state
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for ro, rd in chunks:
            out = renderer(ro, rd)
        anchor = float(np.asarray(
            jax.tree_util.tree_leaves(out)[0]).ravel()[0])  # real device fetch
        dt = time.perf_counter() - t0
        print(f"# encode {'in-kernel' if arm else 'xla-side'}: "
              f"{len(chunks) * 16384 / dt:,.0f} rays/s "
              f"({dt:.2f}s, anchor {anchor:.4f})")


if __name__ == "__main__":
    main()
