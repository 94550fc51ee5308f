"""A/B: SiNeRF fused-kernel backward mode (TPU).

Arms: recompute backward (block 256 — its f32 y-list VMEM ceiling) vs the
saved-acts backward (forward streams h_i + a_i cos(a_i y_i) bf16 to HBM;
backward has NO trunk GEMMs and NO transcendentals) at block 256/512/1024.
Same sinerf bench workload as ab_siren_block.py (occgrid, adaptive K).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_siren_save_acts.py
"""

import time

import jax


def run_arm(save_acts: bool, block_rows: int):
    import fsnerf_tpu.ops.pallas.siren as sp
    from fsnerf_tpu.config import (Config, DataConfig, ModelConfig,
                                   SamplingConfig, TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step)

    orig = sp.make_fused_siren_model_fn.__wrapped__ if hasattr(
        sp.make_fused_siren_model_fn, "__wrapped__") else \
        sp.make_fused_siren_model_fn

    def patched(model_cfg, enc_cfg=None, **kw):
        kw.setdefault("block_rows", block_rows)
        kw.setdefault("save_acts", save_acts)
        return orig(model_cfg, enc_cfg, **kw)

    sp.make_fused_siren_model_fn = patched
    try:
        B, chunk = 1024, 100
        cfg = Config(
            data=DataConfig(dataset="sphere", white_bkgd=True),
            model=ModelConfig(model="sinerf"),
            sampling=SamplingConfig(strategy="occgrid", n_samples=512,
                                    grid_resolution=128, grid_levels=1),
            train=TrainConfig(n_iters=1800, batch_size=B, dtype="bfloat16"),
        )
        scene = SphereScene(n_imgs=8, hw=128, white_bkgd=True)
        model = make_model(cfg)
        pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
        optimizer = make_optimizer(cfg)
        state = init_state(model, cfg, optimizer, scene.aabb,
                           jax.random.key(0))

        def build_chunk(c):
            step_fn = make_train_step(model, c, optimizer, pool, scene)
            return jax.jit(make_train_chunk(step_fn, chunk), donate_argnums=0)

        compactor = CompactionController(cfg)
        chunk_fn = build_chunk(cfg)
        for _ in range(12):
            state, metrics = chunk_fn(state, pool)
            if compactor.observe(
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
        print(f"siren save_acts={save_acts} block={block_rows}: "
              f"{rays:,.0f} rays/s ({dt / 5 * 10:.2f} ms/step) "
              f"K={compactor.k} train_psnr={float(m['psnr']):.2f}",
              flush=True)
    except Exception as e:
        print(f"siren save_acts={save_acts} block={block_rows}: FAILED "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    finally:
        sp.make_fused_siren_model_fn = orig


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    for sa, br in ((False, 256), (True, 256), (True, 512), (True, 1024)):
        run_arm(sa, br)


if __name__ == "__main__":
    main()
