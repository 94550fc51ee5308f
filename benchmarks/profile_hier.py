"""Stage-ablation profile of the hierarchical training step (TPU).

Same methodology as profile_step.py (scan-amortized stage timing), at the
hierarchical bench config: 64 coarse + 128 fine, shared-network coarse
reuse, custom-VJP union merge, fused MLP kernels.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/profile_hier.py
"""

import time

import jax
import jax.numpy as jnp

from benchmarks.profile_step import scan_time, timeit


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import (Config, DataConfig, SamplingConfig,
                                   TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.ops.sampling import (sample_pdf, sample_points,
                                         stratified_samples)
    from fsnerf_tpu.render.renderer import _merge_sorted_union
    from fsnerf_tpu.ops.volrend import volume_render
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_chunk, make_train_step,
                                       resolve_fused_kernel)

    B, C, F = 1024, 64, 128
    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        sampling=SamplingConfig(strategy="hierarchical", n_samples=C,
                                n_fine=F),
        train=TrainConfig(n_iters=300, batch_size=B, dtype="bfloat16"),
    )
    scene = SphereScene(n_imgs=8, hw=128, white_bkgd=True)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))
    step_fn = make_train_step(model, cfg, optimizer, pool, scene)
    chunk_fn = jax.jit(make_train_chunk(step_fn, 100))
    jax.block_until_ready(chunk_fn(state, pool)[1]["loss"])
    t_full = timeit(lambda: chunk_fn(state, pool)[1]["loss"],
                    reps=3, warmup=1) / 100

    key = jax.random.key(1)
    batch = pool.sample(key, B)
    rays_o, rays_d, rgb_gt = batch
    params = state.params

    from fsnerf_tpu.ops.pallas.mlp_train import make_fused_train_model_fn
    model_fn = make_fused_train_model_fn(cfg.model, cfg.encoder)

    rows = []

    def stage(name, fn, *a):
        t = scan_time(fn, *a)
        rows.append((name, t))

    # coarse sampling
    def f_coarse_samp(ro, rd, k):
        t_c, d_c = stratified_samples(ro, rd, scene.near, scene.far, C, k)
        return sample_points(ro, rd, t_c), t_c, d_c
    stage("coarse sample+points", f_coarse_samp, rays_o, rays_d, key)
    x_c, t_c, d_c = jax.jit(f_coarse_samp)(rays_o, rays_d, key)
    dirs_c = jnp.broadcast_to(rays_d[:, None, :], x_c.shape)

    # coarse MLP fwd+bwd (through a scalar loss)
    def f_mlp_c(p, xx, dd):
        def loss(p):
            return jnp.sum(model_fn(p, xx, dd, None, None) ** 2)
        return jax.value_and_grad(loss)(p)
    stage("coarse MLP fwd+bwd [B,64]", f_mlp_c, params, x_c, dirs_c)

    out4_c = jax.jit(lambda p, xx, dd: model_fn(p, xx, dd, None, None))(
        params, x_c, dirs_c).astype(jnp.float32)

    # coarse volrend
    def f_vr(o4, t, d):
        return volume_render(o4[..., 3], o4[..., :3], t, d, None, 1.0)
    stage("volrend coarse", f_vr, out4_c, t_c, d_c)
    w = jax.jit(f_vr)(out4_c, t_c, d_c)["weights"]

    # inverse-CDF fine sampling
    def f_pdf(t, ww, k):
        mids = 0.5 * (t[..., 1:] + t[..., :-1])
        t_new = sample_pdf(k, mids, ww[..., 1:-1], F)
        return sample_points(rays_o, rays_d, t_new), t_new
    stage("sample_pdf+points", f_pdf, t_c, w, key)
    x_n, t_new = jax.jit(f_pdf)(t_c, w, key)
    dirs_n = jnp.broadcast_to(rays_d[:, None, :], x_n.shape)

    # fine MLP fwd+bwd
    stage("fine MLP fwd+bwd [B,128]", f_mlp_c, params, x_n, dirs_n)
    out4_n = jax.jit(lambda p, xx, dd: model_fn(p, xx, dd, None, None))(
        params, x_n, dirs_n).astype(jnp.float32)

    # union merge (fwd+bwd through the custom VJP)
    def f_merge(tc, tn, oc, on):
        def loss(oc, on):
            t_cat = jnp.concatenate([tc, tn], axis=-1)
            o_cat = jnp.concatenate([oc, on], axis=-2)
            t_f, m = _merge_sorted_union(t_cat, o_cat)
            return jnp.sum(m ** 2) + jnp.sum(t_f)
        return jax.value_and_grad(loss, argnums=(0, 1))(oc, on)
    stage("union merge fwd+bwd", f_merge, t_c, t_new, out4_c, out4_n)

    # adam
    _, grads = jax.jit(f_mlp_c)(params, x_n, dirs_n)

    def f_adam(g, o, p):
        import optax
        u, o2 = optimizer.update(g, o, p)
        return optax.apply_updates(p, u)
    stage("adam update", f_adam, grads, state.opt_state, params)

    total = sum(t for _, t in rows)
    print(f"\n{'stage':<30}{'ms/step':>10}{'% of step':>11}")
    for name, t in rows:
        print(f"{name:<30}{t * 1e3:>10.3f}{100 * t / t_full:>10.1f}%")
    print(f"{'-' * 51}")
    print(f"{'stage sum':<30}{total * 1e3:>10.3f}{100 * total / t_full:>10.1f}%")
    print(f"{'FULL STEP (chunked)':<30}{t_full * 1e3:>10.3f}{100.0:>10.1f}%")
    print(f"\nthroughput: {B / t_full:,.0f} rays/s/chip")


if __name__ == "__main__":
    main()
