"""Stage-ablation profile of the steady-state training step (TPU).

VERDICT r2 item 2: publish where step time actually goes. Rather than parse
a trace protobuf, each pipeline stage is timed at the exact steady-state
shapes the full step runs at (settled compaction K, converged grid).

Measurement note: per-dispatch latency through the axon remote path is
~1.3 ms — an isolated jit call of ANY stage measures mostly dispatch. Each
stage is therefore timed amortized inside a lax.scan of `SCAN_N`
applications, with an epsilon data-coupling from iteration to iteration
(every float input leaf gets `+ s * 1e-32`, keys get fold_in) so XLA can
neither hoist the stage out of the loop nor overlap iterations.

Run:  python benchmarks/profile_step.py            (~3 min on the v5e chip)
Output: one table on stdout — paste into BASELINE.md.

Optionally pass --trace DIR to also capture a jax.profiler trace of the
steady-state chunk for TensorBoard.
"""

import argparse
import time

import jax
import jax.numpy as jnp

SCAN_N = 100


def timeit(fn, *args, reps=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def scan_time(fn, *args, reps=5, warmup=2):
    """Per-application seconds of fn(*args), amortized over a SCAN_N-long
    serial scan with epsilon coupling (see module docstring)."""

    def perturb(leaf, s, i):
        leaf = jnp.asarray(leaf)
        if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            return jax.random.fold_in(leaf, i)
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf + (s * 1e-32).astype(leaf.dtype)
        return leaf

    def body(s, i):
        a = jax.tree.map(lambda l: perturb(l, s, i), args)
        out = fn(*a)
        # consume EVERY output leaf, else XLA dead-codes whole sub-graphs
        # (e.g. the entire backward pass when only the loss is probed)
        s2 = sum(jnp.asarray(l).ravel()[0].astype(jnp.float32)
                 for l in jax.tree.leaves(out))
        return jnp.where(jnp.isfinite(s2), s2, 0.0) * 1e-20, None

    looped = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0),
                                          jnp.arange(SCAN_N))[0])
    return timeit(looped, reps=reps, warmup=warmup) / SCAN_N


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import Config, DataConfig, SamplingConfig, TrainConfig
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.ops import occgrid as og
    from fsnerf_tpu.ops.sampling import (compact_samples_uniform,
                                         sample_points, uniform_samples)
    from fsnerf_tpu.ops.volrend import volume_render
    from fsnerf_tpu.train.loop import CompactionController
    from fsnerf_tpu.train.step import (init_state, make_loss_fn,
                                       make_optimizer, make_train_chunk,
                                       make_train_step)

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

    def build_chunk(c, n=100):
        step_fn = make_train_step(model, c, optimizer, pool, scene)
        return jax.jit(make_train_chunk(step_fn, n), donate_argnums=0)

    compactor = CompactionController(cfg)
    chunk_fn = build_chunk(cfg)
    for _ in range(9):
        state, metrics = chunk_fn(state, pool)
        if compactor.observe(float(jax.device_get(metrics["n_valid_mean"]))):
            chunk_fn = build_chunk(compactor.apply(cfg))
    state, metrics = chunk_fn(state, pool)          # prime the settled executable
    jax.block_until_ready(metrics)
    K = compactor.k
    ccfg = compactor.apply(cfg)
    s = ccfg.sampling
    q_stride = og.resolve_query_stride(s, scene.aabb)
    print(f"settled K={K} query_stride={q_stride}")

    # ---- full steady-state step (per-step seconds, amortized over a
    # 100-step scan chunk; a non-donating jit so the same state re-runs)
    step_fn = make_train_step(model, ccfg, optimizer, pool, scene)
    chunk_nodonate = jax.jit(make_train_chunk(step_fn, 100))
    t_full = timeit(lambda: chunk_nodonate(state, pool)[1]["loss"], reps=3,
                    warmup=1) / 100

    # ---- stage shapes
    key = jax.random.key(1)
    batch = pool.sample(key, B)
    rays_o, rays_d, rgb_gt = batch
    grid = state.grid
    params = state.params
    loss_fn = make_loss_fn(model, ccfg, scene)

    rows = []

    def stage(name, fn, *a, per_step=1.0):
        t = scan_time(fn, *a) * per_step
        rows.append((name, t))
        return t

    # batch draw
    stage("pool.sample", lambda k: pool.sample(k, B), key)

    # sampling lattice (uniform_samples + sample_points)
    def f_lattice(ro, rd, k):
        t_mid, deltas, valid = uniform_samples(
            ro, rd, og.outer_aabb(grid), s.n_samples, key=k,
            step_size=s.render_step_size)
        return sample_points(ro, rd, t_mid), t_mid, deltas, valid
    stage("lattice+points", f_lattice, rays_o, rays_d, key)

    x, t_mid, deltas, valid = jax.jit(f_lattice)(rays_o, rays_d, key)
    xq = x[:, q_stride // 2::q_stride] if q_stride > 1 else x

    # occupancy query (the row gather + compare-select)
    stage("occ query_with_density", lambda q: og.query_with_density(grid, q),
          xq)

    # early-termination mask math (cumsum/exp chain, no gather)
    occupied, occ_val = jax.jit(
        lambda q: og.query_with_density(grid, q))(xq)

    def f_mask(occ, val, d, v):
        R = d.shape[0]
        def expand(g):
            if q_stride == 1:
                return g
            return jnp.broadcast_to(
                g[..., None], (*g.shape, q_stride)).reshape(R, s.n_samples)
        od = jnp.where(v, expand(val) * (d / s.render_step_size), 0.0)
        cum = jnp.cumsum(od, axis=-1)
        vis = jnp.exp(-(cum - od)) > s.early_stop_eps
        return v & expand(occ) & vis
    stage("early-term mask", f_mask, occupied, occ_val, deltas, valid)
    mask = jax.jit(f_mask)(occupied, occ_val, deltas, valid)

    # compaction (2-operand payload sort) + recompute points
    def f_compact(t, dt, m, ro, rd):
        tk, dk, mk = compact_samples_uniform(t, dt[:, 0], m, K)
        return sample_points(ro, rd, tk), tk, dk, mk
    stage("compaction+points", f_compact, t_mid, deltas, mask, rays_o, rays_d)
    xk, tk, dk, mk = jax.jit(f_compact)(t_mid, deltas, mask, rays_o, rays_d)

    # MLP fwd+bwd at [B, K] through the real loss (incl. volrend + MSE)
    dirs = jnp.broadcast_to(rays_d[:, None, :], xk.shape)

    def f_mlp(p, xx, dd, tt, ddl, mm, gt):
        def loss(p):
            from fsnerf_tpu.train.step import resolve_fused_kernel
            if resolve_fused_kernel(ccfg):
                from fsnerf_tpu.ops.pallas.mlp_train import (
                    make_fused_train_model_fn)
                out4 = make_fused_train_model_fn(ccfg.model, ccfg.encoder)(
                    p, xx, dd, None, None).astype(jnp.float32)
            else:
                out4 = model.apply(p, xx, dd).astype(jnp.float32)
            o = volume_render(out4[..., 3], out4[..., :3], tt, ddl, mm, 1.0)
            return jnp.mean(jnp.square(o["rgb"] - gt))
        l, g = jax.value_and_grad(loss)(p)
        return l, g
    stage("MLP+volrend fwd+bwd", f_mlp, params, xk, dirs, tk, dk, mk, rgb_gt)

    # Adam
    _, grads = jax.jit(f_mlp)(params, xk, dirs, tk, dk, mk, rgb_gt)

    def f_adam(g, o, p):
        u, o2 = optimizer.update(g, o, p)
        import optax
        return optax.apply_updates(p, u)
    stage("adam update", f_adam, grads, state.opt_state, params)

    # grid refresh, amortized (one partial update / update_interval)
    def f_grid(g, k):
        def density_fn(xx):
            return model.apply(params, xx)[..., 0]
        return og.update(g, density_fn, k, jnp.asarray(1000, jnp.int32),
                         render_step_size=s.render_step_size,
                         occ_thre=s.occ_thre, ema_decay=s.ema_decay,
                         warmup_steps=s.warmup_steps,
                         update_parts=s.update_parts,
                         update_interval=s.update_interval)
    stage(f"grid refresh /{s.update_interval}", f_grid, grid, key,
          per_step=1.0 / s.update_interval)

    total = sum(t for _, t in rows)
    print(f"\n{'stage':<28}{'ms/step':>10}{'% of step':>11}")
    for name, t in rows:
        print(f"{name:<28}{t * 1e3:>10.3f}{100 * t / t_full:>10.1f}%")
    print(f"{'-' * 49}")
    print(f"{'stage sum':<28}{total * 1e3:>10.3f}{100 * total / t_full:>10.1f}%")
    print(f"{'FULL STEP (chunked)':<28}{t_full * 1e3:>10.3f}{100.0:>10.1f}%")
    print(f"{'residual (overlap/fusion)':<28}"
          f"{(t_full - total) * 1e3:>10.3f}"
          f"{100 * (t_full - total) / t_full:>10.1f}%")
    print(f"\nthroughput: {B / t_full:,.0f} rays/s/chip")

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = chunk_nodonate(state, pool)
            jax.block_until_ready(out)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
