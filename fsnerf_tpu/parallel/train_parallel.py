"""Mesh-sharded training step and chip-tiled frame rendering.

Training: shard_map over the 1-D 'data' mesh axis. Each chip draws its own
ray sub-batch (device index folded into the RNG key), computes local grads,
and the gradient pmean rides ICI — functionally identical math to a
single-chip step with global batch = per-chip batch x n_chips. Params, Adam
state, and the occupancy grid stay replicated (the model is a ~1.2M-param
MLP; SURVEY.md section 2.3).

Rendering: a full frame's rays are sharded across chips with NamedSharding
and the jitted renderer runs SPMD — XLA all-gathers the tiles into the output
frame (replaces the reference's sequential chunk loop, rendering.py:152-171).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fsnerf_tpu.core.losses import psnr_from_mse
from fsnerf_tpu.ops import occgrid as og
from fsnerf_tpu.train.state import TrainState
from fsnerf_tpu.train.step import make_masks


def make_parallel_train_step(
    model,
    cfg,
    optimizer: optax.GradientTransformation,
    pool,
    scene,
    mesh: Mesh,
    axis: str = "data",
) -> Callable[[TrainState], Tuple[TrainState, dict]]:
    """Data-parallel train step over `mesh`.

    Per-chip batch is cfg.train.batch_size // n_devices rays, so the global
    batch matches the single-chip configuration exactly.
    """
    from fsnerf_tpu.core.losses import mse, occlusion_reg, weight_reg
    from fsnerf_tpu.render.renderer import (
        render_rays_hierarchical,
        render_rays_occgrid,
    )

    s_cfg, t_cfg = cfg.sampling, cfg.train
    n_dev = mesh.devices.size
    local_bs = max(1, t_cfg.batch_size // n_dev)
    use_occl = t_cfg.beta is not None
    use_wreg = t_cfg.ao is not None
    Ts = int(t_cfg.reg_ratio * t_cfg.Td)

    def loss_fn(params, batch, grid, key, step):
        rays_o, rays_d, rgb_gt = batch
        pos_mask, dir_mask = make_masks(cfg, step)

        def model_fn(x, d=None):
            return model.apply(params, x, d, pos_mask=pos_mask,
                               dir_mask=dir_mask)

        if s_cfg.strategy == "occgrid":
            out = render_rays_occgrid(
                model_fn, rays_o, rays_d, grid, s_cfg.n_samples,
                render_step_size=s_cfg.render_step_size,
                key=key if s_cfg.perturb else None,
                white_bkgd=cfg.data.white_bkgd,
                n_compact=s_cfg.n_compact,
                early_stop_eps=s_cfg.early_stop_eps)
            main_mse = mse(out["rgb"], rgb_gt)
            loss = main_mse
        else:
            coarse, out = render_rays_hierarchical(
                model_fn, rays_o, rays_d, scene.near, scene.far,
                s_cfg.n_samples, s_cfg.n_fine,
                key=key if s_cfg.perturb else None,
                white_bkgd=cfg.data.white_bkgd)
            main_mse = mse(out["rgb"], rgb_gt)
            loss = main_mse + mse(coarse["rgb"], rgb_gt)

        if use_occl:
            loss = loss + occlusion_reg(out["sigmas"], out["t_vals"],
                                        out["mask"], t_cfg.occ_a, t_cfg.occ_b,
                                        t_cfg.occ_func)
        if use_wreg:
            loss = loss + jnp.where(step < Ts,
                                    t_cfg.ao * weight_reg(params, t_cfg.reg),
                                    0.0)
        return loss, main_mse

    def sharded_step(state: TrainState) -> Tuple[TrainState, dict]:
        my = jax.lax.axis_index(axis)
        key, k_batch, k_render, k_grid = jax.random.split(state.key, 4)
        # per-chip distinct batch + jitter
        batch = pool.sample(jax.random.fold_in(k_batch, my), local_bs)
        k_render = jax.random.fold_in(k_render, my)

        (loss, main_mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, state.grid, k_render, state.step)

        # the gradient all-reduce over ICI
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        main_mse = jax.lax.pmean(main_mse, axis)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)

        if s_cfg.strategy == "occgrid":
            pos_mask, _ = make_masks(cfg, state.step)

            def density_fn(x):
                return model.apply(params, x, pos_mask=pos_mask)[..., 0]

            def do_update(grid):
                # replicated update: same key on every chip -> same grid
                return og.update(
                    grid, density_fn, k_grid, state.step,
                    render_step_size=s_cfg.render_step_size,
                    occ_thre=s_cfg.occ_thre, ema_decay=s_cfg.ema_decay,
                    warmup_steps=s_cfg.warmup_steps,
                    update_parts=s_cfg.update_parts,
                    update_interval=s_cfg.update_interval)

            grid = jax.lax.cond(state.step % s_cfg.update_interval == 0,
                                do_update, lambda g: g, state.grid)
        else:
            grid = state.grid

        metrics = {"loss": loss, "psnr": psnr_from_mse(main_mse),
                   "occupancy": og.occupancy_fraction(grid)}
        new_state = TrainState(params=params, opt_state=opt_state, grid=grid,
                               step=state.step + 1, key=key)
        return new_state, metrics

    smapped = jax.shard_map(
        sharded_step, mesh=mesh,
        in_specs=(P(),), out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=0)


def render_rays_tiled(
    render_fn: Callable,
    rays_o: jax.Array,
    rays_d: jax.Array,
    mesh: Mesh,
    axis: str = "data",
):
    """SPMD full-frame ray rendering: rays sharded over chips, outputs
    gathered. `render_fn(rays_o, rays_d) -> dict` must be shape-polymorphic
    over the ray axis. Ray count must be padded to a multiple of n_devices by
    the caller (render/renderer.py pads frames anyway).
    """
    shard = NamedSharding(mesh, P(axis))
    rays_o = jax.device_put(rays_o, shard)
    rays_d = jax.device_put(rays_d, shard)
    fn = jax.jit(render_fn, in_shardings=(shard, shard))
    return fn(rays_o, rays_d)
