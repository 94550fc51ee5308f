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
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fsnerf_tpu.core.losses import psnr_from_mse
from fsnerf_tpu.ops import occgrid as og
from fsnerf_tpu.train.state import TrainState
from fsnerf_tpu.train.step import make_loss_fn, maybe_update_grid


def make_parallel_train_step(
    model,
    cfg,
    optimizer: optax.GradientTransformation,
    pool,
    scene,
    mesh: Mesh,
    axis=None,
) -> Callable[..., Tuple[TrainState, dict]]:
    """Data-parallel train step over `mesh` (1-D single-slice or 2-D
    hybrid DCN x ICI — see parallel/mesh.py).

    Per-chip batch is cfg.train.batch_size // n_devices rays, so the global
    batch matches the single-chip configuration exactly. The loss is the
    SAME make_loss_fn closure the single-chip step uses (incl. the fused
    Pallas kernel and the samples_per_ray metric) — only the batch draw, the
    gradient pmean (hierarchical: ICI within a slice, DCN across slices),
    and the metric pmeans are parallel-specific.
    """
    t_cfg = cfg.train
    n_dev = mesh.devices.size
    local_bs = max(1, t_cfg.batch_size // n_dev)
    loss_fn = make_loss_fn(model, cfg, scene)
    axes = (axis,) if isinstance(axis, str) else tuple(mesh.axis_names)
    # static (name, size) plan for the sharded grid refresh (sizes cannot be
    # queried with lax.axis_size inside the refresh's lax.cond)
    shard_plan = tuple((a, int(mesh.shape[a])) for a in axes)

    def _global_index():
        """Linear device index across all mesh axes (row-major)."""
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * jax.lax.axis_size(a) + jax.lax.axis_index(a)
        return idx

    def sharded_step(state: TrainState, pool) -> Tuple[TrainState, dict]:
        my = _global_index()
        key, k_batch, k_render, k_grid = jax.random.split(state.key, 4)
        # per-chip distinct batch + jitter
        batch = pool.sample(jax.random.fold_in(k_batch, my), local_bs)
        k_render = jax.random.fold_in(k_render, my)

        (loss, (main_mse, spr, nv_q)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.params, batch, state.grid, k_render, state.step)

        # gradient all-reduce: over ICI on a 1-D mesh; on a hybrid mesh XLA
        # lowers the multi-axis pmean hierarchically (ICI first, then one
        # DCN hop of the already-reduced values)
        grads = jax.lax.pmean(grads, axes)
        loss = jax.lax.pmean(loss, axes)
        main_mse = jax.lax.pmean(main_mse, axes)
        spr = jax.lax.pmean(spr, axes)
        nv_q = jax.lax.pmean(nv_q, axes)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)

        # sharded refresh: cell indices + jitter replicated (same key on
        # every chip), the density MLP eval partitioned over the mesh and
        # all-gathered — bitwise-equal to the replicated update at 1/n_dev
        # of the refresh FLOPs per chip (ops/occgrid.py::update)
        grid = maybe_update_grid(model, cfg, params, state.grid, state.step,
                                 k_grid, shard_axes=shard_plan)

        metrics = {"loss": loss, "psnr": psnr_from_mse(main_mse),
                   "occupancy": og.occupancy_fraction(grid),
                   "samples_per_ray": spr, "n_valid_mean": nv_q}
        new_state = TrainState(params=params, opt_state=opt_state, grid=grid,
                               step=state.step + 1, key=key)
        return new_state, metrics

    # pool as a replicated ARGUMENT (RayPool is a pytree) — a closed-over
    # pool would be embedded as HLO constants (~295 MB executables at full
    # scale; see data/pool.py). default_pool keeps step(state) call sites
    # working; product paths pass the pool explicitly.
    default_pool = pool
    smapped = jax.shard_map(
        sharded_step, mesh=mesh,
        in_specs=(P(), P()), out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(smapped, donate_argnums=0)

    def step(state: TrainState, pool=None):
        return jitted(state, default_pool if pool is None else pool)

    return step


def render_rays_tiled(
    render_fn: Callable,
    rays_o: jax.Array,
    rays_d: jax.Array,
    mesh: Mesh,
    axis=None,
):
    """SPMD full-frame ray rendering: rays sharded over chips (every mesh
    axis is a batch axis), outputs gathered. `render_fn(rays_o, rays_d) ->
    dict` must be shape-polymorphic over the ray axis. Ray count must be
    padded to a multiple of n_devices by the caller (render/renderer.py pads
    frames anyway).
    """
    axes = (axis,) if isinstance(axis, str) else tuple(mesh.axis_names)
    shard = NamedSharding(mesh, P(axes))
    rays_o = jax.device_put(rays_o, shard)
    rays_d = jax.device_put(rays_d, shard)
    fn = jax.jit(render_fn, in_shardings=(shard, shard))
    return fn(rays_o, rays_d)
