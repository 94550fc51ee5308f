"""The jitted training step (reference hot loop: run-nerf.py:232-299).

One fully-fused XLA program per step:
  batch draw (on-device) -> sample lattice -> occupancy mask -> MLP eval
  -> fused volume integration -> MSE + regularizers -> grads -> Adam update
  -> (every update_interval steps) occupancy-grid EMA refresh via lax.cond.

The reference performs these as separate CUDA launches with host round-trips
(DataLoader batch at :236-240, nerfacc sampling/rendering at :243-252, a
Python per-ray loop for the occlusion regularizer, a named_parameters loop
for weight decay, and update_every_n_steps at :287-295). Here the entire step
is one traced function: `make_train_step` returns a (state, pool) ->
(state, metrics) closure you can jit, donate, scan over, or shard over a
mesh (parallel/train_parallel.py wraps it with sharding constraints). Pass
the pool THROUGH the jit boundary — see data/pool.py for why a closed-over
pool costs minutes of compile per executable at full scale.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fsnerf_tpu.core.encoding import freq_mask
from fsnerf_tpu.core.losses import mse, occlusion_reg, psnr_from_mse, weight_reg
from fsnerf_tpu.core.schedules import make_schedule
from fsnerf_tpu.ops import occgrid as og
from fsnerf_tpu.render.renderer import (
    render_rays_hierarchical,
    render_rays_occgrid,
)
from fsnerf_tpu.train.state import TrainState


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam with the reference LR schedule (run-nerf.py:216-223).

    torch.optim.Adam defaults: betas (0.9, 0.999), eps 1e-8 applied outside
    the sqrt — optax.adam with eps_root=0 matches exactly.
    """
    return optax.adam(learning_rate=make_schedule(cfg), b1=0.9, b2=0.999,
                      eps=1e-8, eps_root=0.0)


def resolve_fused_kernel(cfg) -> bool:
    """Resolve ModelConfig.fused_kernel's auto mode (None).

    Auto = ON for accelerator backends (measured ~10% faster training on v5e
    at equal quality), OFF on the CPU backend where Mosaic kernels cannot
    compile. Fused train kernels exist for the plain NeRF with a raw sigma
    head (ops/pallas/mlp_train.py) and for SiNeRF (ops/pallas/siren.py —
    SiNeRF's built-in ReLU sigma head makes density_activation moot); other
    configs resolve False.
    """
    want = cfg.model.fused_kernel
    if want is None:
        want = jax.default_backend() != "cpu"
    if cfg.encoder.no_dirs:
        return False                # fused kernels bake in the view branch
    skip = tuple(cfg.model.skip)
    ok_nerf = (cfg.model.model == "nerf"
               and cfg.model.density_activation == "none"
               # the kernel's skip concat must feed a TRUNK layer
               # (ops/pallas/mlp.py::prep_params raises otherwise)
               and (not skip or max(skip) < cfg.model.n_layers - 1))
    return bool(want and (ok_nerf or cfg.model.model == "sinerf"))


def make_masks(cfg, step):
    """FreeNeRF annealed frequency masks for the current step (None = off)."""
    T = cfg.encoder.freq_reg_end
    if T <= 0:
        return None, None
    return (freq_mask(cfg.encoder.n_freqs, step, T),
            freq_mask(cfg.encoder.n_freqs_views, step, T))


def make_loss_fn(model, cfg, scene) -> Callable:
    """The ONE training loss builder, shared by the single-chip step and the
    mesh-sharded step (parallel/train_parallel.py) so the two paths can never
    fork numerically.

    Returns loss_fn(params, batch, grid, key, step) ->
      (loss, (main_mse, samples_per_ray)).
    Covers: occgrid/hierarchical strategies, the fused Pallas train kernel,
    FreeNeRF frequency masks, and the occlusion/weight regularizers
    (reference run-nerf.py:256-279 semantics, incl. the quirk that beta gates
    but does not scale the occlusion term, run-nerf.py:261-264).
    """
    s_cfg, t_cfg = cfg.sampling, cfg.train
    white_bkgd = cfg.data.white_bkgd
    # trainable fused Pallas MLP (custom VJP): nerf raw-sigma, or sinerf
    use_fused = resolve_fused_kernel(cfg)
    if use_fused:
        if cfg.model.model == "sinerf":
            from fsnerf_tpu.ops.pallas.siren import make_fused_siren_model_fn
            fused_apply = make_fused_siren_model_fn(cfg.model, cfg.encoder)
        else:
            from fsnerf_tpu.ops.pallas.mlp_train import (
                make_fused_train_model_fn,
            )
            fused_apply = make_fused_train_model_fn(cfg.model, cfg.encoder)
    use_occl = t_cfg.beta is not None
    use_wreg = t_cfg.ao is not None
    Ts = int(t_cfg.reg_ratio * t_cfg.Td)            # run-nerf.py:270
    q_stride = og.resolve_query_stride(s_cfg, scene.aabb)

    def loss_fn(params, batch, grid, key, step):
        rays_o, rays_d, rgb_gt = batch
        pos_mask, dir_mask = make_masks(cfg, step)

        def model_fn(x, d=None):
            if use_fused and d is not None:
                return fused_apply(params, x, d, pos_mask, dir_mask)
            return model.apply(params, x, d, pos_mask=pos_mask,
                               dir_mask=dir_mask)

        if s_cfg.strategy == "occgrid":
            out = render_rays_occgrid(
                model_fn, rays_o, rays_d, grid, s_cfg.n_samples,
                render_step_size=s_cfg.render_step_size,
                key=key if s_cfg.perturb else None, white_bkgd=white_bkgd,
                n_compact=s_cfg.n_compact,
                early_stop_eps=s_cfg.early_stop_eps,
                query_stride=q_stride)
            loss = mse(out["rgb"], rgb_gt)
            main_mse = loss
            outs = (out,)
            aux_spr = jnp.mean(jnp.sum(out["mask"].astype(jnp.float32), -1))
            # mean PRE-compaction per-ray valid count — the adaptive-
            # compaction control signal (train/loop.py). Mean, not a high
            # quantile: dense-K cost is paid per ray like ragged packing pays
            # the mean, and tail rays above K get an unbiased coarser
            # quadrature (compact_samples spread), measured quality-neutral
            # even at K far below the p97 tail (3k-step held-out A/B:
            # 24.9/25.1/24.7/25.4 dB at K=192/96/64/32 on the sphere scene).
            aux_nv = jnp.mean(out["n_valid"])
        else:
            coarse, fine = render_rays_hierarchical(
                model_fn, rays_o, rays_d, scene.near, scene.far,
                s_cfg.n_samples, s_cfg.n_fine,
                key=key if s_cfg.perturb else None, white_bkgd=white_bkgd)
            main_mse = mse(fine["rgb"], rgb_gt)
            loss = main_mse + mse(coarse["rgb"], rgb_gt)
            outs = (fine,)
            aux_spr = jnp.asarray(float(s_cfg.n_samples + s_cfg.n_fine))
            aux_nv = aux_spr

        if use_occl:
            out = outs[0]
            loss = loss + occlusion_reg(
                out["sigmas"], out["t_vals"], out["mask"],
                t_cfg.occ_a, t_cfg.occ_b, t_cfg.occ_func)

        if use_wreg:
            wr = weight_reg(params, t_cfg.reg)
            loss = loss + jnp.where(step < Ts, t_cfg.ao * wr, 0.0)

        return loss, (main_mse, aux_spr, aux_nv)

    return loss_fn


def maybe_update_grid(model, cfg, params, grid, step, k_grid,
                      shard_axes=None):
    """Occupancy-grid EMA refresh every update_interval steps (shared by the
    single-chip and mesh-sharded steps; reference run-nerf.py:287-295).

    shard_axes: ((axis_name, axis_size), ...) plan when called from the
    shard_map step — the refresh's density eval is then partitioned over the
    mesh and all-gathered (exact; see ops/occgrid.py::update)."""
    s_cfg = cfg.sampling
    if s_cfg.strategy != "occgrid":
        return grid
    pos_mask, _ = make_masks(cfg, step)

    # NOTE: deliberately the XLA path even when the fused train kernel is on:
    # an A/B with ops/pallas/mlp.py::make_fused_density_fn measured the
    # Pallas density kernel ~4% SLOWER end-to-end (267k -> 255k rays/s at
    # K=64) — forward-only workloads pipeline better through XLA, the same
    # result as the round-1 fused inference kernel (docs/ROADMAP.md).
    def density_fn(x):
        return model.apply(params, x, pos_mask=pos_mask)[..., 0]

    interval = resolve_update_interval(s_cfg, step)
    hold = s_cfg.grid_hold_steps
    if hold < 0:                       # auto: hold culling through the
        hold = cfg.encoder.freq_reg_end or 0   # freq-anneal window

    def do_update(g):
        return og.update(
            g, density_fn, k_grid, step,
            render_step_size=s_cfg.render_step_size,
            occ_thre=s_cfg.occ_thre, ema_decay=s_cfg.ema_decay,
            warmup_steps=s_cfg.warmup_steps,
            hold_steps=hold,
            update_parts=s_cfg.update_parts,
            update_interval=interval,
            shard_axes=shard_axes)

    return jax.lax.cond(step % interval == 0, do_update, lambda g: g, grid)


def resolve_update_interval(s_cfg, step):
    """Effective grid-refresh interval at `step` (traced-safe).

    nerfacc refreshes every 16 steps for the whole run (reference
    run-nerf.py:287-295); once the grid's EMA has converged that cadence
    buys nothing — the density pass costs ~13% of steady-state step time —
    so after update_interval_late_start the interval switches to
    update_interval_late (full-scale quality A/B in BASELINE.md r3).
    The late interval must be a multiple of the early one so the switch
    lands on a refresh boundary.
    """
    early = s_cfg.update_interval
    late = s_cfg.update_interval_late
    if not late or late == early:
        return early
    return jnp.where(step >= s_cfg.update_interval_late_start, late, early)


def make_train_step(
    model,
    cfg,
    optimizer: optax.GradientTransformation,
    pool,
    scene,
) -> Callable[[TrainState, "RayPool"], Tuple[TrainState, dict]]:
    """Build the per-step closure: step(state, pool) -> (state, metrics).

    Args:
      model: flax module (NeRF/SiNeRF).
      cfg: Config.
      pool: RayPool — used here only as the default for the step's pool
        argument. The pool MUST flow through the jit boundary as an
        argument (RayPool is a pytree): closing over it embeds the whole
        ray set as HLO constants, which at full scale (800^2 x 8 views)
        made every chunk compile serialize ~295 MB (~170-220 s each).
      scene: dataset metadata object exposing .near/.far (hierarchical mode).
    """
    t_cfg = cfg.train
    loss_fn = make_loss_fn(model, cfg, scene)
    default_pool = pool

    def train_step(state: TrainState, pool=None) -> Tuple[TrainState, dict]:
        pool = default_pool if pool is None else pool
        key, k_batch, k_render, k_grid = jax.random.split(state.key, 4)
        batch = pool.sample(k_batch, t_cfg.batch_size)

        (loss, (main_mse, spr, nv_q)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.params, batch, state.grid, k_render, state.step)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)

        grid = maybe_update_grid(model, cfg, params, state.grid, state.step,
                                 k_grid)

        metrics = {
            "loss": loss,
            "psnr": psnr_from_mse(main_mse),
            "occupancy": og.occupancy_fraction(grid),
            # MLP-evaluated (unmasked) samples per ray — the pruning signal
            "samples_per_ray": spr,
            # mean pre-compaction valid count — adaptive-K control
            "n_valid_mean": nv_q,
        }
        new_state = TrainState(params=params, opt_state=opt_state, grid=grid,
                               step=state.step + 1, key=key)
        return new_state, metrics

    return train_step


def make_train_chunk(train_step: Callable, n: int) -> Callable:
    """lax.scan over `n` steps — one dispatch for n optimizer updates.

    Used by the benchmark and long headless runs to eliminate per-step host
    dispatch overhead entirely. chunk(state, pool): the pool rides the jit
    boundary as an argument (loop-invariant inside the scan) so the big ray
    arrays never become HLO constants.
    """
    def chunk(state: TrainState, pool=None) -> Tuple[TrainState, dict]:
        def body(s, _):
            s2, m = train_step(s, pool)
            return s2, m
        state, metrics = jax.lax.scan(body, state, None, length=n)
        return state, jax.tree.map(lambda x: x[-1], metrics)
    return chunk


def init_state(model, cfg, optimizer, aabb, key) -> TrainState:
    """Fresh TrainState (reference init_models, run-nerf.py:55-102)."""
    from fsnerf_tpu.core.models import init_params

    k_init, k_run = jax.random.split(jax.random.key(cfg.train.seed)
                                     if key is None else key)
    params = init_params(model, k_init)
    opt_state = optimizer.init(params)
    _, q_dilation = og.resolve_query_plan(cfg.sampling, aabb)
    grid = og.create(aabb, cfg.sampling.grid_resolution,
                     cfg.sampling.grid_levels, query_dilation=q_dilation)
    return TrainState(params=params, opt_state=opt_state, grid=grid,
                      step=jnp.zeros((), jnp.int32), key=k_run)
