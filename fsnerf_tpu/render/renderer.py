"""Ray/frame/path/video rendering.

Reference counterparts (src/render/rendering.py):
  * render_rays (rendering.py:25-107) — nerfacc estimator.sampling + volrend
    with sigma_fn/rgb_sigma_fn callbacks. Rebuilt as explicit functional
    stages over dense [R, S] tensors: sample -> mask -> single full MLP eval
    -> fused volume integration. (The reference evaluates the MLP twice — a
    density pass for pruning and a full pass for shading; the dense design
    needs only the full pass.)
  * render_frame (rendering.py:110-177) — full-image rendering with ray
    chunking. Chunks here are TPU-sized (default 16k rays) and each chunk is
    one jit invocation with static shapes; the final partial chunk is padded.
  * render_path / render_video (rendering.py:180-266) — pose-loop rendering
    and depth colormapping for video export.

The model is passed as `model_fn(x[..., 3], dirs[..., 3] | None) -> [..., 4]`
([rgb, sigma]; or [..., 1] sigma in density-only mode), with params and any
frequency masks already bound — replacing the reference's closures over a
stateful torch module.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fsnerf_tpu.data.rays import get_rays, to_ndc
from fsnerf_tpu.ops import occgrid as og
from fsnerf_tpu.ops.sampling import (
    _deltas_from_t,
    compact_samples_uniform,
    hierarchical_samples,
    sample_pdf,
    sample_points,
    stratified_samples,
    uniform_samples,
)
from fsnerf_tpu.ops.volrend import volume_render


@jax.custom_vjp
def _merge_sorted_union(t_cat, o_cat):
    """Sort the (coarse ∪ fine) union by t; permute outputs to match.

    Exact — a sort permutes, it never recomputes. The point of the custom
    VJP: lax.sort's built-in payload gradient lowers to take_along_axis, a
    pathological per-element gather on TPU (measured: the built-in VJP made
    coarse-output reuse a 27% end-to-end training REGRESSION, 104.6k ->
    82.2k rays/s on v5e). The backward here applies the exact inverse
    permutation with a second payload sort keyed on the forward's source
    indices — sorts only, no gathers, in both directions.

    Returns (t_sorted [R, S], outputs_sorted [R, S, C]).
    """
    t_f, merged, _ = _merge_fwd_impl(t_cat, o_cat)
    return t_f, merged


def _merge_fwd_impl(t_cat, o_cat):
    n_ch = o_cat.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, t_cat.shape, 1)
    res = jax.lax.sort(
        (t_cat, *(o_cat[..., c] for c in range(n_ch)), iota),
        dimension=-1, num_keys=1)
    merged = jnp.stack(res[1:-1], axis=-1)
    return res[0], merged, res[-1]


def _merge_fwd(t_cat, o_cat):
    t_f, merged, src = _merge_fwd_impl(t_cat, o_cat)
    return (t_f, merged), src


def _merge_bwd(src, cts):
    dt_f, dmerged = cts
    n_ch = dmerged.shape[-1]
    # src[p] = source index of sorted position p; sorting the cotangents by
    # src places position p's cotangent back at source slot src[p] — the
    # exact inverse permutation (src is a permutation: keys are unique).
    res = jax.lax.sort(
        (src, dt_f, *(dmerged[..., c] for c in range(n_ch))),
        dimension=-1, num_keys=1)
    return res[1], jnp.stack(res[2:], axis=-1)


_merge_sorted_union.defvjp(_merge_fwd, _merge_bwd)


def to8b(x: np.ndarray) -> np.ndarray:
    """Float [0,1] -> uint8 (reference rendering.py:22)."""
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


# Ray-block size for the occupancy-query stage at frame scale: the gather
# materializes [R * S/stride, res] value rows in HBM (~268 MB per 4096 rays
# at S=512/stride=1/res=128); lax.map over blocks bounds the transient so
# render chunks can grow to 64k+ rays (the gather is bandwidth/row-count
# bound — serializing blocks costs nothing).
_QUERY_BLOCK_RAYS = 4096


def _masked_lattice(rays_o, rays_d, grid, n_samples, key,
                    render_step_size, early_stop_eps, query_stride):
    """The occgrid pre-MLP stage: dense sample lattice -> occupancy mask ->
    approximate (grid-EMA) transmittance early termination.

    Returns (t_mid, deltas, mask, n_valid) — n_valid is the per-ray
    surviving-sample count, the adaptive-compaction control signal. Sample
    POSITIONS are not built here: only the strided query points are ever
    materialized, and the caller reconstructs x for the (compacted) t it
    actually evaluates — at frame scale the dense [R, S, 3] tensor would be
    the largest transient of the whole pipeline.
    """
    t_mid, deltas, valid = uniform_samples(
        rays_o, rays_d, og.outer_aabb(grid), n_samples, key=key,
        step_size=render_step_size)
    R = rays_o.shape[0]
    tq = t_mid[:, query_stride // 2::query_stride] if query_stride > 1 \
        else t_mid

    def q(args):
        o, d, t = args
        return og.query_with_density(grid, sample_points(o, d, t))

    if R > _QUERY_BLOCK_RAYS and R % _QUERY_BLOCK_RAYS == 0:
        nb = R // _QUERY_BLOCK_RAYS
        occupied, occ_val = jax.lax.map(
            q, (rays_o.reshape(nb, _QUERY_BLOCK_RAYS, 3),
                rays_d.reshape(nb, _QUERY_BLOCK_RAYS, 3),
                tq.reshape(nb, _QUERY_BLOCK_RAYS, -1)))
        occupied = occupied.reshape(R, -1)
        occ_val = occ_val.reshape(R, -1)
    else:
        occupied, occ_val = q((rays_o, rays_d, tq))

    def expand(g):
        if query_stride == 1:
            return g
        return jnp.broadcast_to(
            g[..., None], (*g.shape, query_stride)).reshape(R, n_samples)

    if early_stop_eps > 0:
        occupied, occ_val = expand(occupied), expand(occ_val)
        # occ_val is the ERODED EMA of sigma * render_step_size: od only
        # accumulates strictly inside material, so this cumulative estimate
        # UNDERestimates true optical depth and the mask can never truncate
        # a ray before its true termination (grazing/thin-geometry bias fix,
        # r5 — see OccGrid.occs_q). A grid with no query table yields 0
        # here, making this branch inert.
        approx_od = jnp.where(valid, occ_val * (deltas / render_step_size),
                              0.0)
        cum = jnp.cumsum(approx_od, axis=-1)
        visible = jnp.exp(-(cum - approx_od)) > early_stop_eps
        mask = valid & occupied & visible
    else:
        mask = valid & expand(occupied)
    n_valid = jnp.sum(mask.astype(jnp.float32), axis=-1)
    return t_mid, deltas, mask, n_valid


def count_valid_samples(
    rays_o: jax.Array,
    rays_d: jax.Array,
    grid: og.OccGrid,
    n_samples: int,
    render_step_size: float = 5e-3,
    early_stop_eps: float = 1e-4,
    query_stride: int = 1,
) -> jax.Array:
    """Per-ray surviving-sample count WITHOUT any model evaluation — used to
    derive an eval-time compaction K from the converged grid (cli.py)."""
    return _masked_lattice(rays_o, rays_d, grid, n_samples, None,
                           render_step_size, early_stop_eps, query_stride)[3]


def render_rays_occgrid(
    model_fn: Callable,
    rays_o: jax.Array,
    rays_d: jax.Array,
    grid: og.OccGrid,
    n_samples: int,
    render_step_size: float = 5e-3,
    key: Optional[jax.Array] = None,
    white_bkgd: bool = False,
    n_compact: int = 0,
    early_stop_eps: float = 1e-4,
    query_stride: int = 1,
    fused_render_fn: Optional[Callable] = None,
) -> dict:
    """Occupancy-grid-masked dense rendering (reference render_rays semantics).

    Args:
      model_fn: bound model, (x, dirs) -> [..., 4].
      rays_o/rays_d: [R, 3]; grid: OccGrid; key: stratified jitter (train).
      n_compact: if > 0, compact each ray's valid samples to this many before
        the MLP runs (ops/sampling.py::compact_samples) — the dense analogue
        of nerfacc evaluating only unpruned samples.
      early_stop_eps: transmittance-based early termination (nerfacc's
        visibility pruning, rendering.py:66-74): samples whose APPROXIMATE
        transmittance — from the occupancy grid's EMA density values — falls
        below eps are masked before the MLP runs. 0 disables.
      query_stride: occupancy-query decimation — one grid lookup per group of
        this many samples (lossless for cells >= stride * step wide; compute
        with og.auto_query_stride from STATIC scene metadata). Must divide
        n_samples.
      fused_render_fn: optional ops.pallas.render.make_fused_ray_renderer
        result — runs MLP + compositing + exact early exit in one Pallas
        kernel (forward-only: rendering, not training). When set, model_fn is
        unused and the output dict contains only rgb/opacity/depth/
        trans_final/n_valid.

    Returns:
      dict(rgb, opacity, depth, weights, trans_final, sigmas, t_vals, mask).
    """
    t_mid, deltas, mask, n_valid = _masked_lattice(
        rays_o, rays_d, grid, n_samples, key, render_step_size,
        early_stop_eps, query_stride)
    if n_compact and n_compact < n_samples:
        # uniform_samples emits per-ray-constant deltas, so the specialized
        # compaction (2-operand sort instead of 4) applies
        t_mid, deltas, mask = compact_samples_uniform(
            t_mid, deltas[:, 0], mask, n_compact)
    x = sample_points(rays_o, rays_d, t_mid)
    bkgd_ = 1.0 if white_bkgd else 0.0
    if fused_render_fn is not None:
        # depth-coherence sort: the fused kernel skips GEMMs per
        # (ray_block x sample_chunk) when no ray in the block needs it;
        # grouping rays by valid-sample count makes blocks uniformly
        # shallow/deep, so background blocks skip everything and shallow
        # blocks exit early — nerfacc's per-ray termination at block
        # granularity. Whole-row gathers by a permutation are the fast
        # TPU pattern (CLAUDE.md); outputs un-permute by the inverse.
        perm = jnp.argsort(n_valid)                      # [R] ascending
        inv = jnp.argsort(perm)
        out = fused_render_fn(x[perm], rays_d[perm], t_mid[perm],
                              deltas[perm], mask[perm], bkgd_)
        out = {k: v[inv] for k, v in out.items()}
        out.update(n_valid=n_valid)
        return out
    dirs = jnp.broadcast_to(rays_d[:, None, :], x.shape)
    # volume integration runs float32 regardless of the MLP compute dtype
    out4 = model_fn(x, dirs).astype(jnp.float32)             # [R, S, 4]
    rgbs, sigmas = out4[..., :3], out4[..., 3]
    out = volume_render(sigmas, rgbs, t_mid, deltas, mask, bkgd_)
    out.update(sigmas=sigmas, t_vals=t_mid, mask=mask, n_valid=n_valid)
    return out


def render_rays_hierarchical(
    model_fn: Callable,
    rays_o: jax.Array,
    rays_d: jax.Array,
    near: float,
    far: float,
    n_coarse: int,
    n_fine: int,
    key: Optional[jax.Array] = None,
    white_bkgd: bool = False,
    coarse_model_fn: Optional[Callable] = None,
    fused_render_fn: Optional[Callable] = None,
) -> Tuple[dict, dict]:
    """Classic-NeRF coarse/fine rendering with inverse-CDF resampling.

    BASELINE.json config 2. `coarse_model_fn` defaults to `model_fn` (shared
    network for both passes — the reference project has a single MLP).

    `fused_render_fn` (eval/video only — no VJP): run the FINE pass through
    the fused Pallas ray-march kernel (ops/pallas/render.py) instead of the
    XLA model_fn + volume_render stage. The coarse pass stays XLA (the CDF
    needs per-sample weights, which the kernel does not emit); the kernel
    marches the full sorted coarse∪fine union (192 samples at the default
    64+128), trading the shared-network coarse-output reuse for the
    kernel's fused MLP+compositing and exact early exit on the sorted t
    ordering. Semantics: reference rendering.py:110-177 eval path.

    With the shared network the fine pass does NOT re-evaluate the model at
    the coarse positions: the same network at the same positions returns the
    same outputs, so the coarse pass's [R, C] outputs are merged with the
    [R, F] new-fine-sample outputs by a payload sort on t (exact — a sort
    permutes, it never recomputes; gradients flow through both uses exactly
    as they would through a re-evaluation). This cuts the MLP work per ray
    from C + (C+F) to C + F samples — the hierarchical path is MLP-bound,
    so that is a ~1.3x step-time lever at the default 64+128 config. When a
    DISTINCT `coarse_model_fn` is supplied, the classic two-network
    semantics apply and the fine network evaluates the full union.

    Returns:
      (coarse_out, fine_out) dicts as in render_rays_occgrid.
    """
    shared = coarse_model_fn is None
    coarse_fn = coarse_model_fn or model_fn
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)

    t_c, d_c = stratified_samples(rays_o, rays_d, near, far, n_coarse, k1)
    x_c = sample_points(rays_o, rays_d, t_c)
    dirs_c = jnp.broadcast_to(rays_d[:, None, :], x_c.shape)
    out4_c = coarse_fn(x_c, dirs_c).astype(jnp.float32)
    bkgd = 1.0 if white_bkgd else 0.0
    coarse = volume_render(out4_c[..., 3], out4_c[..., :3], t_c, d_c,
                           None, bkgd)
    coarse.update(sigmas=out4_c[..., 3], t_vals=t_c, mask=None)

    w = jax.lax.stop_gradient(coarse["weights"])
    if fused_render_fn is not None and shared:
        # fused fine pass: sorted union of coarse+fine t marched by the
        # Pallas ray-march kernel (MLP + compositing + early exit in one
        # kernel). No payload merge needed — the kernel re-evaluates the
        # union, so only the t ORDER matters here.
        mids = 0.5 * (t_c[..., 1:] + t_c[..., :-1])
        t_new = sample_pdf(k2, mids, w[..., 1:-1], n_fine)
        t_f = jnp.sort(jnp.concatenate([t_c, t_new], axis=-1), axis=-1)
        d_f = _deltas_from_t(t_f, far)
        x_f = sample_points(rays_o, rays_d, t_f)
        fine = dict(fused_render_fn(x_f, rays_d, t_f, d_f,
                                    jnp.ones_like(t_f, jnp.bool_), bkgd))
        fine.update(t_vals=t_f, mask=None)
        return coarse, fine
    if shared:
        # new fine samples only; merge with the cached coarse outputs
        mids = 0.5 * (t_c[..., 1:] + t_c[..., :-1])
        t_new = sample_pdf(k2, mids, w[..., 1:-1], n_fine)       # [R, F]
        x_new = sample_points(rays_o, rays_d, t_new)
        dirs_new = jnp.broadcast_to(rays_d[:, None, :], x_new.shape)
        out4_new = model_fn(x_new, dirs_new).astype(jnp.float32)
        t_cat = jnp.concatenate([t_c, t_new], axis=-1)           # [R, C+F]
        o_cat = jnp.concatenate([out4_c, out4_new], axis=-2)
        t_f, merged = _merge_sorted_union(t_cat, o_cat)
        rgb_f, sig = merged[..., :3], merged[..., 3]
        d_f = _deltas_from_t(t_f, far)
    else:
        t_f, d_f = hierarchical_samples(k2, t_c, w, n_fine, far)
        x_f = sample_points(rays_o, rays_d, t_f)
        dirs_f = jnp.broadcast_to(rays_d[:, None, :], x_f.shape)
        out4_f = model_fn(x_f, dirs_f).astype(jnp.float32)
        sig, rgb_f = out4_f[..., 3], out4_f[..., :3]
    fine = volume_render(sig, rgb_f, t_f, d_f, None, bkgd)
    fine.update(sigmas=sig, t_vals=t_f, mask=None)
    return coarse, fine


def _render_rays_dispatch(model_fn, rays_o, rays_d, key, white_bkgd, *,
                          strategy, grid, n_samples, n_fine, near, far,
                          render_step_size, n_compact=0, early_stop_eps=1e-4,
                          query_stride=1, fused_render_fn=None):
    if strategy == "occgrid":
        return render_rays_occgrid(
            model_fn, rays_o, rays_d, grid, n_samples,
            render_step_size=render_step_size, key=key, white_bkgd=white_bkgd,
            n_compact=n_compact, early_stop_eps=early_stop_eps,
            query_stride=query_stride, fused_render_fn=fused_render_fn)
    _, fine = render_rays_hierarchical(
        model_fn, rays_o, rays_d, near, far, n_samples, n_fine,
        key=key, white_bkgd=white_bkgd, fused_render_fn=fused_render_fn)
    return fine


def make_chunk_renderer(
    model_fn: Callable,
    *,
    strategy: str = "occgrid",
    grid: Optional[og.OccGrid] = None,
    n_samples: int = 512,
    n_fine: int = 128,
    render_step_size: float = 5e-3,
    white_bkgd: bool = False,
    near: float = 2.0,
    far: float = 6.0,
    n_compact: int = 0,
    early_stop_eps: float = 1e-4,
    query_stride: int = 1,
    mesh=None,
    fused_render_fn: Optional[Callable] = None,
) -> Callable:
    """One JITTED (rays_o, rays_d) -> (rgb, depth) chunk renderer.

    Build this ONCE per (model, grid, config) and reuse it across chunks and
    frames: an un-jitted chunk loop dispatches op-by-op through the runtime
    (~30x slower end-to-end), and a fresh lambda per frame would recompile.

    `mesh`: optional jax.sharding.Mesh — chunks render SPMD with the ray axis
    sharded over the mesh's 'data' axis and the model/grid replicated (the
    tiled-frame rendering of SURVEY.md section 2.3, replacing the reference's
    sequential chunk loop at rendering.py:152-171). Chunk sizes must then be
    a multiple of the device count (render_frame guarantees this). The XLA
    pipeline partitions automatically under jit; the fused Pallas kernel is
    not auto-partitionable, so that path is wrapped in shard_map — each chip
    runs the kernel on its ray tile (rays are i.i.d., so the per-tile
    depth-coherence sort and compositing equal the single-chip math).
    """
    def body(rays_o, rays_d):
        out = _render_rays_dispatch(
            model_fn, rays_o, rays_d, key=None, white_bkgd=white_bkgd,
            strategy=strategy, grid=grid, n_samples=n_samples, n_fine=n_fine,
            near=near, far=far, render_step_size=render_step_size,
            n_compact=n_compact, early_stop_eps=early_stop_eps,
            query_stride=query_stride, fused_render_fn=fused_render_fn)
        return out["rgb"], out["depth"]

    jit_kwargs = {}
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from fsnerf_tpu.parallel.mesh import batch_sharding
        shard = batch_sharding(mesh)
        jit_kwargs = dict(in_shardings=(shard, shard))
        if fused_render_fn is not None:
            spec = P(tuple(mesh.axis_names))
            body = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                                 out_specs=(spec, spec), check_vma=False)

    return jax.jit(body, **jit_kwargs)


def render_frame(
    model_fn: Callable,
    pose: jax.Array,
    hwf: Tuple[int, int, float],
    near: float,
    far: float,
    *,
    strategy: str = "occgrid",
    grid: Optional[og.OccGrid] = None,
    n_samples: int = 512,
    n_fine: int = 128,
    render_step_size: float = 5e-3,
    ndc: bool = False,
    white_bkgd: bool = False,
    chunksize: int = 16384,
    n_compact: int = 0,
    early_stop_eps: float = 1e-4,
    query_stride: int = 1,
    chunk_renderer: Optional[Callable] = None,
    mesh=None,
    fused_render_fn: Optional[Callable] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Render a full H x W frame from one pose (reference rendering.py:110-177).

    Fixes the reference bug where white_bkgd was passed positionally into
    render_rays' `train` slot and silently dropped (rendering.py:160-168) —
    here the background color is honored at eval time.

    `chunk_renderer`: optional prebuilt make_chunk_renderer result (pass when
    rendering many frames to reuse the compiled program).

    Returns:
      img: [H, W, 3]; depth: [H, W] clamped to [near, far].
    """
    H, W, _ = hwf
    # 16384-ray chunks are the MEASURED optimum on v5e, not an OOM guard:
    # the query gather runs blocked (lax.map, bounded transient at any
    # chunk size), and the sweep at the bench workload reads 586k/870k
    # rays/s (xla/fused) at 16k vs 551k/779k at 64k — larger chunks lose
    # ~6-10% (benchmarks/ab_render_chunk.py; scheduling, not dispatch,
    # dominates at these sizes).
    if strategy == "occgrid":
        chunksize = min(chunksize, 16384)
    rays_o, rays_d = get_rays(pose, hwf)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    if ndc:
        rays_o, rays_d = to_ndc(rays_o, rays_d, hwf, 1.0)

    n_rays = H * W
    chunksize = min(chunksize, n_rays)
    if mesh is not None:  # SPMD chunks need the ray axis divisible
        n_dev = mesh.devices.size
        chunksize = max(n_dev, (chunksize // n_dev) * n_dev)
    n_chunks = -(-n_rays // chunksize)
    pad = n_chunks * chunksize - n_rays
    if pad:
        rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
        # pad direction z with -1 so padded rays are valid (masked out later)
        rays_d = jnp.concatenate(
            [rays_d, jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (pad, 1))], axis=0)

    render = chunk_renderer
    if render is None:
        render = make_chunk_renderer(
            model_fn, strategy=strategy, grid=grid, n_samples=n_samples,
            n_fine=n_fine, render_step_size=render_step_size,
            white_bkgd=white_bkgd, near=near, far=far, n_compact=n_compact,
            early_stop_eps=early_stop_eps, query_stride=query_stride,
            mesh=mesh, fused_render_fn=fused_render_fn)

    imgs, depths = [], []
    for c in range(n_chunks):
        sl = slice(c * chunksize, (c + 1) * chunksize)
        rgb, depth = render(rays_o[sl], rays_d[sl])
        imgs.append(rgb)
        depths.append(depth)
    img = jnp.concatenate(imgs, axis=0)[:n_rays]
    depth = jnp.clip(jnp.concatenate(depths, axis=0)[:n_rays], near, far)
    return img.reshape(H, W, 3), depth.reshape(H, W)


def render_path(
    model_fn: Callable,
    render_poses: jax.Array,
    hwf: Tuple[int, int, float],
    near: float,
    far: float,
    compact_transfer: bool = False,
    **frame_kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render a sequence of poses (reference rendering.py:180-248).

    Builds the jitted chunk renderer once and reuses it for every frame.

    `compact_transfer`: quantize on device before the device->host pull —
    rgb to uint8 (exactly the to8b video quantization), depth to float16
    (plenty for colormapping). ~3x less transfer; use for video export where
    frames are headed to uint8 anyway (the device->host path is the
    bottleneck on tunneled TPU setups, not the render itself).

    Returns:
      frames: [F, H, W, 3] float numpy (uint8 when compact_transfer);
      d_frames: [F, H, W] (float16 when compact_transfer).
    """
    H, W, _ = hwf
    chunksize = frame_kwargs.get("chunksize", 16384)
    if frame_kwargs.get("strategy", "occgrid") == "occgrid":
        chunksize = min(chunksize, 16384)
    chunksize = min(chunksize, H * W)
    mesh = frame_kwargs.get("mesh")
    if mesh is not None:
        n_dev = mesh.devices.size
        chunksize = max(n_dev, (chunksize // n_dev) * n_dev)
    renderer_kwargs = {k: v for k, v in frame_kwargs.items()
                       if k in ("strategy", "grid", "n_samples", "n_fine",
                                "render_step_size", "white_bkgd", "n_compact",
                                "early_stop_eps", "query_stride", "mesh",
                                "fused_render_fn")}
    chunk_renderer = make_chunk_renderer(model_fn, near=near, far=far,
                                         **renderer_kwargs)
    frames, d_frames = [], []
    for pose in render_poses:
        rgb, depth = render_frame(model_fn, pose, hwf, near, far,
                                  chunk_renderer=chunk_renderer,
                                  **frame_kwargs)
        if compact_transfer:
            # device-side to8b (same truncation semantics)
            rgb = (255.0 * jnp.clip(rgb, 0.0, 1.0)).astype(jnp.uint8)
            depth = depth.astype(jnp.float16)
        frames.append(np.asarray(rgb))
        d_frames.append(np.asarray(depth))
    return np.stack(frames, 0), np.stack(d_frames, 0)


def render_video(
    frames: np.ndarray, d_frames: np.ndarray, cmap: str = "plasma"
) -> Tuple[np.ndarray, np.ndarray]:
    """Depth colormapping + uint8 TCHW conversion (rendering.py:251-266).

    Depth is normalized over the whole clip, mapped through `cmap`, and both
    streams are returned as [T, C, H, W] uint8 for video export.
    """
    import matplotlib
    import matplotlib.cm as cm

    norm = matplotlib.colors.Normalize(vmin=float(np.amin(d_frames)),
                                       vmax=float(np.amax(d_frames)))
    mapper = cm.ScalarMappable(norm=norm, cmap=cmap)
    d_rgba = mapper.to_rgba(d_frames.flatten())
    d_rgba = np.reshape(d_rgba, list(d_frames.shape[:3]) + [-1])
    rgb8 = frames if frames.dtype == np.uint8 else to8b(frames)
    return (
        np.transpose(rgb8, (0, 3, 1, 2)),
        np.transpose(to8b(d_rgba[..., :3]), (0, 3, 1, 2)),
    )
