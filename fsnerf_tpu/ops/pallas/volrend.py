"""Fused volume-rendering Pallas kernel: weights + accumulation in VMEM.

Replaces nerfacc's CUDA compositing chain (render_weight_from_density /
accumulate_along_rays, invoked at reference rendering.py:86-96) for the
forward render path. The jnp reference implementation in ops/volrend.py
stages weights/transmittance through HBM between ops; this kernel computes
optical depth -> exclusive transmittance scan -> weights -> all three ray
accumulations (rgb, opacity, depth) in one VMEM pass per ray block, writing
only the [R, 8] per-ray stats and the [R, S] weights back to HBM.

Layout notes (see /opt/skills/guides/pallas_guide.md):
  * All per-sample quantities arrive as [R, S] planes (sample axis in lanes);
    rgb arrives as three separate [R, S] channel planes — a [R, S, 3] block
    would put 3 in the lane dimension and waste 125/128 of every register.
  * The transmittance cumsum runs as an explicit Hillis-Steele shift-add
    (log2(S) pltpu.roll steps with wraparound masking) — guaranteed Mosaic
    lowering, no reliance on reduce_window support.
  * Background compositing happens OUTSIDE the kernel (one fused XLA
    elementwise op) so the kernel needs no scalar operands.

Equivalence vs ops.volrend.volume_render is tested in tests/test_pallas.py.

STATUS (round 3): SUPERSEDED in the product paths. Training composites
through the jnp ops/volrend.py (the compositing must sit inside the
autodiff graph — this kernel is forward-only), and eval/video rendering
uses the fused ray-march kernel (ops/pallas/render.py), which subsumes this
kernel's compositing AND the MLP in one VMEM pass with exact early exit —
strictly more fusion than volrend alone. Kept as the tested reference for
the in-kernel transmittance-scan building blocks (_cumsum_lanes is imported
by ops/pallas/render.py) and for forward-compositing workloads over
precomputed sigmas/rgbs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumulative sum along the last (lane) axis.

    Hillis-Steele scan: log2(n) roll+add steps; pltpu.roll is cyclic so each
    step masks the wrapped-around prefix with a lane-index iota.
    """
    n = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    shift = 1
    while shift < n:
        shifted = pltpu.roll(x, shift, axis=x.ndim - 1)   # out[i] = x[i-shift]
        x = x + jnp.where(col >= shift, shifted, 0.0)
        shift *= 2
    return x


def _volrend_kernel(sig_ref, delta_ref, t_ref, mask_ref,
                    r_ref, g_ref, b_ref, stats_ref, w_ref):
    od = sig_ref[:] * delta_ref[:] * mask_ref[:]
    alpha = 1.0 - jnp.exp(-od)
    cum = _cumsum_lanes(od)
    trans = jnp.exp(-(cum - od))                  # exclusive via subtract
    w = trans * alpha
    w_ref[:] = w

    def acc(plane):                               # [bR, S] -> [bR, 1]
        return jnp.sum(w * plane, axis=-1, keepdims=True)

    trans_final = jnp.exp(-cum[:, -1:])
    zeros = jnp.zeros_like(trans_final)
    stats_ref[:] = jnp.concatenate(
        [acc(r_ref[:]), acc(g_ref[:]), acc(b_ref[:]),
         jnp.sum(w, axis=-1, keepdims=True),      # opacity
         acc(t_ref[:]),                           # depth
         trans_final, zeros, zeros], axis=-1)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _volrend_call(sig, delta, t, mask_f, r, g, b, block_rows, interpret):
    n, s = sig.shape
    spec = pl.BlockSpec((block_rows, s), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    stats, weights = pl.pallas_call(
        _volrend_kernel,
        grid=(n // block_rows,),
        in_specs=[spec] * 7,
        out_specs=(pl.BlockSpec((block_rows, 8), lambda i: (i, 0),
                                memory_space=pltpu.VMEM), spec),
        out_shape=(jax.ShapeDtypeStruct((n, 8), jnp.float32),
                   jax.ShapeDtypeStruct((n, s), jnp.float32)),
        interpret=interpret,
    )(sig, delta, t, mask_f, r, g, b)
    return stats, weights


def volume_render_pallas(
    sigmas: jax.Array,
    rgbs: jax.Array,
    t_vals: jax.Array,
    deltas: jax.Array,
    mask: Optional[jax.Array] = None,
    bkgd: jax.Array | float = 0.0,
    block_rows: Optional[int] = None,
    interpret: bool = False,
) -> dict:
    """Drop-in fused replacement for ops.volrend.volume_render.

    Args/returns identical to volume_render: sigmas/t_vals/deltas [R, S],
    rgbs [R, S, 3], optional bool mask [R, S], scalar or [3] bkgd ->
    dict(rgb [R,3], opacity [R], depth [R], weights [R,S], trans_final [R]).
    """
    R, S = sigmas.shape
    if block_rows is None:
        # ~16 f32 planes of [bR, S] live at once (inputs, temps, double
        # buffering); keep the working set well under VMEM.
        block_rows = 256 if S <= 256 else 128
    f32 = jnp.float32
    mask_f = (jnp.ones((R, S), f32) if mask is None
              else mask.astype(f32))
    n_pad = _round_up(max(R, block_rows), block_rows)
    pad = n_pad - R

    def prep(x):
        x = x.astype(f32)
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    stats, weights = _volrend_call(
        prep(sigmas), prep(deltas), prep(t_vals), prep(mask_f),
        prep(rgbs[..., 0]), prep(rgbs[..., 1]), prep(rgbs[..., 2]),
        block_rows, interpret)
    stats, weights = stats[:R], weights[:R]
    trans_final = stats[:, 5]
    rgb = stats[:, 0:3] + trans_final[:, None] * jnp.asarray(bkgd, f32)
    return {
        "rgb": rgb,
        "opacity": stats[:, 3],
        "depth": stats[:, 4],
        "weights": weights,
        "trans_final": trans_final,
    }
