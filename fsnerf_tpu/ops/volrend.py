"""Volume integration: transmittance, compositing weights, accumulation.

TPU-native replacement for nerfacc.volrend.rendering and its CUDA scan ops
(render_weight_from_density / exclusive_prod; invoked at reference
rendering.py:86-96). nerfacc performs a *segmented* scan over ragged packed
samples; here samples are dense [n_rays, n_samples] with a validity mask, so
transmittance is a plain exclusive scan along the sample axis:

    alpha_i = 1 - exp(-sigma_i * delta_i)
    T_i     = prod_{j<i} (1 - alpha_j) = exp(-cumsum_exclusive(sigma*delta))
    w_i     = T_i * alpha_i

The exp/cumsum identity is exact and turns the cumprod into a single
bandwidth-friendly cumulative sum. Masked samples contribute zero optical
depth (alpha = 0, w = 0) — the dense analogue of nerfacc dropping them, and
the "0 samples on a ray" failure the reference special-cases
(rendering.py:97-103) degenerates to an all-masked row that correctly
composites to pure background with well-defined gradients.

A Pallas fused kernel equivalent lives in ops/pallas/volrend.py; this module
is the always-correct jnp reference implementation (they are tested for
equivalence).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def render_weights(
    sigmas: jax.Array,
    deltas: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Compositing weights from densities.

    Args:
      sigmas: [R, S] raw densities (may be negative — reference NeRF emits an
        unactivated sigma head; nerfacc does not clamp either).
      deltas: [R, S] interval lengths.
      mask: optional [R, S] bool validity mask.

    Returns:
      weights: [R, S]; trans_final: [R] transmittance past the last sample
        (the background visibility).
    """
    od = sigmas * deltas                               # optical depth
    if mask is not None:
        od = jnp.where(mask, od, 0.0)
    alpha = 1.0 - jnp.exp(-od)
    # exclusive cumulative optical depth: T_i = exp(-sum_{j<i} od_j)
    cum = jnp.cumsum(od, axis=-1)
    trans = jnp.exp(-(cum - od))                       # exclusive via subtract
    weights = trans * alpha
    trans_final = jnp.exp(-cum[..., -1])
    return weights, trans_final


def composite(
    weights: jax.Array,
    rgbs: jax.Array,
    t_vals: jax.Array,
    trans_final: jax.Array,
    bkgd: jax.Array | float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Accumulate rgb/opacity/depth along rays + background compositing.

    Mirrors nerfacc's accumulate_along_rays + render_bkgd blending
    (reference rendering.py:86-96: rgb_out = sum w*c + T_final * bkgd).

    Args:
      weights: [R, S]; rgbs: [R, S, 3]; t_vals: [R, S]; trans_final: [R].
      bkgd: scalar or [3] background color.

    Returns:
      rgb: [R, 3]; opacity: [R]; depth: [R].
    """
    rgb = jnp.einsum("rs,rsc->rc", weights, rgbs)
    opacity = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * t_vals, axis=-1)
    rgb = rgb + trans_final[:, None] * jnp.asarray(bkgd, rgb.dtype)
    return rgb, opacity, depth


def volume_render(
    sigmas: jax.Array,
    rgbs: jax.Array,
    t_vals: jax.Array,
    deltas: jax.Array,
    mask: Optional[jax.Array] = None,
    bkgd: jax.Array | float = 0.0,
) -> dict:
    """Full volume-rendering epilogue in one call.

    Returns dict(rgb [R,3], opacity [R], depth [R], weights [R,S],
    trans_final [R]).
    """
    weights, trans_final = render_weights(sigmas, deltas, mask)
    rgb, opacity, depth = composite(weights, rgbs, t_vals, trans_final, bkgd)
    return {
        "rgb": rgb,
        "opacity": opacity,
        "depth": depth,
        "weights": weights,
        "trans_final": trans_final,
    }
