"""Losses and few-shot regularizers.

Behavioral parity:
  * MSE / PSNR — run-nerf.py:256-258 (F.mse_loss; psnr = -10*log10(mse)).
  * Occlusion regularizer — src/core/loss.py:6-60. Reference groups packed
    samples by ray with a *Python list comprehension over unique rays*
    (loss.py:39-42, pathologically slow); the dense layout turns it into one
    masked weighted sum over the sample axis. Matches packed semantics: mean
    over rays that have at least one (valid) sample of sum_s w(t_s)*sigma_s,
    with w linear (-a*t + b) or exp (a*e^{-b*t}) (loss.py:53-60). The `beta`
    flag gates but does NOT scale the term (run-nerf.py:261-264) — preserved,
    with an optional scale for the fixed version.
  * Frequency/weight-decay regularizer — run-nerf.py:266-279: while
    step < Ts = reg_ratio*Td, add alpha * sum(|W|_1) (or sum of per-matrix
    Frobenius norms for 'l2') over weight matrices with output dim > 3
    (excludes the rgb/sigma heads).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


def psnr_from_mse(m: jax.Array) -> jax.Array:
    return -10.0 * jnp.log10(m)


def occlusion_reg(
    sigmas: jax.Array,
    t_vals: jax.Array,
    mask: Optional[jax.Array],
    a: float,
    b: float,
    func: str = "linear",
) -> jax.Array:
    """Near-camera density penalty (dense equivalent of loss.py:26-60).

    Args:
      sigmas: [R, S] densities; t_vals: [R, S] depths; mask: [R, S] validity
        (None = all valid).

    Returns:
      scalar: mean over rays-with-samples of sum_s w(t_s) * sigma_s.
    """
    if func == "linear":
        w = -a * t_vals + b
    elif func == "exp":
        w = a * jnp.exp(-b * t_vals)
    else:
        raise ValueError(f"Unknown occlusion regularizer type: {func}")
    contrib = w * sigmas
    if mask is not None:
        contrib = jnp.where(mask, contrib, 0.0)
        ray_has = jnp.any(mask, axis=-1)
    else:
        ray_has = jnp.ones(sigmas.shape[:-1], bool)
    per_ray = jnp.sum(contrib, axis=-1)
    n = jnp.maximum(jnp.sum(ray_has.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(ray_has, per_ray, 0.0)) / n


def weight_reg(params, norm: str = "l1") -> jax.Array:
    """Weight-matrix norm over kernels with out-dim > 3 (run-nerf.py:272-277).

    flax kernels are (in, out); torch weights are (out, in) — the reference's
    `param.shape[0] > 3` tests the output dim, so here it is shape[-1] > 3.
    """
    total = jnp.zeros(())
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = jax.tree_util.keystr(path)
        if "kernel" in name and leaf.ndim == 2 and leaf.shape[-1] > 3:
            if norm == "l1":
                total = total + jnp.sum(jnp.abs(leaf))
            else:
                total = total + jnp.sqrt(jnp.sum(jnp.square(leaf)))
    return total
