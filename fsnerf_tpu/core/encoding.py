"""Fourier-feature positional encoding with an annealed frequency-mask hook.

Behavioral parity with reference PositionalEncoder (src/core/models.py:10-50):
  * output layout [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] with
    d_out = d_in * (1 + 2 * n_freqs)  (models.py:26,28-39).
  * log-spaced freqs 2**linspace(0, F-1, F) (the reference *default*: the
    store_false flag at parser.py:24-26 makes log the default) or linear
    linspace(1, 2**(F-1), F) (models.py:31-34).

New capability (SURVEY.md section 7 / BASELINE.json config 3): a per-frequency
mask hook for FreeNeRF-style annealed frequency regularization. An identity
mask reproduces the reference encoder bit-for-bit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def frequencies(n_freqs: int, log_space: bool = True) -> jax.Array:
    """Frequency bands, matching reference models.py:31-34."""
    if log_space:
        return 2.0 ** jnp.linspace(0.0, n_freqs - 1, n_freqs)
    return jnp.linspace(2.0 ** 0.0, 2.0 ** (n_freqs - 1), n_freqs)


def positional_encoding(
    x: jax.Array,
    n_freqs: int,
    log_space: bool = True,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """gamma(x) = [x, sin(f_k x), cos(f_k x)]_k with optional frequency mask.

    Args:
      x: [..., D] input coordinates.
      n_freqs: number of frequency bands F.
      log_space: log- vs linear-spaced bands.
      mask: optional [F] per-band multiplier in [0, 1] applied to both the sin
        and cos features of each band (FreeNeRF annealing). None = identity.

    Returns:
      [..., D * (1 + 2F)] encoded features, identity features first, then
      sin/cos interleaved per band — the reference layout.
    """
    if n_freqs == 0:
        return x
    freqs = frequencies(n_freqs, log_space)           # [F]
    xb = x[..., None, :] * freqs[:, None]             # [..., F, D]
    sin, cos = jnp.sin(xb), jnp.cos(xb)
    feat = jnp.stack([sin, cos], axis=-2)             # [..., F, 2, D]
    if mask is not None:
        feat = feat * mask[:, None, None]
    feat = feat.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    return jnp.concatenate([x, feat], axis=-1)


def encoded_dim(d_input: int, n_freqs: int) -> int:
    """d_out = d_in * (1 + 2F) (reference models.py:26)."""
    return d_input * (1 + 2 * n_freqs)


def freq_mask(n_freqs: int, step: jax.Array, total_steps: int) -> jax.Array:
    """FreeNeRF linear frequency-annealing mask.

    The visible band grows linearly over `total_steps`: at training step t the
    first floor(t*F/T) bands are fully visible, the next band is fractionally
    visible, and higher bands are masked. Identity once t >= T.

    Args:
      step: current training step (traced scalar ok).
      total_steps: annealing duration T (static). If <= 0, returns ones.

    Returns:
      [F] mask in [0, 1].
    """
    if total_steps <= 0:
        return jnp.ones((n_freqs,), dtype=jnp.float32)
    alpha = jnp.asarray(step, jnp.float32) * n_freqs / float(total_steps)
    bands = jnp.arange(n_freqs, dtype=jnp.float32)
    return jnp.clip(alpha - bands, 0.0, 1.0)
