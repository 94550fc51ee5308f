"""Image quality metrics, bit-matching the reference's definitions.

Parity targets (these gate benchmark parity, SURVEY.md section 5):
  * PSNR — run-nerf.py:157-160: -10*log10(MSE) with the MSE taken JOINTLY over
    all validation frames (not per-frame averaged).
  * SSIM — run-nerf.py:180-189: skimage.metrics.structural_similarity with
    gaussian_weights=True, data_range=1.0, channel_axis=-1 — i.e. the Wang et
    al. formulation: 11x11 gaussian window (sigma 1.5, truncate 3.5), K1=0.01,
    K2=0.03, sample-covariance normalization NP/(NP-1), per-channel SSIM maps
    cropped by the window radius then averaged. skimage is not available in
    this environment, so the algorithm is implemented here in JAX (separable
    depthwise gaussian convolutions — XLA maps these to the MXU) and verified
    against a direct numpy oracle in tests.
  * LPIPS — run-nerf.py:163-178 computes LPIPS-VGG then *discards* it
    (val_lpips = None at :178, a reference bug). Here LPIPS is honored when
    VGG16+linear-head weights are available on disk and None otherwise (no
    pretrained weights ship with this environment); see eval/lpips.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Joint-MSE PSNR over any number of frames (run-nerf.py:160)."""
    m = jnp.mean(jnp.square(pred - target))
    return -10.0 * jnp.log10(m)


def _gaussian_kernel1d(sigma: float = 1.5, truncate: float = 3.5,
                       max_radius: int = 10 ** 9) -> np.ndarray:
    radius = min(int(truncate * sigma + 0.5), max_radius)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d(img: jax.Array, k1d: np.ndarray) -> jax.Array:
    """Separable 'valid' 2D gaussian filter over [H, W] (one channel).

    'valid' convolution equals skimage's reflect-padded filter followed by its
    radius crop: interior outputs never touch the padding.
    """
    k = jnp.asarray(k1d)
    # rows
    out = jax.lax.conv_general_dilated(
        img[None, None, :, :], k[None, None, :, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    # cols
    out = jax.lax.conv_general_dilated(
        out, k[None, None, None, :],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return out[0, 0]


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(
    img0: jax.Array,
    img1: jax.Array,
    data_range: float = 1.0,
) -> jax.Array:
    """Mean SSIM between two [H, W, C] images (skimage-gaussian semantics).

    Images smaller than the standard 11x11 window use a clamped window
    (skimage raises on win_size > image extent; here tiny test images still
    get a well-defined value).
    """
    sigma, truncate = 1.5, 3.5
    max_radius = max(1, (min(img0.shape[0], img0.shape[1]) - 1) // 2)
    k1d = _gaussian_kernel1d(sigma, truncate, max_radius)
    win = len(k1d)
    NP = win * win
    cov_norm = NP / (NP - 1)                      # sample covariance
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2

    def channel_ssim(x, y):
        ux = _filter2d(x, k1d)
        uy = _filter2d(y, k1d)
        uxx = _filter2d(x * x, k1d)
        uyy = _filter2d(y * y, k1d)
        uxy = _filter2d(x * y, k1d)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
        B1, B2 = ux * ux + uy * uy + C1, vx + vy + C2
        return jnp.mean((A1 * A2) / (B1 * B2))

    vals = [channel_ssim(img0[..., c], img1[..., c])
            for c in range(img0.shape[-1])]
    return jnp.mean(jnp.stack(vals))


def evaluate_frames(
    pred: jax.Array,
    target: jax.Array,
    lpips_fn=None,
) -> dict:
    """Final metrics over [F, H, W, 3] stacks (run-nerf.py:108-191 semantics).

    Returns dict(psnr, ssim, lpips) — lpips is None unless a loaded LPIPS
    network is supplied (the reference discards it; we report it if possible).
    """
    p = psnr(pred, target)
    s = jnp.mean(jnp.stack([ssim(pred[i], target[i])
                            for i in range(pred.shape[0])]))
    l = None
    if lpips_fn is not None:
        l = float(np.mean([float(lpips_fn(pred[i], target[i]))
                           for i in range(pred.shape[0])]))
    return {"psnr": float(p), "ssim": float(s), "lpips": l}
