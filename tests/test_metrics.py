"""Metric parity tests: PSNR (joint MSE) + SSIM (skimage-gaussian semantics,
reference run-nerf.py:156-189) against independent numpy oracles."""

import numpy as np
import jax.numpy as jnp

from fsnerf_tpu.eval.metrics import evaluate_frames, psnr, ssim


def _np_gaussian1d(sigma=1.5, truncate=3.5):
    r = int(truncate * sigma + 0.5)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _np_filter_valid(img, k):
    """Separable 'valid' filtering of a 2D image."""
    from numpy.lib.stride_tricks import sliding_window_view
    a = sliding_window_view(img, len(k), axis=0)
    a = np.tensordot(a, k, axes=([2], [0]))
    a = sliding_window_view(a, len(k), axis=1)
    return np.tensordot(a, k, axes=([2], [0]))


def _np_ssim(x, y, data_range=1.0):
    """Wang et al. SSIM with gaussian weights + sample covariance — the
    skimage structural_similarity(gaussian_weights=True) algorithm."""
    k = _np_gaussian1d()
    win = len(k)
    NP = win * win
    cov_norm = NP / (NP - 1)
    C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    vals = []
    for c in range(x.shape[-1]):
        xc, yc = x[..., c].astype(np.float64), y[..., c].astype(np.float64)
        ux, uy = _np_filter_valid(xc, k), _np_filter_valid(yc, k)
        uxx = _np_filter_valid(xc * xc, k)
        uyy = _np_filter_valid(yc * yc, k)
        uxy = _np_filter_valid(xc * yc, k)
        vx = cov_norm * (uxx - ux ** 2)
        vy = cov_norm * (uyy - uy ** 2)
        vxy = cov_norm * (uxy - ux * uy)
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / \
            ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
        vals.append(S.mean())
    return float(np.mean(vals))


def test_psnr_joint_mse():
    a = jnp.zeros((2, 4, 4, 3))
    b = jnp.concatenate([jnp.zeros((1, 4, 4, 3)),
                         0.2 * jnp.ones((1, 4, 4, 3))])
    got = float(psnr(a, b))
    want = -10 * np.log10(np.mean([0.0, 0.04]))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ssim_identical_images():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(float(ssim(jnp.asarray(img),
                                          jnp.asarray(img))), 1.0, atol=1e-6)


def test_ssim_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(40, 40, 3)).astype(np.float32)
    noise = rng.normal(scale=0.1, size=x.shape).astype(np.float32)
    y = np.clip(x + noise, 0, 1)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    want = _np_ssim(x, y)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ssim_orders_degradations():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    small = np.clip(x + rng.normal(scale=0.02, size=x.shape), 0, 1).astype(
        np.float32)
    big = np.clip(x + rng.normal(scale=0.3, size=x.shape), 0, 1).astype(
        np.float32)
    s_small = float(ssim(jnp.asarray(x), jnp.asarray(small)))
    s_big = float(ssim(jnp.asarray(x), jnp.asarray(big)))
    assert s_small > s_big > 0


def test_evaluate_frames():
    rng = np.random.default_rng(3)
    gt = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    pred = np.clip(gt + rng.normal(scale=0.05, size=gt.shape), 0, 1).astype(
        np.float32)
    m = evaluate_frames(jnp.asarray(pred), jnp.asarray(gt))
    assert 20 < m["psnr"] < 40
    assert 0 < m["ssim"] < 1
    assert m["lpips"] is None
