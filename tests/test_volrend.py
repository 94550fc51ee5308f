"""Volume-integration tests (semantics of nerfacc.volrend.rendering,
reference rendering.py:86-96)."""

import jax
import jax.numpy as jnp
import numpy as np

from fsnerf_tpu.ops.volrend import composite, render_weights, volume_render


def _numpy_weights(sigmas, deltas, mask=None):
    """Independent cumprod-based derivation: T_i = prod_{j<i}(1 - alpha_j)."""
    od = sigmas * deltas
    if mask is not None:
        od = np.where(mask, od, 0.0)
    alpha = 1.0 - np.exp(-od)
    R, S = sigmas.shape
    w = np.zeros((R, S))
    tf = np.zeros(R)
    for r in range(R):
        T = 1.0
        for s in range(S):
            w[r, s] = T * alpha[r, s]
            T *= 1.0 - alpha[r, s]
        tf[r] = T
    return w, tf


def test_weights_match_cumprod_reference():
    rng = np.random.default_rng(0)
    sig = rng.uniform(0, 20, size=(8, 32)).astype(np.float32)
    dt = rng.uniform(0.001, 0.01, size=(8, 32)).astype(np.float32)
    w, tf = render_weights(jnp.asarray(sig), jnp.asarray(dt))
    w_ref, tf_ref = _numpy_weights(sig, dt)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf), tf_ref, atol=1e-5)


def test_weights_with_mask():
    rng = np.random.default_rng(1)
    sig = rng.uniform(0, 50, size=(4, 16)).astype(np.float32)
    dt = np.full((4, 16), 0.01, np.float32)
    mask = rng.uniform(size=(4, 16)) > 0.5
    w, tf = render_weights(jnp.asarray(sig), jnp.asarray(dt),
                           jnp.asarray(mask))
    w_ref, tf_ref = _numpy_weights(sig, dt, mask)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf), tf_ref, atol=1e-5)
    # masked samples get exactly zero weight
    assert np.all(np.asarray(w)[~mask] == 0.0)


def test_negative_sigma_matches_nerfacc_no_clamp():
    """The reference NeRF emits raw sigma; nerfacc composites it unclamped."""
    sig = np.array([[-5.0, 10.0, -1.0, 3.0]], np.float32)
    dt = np.full((1, 4), 0.1, np.float32)
    w, tf = render_weights(jnp.asarray(sig), jnp.asarray(dt))
    w_ref, tf_ref = _numpy_weights(sig, dt)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-5)


def test_empty_ray_composites_to_background():
    """All-masked row == the reference's 0-sample fallback
    (rendering.py:97-103): pure background, zero depth/opacity."""
    sig = jnp.ones((2, 8)) * 100.0
    dt = jnp.full((2, 8), 0.01)
    t = jnp.linspace(2.0, 6.0, 8)[None].repeat(2, 0)
    rgbs = jnp.ones((2, 8, 3)) * 0.3
    mask = jnp.stack([jnp.zeros(8, bool), jnp.ones(8, bool)])
    out = volume_render(sig, rgbs, t, dt, mask, bkgd=1.0)
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(out["opacity"][0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(out["depth"][0]), 0.0, atol=1e-6)
    assert float(out["opacity"][1]) > 0.5


def test_opaque_wall_full_opacity():
    """A very dense sample should absorb the ray: opacity -> 1, depth at it."""
    sig = jnp.zeros((1, 16)).at[0, 5].set(1e4)
    dt = jnp.full((1, 16), 0.01)
    t = jnp.linspace(0.0, 1.6, 16)[None]
    rgbs = jnp.ones((1, 16, 3)) * 0.7
    out = volume_render(sig, rgbs, t, dt, None, bkgd=0.0)
    np.testing.assert_allclose(float(out["opacity"][0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(float(out["depth"][0]), float(t[0, 5]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), 0.7, atol=1e-4)


def test_background_blend():
    sig = jnp.zeros((1, 8))
    dt = jnp.full((1, 8), 0.1)
    t = jnp.linspace(0, 0.8, 8)[None]
    rgbs = jnp.zeros((1, 8, 3))
    out = volume_render(sig, rgbs, t, dt, None, bkgd=jnp.array([1.0, 0.5, 0.25]))
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), [1.0, 0.5, 0.25],
                               atol=1e-6)


def test_gradients_flow_through_masked_rows():
    """Empty rays must still produce finite gradients (SURVEY.md hard part:
    'empty-ray degeneracy ... background compositing must still produce the
    right gradient')."""
    def loss(sig):
        mask = jnp.zeros_like(sig, bool)
        out = volume_render(sig, jnp.ones((*sig.shape, 3)) * 0.5,
                            jnp.ones_like(sig), jnp.ones_like(sig) * 0.01,
                            mask, bkgd=1.0)
        return jnp.sum(out["rgb"] ** 2)

    g = jax.grad(loss)(jnp.ones((2, 4)) * 5.0)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), 0.0)  # fully masked -> no grad


def test_weights_sum_plus_transfinal_is_one():
    rng = np.random.default_rng(2)
    sig = rng.uniform(0, 30, size=(16, 64)).astype(np.float32)
    dt = rng.uniform(0.001, 0.02, size=(16, 64)).astype(np.float32)
    w, tf = render_weights(jnp.asarray(sig), jnp.asarray(dt))
    total = np.asarray(jnp.sum(w, -1) + tf)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)
