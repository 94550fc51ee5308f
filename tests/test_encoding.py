"""Tests for positional encoding + FreeNeRF mask (reference models.py:10-50)."""

import jax.numpy as jnp
import numpy as np

from fsnerf_tpu.core.encoding import (
    encoded_dim,
    freq_mask,
    frequencies,
    positional_encoding,
)


def _numpy_encoding(x, n_freqs, log_space):
    """Independent numpy derivation of the reference encoder layout."""
    if log_space:
        freqs = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    else:
        freqs = np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs)
    feats = [x]
    for f in freqs:
        feats.append(np.sin(x * f))
        feats.append(np.cos(x * f))
    return np.concatenate(feats, axis=-1)


def test_frequencies_log_default():
    f = np.asarray(frequencies(10, log_space=True))
    np.testing.assert_allclose(f, 2.0 ** np.arange(10), rtol=1e-6)


def test_frequencies_linear():
    f = np.asarray(frequencies(4, log_space=False))
    np.testing.assert_allclose(f, np.linspace(1.0, 8.0, 4), rtol=1e-6)


def test_encoding_matches_reference_layout():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 3)).astype(np.float32)
    for log_space in (True, False):
        for F in (1, 4, 10):
            got = np.asarray(positional_encoding(jnp.asarray(x), F, log_space))
            want = _numpy_encoding(x, F, log_space)
            assert got.shape == (7, encoded_dim(3, F))
            # fp32 sin/cos at frequency 512 carries a few ulp of error
            np.testing.assert_allclose(got, want, atol=2e-4)


def test_encoding_zero_freqs_is_identity():
    x = jnp.ones((2, 3))
    np.testing.assert_allclose(np.asarray(positional_encoding(x, 0)),
                               np.ones((2, 3)))


def test_encoding_identity_mask_is_noop():
    x = jnp.linspace(-1, 1, 12).reshape(4, 3)
    base = positional_encoding(x, 5)
    masked = positional_encoding(x, 5, mask=jnp.ones(5))
    np.testing.assert_allclose(np.asarray(base), np.asarray(masked))


def test_encoding_zero_mask_kills_band():
    x = jnp.linspace(-1, 1, 12).reshape(4, 3)
    mask = jnp.array([1.0, 0.0, 1.0])
    out = np.asarray(positional_encoding(x, 3, mask=mask))
    # layout: [x(3), sin f0(3), cos f0(3), sin f1(3), cos f1(3), ...]
    band1 = out[:, 3 + 6: 3 + 12]
    np.testing.assert_allclose(band1, 0.0)
    band0 = out[:, 3: 9]
    assert np.abs(band0).max() > 0


def test_freq_mask_schedule():
    F, T = 10, 100
    m0 = np.asarray(freq_mask(F, 0, T))
    np.testing.assert_allclose(m0, 0.0)
    m_half = np.asarray(freq_mask(F, 50, T))
    # first 5 bands fully visible, 6th at 0, rest 0
    np.testing.assert_allclose(m_half[:5], 1.0)
    np.testing.assert_allclose(m_half[5:], 0.0)
    m_frac = np.asarray(freq_mask(F, 55, T))
    np.testing.assert_allclose(m_frac[5], 0.5, atol=1e-6)
    m_end = np.asarray(freq_mask(F, T, T))
    np.testing.assert_allclose(m_end, 1.0)
    m_past = np.asarray(freq_mask(F, 2 * T, T))
    np.testing.assert_allclose(m_past, 1.0)


def test_freq_mask_disabled():
    np.testing.assert_allclose(np.asarray(freq_mask(8, 3, 0)), 1.0)
