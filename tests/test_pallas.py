"""Pallas fused-MLP kernel equivalence tests (interpreter mode on CPU).

The kernel must reproduce core.models.NeRF (bfloat16 compute mode) up to
bf16 rounding — SURVEY.md section 7's 'pure-jnp reference impl + optional
Pallas kernel pair (tested for equivalence)'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsnerf_tpu.core.encoding import positional_encoding
from fsnerf_tpu.core.models import NeRF, init_params
from fsnerf_tpu.ops.pallas.mlp import (
    fused_nerf_mlp,
    make_fused_model_fn,
    prep_params,
)


@pytest.fixture(scope="module")
def small_setup():
    model = NeRF(n_layers=4, d_filter=64, skip=(2,), n_freqs=4,
                 n_freqs_views=2, compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.key(0))
    return model, params


def _inputs(n=256, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 3)), dtype=jnp.float32)
    d = rng.normal(size=(n, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return x, jnp.asarray(d, dtype=jnp.float32)


def test_fused_mlp_matches_model(small_setup):
    model, params = small_setup
    x, d = _inputs(256)
    ref = np.asarray(model.apply(params, x, d), np.float32)
    prepped = prep_params(params, n_layers=4, skip=(2,))
    encx = positional_encoding(x, 4, True)
    encd = positional_encoding(d, 2, True)
    got = np.asarray(fused_nerf_mlp(prepped, encx, encd, block_rows=128,
                                    interpret=True))
    np.testing.assert_allclose(got[:, :3], ref[:, :3], atol=5e-3)
    scale = np.abs(ref[:, 3]).max() + 1e-9
    np.testing.assert_allclose(got[:, 3] / scale, ref[:, 3] / scale,
                               atol=2e-2)


def test_fused_model_fn_drop_in(small_setup):
    model, params = small_setup
    x, d = _inputs(192, seed=1)
    fn = make_fused_model_fn(params, n_layers=4, skip=(2,), n_freqs=4,
                             n_freqs_views=2, interpret=True)
    got = np.asarray(fn(x.reshape(4, 48, 3), d.reshape(4, 48, 3)))
    ref = np.asarray(model.apply(params, x, d), np.float32).reshape(4, 48, 4)
    np.testing.assert_allclose(got[..., :3], ref[..., :3], atol=5e-3)


def test_fused_mlp_padding_invariance(small_setup):
    """N not a multiple of block_rows: padded rows must not affect outputs."""
    model, params = small_setup
    x, d = _inputs(100, seed=2)
    prepped = prep_params(params, n_layers=4, skip=(2,))
    encx = positional_encoding(x, 4, True)
    encd = positional_encoding(d, 2, True)
    got = np.asarray(fused_nerf_mlp(prepped, encx, encd, block_rows=64,
                                    interpret=True))
    assert got.shape == (100, 4)
    ref = np.asarray(model.apply(params, x, d), np.float32)
    np.testing.assert_allclose(got[:, :3], ref[:, :3], atol=5e-3)


def test_fused_mlp_density_activations(small_setup):
    model, params = small_setup
    x, d = _inputs(64, seed=3)
    prepped = prep_params(params, n_layers=4, skip=(2,))
    encx = positional_encoding(x, 4, True)
    encd = positional_encoding(d, 2, True)
    relu = np.asarray(fused_nerf_mlp(prepped, encx, encd,
                                     density_activation="relu",
                                     block_rows=64, interpret=True))
    assert (relu[:, 3] >= 0).all()
    texp = np.asarray(fused_nerf_mlp(prepped, encx, encd,
                                     density_activation="trunc_exp",
                                     block_rows=64, interpret=True))
    assert (texp[:, 3] > 0).all()
