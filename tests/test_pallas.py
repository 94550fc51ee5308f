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


def test_fused_train_vjp_matches_autodiff(small_setup):
    """Custom-VJP backward kernel vs jax autodiff through the flax model
    (values and parameter gradients, bf16 tolerance)."""
    import jax.tree_util as jtu
    from fsnerf_tpu.ops.pallas.mlp import prep_params as prep
    from fsnerf_tpu.ops.pallas.mlp_train import (
        _flat_from_prepped, make_fused_train_mlp)

    model, params = small_setup
    x, d = _inputs(256, seed=7)
    tgt = jnp.asarray(np.random.default_rng(8).uniform(0, 1, (256, 4)),
                      dtype=jnp.float32)
    fused, _ = make_fused_train_mlp(4, (2,), block_rows=128, interpret=True)

    def loss_fused(params):
        pr = prep(params, n_layers=4, skip=(2,))
        flat = tuple(_flat_from_prepped(pr))
        encx = positional_encoding(x, 4, True)
        encd = positional_encoding(d, 2, True)
        ex = jnp.zeros((256, pr["d_enc_pad"]), jnp.bfloat16
                       ).at[:, :encx.shape[1]].set(encx.astype(jnp.bfloat16))
        ed = jnp.zeros((256, pr["d_dir_pad"]), jnp.bfloat16
                       ).at[:, :encd.shape[1]].set(encd.astype(jnp.bfloat16))
        return jnp.mean((fused(flat, ex, ed) - tgt) ** 2)

    def loss_ref(params):
        return jnp.mean((model.apply(params, x, d) - tgt) ** 2)

    lf, lr = float(loss_fused(params)), float(loss_ref(params))
    assert abs(lf - lr) / abs(lr) < 5e-3

    gf = jax.grad(loss_fused)(params)
    gr = jax.grad(loss_ref)(params)
    for (pa, a), (_, b) in zip(jtu.tree_flatten_with_path(gf)[0],
                               jtu.tree_flatten_with_path(gr)[0]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = np.abs(b).max() + 1e-8
        assert np.abs(a - b).max() / scale < 0.06, jtu.keystr(pa)


def test_fused_train_model_fn_in_train_step():
    """End-to-end: a few fused-kernel training steps run and reduce loss
    (interpret mode on CPU)."""
    import fsnerf_tpu.ops.pallas.mlp_train as mt
    from fsnerf_tpu.config import (Config, DataConfig, EncoderConfig,
                                   ModelConfig, SamplingConfig, TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_step)
    import functools

    orig = mt.make_fused_train_model_fn
    mt.make_fused_train_model_fn = functools.partial(
        orig, block_rows=256, interpret=True)
    try:
        cfg = Config(
            encoder=EncoderConfig(n_freqs=4, n_freqs_views=2),
            model=ModelConfig(n_layers=3, d_filter=32, skip=(1,),
                              fused_kernel=True),
            data=DataConfig(dataset="sphere", white_bkgd=True),
            sampling=SamplingConfig(strategy="occgrid", n_samples=32,
                                    n_compact=16, grid_resolution=8,
                                    warmup_steps=2, update_interval=4,
                                    render_step_size=0.2),
            train=TrainConfig(n_iters=8, batch_size=64, lro=5e-3,
                              scheduler="const", dtype="bfloat16"),
        )
        scene = SphereScene(n_imgs=3, hw=12, white_bkgd=True)
        model = make_model(cfg)
        pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
        opt = make_optimizer(cfg)
        state = init_state(model, cfg, opt, scene.aabb, jax.random.key(0))
        step = jax.jit(make_train_step(model, cfg, opt, pool, scene))
        losses = []
        for _ in range(8):
            state, m = step(state)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
    finally:
        mt.make_fused_train_model_fn = orig
