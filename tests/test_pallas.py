"""Pallas fused-MLP kernel equivalence tests (interpreter mode on CPU).

The kernel must reproduce core.models.NeRF (bfloat16 compute mode) up to
bf16 rounding — SURVEY.md section 7's 'pure-jnp reference impl + optional
Pallas kernel pair (tested for equivalence)'.
"""

import functools

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


@pytest.mark.parametrize("save_acts", [False, True])
def test_fused_train_vjp_matches_autodiff(small_setup, save_acts):
    """Custom-VJP backward kernel vs jax autodiff through the flax model
    (values and parameter gradients, bf16 tolerance) — both the recompute
    and the saved-activations backward."""
    import jax.tree_util as jtu
    from fsnerf_tpu.ops.pallas.mlp import prep_params as prep
    from fsnerf_tpu.ops.pallas.mlp_train import (
        _flat_from_prepped, make_fused_train_mlp)

    model, params = small_setup
    x, d = _inputs(256, seed=7)
    tgt = jnp.asarray(np.random.default_rng(8).uniform(0, 1, (256, 4)),
                      dtype=jnp.float32)
    fused, _ = make_fused_train_mlp(4, (2,), block_rows=128, interpret=True,
                                    save_acts=save_acts)

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


def test_fused_train_saved_acts_bitwise_matches_recompute(small_setup):
    """save_acts=True grads are BITWISE identical to the recompute backward:
    the saved trunk chain is exactly what the recompute would produce."""
    from fsnerf_tpu.ops.pallas.mlp import prep_params as prep
    from fsnerf_tpu.ops.pallas.mlp_train import (
        _flat_from_prepped, make_fused_train_mlp)

    _, params = small_setup
    x, d = _inputs(256, seed=11)
    pr = prep(params, n_layers=4, skip=(2,))
    flat = tuple(_flat_from_prepped(pr))
    encx = positional_encoding(x, 4, True)
    encd = positional_encoding(d, 2, True)
    ex = jnp.zeros((256, pr["d_enc_pad"]), jnp.bfloat16
                   ).at[:, :encx.shape[1]].set(encx.astype(jnp.bfloat16))
    ed = jnp.zeros((256, pr["d_dir_pad"]), jnp.bfloat16
                   ).at[:, :encd.shape[1]].set(encd.astype(jnp.bfloat16))

    outs, grads = [], []
    for sa in (False, True):
        fused, _ = make_fused_train_mlp(4, (2,), block_rows=128,
                                        interpret=True, save_acts=sa)

        def loss(flat):
            return jnp.sum(fused(flat, ex, ed) ** 2)

        outs.append(np.asarray(fused(flat, ex, ed)))
        grads.append(jax.grad(loss)(flat))

    np.testing.assert_array_equal(outs[0], outs[1])
    for a, b in zip(grads[0], grads[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n_layers,skip,stride", [
    (4, (2,), 2),   # gaps 0,2; skip consumer (layer 3) saved
    (4, (2,), 4),   # chain gap 0,1,2 regenerated from encx alone
    (5, (2,), 3),   # skip CONSUMER (layer 3) itself regenerated
])
def test_fused_train_acts_stride_bitwise(n_layers, skip, stride):
    """acts_stride>1 grads are BITWISE identical to the full stride-1 save:
    _reconstruct_h regenerates exactly what the forward computed (same ops,
    same dtypes), including skip-layer consumers inside a gap."""
    from fsnerf_tpu.ops.pallas.mlp import prep_params as prep
    from fsnerf_tpu.ops.pallas.mlp_train import (
        _flat_from_prepped, make_fused_train_mlp)

    model = NeRF(n_layers=n_layers, d_filter=64, skip=skip, n_freqs=4,
                 n_freqs_views=2, compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.key(3))
    x, d = _inputs(256, seed=13)
    pr = prep(params, n_layers=n_layers, skip=skip)
    flat = tuple(_flat_from_prepped(pr))
    encx = positional_encoding(x, 4, True)
    encd = positional_encoding(d, 2, True)
    ex = jnp.zeros((256, pr["d_enc_pad"]), jnp.bfloat16
                   ).at[:, :encx.shape[1]].set(encx.astype(jnp.bfloat16))
    ed = jnp.zeros((256, pr["d_dir_pad"]), jnp.bfloat16
                   ).at[:, :encd.shape[1]].set(encd.astype(jnp.bfloat16))

    outs, grads = [], []
    for st in (1, stride):
        fused, _ = make_fused_train_mlp(n_layers, skip, block_rows=128,
                                        interpret=True, save_acts=True,
                                        acts_stride=st)

        def loss(flat):
            return jnp.sum(fused(flat, ex, ed) ** 2)

        outs.append(np.asarray(fused(flat, ex, ed)))
        grads.append(jax.grad(loss)(flat))

    np.testing.assert_array_equal(outs[0], outs[1])
    for a, b in zip(grads[0], grads[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("save_acts", [False, True])
def test_fused_train_interleave_matches_single_chain(small_setup, save_acts):
    """interleave>1 (sub-chain ILP emission) reproduces interleave=1: the
    forward is bitwise identical (each sub-block runs the same math on its
    own rows); grads differ only in f32 accumulation order (J partial-sum
    adds vs one longer row contraction)."""
    from fsnerf_tpu.ops.pallas.mlp import prep_params as prep
    from fsnerf_tpu.ops.pallas.mlp_train import (
        _flat_from_prepped, make_fused_train_mlp)

    _, params = small_setup
    x, d = _inputs(256, seed=13)
    pr = prep(params, n_layers=4, skip=(2,))
    flat = tuple(_flat_from_prepped(pr))
    encx = positional_encoding(x, 4, True)
    encd = positional_encoding(d, 2, True)
    ex = jnp.zeros((256, pr["d_enc_pad"]), jnp.bfloat16
                   ).at[:, :encx.shape[1]].set(encx.astype(jnp.bfloat16))
    ed = jnp.zeros((256, pr["d_dir_pad"]), jnp.bfloat16
                   ).at[:, :encd.shape[1]].set(encd.astype(jnp.bfloat16))

    outs, grads = {}, {}
    for j in (1, 2, 4):
        fused, _ = make_fused_train_mlp(4, (2,), block_rows=128,
                                        interpret=True, save_acts=save_acts,
                                        interleave=j)

        def loss(flat):
            return jnp.sum(fused(flat, ex, ed) ** 2)

        outs[j] = np.asarray(fused(flat, ex, ed))
        grads[j] = jax.grad(loss)(flat)

    for j in (2, 4):
        np.testing.assert_array_equal(outs[1], outs[j])
        for a, b in zip(grads[1], grads[j]):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            scale = np.abs(a).max() + 1e-8
            assert np.abs(a - b).max() / scale < 1e-3


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


# ---------------------------------------------------------------------------
# Fused volume-rendering kernel (ops/pallas/volrend.py)
# ---------------------------------------------------------------------------

def _volrend_inputs(R=96, S=48, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    sigmas = jnp.asarray(rng.normal(0.0, 3.0, (R, S)), jnp.float32)  # raw head
    rgbs = jnp.asarray(rng.uniform(0, 1, (R, S, 3)), jnp.float32)
    t = jnp.asarray(np.sort(rng.uniform(2.0, 6.0, (R, S)), -1), jnp.float32)
    deltas = jnp.asarray(rng.uniform(1e-3, 0.1, (R, S)), jnp.float32)
    mask = None
    if masked:
        # mix of prefix-valid rays, all-masked rays, and random holes
        mask = rng.uniform(size=(R, S)) > 0.3
        mask[:4] = False                      # fully masked -> pure background
        mask = jnp.asarray(mask)
    return sigmas, rgbs, t, deltas, mask


@pytest.mark.parametrize("masked,bkgd", [(True, 1.0), (False, 0.0),
                                         (True, 0.0)])
def test_volrend_kernel_matches_jnp(masked, bkgd):
    from fsnerf_tpu.ops.pallas.volrend import volume_render_pallas
    from fsnerf_tpu.ops.volrend import volume_render

    sigmas, rgbs, t, deltas, mask = _volrend_inputs(masked=masked)
    ref = volume_render(sigmas, rgbs, t, deltas, mask, bkgd)
    got = volume_render_pallas(sigmas, rgbs, t, deltas, mask, bkgd,
                               block_rows=32, interpret=True)
    for k in ("rgb", "opacity", "depth", "weights", "trans_final"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_volrend_kernel_row_padding():
    """R not a multiple of block_rows pads internally and slices back."""
    from fsnerf_tpu.ops.pallas.volrend import volume_render_pallas
    from fsnerf_tpu.ops.volrend import volume_render

    sigmas, rgbs, t, deltas, mask = _volrend_inputs(R=37, S=16, seed=3)
    ref = volume_render(sigmas, rgbs, t, deltas, mask, 0.5)
    got = volume_render_pallas(sigmas, rgbs, t, deltas, mask, 0.5,
                               block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), rtol=1e-5, atol=1e-6)
    assert got["weights"].shape == (37, 16)


def test_volrend_kernel_vector_bkgd():
    from fsnerf_tpu.ops.pallas.volrend import volume_render_pallas
    from fsnerf_tpu.ops.volrend import volume_render

    sigmas, rgbs, t, deltas, mask = _volrend_inputs(R=32, S=16, seed=4)
    bkgd = jnp.asarray([0.2, 0.5, 0.9])
    ref = volume_render(sigmas, rgbs, t, deltas, mask, bkgd)
    got = volume_render_pallas(sigmas, rgbs, t, deltas, mask, bkgd,
                               block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Fused ray-march render kernel (ops/pallas/render.py)
# ---------------------------------------------------------------------------

def _render_setup():
    from fsnerf_tpu.ops import occgrid as og

    model = NeRF(n_layers=4, d_filter=64, skip=(2,), n_freqs=4,
                 n_freqs_views=2, compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.key(2))
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    grid = og.create(aabb, resolution=16, levels=1)
    dens = lambda x: jnp.where(jnp.linalg.norm(x, axis=-1) < 1.2, 30.0, 0.0)
    grid = og.update(grid, dens, None, jnp.asarray(0))
    rng = np.random.default_rng(0)
    # rays from a shell aimed roughly at the origin
    ro = rng.normal(size=(48, 3))
    ro = 4.0 * ro / np.linalg.norm(ro, axis=-1, keepdims=True)
    rd = -ro / 4.0 + 0.1 * rng.normal(size=(48, 3))
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    return model, params, grid, jnp.asarray(ro, jnp.float32), \
        jnp.asarray(rd, jnp.float32)


@pytest.mark.parametrize("fused_encode", [False, True])
def test_fused_render_matches_xla_path(fused_encode):
    from fsnerf_tpu.ops.pallas.render import make_fused_ray_renderer
    from fsnerf_tpu.render.renderer import render_rays_occgrid

    model, params, grid, ro, rd = _render_setup()
    kw = dict(n_samples=64, render_step_size=0.05, white_bkgd=True,
              n_compact=32, early_stop_eps=1e-4)
    ref = render_rays_occgrid(lambda x, d=None: model.apply(params, x, d),
                              ro, rd, grid, **kw)
    fused = make_fused_ray_renderer(params, n_layers=4, skip=(2,), n_freqs=4,
                                    n_freqs_views=2, early_stop_eps=1e-4,
                                    block_rows=16, chunk_s=8, interpret=True,
                                    fused_encode=fused_encode)
    got = render_rays_occgrid(None, ro, rd, grid, fused_render_fn=fused, **kw)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), atol=7e-3)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=3e-2)
    np.testing.assert_allclose(np.asarray(got["opacity"]),
                               np.asarray(ref["opacity"]), atol=7e-3)
    np.testing.assert_allclose(np.asarray(got["n_valid"]),
                               np.asarray(ref["n_valid"]))


def test_fused_render_encode_mode_applies_freq_masks():
    """In-kernel-encode fused render with FreeNeRF masks == the XLA path
    with the same masks (masks ride the lane-constant operand's validity
    row instead of multiplying precomputed features)."""
    from fsnerf_tpu.core.encoding import freq_mask
    from fsnerf_tpu.ops.pallas.render import make_fused_ray_renderer
    from fsnerf_tpu.render.renderer import render_rays_occgrid

    model, params, grid, ro, rd = _render_setup()
    pos_mask = freq_mask(4, 7, 20)
    dir_mask = freq_mask(2, 7, 20)
    kw = dict(n_samples=64, render_step_size=0.05, white_bkgd=True,
              n_compact=32, early_stop_eps=1e-4)
    ref = render_rays_occgrid(
        lambda x, d=None: model.apply(params, x, d, pos_mask=pos_mask,
                                      dir_mask=dir_mask),
        ro, rd, grid, **kw)
    fused = make_fused_ray_renderer(params, n_layers=4, skip=(2,), n_freqs=4,
                                    n_freqs_views=2, early_stop_eps=1e-4,
                                    block_rows=16, chunk_s=8, interpret=True,
                                    pos_mask=pos_mask, dir_mask=dir_mask,
                                    fused_encode=True)
    got = render_rays_occgrid(None, ro, rd, grid, fused_render_fn=fused, **kw)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), atol=7e-3)
    np.testing.assert_allclose(np.asarray(got["opacity"]),
                               np.asarray(ref["opacity"]), atol=7e-3)


def test_fused_render_early_exit_is_lossless():
    """Exact-transmittance chunk skipping must not change the image beyond
    the eps cutoff's own contribution bound."""
    from fsnerf_tpu.ops.pallas.render import make_fused_ray_renderer
    from fsnerf_tpu.render.renderer import render_rays_occgrid

    model, params, grid, ro, rd = _render_setup()
    kw = dict(n_samples=64, render_step_size=0.05, white_bkgd=True,
              n_compact=32, early_stop_eps=0.0)   # no approximate pre-mask
    mk = lambda eps: make_fused_ray_renderer(
        params, n_layers=4, skip=(2,), n_freqs=4, n_freqs_views=2,
        early_stop_eps=eps, block_rows=16, chunk_s=8, interpret=True)
    a = render_rays_occgrid(None, ro, rd, grid, fused_render_fn=mk(0.0), **kw)
    b = render_rays_occgrid(None, ro, rd, grid, fused_render_fn=mk(1e-3),
                            **kw)
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               atol=2e-3)


def test_fused_hierarchical_render_matches_xla_path():
    """r5 (VERDICT r4 weak #3): the hierarchical FINE pass through the
    fused ray-march kernel == the XLA coarse/fine path. The fused path
    re-evaluates the sorted coarse-union-fine t instead of payload-merging
    cached coarse outputs — same network at the same positions, so only
    kernel-vs-XLA bf16 scheduling noise remains."""
    from fsnerf_tpu.ops.pallas.render import make_fused_ray_renderer
    from fsnerf_tpu.render.renderer import render_rays_hierarchical

    model, params, _, ro, rd = _render_setup()
    model_fn = lambda x, d=None: model.apply(params, x, d)
    kw = dict(near=2.0, far=6.0, n_coarse=32, n_fine=32, key=None,
              white_bkgd=True)
    _, ref = render_rays_hierarchical(model_fn, ro, rd, **kw)
    fused = make_fused_ray_renderer(params, n_layers=4, skip=(2,), n_freqs=4,
                                    n_freqs_views=2, early_stop_eps=1e-4,
                                    block_rows=16, chunk_s=8, interpret=True)
    _, got = render_rays_hierarchical(model_fn, ro, rd,
                                      fused_render_fn=fused, **kw)
    np.testing.assert_allclose(np.asarray(got["t_vals"]),
                               np.asarray(ref["t_vals"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), atol=7e-3)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=3e-2)
    np.testing.assert_allclose(np.asarray(got["opacity"]),
                               np.asarray(ref["opacity"]), atol=7e-3)


def test_fused_render_in_render_frame():
    """End-to-end frame assembly through the fused kernel path."""
    from fsnerf_tpu.ops.pallas.render import make_fused_ray_renderer
    from fsnerf_tpu.render.renderer import render_frame
    from fsnerf_tpu.data.poses import pose_from_spherical

    model, params, grid, _, _ = _render_setup()
    fused = make_fused_ray_renderer(params, n_layers=4, skip=(2,), n_freqs=4,
                                    n_freqs_views=2, block_rows=16,
                                    chunk_s=8, interpret=True)
    pose = jnp.asarray(pose_from_spherical(4.0, 45.0, 30.0))
    img, depth = render_frame(
        lambda x, d=None: model.apply(params, x, d), pose, (8, 8, 8.0),
        2.0, 6.0, grid=grid, n_samples=48, n_compact=24, white_bkgd=True,
        chunksize=32, fused_render_fn=fused)
    assert img.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_fused_siren_render_matches_xla_path():
    """SIREN variant of the fused ray-march kernel == the XLA sinerf render
    pipeline (VERDICT r3 item 2): same compositing shell, SIREN trunk+heads
    with _sincos_fast, raw per-ray dirs."""
    from fsnerf_tpu.core.models import SiNeRF
    from fsnerf_tpu.ops import occgrid as og
    from fsnerf_tpu.ops.pallas.render import make_fused_siren_ray_renderer
    from fsnerf_tpu.render.renderer import render_rays_occgrid

    model = SiNeRF(width=64, alpha=(30.0, 1.0, 1.0, 1.0),
                   compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.key(3))
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    grid = og.create(aabb, resolution=16, levels=1)
    dens = lambda x: jnp.where(jnp.linalg.norm(x, axis=-1) < 1.2, 30.0, 0.0)
    grid = og.update(grid, dens, None, jnp.asarray(0))
    rng = np.random.default_rng(4)
    ro = rng.normal(size=(48, 3))
    ro = 4.0 * ro / np.linalg.norm(ro, axis=-1, keepdims=True)
    rd = -ro / 4.0 + 0.1 * rng.normal(size=(48, 3))
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro, rd = jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32)

    kw = dict(n_samples=64, render_step_size=0.05, white_bkgd=True,
              n_compact=32, early_stop_eps=1e-4)
    ref = render_rays_occgrid(lambda x, d=None: model.apply(params, x, d),
                              ro, rd, grid, **kw)
    fused = make_fused_siren_ray_renderer(
        params, n_layers=4, alphas=(30.0, 1.0, 1.0, 1.0),
        early_stop_eps=1e-4, block_rows=16, chunk_s=8, interpret=True)
    got = render_rays_occgrid(None, ro, rd, grid, fused_render_fn=fused, **kw)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), atol=7e-3)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=3e-2)
    np.testing.assert_allclose(np.asarray(got["opacity"]),
                               np.asarray(ref["opacity"]), atol=7e-3)


def test_fused_siren_render_fn_wiring():
    """cli.make_fused_render_fn must return the SIREN kernel for sinerf +
    occgrid on an accelerator backend (monkeypatch the backend check)."""
    from unittest import mock

    from fsnerf_tpu.cli import make_fused_render_fn
    from fsnerf_tpu.config import Config, ModelConfig

    cfg = Config(model=ModelConfig(model="sinerf", n_layers=4, d_filter=64))
    model = __import__("fsnerf_tpu.core.models",
                       fromlist=["SiNeRF"]).SiNeRF(
        width=64, alpha=(30.0, 1.0, 1.0, 1.0))
    params = init_params(model, jax.random.key(0))
    with mock.patch("jax.default_backend", return_value="tpu"):
        fn = make_fused_render_fn(params, cfg)
    assert fn is not None
    assert make_fused_render_fn(params, cfg) is None   # CPU backend -> None


def test_fused_density_matches_model(small_setup):
    """Density-only kernel (occupancy-refresh path) == model.apply sigma."""
    from fsnerf_tpu.ops.pallas.mlp import fused_density

    model, params = small_setup
    x, _ = _inputs(200, seed=3)
    ref = np.asarray(model.apply(params, x), np.float32)[:, 0]
    prepped = prep_params(params, n_layers=4, skip=(2,))
    encx = positional_encoding(x, 4, True)
    got = np.asarray(fused_density(prepped, encx, block_rows=64,
                                   interpret=True))
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-2)


def test_fused_density_fn_in_grid_update(small_setup):
    """make_fused_density_fn drives og.update like the model path."""
    from fsnerf_tpu.ops import occgrid as og
    from fsnerf_tpu.ops.pallas.mlp import make_fused_density_fn

    model, params = small_setup
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    g0 = og.create(aabb, resolution=8, levels=1)
    f_fused = make_fused_density_fn(params, n_layers=4, skip=(2,), n_freqs=4,
                                    interpret=True)
    f_model = lambda x: model.apply(params, x)[..., 0]
    ga = og.update(g0, f_fused, None, jnp.asarray(0))
    gb = og.update(g0, f_model, None, jnp.asarray(0))
    # bf16 kernel vs bf16 XLA: EMA values match to bf16 rounding, and the
    # binarization agrees except for cells straddling the threshold
    np.testing.assert_allclose(np.asarray(ga.occs), np.asarray(gb.occs),
                               rtol=0.1, atol=1e-3)
    agree = (np.asarray(ga.binaries) == np.asarray(gb.binaries)).mean()
    assert agree > 0.98, agree


# ---------------------------------------------------------------------------
# Fused SiNeRF (SIREN) train kernel (ops/pallas/siren.py)
# ---------------------------------------------------------------------------

def _siren_setup():
    from fsnerf_tpu.core.models import SiNeRF

    model = SiNeRF(width=64, alpha=(30.0, 1.0, 1.0, 1.0),
                   compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.key(7))
    return model, params


def test_fused_siren_matches_model():
    from fsnerf_tpu.config import ModelConfig
    from fsnerf_tpu.ops.pallas.siren import make_fused_siren_model_fn

    model, params = _siren_setup()
    x, d = _inputs(192, seed=9)
    ref = np.asarray(model.apply(params, x, d), np.float32)
    fn = make_fused_siren_model_fn(
        ModelConfig(model="sinerf", n_layers=4, d_filter=64),
        block_rows=64, interpret=True)
    got = np.asarray(fn(params, x, d))
    np.testing.assert_allclose(got[:, :3], ref[:, :3], atol=5e-3)
    scale = np.abs(ref[:, 3]).max() + 1e-9
    np.testing.assert_allclose(got[:, 3] / scale, ref[:, 3] / scale,
                               atol=2e-2)


def test_fused_siren_vjp_matches_autodiff():
    """Weight grads through the custom-VJP Pallas backward == jax autodiff
    through the bf16 flax SiNeRF (both recompute in bf16; sine phases f32)."""
    from fsnerf_tpu.config import ModelConfig
    from fsnerf_tpu.ops.pallas.siren import make_fused_siren_model_fn

    model, params = _siren_setup()
    x, d = _inputs(128, seed=11)
    tgt = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (128, 4)),
                      jnp.float32)
    fn = make_fused_siren_model_fn(
        ModelConfig(model="sinerf", n_layers=4, d_filter=64),
        block_rows=64, interpret=True)

    def loss_fused(p):
        return jnp.mean((fn(p, x, d) - tgt) ** 2)

    def loss_ref(p):
        return jnp.mean((model.apply(p, x, d) - tgt) ** 2)

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_ref)(params)
    for (k1, a), (k2, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g1),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g2),
                   key=lambda kv: str(kv[0]))):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-9
        np.testing.assert_allclose(a / scale, b / scale, atol=4e-2,
                                   err_msg=str(k1))


def test_fused_siren_saved_acts_matches_recompute():
    """Saved-acts SIREN backward vs the recompute backward: primal values
    are bitwise identical (primal calls never save); gradients agree to the
    bf16 rounding of the saved cos factor (the recompute holds it f32)."""
    from fsnerf_tpu.config import ModelConfig
    from fsnerf_tpu.ops.pallas.siren import make_fused_siren_model_fn

    _, params = _siren_setup()
    x, d = _inputs(128, seed=15)
    tgt = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (128, 4)),
                      jnp.float32)
    cfg = ModelConfig(model="sinerf", n_layers=4, d_filter=64)
    outs, grads = {}, {}
    for mode in (False, True):
        fn = make_fused_siren_model_fn(cfg, block_rows=64, interpret=True,
                                       save_acts=mode)

        def loss(p):
            return jnp.mean((fn(p, x, d) - tgt) ** 2)

        outs[mode] = np.asarray(fn(params, x, d))
        grads[mode] = jax.grad(loss)(params)

    np.testing.assert_array_equal(outs[False], outs[True])
    for (k1, a), (_, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(grads[False]),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(grads[True]),
                   key=lambda kv: str(kv[0]))):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.abs(a).max() + 1e-9
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-2,
                                   err_msg=str(k1))


def test_fused_siren_in_train_step():
    """SiNeRF end-to-end through the fused path (interpret) in the real
    train step: loss decreases, state advances."""
    import fsnerf_tpu.ops.pallas.siren as SIR
    from fsnerf_tpu.config import (Config, DataConfig, EncoderConfig,
                                   ModelConfig, SamplingConfig, TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.data.pool import pool_from_images
    from fsnerf_tpu.data.synthetic import SphereScene
    from fsnerf_tpu.train.step import (init_state, make_optimizer,
                                       make_train_step)

    orig = SIR.make_fused_siren_model_fn
    SIR.make_fused_siren_model_fn = functools.partial(orig, block_rows=64,
                                                      interpret=True)
    try:
        cfg = Config(
            data=DataConfig(dataset="sphere", white_bkgd=True),
            model=ModelConfig(model="sinerf", n_layers=4, d_filter=32,
                              fused_kernel=True),
            sampling=SamplingConfig(strategy="occgrid", n_samples=32,
                                    n_compact=16, grid_resolution=8,
                                    warmup_steps=2, update_interval=4,
                                    render_step_size=0.2),
            train=TrainConfig(n_iters=24, batch_size=64, lro=5e-4,
                              scheduler="const", dtype="bfloat16"),
        )
        scene = SphereScene(n_imgs=3, hw=12, white_bkgd=True)
        model = make_model(cfg)
        pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
        opt = make_optimizer(cfg)
        state = init_state(model, cfg, opt, scene.aabb, jax.random.key(0))
        step = jax.jit(make_train_step(model, cfg, opt, pool, scene))
        losses = []
        for _ in range(24):
            state, m = step(state)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        # SIREN descent is noisy at this tiny batch/lr: compare averaged
        # tails rather than endpoints (grad correctness is pinned by
        # test_fused_siren_vjp_matches_autodiff)
        assert np.mean(losses[-4:]) < np.mean(losses[:4])
    finally:
        SIR.make_fused_siren_model_fn = orig


def test_sincos_fast_accuracy():
    """_sincos_fast (the in-kernel sin/cos used by every SIREN kernel) must
    stay within ~1e-4 of the libm values over the SIREN argument range
    (|30 y| up to a few hundred) — far below the bf16 rounding (~4e-3) of
    every consumer. Pins the polynomial/reduction against regressions."""
    from fsnerf_tpu.ops.pallas.siren import _sincos_fast

    rng = np.random.default_rng(0)
    for lo, hi in ((-3.2, 3.2), (-40.0, 40.0), (-400.0, 400.0)):
        x = jnp.asarray(rng.uniform(lo, hi, size=(1 << 15,)), jnp.float32)
        s, c = _sincos_fast(x, want_sin=True, want_cos=True)
        assert float(jnp.max(jnp.abs(s - jnp.sin(x)))) < 2e-4, (lo, hi)
        assert float(jnp.max(jnp.abs(c - jnp.cos(x)))) < 2e-4, (lo, hi)
    # edge arguments: exact zeros and half-pi multiples
    x = jnp.asarray([0.0, np.pi / 2, -np.pi / 2, np.pi, -np.pi, 30.0],
                    jnp.float32)
    s, c = _sincos_fast(x, want_sin=True, want_cos=True)
    np.testing.assert_allclose(np.asarray(s), np.sin(np.asarray(x)),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(c), np.cos(np.asarray(x)),
                               atol=2e-4)


@pytest.mark.parametrize("save_acts", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_fused_encode_in_kernel_matches_xla_encoding(small_setup, masked,
                                                     save_acts):
    """encode=(F, Fd) mode (in-kernel periodic-4 positional encoding,
    _encode_block + prep_params(enc_lanes=...)) vs the precomputed-encoding
    kernel: values and parameter grads, with and without FreeNeRF masks.
    Tolerances cover the _sincos_fast polynomial (<= 9e-5, below the
    features' bf16 rounding)."""
    import jax.tree_util as jtu
    from fsnerf_tpu.core.encoding import freq_mask
    from fsnerf_tpu.ops.pallas.mlp import encode_lane_operand
    from fsnerf_tpu.ops.pallas.mlp import prep_params as prep
    from fsnerf_tpu.ops.pallas.mlp_train import (
        _flat_from_prepped, make_fused_train_mlp)

    model, params = small_setup
    x, d = _inputs(256, seed=11)
    tgt = jnp.asarray(np.random.default_rng(12).uniform(0, 1, (256, 4)),
                      dtype=jnp.float32)
    pos_mask = freq_mask(4, 7, 20) if masked else None
    dir_mask = freq_mask(2, 7, 20) if masked else None

    fused_ref, _ = make_fused_train_mlp(4, (2,), block_rows=128,
                                        interpret=True, save_acts=save_acts)
    fused_enc, _ = make_fused_train_mlp(4, (2,), block_rows=128,
                                        interpret=True, save_acts=save_acts,
                                        encode=(4, 2))
    cx = encode_lane_operand(4, True, pos_mask)
    cd = encode_lane_operand(2, True, dir_mask)

    def tile16(v):
        return jnp.tile(jnp.pad(v, ((0, 0), (0, 1))), (1, 4))

    def loss_ref(params):
        pr = prep(params, n_layers=4, skip=(2,))
        flat = tuple(_flat_from_prepped(pr))
        encx = positional_encoding(x, 4, True, pos_mask)
        encd = positional_encoding(d, 2, True, dir_mask)
        ex = jnp.zeros((256, pr["d_enc_pad"]), jnp.bfloat16
                       ).at[:, :encx.shape[1]].set(encx.astype(jnp.bfloat16))
        ed = jnp.zeros((256, pr["d_dir_pad"]), jnp.bfloat16
                       ).at[:, :encd.shape[1]].set(encd.astype(jnp.bfloat16))
        return jnp.mean((fused_ref(flat, ex, ed) - tgt) ** 2)

    def loss_enc(params):
        pr = prep(params, n_layers=4, skip=(2,), enc_lanes=(4, 2))
        flat = tuple(_flat_from_prepped(pr))
        return jnp.mean(
            (fused_enc(flat, tile16(x), tile16(d), cx, cd) - tgt) ** 2)

    lr, le = float(loss_ref(params)), float(loss_enc(params))
    assert abs(le - lr) / (abs(lr) + 1e-8) < 5e-3, (le, lr)

    gr = jax.grad(loss_ref)(params)
    ge = jax.grad(loss_enc)(params)
    for (pa, a), (_, b) in zip(jtu.tree_flatten_with_path(ge)[0],
                               jtu.tree_flatten_with_path(gr)[0]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = np.abs(b).max() + 1e-8
        assert np.abs(a - b).max() / scale < 0.06, jtu.keystr(pa)
