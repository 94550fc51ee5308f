"""Renderer tests: frame assembly, facade API, tiled multi-device rendering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsnerf_tpu.ops import occgrid as og
from fsnerf_tpu.render.facade import Renderer
from fsnerf_tpu.render.renderer import render_frame, render_path, render_video, to8b


AABB = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])


def _analytic_model(x, dirs=None):
    """Closed-form 'model': dense inside the unit sphere, normal-colored."""
    r = jnp.linalg.norm(x, axis=-1, keepdims=True)
    sigma = jnp.where(r < 1.0, 50.0, 0.0)
    rgb = jnp.clip(0.5 * (x / jnp.maximum(r, 1e-6) + 1.0), 0.0, 1.0)
    return jnp.concatenate([rgb, sigma], axis=-1)


def _grid():
    grid = og.create(AABB, resolution=32, levels=1)
    dens = lambda x: jnp.where(jnp.linalg.norm(x, axis=-1) < 1.0, 50.0, 0.0)
    return og.update(grid, dens, None, jnp.asarray(0))


def _pose():
    from fsnerf_tpu.data.poses import pose_from_spherical
    return jnp.asarray(pose_from_spherical(4.0, 45.0, 30.0))


def test_render_frame_hits_sphere():
    H = W = 32
    hwf = (H, W, 30.0)
    img, depth = render_frame(_analytic_model, _pose(), hwf, 2.0, 6.0,
                              grid=_grid(), n_samples=96, n_compact=64,
                              white_bkgd=True, chunksize=512)
    img, depth = np.asarray(img), np.asarray(depth)
    assert img.shape == (H, W, 3) and depth.shape == (H, W)
    # center pixel hits the sphere (depth ~ 3), corners are background
    assert 2.5 < depth[H // 2, W // 2] < 3.5
    np.testing.assert_allclose(img[0, 0], 1.0, atol=1e-3)   # white bkgd
    assert img[H // 2, W // 2].max() < 0.99                 # hit != bkgd


def test_render_frame_chunksize_invariance():
    hwf = (16, 16, 15.0)
    a, _ = render_frame(_analytic_model, _pose(), hwf, 2.0, 6.0,
                        grid=_grid(), n_samples=64, white_bkgd=True,
                        chunksize=64)
    b, _ = render_frame(_analytic_model, _pose(), hwf, 2.0, 6.0,
                        grid=_grid(), n_samples=64, white_bkgd=True,
                        chunksize=256)   # 256 = H*W: single chunk
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_render_path_and_video():
    from fsnerf_tpu.data.poses import spherical_path
    hwf = (8, 8, 8.0)
    poses = jnp.asarray(spherical_path(4.0, 50.0, 3))
    frames, d_frames = render_path(_analytic_model, poses, hwf, 2.0, 6.0,
                                   grid=_grid(), n_samples=48,
                                   white_bkgd=True, chunksize=64)
    assert frames.shape == (3, 8, 8, 3)
    rgb8, dep8 = render_video(frames, d_frames)
    assert rgb8.shape == (3, 3, 8, 8) and rgb8.dtype == np.uint8
    assert dep8.shape == (3, 3, 8, 8)


def test_to8b():
    x = np.array([-0.5, 0.0, 0.5, 1.0, 2.0])
    np.testing.assert_array_equal(to8b(x), [0, 0, 127, 255, 255])


def test_renderer_facade():
    r = Renderer(_analytic_model, _grid(), n_samples=64, n_compact=48,
                 white_bkgd=True, chunksize=128)
    out = r.render_rays(jnp.array([[0.0, 0.0, 4.0]]),
                        jnp.array([[0.0, 0.0, -1.0]]))
    assert float(out["opacity"][0]) > 0.9
    img, depth = r.render_frame(_pose(), (8, 8, 8.0))
    assert img.shape == (8, 8, 3)
    frames, _ = r.render_poses(jnp.asarray([np.asarray(_pose())]), (8, 8, 8.0))
    assert frames.shape == (1, 8, 8, 3)


def test_tiled_rendering_matches_single_device():
    """Chip-tiled SPMD rendering == sequential rendering (parallel layer)."""
    from fsnerf_tpu.parallel.mesh import make_mesh
    from fsnerf_tpu.parallel.train_parallel import render_rays_tiled

    grid = _grid()
    H = W = 16
    hwf = (H, W, 15.0)
    from fsnerf_tpu.data.rays import get_rays
    o, d = get_rays(_pose(), hwf)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    def render_fn(ro, rd):
        from fsnerf_tpu.render.renderer import render_rays_occgrid
        out = render_rays_occgrid(_analytic_model, ro, rd, grid, 64,
                                  white_bkgd=True)
        return {"rgb": out["rgb"], "depth": out["depth"]}

    seq = render_fn(o, d)
    mesh = make_mesh(8)
    tiled = render_rays_tiled(render_fn, o, d, mesh)
    np.testing.assert_allclose(np.asarray(tiled["rgb"]),
                               np.asarray(seq["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tiled["depth"]),
                               np.asarray(seq["depth"]), atol=1e-5)


def test_chunks_and_pose_debug_plot(tmp_path):
    from fsnerf_tpu.utils.chunks import get_chunks, save_origins_and_dirs
    x = np.arange(10)
    cs = get_chunks(x, 4)
    assert [len(c) for c in cs] == [4, 4, 2]
    from fsnerf_tpu.data.poses import spherical_path
    p = save_origins_and_dirs(spherical_path(4.0, 50.0, 5),
                              str(tmp_path / "poses.png"))
    import os
    assert os.path.getsize(p) > 0


def test_count_valid_samples_matches_render_n_valid():
    """The model-free probe must agree with render_rays_occgrid's n_valid."""
    from fsnerf_tpu.render.renderer import count_valid_samples, render_rays_occgrid

    rng = np.random.default_rng(2)
    o = rng.normal(size=(32, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / 4.0
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    grid = _grid()
    out = render_rays_occgrid(_analytic_model, o, d, grid, 64,
                              render_step_size=0.05, n_compact=32)
    nv = count_valid_samples(o, d, grid, 64, render_step_size=0.05)
    np.testing.assert_array_equal(np.asarray(out["n_valid"]), np.asarray(nv))


def test_derive_eval_n_compact_from_converged_grid():
    from fsnerf_tpu.cli import derive_eval_n_compact
    from fsnerf_tpu.config import Config, DataConfig, SamplingConfig

    class _Split:
        poses = np.stack([np.asarray(_pose())])
        hwf = (24, 24, 20.0)
        ndc = False
        aabb = np.asarray(AABB)

    cfg = Config(data=DataConfig(dataset="sphere"),
                 sampling=SamplingConfig(strategy="occgrid", n_samples=96,
                                         n_compact=96, grid_resolution=32,
                                         render_step_size=0.05))
    k = derive_eval_n_compact(_grid(), _Split(), cfg)
    # converged sphere grid: far fewer than the 96 ceiling, ladder-aligned
    assert 16 <= k < 96 and k % 16 == 0, k
    # adaptive off -> ceiling unchanged
    import dataclasses
    cfg2 = cfg.replace(sampling=dataclasses.replace(cfg.sampling,
                                                    adapt_compact=False))
    assert derive_eval_n_compact(_grid(), _Split(), cfg2) == 96


def test_hierarchical_shared_reuse_matches_union_eval():
    """Shared-network hierarchical rendering reuses the coarse outputs via a
    payload merge-sort instead of re-evaluating the union; passing the SAME
    function as a distinct coarse_model_fn forces the classic full-union
    evaluation — the two must agree (same positions through the same model)."""
    from fsnerf_tpu.render.renderer import render_rays_hierarchical

    rng = np.random.default_rng(5)
    o = rng.normal(size=(32, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 4.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    for key in (None, jax.random.key(3)):
        c_new, f_new = render_rays_hierarchical(
            _analytic_model, o, d, 2.0, 6.0, 32, 64, key=key,
            white_bkgd=True)
        c_old, f_old = render_rays_hierarchical(
            _analytic_model, o, d, 2.0, 6.0, 32, 64, key=key,
            white_bkgd=True, coarse_model_fn=_analytic_model)
        np.testing.assert_allclose(np.asarray(c_new["rgb"]),
                                   np.asarray(c_old["rgb"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(f_new["t_vals"]),
                                   np.asarray(f_old["t_vals"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_new["rgb"]),
                                   np.asarray(f_old["rgb"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(f_new["depth"]),
                                   np.asarray(f_old["depth"]), atol=1e-4)


def test_merge_sorted_union_custom_vjp_matches_autodiff():
    """_merge_sorted_union's sort-based backward (no take_along_axis) must
    produce the same cotangents as plain autodiff through a gather-based
    permutation of the same union."""
    from fsnerf_tpu.render.renderer import _merge_sorted_union

    rng = np.random.default_rng(17)
    t = jnp.asarray(rng.uniform(2.0, 6.0, (8, 24)), jnp.float32)
    o = jnp.asarray(rng.normal(size=(8, 24, 4)), jnp.float32)
    w_t = jnp.asarray(rng.normal(size=(8, 24)), jnp.float32)
    w_o = jnp.asarray(rng.normal(size=(8, 24, 4)), jnp.float32)

    def loss_custom(t, o):
        t_f, m = _merge_sorted_union(t, o)
        return jnp.sum(w_t * t_f) + jnp.sum(w_o * jnp.tanh(m))

    def loss_ref(t, o):
        idx = jnp.argsort(t, axis=-1)
        t_f = jnp.take_along_axis(t, idx, axis=-1)
        m = jnp.take_along_axis(o, idx[..., None], axis=-2)
        return jnp.sum(w_t * t_f) + jnp.sum(w_o * jnp.tanh(m))

    np.testing.assert_allclose(float(loss_custom(t, o)),
                               float(loss_ref(t, o)), rtol=1e-6)
    gc = jax.grad(loss_custom, argnums=(0, 1))(t, o)
    gr = jax.grad(loss_ref, argnums=(0, 1))(t, o)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gr[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gr[1]),
                               atol=1e-6)


def test_hierarchical_reuse_grads_match_union_grads():
    """Parameter-free check that gradients THROUGH the reuse merge equal
    gradients through the classic full-union evaluation: differentiate a
    scalar 'brightness' knob scaling the model output both ways."""
    from fsnerf_tpu.render.renderer import render_rays_hierarchical

    rng = np.random.default_rng(9)
    o = rng.normal(size=(16, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 4.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    key = jax.random.key(4)

    def make_loss(coarse_model_fn_from):
        def loss(gain):
            def model(x, dirs=None):
                out = _analytic_model(x, dirs)
                return out * gain
            kw = {}
            if coarse_model_fn_from:
                kw["coarse_model_fn"] = model
            c, f = render_rays_hierarchical(
                model, o, d, 2.0, 6.0, 16, 32, key=key, white_bkgd=True,
                **kw)
            return jnp.sum(f["rgb"] ** 2) + jnp.sum(c["rgb"] ** 2)
        return loss

    g_reuse = float(jax.grad(make_loss(False))(jnp.float32(1.0)))
    g_union = float(jax.grad(make_loss(True))(jnp.float32(1.0)))
    np.testing.assert_allclose(g_reuse, g_union, rtol=1e-4)
