"""AOT serving-artifact roundtrip (utils/export.py).

Exports a compiled chunk renderer (params + grid baked in) to StableHLO,
reloads it in the same process, and checks (a) the deserialized program
reproduces the live renderer bitwise, (b) render_frame_exported's chunk/pad
loop matches render_frame."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsnerf_tpu.config import (Config, DataConfig, EncoderConfig, ModelConfig,
                               SamplingConfig, TrainConfig)
from fsnerf_tpu.core.models import init_params, make_model
from fsnerf_tpu.data.synthetic import SphereScene
from fsnerf_tpu.ops import occgrid as og
from fsnerf_tpu.render.renderer import make_chunk_renderer, render_frame
from fsnerf_tpu.utils.export import (export_render_artifact,
                                     load_render_artifact,
                                     render_frame_exported)

CHUNK = 128


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        encoder=EncoderConfig(n_freqs=4, n_freqs_views=2),
        model=ModelConfig(n_layers=2, d_filter=32, skip=(1,)),
        data=DataConfig(dataset="sphere", white_bkgd=True),
        sampling=SamplingConfig(strategy="occgrid", n_samples=32,
                                grid_resolution=16, render_step_size=0.1),
        train=TrainConfig(dtype="float32"),
    )
    scene = SphereScene(n_imgs=2, hw=16)
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0))

    def model_fn(x, d=None):
        return model.apply(params, x, d)

    grid = og.create(scene.aabb, cfg.sampling.grid_resolution, 1)
    renderer = make_chunk_renderer(
        model_fn, strategy="occgrid", grid=grid,
        n_samples=cfg.sampling.n_samples,
        render_step_size=cfg.sampling.render_step_size,
        white_bkgd=True, near=scene.near, far=scene.far)
    return cfg, scene, model_fn, grid, renderer


def test_roundtrip_bitwise(setup, tmp_path):
    cfg, scene, model_fn, grid, renderer = setup
    path = export_render_artifact(
        renderer, CHUNK, str(tmp_path / "artifact"),
        hwf=scene.hwf, near=scene.near, far=scene.far)
    fn, meta = load_render_artifact(path)
    assert meta["chunksize"] == CHUNK
    assert meta["near"] == scene.near

    rng = np.random.default_rng(0)
    ro = rng.normal(size=(CHUNK, 3)).astype(np.float32)
    ro = ro / np.linalg.norm(ro, axis=-1, keepdims=True) * 4.0
    rd = (-ro / np.linalg.norm(ro, axis=-1, keepdims=True)).astype(np.float32)
    rgb_live, depth_live = renderer(jnp.asarray(ro), jnp.asarray(rd))
    rgb_art, depth_art = fn(jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_array_equal(np.asarray(rgb_live), np.asarray(rgb_art))
    np.testing.assert_array_equal(np.asarray(depth_live),
                                  np.asarray(depth_art))


def test_render_frame_exported_matches(setup, tmp_path):
    cfg, scene, model_fn, grid, renderer = setup
    path = export_render_artifact(
        renderer, CHUNK, str(tmp_path / "artifact2"),
        hwf=scene.hwf, near=scene.near, far=scene.far)
    rgb, depth = render_frame_exported(path, scene.poses[0])
    H, W, _ = scene.hwf
    assert rgb.shape == (H, W, 3) and depth.shape == (H, W)
    rgb_ref, depth_ref = render_frame(
        model_fn, jnp.asarray(scene.poses[0]), scene.hwf, scene.near,
        scene.far, strategy="occgrid", grid=grid,
        n_samples=cfg.sampling.n_samples,
        render_step_size=cfg.sampling.render_step_size, white_bkgd=True,
        chunksize=CHUNK)
    np.testing.assert_allclose(rgb, np.asarray(rgb_ref), atol=1e-5)
    np.testing.assert_allclose(depth, np.asarray(depth_ref), atol=1e-4)


def test_render_frame_exported_compact_transfer(setup, tmp_path):
    """compact_transfer quantizes on device: uint8 rgb with to8b semantics,
    float16 depth — same pixels as the f32 pull after quantization."""
    cfg, scene, model_fn, grid, renderer = setup
    path = export_render_artifact(
        renderer, CHUNK, str(tmp_path / "artifact3"),
        hwf=scene.hwf, near=scene.near, far=scene.far)
    rgb_f32, depth_f32 = render_frame_exported(path, scene.poses[0])
    rgb8, depth16 = render_frame_exported(path, scene.poses[0],
                                          compact_transfer=True)
    assert rgb8.dtype == np.uint8 and depth16.dtype == np.float16
    np.testing.assert_array_equal(
        rgb8, (255.0 * np.clip(rgb_f32, 0, 1)).astype(np.uint8))
    np.testing.assert_allclose(depth16.astype(np.float32), depth_f32,
                               rtol=2e-3)
