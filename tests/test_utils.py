"""Tests for observability utilities, checkpointing, and the CLI config."""

import os

import numpy as np
import pytest


def test_apply_colormap_shape_and_range():
    from fsnerf_tpu.utils.plotting import apply_colormap
    depth = np.linspace(0, 6, 64).reshape(8, 8)
    rgba = apply_colormap(depth)
    assert rgba.shape == (8, 8, 4)
    assert rgba.min() >= 0.0 and rgba.max() <= 1.0
    # monotone colormap: first pixel differs from last
    assert not np.allclose(rgba[0, 0], rgba[-1, -1])


def test_density_animate_writes_gif(tmp_path):
    from fsnerf_tpu.utils.plotting import density_animate
    curves_a = np.abs(np.random.default_rng(0).normal(size=(3, 16)))
    curves_b = np.abs(np.random.default_rng(1).normal(size=(3, 16)))
    out = tmp_path / "densities.gif"
    density_animate(curves_a, curves_b, out_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_compare_densities_cli(tmp_path):
    from fsnerf_tpu.utils.compare_densities import main
    a, b = tmp_path / "a.npz", tmp_path / "b.npz"
    np.savez(a, curves=np.ones((2, 8)))
    np.savez(b, curves=np.zeros((2, 8)))
    out = tmp_path / "out.gif"
    assert main([str(a), str(b), "--out", str(out)]) == 0
    assert out.exists()


def test_camera_plotter_fallback(tmp_path):
    from fsnerf_tpu.utils.camera3dplotter import Camera3DPlotter
    p = Camera3DPlotter()
    p.set_poses(np.tile(np.eye(4)[None], (5, 1, 1)), "train")
    p.configure_pose_markers("train", color="red")
    p.set_axes_ranges([-5, 5], [-5, 5], [-5, 5])
    written = p.save_html(str(tmp_path / "poses.html"))
    assert os.path.exists(written) and os.path.getsize(written) > 0


def test_checkpointer_roundtrip(tmp_path):
    import jax
    from fsnerf_tpu.config import (Config, EncoderConfig, ModelConfig,
                                   SamplingConfig, TrainConfig)
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.train.step import init_state, make_optimizer
    from fsnerf_tpu.utils.checkpoint import Checkpointer

    cfg = Config(
        encoder=EncoderConfig(n_freqs=2, n_freqs_views=1),
        model=ModelConfig(n_layers=2, d_filter=8, skip=(1,)),
        sampling=SamplingConfig(grid_resolution=8),
        train=TrainConfig(batch_size=8),
    )
    model = make_model(cfg)
    optimizer = make_optimizer(cfg)
    aabb = np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], np.float32)
    state = init_state(model, cfg, optimizer, aabb, jax.random.key(0))

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    assert ckpt.latest_step() is None
    ckpt.save(state, 5, final=True)
    assert ckpt.latest_step() == 5

    template = init_state(model, cfg, optimizer, aabb, jax.random.key(1))
    restored = ckpt.restore(template)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    ckpt.close()


def test_config_cli_parsing():
    from fsnerf_tpu.config import config_from_args
    cfg = config_from_args([
        "--dataset", "llff", "--scene", "fern", "--n_imgs", "3",
        "--model", "sinerf", "--skip", "2,5", "--n_iters", "100",
        "--beta", "0.5", "--a", "1.0", "--b", "2.0", "--linear_freqs",
    ])
    assert cfg.data.dataset == "llff" and cfg.data.scene == "fern"
    assert cfg.model.model == "sinerf"
    assert cfg.model.skip == (2, 5)
    assert cfg.sampling.grid_levels == 4          # llff -> 4 levels
    assert cfg.train.beta == 0.5 and cfg.train.occ_a == 1.0
    assert cfg.encoder.log_space is False


def test_config_yaml_override(tmp_path):
    from fsnerf_tpu.config import Config, config_from_args
    base = Config()
    path = tmp_path / "c.yaml"
    base.save_yaml(str(path))
    cfg = config_from_args(["--config", str(path), "--n_iters", "42"])
    assert cfg.train.n_iters == 42
    assert cfg.model.d_filter == base.model.d_filter


def test_config_rejects_abbreviated_flags(tmp_path):
    """argparse prefix abbreviations (--n_iter for --n_iters) would be
    invisible to the explicit-flag scan and silently lose to the YAML;
    allow_abbrev=False makes them a hard parse error instead."""
    import pytest

    from fsnerf_tpu.config import Config, config_from_args
    path = tmp_path / "c.yaml"
    Config().save_yaml(str(path))
    with pytest.raises(SystemExit):
        config_from_args(["--config", str(path), "--n_iter", "42"])


def test_config_split_ratio_flags():
    """--val_ratio/--test_ratio are CLI-reachable (the reference parses
    --val_ratio but never consumes it; effective reference split is
    0.15/0.15 from Splitter's own defaults, splitter.py:31-32)."""
    from fsnerf_tpu.config import config_from_args
    cfg = config_from_args(["--val_ratio", "0.25", "--test_ratio", "0.1"])
    assert cfg.data.val_ratio == 0.25
    assert cfg.data.test_ratio == 0.1
    assert config_from_args([]).data.val_ratio == 0.15


def test_lpips_returns_none_without_weights():
    from fsnerf_tpu.eval.lpips import load_lpips
    assert load_lpips("/nonexistent/weights.npz") is None


def test_lpips_architecture_runs_with_random_weights(tmp_path):
    """The VGG+linear-head pipeline executes and is a valid metric shape-wise
    (zero distance for identical inputs)."""
    import jax.numpy as jnp
    from fsnerf_tpu.eval.lpips import _VGG_CFG, lpips_distance

    rng = np.random.default_rng(0)
    weights = {}
    cin = 3
    conv_i = 0
    for c in _VGG_CFG:
        if c == "M":
            continue
        weights[f"conv{conv_i}_kernel"] = jnp.asarray(
            rng.normal(scale=0.1, size=(3, 3, cin, c)).astype(np.float32))
        weights[f"conv{conv_i}_bias"] = jnp.zeros((c,), jnp.float32)
        cin = c
        conv_i += 1
    for j, c in enumerate([64, 128, 256, 512, 512]):
        weights[f"lin{j}"] = jnp.asarray(
            np.abs(rng.normal(size=(c,))).astype(np.float32))

    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    d_same = float(lpips_distance(img, img, weights))
    d_diff = float(lpips_distance(img, img2, weights))
    assert abs(d_same) < 1e-6
    assert d_diff > 0


def test_throughput_counter():
    import time
    from fsnerf_tpu.utils.profiling import Throughput
    tp = Throughput(batch_size=100, warmup_steps=2)
    for _ in range(2):
        tp.tick()
    time.sleep(0.05)
    for _ in range(5):
        tp.tick()
    s = tp.summary()
    assert s["steps_per_sec"] > 0
    assert abs(s["rays_per_sec"] - 100 * s["steps_per_sec"]) < 1e-6


def test_profiler_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp
    from fsnerf_tpu.utils.profiling import trace
    with trace(str(tmp_path / "prof")):
        jax.jit(lambda x: x * 2)(jnp.ones((8, 8))).block_until_ready()
    import os
    found = []
    for root, _, files in os.walk(tmp_path / "prof"):
        found += files
    assert found  # trace artifacts written
