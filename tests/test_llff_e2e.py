"""LLFF NDC end-to-end: splitter -> NDC ray pool -> multi-level grid ->
training step (BASELINE.json config 5 shape: 'LLFF forward-facing real scenes
with NDC rays')."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from fsnerf_tpu.config import (Config, DataConfig, EncoderConfig, ModelConfig,
                               SamplingConfig, TrainConfig)
from fsnerf_tpu.core.models import make_model
from fsnerf_tpu.data.pool import pool_from_images
from fsnerf_tpu.data.splitter import Splitter
from fsnerf_tpu.train.step import init_state, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def llff_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets")
    scene_dir = root / "llff" / "tinyfern"
    os.makedirs(scene_dir / "images_8")
    H, W, focal = 12, 16, 500.0
    rng = np.random.default_rng(7)
    rows = []
    for i in range(14):
        # smooth gradient images (more learnable than noise)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        img = np.stack([xx / W, yy / H, np.full_like(xx, 0.5 + 0.02 * i)], -1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            scene_dir / "images_8" / f"im_{i:03d}.png")
        c2w = np.zeros((3, 5), np.float32)
        c2w[:3, 0] = [0, -1, 0]
        c2w[:3, 1] = [1, 0, 0]
        c2w[:3, 2] = [0, 0, 1]
        c2w[:3, 3] = 0.05 * rng.normal(size=3)
        c2w[:, 4] = [H * 8, W * 8, focal * 8]
        rows.append(np.concatenate([c2w.flatten(), [2.0 + 0.05 * i, 9.0]]))
    np.save(scene_dir / "poses_bounds.npy", np.stack(rows))
    return str(root)


def test_llff_ndc_training_runs(llff_root):
    cfg = Config(
        encoder=EncoderConfig(n_freqs=4, n_freqs_views=2),
        model=ModelConfig(n_layers=2, d_filter=32, skip=(1,)),
        data=DataConfig(dataset="llff", scene="tinyfern",
                        data_root=llff_root, n_imgs=3),
        sampling=SamplingConfig(strategy="occgrid", n_samples=48,
                                n_compact=32, grid_resolution=16,
                                grid_levels=4, warmup_steps=4,
                                update_interval=4, render_step_size=0.05),
        train=TrainConfig(n_iters=30, batch_size=128, lro=5e-3,
                          scheduler="const"),
    )
    sp = Splitter("llff", "tinyfern", n_training_views=3,
                  data_root=llff_root, seed=0)
    sp.split()
    train_split, val_split, _ = sp.get_splits()
    assert train_split.ndc
    assert train_split.aabb.shape == (6,)

    model = make_model(cfg)
    pool = pool_from_images(train_split.imgs, train_split.poses,
                            train_split.hwf, ndc=True)
    opt = make_optimizer(cfg)
    state = init_state(model, cfg, opt, train_split.aabb, jax.random.key(0))
    assert state.grid.levels == 4
    step = jax.jit(make_train_step(model, cfg, opt, pool, train_split),
                   donate_argnums=0)
    losses = []
    for _ in range(30):
        state, m = step(state)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]          # NDC pipeline actually learns


def test_llff_ndc_rays_in_grid_bounds(llff_root):
    """NDC-projected rays must intersect the multi-level grid's outer AABB
    (the llff.py:75-84 AABB sizing contract)."""
    import jax.numpy as jnp
    from fsnerf_tpu.data.rays import ray_aabb_intersect
    from fsnerf_tpu.ops import occgrid as og

    sp = Splitter("llff", "tinyfern", n_training_views=3,
                  data_root=llff_root, seed=0)
    sp.split()
    train_split, _, _ = sp.get_splits()
    pool = pool_from_images(train_split.imgs, train_split.poses,
                            train_split.hwf, ndc=True)
    grid = og.create(train_split.aabb, 16, 4)
    o, d, _ = pool.sample(jax.random.key(0), 256)
    tmin, tmax = ray_aabb_intersect(o, d, og.outer_aabb(grid))
    frac_hit = float(jnp.mean((tmin < tmax).astype(jnp.float32)))
    assert frac_hit > 0.99


def test_ndc_aabb_numpy_matches_jnp(llff_root):
    """LLFFSplit._ndc_aabb is a pure-numpy mirror of the jnp
    get_rays_batch/to_ndc pipeline (it must not touch the device: eager
    jnp ops at ingest stalled for minutes through the axon tunnel —
    data/llff.py docstring). Pin the numpy math to the jnp functions."""
    import jax.numpy as jnp

    from fsnerf_tpu.data.rays import get_rays_batch, to_ndc

    sp = Splitter("llff", "tinyfern", n_training_views=3,
                  data_root=llff_root, seed=0)
    sp.split()
    train_split, _, _ = sp.get_splits()

    levels = 4
    o, d = get_rays_batch(jnp.asarray(train_split.poses), train_split.hwf)
    no, nd = to_ndc(o.reshape(-1, 3), d.reshape(-1, 3), train_split.hwf, 1.0)
    no, nd = np.asarray(no), np.asarray(nd)
    ends = no + nd
    lo = np.minimum(no.min(0), ends.min(0))
    hi = np.maximum(no.max(0), ends.max(0))
    want = np.concatenate([lo, hi]) / 2 ** (levels - 1)
    np.testing.assert_allclose(train_split.aabb, want, rtol=1e-5, atol=1e-6)
