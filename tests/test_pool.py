"""RayPool tests (the DataLoader replacement, data/pool.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from fsnerf_tpu.data.pool import RayPool, pool_from_images
from fsnerf_tpu.data.poses import pose_from_spherical


def _pool(n=100):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(n, 3)).astype(np.float32)
    return RayPool(a, a + 1, a + 2)


def test_sample_shapes_and_consistency():
    pool = _pool()
    o, d, rgb = pool.sample(jax.random.key(0), 32)
    assert o.shape == (32, 3)
    np.testing.assert_allclose(np.asarray(d - o), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb - o), 2.0, atol=1e-6)


def test_sample_deterministic_per_key():
    pool = _pool()
    a = pool.sample(jax.random.key(1), 16)
    b = pool.sample(jax.random.key(1), 16)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = pool.sample(jax.random.key(2), 16)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_epoch_permutation_without_replacement():
    pool = _pool(50)
    perm = np.asarray(pool.epoch_permutation(jax.random.key(0)))
    assert sorted(perm.tolist()) == list(range(50))
    o, _, _ = pool.gather(jnp.asarray(perm[:10]))
    assert o.shape == (10, 3)


def test_pool_from_images_ray_count():
    poses = np.stack([pose_from_spherical(4.0, 40.0, 60.0 * i)
                      for i in range(3)])
    imgs = np.random.default_rng(0).uniform(size=(3, 4, 5, 3)).astype(
        np.float32)
    pool = pool_from_images(imgs, poses, (4, 5, 6.0))
    assert pool.n == 3 * 4 * 5
    # rays are unit-norm directions
    _, d, _ = pool.sample(jax.random.key(0), 8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               atol=1e-5)
