"""Golden-value tests for ray geometry (reference utilities.py:36-120)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fsnerf_tpu.data.rays import get_rays, get_rays_batch, ray_aabb_intersect, to_ndc


def _numpy_get_rays(pose, hwf):
    """Independent numpy derivation of the reference pinhole ray model."""
    H, W, f = hwf
    o = np.zeros((H, W, 3), np.float32)
    d = np.zeros((H, W, 3), np.float32)
    R = pose[:3, :3]
    t = pose[:3, -1]
    for r in range(H):
        for c in range(W):
            v = np.array([(c - W * 0.5) / f, -(r - H * 0.5) / f, -1.0])
            v = v / np.linalg.norm(v)
            d[r, c] = R @ v
            o[r, c] = t
    return o, d


def _random_pose(seed=0):
    rng = np.random.default_rng(seed)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = q.astype(np.float32)
    pose[:3, 3] = rng.normal(size=3).astype(np.float32)
    return pose


def test_get_rays_matches_reference_math():
    pose = _random_pose(1)
    hwf = (5, 7, 11.0)
    o_ref, d_ref = _numpy_get_rays(pose, hwf)
    o, d = get_rays(jnp.asarray(pose), hwf)
    np.testing.assert_allclose(np.asarray(o), o_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-5)


def test_get_rays_directions_unit_norm():
    pose = _random_pose(2)
    _, d = get_rays(jnp.asarray(pose), (8, 8, 4.0))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)


def test_get_rays_center_pixel_points_down_optical_axis():
    # identity pose: center ray should be ~(0, 0, -1)
    pose = jnp.eye(4)
    H = W = 9
    _, d = get_rays(pose, (H, W, 100.0))
    center = np.asarray(d[H // 2, W // 2])
    # pixel (4,4) maps to ((4-4.5)/f, -(4-4.5)/f, -1) normalized — near axis
    assert center[2] < -0.999


def test_get_rays_batch_matches_single():
    poses = np.stack([_random_pose(i) for i in range(3)])
    hwf = (4, 6, 8.0)
    ob, db = get_rays_batch(jnp.asarray(poses), hwf)
    for i in range(3):
        o, d = get_rays(jnp.asarray(poses[i]), hwf)
        np.testing.assert_allclose(np.asarray(ob[i]), np.asarray(o), atol=1e-6)
        np.testing.assert_allclose(np.asarray(db[i]), np.asarray(d), atol=1e-6)


def test_to_ndc_golden():
    """NDC projection: rays through the image center land at ndc origin x/y."""
    H, W, f = 10, 10, 12.0
    # a ray straight down -z from (0, 0, 1)
    o = jnp.array([[0.0, 0.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    no, nd = to_ndc(o, d, (H, W, f), near=1.0)
    np.testing.assert_allclose(np.asarray(no[0]), [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nd[0]), [0.0, 0.0, 2.0], atol=1e-6)


def test_to_ndc_formulas():
    """Check each NDC component against the published formulas."""
    rng = np.random.default_rng(3)
    H, W, f = 6, 8, 10.0
    near = 1.0
    o = rng.normal(size=(16, 3)).astype(np.float32) + np.array([0, 0, 5.0],
                                                              np.float32)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5  # rays must head toward -z
    no, nd = to_ndc(jnp.asarray(o), jnp.asarray(d), (H, W, f), near)
    # shift to near plane
    t = -(near + o[:, 2]) / d[:, 2]
    os = o + t[:, None] * d
    np.testing.assert_allclose(
        np.asarray(no[:, 0]), -f / (W / 2) * os[:, 0] / os[:, 2], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(no[:, 2]), 1 + 2 * near / os[:, 2], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(nd[:, 2]), -2 * near / os[:, 2], atol=1e-4)


def test_ndc_ray_endpoints_bounded():
    """For forward-facing rays, o+d (t=1, infinity) must land at ndc z = 1."""
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 0.0
    hwf = (12, 12, 14.0)
    o, d = get_rays(jnp.asarray(pose), hwf)
    no, nd = to_ndc(o.reshape(-1, 3), d.reshape(-1, 3), hwf, 1.0)
    z_inf = np.asarray(no[:, 2] + nd[:, 2])
    np.testing.assert_allclose(z_inf, 1.0, atol=1e-5)


def test_ray_aabb_intersect():
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    o = jnp.array([[0.0, 0.0, 3.0], [0.0, 3.0, 0.0], [5.0, 5.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]])
    tmin, tmax = ray_aabb_intersect(o, d, aabb)
    np.testing.assert_allclose(np.asarray(tmin[:2]), [2.0, 2.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tmax[:2]), [4.0, 4.0], atol=1e-5)
    assert float(tmin[2]) > float(tmax[2])  # miss


def test_ray_aabb_near_far_clamp():
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    o = jnp.array([[0.0, 0.0, 0.0]])  # inside the box
    d = jnp.array([[0.0, 0.0, -1.0]])
    tmin, tmax = ray_aabb_intersect(o, d, aabb, near=0.0, far=1e10)
    assert float(tmin[0]) == 0.0
    np.testing.assert_allclose(float(tmax[0]), 1.0, atol=1e-5)
