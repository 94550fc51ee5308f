"""Loss / regularizer / schedule tests (reference loss.py, scheduler.py,
run-nerf.py:256-279)."""

import jax
import jax.numpy as jnp
import numpy as np

from fsnerf_tpu.core.losses import mse, occlusion_reg, psnr_from_mse, weight_reg
from fsnerf_tpu.core.models import NeRF, init_params
from fsnerf_tpu.core.schedules import constant_lr, exponential_decay_lr


def test_mse_psnr():
    a = jnp.ones((4, 3)) * 0.5
    b = jnp.zeros((4, 3))
    m = mse(a, b)
    np.testing.assert_allclose(float(m), 0.25, atol=1e-7)
    np.testing.assert_allclose(float(psnr_from_mse(m)),
                               -10 * np.log10(0.25), atol=1e-5)


def _numpy_occl(sigmas, t_vals, mask, a, b, func):
    """Oracle: reference loss.py:39-42 semantics — mean over rays-with-samples
    of sum_s w(t) * sigma over that ray's samples."""
    vals = []
    for r in range(sigmas.shape[0]):
        sel = mask[r]
        if not sel.any():
            continue
        t = t_vals[r][sel]
        s = sigmas[r][sel]
        w = -a * t + b if func == "linear" else a * np.exp(-b * t)
        vals.append(np.sum(w * s))
    return np.mean(vals)


def test_occlusion_reg_matches_packed_semantics():
    rng = np.random.default_rng(0)
    R, S = 16, 32
    sig = rng.uniform(0, 5, (R, S)).astype(np.float32)
    t = np.sort(rng.uniform(0, 6, (R, S)), axis=-1).astype(np.float32)
    mask = rng.uniform(size=(R, S)) > 0.3
    mask[3] = False  # one empty ray — excluded from the mean
    for func, (a, b) in [("linear", (0.5, 2.0)), ("exp", (1.5, 0.8))]:
        got = float(occlusion_reg(jnp.asarray(sig), jnp.asarray(t),
                                  jnp.asarray(mask), a, b, func))
        want = _numpy_occl(sig, t, mask, a, b, func)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_occlusion_reg_no_mask():
    sig = jnp.ones((2, 4))
    t = jnp.broadcast_to(jnp.array([1.0, 2.0, 3.0, 4.0]), (2, 4))
    got = float(occlusion_reg(sig, t, None, 1.0, 10.0, "linear"))
    # per ray: sum(-t + 10) = 40 - 10 = 30
    np.testing.assert_allclose(got, 30.0, rtol=1e-6)


def test_weight_reg_excludes_small_heads():
    """Only kernels with out-dim > 3 count (run-nerf.py:273): rgb (3) and
    sigma (1) heads are excluded; biases never count."""
    model = NeRF()
    params = init_params(model, jax.random.key(0))
    got = float(weight_reg(params, "l1"))
    p = params["params"]
    want = 0.0
    for name, sub in p.items():
        k = np.asarray(sub["kernel"])
        if k.shape[-1] > 3:
            want += np.abs(k).sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert "rgb" in p and p["rgb"]["kernel"].shape[-1] == 3  # excluded head


def test_weight_reg_l2_is_per_matrix_frobenius():
    model = NeRF()
    params = init_params(model, jax.random.key(1))
    got = float(weight_reg(params, "l2"))
    want = 0.0
    for name, sub in params["params"].items():
        k = np.asarray(sub["kernel"])
        if k.shape[-1] > 3:
            want += np.sqrt((k ** 2).sum())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_constant_schedule():
    s = constant_lr(5e-4)
    np.testing.assert_allclose(float(s(0)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(100000)), 5e-4, rtol=1e-6)


def test_exponential_decay_schedule():
    """lr(t) = lro * r**(t/T) for t < T, clamped to lro*r after
    (scheduler.py:74-80 with T = n_iters per run-nerf.py:223)."""
    lro, T, r = 5e-4, 8000, 0.1
    s = exponential_decay_lr(lro, T, r)
    np.testing.assert_allclose(float(s(0)), lro, rtol=1e-6)
    np.testing.assert_allclose(float(s(4000)), lro * r ** 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(s(8000)), lro * r, rtol=1e-6)
    np.testing.assert_allclose(float(s(100000)), lro * r, rtol=1e-6)
