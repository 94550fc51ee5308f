"""Sampling tests: dense lattices, stratified bins, inverse-CDF resampling."""

import jax
import jax.numpy as jnp
import numpy as np

from fsnerf_tpu.ops.sampling import (
    hierarchical_samples,
    sample_pdf,
    sample_points,
    stratified_samples,
    uniform_samples,
)


def _rays(n=8, radius=4.0):
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * radius
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)  # aim at origin
    return jnp.asarray(o, dtype=jnp.float32), jnp.asarray(d, dtype=jnp.float32)


AABB = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])


def test_uniform_samples_inside_aabb():
    o, d = _rays()
    t, dt, valid = uniform_samples(o, d, AABB, 64)
    x = np.asarray(sample_points(o, d, t))
    v = np.asarray(valid)
    assert v.any()
    assert (np.abs(x[v]) <= 1.5 + 1e-4).all()


def test_uniform_samples_deterministic_midpoints():
    o, d = _rays(4)
    t1, _, _ = uniform_samples(o, d, AABB, 32)
    t2, _, _ = uniform_samples(o, d, AABB, 32)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))


def test_uniform_samples_stratified_jitter():
    o, d = _rays(4)
    t1, _, _ = uniform_samples(o, d, AABB, 32, key=jax.random.key(0))
    t2, _, _ = uniform_samples(o, d, AABB, 32, key=jax.random.key(1))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    # jitter keeps samples inside their own interval: sorted & within bounds
    assert (np.diff(np.asarray(t1), axis=-1) > 0).all()


def test_uniform_samples_missed_ray_masked():
    o = jnp.array([[10.0, 10.0, 10.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])  # misses the box
    _, _, valid = uniform_samples(o, d, AABB, 16)
    assert not np.asarray(valid).any()


def test_uniform_samples_fixed_step_when_segment_short():
    """A segment shorter than S*step marches at the fixed step size
    (reference render_step_size 5e-3 semantics)."""
    o = jnp.array([[0.0, 0.0, 4.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    S, step = 2048, 5e-3
    t, dt, valid = uniform_samples(o, d, AABB, S, step_size=step)
    # segment is 3.0 < 2048 * 5e-3 = 10.24 -> fixed step spacing
    np.testing.assert_allclose(np.asarray(dt), step, rtol=1e-6)
    v = np.asarray(valid[0])
    # ~3.0 / 5e-3 = 600 valid samples
    assert 590 <= v.sum() <= 610
    # invalid samples are beyond the exit plane
    assert not v[-1]


def test_stratified_samples_bins():
    o, d = _rays(4)
    t, dt = stratified_samples(o, d, 2.0, 6.0, 64, key=jax.random.key(0))
    tn = np.asarray(t)
    assert (tn >= 2.0).all() and (tn <= 6.0).all()
    assert (np.diff(tn, axis=-1) >= 0).all()        # per-bin jitter stays sorted
    # deltas close the interval to far
    np.testing.assert_allclose(np.asarray(jnp.sum(dt, -1) + t[:, 0]), 6.0,
                               atol=1e-5)


def test_stratified_deterministic_midpoints():
    o, d = _rays(2)
    t, _ = stratified_samples(o, d, 2.0, 6.0, 8)
    edges = np.linspace(2.0, 6.0, 9)
    mids = 0.5 * (edges[:-1] + edges[1:])
    np.testing.assert_allclose(np.asarray(t[0]), mids, atol=1e-6)


def test_sample_pdf_concentrates_on_peak():
    """Inverse-CDF draws should land inside high-weight bins."""
    R, B = 4, 32
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, B + 1), (R, B + 1))
    w = jnp.zeros((R, B)).at[:, 10].set(100.0)
    s = np.asarray(sample_pdf(jax.random.key(0), bins, w, 64))
    lo, hi = 10 / B, 11 / B
    frac_in_peak = ((s >= lo - 1e-3) & (s <= hi + 1e-3)).mean()
    assert frac_in_peak > 0.95


def test_sample_pdf_uniform_weights_cover_domain():
    R, B = 2, 16
    bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, B + 1), (R, B + 1))
    w = jnp.ones((R, B))
    s = np.asarray(sample_pdf(None, bins, w, 128))
    assert (s >= 2.0).all() and (s <= 6.0).all()
    # deterministic quantiles should be near-uniformly spread
    hist, _ = np.histogram(s[0], bins=8, range=(2.0, 6.0))
    assert hist.min() >= 8


def test_sample_pdf_matches_numpy_inverse_cdf():
    rng = np.random.default_rng(3)
    R, B, N = 3, 12, 33
    bins = np.sort(rng.uniform(0, 10, size=(R, B + 1)), axis=-1).astype(np.float32)
    w = rng.uniform(0.1, 2.0, size=(R, B)).astype(np.float32)
    s = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(w), N))
    # numpy oracle
    ww = w + 1e-5
    pdf = ww / ww.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((R, 1)), np.cumsum(pdf, -1)], axis=-1)
    u = np.broadcast_to(np.linspace(0, 1 - 1e-5, N), (R, N))
    want = np.zeros((R, N))
    for r in range(R):
        for i in range(N):
            j = np.searchsorted(cdf[r], u[r, i], side="right")
            lo, hi = j - 1, min(j, B)
            denom = cdf[r, hi] - cdf[r, lo]
            frac = 0.0 if denom < 1e-5 else (u[r, i] - cdf[r, lo]) / denom
            want[r, i] = bins[r, lo] + frac * (bins[r, hi] - bins[r, lo])
    np.testing.assert_allclose(s, want, atol=1e-4)


def test_hierarchical_samples_sorted_and_bounded():
    o, d = _rays(4)
    t_c, _ = stratified_samples(o, d, 2.0, 6.0, 32, key=jax.random.key(0))
    w = jnp.ones((4, 32))
    t_all, dt = hierarchical_samples(jax.random.key(1), t_c, w, 64, 6.0)
    tn = np.asarray(t_all)
    assert tn.shape == (4, 96)
    assert (np.diff(tn, axis=-1) >= 0).all()
    assert (tn >= 2.0 - 1e-4).all() and (tn <= 6.0 + 1e-4).all()


def test_sample_points_formula():
    o = jnp.array([[1.0, 2.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t = jnp.array([[0.5, 1.5]])
    x = np.asarray(sample_points(o, d, t))
    np.testing.assert_allclose(x[0, 0], [1.0, 2.0, 2.5])
    np.testing.assert_allclose(x[0, 1], [1.0, 2.0, 1.5])


def test_compact_samples_preserves_valid_prefix():
    from fsnerf_tpu.ops.sampling import compact_samples
    t = jnp.arange(8, dtype=jnp.float32)[None].repeat(2, 0)
    dt = jnp.full((2, 8), 0.5)
    mask = jnp.array([[0, 1, 0, 1, 1, 0, 0, 1],
                      [1, 1, 1, 1, 1, 1, 1, 1]], dtype=bool)
    tk, dtk, mk = compact_samples(t, dt, mask, 4)
    # ray 0: exactly 4 valid samples at t = 1, 3, 4, 7 — kept exactly
    np.testing.assert_allclose(np.asarray(tk[0]), [1, 3, 4, 7])
    assert np.asarray(mk[0]).all()
    np.testing.assert_allclose(np.asarray(dtk[0]), 0.5)   # no rescale
    # ray 1: 8 valid > k=4 -> evenly spread picks, deltas scaled by 8/4
    np.testing.assert_allclose(np.asarray(tk[1]), [0, 2, 4, 6])
    np.testing.assert_allclose(np.asarray(dtk[1]), 1.0)
    # total optical-depth budget conserved: sum(deltas) unchanged
    np.testing.assert_allclose(float(dtk[1].sum()), float(dt[1].sum()))


def test_compacted_render_matches_dense():
    """With K >= per-ray valid count, compaction must not change the image."""
    import jax
    from fsnerf_tpu.ops import occgrid as og
    from fsnerf_tpu.render.renderer import render_rays_occgrid

    o, d = _rays(8)
    grid = og.create(AABB, resolution=16, levels=1)
    # sphere-occupancy grid so plenty of samples are masked
    dens = lambda x: jnp.where(jnp.linalg.norm(x, axis=-1) < 1.0, 100.0, 0.0)
    grid = og.update(grid, dens, None, jnp.asarray(0))

    def model_fn(x, dirs=None):
        sig = jnp.linalg.norm(x, axis=-1, keepdims=True)
        rgb = 0.5 * (jnp.tanh(x) + 1.0)
        return jnp.concatenate([rgb, sig], axis=-1)

    dense = render_rays_occgrid(model_fn, o, d, grid, 64, n_compact=0,
                                render_step_size=0.1, white_bkgd=True)
    compact = render_rays_occgrid(model_fn, o, d, grid, 64, n_compact=48,
                                  render_step_size=0.1, white_bkgd=True)
    # K=48 >= any ray's valid count through a radius-1 sphere at dt=...
    assert int(jnp.max(jnp.sum(dense["mask"], -1))) <= 48
    np.testing.assert_allclose(np.asarray(compact["rgb"]),
                               np.asarray(dense["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(compact["depth"]),
                               np.asarray(dense["depth"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(compact["opacity"]),
                               np.asarray(dense["opacity"]), atol=1e-5)


def test_compact_samples_uniform_matches_generic():
    """The 2-operand specialized compaction must equal the generic 4-operand
    payload sort when deltas are per-ray constant (the occgrid lattice)."""
    from fsnerf_tpu.ops.sampling import compact_samples, compact_samples_uniform

    rng = np.random.default_rng(5)
    R, S, K = 64, 96, 24
    t = jnp.asarray(np.sort(rng.uniform(0, 6, (R, S)), -1), jnp.float32)
    dt = jnp.asarray(rng.uniform(1e-3, 0.1, (R,)), jnp.float32)
    deltas = jnp.broadcast_to(dt[:, None], (R, S))
    mask = rng.uniform(size=(R, S)) > 0.6
    mask[0] = False                      # all-masked ray
    mask[1] = True                       # nv >> K: spread path
    mask[2, :K // 2] = True              # nv < K prefix
    mask = jnp.asarray(mask)

    t_a, d_a, m_a = compact_samples(t, deltas, mask, K)
    t_b, d_b, m_b = compact_samples_uniform(t, dt, mask, K)
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    # garbage beyond n_kept is masked; compare only where valid
    mm = np.asarray(m_a)
    np.testing.assert_allclose(np.asarray(t_a)[mm], np.asarray(t_b)[mm])
    np.testing.assert_allclose(np.asarray(d_a)[mm], np.asarray(d_b)[mm],
                               rtol=1e-6)
