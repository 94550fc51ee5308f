"""Occupancy-grid tests (nerfacc OccGridEstimator semantics,
reference run-nerf.py:92-98, 287-295)."""

import jax
import jax.numpy as jnp
import numpy as np

from fsnerf_tpu.ops import occgrid as og


AABB = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])


def _sphere_density(x, radius=1.0, value=100.0):
    """Dense inside a sphere at the origin."""
    return jnp.where(jnp.linalg.norm(x, axis=-1) < radius, value, 0.0)


def test_create_starts_fully_occupied():
    grid = og.create(AABB, resolution=16, levels=1)
    assert bool(jnp.all(grid.binaries))
    assert grid.occs.shape == (1, 16 ** 3)


def test_level_aabb_scaling():
    ab1 = np.asarray(og.level_aabb(AABB, 0))
    np.testing.assert_allclose(ab1, np.asarray(AABB))
    ab2 = np.asarray(og.level_aabb(AABB, 1))
    np.testing.assert_allclose(ab2, [-3, -3, -3, 3, 3, 3])


def test_update_binarizes_sphere():
    grid = og.create(AABB, resolution=32, levels=1)
    grid = og.update(grid, _sphere_density, None, jnp.asarray(0),
                     warmup_steps=256)
    # occupancy fraction should be ~ sphere volume / box volume
    frac = float(og.occupancy_fraction(grid))
    expect = (4 / 3 * np.pi * 1.0 ** 3) / 27.0
    assert abs(frac - expect) < 0.05

    # query: points inside the sphere occupied, corners not
    inside = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0]])
    outside = jnp.array([[1.4, 1.4, 1.4], [-1.4, 1.4, 0.0]])
    assert np.asarray(og.query(grid, inside)).all()
    assert not np.asarray(og.query(grid, outside)).any()


def test_query_outside_all_levels_is_false():
    grid = og.create(AABB, resolution=8, levels=1)
    far_out = jnp.array([[10.0, 0.0, 0.0]])
    assert not bool(og.query(grid, far_out)[0])


def test_multilevel_query_prefers_finest():
    grid = og.create(AABB, resolution=8, levels=2)
    # empty the fine level, keep the coarse level occupied
    binaries = grid.binaries.at[0].set(False)
    grid = grid.replace(binaries=binaries)
    # point inside level 0 -> classified by level 0 -> not occupied
    assert not bool(og.query(grid, jnp.array([[0.0, 0.0, 0.0]]))[0])
    # point outside level 0 but inside level 1 -> occupied
    assert bool(og.query(grid, jnp.array([[2.0, 0.0, 0.0]]))[0])


def test_ema_decay_clears_stale_region():
    """A region whose density vanishes decays below the scene mean and is
    pruned, while live geometry stays occupied (nerfacc binarizes at
    min(occ_thre, mean(occs)) — clearing is RELATIVE to the live scene; a
    grid whose density vanishes everywhere uniformly is a degenerate tie)."""
    center_a = jnp.array([-0.8, 0.0, 0.0])
    center_b = jnp.array([0.8, 0.0, 0.0])

    def density_at(c):
        return lambda x: jnp.where(
            jnp.linalg.norm(x - c, axis=-1) < 0.5, 100.0, 0.0)

    grid = og.create(AABB, resolution=16, levels=1)
    grid = og.update(grid, density_at(center_a), None, jnp.asarray(0))
    assert bool(og.query(grid, center_a[None])[0])
    assert not bool(og.query(grid, center_b[None])[0])

    # the object "moves": density now only at B
    for step in range(1, 150):
        grid = og.update(grid, density_at(center_b), None, jnp.asarray(step))
    assert not bool(og.query(grid, center_a[None])[0])   # stale A pruned
    assert bool(og.query(grid, center_b[None])[0])       # live B occupied


def test_partial_update_round_robin_covers_grid():
    """After warmup, each update refreshes 1/update_parts of cells; a full
    cycle of `update_parts` updates must refresh every cell."""
    grid = og.create(AABB, resolution=16, levels=1)
    # warmup full update with high density
    grid = og.update(grid, lambda x: jnp.full(x.shape[:-1], 100.0), None,
                     jnp.asarray(0), warmup_steps=1)
    occs0 = np.asarray(grid.occs).copy()
    # post-warmup: empty density, 4 partial updates at steps 16,32,48,64
    empty = lambda x: jnp.zeros(x.shape[:-1])
    for i in range(4):
        step = jnp.asarray(16 * (i + 1))
        grid = og.update(grid, empty, None, step, warmup_steps=1,
                         update_parts=4, update_interval=16)
    occs = np.asarray(grid.occs)
    # every cell decayed at least once: max occ dropped by >= ema factor
    assert (occs <= occs0 * 0.95 + 1e-9).all()


def test_update_is_jittable():
    grid = og.create(AABB, resolution=8, levels=2)

    @jax.jit
    def step_fn(grid, step, key):
        return og.update(grid, _sphere_density, key, step, warmup_steps=2)

    g1 = step_fn(grid, jnp.asarray(0), jax.random.key(0))
    g2 = step_fn(g1, jnp.asarray(16), jax.random.key(1))  # partial branch
    assert g2.occs.shape == grid.occs.shape


def test_occ_eval_uses_render_step_size():
    """occ = sigma * render_step_size (run-nerf.py:288-289): with sigma=1 and
    step 5e-3, occ=5e-3 < occ_thre 1e-2 -> grid empties."""
    grid = og.create(AABB, resolution=8, levels=1)
    grid = og.update(grid, lambda x: jnp.ones(x.shape[:-1]), None,
                     jnp.asarray(0), render_step_size=5e-3, occ_thre=1e-2)
    # threshold is min(1e-2, mean(occs)) = min(1e-2, 5e-3) -> occ > thre false
    assert float(og.occupancy_fraction(grid)) == 0.0
    # with sigma=10, occ=5e-2 > 1e-2 -> occupied
    grid2 = og.create(AABB, resolution=8, levels=1)
    grid2 = og.update(grid2, lambda x: 10 * jnp.ones(x.shape[:-1]), None,
                      jnp.asarray(0), render_step_size=5e-3, occ_thre=1e-2)
    assert float(og.occupancy_fraction(grid2)) == 1.0


def test_auto_query_stride():
    from fsnerf_tpu.ops.occgrid import auto_query_stride
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    # sphere/lego regime: cell 3/128 = 0.0234, worst dt = diag/512 = 0.0101
    assert auto_query_stride(aabb, 128, 5e-3, 512) == 2
    # coarse grid -> bigger cells -> full stride
    assert auto_query_stride(aabb, 32, 5e-3, 512) == 4
    # stride must divide n_samples
    assert auto_query_stride(aabb, 32, 5e-3, 510) == 2
    # tiny cells -> no decimation
    assert auto_query_stride(aabb, 1024, 5e-3, 512) == 1


def test_query_stride_render_equivalence():
    """Strided occupancy queries must agree with per-sample queries wherever
    the lossless-stride condition holds (cells >= stride * dt)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fsnerf_tpu.ops import occgrid as og
    from fsnerf_tpu.render.renderer import render_rays_occgrid

    grid = og.create(jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]),
                     resolution=16, levels=1)
    # carve a plausible grid: occupied shell around radius 1
    res = 16
    ijk = np.stack(np.meshgrid(*[np.arange(res)] * 3, indexing="ij"),
                   -1).reshape(-1, 3)
    centers = -1.5 + (ijk + 0.5) / res * 3.0
    r = np.linalg.norm(centers, axis=-1)
    occs = np.where(np.abs(r - 1.0) < 0.3, 0.05, 0.0).astype(np.float32)
    grid = grid.replace(occs=jnp.asarray(occs[None]),
                        binaries=jnp.asarray(occs[None] > 1e-2),
                        thre=jnp.asarray(1e-2))

    rng = np.random.default_rng(0)
    o = rng.normal(size=(64, 3)); o = o / np.linalg.norm(o, -1, keepdims=True) * 4
    d = -o / np.linalg.norm(o, -1, keepdims=True)
    o = jnp.asarray(o, jnp.float32); d = jnp.asarray(d, jnp.float32)

    def mf(x, dirs=None):
        sig = jnp.exp(-jnp.sum(x * x, -1, keepdims=True))
        return jnp.concatenate([0.5 * jnp.ones((*x.shape[:-1], 3)), sig], -1)

    # cell = 3/16 = 0.1875; dt <= max(0.05, diag/64 = 0.081) -> stride 2 safe
    outs = [render_rays_occgrid(mf, o, d, grid, 64, render_step_size=0.05,
                                white_bkgd=True, query_stride=s)
            for s in (1, 2)]
    np.testing.assert_allclose(np.asarray(outs[0]["rgb"]),
                               np.asarray(outs[1]["rgb"]), atol=0.02)
    agree = np.mean(np.asarray(outs[0]["mask"] == outs[1]["mask"]))
    assert agree > 0.97, agree
