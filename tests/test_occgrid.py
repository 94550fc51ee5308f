"""Occupancy-grid tests (nerfacc OccGridEstimator semantics,
reference run-nerf.py:92-98, 287-295)."""

import jax
import pytest
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
    occs = grid.occs.at[0].set(0.0).at[1].set(1.0)
    grid = og.with_occs(grid, occs, thre=0.5)
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
    grid = og.with_occs(grid, occs[None], thre=1e-2)

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


def test_dilate_xy_matches_manual_maxfilter():
    """occs_q == (2r+1)^2 XY max filter of occs, per level, -inf edges."""
    rng = np.random.default_rng(3)
    res, L = 8, 2
    occs = rng.uniform(size=(L, res ** 3)).astype(np.float32)
    got = np.asarray(og._dilate_xy(jnp.asarray(occs), res, 1))
    vol = occs.reshape(L, res, res, res)
    want = np.full_like(vol, -np.inf)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            sx = slice(max(0, dx), res + min(0, dx))
            sy = slice(max(0, dy), res + min(0, dy))
            tx = slice(max(0, -dx), res + min(0, -dx))
            ty = slice(max(0, -dy), res + min(0, -dy))
            want[:, tx, ty, :] = np.maximum(want[:, tx, ty, :],
                                            vol[:, sx, sy, :])
    np.testing.assert_allclose(got, want.reshape(L, res ** 3), rtol=1e-6)


@pytest.mark.parametrize("radius", [1, 2])
def test_dilated_query_is_conservative(radius):
    """With query_dilation=r, querying from ANY position displaced <= r
    cells per axis from a sample must still see the sample's own occupancy
    — the guarantee that makes stride 2*r*s0 lossless (auto_query_stride).
    radius 2 is the default plan at the bench geometry (stride 8)."""
    rng = np.random.default_rng(7)
    res = 16
    grid = og.create(AABB, resolution=res, levels=1, query_dilation=radius)
    occs = (rng.uniform(size=(1, res ** 3)) < 0.1).astype(np.float32) * 0.05
    grid = og.with_occs(grid, occs, thre=1e-2)
    grid0 = og.create(AABB, resolution=res, levels=1, query_dilation=0)
    grid0 = og.with_occs(grid0, occs, thre=1e-2)

    cell = 3.0 / res
    # points strictly inside the AABB with >= radius-cell margin so
    # displaced queries stay in-bounds
    m = (radius + 0.5) * cell
    x = jnp.asarray(rng.uniform(-1.5 + m, 1.5 - m, size=(512, 3)),
                    jnp.float32)
    occ_exact = np.asarray(og.query(grid0, x))
    for _ in range(4):
        delta = rng.uniform(-radius * cell, radius * cell,
                            size=(512, 3)).astype(np.float32)
        occ_dil = np.asarray(og.query(grid, x + jnp.asarray(delta)))
        # every exactly-occupied sample is seen by the displaced dilated query
        assert (occ_dil | ~occ_exact).all()


def test_resolve_query_plan_auto_picks_dilated_stride():
    from fsnerf_tpu.config import SamplingConfig
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    s = SamplingConfig()          # defaults: res 128, 512 samples, auto
    assert og.resolve_query_plan(s, aabb) == (8, 2)
    # dilation pinned to 1 -> radius-1 admissible stride
    s1 = SamplingConfig(query_dilation=1)
    assert og.resolve_query_plan(s1, aabb) == (4, 1)
    # dilation pinned to 0 -> the plain lossless stride
    s0 = SamplingConfig(query_dilation=0)
    assert og.resolve_query_plan(s0, aabb) == (2, 0)
    # explicit stride passes through
    se = SamplingConfig(query_stride=2)
    assert og.resolve_query_plan(se, aabb) == (2, 0)
    # hierarchical never strides
    sh = SamplingConfig(strategy="hierarchical")
    assert og.resolve_query_plan(sh, aabb) == (1, 0)
    # resolve_query_stride stays the stride half
    assert og.resolve_query_stride(s, aabb) == 8


def test_stride4_dilated_mask_supersets_stride1():
    """Occupied samples found at stride 1 (undilated) are never lost at
    stride 4 against the radius-1 dilated tables; rendered rgb matches."""
    from fsnerf_tpu.render.renderer import render_rays_occgrid

    res = 16
    rng = np.random.default_rng(0)
    ijk = np.stack(np.meshgrid(*[np.arange(res)] * 3, indexing="ij"),
                   -1).reshape(-1, 3)
    centers = -1.5 + (ijk + 0.5) / res * 3.0
    r = np.linalg.norm(centers, axis=-1)
    occs = np.where(np.abs(r - 1.0) < 0.3, 0.05, 0.0).astype(np.float32)

    g1 = og.with_occs(og.create(AABB, resolution=res, levels=1),
                      occs[None], thre=1e-2)
    g4 = og.with_occs(og.create(AABB, resolution=res, levels=1,
                                query_dilation=1), occs[None], thre=1e-2)

    o = rng.normal(size=(64, 3))
    o = o / np.linalg.norm(o, -1, keepdims=True) * 4
    d = -o / np.linalg.norm(o, -1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    def mf(x, dirs=None):
        sig = jnp.exp(-jnp.sum(x * x, -1, keepdims=True))
        return jnp.concatenate([0.5 * jnp.ones((*x.shape[:-1], 3)), sig], -1)

    # cell = 3/16 = 0.1875; dt <= max(0.05, diag/64 = 0.081);
    # radius-1 condition (s/2)*dt <= cell -> stride 4 admissible
    out1 = render_rays_occgrid(mf, o, d, g1, 64, render_step_size=0.05,
                               white_bkgd=True, query_stride=1,
                               early_stop_eps=0.0)
    out4 = render_rays_occgrid(mf, o, d, g4, 64, render_step_size=0.05,
                               white_bkgd=True, query_stride=4,
                               early_stop_eps=0.0)
    m1 = np.asarray(out1["mask"])
    m4 = np.asarray(out4["mask"])
    assert (m4 | ~m1).all(), "dilated stride-4 mask lost stride-1 samples"
    np.testing.assert_allclose(np.asarray(out1["rgb"]),
                               np.asarray(out4["rgb"]), atol=0.03)


def _chebyshev_erode(occs: np.ndarray, res: int, r: int) -> np.ndarray:
    """Reference 3D Chebyshev-min erosion with EMPTY (0) outside the
    volume, matching _erode_xy + the query-time z-window min."""
    L = occs.shape[0]
    vol = occs.reshape(L, res, res, res)
    pad = np.pad(vol, ((0, 0), (r, r), (r, r), (r, r)))
    out = np.full_like(vol, np.inf)
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            for dz in range(-r, r + 1):
                out = np.minimum(
                    out, pad[:, r + dx:r + dx + res, r + dy:r + dy + res,
                             r + dz:r + dz + res])
    return out.reshape(L, res ** 3)


def test_od_estimate_is_eroded_underestimate():
    """The early-termination value (query_with_density's second output)
    must UNDERESTIMATE optical depth: it is the Chebyshev erosion of occ
    over radius query_dilation+1 (empty outside the volume). Any
    overestimate truncates rays before their true termination: the dilated
    max collapsed training behind its own shell (r3, held-out 13.1 vs
    29.2); even the own-cell occ loses ~15 dB on thin geometry where
    grazing rays clip surface cells (r5, benchmarks/ab_lattice_occgrid.py:
    base 8.0 dB vs early-stop-off 23.0 dB). bf16 pack quantization rounds
    the od channel DOWN (conservative)."""
    rng = np.random.default_rng(11)
    res = 16
    occs = rng.uniform(size=(1, res ** 3)).astype(np.float32)
    g0 = og.with_occs(og.create(AABB, resolution=res, levels=1),
                      occs, thre=0.5)
    g1 = og.with_occs(og.create(AABB, resolution=res, levels=1,
                                query_dilation=1), occs, thre=0.5)
    cell = 3.0 / res
    x_np = rng.uniform(-1.5 + cell, 1.5 - cell, size=(256, 3)).astype(
        np.float32)
    x = jnp.asarray(x_np)
    ijk = np.clip(((x_np + 1.5) / 3.0 * res).astype(np.int64), 0, res - 1)
    flat = (ijk[:, 0] * res + ijk[:, 1]) * res + ijk[:, 2]
    _, v0 = og.query_with_density(g0, x)
    _, v1 = og.query_with_density(g1, x)
    want0 = _chebyshev_erode(occs, res, 1)[0, flat]
    want1 = _chebyshev_erode(occs, res, 2)[0, flat]
    np.testing.assert_allclose(np.asarray(v0), want0, rtol=2 ** -7)
    np.testing.assert_allclose(np.asarray(v1), want1, rtol=2 ** -7)
    # strict underestimates of the sample's own cell occ (conservative)
    assert (np.asarray(v0) <= occs[0, flat] + 1e-6).all()
    assert (np.asarray(v1) <= np.asarray(v0) + 1e-6).all()
    # a grid without a query table yields NO od estimate (early stop inert)
    _, v_none = og.query_with_density(g0.replace(occs_q=None), x)
    assert (np.asarray(v_none) == 0.0).all()
    # while the OCCUPANCY test uses the dilated max: anywhere the undilated
    # query is occupied, the dilated one must be too
    occ0 = np.asarray(og.query(g0, x))
    occ1 = np.asarray(og.query(g1, x))
    assert (occ1 | ~occ0).all()


def test_culling_hold_keeps_cells_occupied_with_warm_ema():
    """update(hold_steps=H): before H the binarization threshold stays -1
    (every cell occupied — the freq-anneal culling hold, BASELINE.md r5)
    while the EMA accumulates normally; after H culling resumes from the
    warm EMA."""
    res = 8
    grid = og.create(AABB, resolution=res, levels=1)

    def density_fn(x):                      # dense only near the origin
        return jnp.where(jnp.linalg.norm(x, axis=-1) < 0.5, 200.0, 0.0)

    kw = dict(render_step_size=5e-3, occ_thre=1e-2, warmup_steps=10**6,
              hold_steps=100)
    g1 = og.update(grid, density_fn, jax.random.key(0), jnp.int32(0), **kw)
    assert float(g1.thre) == -1.0
    assert bool(og.query(g1, jnp.zeros((1, 3)))[0])
    assert bool(og.query(g1, jnp.full((1, 3), 1.3))[0])   # far corner: held
    assert float(jnp.max(g1.occs)) > 0.5                  # EMA warm
    g2 = og.update(g1, density_fn, jax.random.key(1), jnp.int32(100), **kw)
    assert float(g2.thre) > 0.0
    assert bool(og.query(g2, jnp.zeros((1, 3)))[0])
    assert not bool(og.query(g2, jnp.full((1, 3), 1.3))[0])  # culled now


def test_early_stop_spares_grazing_rays_truncates_interiors():
    """The r5 thin-geometry fix end-to-end at the mask level
    (renderer._masked_lattice): a ray running INSIDE a one-cell-thick
    occupied plane (the grazing/shell regime — every cell it crosses holds
    surface EMA, but nothing is strictly interior) must lose NO samples to
    early termination, while a ray crossing a solid block keeps losing its
    deep-interior tail (the pruning the bench scene's volumetric occupancy
    relies on)."""
    from fsnerf_tpu.render.renderer import _masked_lattice

    res = 32
    cell = 3.0 / res
    occs = np.zeros((1, res, res, res), np.float32)
    kz = res // 2                       # one-cell-thick z-plane at z ~ 0
    occs[0, :, :, kz] = 5.0             # huge phantom od under the old code
    occs[0, 4:20, 4:20, 4:20] = 5.0     # solid block, interior >= 1 cell
    grid = og.with_occs(
        og.create(AABB, resolution=res, levels=1, query_dilation=0),
        occs.reshape(1, -1), thre=1e-2)

    z_mid = -1.5 + (kz + 0.5) * cell    # plane layer's z center
    y_off = -1.5 + 25.5 * cell          # y-cell 25: clear of the block
    rays_o = jnp.asarray([[-4.0, y_off, z_mid],        # inside plane layer
                          [(12.5 / res) * 3.0 - 1.5, -4.0,
                           (12.5 / res) * 3.0 - 1.5]], jnp.float32)
    rays_d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)

    def masks(eps):
        _, _, mask, _ = _masked_lattice(
            rays_o, rays_d, grid, 512, None, 5e-3, eps, 1)
        return np.asarray(mask)

    m_es, m_off = masks(1e-4), masks(0.0)
    # grazing ray: early stop must cost it NOTHING (old code: truncated)
    np.testing.assert_array_equal(m_es[0], m_off[0])
    assert m_off[0].sum() > 100          # sanity: the plane ray IS occupied
    # block-crossing ray: the deep-interior tail must still be pruned
    assert m_es[1].sum() < m_off[1].sum() - 50
