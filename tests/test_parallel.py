"""Multi-chip tests on the 8-device virtual CPU mesh (SURVEY.md section 4:
'multi-chip tests runnable without hardware ... asserting DP-sharded grads ==
single-device grads')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsnerf_tpu.config import Config, DataConfig, EncoderConfig, ModelConfig, SamplingConfig, TrainConfig
from fsnerf_tpu.core.models import make_model
from fsnerf_tpu.data.pool import pool_from_images
from fsnerf_tpu.data.synthetic import SphereScene
from fsnerf_tpu.parallel.mesh import make_mesh, replicate
from fsnerf_tpu.parallel.train_parallel import make_parallel_train_step
from fsnerf_tpu.train.step import init_state, make_optimizer, make_train_step


def _cfg():
    return Config(
        encoder=EncoderConfig(n_freqs=4, n_freqs_views=2),
        model=ModelConfig(n_layers=2, d_filter=32, skip=(1,)),
        data=DataConfig(dataset="sphere", white_bkgd=True),
        sampling=SamplingConfig(strategy="occgrid", n_samples=32,
                                grid_resolution=16, warmup_steps=4,
                                update_interval=4, render_step_size=0.1),
        train=TrainConfig(n_iters=10, batch_size=256, lro=5e-3,
                          scheduler="const"),
    )


def test_eight_virtual_devices_available():
    assert jax.device_count() >= 8


def test_parallel_step_runs_and_stays_replicated():
    cfg = _cfg()
    scene = SphereScene(n_imgs=4, hw=16)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    mesh = make_mesh(8)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))
    state = replicate(state, mesh)
    step_fn = make_parallel_train_step(model, cfg, optimizer, pool, scene,
                                       mesh)
    for _ in range(6):   # crosses one grid-update boundary
        state, metrics = step_fn(state)
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"])
    assert int(state.step) == 6

    # params identical across devices (fetch per-device shards)
    leaf = jax.tree.leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_parallel_training_converges():
    """NOTE: long dispatch loops over an 8-virtual-device CPU mesh crash this
    1-core environment (XLA:CPU collective threading); a 2-device mesh with a
    short loop exercises the same code path (.claude/skills/verify/SKILL.md)."""
    cfg = _cfg().replace(train=TrainConfig(n_iters=80, batch_size=512,
                                           lro=5e-3, scheduler="const"))
    scene = SphereScene(n_imgs=4, hw=16)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    mesh = make_mesh(2)
    state = replicate(
        init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0)),
        mesh)
    step_fn = make_parallel_train_step(model, cfg, optimizer, pool, scene,
                                       mesh)
    for _ in range(80):
        state, metrics = step_fn(state)
    m = jax.device_get(metrics)
    assert m["psnr"] > 10.0, m


def test_sharded_grads_match_single_device():
    """A DP step over the mesh must reproduce single-device math when every
    chip consumes the same global batch: compare a hand-built psum-of-shards
    gradient against the unsharded gradient."""
    from jax.sharding import PartitionSpec as P

    # float32 isolates the sharding math from bf16 reduction-order noise
    cfg = _cfg().replace(train=TrainConfig(n_iters=10, batch_size=256,
                                           lro=5e-3, scheduler="const",
                                           dtype="float32"))
    scene = SphereScene(n_imgs=4, hw=16)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    mesh = make_mesh(8)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))

    from fsnerf_tpu.core.losses import mse
    from fsnerf_tpu.render.renderer import render_rays_occgrid

    batch = jax.device_get(pool.sample(jax.random.key(7), 256))
    rays_o, rays_d, rgb_gt = (jnp.asarray(b) for b in batch)

    def loss_fn(params, ro, rd, gt):
        def model_fn(x, d=None):
            return model.apply(params, x, d)
        out = render_rays_occgrid(model_fn, ro, rd, state.grid, 32,
                                  render_step_size=0.1, white_bkgd=True)
        # sum (not mean) so shard-psum equals the global value exactly
        return jnp.sum(jnp.square(out["rgb"] - gt))

    g_single = jax.grad(loss_fn)(state.params, rays_o, rays_d, rgb_gt)

    def sharded(params, ro, rd, gt):
        g = jax.grad(loss_fn)(params, ro, rd, gt)
        return jax.lax.psum(g, "data")

    g_sharded = jax.jit(jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False,
    ))(state.params, rays_o, rays_d, rgb_gt)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_flagship_shapes_parallel_compile():
    """One shard_map step of the FLAGSHIP config (8x256 MLP, res-128 grid,
    n_samples 512) on the virtual mesh — exercises the sharding specs at the
    real ranks the toy configs can't (VERDICT r1 weak #6). Tiny batch keeps
    the 1-core CPU compile tractable."""
    cfg = Config(
        data=DataConfig(dataset="sphere", white_bkgd=True),
        sampling=SamplingConfig(strategy="occgrid", n_samples=512,
                                grid_resolution=128, grid_levels=1,
                                warmup_steps=1, update_interval=2),
        train=TrainConfig(n_iters=1, batch_size=16, lro=5e-4),
    )
    scene = SphereScene(n_imgs=3, hw=12)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    mesh = make_mesh(8)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))
    # start at step 1: the res-128 grid-update branch still COMPILES inside
    # lax.cond (the sharding-rank coverage this test exists for) but does not
    # EXECUTE — running 128^3 cells through the 8x256 MLP on the single-core
    # CPU backend takes tens of minutes and validates nothing extra.
    state = state.replace(step=jnp.ones((), jnp.int32))
    state = replicate(state, mesh)
    step_fn = make_parallel_train_step(model, cfg, optimizer, pool, scene,
                                       mesh)
    state, metrics = step_fn(state)
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"])
    assert int(state.step) == 2


def test_cli_parallel_mesh_end_to_end(tmp_path, monkeypatch):
    """The CLI trains + renders over the 8-device virtual mesh when more than
    one device is visible (VERDICT r1 next #4: parallel layer in the product
    path)."""
    from fsnerf_tpu.cli import main
    from fsnerf_tpu.data import synthetic as S

    # shorten the orbit path for speed
    orig = S.spherical_path
    monkeypatch.setattr(S, "spherical_path",
                        lambda radius=4.0311289, theta_deg=50.0, frames=12:
                            orig(radius, theta_deg, 1))
    rc = main([
        "--dataset", "sphere", "--n_imgs", "4",
        "--n_iters", "6", "--batch_size", "64",
        "--n_samples", "24", "--n_compact", "16",
        "--grid_resolution", "8", "--n_freqs", "3", "--n_freqs_views", "2",
        "--n_layers", "2", "--d_filter", "16", "--skip", "1",
        "--white_bkgd", "--debug", "--n_devices", "8",
    ])
    assert rc == 0


# ---------------------------------------------------------------------------
# Multi-host (DCN) hybrid mesh (parallel/mesh.py::make_hybrid_mesh)
# ---------------------------------------------------------------------------

def test_hybrid_mesh_shape():
    from fsnerf_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh(n_groups=2)     # simulate 2 hosts x 4 chips
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("replica", "data")
    # single-process grouping by process_index degenerates to one group
    m1 = make_hybrid_mesh()
    assert m1.devices.shape[0] == 1


def test_hybrid_mesh_step_matches_flat_mesh():
    """The 2-D (replica, data) step must be bit-identical to the 1-D 'data'
    step: the row-major global device index draws the same per-chip batches,
    and the hierarchical pmean reduces the same values."""
    from fsnerf_tpu.parallel.mesh import make_hybrid_mesh

    cfg = _cfg()
    scene = SphereScene(n_imgs=4, hw=16)
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    mesh1 = make_mesh(8)
    # independent states (same seed -> same values): the step donates its
    # input, so the two paths must not alias buffers
    s1 = replicate(init_state(model, cfg, optimizer, scene.aabb,
                              jax.random.key(0)), mesh1)
    step1 = make_parallel_train_step(model, cfg, optimizer, pool, scene,
                                     mesh1)
    mesh2 = make_hybrid_mesh(n_groups=2)
    s2 = replicate(init_state(model, cfg, optimizer, scene.aabb,
                              jax.random.key(0)), mesh2)
    step2 = make_parallel_train_step(model, cfg, optimizer, pool, scene,
                                     mesh2)
    for _ in range(3):
        s1, m1 = step1(s1)
        s2, m2 = step2(s2)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-7)


def test_fused_render_sharded_matches_single_device():
    """The fused ray-march Pallas kernel under shard_map on the mesh must
    equal the single-device fused render and the XLA pipeline (VERDICT r2
    weak #1: multi-chip eval/video must keep kernel throughput)."""
    from fsnerf_tpu.core.models import NeRF, init_params
    from fsnerf_tpu.ops import occgrid as og
    from fsnerf_tpu.ops.pallas.render import make_fused_ray_renderer
    from fsnerf_tpu.render.renderer import make_chunk_renderer

    model = NeRF(n_layers=4, d_filter=64, skip=(2,), n_freqs=4,
                 n_freqs_views=2, compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.key(2))
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    grid = og.create(aabb, resolution=16, levels=1)
    dens = lambda x: jnp.where(jnp.linalg.norm(x, axis=-1) < 1.2, 30.0, 0.0)
    grid = og.update(grid, dens, None, jnp.asarray(0))
    rng = np.random.default_rng(0)
    ro = rng.normal(size=(64, 3))
    ro = 4.0 * ro / np.linalg.norm(ro, axis=-1, keepdims=True)
    rd = -ro / 4.0 + 0.1 * rng.normal(size=(64, 3))
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    ro, rd = jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32)

    fused = make_fused_ray_renderer(params, n_layers=4, skip=(2,), n_freqs=4,
                                    n_freqs_views=2, early_stop_eps=1e-4,
                                    block_rows=8, chunk_s=8, interpret=True)
    kw = dict(grid=grid, n_samples=64, render_step_size=0.05,
              white_bkgd=True, near=2.0, far=6.0, n_compact=32,
              early_stop_eps=1e-4)
    mesh = make_mesh(8)
    sharded = make_chunk_renderer(None, fused_render_fn=fused, mesh=mesh,
                                  **kw)
    single = make_chunk_renderer(None, fused_render_fn=fused, **kw)
    xla = make_chunk_renderer(lambda x, d=None: model.apply(params, x, d),
                              **kw)
    rgb_s, dep_s = sharded(ro, rd)
    rgb_1, dep_1 = single(ro, rd)
    rgb_x, dep_x = xla(ro, rd)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dep_s), np.asarray(dep_1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(rgb_x),
                               atol=7e-3)


@pytest.mark.parametrize("mesh_kind", ["flat", "hybrid"])
def test_sharded_grid_refresh_matches_replicated(mesh_kind):
    """The mesh-partitioned occupancy refresh (density eval sharded over
    chips + all_gather) must be BITWISE equal to the replicated update —
    same cells, same jitter, same math (VERDICT r3 item 4)."""
    from jax.sharding import PartitionSpec as P

    from fsnerf_tpu.ops import occgrid as og
    from fsnerf_tpu.parallel.mesh import make_hybrid_mesh

    mesh = (make_mesh(8) if mesh_kind == "flat"
            else make_hybrid_mesh(n_groups=2))
    axes = tuple((a, int(mesh.shape[a])) for a in mesh.axis_names)
    aabb = jnp.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])

    def density_fn(x):
        # row-independent nonlinear density standing in for the MLP
        return jnp.sum(jnp.sin(3.0 * x) * jnp.cos(2.0 * x[..., ::-1]), -1)

    def run(step, shard_axes, grid):
        def body(g):
            return og.update(g, density_fn, jax.random.key(5),
                             jnp.asarray(step), render_step_size=0.1,
                             warmup_steps=2, update_parts=4,
                             shard_axes=shard_axes)
        if shard_axes is None:
            return jax.jit(body)(grid)
        smapped = jax.shard_map(body, mesh=mesh, in_specs=(P(),),
                                out_specs=P(), check_vma=False)
        return jax.jit(smapped)(grid)

    for levels in (1, 2):
        grid = og.create(aabb, resolution=16, levels=levels,
                         query_dilation=1)
        for step in (0, 16):     # warmup full refresh + round-robin partial
            g_rep = run(step, None, grid)
            g_sh = run(step, axes, grid)
            np.testing.assert_array_equal(np.asarray(g_rep.occs),
                                          np.asarray(g_sh.occs))
            np.testing.assert_array_equal(np.asarray(g_rep.occs_q),
                                          np.asarray(g_sh.occs_q))
            np.testing.assert_array_equal(np.asarray(g_rep.thre),
                                          np.asarray(g_sh.thre))
            grid = g_rep


def test_hybrid_mesh_tiled_render():
    from fsnerf_tpu.parallel.mesh import make_hybrid_mesh
    from fsnerf_tpu.parallel.train_parallel import render_rays_tiled

    def render_fn(ro, rd):
        return {"rgb": jnp.tanh(ro + rd)}

    mesh = make_hybrid_mesh(n_groups=2)
    ro = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)),
                     jnp.float32)
    rd = jnp.asarray(np.random.default_rng(1).normal(size=(64, 3)),
                     jnp.float32)
    out = render_rays_tiled(render_fn, ro, rd, mesh)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(jnp.tanh(ro + rd)), atol=1e-6)
