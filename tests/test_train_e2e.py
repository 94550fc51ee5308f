"""End-to-end convergence tests on the analytic sphere scene
(SURVEY.md section 4: 'end-to-end tiny-scene convergence test ... assert
PSNR > threshold').

Kept tiny: this environment has a single CPU core, so shapes are minimal and
step counts are in the hundreds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsnerf_tpu.config import Config, EncoderConfig, ModelConfig, SamplingConfig, TrainConfig, DataConfig
from fsnerf_tpu.core.models import make_model
from fsnerf_tpu.data.pool import pool_from_images
from fsnerf_tpu.data.synthetic import SphereScene
from fsnerf_tpu.train.loop import train_scanned
from fsnerf_tpu.train.step import init_state, make_optimizer, make_train_step


def _tiny_cfg(strategy="occgrid", **train_kw):
    return Config(
        encoder=EncoderConfig(n_freqs=4, n_freqs_views=2),
        model=ModelConfig(n_layers=2, d_filter=32, skip=(1,)),
        data=DataConfig(dataset="sphere", white_bkgd=True),
        sampling=SamplingConfig(
            strategy=strategy, n_samples=48, n_fine=32,
            grid_resolution=16, warmup_steps=10, update_interval=4,
            render_step_size=0.1),
        train=TrainConfig(n_iters=300, batch_size=256, lro=5e-3,
                          scheduler="const", **train_kw),
    )


@pytest.fixture(scope="module")
def scene():
    return SphereScene(n_imgs=6, hw=24, white_bkgd=True)


def _run(cfg, scene, n_iters=None):
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))
    step_fn = jax.jit(make_train_step(model, cfg, optimizer, pool, scene),
                      donate_argnums=0)
    metrics = None
    for _ in range(n_iters or cfg.train.n_iters):
        state, metrics = step_fn(state)
    return state, jax.device_get(metrics)


def test_occgrid_training_converges(scene):
    cfg = _tiny_cfg("occgrid")
    state, metrics = _run(cfg, scene)
    assert np.isfinite(metrics["loss"])
    assert metrics["psnr"] > 14.0, metrics
    # the grid should have begun pruning empty space (EMA decay is gradual:
    # at 300 steps with partial refreshes expect ~0.8, not the asymptote)
    assert 0.0 < metrics["occupancy"] < 0.95


def test_hierarchical_training_converges(scene):
    cfg = _tiny_cfg("hierarchical")
    state, metrics = _run(cfg, scene)
    assert np.isfinite(metrics["loss"])
    assert metrics["psnr"] > 14.0, metrics


def test_training_is_deterministic(scene):
    cfg = _tiny_cfg("occgrid")
    _, m1 = _run(cfg, scene, n_iters=20)
    _, m2 = _run(cfg, scene, n_iters=20)
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-5)


def test_freq_reg_and_occlusion_paths(scene):
    """Regularizer paths compile and train (FreeNeRF mask + occlusion +
    weight decay all active)."""
    cfg = _tiny_cfg("occgrid", ao=1e-5, reg="l1", beta=1.0,
                    occ_a=0.1, occ_b=1.0, occ_func="linear")
    cfg = cfg.replace(encoder=EncoderConfig(n_freqs=4, n_freqs_views=2,
                                            freq_reg_end=100))
    state, metrics = _run(cfg, scene, n_iters=50)
    assert np.isfinite(metrics["loss"])


def test_fewshot_freq_reg_config_converges(scene):
    """Regression pin for the round-4 few-shot defaults decision
    (benchmarks/quality_fewshot.py, BASELINE.md r4): at n=3 training views
    the recommended config is FreeNeRF annealed frequency masking ON
    (freq_reg_end = 0.9 * n_iters), occlusion reg OFF. Guards that the
    chosen config trains to a sane held-out view, not just that the
    regularizer path compiles (test_freq_reg_and_occlusion_paths)."""
    from fsnerf_tpu.render.renderer import render_frame

    cfg = _tiny_cfg("occgrid")
    cfg = cfg.replace(encoder=EncoderConfig(
        n_freqs=4, n_freqs_views=2, freq_reg_end=int(0.9 * 300)))
    model = make_model(cfg)
    idx = np.array([0, 2, 4])                       # 3 of 6 orbit views
    pool = pool_from_images(scene.imgs[idx], scene.poses[idx], scene.hwf)
    optimizer = make_optimizer(cfg)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))
    step_fn = jax.jit(make_train_step(model, cfg, optimizer, pool, scene),
                      donate_argnums=0)
    for _ in range(cfg.train.n_iters):
        state, metrics = step_fn(state)
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics["loss"])
    assert metrics["psnr"] > 14.0, metrics

    def model_fn(x, d=None):
        return model.apply(state.params, x, d)

    img, _ = render_frame(
        model_fn, jnp.asarray(scene.poses[5]), scene.hwf, scene.near,
        scene.far, strategy="occgrid", grid=state.grid,
        n_samples=cfg.sampling.n_samples,
        render_step_size=cfg.sampling.render_step_size, white_bkgd=True)
    gt = jnp.asarray(scene.imgs[5])
    heldout_psnr = -10.0 * np.log10(float(jnp.mean((img - gt) ** 2)))
    assert heldout_psnr > 12.0, heldout_psnr


def test_scanned_training_matches_loop(scene):
    """lax.scan-chunked training must produce the same trajectory as the
    step-by-step Python loop: identical RNG threading, identical params."""
    cfg = _tiny_cfg("occgrid")
    cfg = cfg.replace(train=TrainConfig(n_iters=40, batch_size=256, lro=5e-3,
                                        scheduler="const"))
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    state0 = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))

    scan_metrics = {}
    state_scan = train_scanned(
        model, cfg, pool, scene, state=state0, chunk=20,
        on_chunk=lambda c, s, m: scan_metrics.update(jax.device_get(m)))

    state_loop, m_loop = _run(cfg, scene, n_iters=40)
    assert int(state_scan.step) == 40
    # the last scan-chunk metrics are step 40's metrics — same as the loop's
    np.testing.assert_allclose(scan_metrics["loss"], m_loop["loss"],
                               rtol=1e-4)
    # params must match leaf-by-leaf (same seed, same step count)
    for a, b in zip(jax.tree.leaves(state_scan.params),
                    jax.tree.leaves(state_loop.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sinerf_training_converges(scene):
    """SiNeRF (SIREN trunk) end-to-end on the occgrid path."""
    from fsnerf_tpu.config import ModelConfig
    cfg = _tiny_cfg("occgrid")
    cfg = cfg.replace(model=ModelConfig(model="sinerf", n_layers=4,
                                        d_filter=32))
    state, metrics = _run(cfg, scene)
    assert np.isfinite(metrics["loss"])
    assert metrics["psnr"] > 12.0, metrics


def test_train_resume_realigns_chunk_lattice(scene):
    """Resuming from a step off the chunk lattice must step a short
    realignment chunk and then return to full chunks (ADVICE r2: pinning
    chunk_c=1 for the rest of the run reintroduced per-step dispatch)."""
    from fsnerf_tpu.train.loop import train
    from fsnerf_tpu.train import loop as L

    cfg = _tiny_cfg().replace(
        train=_tiny_cfg().train.__class__(
            n_iters=30, batch_size=64, lro=5e-3, scheduler="const"))
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    optimizer = make_optimizer(cfg)
    state = init_state(model, cfg, optimizer, scene.aabb, jax.random.key(0))
    # simulate a mid-chunk checkpoint restore: start at step 7
    step_fn = jax.jit(make_train_step(model, cfg, optimizer, pool, scene),
                      donate_argnums=0)
    for _ in range(7):
        state, _ = step_fn(state)
    assert int(state.step) == 7

    seen = []
    orig = L.make_train_chunk

    def spy(fn, n):
        seen.append(n)
        return orig(fn, n)

    L.make_train_chunk = spy
    try:
        state = train(model, cfg, pool, scene, state=state, log_every=10)
    finally:
        L.make_train_chunk = orig
    assert int(state.step) == 30
    # log_every=10 -> chunk_c=10: expect a 3-step realign chunk then 10s
    assert 3 in seen and 10 in seen, seen


@pytest.mark.parametrize("async_ladder", [True, False])
def test_train_async_ladder_swap(scene, async_ladder):
    """The adaptive-K ladder under train(): with async_ladder the new-K
    executable compiles on a background thread (training keeps stepping at
    the old K until the swap lands); sync mode blocks. Both must converge
    and actually exercise a ladder change."""
    from fsnerf_tpu.train.loop import CompactionController, train

    cfg = _tiny_cfg("occgrid", async_ladder=async_ladder)
    # a K ceiling far above the converged valid count forces >= 1 swap
    import dataclasses
    cfg = cfg.replace(sampling=dataclasses.replace(
        cfg.sampling, n_compact=48, adapt_compact=True))

    swaps = []
    orig_observe = CompactionController.observe

    def spy(self, nv):
        changed = orig_observe(self, nv)
        if changed:
            swaps.append(self.k)
        return changed

    CompactionController.observe = spy
    try:
        model = make_model(cfg)
        pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
        state = train(model, cfg, pool, scene, log_every=100)
    finally:
        CompactionController.observe = orig_observe

    assert int(state.step) == cfg.train.n_iters
    assert swaps, "ladder never moved — test config no longer forces a swap"
    assert jnp.isfinite(state.params["params"]["layers_0"]["kernel"]).all()


def test_divergence_guard_unit():
    """DivergenceGuard semantics: non-finite metrics always halt; a PSNR
    collapse (>drop_db below best, post-warmup) warns and halts only when
    halt_on_collapse is set (VERDICT r4 next #3 — two real silent 8k-step
    divergences motivated this)."""
    from fsnerf_tpu.train.loop import DivergenceGuard

    g = DivergenceGuard(halt_on_collapse=False, drop_db=10.0, warmup=100)
    assert not g.observe(100, {"loss": 0.1, "psnr": 20.0})
    assert not g.observe(200, {"loss": 0.1, "psnr": 25.0})
    # collapse below best-10: warns (tripped) but does NOT halt by default
    assert not g.observe(300, {"loss": 5.0, "psnr": 12.0})
    assert g.tripped
    # non-finite ALWAYS halts, flag or not
    assert g.observe(400, {"loss": float("nan"), "psnr": 20.0})

    h = DivergenceGuard(halt_on_collapse=True, drop_db=10.0, warmup=100)
    assert not h.observe(50, {"loss": 0.1, "psnr": 3.0})   # warmup: ignored
    assert not h.observe(100, {"loss": 0.1, "psnr": 25.0})
    assert h.observe(200, {"loss": 5.0, "psnr": 12.0})     # halts with flag


def test_divergence_guard_halts_diverging_run(scene):
    """A deliberately diverging config (NaN learning rate poisons the params
    on the first update, the reference-style failure mode of the r4 occ-reg
    'both' arms at full scale) must halt train() at the first log boundary
    instead of silently training to n_iters."""
    from fsnerf_tpu.train.loop import train

    cfg = _tiny_cfg("occgrid")
    import dataclasses
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, n_iters=100, batch_size=64, lro=float("nan")))
    model = make_model(cfg)
    pool = pool_from_images(scene.imgs, scene.poses, scene.hwf)
    state = train(model, cfg, pool, scene, log_every=10)
    assert int(state.step) < cfg.train.n_iters, (
        "guard failed to halt a NaN run")
