"""Training driver: the framework equivalent of the reference train()
(run-nerf.py:194-351) plus capabilities the reference lacks (periodic
checkpointing, resumable state, JSON-lines metrics, rays/sec counters).

The Python loop dispatches jitted steps asynchronously; metrics are fetched
only every `log_every` steps so the device never stalls on the host. For
fully headless runs (benchmarks), `scan_chunks` trains N steps per dispatch
via lax.scan.
"""

from __future__ import annotations

import json
import logging
import math
import os
import threading
import time
from typing import Callable, Optional

import jax

_log = logging.getLogger(__name__)

from fsnerf_tpu.train.state import TrainState
from fsnerf_tpu.train.step import (
    init_state,
    make_optimizer,
    make_train_chunk,
    make_train_step,
)


class CompactionController:
    """Adaptive compaction-K ladder (the main MLP-FLOP lever).

    The occgrid step evaluates the MLP on K = n_compact samples per ray; as
    the occupancy grid converges, the measured mean pre-compaction valid
    count drops far below the configured ceiling (e.g. mean ~ 69 vs K = 192
    on the solid-sphere scene), leaving most of the MLP batch masked padding.
    This controller tracks the n_valid_mean train metric and proposes the
    smallest ladder value (multiples of 16) covering margin x the mean
    (SamplingConfig.compact_margin, default 1.0 — the ceil-to-16 step gives
    +8 average headroom and overflow rays fall back to an unbiased coarser
    quadrature); the
    train loop swaps in a step recompiled at the new K (the persistent
    compilation cache makes repeat swaps free). Growth on rising need is
    immediate; shrinking waits for `patience` consecutive observations to
    avoid oscillation. Rays whose valid count exceeds K get an unbiased
    coarser quadrature (ops/sampling.py::compact_samples spread), which a
    3k-step held-out A/B measured quality-neutral down to K far below the
    tail (24.9/25.1/24.7/25.4 dB at K=192/96/64/32 on the sphere).

    This is the dense-layout counterpart of nerfacc evaluating exactly the
    unpruned packed samples (reference rendering.py:66-74): nerfacc's ragged
    CUDA packing adapts per step by construction, a TPU program cannot — so
    the executable's static K adapts across steps instead.
    """

    STEP = 16

    def __init__(self, cfg, margin: Optional[float] = None,
                 patience: int = 2):
        s = cfg.sampling
        self.k_max = int(s.n_compact) if s.n_compact else 0
        self.enabled = bool(s.adapt_compact and s.strategy == "occgrid"
                            and self.k_max > self.STEP)
        self.k = self.k_max
        # margin 1.0 measured quality-equal to 1.25 (3k-step held-out A/B:
        # effects ~0.1 dB vs ~1.7 dB seed noise) and ~16% faster steady-state
        self.margin = float(getattr(s, "compact_margin", 1.0)
                            if margin is None else margin)
        self.patience = patience
        self._below = 0

    def target(self, nv_q: float) -> int:
        """Ladder K for a measured mean valid-sample count (public: also
        used to derive the eval-time K from the converged grid, cli.py)."""
        return self._target(nv_q)

    def _target(self, nv_q: float) -> int:
        t = int(-(-self.margin * max(nv_q, 1.0) // self.STEP)) * self.STEP
        return min(max(t, self.STEP), self.k_max)

    def observe(self, nv_q: float) -> bool:
        """Feed one n_valid_mean observation; True when K changed."""
        if not self.enabled:
            return False
        t = self._target(nv_q)
        if t > self.k:                    # need grew: grow immediately
            self.k = t
            self._below = 0
            return True
        if t < self.k:
            self._below += 1
            if self._below >= self.patience:
                self.k = t
                self._below = 0
                return True
        else:
            self._below = 0
        return False

    def apply(self, cfg):
        """cfg with n_compact pinned to the controller's current K."""
        import dataclasses
        return cfg.replace(sampling=dataclasses.replace(
            cfg.sampling, n_compact=self.k))


class DivergenceGuard:
    """Detect silent training divergence at the existing log-boundary metric
    fetch (zero extra device traffic). Motivated by two real incidents that
    each trained a diverged model silently for a full 8k-step run
    (BASELINE.md: the r3 dilated-od collapse and the r4 occ-reg "both" arms,
    which ended at -7.3/-39.2 dB). Two trips:

    - non-finite loss/PSNR: ALWAYS halts — the Adam moments are already
      poisoned, every further step is wasted compute;
    - train-PSNR collapse (current PSNR more than `drop_db` below the best
      seen, after `warmup` steps): warns loudly once, and halts only when
      `halt_on_collapse` (cfg.train.halt_on_divergence) is set — a collapse
      can be transient (e.g. right after an occupancy-grid refresh), so
      halting is opt-in.
    """

    def __init__(self, halt_on_collapse: bool = False, drop_db: float = 10.0,
                 warmup: int = 500):
        self.halt_on_collapse = bool(halt_on_collapse)
        self.drop_db = float(drop_db)
        self.warmup = int(warmup)
        self.best_psnr: Optional[float] = None
        self.tripped = False

    def observe(self, step: int, metrics: dict) -> bool:
        """Feed one fetched metrics dict; True => stop training now."""
        loss = float(metrics.get("loss", 0.0))
        psnr = float(metrics.get("psnr", 0.0))
        if not (math.isfinite(loss) and math.isfinite(psnr)):
            _log.error(
                "Divergence guard: non-finite training metrics at step %d "
                "(loss=%r, psnr=%r) — halting (optimizer state is poisoned; "
                "lower the LR or disable the regularizer that diverged).",
                step, loss, psnr)
            self.tripped = True
            return True
        if step < self.warmup:
            return False
        if self.best_psnr is None or psnr > self.best_psnr:
            self.best_psnr = psnr
        elif psnr < self.best_psnr - self.drop_db:
            if not self.tripped:
                _log.warning(
                    "Divergence guard: train PSNR collapsed to %.2f dB at "
                    "step %d (best seen %.2f dB, threshold drop %.1f dB)%s",
                    psnr, step, self.best_psnr, self.drop_db,
                    " — halting (--halt_on_divergence)."
                    if self.halt_on_collapse else
                    "; continuing (pass --halt_on_divergence to stop).")
            self.tripped = True
            return self.halt_on_collapse
        return False


class _AsyncBuild:
    """One background trace+lower+compile (XLA compilation releases the GIL,
    and dispatching already-compiled steps needs almost no host CPU, so the
    compile overlaps training instead of stalling it).

    Daemon thread: an in-flight compile must not block interpreter exit."""

    def __init__(self, build: Callable):
        self._result = None
        self._exc: Optional[BaseException] = None
        self._done = threading.Event()
        threading.Thread(target=self._run, args=(build,), daemon=True).start()

    def _run(self, build):
        try:
            self._result = build()
        except BaseException as e:          # surfaced at poll()
            self._exc = e
        finally:
            self._done.set()

    def poll(self):
        """Compiled callable once ready, else None; re-raises a failure."""
        if not self._done.is_set():
            return None
        if self._exc is not None:
            raise self._exc
        return self._result


def _abstract(tree):
    """ShapeDtypeStruct skeleton (with shardings) for AOT .lower() — the
    concrete state must not be captured by a background compile: its buffers
    are donated by the very next dispatch."""
    def one(a):
        sh = getattr(a, "sharding", None)
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)
    return jax.tree.map(one, tree)


class MetricsLogger:
    """JSON-lines metrics sink (always on) + optional wandb (reference logs
    exclusively to wandb, run-nerf.py:297-299)."""

    def __init__(self, out_dir: Optional[str], use_wandb: bool = False,
                 run_name: str = "run"):
        self.fh = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.fh = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                self.wandb = wandb
                wandb.init(project="fsnerf-tpu", name=run_name)
            except Exception:
                self.wandb = None

    def log(self, step: int, metrics: dict):
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        if self.fh:
            self.fh.write(json.dumps(rec) + "\n")
            self.fh.flush()
        if self.wandb:
            self.wandb.log(rec, step=step)

    def log_summary(self, metrics: dict):
        """Final run metrics (reference wandb.log of psnr/ssim/lpips after
        evaluation, run-nerf.py:404-413)."""
        if self.wandb:
            self.wandb.log({k: v for k, v in metrics.items()
                            if v is not None})

    def log_video(self, name: str, frames_tchw, fps: int = 30):
        """Rendered video artifact (uint8 [T, C, H, W] — the reference logs
        the rgb/depth path renders as wandb mp4s, run-nerf.py:459-468)."""
        if self.wandb:
            self.wandb.log({name: self.wandb.Video(frames_tchw, fps=fps,
                                                   format="mp4")})

    def log_figure(self, name: str, figure):
        """Plotly/matplotlib figure (the reference's camera-pose plot,
        run-nerf.py:378-380)."""
        if self.wandb:
            self.wandb.log({name: figure})

    def close(self):
        if self.fh:
            self.fh.close()
        if self.wandb:
            try:
                self.wandb.finish()
            except Exception:
                pass


def train(
    model,
    cfg,
    pool,
    scene,
    state: Optional[TrainState] = None,
    logger: Optional[MetricsLogger] = None,
    log_every: int = 100,
    checkpointer=None,
    val_fn: Optional[Callable] = None,
    mesh=None,
) -> TrainState:
    """Run cfg.train.n_iters optimization steps.

    Args:
      model: flax module; cfg: Config; pool: RayPool; scene: dataset object
        (.near/.far/.aabb).
      state: resume state (None = fresh init).
      checkpointer: optional utils.checkpoint.Checkpointer.
      val_fn: optional callable (state, step) -> dict run every
        cfg.train.val_rate steps when cfg.train.val is set.
      mesh: optional jax.sharding.Mesh — trains data-parallel over its 'data'
        axis (per-chip batch = batch_size // n_devices, gradient pmean over
        ICI); the single-chip path is untouched (and collective-free) when
        None. Same loss math either way (train/step.py::make_loss_fn).

    Returns:
      final TrainState.
    """
    from fsnerf_tpu.core.schedules import make_schedule

    optimizer = make_optimizer(cfg)
    if state is None:
        state = init_state(model, cfg, optimizer, scene.aabb,
                           jax.random.key(cfg.train.seed))
    if mesh is not None:
        from fsnerf_tpu.parallel.mesh import replicate
        state = replicate(state, mesh)

    def build_step(c):
        if mesh is not None:
            from fsnerf_tpu.parallel.train_parallel import \
                make_parallel_train_step
            return make_parallel_train_step(model, c, optimizer, pool,
                                            scene, mesh)
        return jax.jit(make_train_step(model, c, optimizer, pool, scene),
                       donate_argnums=0)

    compactor = CompactionController(cfg)
    schedule = make_schedule(cfg)
    guard = DivergenceGuard(
        halt_on_collapse=getattr(cfg.train, "halt_on_divergence", False))

    # Dispatch in lax.scan chunks between callback boundaries: per-step
    # dispatch from the single host core costs ~5-10 ms/step — at 250k
    # rays/s steady state that would DOMINATE wall clock. The chunk size is
    # a common divisor of every active boundary (log/val/ckpt), so callback
    # semantics are step-exact; a chunk of 1 falls back to the plain step.
    bounds = [max(1, log_every)]
    if cfg.train.val and val_fn:
        bounds.append(max(1, cfg.train.val_rate))
    if checkpointer and cfg.train.ckpt_every:
        bounds.append(max(1, cfg.train.ckpt_every))
    g = bounds[0]
    for b in bounds[1:]:
        g = math.gcd(g, b)
    chunk_c = next(d for d in (100, 50, 25, 20, 10, 5, 4, 2, 1)
                   if g % d == 0)

    def build_chunk(c, n):
        sf = build_step(c)
        if n == 1:
            return sf
        return jax.jit(make_train_chunk(sf, n), donate_argnums=0)

    chunk_fns = {}                       # chunk length -> compiled fn
    live_cfg = compactor.apply(cfg)      # the cfg chunk_fns were built at

    def get_chunk(n):
        if n not in chunk_fns:
            chunk_fns[n] = build_chunk(live_cfg, n)
        return chunk_fns[n]

    # Non-blocking adaptive-ladder swaps (TrainConfig.async_ladder): a K
    # change submits the new executable to a background compile and training
    # CONTINUES at the old K until it is ready — a ladder level costs ~50 s
    # of XLA compile vs ~0.3 s per 100-step chunk at full scale, so blocking
    # swaps spend ~5x more wall clock compiling than computing. This only
    # wins when the host has SPARE cores: measured on the 1-core dev box the
    # background compile starves the dispatch thread and async LOSES (395 s
    # sync vs 467 s async, 8k-iter 800^2 run) — hence the auto default
    # (None): on iff os.cpu_count() > 2. Compiles are serialized on one
    # worker with newest-target-wins so a fast-descending ladder never
    # stacks concurrent compiles or builds abandoned intermediate rungs.
    # Tradeoff when on: the exact step at which K switches depends on
    # compile latency (each K's math stays seeded-deterministic; the ladder
    # itself is quality-neutral per the BASELINE.md study).
    # --no_async_ladder forces compile-blocking, step-deterministic swaps.
    want_async = getattr(cfg.train, "async_ladder", None)
    if want_async is None:
        want_async = (os.cpu_count() or 1) > 2
    use_async = bool(want_async) and chunk_c > 1
    abs_state = _abstract(state)
    abs_pool = _abstract(pool)
    pending: Optional[_AsyncBuild] = None
    pending_for = None                  # cfg the in-flight build compiles
    target_cfg = live_cfg               # newest ladder target

    def submit_swap(new_cfg):
        def build():
            jitted = build_chunk(new_cfg, chunk_c)
            return jitted.lower(abs_state, abs_pool).compile()
        return _AsyncBuild(build)

    start = int(state.step)
    t0 = time.perf_counter()
    k = start
    while k < cfg.train.n_iters:
        if pending is not None:
            done = pending.poll()
            if done is not None:
                chunk_fns.clear()
                chunk_fns[chunk_c] = done
                live_cfg, pending = pending_for, None
                if target_cfg != live_cfg:      # ladder moved on: chase the
                    pending_for = target_cfg    # NEWEST rung, skip stale ones
                    pending = submit_swap(target_cfg)
        # resume from a step off the chunk lattice: one short realignment
        # chunk, then full chunks (pinning chunk_c to 1 for the whole run
        # would reintroduce the per-step dispatch stall chunking removes)
        n = min(chunk_c - k % chunk_c, cfg.train.n_iters - k)
        # pool passed as an argument (NOT a closure constant — see
        # data/pool.py: full-scale compiles were ~20x the train compute)
        state, metrics = get_chunk(n)(state, pool)
        k += n
        # adaptive compaction observes EVERY chunk (not just log boundaries):
        # the ladder must track the converging grid at its own cadence
        if compactor.enabled and "n_valid_mean" in metrics:
            if compactor.observe(float(
                    jax.device_get(metrics["n_valid_mean"]))):
                target_cfg = compactor.apply(cfg)
                if use_async:
                    if pending is None:     # else: picked up on completion
                        pending_for = target_cfg
                        pending = submit_swap(target_cfg)
                else:
                    chunk_fns.clear()       # recompile synchronously at new K
                    live_cfg = target_cfg
        if k % log_every == 0 or k == cfg.train.n_iters:
            m = jax.device_get(metrics)
            dt = time.perf_counter() - t0
            rays_per_sec = (k - start) * cfg.train.batch_size / dt
            m["rays_per_sec"] = rays_per_sec
            # reference wandb fields (run-nerf.py:297-299): lr + alpha
            m["lr"] = float(schedule(k - 1))
            if cfg.train.ao is not None:
                m["alpha"] = cfg.train.ao
            m["n_compact"] = compactor.k
            if logger:
                logger.log(k, m)
            if guard.observe(k, m):
                break
        if cfg.train.val and val_fn and k % cfg.train.val_rate == 0:
            val_metrics = val_fn(state, k)
            if logger and val_metrics:
                logger.log(k, {f"val_{n}": v
                               for n, v in val_metrics.items()
                               if v is not None})
        if (checkpointer and cfg.train.ckpt_every
                and k % cfg.train.ckpt_every == 0):
            checkpointer.save(state, k)

    if checkpointer:
        checkpointer.save(state, cfg.train.n_iters, final=True)
    return state


def train_scanned(
    model, cfg, pool, scene,
    state: Optional[TrainState] = None,
    chunk: int = 100,
    on_chunk: Optional[Callable] = None,
) -> TrainState:
    """Headless training: lax.scan chunks of `chunk` steps per dispatch.

    Adaptive compaction runs at chunk boundaries (each chunk's last-step
    n_valid_mean feeds the controller; a K change swaps in a chunk program
    recompiled at the new K).
    """
    optimizer = make_optimizer(cfg)
    if state is None:
        state = init_state(model, cfg, optimizer, scene.aabb,
                           jax.random.key(cfg.train.seed))

    def build_chunk(c):
        step_fn = make_train_step(model, c, optimizer, pool, scene)
        return jax.jit(make_train_chunk(step_fn, chunk), donate_argnums=0)

    compactor = CompactionController(cfg)
    chunk_fn = build_chunk(cfg)
    n_chunks = cfg.train.n_iters // chunk
    for c in range(n_chunks):
        state, metrics = chunk_fn(state, pool)
        if on_chunk:
            on_chunk(c, state, metrics)
        if compactor.enabled and compactor.observe(
                float(jax.device_get(metrics["n_valid_mean"]))):
            chunk_fn = build_chunk(compactor.apply(cfg))
    return state
