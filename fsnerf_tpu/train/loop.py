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
import os
import time
from typing import Callable, Optional

import jax

from fsnerf_tpu.train.state import TrainState
from fsnerf_tpu.train.step import (
    init_state,
    make_optimizer,
    make_train_chunk,
    make_train_step,
)


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

    def close(self):
        if self.fh:
            self.fh.close()


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
) -> TrainState:
    """Run cfg.train.n_iters optimization steps.

    Args:
      model: flax module; cfg: Config; pool: RayPool; scene: dataset object
        (.near/.far/.aabb).
      state: resume state (None = fresh init).
      checkpointer: optional utils.checkpoint.Checkpointer.
      val_fn: optional callable (state, step) -> dict run every
        cfg.train.val_rate steps when cfg.train.val is set.

    Returns:
      final TrainState.
    """
    from fsnerf_tpu.core.schedules import make_schedule

    optimizer = make_optimizer(cfg)
    if state is None:
        state = init_state(model, cfg, optimizer, scene.aabb,
                           jax.random.key(cfg.train.seed))
    step_fn = jax.jit(make_train_step(model, cfg, optimizer, pool, scene),
                      donate_argnums=0)
    schedule = make_schedule(cfg)

    start = int(state.step)
    t0 = time.perf_counter()
    pending = None
    for k in range(start, cfg.train.n_iters):
        state, metrics = step_fn(state)
        if (k + 1) % log_every == 0 or k == cfg.train.n_iters - 1:
            m = jax.device_get(metrics)
            dt = time.perf_counter() - t0
            rays_per_sec = (k + 1 - start) * cfg.train.batch_size / dt
            m["rays_per_sec"] = rays_per_sec
            # reference wandb fields (run-nerf.py:297-299): lr + alpha
            m["lr"] = float(schedule(k))
            if cfg.train.ao is not None:
                m["alpha"] = cfg.train.ao
            if logger:
                logger.log(k + 1, m)
        if cfg.train.val and val_fn and (k + 1) % cfg.train.val_rate == 0:
            val_metrics = val_fn(state, k + 1)
            if logger and val_metrics:
                logger.log(k + 1, {f"val_{n}": v
                                   for n, v in val_metrics.items()
                                   if v is not None})
        if (checkpointer and cfg.train.ckpt_every
                and (k + 1) % cfg.train.ckpt_every == 0):
            checkpointer.save(state, k + 1)

    if checkpointer:
        checkpointer.save(state, cfg.train.n_iters, final=True)
    return state


def train_scanned(
    model, cfg, pool, scene,
    state: Optional[TrainState] = None,
    chunk: int = 100,
    on_chunk: Optional[Callable] = None,
) -> TrainState:
    """Headless training: lax.scan chunks of `chunk` steps per dispatch."""
    optimizer = make_optimizer(cfg)
    if state is None:
        state = init_state(model, cfg, optimizer, scene.aabb,
                           jax.random.key(cfg.train.seed))
    step_fn = make_train_step(model, cfg, optimizer, pool, scene)
    chunk_fn = jax.jit(make_train_chunk(step_fn, chunk), donate_argnums=0)
    n_chunks = cfg.train.n_iters // chunk
    for c in range(n_chunks):
        state, metrics = chunk_fn(state)
        if on_chunk:
            on_chunk(c, state, metrics)
    return state
