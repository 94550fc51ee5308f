"""Learning-rate schedules as optax-compatible callables.

Behavioral parity with src/core/scheduler.py:
  * Constant — scheduler.py:43-51.
  * ExponentialDecay — scheduler.py:54-80: lr(t) = lro * r**(t/T) for t < T,
    clamped to lro * r afterwards.

NOTE: the reference's train() constructs the scheduler with T = args.n_iters
(run-nerf.py:223), NOT the --Td flag (Td only parameterizes the weight-reg
schedule, run-nerf.py:270). We preserve that behavior. The reference mutates
optimizer param groups imperatively; here schedules are pure functions of the
step count fed to optax.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def constant_lr(lro: float) -> Callable:
    def schedule(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), lro)
    return schedule


def exponential_decay_lr(lro: float, T: int, r: float) -> Callable:
    """lr(t) = lro * r**(t/T), clamped to lro*r once t >= T."""
    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        lr = lro * jnp.power(r, t / float(T))
        return jnp.where(t < T, lr, lro * r)
    return schedule


def make_schedule(cfg) -> Callable:
    """Select schedule from config (run-nerf.py:218-223)."""
    if cfg.train.scheduler == "const":
        return constant_lr(cfg.train.lro)
    if cfg.train.scheduler == "exp":
        return exponential_decay_lr(cfg.train.lro, cfg.train.n_iters,
                                    cfg.train.decay_rate)
    raise ValueError(f"Unknown scheduler: {cfg.train.scheduler}")
