"""Profiling / tracing hooks (SURVEY.md section 5: the reference has only a
vestigial memory-snapshot constant and tqdm bars, run-nerf.py:32,224).

Provides:
  * trace(): context manager capturing a TensorBoard-viewable XLA trace via
    jax.profiler (device + host timelines, HLO cost attribution).
  * Throughput: wall-clock rays/sec + steps/sec counter with warmup skip —
    the counter evidence behind the >=5x rays/sec/chip north star.
  * log_compile_time(): one-off helper timing a jitted function's first call
    (compile) vs steady state.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a profiler trace into `log_dir` (view with TensorBoard or
    xprof; works on TPU and CPU backends)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling rays/sec + steps/sec counter.

    Usage:
        tp = Throughput(batch_size=1024, warmup_steps=10)
        for ...: train_step(); tp.tick()
        print(tp.summary())
    """

    def __init__(self, batch_size: int, warmup_steps: int = 10):
        self.batch_size = batch_size
        self.warmup_steps = warmup_steps
        self.steps = 0
        self._t0: Optional[float] = None

    def tick(self, n_steps: int = 1) -> None:
        self.steps += n_steps
        if self._t0 is None and self.steps >= self.warmup_steps:
            self._t0 = time.perf_counter()
            self._steps_at_t0 = self.steps

    @property
    def counted_steps(self) -> int:
        return 0 if self._t0 is None else self.steps - self._steps_at_t0

    def summary(self) -> dict:
        if self._t0 is None or self.counted_steps == 0:
            return {"steps_per_sec": 0.0, "rays_per_sec": 0.0}
        dt = time.perf_counter() - self._t0
        sps = self.counted_steps / dt
        return {"steps_per_sec": sps, "rays_per_sec": sps * self.batch_size}


def log_compile_time(fn: Callable, *args) -> dict:
    """(compile_seconds, steady_seconds) for a jitted callable."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    steady_s = time.perf_counter() - t0
    return {"compile_s": compile_s, "steady_s": steady_s}


def enable_compilation_cache(path: str = "~/.cache/fsnerf_jax") -> None:
    """Persistent XLA compilation cache: repeated runs skip the ~40-60s
    compile (verified working through the axon remote-compile path)."""
    import os
    try:
        p = os.path.expanduser(path)
        os.makedirs(p, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", p)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
