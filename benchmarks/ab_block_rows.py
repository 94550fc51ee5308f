"""Sweep the fused train kernel's row-block size (TPU).

block_rows trades VMEM residency (weights + f32 grad accumulators +
double-buffered act blocks) against grid-step overhead. Sweeps
256/512/1024/2048 for both backward modes at the bench shape (65536 rows =
1024 rays x K 64); 2048 exceeds VMEM and fails. Result (v5e): 1024 is best
for BOTH modes and is the shipped default (make_fused_train_model_fn).

Timed amortized inside a lax.scan (axon dispatch ~1.3 ms would otherwise
swamp isolated calls).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_block_rows.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.core.models import init_params, make_model
    from fsnerf_tpu.config import Config
    from fsnerf_tpu.ops.pallas.mlp import prep_params
    from fsnerf_tpu.ops.pallas.mlp_train import (_flat_from_prepped,
                                                 make_fused_train_mlp)

    cfg = Config()
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0))
    pr = prep_params(params, n_layers=cfg.model.n_layers,
                     skip=tuple(cfg.model.skip))
    flat = tuple(_flat_from_prepped(pr))

    N = 65536
    rng = np.random.default_rng(0)
    ex = jnp.asarray(rng.normal(size=(N, pr["d_enc_pad"])), jnp.bfloat16)
    ed = jnp.asarray(rng.normal(size=(N, pr["d_dir_pad"])), jnp.bfloat16)

    SCAN = 50

    def time_mode(block_rows, save_acts):
        fused, _ = make_fused_train_mlp(
            cfg.model.n_layers, tuple(cfg.model.skip),
            block_rows=block_rows, save_acts=save_acts)

        def loss(flat, s):
            return jnp.sum(fused(flat, ex + (s * 1e-8).astype(jnp.bfloat16), ed))

        def body(c, i):
            g = jax.grad(loss)(flat, c)
            return (jnp.asarray(g[0]).ravel()[0] * 1e-20).astype(jnp.float32), None

        looped = jax.jit(lambda: jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(SCAN))[0])
        looped()          # compile
        jax.block_until_ready(looped())
        t0 = time.perf_counter()
        for _ in range(3):
            out = looped()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3 / SCAN
        print(f"block_rows={block_rows:>5} save_acts={int(save_acts)}: "
              f"{dt*1e3:.3f} ms fwd+bwd", flush=True)
        return dt

    for sa in (True, False):
        for br in (256, 512, 1024, 2048):
            try:
                time_mode(br, sa)
            except Exception as e:
                print(f"block_rows={br} save_acts={int(sa)}: FAILED "
                      f"({type(e).__name__})", flush=True)


if __name__ == "__main__":
    main()
