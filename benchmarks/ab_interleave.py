"""Sweep the fused train kernel's sub-chain interleave factor (TPU).

interleave splits each row block into J independent chains emitted
layer-wise interleaved, giving Mosaic cross-chain ILP: one chain's VPU tail
(bias+relu+cast, ~15-20% of layer cycles at [1024,256]x[256,256]) can
overlap another chain's MXU GEMM. J=1 is the original single-chain
emission. Sweeps J in {1,2,4} x block_rows {1024, 2048} for both backward
modes at the bench shape (65536 rows = 1024 rays x K 64).

Timed amortized inside a lax.scan (axon dispatch ~1.3 ms would otherwise
swamp isolated calls).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_interleave.py
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

    def time_mode(block_rows, save_acts, interleave, fwd_only=False):
        fused, _ = make_fused_train_mlp(
            cfg.model.n_layers, tuple(cfg.model.skip),
            block_rows=block_rows, save_acts=save_acts,
            interleave=interleave)

        def loss(flat, s):
            return jnp.sum(fused(flat, ex + (s * 1e-8).astype(jnp.bfloat16),
                                 ed))

        def body(c, i):
            if fwd_only:
                v = loss(flat, c)
                return (v * 1e-20).astype(jnp.float32), None
            g = jax.grad(loss)(flat, c)
            return (jnp.asarray(g[0]).ravel()[0] * 1e-20).astype(
                jnp.float32), None

        looped = jax.jit(lambda: jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(SCAN))[0])
        looped()          # compile
        jax.block_until_ready(looped())
        t0 = time.perf_counter()
        for _ in range(3):
            out = looped()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3 / SCAN
        tag = "fwd     " if fwd_only else "fwd+bwd "
        print(f"block={block_rows:>5} save_acts={int(save_acts)} "
              f"J={interleave}: {dt*1e3:.3f} ms {tag}", flush=True)
        return dt

    # forward-only first (isolates the fwd kernel's ILP effect)
    for j in (1, 2, 4):
        try:
            time_mode(1024, False, j, fwd_only=True)
        except Exception as e:
            print(f"fwd J={j}: FAILED ({type(e).__name__})", flush=True)
    for sa in (True, False):
        for br in (1024, 2048):
            for j in (1, 2, 4):
                try:
                    time_mode(br, sa, j)
                except Exception as e:
                    print(f"block={br} save_acts={int(sa)} J={j}: FAILED "
                          f"({type(e).__name__}: {e})"[:200], flush=True)


if __name__ == "__main__":
    main()
