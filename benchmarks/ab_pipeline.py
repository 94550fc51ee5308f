"""Fused-train-kernel pipelining probe: block-size / VMEM-cap sweep (TPU).

The r3/r4 sol decomposition (benchmarks/sol_mlp.py, BASELINE.md "Glue
decomposition") pinned the fused kernel at 1.75 ms fwd+bwd vs ~1.25 ms GEMM
ideal and showed BOTH passes are scheduling-bound (every VPU-strip variant
within noise; the bwd GEMM skeleton times the same as the real bwd). The
remaining levers are grid/block structure, not emission:

  * fwd_block_rows — the forward has no resident grad accumulators, so it
    tolerates much larger row blocks than the backward; fewer grid steps
    amortize per-step overhead and lengthen the schedulable body.
  * block_rows (bwd) — 2048 previously FAILED at the 32 MB scoped-VMEM cap
    (ab_block_rows.py); v5e physically has 128 MB/core, so retry under a
    raised cap.

Times the primal forward and the full custom-VJP (fwd_save + bwd) at bench
shapes for a matrix of (bwd block, fwd block, vmem cap), in the fetch-fenced
scan harness (sol_mlp.py — block_until_ready lies through the axon tunnel).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_pipeline.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from fsnerf_tpu.ops.pallas.mlp import encode_lane_operand, prep_params
from fsnerf_tpu.ops.pallas.mlp_train import (_flat_from_prepped,
                                             make_fused_train_mlp)

N = 65536
SCAN = 50
PEAK_TFLOPS = 197.0


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import Config
    from fsnerf_tpu.core.models import init_params, make_model

    cfg = Config()
    n_layers, skip = cfg.model.n_layers, tuple(cfg.model.skip)
    enc = cfg.encoder
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0))
    pr = prep_params(params, n_layers=n_layers, skip=skip,
                     enc_lanes=(enc.n_freqs, enc.n_freqs_views))
    flat = tuple(_flat_from_prepped(pr))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    def tile16(v):
        v4 = np.pad(v, ((0, 0), (0, 1)))
        return jnp.asarray(np.tile(v4, (1, 4)))

    x16, d16 = tile16(x), tile16(d)
    cx = encode_lane_operand(enc.n_freqs, enc.log_space, None)
    cd = encode_lane_operand(enc.n_freqs_views, enc.log_space, None)
    dout = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)

    def timeit(tag, fn, *arrays):
        @jax.jit
        def looped(*arrs):
            return jax.lax.scan(
                lambda c, i: ((jnp.asarray(fn(c, *arrs)).ravel()[0]
                               * 1e-20).astype(jnp.float32), None),
                jnp.float32(0.0), jnp.arange(SCAN))[0]

        try:
            float(np.asarray(looped(*arrays)))          # warm + drain
            t0 = time.perf_counter()
            for _ in range(3):
                out = looped(*arrays)
            carry = float(np.asarray(out))              # completion fence
            dt = (time.perf_counter() - t0) / 3 / SCAN
            print(f"{tag:>34}: {dt * 1e3:7.3f} ms  (carry {carry:.3e})",
                  flush=True)
            return dt
        except Exception as e:
            print(f"{tag:>34}: FAILED ({type(e).__name__}: {e})"[:180],
                  flush=True)
            return None

    matrix = [
        # (bwd block, fwd block, vmem MB, fwd dim semantics) baseline first
        (1024, 1024, 32, None),
        (1024, 2048, 64, None),
        (1024, 4096, 100, None),
        (1024, 8192, 100, None),
        (2048, 2048, 100, None),
        (2048, 4096, 100, None),
        # grid-axis semantics on the (independent-step) forward grid
        (1024, 1024, 32, "parallel"),
        (1024, 1024, 32, "arbitrary"),
    ]
    results = {}
    for bwd_b, fwd_b, mb, sem in matrix:
        fused, _ = make_fused_train_mlp(
            n_layers, skip, block_rows=bwd_b, save_acts=True,
            encode=(enc.n_freqs, enc.n_freqs_views),
            fwd_block_rows=fwd_b, vmem_limit_mb=mb,
            fwd_dim_semantics=sem)

        def fwd_only(s, x16_, d16_, cx_, cd_, *fl, f=fused):
            return f(fl, x16_ + s * 1e-8, d16_, cx_, cd_)

        def fwd_bwd(s, x16_, d16_, cx_, cd_, do_, *fl, f=fused):
            out, vjp = jax.vjp(
                lambda fl_: f(fl_, x16_ + s * 1e-8, d16_, cx_, cd_), fl)
            (dfl,) = vjp(do_)
            return dfl[0]

        tag = f"b{bwd_b}/f{fwd_b}/v{mb}" + (f"/{sem}" if sem else "")
        tf = timeit(f"fwd  {tag}", fwd_only, x16, d16, cx, cd, *flat)
        tb = timeit(f"step {tag}", fwd_bwd, x16, d16, cx, cd, dout, *flat)
        if tf is not None and tb is not None:
            results[(bwd_b, fwd_b, mb, sem)] = (tf, tb)

    print("\nideal: fwd 0.428 ms, fwd+bwd ~1.25 ms at bench shapes "
          "(sol_mlp.py analytic)")
    for k, (tf, tb) in sorted(results.items(), key=lambda kv: kv[1][1]):
        print(f"  bwd {k[0]:>5} fwd {k[1]:>5} vmem {k[2]:>3} {k[3] or '-':>9}: "
              f"fwd {tf*1e3:6.3f} ms, fwd+vjp {tb*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
