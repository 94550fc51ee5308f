"""Speed-of-light decomposition of the fused SiNeRF RAY-MARCH kernel (TPU).

VERDICT r4 weak #2: the SiNeRF fused render missed its ~500k rays/s bar
(462.1k) and the sincos attribution was reasoned from the TRAIN-forward
decomposition (benchmarks/sol_siren.py) — there was no speed-of-light
number at the render kernel's own shapes (block_rows 128, chunk_s 16,
K samples marched under the compositing shell with early exit). This probe
times variant kernels that share ops/pallas/render.py::_render_kernel (the
exact compositing shell of _fused_render_call_siren) and swap only the
mlp_fn trunk emission:

  real      — the landed SIREN trunk (_fwd_siren with _sincos_fast), early
              exit DISABLED (log_eps -> -inf) so every variant executes the
              identical chunk schedule on the all-valid mask.
  realexit  — same with the production early_stop_eps=1e-4 (on an all-valid
              constant-density input this shows the exit test's overhead /
              benefit on a worst-case no-exit workload).
  sinbf16   — _sincos_fast evaluated on bf16 arguments/coefficients (the
              VERDICT suggestion: consumers are bf16 GEMM operands; if v5e
              packs bf16 VPU lanes 2x this halves the transcendental chain).
  sindeg5   — deg-5 TRUE minimax sin (coefficients fitted here by weighted
              Remez-lite; max abs err 6.8e-5 on [-pi/2, pi/2] — as accurate
              as the landed deg-7 whose coefficients are not equi-
              oscillating, one r2 FMA shorter).
  nosin     — sin replaced by a scaled cast: the GEMM + layout +
              compositing floor of this topology at these shapes.

Analytic anchors at these shapes (R=16384 rays, K=128 samples, 197 TFLOPs
bf16 peak): trunk+head GEMM work ~= 1.06 MFLOP/sample -> 11.3 ms -> 1.45M
rays/s pure-MXU ideal (no exit). The production kernel's observed e2e
throughput (bench.py fused sinerf render ~460-480k) additionally includes
occupancy query + compaction glue and BENEFITS from early exit, so it is
not directly comparable; this probe isolates the kernel.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sol_siren_render.py
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsnerf_tpu.ops.pallas.render import _render_kernel
from fsnerf_tpu.ops.pallas.siren import (_flat_siren, _fwd_siren,
                                         _heads_siren, prep_siren_params,
                                         siren_weight_names)

R = 16384            # rays per render chunk (render_frame chunksize)
K = 128              # marched samples per ray (settled compaction K)
BLOCK_ROWS = 128     # production block_rows (make_fused_siren_ray_renderer)
CHUNK_S = 16         # production chunk_s
SCAN = 20
PEAK_TFLOPS = 197.0
N_LAYERS = 8
ALPHAS = (30.0,) + (1.0,) * (N_LAYERS - 1)


def _sincos_variant(x, mode):
    """Variant sin emissions sharing _sincos_fast's structure."""
    f32 = jnp.float32
    if mode == "nosin":
        return x * f32(0.05)                 # cast-only stand-in
    if mode == "sinbf16":
        b = jnp.bfloat16
        xb = x.astype(b)
        k = jnp.round(xb * b(0.3183098861837907))
        r = xb - k * b(3.140625)
        r = r - k * b(9.67653589793e-4)
        km = k - b(2.0) * jnp.floor(k * b(0.5))
        sign = b(1.0) - b(2.0) * km
        r2 = r * r
        s = r * (b(1.0) + r2 * (b(-1.66666546e-1)
                 + r2 * (b(8.3321608e-3) + r2 * b(-1.9515296e-4))))
        return (sign * s).astype(f32)
    # sindeg5: f32 range reduction, one fewer polynomial term
    k = jnp.round(x * f32(0.3183098861837907))
    r = x - k * f32(3.140625)
    r = r - k * f32(9.67653589793e-4)
    km = k - 2.0 * jnp.floor(k * 0.5)
    sign = 1.0 - 2.0 * km
    r2 = r * r
    s = r * (f32(9.99696825e-1) + r2 * (f32(-1.65673162e-1)
             + r2 * f32(7.51440369e-3)))
    return sign * s


def make_mlp_fn(mode):
    """mlp_fn(x, d, ws) -> (rgb, sigma) with the chosen trunk sin."""
    if mode == "real":
        def mlp_fn(x, d, ws):
            rgb, sigma, _ = _fwd_siren(x, d, ws, N_LAYERS, ALPHAS)
            return rgb, sigma
        return mlp_fn

    def mlp_fn(x, d, ws):
        f32, bf16 = jnp.float32, jnp.bfloat16
        h = x
        for i in range(N_LAYERS):
            y = (jnp.dot(h, ws[f"t{i}"], preferred_element_type=f32)
                 + ws[f"b{i}"])
            h = _sincos_variant(ALPHAS[i] * y, mode).astype(bf16)
        rgb, sigma, _ = _heads_siren(h, d, ws, save=False)
        return rgb, sigma
    return mlp_fn


def build_call(flat, names, mode, eps):
    mlp_fn = make_mlp_fn(mode)
    log_eps = float(math.log(eps))
    kernel = functools.partial(_render_kernel, mlp_fn, CHUNK_S, log_eps,
                               names, False)
    n_chunks = K // CHUNK_S
    plane = pl.BlockSpec((1, BLOCK_ROWS, CHUNK_S), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM)

    @jax.jit
    def call(xt, d_rep, t_t, deltas_t, mask_t):
        return pl.pallas_call(
            kernel,
            grid=(R // BLOCK_ROWS, n_chunks),
            in_specs=[
                pl.BlockSpec((1, BLOCK_ROWS * CHUNK_S, xt.shape[-1]),
                             lambda i, c: (c, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_ROWS * CHUNK_S, d_rep.shape[-1]),
                             lambda i, c: (i, 0), memory_space=pltpu.VMEM),
                plane, plane, plane,
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
            ],
            out_specs=pl.BlockSpec((BLOCK_ROWS, 8), lambda i, c: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS, 128), jnp.float32),
                pltpu.VMEM((BLOCK_ROWS, 8), jnp.float32),
            ],
        )(xt, d_rep, t_t, deltas_t, mask_t, *flat)
    return call


def main():
    from fsnerf_tpu.config import Config, ModelConfig
    from fsnerf_tpu.core.models import init_params, make_model
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    cfg = Config(model=ModelConfig(model="sinerf"))
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0))
    prepped = prep_siren_params(params, n_layers=N_LAYERS)
    flat = tuple(_flat_siren(prepped, N_LAYERS))
    names = siren_weight_names(N_LAYERS)
    d_in_pad = prepped["d_in_pad"]

    rng = np.random.default_rng(0)
    n_chunks = K // CHUNK_S
    x = rng.uniform(-1.2, 1.2, (R, K, 3)).astype(np.float32)
    xt = jnp.zeros((n_chunks, R * CHUNK_S, d_in_pad), jnp.bfloat16)
    xr = (x.reshape(R, n_chunks, CHUNK_S, 3).transpose(1, 0, 2, 3)
          .reshape(n_chunks, R * CHUNK_S, 3))
    xt = xt.at[:, :, :3].set(jnp.asarray(xr, jnp.bfloat16))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dp = jnp.zeros((R, d_in_pad), jnp.bfloat16)
    dp = dp.at[:, :3].set(jnp.asarray(d, jnp.bfloat16))
    d_rep = jnp.broadcast_to(dp[:, None, :], (R, CHUNK_S, d_in_pad)
                             ).reshape(R * CHUNK_S, d_in_pad)

    def plane(a):
        return jnp.asarray(a.reshape(R, n_chunks, CHUNK_S)
                           .transpose(1, 0, 2), jnp.float32)
    t = plane(np.broadcast_to(np.linspace(2.0, 6.0, K, dtype=np.float32),
                              (R, K)).copy())
    deltas = plane(np.full((R, K), 4.0 / K, np.float32))
    mask = plane(np.ones((R, K), np.float32))
    args = (xt, d_rep, t, deltas, mask)
    jax.block_until_ready(args)

    def timeit(tag, call):
        @jax.jit
        def looped(s, *arrs):
            def body(c, _):
                out = call(arrs[0] + (c * 0).astype(arrs[0].dtype),
                           *arrs[1:])
                return (out.ravel()[0] * 1e-20).astype(jnp.float32), None
            return jax.lax.scan(body, s, jnp.arange(SCAN))[0]

        try:
            float(np.asarray(looped(jnp.float32(0.0), *args)))
            t0 = time.perf_counter()
            out = looped(jnp.float32(0.0), *args)
            carry = float(np.asarray(out))              # fetch fence
            dt = (time.perf_counter() - t0) / SCAN
            print(f"{tag:>10}: {dt*1e3:7.3f} ms  ({R/dt/1e3:7.1f}k rays/s"
                  f", carry {carry:.2e})", flush=True)
            return dt
        except Exception as e:
            print(f"{tag:>10}: FAILED {type(e).__name__}: {e}"[:200],
                  flush=True)
            return None

    gemm_flops = R * K * 1.06e6
    print(f"analytic MXU ideal: {gemm_flops/PEAK_TFLOPS/1e12*1e3:.2f} ms "
          f"({R/(gemm_flops/PEAK_TFLOPS/1e12)/1e3:.0f}k rays/s)")
    results = {}
    for mode, eps in [("real", 1e-30), ("realexit", 1e-4),
                      ("sinbf16", 1e-30), ("sindeg5", 1e-30),
                      ("nosin", 1e-30)]:
        call = build_call(flat, names, mode if mode != "realexit" else
                          "real", eps)
        results[mode] = timeit(mode, call)

    if results.get("real") and results.get("nosin"):
        sin_ms = (results["real"] - results["nosin"]) * 1e3
        print(f"\nsincos chain cost: {sin_ms:.3f} ms "
              f"({sin_ms/(results['real']*1e3)*100:.0f}% of real)")


if __name__ == "__main__":
    main()
