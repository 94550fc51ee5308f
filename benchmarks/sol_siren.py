"""Speed-of-light decomposition of the fused SiNeRF (SIREN) kernel (TPU).

SiNeRF trains at ~78.5k rays/s where NeRF reaches ~375k — yet its analytic
GEMM FLOPs per row are nearly identical to NeRF's. The structural
difference: 8 sin passes per forward (16 with the saved-acts derivative
stream a_i cos(a_i y_i)), all multi-op f32 VPU sequences. This probe
separates GEMM floor from transcendental cost:

  fwd real        — jnp.sin trunk emission (the PRE-fastsin product kernel;
                    kept to reproduce the decomposition that motivated the
                    change — NOTE the head stack goes through the imported
                    product _heads_siren, which is polynomial since fastsin
                    landed, so 'real' isolates the TRUNK sin cost).
  fwd save        — same + the a_i cos(a_i y_i) derivative stream.
  fwd nosin       — sin replaced by a cast (pure GEMM chain + layout):
                    the MXU floor for this topology at this block size.
  fwd fastsin     — the landed product emission (_sincos_fast from
                    ops/pallas/siren.py — single source of truth; shared
                    range reduction for the sin+cos pair in save mode).
  bwd saved       — the product's saved-acts backward (no transcendentals).

Recorded on v5e (pre-landing, 131k rows, block 512): real 8.3-11.1 ms /
save 8.66 ms -> fastsin 2.71 / save 3.33 ms vs nosin floor 2.05 ms.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sol_siren.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsnerf_tpu.ops.pallas.siren import (_bwd_kernel_saved, _fwd_kernel,
                                         _fwd_kernel_save, _heads_siren,
                                         _sincos_fast, prep_siren_params,
                                         _flat_siren, siren_weight_names)

N = 131072          # sinerf bench rows: 1024 rays x settled K 128
BLOCK = 512
SCAN = 30
PEAK_TFLOPS = 197.0


def _fwd_variant_kernel(n_layers, alphas, names, mode, save, *refs):
    f32, bf16 = jnp.float32, jnp.bfloat16
    x_ref, d_ref = refs[0], refs[1]
    ws = {n: refs[2 + i][:] for i, n in enumerate(names)}
    out_ref = refs[2 + len(names)]
    acts_ref = refs[3 + len(names)] if save else None
    x = x_ref[:]
    h = x
    D = ws["wf"].shape[0]
    for i in range(n_layers):
        y = (jnp.dot(h, ws[f"t{i}"], preferred_element_type=f32)
             + ws[f"b{i}"])
        ay = alphas[i] * y
        if mode == "nosin":
            h = ay.astype(bf16)
            c = h if save else None
        elif mode == "fastsin":
            s, c_ = _sincos_fast(ay, want_cos=save)
            h = s.astype(bf16)
            c = (alphas[i] * c_).astype(bf16) if save else None
        else:
            h = jnp.sin(ay).astype(bf16)
            c = ((alphas[i] * jnp.cos(ay)).astype(bf16)) if save else None
        if save:
            acts_ref[:, i * D:(i + 1) * D] = h
            acts_ref[:, (n_layers + i) * D:(n_layers + i + 1) * D] = c
    rgb, sigma, _ = _heads_siren(h, d_ref[:], ws)
    out_ref[:, 0:3] = rgb[:, 0:3]
    out_ref[:, 3:4] = sigma[:, 0:1]


def make_fwd_variant(n_layers, alphas, names, mode, save):
    def call(flat, x, d):
        n = x.shape[0]

        def row_spec(cols):
            return pl.BlockSpec((BLOCK, cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        D = flat[names.index("wf")].shape[0]
        kern = functools.partial(_fwd_variant_kernel, n_layers, alphas,
                                 names, mode, save)
        if save:
            out_specs = (row_spec(4), row_spec(2 * n_layers * D))
            out_shape = (jax.ShapeDtypeStruct((n, 4), jnp.float32),
                         jax.ShapeDtypeStruct((n, 2 * n_layers * D),
                                              jnp.bfloat16))
        else:
            out_specs = (row_spec(4),)
            out_shape = (jax.ShapeDtypeStruct((n, 4), jnp.float32),)
        return pl.pallas_call(
            kern, grid=(n // BLOCK,),
            in_specs=[row_spec(x.shape[1]), row_spec(d.shape[1]),
                      *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]],
            out_specs=out_specs,
            out_shape=out_shape,
        )(x, d, *flat)

    return call


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import Config, ModelConfig
    from fsnerf_tpu.core.models import init_params, make_model

    cfg = Config(model=ModelConfig(model="sinerf"))
    n_layers = cfg.model.n_layers
    alphas = (30.0,) + (1.0,) * (n_layers - 1)
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0))
    pr = prep_siren_params(params, n_layers=n_layers)
    flat = tuple(_flat_siren(pr, n_layers))
    names = siren_weight_names(n_layers)

    rng = np.random.default_rng(0)
    dp = pr["d_in_pad"]
    x = jnp.zeros((N, dp), jnp.bfloat16).at[:, :3].set(
        jnp.asarray(rng.uniform(-1.5, 1.5, size=(N, 3)), jnp.bfloat16))
    d = jnp.zeros((N, dp), jnp.bfloat16).at[:, :3].set(
        jnp.asarray(rng.normal(size=(N, 3)), jnp.bfloat16))
    D = pr["wf"].shape[0]
    acts = jnp.asarray(rng.normal(size=(N, 2 * n_layers * D)) * 0.5,
                       jnp.bfloat16)
    dout16 = jnp.pad(jnp.asarray(rng.normal(size=(N, 4)), jnp.float32),
                     ((0, 0), (0, 12)))

    macs = 0
    for nm, w in zip(names, flat):
        if w.ndim == 2 and w.shape[0] > 1:
            macs += w.shape[0] * w.shape[1]
    gf_fwd = 2.0 * macs * N / 1e9
    print(f"analytic fwd {gf_fwd:.1f} GFLOP -> ideal "
          f"{gf_fwd / PEAK_TFLOPS:.3f} ms; bwd ~2x -> "
          f"{2 * gf_fwd / PEAK_TFLOPS:.3f} ms  (N={N}, block={BLOCK})",
          flush=True)

    def timeit(tag, fn, *arrays):
        @jax.jit
        def looped(*arrs):
            return jax.lax.scan(
                lambda c, i: ((jnp.asarray(fn(c, *arrs)[0]).ravel()[0]
                               * 1e-20).astype(jnp.float32), None),
                jnp.float32(0.0), jnp.arange(SCAN))[0]

        try:
            float(np.asarray(looped(*arrays)))          # warm + drain
            t0 = time.perf_counter()
            for _ in range(3):
                out = looped(*arrays)
            carry = float(np.asarray(out))              # completion fence
            dt = (time.perf_counter() - t0) / 3 / SCAN
            print(f"{tag:>22}: {dt * 1e3:7.3f} ms   (carry {carry:.3e})",
                  flush=True)
            return dt
        except Exception as e:
            print(f"{tag:>22}: FAILED ({type(e).__name__}: {e})"[:200],
                  flush=True)
            return None

    for mode in ("real", "nosin", "fastsin"):
        for save in (False, True):
            fn = make_fwd_variant(n_layers, alphas, names, mode, save)
            # save mode returns (out, acts): select out for the carry
            timeit(f"fwd {mode} save={int(save)}",
                   lambda s, x_, d_, *fl, f=fn: (
                       f(fl, x_ + (s * 1e-8).astype(jnp.bfloat16), d_)[0],),
                   x, d, *flat)

    # product saved-acts backward at this shape
    def bwd_call(fl, x_, d_, acts_, do_):
        n = x_.shape[0]

        def row_spec(cols):
            return pl.BlockSpec((BLOCK, cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        kern = functools.partial(_bwd_kernel_saved, n_layers, alphas, names)
        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in fl]
        dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM) for w in fl]
        return pl.pallas_call(
            kern, grid=(n // BLOCK,),
            in_specs=[row_spec(x_.shape[1]), row_spec(d_.shape[1]),
                      row_spec(16), row_spec(acts_.shape[1]),
                      *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in fl]],
            out_specs=tuple(dw_specs),
            out_shape=tuple(dw_shapes),
        )(x_, d_, dout16, acts_, *fl)

    timeit("bwd saved real",
           lambda s, x_, d_, acts_, do_, *fl: bwd_call(
               fl, x_ + (s * 1e-8).astype(jnp.bfloat16), d_, acts_, do_),
           x, d, acts, dout16, *flat)

    # numeric check: fastsin vs jnp.sin on representative SIREN arguments
    xs = jnp.asarray(rng.uniform(-40, 40, size=(1 << 14,)), jnp.float32)
    s_fast, c_fast = _sincos_fast(xs, want_sin=True, want_cos=True)
    print("fastsin max |err| vs jnp:",
          float(jnp.max(jnp.abs(s_fast - jnp.sin(xs)))),
          float(jnp.max(jnp.abs(c_fast - jnp.cos(xs)))), flush=True)


if __name__ == "__main__":
    main()
