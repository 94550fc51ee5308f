"""Where does the hierarchical MLP stage lose its ~12% kernel-MFU? (TPU)

VERDICT r3 item 3: profile_hier.py pins 85% of the hierarchical step in the
fused-MLP stages at ~0.64 kernel-MFU vs 0.72 for the SAME kernel at the
occgrid bench shape. This decomposes that gap by timing, at the exact
hierarchical row shapes (coarse B*C = 65,536 and fine B*F = 131,072 rows):

  kernel fwd        — raw pallas_call forward, operands pre-padded/pre-
                      prepped (the 0.72-MFU measurement's conditions).
  kernel fwd+bwd    — raw custom-VJP call (value_and_grad wrt the flat
                      padded weights); isolates grid-length scaling of the
                      resident-dW-accumulator backward.
  apply fwd+bwd     — make_fused_train_model_fn's apply_fn (what the train
                      step runs): adds prep_params + positional encoding +
                      zero-pad glue per call. (apply - kernel) at each shape
                      = the per-call glue the hierarchical step pays TWICE.

If kernel ns/row is flat across 64 vs 128 grid blocks, the gap is glue
(encoding/pad of the dense [B,S,3] points), not Mosaic pipelining — and the
fix is hoisting/fusing glue, not kernel surgery.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sol_hier_kernel.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

SCAN = 50
PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import Config
    from fsnerf_tpu.core.models import init_params, make_model
    from fsnerf_tpu.ops.pallas.mlp_train import (_flat_from_prepped,
                                                 _weight_names,
                                                 make_fused_train_mlp,
                                                 make_fused_train_model_fn,
                                                 prep_params)

    cfg = Config()
    n_layers, skip = cfg.model.n_layers, tuple(cfg.model.skip)
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0))
    pr = prep_params(params, n_layers=n_layers, skip=skip)
    flat = tuple(_flat_from_prepped(pr))
    names = _weight_names(n_layers, skip)

    # per-row executed MACs from the padded operand shapes (sol_mlp.py)
    macs_row = sum(w.shape[0] * w.shape[1] for n, w in zip(names, flat)
                   if w.ndim == 2 and w.shape[0] > 1)
    head_macs = sum(w.shape[0] * w.shape[1] for nm, w in zip(names, flat)
                    if nm in ("w_conn", "w_branch_h", "w_branch_d", "w_rgb"))

    fused, _ = make_fused_train_mlp(
        n_layers, skip, block_rows=1024,
        save_acts=bool(cfg.model.fused_save_acts))
    apply_fn = make_fused_train_model_fn(cfg.model, cfg.encoder)

    def timeit(tag, fn, *arrays):
        # arrays ride as jit ARGUMENTS (closures become HLO constants and
        # blow the axon remote-compile payload); the carry couples
        # iterations so XLA can't hoist; the timed window ENDS with a real
        # scalar fetch (block_until_ready lies through the axon tunnel)
        @jax.jit
        def looped(*arrs):
            def body(c, i):
                out = fn(c, *arrs)
                s = sum(jnp.asarray(l).ravel()[0].astype(jnp.float32)
                        for l in jax.tree.leaves(out))
                return jnp.where(jnp.isfinite(s), s, 0.0) * 1e-20, None
            return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(SCAN))[0]

        float(np.asarray(looped(*arrays)))              # warm + drain
        t0 = time.perf_counter()
        for _ in range(3):
            out = looped(*arrays)
        float(np.asarray(out))                          # completion fence
        dt = (time.perf_counter() - t0) / 3 / SCAN
        return dt

    rng = np.random.default_rng(0)
    B = 1024
    for rows, label in ((64 * B, "coarse/occgrid 65,536"),
                        (128 * B, "fine 131,072"),
                        (192 * B, "merged 196,608")):
        ex = jnp.asarray(rng.normal(size=(rows, pr["d_enc_pad"])),
                         jnp.bfloat16)
        ed = jnp.asarray(rng.normal(size=(rows, pr["d_dir_pad"])),
                         jnp.bfloat16)
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, rows // B, 3)),
                        jnp.float32)
        d = jnp.broadcast_to(
            jnp.asarray(rng.normal(size=(B, 1, 3)), jnp.float32), x.shape)

        gf_fwd = 2.0 * macs_row * rows / 1e9
        gf_bwd = 2 * gf_fwd + 2.0 * head_macs * rows / 1e9

        def k_fwd(c, fl, exx, edd):
            return (fused(fl, exx + c * 1e-32, edd)[0, 0],)

        def k_fb(c, fl, exx, edd):
            def loss(fl):
                return jnp.sum(fused(fl, exx + c * 1e-32, edd) ** 2)
            return jax.value_and_grad(loss)(fl)

        def a_fb(c, p, xx, dd):
            def loss(p):
                return jnp.sum(apply_fn(p, xx + c * 1e-32, dd) ** 2)
            return jax.value_and_grad(loss)(p)

        t_f = timeit("kernel fwd", k_fwd, flat, ex, ed)
        t_fb = timeit("kernel fwd+bwd", k_fb, flat, ex, ed)
        t_afb = timeit("apply fwd+bwd", a_fb, params, x, d)
        mfu_f = gf_fwd / 1e3 / t_f / PEAK_TFLOPS
        mfu_fb = (gf_fwd + gf_bwd) / 1e3 / t_fb / PEAK_TFLOPS
        print(f"\n[{label} rows, grid {rows // 1024} blocks]")
        print(f"  kernel fwd      {t_f * 1e3:7.3f} ms  "
              f"{t_f / rows * 1e9:6.2f} ns/row  MFU {mfu_f:.3f}")
        print(f"  kernel fwd+bwd  {t_fb * 1e3:7.3f} ms  "
              f"{t_fb / rows * 1e9:6.2f} ns/row  MFU {mfu_fb:.3f}")
        print(f"  apply  fwd+bwd  {t_afb * 1e3:7.3f} ms  "
              f"{t_afb / rows * 1e9:6.2f} ns/row  "
              f"(glue {(t_afb - t_fb) * 1e3:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
