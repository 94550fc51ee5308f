"""Decompose the fused-MLP glue (apply - kernel) at hierarchical shapes.

sol_hier_kernel.py pinned the hierarchical "kernel MFU gap" entirely on
glue: the raw kernel runs 0.77-0.78 MFU fwd+bwd at EVERY grid length, while
make_fused_train_model_fn's apply adds 0.38 ms (64 blocks) / 0.73 ms
(128 blocks) per call — and the hierarchical step pays it twice (coarse +
fine) ≈ 15% of the 7.08 ms step. This times the glue's constituents in
isolation so the fix targets the real cost:

  enc        positional encoding fwd (x 10 bands + dirs 4 bands), f32
  encpad     encoding + bf16 cast + zero-pad to kernel operand layout
             (the full input-prep path the apply runs per call)
  prep_fwd   prep_params: param tree -> padded bf16 flat operands
  prep_fb    prep_params fwd + XLA-transposed bwd (flat cotangents ->
             param tree) — the per-call cost value_and_grad pays
  wide_pad   the [rows] -> [n_pad] row pad alone (alloc + copy)

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sol_hier_glue.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

SCAN = 50


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import Config
    from fsnerf_tpu.core.encoding import positional_encoding
    from fsnerf_tpu.core.models import init_params, make_model
    from fsnerf_tpu.ops.pallas.mlp_train import (_flat_from_prepped,
                                                 prep_params)

    cfg = Config()
    n_layers, skip = cfg.model.n_layers, tuple(cfg.model.skip)
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0))
    pr = prep_params(params, n_layers=n_layers, skip=skip)
    flat_ex = tuple(_flat_from_prepped(pr))
    d_enc_pad, d_dir_pad = pr["d_enc_pad"], pr["d_dir_pad"]
    nf, nfd = cfg.encoder.n_freqs, cfg.encoder.n_freqs_views

    def timeit(fn, *arrays):
        @jax.jit
        def looped(*arrs):
            def body(c, i):
                out = fn(c, *arrs)
                s = sum(jnp.asarray(l).ravel()[0].astype(jnp.float32)
                        for l in jax.tree.leaves(out))
                return jnp.where(jnp.isfinite(s), s, 0.0) * 1e-20, None
            return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(SCAN))[0]

        float(np.asarray(looped(*arrays)))
        t0 = time.perf_counter()
        for _ in range(3):
            out = looped(*arrays)
        float(np.asarray(out))
        return (time.perf_counter() - t0) / 3 / SCAN

    rng = np.random.default_rng(0)
    B = 1024

    def enc(c, x, d):
        ex = positional_encoding(x.reshape(-1, 3) + c * 1e-32, nf, True)
        ed = positional_encoding(d.reshape(-1, 3), nfd, True)
        return (ex[0, 0] + ed[0, 0],)

    def encpad(c, x, d):
        encx = positional_encoding(x.reshape(-1, 3) + c * 1e-32, nf, True)
        encd = positional_encoding(d.reshape(-1, 3), nfd, True)
        n = encx.shape[0]
        ex = jnp.zeros((n, d_enc_pad), jnp.bfloat16)
        ex = ex.at[:, : encx.shape[1]].set(encx.astype(jnp.bfloat16))
        ed = jnp.zeros((n, d_dir_pad), jnp.bfloat16)
        ed = ed.at[:, : encd.shape[1]].set(encd.astype(jnp.bfloat16))
        return (ex[0, 0] + ed[0, 0],)

    def prep_fwd(c, p):
        p = jax.tree.map(lambda a: a + c * 1e-32, p)
        fl = tuple(_flat_from_prepped(
            prep_params(p, n_layers=n_layers, skip=skip)))
        return (sum(w.ravel()[0].astype(jnp.float32) for w in fl),)

    def prep_fb(c, p):
        def loss(p):
            fl = _flat_from_prepped(
                prep_params(p, n_layers=n_layers, skip=skip))
            return sum(jnp.sum(w.astype(jnp.float32) ** 2) for w in fl) \
                + c * 1e-32
        return jax.value_and_grad(loss)(p)

    print(f"prep_fwd  {timeit(prep_fwd, params) * 1e3:7.3f} ms")
    print(f"prep_fb   {timeit(prep_fb, params) * 1e3:7.3f} ms", flush=True)

    for rows, label in ((64 * B, "coarse 65,536"), (128 * B, "fine 131,072")):
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, rows // B, 3)),
                        jnp.float32)
        d = jnp.broadcast_to(
            jnp.asarray(rng.normal(size=(B, 1, 3)), jnp.float32), x.shape)
        ex32 = jnp.asarray(rng.normal(size=(rows, 63)), jnp.float32)

        def wide_pad(c, e):
            out = jnp.zeros((rows, d_enc_pad), jnp.bfloat16)
            out = out.at[:, :63].set((e + c * 1e-32).astype(jnp.bfloat16))
            return (out[0, 0],)

        t_e = timeit(enc, x, d)
        t_ep = timeit(encpad, x, d)
        t_wp = timeit(wide_pad, ex32)
        print(f"\n[{label} rows]")
        print(f"  enc (x+d fwd)   {t_e * 1e3:7.3f} ms")
        print(f"  enc+cast+pad    {t_ep * 1e3:7.3f} ms")
        print(f"  row-pad alone   {t_wp * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
