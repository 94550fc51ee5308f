"""Speed-of-light decomposition of the fused train MLP kernel (TPU).

The round-3 profile pinned the fused kernel at ~0.72 of MXU peak and the
remaining headroom as "kernel pipelining, not fusion". This benchmark builds
VARIANT kernels that strip or restructure the non-GEMM work to locate where
the gap actually is, in the forward and the saved-acts backward:

  fwd real      — the product forward emission (f32 accum, f32 bias+relu,
                  cast to bf16): the baseline.
  fwd bf16out   — GEMMs emit bf16 directly (MXU still accumulates f32
                  internally; rounding moves from an explicit VPU cast pass
                  to the MXU output stage); bias+relu run in bf16. Halves
                  VPU bytes and removes one full [N,256] pass per layer.
  fwd nobias    — real minus the bias adds   (costs one f32 pass/layer).
  fwd norelu    — real minus the relu        (costs one f32 pass/layer).
  fwd castfirst — cast to bf16 before the relu (bitwise identical, half
                  the max-pass bytes).
  fwd folded    — sigma folded into the connection GEMM; branch/skip
                  pairs as single concat-input GEMMs (fewer MXU fronts).
  fwd nosig     — real minus the rgb sigmoid.
  fwd fastsig   — sigmoid via exp2 exponent assembly (_sigmoid_fast).
  fwd gemm      — GEMM chain only, no bias/relu/cast anywhere: the MXU
                  floor for this chain in Mosaic as scheduled today
                  (UNRUNNABLE: Mosaic rejects bf16 matmul outputs).
  ideal         — analytic FLOPs / 197 TFLOPS (v5e bf16 peak).

Measured on v5e (run-to-run noise +-7%; all fwd variants within it):
real 0.67-0.80 ms vs ideal 0.428 (scheduling-bound); bwd real 1.23 ms vs
ideal 0.935 with the GEMM skeleton timing THE SAME (at its floor). The
sigmoid is free here (nosig == real) — unlike SIREN's sin (sol_siren.py).

  bwd real      — the product saved-acts backward.
  bwd bf16dh    — dh GEMMs emit bf16; relu mask applied to the bf16
                  cotangent (mask compare still f32 — Mosaic has no bf16
                  compare); bias grads summed from the bf16 cotangent.
                  NOTE: changes numerics (dh rounded to bf16 before the
                  where) — a probe, not automatically landable.
  bwd gemm      — dW/dh GEMM skeleton only: the backward MXU floor.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/sol_mlp.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsnerf_tpu.ops.pallas.mlp_train import (_dot_bT, _dotT_a, _expand_dout,
                                             _flat_from_prepped,
                                             _weight_names, prep_params)

N = 65536
BLOCK = 1024
SCAN = 50
PEAK_TFLOPS = 197.0  # v5e bf16


def _trunk_fwd(encx, ws, n_layers, skip, mode):
    """Forward trunk in one of the variant emissions; returns h_last."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    out_dt = bf16 if mode in ("bf16out", "gemm") else f32
    h = None
    for i in range(n_layers):
        if i > 0 and (i - 1) in skip:
            if mode == "folded":
                # one [N, 2D_in] x [2D_in, D] GEMM on the concat input
                # instead of two GEMMs + an add (t-fold built in main())
                y = jnp.dot(jnp.concatenate([h, encx], axis=1),
                            ws[f"t{i}cat"], preferred_element_type=f32)
            else:
                y = (jnp.dot(h, ws[f"t{i}a"], preferred_element_type=out_dt)
                     + jnp.dot(encx, ws[f"t{i}b"],
                               preferred_element_type=out_dt))
        elif i == 0:
            y = jnp.dot(encx, ws["t0"], preferred_element_type=out_dt)
        else:
            y = jnp.dot(h, ws[f"t{i}"], preferred_element_type=out_dt)
        if mode == "gemm":
            h = y                                    # already bf16
            continue
        if mode != "nobias":
            y = y + ws[f"b{i}"].astype(out_dt)
        if mode == "norelu":
            h = y.astype(bf16)
        elif mode == "bf16out":
            h = jnp.maximum(y, bf16(0))              # bf16 VPU pass
        elif mode in ("castfirst", "folded"):
            # cast to bf16 FIRST, relu in bf16: halves the max-pass bytes.
            # Bitwise identical to relu-then-cast (rounding preserves sign;
            # max(-0, 0) = 0), so this is landable without tolerance moves.
            h = jnp.maximum(y.astype(bf16), bf16(0))
        else:
            h = jnp.maximum(y, 0.0).astype(bf16)     # f32 pass + cast
    return h


def _heads_fwd(h, encd, ws, mode):
    f32, bf16 = jnp.float32, jnp.bfloat16
    out_dt = bf16 if mode in ("bf16out", "gemm") else f32
    if mode == "folded":
        # sigma folded into the connection GEMM: [256, 256+128] (same MXU
        # tile count as two separate GEMMs: 2+1 = 3 column tiles)
        D = ws["w_conn"].shape[1]
        y = jnp.dot(h, ws["w_connsig"], preferred_element_type=f32)
        feat = (y[:, :D] + ws["b_conn"].astype(f32)).astype(bf16)
        sigma = y[:, D:]
        br = jnp.dot(jnp.concatenate([feat, encd], axis=1), ws["w_brcat"],
                     preferred_element_type=f32)
        br = jnp.maximum((br + ws["b_branch"].astype(f32)).astype(bf16),
                         bf16(0))
        rgb = jnp.dot(br, ws["w_rgb"], preferred_element_type=f32)
        rgb = rgb + ws["b_rgb"].astype(f32)
        return jax.nn.sigmoid(rgb), sigma
    sigma = jnp.dot(h, ws["w_sigma"], preferred_element_type=out_dt)
    feat = jnp.dot(h, ws["w_conn"], preferred_element_type=out_dt)
    if mode not in ("gemm", "nobias"):
        feat = feat + ws["b_conn"].astype(out_dt)
    feat = feat.astype(bf16)
    br = (jnp.dot(feat, ws["w_branch_h"], preferred_element_type=out_dt)
          + jnp.dot(encd, ws["w_branch_d"], preferred_element_type=out_dt))
    if mode == "gemm":
        rgb = jnp.dot(br, ws["w_rgb"], preferred_element_type=out_dt)
        return rgb.astype(f32), sigma.astype(f32)
    if mode != "nobias":
        br = br + ws["b_branch"].astype(out_dt)
    if mode != "norelu":
        br = jnp.maximum(br, out_dt(0))
    br = br.astype(bf16)
    rgb = jnp.dot(br, ws["w_rgb"], preferred_element_type=out_dt)
    if mode != "nobias":
        rgb = rgb + ws["b_rgb"].astype(out_dt)
    rgb = rgb.astype(f32)
    if mode == "nosig":
        return rgb, sigma.astype(f32)
    if mode == "fastsig":
        return _sigmoid_fast(rgb), sigma.astype(f32)
    return jax.nn.sigmoid(rgb), sigma.astype(f32)


def _exp2_fast(y):
    """2^y for f32 y via exponent assembly + deg-5 minimax on the fraction.

    i = floor(y), f = y - i in [0,1); 2^i assembled by integer bit ops,
    2^f by polynomial. Valid for y in (-120, 120)."""
    f32 = jnp.float32
    i = jnp.floor(y)
    f = y - i
    p = (f32(0.9999999702) + f * (f32(0.6931530732)
         + f * (f32(0.2401536059) + f * (f32(0.0558263172)
         + f * (f32(0.0089893402) + f * f32(0.0018775767))))))
    scale = jax.lax.bitcast_convert_type(
        ((i.astype(jnp.int32) + 127) << 23), jnp.float32)
    return p * scale


def _sigmoid_fast(x):
    """sigmoid(x) = 1 / (1 + 2^(-x * log2 e)) via _exp2_fast."""
    e = _exp2_fast(jnp.clip(x, -88.0, 88.0) * jnp.float32(-1.4426950408889634))
    return 1.0 / (1.0 + e)


def make_fwd_variant(n_layers, skip, names, mode):
    def kern(*refs):
        encx, encd = refs[0][:], refs[1][:]
        ws = {n: refs[2 + i][:] for i, n in enumerate(names)}
        out_ref = refs[2 + len(names)]
        h = _trunk_fwd(encx, ws, n_layers, skip, mode)
        rgb, sigma = _heads_fwd(h, encd, ws, mode)
        out_ref[:, 0:3] = rgb[:, 0:3]
        out_ref[:, 3:4] = sigma[:, 0:1]

    def call(flat, encx, encd):
        n = encx.shape[0]

        def row_spec(cols):
            return pl.BlockSpec((BLOCK, cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            kern, grid=(n // BLOCK,),
            in_specs=[row_spec(encx.shape[1]), row_spec(encd.shape[1]),
                      *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]],
            out_specs=row_spec(4),
            out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        )(encx, encd, *flat)

    return call


def make_bwd_variant(n_layers, skip, names, mode):
    """Saved-acts backward variants. acts layout = [N, n_layers*D] bf16."""
    f32, bf16 = jnp.float32, jnp.bfloat16

    def kern(*refs):
        encx_ref, encd_ref, dout_ref, acts_ref = refs[:4]
        ws = {n: refs[4 + i][:] for i, n in enumerate(names)}
        douts = {n: refs[4 + len(names) + i] for i, n in enumerate(names)}

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for n in names:
                douts[n][:] = jnp.zeros_like(douts[n])

        encx, encd = encx_ref[:], encd_ref[:]
        D = ws["w_conn"].shape[0]
        h = [acts_ref[:, i * D:(i + 1) * D] for i in range(n_layers)]
        # head recompute (shared by all variants, as the product does)
        feat = (jnp.dot(h[-1], ws["w_conn"], preferred_element_type=f32)
                + ws["b_conn"].astype(f32)).astype(bf16)
        br_pre = (jnp.dot(feat, ws["w_branch_h"], preferred_element_type=f32)
                  + jnp.dot(encd, ws["w_branch_d"], preferred_element_type=f32)
                  + ws["b_branch"].astype(f32))
        br = jnp.maximum(br_pre, 0.0).astype(bf16)
        rgb = jax.nn.sigmoid(
            jnp.dot(br, ws["w_rgb"], preferred_element_type=f32)
            + ws["b_rgb"].astype(f32))

        dout = _expand_dout(dout_ref[:])
        lanes = jax.lax.broadcasted_iota(jnp.int32, dout.shape, 1)

        if mode == "gemm":
            # GEMM skeleton: no masks, no bias sums, no sigmoid backward
            d = dout.astype(bf16)
            douts["w_rgb"][:] += _dotT_a(br, d)
            dbr = _dot_bT(d, ws["w_rgb"]).astype(bf16)
            douts["w_branch_h"][:] += _dotT_a(feat, dbr)
            douts["w_branch_d"][:] += _dotT_a(encd, dbr)
            dfeat = _dot_bT(dbr, ws["w_branch_h"]).astype(bf16)
            douts["w_conn"][:] += _dotT_a(h[-1], dfeat)
            douts["w_sigma"][:] += _dotT_a(h[-1], d)
            dh = (_dot_bT(dfeat, ws["w_conn"])
                  + _dot_bT(d, ws["w_sigma"])).astype(bf16)
            for i in range(n_layers - 1, -1, -1):
                h_prev = encx if i == 0 else h[i - 1]
                if i > 0 and (i - 1) in skip:
                    douts[f"t{i}a"][:] += _dotT_a(h_prev, dh)
                    douts[f"t{i}b"][:] += _dotT_a(encx, dh)
                    dh = _dot_bT(dh, ws[f"t{i}a"]).astype(bf16)
                elif i == 0:
                    douts["t0"][:] += _dotT_a(encx, dh)
                else:
                    douts[f"t{i}"][:] += _dotT_a(h_prev, dh)
                    dh = _dot_bT(dh, ws[f"t{i}"]).astype(bf16)
            return

        bf16_dh = mode == "bf16dh"
        acc_dt = bf16 if bf16_dh else f32

        def bias_grad(name, d_f32orb16):
            douts[name][:] += jnp.sum(d_f32orb16.astype(f32), axis=0,
                                      keepdims=True)

        drgb_pre = jnp.where(lanes < 3, dout * rgb * (1.0 - rgb), 0.0)
        drgb_b = drgb_pre.astype(bf16)
        douts["w_rgb"][:] += _dotT_a(br, drgb_b)
        bias_grad("b_rgb", drgb_pre)

        dbr = _dot_bT(drgb_b, ws["w_rgb"])
        dbr = jnp.where(br.astype(f32) > 0, dbr, 0.0)
        dbr_b = dbr.astype(bf16)
        douts["w_branch_h"][:] += _dotT_a(feat, dbr_b)
        douts["w_branch_d"][:] += _dotT_a(encd, dbr_b)
        bias_grad("b_branch", dbr)

        dfeat = _dot_bT(dbr_b, ws["w_branch_h"])
        dfeat_b = dfeat.astype(bf16)
        douts["w_conn"][:] += _dotT_a(h[-1], dfeat_b)
        bias_grad("b_conn", dfeat)

        dsig_pad = jnp.where(lanes == 0,
                             pltpu.roll(dout, dout.shape[1] - 3, 1), 0.0)
        dsig_b = dsig_pad.astype(bf16)
        douts["w_sigma"][:] += _dotT_a(h[-1], dsig_b)
        bias_grad("b_sigma", dsig_pad)

        dh = (_dot_bT(dfeat_b, ws["w_conn"])
              + _dot_bT(dsig_b, ws["w_sigma"])).astype(acc_dt)
        for i in range(n_layers - 1, -1, -1):
            mask = h[i].astype(f32) > 0
            dh = jnp.where(mask, dh, acc_dt(0))
            h_prev = encx if i == 0 else h[i - 1]
            dh_b = dh.astype(bf16)
            if i > 0 and (i - 1) in skip:
                douts[f"t{i}a"][:] += _dotT_a(h_prev, dh_b)
                douts[f"t{i}b"][:] += _dotT_a(encx, dh_b)
                bias_grad(f"b{i}", dh)
                dh = _dot_bT(dh_b, ws[f"t{i}a"]).astype(acc_dt)
            elif i == 0:
                douts["t0"][:] += _dotT_a(encx, dh_b)
                bias_grad("b0", dh)
            else:
                douts[f"t{i}"][:] += _dotT_a(h_prev, dh_b)
                bias_grad(f"b{i}", dh)
                dh = _dot_bT(dh_b, ws[f"t{i}"]).astype(acc_dt)

    def call(flat, encx, encd, acts, dout16):
        n = encx.shape[0]

        def row_spec(cols):
            return pl.BlockSpec((BLOCK, cols), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat]
        dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM) for w in flat]
        return pl.pallas_call(
            kern, grid=(n // BLOCK,),
            in_specs=[row_spec(encx.shape[1]), row_spec(encd.shape[1]),
                      row_spec(16), row_spec(acts.shape[1]),
                      *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]],
            out_specs=tuple(dw_specs),
            out_shape=tuple(dw_shapes),
        )(encx, encd, dout16, acts, *flat)

    return call


def analytic_gflops(pr, n_layers, skip):
    """Executed MACs from the padded operand shapes."""
    macs = 0
    flat = _flat_from_prepped(pr)
    names = _weight_names(n_layers, skip)
    for n, w in zip(names, flat):
        if w.ndim == 2 and w.shape[0] > 1:          # weight, not bias
            macs += w.shape[0] * w.shape[1]
    return 2.0 * macs * N / 1e9


def main():
    from fsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from fsnerf_tpu.config import Config
    from fsnerf_tpu.core.models import init_params, make_model

    cfg = Config()
    n_layers, skip = cfg.model.n_layers, tuple(cfg.model.skip)
    model = make_model(cfg)
    params = init_params(model, jax.random.key(0))
    pr = prep_params(params, n_layers=n_layers, skip=skip)
    flat = tuple(_flat_from_prepped(pr))
    names = _weight_names(n_layers, skip)

    rng = np.random.default_rng(0)
    ex = jnp.asarray(rng.normal(size=(N, pr["d_enc_pad"])), jnp.bfloat16)
    ed = jnp.asarray(rng.normal(size=(N, pr["d_dir_pad"])), jnp.bfloat16)
    D = pr["w_conn"].shape[0]
    acts = jnp.asarray(rng.normal(size=(N, n_layers * D)), jnp.bfloat16)
    dout16 = jnp.pad(jnp.asarray(rng.normal(size=(N, 4)), jnp.float32),
                     ((0, 0), (0, 12)))

    gf_fwd = analytic_gflops(pr, n_layers, skip)
    # bwd executed GEMM FLOPs ~= 2x fwd (dW + dh per weight) + head recompute
    head_macs = sum(w.shape[0] * w.shape[1] for nm, w in zip(names, flat)
                    if nm in ("w_conn", "w_branch_h", "w_branch_d", "w_rgb"))
    gf_bwd = 2 * gf_fwd + 2.0 * head_macs * N / 1e9
    print(f"analytic: fwd {gf_fwd:.1f} GFLOP -> ideal "
          f"{gf_fwd / PEAK_TFLOPS:.3f} ms; bwd {gf_bwd:.1f} GFLOP -> ideal "
          f"{gf_bwd / PEAK_TFLOPS:.3f} ms  (N={N}, block={BLOCK})",
          flush=True)

    def timeit(tag, fn, *arrays):
        # arrays ride the jit boundary as ARGUMENTS (closed-over arrays
        # become HLO constants — the 256 MB acts blows the axon remote-
        # compile payload limit); fn(s, *arrays) must CONSUME the carry
        # scalar s (input perturbation), else XLA hoists the loop-invariant
        # kernel call out of the scan
        @jax.jit
        def looped(*arrs):
            return jax.lax.scan(
                lambda c, i: ((jnp.asarray(fn(c, *arrs)[0]).ravel()[0]
                               * 1e-20).astype(jnp.float32), None),
                jnp.float32(0.0), jnp.arange(SCAN))[0]

        try:
            # jax.block_until_ready is FLAKY through the axon tunnel (it
            # sometimes returns before completion — measured 2026-08-18);
            # every timed window must END with a real value fetch. The
            # scalar fetch RTT (~1-5 ms) amortizes over 3*SCAN iterations.
            float(np.asarray(looped(*arrays)))          # warm + drain
            t0 = time.perf_counter()
            for _ in range(3):
                out = looped(*arrays)
            carry = float(np.asarray(out))              # completion fence
            dt = (time.perf_counter() - t0) / 3 / SCAN
            print(f"{tag:>14}: {dt * 1e3:7.3f} ms   (carry {carry:.3e})",
                  flush=True)
            return dt
        except Exception as e:
            print(f"{tag:>14}: FAILED ({type(e).__name__}: {e})"[:200],
                  flush=True)
            return None

    # folded operands: sigma into the connection GEMM; branch/skip pairs as
    # single GEMMs over concat inputs (same MXU tile counts, fewer fronts)
    byname = dict(zip(names, flat))
    folded_extra = {
        "w_connsig": jnp.concatenate([byname["w_conn"], byname["w_sigma"]],
                                     axis=1),
        "w_brcat": jnp.concatenate([byname["w_branch_h"],
                                    byname["w_branch_d"]], axis=0),
    }
    for i in range(1, n_layers):
        if (i - 1) in skip:
            folded_extra[f"t{i}cat"] = jnp.concatenate(
                [byname[f"t{i}a"], byname[f"t{i}b"]], axis=0)
    folded_names = names + list(folded_extra)
    folded_flat = flat + tuple(folded_extra.values())

    # bf16-output matmuls are rejected by Mosaic ('tpu.matmul' expects an
    # f32 accumulator result) — bf16out/gemm fwd modes are unrunnable; the
    # nobias/norelu probes already isolate the VPU cost.
    for mode in ("real", "nobias", "norelu", "castfirst", "folded",
                 "nosig", "fastsig"):
        use_names = folded_names if mode == "folded" else names
        use_flat = folded_flat if mode == "folded" else flat
        fn = make_fwd_variant(n_layers, skip, use_names, mode)
        timeit(f"fwd {mode}",
               lambda s, ex_, ed_, *fl, f=fn: (
                   f(fl, ex_ + (s * 1e-8).astype(jnp.bfloat16), ed_),),
               ex, ed, *use_flat)

    # bf16dh crashes the Mosaic compiler (tpu_compile_helper exit 1) —
    # kept in the sweep so the FAILED line documents it per toolchain
    for mode in ("real", "bf16dh", "gemm"):
        fn = make_bwd_variant(n_layers, skip, names, mode)
        timeit(f"bwd {mode}",
               lambda s, ex_, ed_, acts_, do_, *fl, f=fn: f(
                   fl, ex_ + (s * 1e-8).astype(jnp.bfloat16), ed_, acts_,
                   do_),
               ex, ed, acts, dout16, *flat)


if __name__ == "__main__":
    main()
