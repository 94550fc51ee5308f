"""Trainable fused NeRF-MLP: custom-VJP Pallas forward + backward kernels.

Extends ops/pallas/mlp.py to the training path. The backward kernel
RECOMPUTES the forward activations per row-block in VMEM (no activation HBM
traffic at all — the measured XLA backward is bandwidth-bound at ~35% MFU)
and accumulates weight/bias gradients across grid steps in VMEM-resident
output blocks (constant index_map -> Mosaic keeps the block resident;
program 0 zero-initializes it).

Gradient layout mirrors prep_params' padded operands; jax autodiff maps the
padded grads back to the original flax params through the (differentiable)
padding in prep_params, so `fused_mlp_train` drops into the existing loss
with no optimizer changes. Input (encoding) gradients are not computed —
ray positions/directions carry no parameters (occgrid training path).

Equivalence (values AND grads) vs core.models.NeRF is tested in
tests/test_pallas.py; enable in training via ModelConfig.fused_kernel once
validated on hardware.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsnerf_tpu.ops.pallas.fastmath import _sincos_fast
from fsnerf_tpu.ops.pallas.mlp import (_round_up,  # noqa: F401
                                       encode_lane_operand, prep_params)


# Backward-kernel bias grads as ones-vector MXU contractions instead of VPU
# cross-sublane reductions. MEASURED WORSE on v5e (-3.5% occgrid / -3.3%
# hierarchical, benchmarks/ab_bias_grads.py): Mosaic already overlaps the
# VPU reductions with the dW/dh GEMMs, and the skinny [bN,1]x[bN,256]
# ones-GEMMs serialize extra MXU fronts instead — the mirror image of the
# round-2 "VPU lane-reduce heads" dead end (docs/ROADMAP.md). Kept as a
# switch for other TPU generations.
MXU_BIAS_GRADS = False


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _lcm(a: int, b: int) -> int:
    import math
    return a * b // math.gcd(a, b)


def _split_rows(x, j):
    """Static row split into j independent sub-blocks (interleaving unit)."""
    if j == 1:
        return [x]
    sub = x.shape[0] // j
    return [x[i * sub:(i + 1) * sub] for i in range(j)]


def _heads_compute(h_lasts, encds, ws):
    """Head stack from the last trunk activation: (feats, brs, rgbs).

    All row operands are LISTS of independent sub-blocks; each compute step
    is emitted for every sub-block before the next step, so Mosaic can
    overlap one sub-block's VPU tail (bias+relu+cast) with the next
    sub-block's MXU GEMM (len==1 reproduces the single-chain emission).

    Shared by the forward pass and the saved-activations backward, which
    recomputes ONLY the heads (3 small GEMMs, ~0.2 MFLOP/sample) from the
    HBM-saved trunk chain instead of re-running the whole trunk (~1.0
    MFLOP/sample)."""
    f32 = jnp.float32
    feats = [(jnp.dot(h, ws["w_conn"], preferred_element_type=f32)
              + ws["b_conn"].astype(f32)).astype(jnp.bfloat16)
             for h in h_lasts]
    br_pres = [(jnp.dot(f, ws["w_branch_h"], preferred_element_type=f32)
                + jnp.dot(e, ws["w_branch_d"], preferred_element_type=f32)
                + ws["b_branch"].astype(f32))
               for f, e in zip(feats, encds)]
    brs = [jnp.maximum(b, 0.0).astype(jnp.bfloat16) for b in br_pres]
    rgb_pres = [(jnp.dot(b, ws["w_rgb"], preferred_element_type=f32)
                 + ws["b_rgb"].astype(f32)) for b in brs]
    return feats, brs, [_sigmoid(r) for r in rgb_pres]


def _fwd_compute(encxs, encds, ws, n_layers, skip, save=False):
    """Forward math shared by fwd kernel and bwd recompute.

    ws: dict of weight VALUES (already read from refs). encxs/encds: lists
    of row sub-blocks (see _heads_compute).
    Returns (rgbs, sigmas, saved) — lists over sub-blocks; saved["h"][i] is
    the layer-i activation list.
    """
    f32 = jnp.float32
    J = len(encxs)
    saved = {"h": []}
    hs = [None] * J
    for i in range(n_layers):
        if i > 0 and (i - 1) in skip:
            w_h, w_e = ws[f"t{i}a"], ws[f"t{i}b"]
            ys = [jnp.dot(hs[j], w_h, preferred_element_type=f32)
                  + jnp.dot(encxs[j], w_e, preferred_element_type=f32)
                  for j in range(J)]
        elif i == 0:
            ys = [jnp.dot(e, ws["t0"], preferred_element_type=f32)
                  for e in encxs]
        else:
            ys = [jnp.dot(h, ws[f"t{i}"], preferred_element_type=f32)
                  for h in hs]
        ys = [y + ws[f"b{i}"].astype(f32) for y in ys]
        hs = [jnp.maximum(y, 0.0).astype(jnp.bfloat16) for y in ys]
        if save:
            saved["h"].append(list(hs))         # relu mask == h > 0
    sigmas = [jnp.dot(h, ws["w_sigma"], preferred_element_type=f32)
              + ws["b_sigma"].astype(f32) for h in hs]
    feats, brs, rgbs = _heads_compute(hs, encds, ws)
    if save:
        saved.update(feat=feats, br=brs, rgb=rgbs)  # relu mask == br > 0
    return rgbs, sigmas, saved


def _weight_names(n_layers, skip):
    names = []
    for i in range(n_layers):
        if i > 0 and (i - 1) in skip:
            names += [f"t{i}a", f"t{i}b"]
        elif i == 0:
            names += ["t0"]
        else:
            names += [f"t{i}"]
        names += [f"b{i}"]
    names += ["w_sigma", "b_sigma", "w_conn", "b_conn",
              "w_branch_h", "w_branch_d", "b_branch", "w_rgb", "b_rgb"]
    return names


def _flat_from_prepped(prepped):
    flat = []
    for i, layer in enumerate(prepped["trunk_w"]):
        if isinstance(layer, tuple):
            flat += [layer[0], layer[1], prepped["trunk_b"][i]]
        else:
            flat += [layer, prepped["trunk_b"][i]]
    flat += [prepped["w_sigma"], prepped["b_sigma"], prepped["w_conn"],
             prepped["b_conn"], prepped["w_branch_h"],
             prepped["w_branch_d"], prepped["b_branch"],
             prepped["w_rgb"], prepped["b_rgb"]]
    return flat


def _encode_block(v16, consts):
    """In-kernel positional encoding in the periodic-4 lane layout.

    v16: [bN, 16] f32 — FOUR tiled copies of [v0, v1, v2, 0], so after
    concatenating to [bN, L] every lane holds v[lane % 4] (lane % 4 == 3
    and pad groups are zeroed by the mask row). consts: the packed [3, L]
    f32 lane-constant operand (freq / phase / validity*FreeNeRF-mask rows,
    ops/pallas/mlp.py::encode_lane_operand). Layout and weight-row
    permutation parity: ops/pallas/mlp.py::encode_lane_consts.

    sin/cos run through _sincos_fast (Mosaic's jnp.sin lowering is ~10x
    slower); cos lanes fold into the SAME sin evaluation via the per-lane
    +pi/2 phase row, and identity lanes select raw pass-through on
    freq == 0 — ALL group logic rides the [1, L] constant rows, so no
    [bN, L] iota/compare temporaries hit the kernel's scoped-VMEM stack
    (the saved-acts backward at 1024-row blocks sits ~0.8 MB from the
    16 MB limit). Numerics: the poly's <= 9e-5 abs error plus <= ~1.2e-4
    phase rounding at the largest arguments (f32 add of pi/2 to
    |2^(F-1) x| ~ 2k) both vanish under the bf16 cast here — the SAME
    argument as the SIREN kernels, quality-validated at full scale in
    BASELINE.md (quality_fastsin)."""
    L = consts.shape[1]
    freq, phase, mask = consts[0:1, :], consts[1:2, :], consts[2:3, :]
    xg = jnp.concatenate([v16] * (L // 16), axis=1)           # [bN, L]
    s, _ = _sincos_fast(xg * freq + phase, want_sin=True)
    enc = jnp.where(freq == jnp.float32(0), xg, s)
    return (enc * mask).astype(jnp.bfloat16)


def _input_encs(refs, encode, interleave):
    """Consume the leading input refs: (encx, encd) pre-encoded operands,
    or (x16, d16, consts_x, consts_d) with in-kernel encoding. Returns
    (encxs, encds, n_consumed) — encodings as interleave-split row
    sub-block lists."""
    if encode is None:
        return (_split_rows(refs[0][:], interleave),
                _split_rows(refs[1][:], interleave), 2)
    encx = _encode_block(refs[0][:], refs[2][:])
    encd = _encode_block(refs[1][:], refs[3][:])
    return _split_rows(encx, interleave), _split_rows(encd, interleave), 4


def _fwd_kernel(n_layers, skip, names, interleave, encode, *refs):
    encxs, encds, k = _input_encs(refs, encode, interleave)
    ws = {n: refs[k + i][:] for i, n in enumerate(names)}
    out_ref = refs[k + len(names)]
    rgbs, sigmas, _ = _fwd_compute(encxs, encds, ws, n_layers, skip)
    sub = out_ref.shape[0] // interleave
    for j in range(interleave):
        out_ref[j * sub:(j + 1) * sub, 0:3] = rgbs[j][:, 0:3]
        out_ref[j * sub:(j + 1) * sub, 3:4] = sigmas[j][:, 0:1]


def _expand_dout(dout16):
    """[bN, 16] f32 -> [bN, 128]: tile the 16 cotangent lanes 8x.

    The upstream cotangent is only 4 real lanes (d rgb in 0..2, d sigma in
    3); shipping it to the kernel padded to 128 f32 lanes costs ~16x the
    HBM traffic of the real data (pad write + kernel read — ~58 MB/step at
    the bench workload). Instead the host side pads to 16 lanes and the
    kernel tiles to 128 here (one VPU pass); every consumer masks by lane
    (lane < 3 / lane == 0 after roll), and lanes 4..15 are zero from the
    pad, so the tiled copies at lanes >= 16 are masked off identically."""
    return jnp.concatenate([dout16] * 8, axis=1)


def _dotT_a(a, b):
    """a^T @ b without a transpose op: contract row dims. [N,I]x[N,J]->[I,J]."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_bT(a, w):
    """a @ w^T without a transpose op: contract col dims. [N,J]x[I,J]->[N,I]."""
    return jax.lax.dot_general(a, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bwd_grads(n_layers, skip, names, ws, douts, encxs, encds, dout_bs, sv):
    """Gradient math shared by the recompute and saved-activation backward
    kernels: accumulate weight/bias grads into `douts` from the activations
    in `sv` (keys: h list-of-lists, feat, br, rgb — lists over row
    sub-blocks, see _heads_compute) and the upstream cotangent sub-blocks
    `dout_bs` ([BN/J, 128] f32, tiled from 16 real lanes by _expand_dout:
    lanes 0..2 = d rgb, lane 3 = d sigma, every other lane masked off by
    the per-consumer lane tests below)."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    J = len(encxs)

    def acc(name, parts):
        g = parts[0]
        for p in parts[1:]:
            g = g + p
        douts[name][:] += g

    if MXU_BIAS_GRADS:
        # bias grads as ones-vector MXU contractions on the bf16 cotangents
        # (already cast for the dW GEMMs) instead of VPU cross-sublane
        # reductions — the backward's VPU work (relu masks, casts, bias
        # sums) is on the critical path between dependent GEMMs, the MXU
        # has idle fronts. Numerics: bias grads see the same bf16 rounding
        # as the weight grads (elementwise f32->bf16 pre-sum; f32 MXU
        # accumulation).
        ones = [jnp.ones((d.shape[0], 1), bf16) for d in dout_bs]

        def bias_grad(ds_f32, ds_b16):
            return [_dotT_a(o, d) for o, d in zip(ones, ds_b16)]
    else:
        def bias_grad(ds_f32, ds_b16):
            return [jnp.sum(d, axis=0, keepdims=True) for d in ds_f32]

    lanes = [jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) for d in dout_bs]

    # rgb head: sigmoid backward in lanes 0..2 (rgb's padded cols are
    # sigmoid(bias_pad)=0.5 but masked out here)
    drgb_pres = [jnp.where(l < 3, d * r * (1.0 - r), 0.0)
                 for l, d, r in zip(lanes, dout_bs, sv["rgb"])]
    drgb_b = [d.astype(bf16) for d in drgb_pres]
    acc("w_rgb", [_dotT_a(b, d) for b, d in zip(sv["br"], drgb_b)])
    acc("b_rgb", bias_grad(drgb_pres, drgb_b))

    dbrs = [_dot_bT(d, ws["w_rgb"]) for d in drgb_b]
    # relu' (f32 cmp: Mosaic lacks bf16 compare)
    dbrs = [jnp.where(b.astype(f32) > 0, d, 0.0)
            for b, d in zip(sv["br"], dbrs)]
    dbrs_b = [d.astype(bf16) for d in dbrs]
    acc("w_branch_h", [_dotT_a(f, d) for f, d in zip(sv["feat"], dbrs_b)])
    acc("w_branch_d", [_dotT_a(e, d) for e, d in zip(encds, dbrs_b)])
    acc("b_branch", bias_grad(dbrs, dbrs_b))

    dfeats = [_dot_bT(d, ws["w_branch_h"]) for d in dbrs_b]
    dfeats_b = [d.astype(bf16) for d in dfeats]
    h_lasts = sv["h"][-1]
    acc("w_conn", [_dotT_a(h, d) for h, d in zip(h_lasts, dfeats_b)])
    acc("b_conn", bias_grad(dfeats, dfeats_b))

    # sigma head: move d sigma from lane 3 to lane 0 (w_sigma's real column);
    # roll takes non-negative shifts, so rotate by width-3 instead of -3
    dsig_pads = [jnp.where(l == 0, pltpu.roll(d, d.shape[1] - 3, 1), 0.0)
                 for l, d in zip(lanes, dout_bs)]
    dsig_b = [d.astype(bf16) for d in dsig_pads]
    acc("w_sigma", [_dotT_a(h, d) for h, d in zip(h_lasts, dsig_b)])
    acc("b_sigma", bias_grad(dsig_pads, dsig_b))

    dhs = [_dot_bT(df, ws["w_conn"]) + _dot_bT(ds, ws["w_sigma"])
           for df, ds in zip(dfeats_b, dsig_b)]

    # trunk backward
    for i in range(n_layers - 1, -1, -1):
        dhs = [jnp.where(h.astype(f32) > 0, d, 0.0)                 # relu'
               for h, d in zip(sv["h"][i], dhs)]
        h_prevs = encxs if i == 0 else sv["h"][i - 1]
        dhs_b = [d.astype(bf16) for d in dhs]
        if i > 0 and (i - 1) in skip:
            acc(f"t{i}a", [_dotT_a(h, d) for h, d in zip(h_prevs, dhs_b)])
            acc(f"t{i}b", [_dotT_a(e, d) for e, d in zip(encxs, dhs_b)])
            acc(f"b{i}", bias_grad(dhs, dhs_b))
            dhs = [_dot_bT(d, ws[f"t{i}a"]) for d in dhs_b]
        elif i == 0:
            acc("t0", [_dotT_a(e, d) for e, d in zip(encxs, dhs_b)])
            acc("b0", bias_grad(dhs, dhs_b))
        else:
            acc(f"t{i}", [_dotT_a(h, d) for h, d in zip(h_prevs, dhs_b)])
            acc(f"b{i}", bias_grad(dhs, dhs_b))
            dhs = [_dot_bT(d, ws[f"t{i}"]) for d in dhs_b]


def _bwd_kernel(n_layers, skip, names, interleave, encode, *refs):
    """Recompute backward: refs = (<inputs>, dout16, *weights,
    *dweight_outs). The whole forward is re-run per row-block in VMEM (zero
    activation HBM traffic); in encode mode the positional encoding is
    recomputed too (identical ops/dtypes as the forward -> identical bf16
    features -> gradients stay bitwise-equal to precomputed-enc operands)."""
    encxs, encds, k = _input_encs(refs, encode, interleave)
    dout_ref = refs[k]
    ws = {n: refs[k + 1 + i][:] for i, n in enumerate(names)}
    douts = {n: refs[k + 1 + len(names) + i] for i, n in enumerate(names)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for n in names:
            douts[n][:] = jnp.zeros_like(douts[n])

    _, _, sv = _fwd_compute(encxs, encds, ws, n_layers, skip, save=True)
    _bwd_grads(n_layers, skip, names, ws, douts, encxs, encds,
               _split_rows(_expand_dout(dout_ref[:]), interleave), sv)


def _fwd_kernel_save(n_layers, skip, names, interleave, saved_layers,
                     encode, *refs):
    """Forward kernel that ALSO streams trunk activations to HBM
    (acts_ref [BN, len(saved_layers)*D] bf16) for the saved-activations
    backward. saved_layers selects WHICH layers stream (acts_stride>1
    halves/quarters the HBM traffic; the backward regenerates the gaps,
    see _reconstruct_h)."""
    encxs, encds, k = _input_encs(refs, encode, interleave)
    ws = {n: refs[k + i][:] for i, n in enumerate(names)}
    out_ref, acts_ref = refs[k + len(names)], refs[k + 1 + len(names)]
    rgbs, sigmas, sv = _fwd_compute(encxs, encds, ws, n_layers, skip,
                                    save=True)
    D = ws["w_conn"].shape[0]
    sub = out_ref.shape[0] // interleave
    for s, i in enumerate(saved_layers):
        for j in range(interleave):
            acts_ref[j * sub:(j + 1) * sub, s * D:(s + 1) * D] = sv["h"][i][j]
    for j in range(interleave):
        out_ref[j * sub:(j + 1) * sub, 0:3] = rgbs[j][:, 0:3]
        out_ref[j * sub:(j + 1) * sub, 3:4] = sigmas[j][:, 0:1]


def _reconstruct_h(encxs, acts_s, ws, n_layers, skip, saved_layers, D):
    """Rebuild the full trunk chain (list over layers of lists over row
    sub-blocks) from the HBM-saved subset.

    Unsaved layer i is regenerated exactly as the forward computed it (same
    ops, same dtypes -> bitwise-identical h, so gradients stay identical to
    the stride-1 save): one GEMM from the previous layer's (saved or
    already-regenerated) activation, trading acts HBM stream for trunk GEMMs
    (measured a dead end on v5e — see make_fused_train_mlp)."""
    f32 = jnp.float32
    slot = {i: s for s, i in enumerate(saved_layers)}
    J = len(encxs)
    h = []
    for i in range(n_layers):
        if i in slot:
            s = slot[i]
            h.append([a[:, s * D:(s + 1) * D] for a in acts_s])
            continue
        prevs = encxs if i == 0 else h[i - 1]
        if i > 0 and (i - 1) in skip:
            ys = [jnp.dot(prevs[j], ws[f"t{i}a"], preferred_element_type=f32)
                  + jnp.dot(encxs[j], ws[f"t{i}b"], preferred_element_type=f32)
                  for j in range(J)]
        elif i == 0:
            ys = [jnp.dot(e, ws["t0"], preferred_element_type=f32)
                  for e in encxs]
        else:
            ys = [jnp.dot(p, ws[f"t{i}"], preferred_element_type=f32)
                  for p in prevs]
        ys = [y + ws[f"b{i}"].astype(f32) for y in ys]
        h.append([jnp.maximum(y, 0.0).astype(jnp.bfloat16) for y in ys])
    return h


def _bwd_kernel_saved(n_layers, skip, names, interleave, saved_layers,
                      encode, *refs):
    """Saved-activations backward: refs = (<inputs>, dout16, acts,
    *weights, *dweight_outs). Reads the trunk chain saved by
    _fwd_kernel_save (regenerating acts_stride gaps, _reconstruct_h) and
    recomputes only the head stack (~0.2 vs ~1.0 MFLOP/sample) — cuts
    executed backward FLOPs by the full trunk forward at the price of
    streaming [BN, len(saved)*D] bf16 through HBM (DMA overlaps the grad
    GEMMs). In encode mode the encodings (needed for the t0/skip/dir weight
    grads) are recomputed in-kernel — cheap VPU work that replaces the
    encx/encd HBM reads."""
    encxs, encds, k = _input_encs(refs, encode, interleave)
    dout_ref, acts_ref = refs[k], refs[k + 1]
    ws = {n: refs[k + 2 + i][:] for i, n in enumerate(names)}
    douts = {n: refs[k + 2 + len(names) + i] for i, n in enumerate(names)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for n in names:
            douts[n][:] = jnp.zeros_like(douts[n])

    acts_s = _split_rows(acts_ref[:], interleave)
    D = ws["w_conn"].shape[0]
    h = _reconstruct_h(encxs, acts_s, ws, n_layers, skip, saved_layers, D)
    feats, brs, rgbs = _heads_compute(h[-1], encds, ws)
    sv = {"h": h, "feat": feats, "br": brs, "rgb": rgbs}
    _bwd_grads(n_layers, skip, names, ws, douts, encxs, encds,
               _split_rows(_expand_dout(dout_ref[:]), interleave), sv)


def make_fused_train_mlp(n_layers: int, skip: Tuple[int, ...],
                         block_rows: int = 1024, interpret: bool = False,
                         save_acts: bool = False, interleave: int = 1,
                         acts_stride: int = 1,
                         encode: Optional[Tuple[int, int]] = None,
                         fwd_block_rows: Optional[int] = None,
                         vmem_limit_mb: Optional[int] = None,
                         fwd_dim_semantics: Optional[str] = None):
    """Build a custom-VJP fused MLP: (flat_weights, encx, encd) -> [N, 4].

    flat_weights order = _weight_names(n_layers, skip); shapes as produced by
    prep_params (padded, bf16). encx/encd must be pre-padded to
    (N multiple of block_rows, d_enc_pad / d_dir_pad) bf16.

    encode: (n_freqs, n_freqs_views) — compute the positional encoding IN
    KERNEL (periodic-4 lane layout, _encode_block; weights must come from
    prep_params(enc_lanes=encode)). The signature becomes
    (flat, x16, d16, consts_x, consts_d) with x16/d16 [N, 16] f32 tiled
    raw coords and packed [3, L] f32 lane constants
    (mlp.encode_lane_operand). Kills the XLA-side
    encode/cast/pad glue AND its HBM round-trip (~5.7 ns/row — the entire
    hierarchical "kernel MFU gap", benchmarks/sol_hier_kernel.py): inputs
    shrink from 192 B/row (encx bf16 128 + encd 64) to 128 B/row of f32
    raw coords, and sin/cos move to overlapped in-kernel VPU work via
    _sincos_fast.

    save_acts: stream the trunk activation chain ([N, n_layers*D] bf16) to
    HBM in the forward and skip the trunk recompute in the backward —
    trades ~1.0 MFLOP/sample of recompute for ~4 KB/sample of (pipelined)
    HBM traffic. Gradients are bitwise identical either way (the saved
    chain IS what a recompute would produce). block_rows 1024 fits both
    modes on v5e (the acts block double-buffers next to the resident f32
    grad accumulators) and measured fastest e2e — see
    benchmarks/ab_save_acts.py / ab_block_rows.py.

    interleave: split each row block into this many independent sub-chains
    with layer-wise interleaved emission — gives Mosaic's scheduler
    cross-chain ILP to overlap one sub-block's VPU tail (bias+relu+cast)
    with another's MXU GEMM. 1 = single chain (the original emission).
    Gradients for interleave>1 differ from 1 only in f32 accumulation
    order (partial-sum adds vs one longer MXU contraction).

    acts_stride (save_acts mode only): stream every acts_stride-th trunk
    activation (layers i with i % stride == stride-1, plus the last) and
    regenerate the gaps in the backward, one GEMM per gap layer
    (_reconstruct_h). Gradients bitwise identical to stride 1 (regenerated h
    IS what the forward computed). MEASURED DEAD END on v5e
    (benchmarks/ab_acts_stride.py): the reconstruction's f32 y-intermediates
    push the scoped-VMEM stack to 18.2M > 16M at block 1024, and at the
    forced smaller blocks (768/512) every stride>1 arm loses 8-12% e2e on
    BOTH strategies (occgrid 374.6k -> 345.8k; hierarchical 145.7k ->
    132.0k) — the acts stream it halves was already DMA-overlapped. Default
    1; knob kept for TPU generations with a different VMEM/HBM balance.

    fwd_block_rows: row-block size for the FORWARD kernels only (None =
    block_rows). The forward carries no resident grad accumulators, so it
    tolerates much larger blocks than the backward; larger forward blocks
    amortize per-grid-step overheads and give Mosaic a longer straight-line
    body to schedule (the r4 sol decomposition pinned the forward at
    0.67-0.80 ms vs a 0.428 ms GEMM ideal with every VPU-strip variant
    inside noise — i.e. scheduling-bound, not compute-bound). Callers must
    pad rows to a multiple of max(block_rows, fwd_block_rows).

    vmem_limit_mb: Mosaic scoped-VMEM cap (None = 32). v5e physically has
    128 MB VMEM/core; the default 32 covers 1024-row blocks in every mode,
    larger blocks need more headroom.

    fwd_dim_semantics: Mosaic dimension_semantics for the FORWARD kernels'
    1-D row-block grid (None = Mosaic default). The forward's grid steps
    are independent, so "parallel" is legal there; the backward's are NOT
    (VMEM-resident grad accumulation across steps) and always stay
    default/arbitrary. Probe knob (benchmarks/ab_pipeline.py).
    """
    names = _weight_names(n_layers, skip)
    if block_rows % interleave:
        raise ValueError(f"interleave {interleave} must divide block_rows "
                         f"{block_rows}")
    saved_layers = tuple(i for i in range(n_layers)
                         if i % acts_stride == acts_stride - 1
                         or i == n_layers - 1)
    # Encode mode pushes the saved-acts backward's scoped-VMEM watermark
    # ~0.8 MB past Mosaic's 16 MB DEFAULT limit at 1024-row blocks (the
    # [bN, 16] f32 coord operands allocate full 128-lane tiles and the
    # in-kernel encode adds [bN, L] f32 stack temps). v5e physically has
    # 128 MB VMEM/core; raise the per-kernel limit rather than shrink the
    # blocks — 512/896-row blocks measured 2-9% slower e2e
    # (ab_block_rows.py, ab_acts_stride.py). Regenerating h0 from the
    # in-kernel encx to shave the acts stream instead measured WORSE
    # (stack grew 16.79 -> 17.48 M: the f32 regen GEMM temp does not
    # overlap with the grad-GEMM temps).
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=(vmem_limit_mb or 32) * 1024 * 1024)
    fwd_compiler_params = (compiler_params if fwd_dim_semantics is None
                           else pltpu.CompilerParams(
                               vmem_limit_bytes=(vmem_limit_mb or 32)
                               * 1024 * 1024,
                               dimension_semantics=(fwd_dim_semantics,)))
    fwd_rows = fwd_block_rows or block_rows

    def row_spec(cols, rows=block_rows):
        return pl.BlockSpec((rows, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def input_specs(inputs, rows=block_rows):
        """Row-blocked specs for encx/encd, or x16/d16 + resident [3, L]
        packed lane-constant operands in encode mode."""
        if encode is None:
            return [row_spec(inputs[0].shape[1], rows),
                    row_spec(inputs[1].shape[1], rows)]
        return [row_spec(16, rows), row_spec(16, rows),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]

    def fwd_call(flat, inputs, save):
        n = inputs[0].shape[0]
        if save:
            D = flat[names.index("w_conn")].shape[0]
            kern = functools.partial(_fwd_kernel_save, n_layers,
                                     tuple(skip), names, interleave,
                                     saved_layers, encode)
            n_saved = len(saved_layers)
            out_specs = (row_spec(4, fwd_rows), row_spec(n_saved * D,
                                                         fwd_rows))
            out_shape = (jax.ShapeDtypeStruct((n, 4), jnp.float32),
                         jax.ShapeDtypeStruct((n, n_saved * D),
                                              jnp.bfloat16))
        else:
            kern = functools.partial(_fwd_kernel, n_layers, tuple(skip),
                                     names, interleave, encode)
            out_specs = row_spec(4, fwd_rows)
            out_shape = jax.ShapeDtypeStruct((n, 4), jnp.float32)
        return pl.pallas_call(
            kern,
            grid=(n // fwd_rows,),
            in_specs=[
                *input_specs(inputs, fwd_rows),
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=fwd_compiler_params,
        )(*inputs, *flat)

    def bwd_call(flat, inputs, acts, dout):
        n = inputs[0].shape[0]
        # pad the [N, 4] cotangent to 16 lanes only; the kernel tiles to 128
        # (_expand_dout) — a 128-lane f32 pad here costs ~16x the real HBM
        # traffic of the cotangent
        dout16 = jnp.pad(dout.astype(jnp.float32), ((0, 0), (0, 12)))
        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat]
        # accumulated outputs: constant index map keeps each grad block
        # VMEM-resident across grid steps (all operands are 2D)
        dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM) for w in flat]
        if save_acts:
            kern = functools.partial(_bwd_kernel_saved, n_layers,
                                     tuple(skip), names, interleave,
                                     saved_layers, encode)
            operands = (*inputs, dout16, acts)
            acts_specs = [row_spec(acts.shape[1])]
        else:
            kern = functools.partial(_bwd_kernel, n_layers, tuple(skip),
                                     names, interleave, encode)
            operands = (*inputs, dout16)
            acts_specs = []
        return pl.pallas_call(
            kern,
            grid=(n // block_rows,),
            in_specs=[
                *input_specs(inputs),
                row_spec(16),
                *acts_specs,
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
            ],
            out_specs=tuple(dw_specs),
            out_shape=tuple(dw_shapes),
            interpret=interpret,
            compiler_params=compiler_params,
        )(*operands, *flat)

    def primal(flat, *inputs):
        # primal (non-differentiated) calls never save: the [N, n_layers*D]
        # acts stream only pays for itself when a backward will consume it
        # (pallas_call outputs are opaque to XLA — a dropped acts output
        # could not be dead-code-eliminated)
        return fwd_call(flat, inputs, save=False)

    def forward(flat, *inputs):
        if save_acts:
            out, acts = fwd_call(flat, inputs, save=True)
            return out, (flat, inputs, acts)
        return fwd_call(flat, inputs, save=False), (flat, inputs, None)

    def backward(res, dout):
        flat, inputs, acts = res
        dws = bwd_call(flat, inputs, acts, dout)
        dws = [g.astype(w.dtype) for g, w in zip(dws, flat)]
        return (type(flat)(dws) if isinstance(flat, tuple) else dws,
                *[jnp.zeros_like(a) for a in inputs])

    if encode is None:
        @jax.custom_vjp
        def fused(flat, encx, encd):
            return primal(flat, encx, encd)
        fused.defvjp(lambda flat, encx, encd: forward(flat, encx, encd),
                     backward)
    else:
        @jax.custom_vjp
        def fused(flat, x16, d16, cx, cd):
            return primal(flat, x16, d16, cx, cd)
        fused.defvjp(
            lambda flat, x16, d16, cx, cd: forward(flat, x16, d16, cx, cd),
            backward)
    fused.pad_rows = _lcm(block_rows, fwd_rows)
    return fused, names


def make_fused_train_model_fn(
    model_cfg,
    enc_cfg,
    block_rows: Optional[int] = None,
    interpret: bool = False,
    save_acts: Optional[bool] = None,
    interleave: Optional[int] = None,
    acts_stride: Optional[int] = None,
    encode_in_kernel: Optional[bool] = None,
    fwd_block_rows: Optional[int] = None,
    vmem_limit_mb: Optional[int] = None,
):
    """Drop-in trainable model_fn factory for the train step.

    Returns fn(params, x, dirs, pos_mask, dir_mask) -> [..., 4] whose VJP wrt
    params runs through the Pallas backward kernel. FreeNeRF frequency masks
    apply to the encoded features BEFORE the kernel (identical math to
    core.models.NeRF's in-model masking) — or, in encode_in_kernel mode, as
    per-lane multipliers inside it (_encode_block).

    save_acts: None resolves from model_cfg.fused_save_acts (see
    ModelConfig). block_rows: None = model_cfg.fused_block_rows, else the
    measured v5e optimum (1024 for both backward modes). interleave: None =
    model_cfg.fused_interleave (sub-chain ILP, see make_fused_train_mlp).
    encode_in_kernel: None resolves from model_cfg.fused_encode — compute
    the positional encoding inside the kernel (see make_fused_train_mlp).
    """
    from fsnerf_tpu.core.encoding import positional_encoding

    n_layers = model_cfg.n_layers
    skip = tuple(model_cfg.skip)
    if save_acts is None:
        save_acts = bool(getattr(model_cfg, "fused_save_acts", False))
    if block_rows is None:
        block_rows = getattr(model_cfg, "fused_block_rows", None)
    if block_rows is None:
        # 1024 measured best for BOTH backward modes on v5e (the saved-acts
        # act blocks double-buffer fine next to the resident grad
        # accumulators): e2e 366.4k (512) -> 374.9k (1024) rays/s at the
        # bench workload; isolation sweep agrees (ab_block_rows.py).
        block_rows = 1024
    if interleave is None:
        interleave = getattr(model_cfg, "fused_interleave", None) or 1
    if acts_stride is None:
        acts_stride = getattr(model_cfg, "fused_acts_stride", None) or 1
    if encode_in_kernel is None:
        encode_in_kernel = bool(getattr(model_cfg, "fused_encode", True))
    if fwd_block_rows is None:
        fwd_block_rows = getattr(model_cfg, "fused_fwd_block_rows", None)
    if vmem_limit_mb is None:
        vmem_limit_mb = getattr(model_cfg, "fused_vmem_limit_mb", None)
    encode = ((enc_cfg.n_freqs, enc_cfg.n_freqs_views)
              if encode_in_kernel else None)
    fused, _ = make_fused_train_mlp(n_layers, skip, block_rows=block_rows,
                                    interpret=interpret,
                                    save_acts=save_acts,
                                    interleave=interleave,
                                    acts_stride=acts_stride,
                                    encode=encode,
                                    fwd_block_rows=fwd_block_rows,
                                    vmem_limit_mb=vmem_limit_mb)
    pad_rows = fused.pad_rows

    if encode_in_kernel:
        def tile16(v, n_pad):
            """[N, 3] f32 -> [n_pad, 16]: four copies of [v0, v1, v2, 0]
            (the kernel concatenates to L lanes — _encode_block)."""
            n = v.shape[0]
            v4 = jnp.pad(v.astype(jnp.float32), ((0, n_pad - n), (0, 1)))
            return jnp.tile(v4, (1, 4))

        def apply_fn(params, x, dirs, pos_mask=None, dir_mask=None):
            prepped = prep_params(
                params, n_layers=n_layers, skip=skip,
                enc_lanes=(enc_cfg.n_freqs, enc_cfg.n_freqs_views))
            flat = tuple(_flat_from_prepped(prepped))
            shape = x.shape[:-1]
            xr = x.reshape(-1, 3)
            n = xr.shape[0]
            n_pad = _round_up(max(n, pad_rows), pad_rows)
            cx = encode_lane_operand(enc_cfg.n_freqs, enc_cfg.log_space,
                                     pos_mask)
            cd = encode_lane_operand(enc_cfg.n_freqs_views,
                                     enc_cfg.log_space, dir_mask)
            out = fused(flat, tile16(xr, n_pad),
                        tile16(dirs.reshape(-1, 3), n_pad), cx, cd)[:n]
            return out.reshape(*shape, 4)

        return apply_fn

    def apply_fn(params, x, dirs, pos_mask=None, dir_mask=None):
        prepped = prep_params(params, n_layers=n_layers, skip=skip)
        flat = tuple(_flat_from_prepped(prepped))
        shape = x.shape[:-1]
        encx = positional_encoding(x.reshape(-1, 3), enc_cfg.n_freqs,
                                   enc_cfg.log_space, pos_mask)
        encd = positional_encoding(dirs.reshape(-1, 3), enc_cfg.n_freqs_views,
                                   enc_cfg.log_space, dir_mask)
        n = encx.shape[0]
        n_pad = _round_up(max(n, pad_rows), pad_rows)
        ex = jnp.zeros((n_pad, prepped["d_enc_pad"]), jnp.bfloat16)
        ex = ex.at[:n, : encx.shape[1]].set(encx.astype(jnp.bfloat16))
        ed = jnp.zeros((n_pad, prepped["d_dir_pad"]), jnp.bfloat16)
        ed = ed.at[:n, : encd.shape[1]].set(encd.astype(jnp.bfloat16))
        out = fused(flat, ex, ed)[:n]
        return out.reshape(*shape, 4)

    return apply_fn
