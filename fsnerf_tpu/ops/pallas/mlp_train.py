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

from fsnerf_tpu.ops.pallas.mlp import _round_up, prep_params  # noqa: F401


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _heads_compute(h_last, encd, ws):
    """Head stack from the last trunk activation: (feat, br, rgb).

    Shared by the forward pass and the saved-activations backward, which
    recomputes ONLY the heads (3 small GEMMs, ~0.2 MFLOP/sample) from the
    HBM-saved trunk chain instead of re-running the whole trunk (~1.0
    MFLOP/sample)."""
    f32 = jnp.float32
    feat = (jnp.dot(h_last, ws["w_conn"], preferred_element_type=f32)
            + ws["b_conn"].astype(f32)).astype(jnp.bfloat16)
    br_pre = (jnp.dot(feat, ws["w_branch_h"], preferred_element_type=f32)
              + jnp.dot(encd, ws["w_branch_d"], preferred_element_type=f32)
              + ws["b_branch"].astype(f32))
    br = jnp.maximum(br_pre, 0.0).astype(jnp.bfloat16)
    rgb_pre = (jnp.dot(br, ws["w_rgb"], preferred_element_type=f32)
               + ws["b_rgb"].astype(f32))
    return feat, br, _sigmoid(rgb_pre)


def _fwd_compute(encx, encd, ws, n_layers, skip, save=False):
    """Forward math shared by fwd kernel and bwd recompute.

    ws: dict of weight VALUES (already read from refs).
    Returns (rgb_s [BN,128], sigma [BN,128], saved dict of activations).
    """
    f32 = jnp.float32
    saved = {"h": []}
    h = None
    for i in range(n_layers):
        if i > 0 and (i - 1) in skip:
            w_h, w_e = ws[f"t{i}a"], ws[f"t{i}b"]
            y = (jnp.dot(h, w_h, preferred_element_type=f32)
                 + jnp.dot(encx, w_e, preferred_element_type=f32))
        elif i == 0:
            y = jnp.dot(encx, ws["t0"], preferred_element_type=f32)
        else:
            y = jnp.dot(h, ws[f"t{i}"], preferred_element_type=f32)
        y = y + ws[f"b{i}"].astype(f32)
        h_new = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
        if save:
            saved["h"].append(h_new)            # relu mask == h_new > 0
        h = h_new

    sigma = (jnp.dot(h, ws["w_sigma"], preferred_element_type=f32)
             + ws["b_sigma"].astype(f32))
    feat, br, rgb = _heads_compute(h, encd, ws)
    if save:
        saved.update(feat=feat, br=br, rgb=rgb)   # relu mask == br > 0
    return rgb, sigma, saved


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


def _fwd_kernel(n_layers, skip, names, *refs):
    encx_ref, encd_ref = refs[0], refs[1]
    ws = {n: refs[2 + i][:] for i, n in enumerate(names)}
    out_ref = refs[2 + len(names)]
    rgb, sigma, _ = _fwd_compute(encx_ref[:], encd_ref[:], ws,
                                 n_layers, skip)
    out_ref[:, 0:3] = rgb[:, 0:3]
    out_ref[:, 3:4] = sigma[:, 0:1]


def _dotT_a(a, b):
    """a^T @ b without a transpose op: contract row dims. [N,I]x[N,J]->[I,J]."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_bT(a, w):
    """a @ w^T without a transpose op: contract col dims. [N,J]x[I,J]->[N,I]."""
    return jax.lax.dot_general(a, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bwd_grads(n_layers, skip, names, ws, douts, encx, encd, dout, sv):
    """Gradient math shared by the recompute and saved-activation backward
    kernels: accumulate weight/bias grads into `douts` from the activations
    in `sv` (keys: h list, feat, br, rgb) and the upstream cotangent `dout`
    ([BN, 128] f32: lanes 0..2 = d rgb, lane 3 = d sigma)."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    rgb = sv["rgb"]
    lane = jax.lax.broadcasted_iota(jnp.int32, dout.shape, 1)

    # rgb head: sigmoid backward in lanes 0..2 (rgb's padded cols are
    # sigmoid(bias_pad)=0.5 but masked out here)
    drgb_pre = jnp.where(lane < 3, dout * rgb * (1.0 - rgb), 0.0)
    douts["w_rgb"][:] += _dotT_a(sv["br"], drgb_pre.astype(bf16))
    douts["b_rgb"][:] += jnp.sum(drgb_pre, axis=0, keepdims=True)

    dbr = _dot_bT(drgb_pre.astype(bf16), ws["w_rgb"])
    dbr = jnp.where(sv["br"].astype(f32) > 0, dbr, 0.0)  # relu' (f32 cmp: Mosaic lacks bf16 compare)
    douts["w_branch_h"][:] += _dotT_a(sv["feat"], dbr.astype(bf16))
    douts["w_branch_d"][:] += _dotT_a(encd, dbr.astype(bf16))
    douts["b_branch"][:] += jnp.sum(dbr, axis=0, keepdims=True)

    dfeat = _dot_bT(dbr.astype(bf16), ws["w_branch_h"])
    h_last = sv["h"][-1]
    douts["w_conn"][:] += _dotT_a(h_last, dfeat.astype(bf16))
    douts["b_conn"][:] += jnp.sum(dfeat, axis=0, keepdims=True)

    # sigma head: move d sigma from lane 3 to lane 0 (w_sigma's real column);
    # roll takes non-negative shifts, so rotate by width-3 instead of -3
    dsig_pad = jnp.where(lane == 0, pltpu.roll(dout, dout.shape[1] - 3, 1),
                         0.0)
    douts["w_sigma"][:] += _dotT_a(h_last, dsig_pad.astype(bf16))
    douts["b_sigma"][:] += jnp.sum(dsig_pad, axis=0, keepdims=True)

    dh = (_dot_bT(dfeat.astype(bf16), ws["w_conn"])
          + _dot_bT(dsig_pad.astype(bf16), ws["w_sigma"]))

    # trunk backward
    for i in range(n_layers - 1, -1, -1):
        dh = jnp.where(sv["h"][i].astype(f32) > 0, dh, 0.0)  # relu'
        h_prev = encx if i == 0 else sv["h"][i - 1]
        if i > 0 and (i - 1) in skip:
            douts[f"t{i}a"][:] += _dotT_a(h_prev, dh.astype(bf16))
            douts[f"t{i}b"][:] += _dotT_a(encx, dh.astype(bf16))
            douts[f"b{i}"][:] += jnp.sum(dh, axis=0, keepdims=True)
            dh = _dot_bT(dh.astype(bf16), ws[f"t{i}a"])
        elif i == 0:
            douts["t0"][:] += _dotT_a(encx, dh.astype(bf16))
            douts["b0"][:] += jnp.sum(dh, axis=0, keepdims=True)
        else:
            douts[f"t{i}"][:] += _dotT_a(h_prev, dh.astype(bf16))
            douts[f"b{i}"][:] += jnp.sum(dh, axis=0, keepdims=True)
            dh = _dot_bT(dh.astype(bf16), ws[f"t{i}"])


def _bwd_kernel(n_layers, skip, names, *refs):
    """Recompute backward: refs = (encx, encd, dout128, *weights,
    *dweight_outs). The whole forward is re-run per row-block in VMEM (zero
    activation HBM traffic)."""
    encx_ref, encd_ref, dout_ref = refs[0], refs[1], refs[2]
    ws = {n: refs[3 + i][:] for i, n in enumerate(names)}
    douts = {n: refs[3 + len(names) + i] for i, n in enumerate(names)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for n in names:
            douts[n][:] = jnp.zeros_like(douts[n])

    encx = encx_ref[:]
    encd = encd_ref[:]
    _, _, sv = _fwd_compute(encx, encd, ws, n_layers, skip, save=True)
    _bwd_grads(n_layers, skip, names, ws, douts, encx, encd, dout_ref[:], sv)


def _fwd_kernel_save(n_layers, skip, names, *refs):
    """Forward kernel that ALSO streams the trunk activation chain to HBM
    (acts_ref [BN, n_layers*D] bf16) for the saved-activations backward."""
    encx_ref, encd_ref = refs[0], refs[1]
    ws = {n: refs[2 + i][:] for i, n in enumerate(names)}
    out_ref, acts_ref = refs[2 + len(names)], refs[3 + len(names)]
    rgb, sigma, sv = _fwd_compute(encx_ref[:], encd_ref[:], ws,
                                  n_layers, skip, save=True)
    D = ws["w_conn"].shape[0]
    for i, h_i in enumerate(sv["h"]):
        acts_ref[:, i * D:(i + 1) * D] = h_i
    out_ref[:, 0:3] = rgb[:, 0:3]
    out_ref[:, 3:4] = sigma[:, 0:1]


def _bwd_kernel_saved(n_layers, skip, names, *refs):
    """Saved-activations backward: refs = (encx, encd, dout128, acts,
    *weights, *dweight_outs). Reads the trunk chain saved by
    _fwd_kernel_save and recomputes only the head stack (~0.2 vs ~1.0
    MFLOP/sample) — cuts executed backward FLOPs by the full trunk forward
    at the price of streaming [BN, n_layers*D] bf16 through HBM (DMA
    overlaps the grad GEMMs)."""
    encx_ref, encd_ref, dout_ref, acts_ref = refs[0], refs[1], refs[2], refs[3]
    ws = {n: refs[4 + i][:] for i, n in enumerate(names)}
    douts = {n: refs[4 + len(names) + i] for i, n in enumerate(names)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for n in names:
            douts[n][:] = jnp.zeros_like(douts[n])

    encd = encd_ref[:]
    acts = acts_ref[:]
    D = ws["w_conn"].shape[0]
    h = [acts[:, i * D:(i + 1) * D] for i in range(n_layers)]
    feat, br, rgb = _heads_compute(h[-1], encd, ws)
    sv = {"h": h, "feat": feat, "br": br, "rgb": rgb}
    _bwd_grads(n_layers, skip, names, ws, douts, encx_ref[:], encd,
               dout_ref[:], sv)


def make_fused_train_mlp(n_layers: int, skip: Tuple[int, ...],
                         block_rows: int = 1024, interpret: bool = False,
                         save_acts: bool = False):
    """Build a custom-VJP fused MLP: (flat_weights, encx, encd) -> [N, 4].

    flat_weights order = _weight_names(n_layers, skip); shapes as produced by
    prep_params (padded, bf16). encx/encd must be pre-padded to
    (N multiple of block_rows, d_enc_pad / d_dir_pad) bf16.

    save_acts: stream the trunk activation chain ([N, n_layers*D] bf16) to
    HBM in the forward and skip the trunk recompute in the backward —
    trades ~1.0 MFLOP/sample of recompute for ~4 KB/sample of (pipelined)
    HBM traffic. Gradients are bitwise identical either way (the saved
    chain IS what a recompute would produce). block_rows 1024 fits both
    modes on v5e (the acts block double-buffers next to the resident f32
    grad accumulators) and measured fastest e2e — see
    benchmarks/ab_save_acts.py / ab_block_rows.py.
    """
    names = _weight_names(n_layers, skip)

    def row_spec(cols):
        return pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def fwd_call(flat, encx, encd, save):
        n = encx.shape[0]
        if save:
            D = flat[names.index("w_conn")].shape[0]
            kern = functools.partial(_fwd_kernel_save, n_layers,
                                     tuple(skip), names)
            out_specs = (row_spec(4), row_spec(n_layers * D))
            out_shape = (jax.ShapeDtypeStruct((n, 4), jnp.float32),
                         jax.ShapeDtypeStruct((n, n_layers * D),
                                              jnp.bfloat16))
        else:
            kern = functools.partial(_fwd_kernel, n_layers, tuple(skip),
                                     names)
            out_specs = row_spec(4)
            out_shape = jax.ShapeDtypeStruct((n, 4), jnp.float32)
        return pl.pallas_call(
            kern,
            grid=(n // block_rows,),
            in_specs=[
                row_spec(encx.shape[1]),
                row_spec(encd.shape[1]),
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(encx, encd, *flat)

    def bwd_call(flat, encx, encd, acts, dout):
        n = encx.shape[0]
        # pad the [N, 4] cotangent to 128 lanes for clean in-kernel masking
        dout128 = jnp.pad(dout.astype(jnp.float32), ((0, 0), (0, 124)))
        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat]
        # accumulated outputs: constant index map keeps each grad block
        # VMEM-resident across grid steps (all operands are 2D)
        dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM) for w in flat]
        if save_acts:
            kern = functools.partial(_bwd_kernel_saved, n_layers,
                                     tuple(skip), names)
            operands = (encx, encd, dout128, acts)
            acts_specs = [row_spec(acts.shape[1])]
        else:
            kern = functools.partial(_bwd_kernel, n_layers, tuple(skip),
                                     names)
            operands = (encx, encd, dout128)
            acts_specs = []
        return pl.pallas_call(
            kern,
            grid=(n // block_rows,),
            in_specs=[
                row_spec(encx.shape[1]),
                row_spec(encd.shape[1]),
                row_spec(128),
                *acts_specs,
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
            ],
            out_specs=tuple(dw_specs),
            out_shape=tuple(dw_shapes),
            interpret=interpret,
        )(*operands, *flat)

    @jax.custom_vjp
    def fused(flat, encx, encd):
        # primal (non-differentiated) calls never save: the [N, n_layers*D]
        # acts stream only pays for itself when a backward will consume it
        # (pallas_call outputs are opaque to XLA — a dropped acts output
        # could not be dead-code-eliminated)
        return fwd_call(flat, encx, encd, save=False)

    def fused_fwd(flat, encx, encd):
        if save_acts:
            out, acts = fwd_call(flat, encx, encd, save=True)
            return out, (flat, encx, encd, acts)
        return fwd_call(flat, encx, encd, save=False), (flat, encx, encd,
                                                        None)

    def fused_bwd(res, dout):
        flat, encx, encd, acts = res
        dws = bwd_call(flat, encx, encd, acts, dout)
        dws = [g.astype(w.dtype) for g, w in zip(dws, flat)]
        return (type(flat)(dws) if isinstance(flat, tuple) else dws,
                jnp.zeros_like(encx), jnp.zeros_like(encd))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused, names


def make_fused_train_model_fn(
    model_cfg,
    enc_cfg,
    block_rows: Optional[int] = None,
    interpret: bool = False,
    save_acts: Optional[bool] = None,
):
    """Drop-in trainable model_fn factory for the train step.

    Returns fn(params, x, dirs, pos_mask, dir_mask) -> [..., 4] whose VJP wrt
    params runs through the Pallas backward kernel. FreeNeRF frequency masks
    apply to the encoded features BEFORE the kernel (identical math to
    core.models.NeRF's in-model masking).

    save_acts: None resolves from model_cfg.fused_save_acts (see
    ModelConfig). block_rows: None = model_cfg.fused_block_rows, else the
    measured v5e optimum (1024 for both backward modes).
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
    fused, _ = make_fused_train_mlp(n_layers, skip, block_rows=block_rows,
                                    interpret=interpret,
                                    save_acts=save_acts)

    def apply_fn(params, x, dirs, pos_mask=None, dir_mask=None):
        prepped = prep_params(params, n_layers=n_layers, skip=skip)
        flat = tuple(_flat_from_prepped(prepped))
        shape = x.shape[:-1]
        encx = positional_encoding(x.reshape(-1, 3), enc_cfg.n_freqs,
                                   enc_cfg.log_space, pos_mask)
        encd = positional_encoding(dirs.reshape(-1, 3), enc_cfg.n_freqs_views,
                                   enc_cfg.log_space, dir_mask)
        n = encx.shape[0]
        n_pad = _round_up(max(n, block_rows), block_rows)
        ex = jnp.zeros((n_pad, prepped["d_enc_pad"]), jnp.bfloat16)
        ex = ex.at[:n, : encx.shape[1]].set(encx.astype(jnp.bfloat16))
        ed = jnp.zeros((n_pad, prepped["d_dir_pad"]), jnp.bfloat16)
        ed = ed.at[:n, : encd.shape[1]].set(encd.astype(jnp.bfloat16))
        out = fused(flat, ex, ed)[:n]
        return out.reshape(*shape, 4)

    return apply_fn
