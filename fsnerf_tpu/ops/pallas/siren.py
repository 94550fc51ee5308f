"""Trainable fused SiNeRF (SIREN) MLP: custom-VJP Pallas kernels.

The SiNeRF counterpart of ops/pallas/mlp_train.py (reference SiNeRF at
models.py:237-309): an 8-layer sine trunk h_i = sin(a_i * (h W + b)) with
per-layer frequency a = (30, 1, ..., 1), a two-layer density head
(sine 256->128, linear 128->1 + ReLU), and a color head that concatenates
RAW view directions (models.py:304) — realized as a split GEMM
(feat @ W_f + dirs @ W_d), no lane concat.

Precision: every GEMM accumulates f32 on the MXU from bf16 operands and the
sine argument stays f32 (SIREN phase precision; core/models.py:185-193 does
the same) — activations are consumed bf16 by the next GEMM. All in-kernel
sin/cos run through _sincos_fast (range-reduced minimax polynomials): the
Mosaic jnp.sin lowering measured 6.5-9 ms of the 131k-row forward vs ~1 ms
for the polynomial (benchmarks/sol_siren.py), and its <= 9e-5 abs error
vanishes under the consumers' bf16 rounding.

Two backward modes (mirrors ops/pallas/mlp_train.py):

* recompute (save_acts=False): re-run the forward per row-block in VMEM,
  keeping the PRE-activation y_i (f32) alive for the sine derivative
  d sin(a y) = a cos(a y) — unlike ReLU, the sign of cos is not
  recoverable from the activation, so y itself is what's held. The
  8-layer f32 y-list caps block_rows at 256 (512 exceeds 16 MB VMEM).
* saved-acts (save_acts=True): the forward streams BOTH the activation
  h_i = sin(a_i y_i) AND the premultiplied derivative a_i cos(a_i y_i)
  to HBM as bf16 ([N, 2*n_layers*D]); the backward reads them and
  recomputes only the head stack — no trunk GEMMs and, critically, no
  transcendentals in the backward (sin/cos are multi-op VPU sequences).
  Without the f32 y-list the row block rises to 512. Gradients differ
  from the recompute mode only by the bf16 rounding of the saved cos
  factor (the recompute mode holds it f32); equivalence is tolerance-
  tested in tests/test_pallas.py.

Weight/bias grads accumulate across grid steps in VMEM-resident outputs
(constant index map), as in the NeRF train kernel.

Equivalence (values and grads) vs core.models.SiNeRF is tested in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsnerf_tpu.ops.pallas.fastmath import _sincos_fast  # noqa: F401
from fsnerf_tpu.ops.pallas.mlp import _round_up
from fsnerf_tpu.ops.pallas.mlp_train import (_dotT_a, _dot_bT,
                                             _expand_dout)


def siren_weight_names(n_layers: int):
    names = []
    for i in range(n_layers):
        names += [f"t{i}", f"b{i}"]
    names += ["ws0", "bs0", "ws1", "bs1", "wf", "bf",
              "wr0f", "wr0d", "br0", "wr1", "br1"]
    return names


def prep_siren_params(params: dict, n_layers: int = 8,
                      compute_dtype=jnp.bfloat16) -> dict:
    """Flatten SiNeRF flax params into padded bf16 kernel operands."""
    p = params["params"]
    cd = compute_dtype
    d_in = p["first_0"]["kernel"].shape[0]            # 3 (raw coords)
    d_in_pad = _round_up(d_in, 16)

    def pad_rows(w, rows):
        return jnp.zeros((rows, w.shape[1]), cd).at[: w.shape[0]].set(
            w.astype(cd))

    def pad_cols(w, cols):
        return jnp.zeros((w.shape[0], cols), cd).at[:, : w.shape[1]].set(
            w.astype(cd))

    out = {"d_in": d_in, "d_in_pad": d_in_pad, "n_layers": n_layers}
    out["t0"] = pad_rows(p["first_0"]["kernel"], d_in_pad)
    out["b0"] = p["first_0"]["bias"].astype(jnp.float32)[None, :]
    for i in range(1, n_layers):
        out[f"t{i}"] = p[f"first_{i}"]["kernel"].astype(cd)
        out[f"b{i}"] = p[f"first_{i}"]["bias"].astype(jnp.float32)[None, :]

    w = p["fc_feature"]["kernel"].shape[0]            # width
    out["ws0"] = p["sigma_0"]["kernel"].astype(cd)
    out["bs0"] = p["sigma_0"]["bias"].astype(jnp.float32)[None, :]
    out["ws1"] = pad_cols(p["sigma_1"]["kernel"], 128)
    out["bs1"] = pad_cols(p["sigma_1"]["bias"][None, :].astype(jnp.float32),
                          128).astype(jnp.float32)
    out["wf"] = p["fc_feature"]["kernel"].astype(cd)
    out["bf"] = p["fc_feature"]["bias"].astype(jnp.float32)[None, :]
    wr0 = p["rgb_0"]["kernel"]
    out["wr0f"] = wr0[:w].astype(cd)
    out["wr0d"] = pad_rows(wr0[w:], d_in_pad)
    out["br0"] = p["rgb_0"]["bias"].astype(jnp.float32)[None, :]
    out["wr1"] = pad_cols(p["rgb_1"]["kernel"], 128)
    out["br1"] = pad_cols(p["rgb_1"]["bias"][None, :].astype(jnp.float32),
                          128).astype(jnp.float32)
    return out


def _flat_siren(prepped, n_layers):
    return [prepped[n] for n in siren_weight_names(n_layers)]


def _heads_siren(h_last, d, ws, save=False):
    """Density + color head stack from the last trunk activation.

    Shared by the forward and by BOTH backwards (the saved-acts backward
    recomputes only this — ~0.2 MFLOP/sample vs ~1.1 for the trunk)."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    sv = {}
    ys = jnp.dot(h_last, ws["ws0"], preferred_element_type=f32) + ws["bs0"]
    s_s = _sincos_fast(ys)[0].astype(bf16)
    sigma_pre = (jnp.dot(s_s, ws["ws1"], preferred_element_type=f32)
                 + ws["bs1"])
    sigma = jnp.maximum(sigma_pre, 0.0)

    feat = (jnp.dot(h_last, ws["wf"], preferred_element_type=f32)
            + ws["bf"]).astype(bf16)
    yr = (jnp.dot(feat, ws["wr0f"], preferred_element_type=f32)
          + jnp.dot(d, ws["wr0d"], preferred_element_type=f32) + ws["br0"])
    s_r = _sincos_fast(yr)[0].astype(bf16)
    rgb = jax.nn.sigmoid(
        jnp.dot(s_r, ws["wr1"], preferred_element_type=f32) + ws["br1"])
    if save:
        sv.update(ys=ys, s_s=s_s, sigma_pre=sigma_pre, feat=feat, yr=yr,
                  s_r=s_r, rgb=rgb)
    return rgb, sigma, sv


def _fwd_siren(x, d, ws, n_layers, alphas, save=False, save_hc=False):
    """Shared forward math; x/d are padded bf16 inputs.

    save: keep the f32 pre-activations y_i (recompute backward).
    save_hc: keep the bf16 activations h_i AND the bf16 premultiplied sine
    derivatives a_i cos(a_i y_i) (streamed to HBM by the save-acts forward).
    Returns (rgb [bN, 128] lanes 0..2, sigma [bN, 128] lane 0, saved)."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    sv = {"y": [], "h": [], "c": []}
    h = x
    for i in range(n_layers):
        y = (jnp.dot(h, ws[f"t{i}"], preferred_element_type=f32)
             + ws[f"b{i}"])
        if save:
            sv["y"].append(y)
        s, c = _sincos_fast(alphas[i] * y, want_cos=save_hc)
        h = s.astype(bf16)
        if save or save_hc:
            sv["h"].append(h)
        if save_hc:
            sv["c"].append((alphas[i] * c).astype(bf16))
    if save or save_hc:
        sv["h_last"] = h

    rgb, sigma, head_sv = _heads_siren(h, d, ws, save=save or save_hc)
    sv.update(head_sv)
    return rgb, sigma, sv


def _fwd_kernel(n_layers, alphas, names, *refs):
    x_ref, d_ref = refs[0], refs[1]
    ws = {n: refs[2 + i][:] for i, n in enumerate(names)}
    out_ref = refs[2 + len(names)]
    rgb, sigma, _ = _fwd_siren(x_ref[:], d_ref[:], ws, n_layers, alphas)
    out_ref[:, 0:3] = rgb[:, 0:3]
    out_ref[:, 3:4] = sigma[:, 0:1]


def _bwd_grads_siren(n_layers, names, ws, douts, x, d, dout, hs, cs, sv):
    """Shared gradient math for both backward kernels.

    hs[i]: bf16 trunk activation sin(a_i y_i); cs[i]: PREMULTIPLIED sine
    derivative a_i cos(a_i y_i) (f32 in the recompute kernel, bf16 in the
    saved-acts kernel); sv: head activations from _heads_siren(save=True).
    dout: [bN, 128] f32 upstream cotangent, tiled from 16 real lanes by
    _expand_dout (lanes 0..2 = d rgb, 3 = d sigma; all other lanes masked
    off by the per-consumer lane tests)."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    lane = jax.lax.broadcasted_iota(jnp.int32, dout.shape, 1)

    # rgb head: sigmoid' in lanes 0..2
    rgb = sv["rgb"]
    drgb_pre = jnp.where(lane < 3, dout * rgb * (1.0 - rgb), 0.0)
    douts["wr1"][:] += _dotT_a(sv["s_r"], drgb_pre.astype(bf16))
    douts["br1"][:] += jnp.sum(drgb_pre, axis=0, keepdims=True)
    dyr = (_dot_bT(drgb_pre.astype(bf16), ws["wr1"])
           * _sincos_fast(sv["yr"], want_sin=False, want_cos=True)[1])
    douts["wr0f"][:] += _dotT_a(sv["feat"], dyr.astype(bf16))
    douts["wr0d"][:] += _dotT_a(d, dyr.astype(bf16))
    douts["br0"][:] += jnp.sum(dyr, axis=0, keepdims=True)

    dfeat = _dot_bT(dyr.astype(bf16), ws["wr0f"])
    h_last = hs[-1]
    douts["wf"][:] += _dotT_a(h_last, dfeat.astype(bf16))
    douts["bf"][:] += jnp.sum(dfeat, axis=0, keepdims=True)
    dh = _dot_bT(dfeat.astype(bf16), ws["wf"])

    # sigma head: relu' then the sine layer (move d sigma lane 3 -> lane 0)
    dsig = jnp.where(lane == 0, pltpu.roll(dout, dout.shape[1] - 3, 1), 0.0)
    dsig = jnp.where(sv["sigma_pre"] > 0.0, dsig, 0.0)
    douts["ws1"][:] += _dotT_a(sv["s_s"], dsig.astype(bf16))
    douts["bs1"][:] += jnp.sum(dsig, axis=0, keepdims=True)
    dys = (_dot_bT(dsig.astype(bf16), ws["ws1"])
           * _sincos_fast(sv["ys"], want_sin=False, want_cos=True)[1])
    douts["ws0"][:] += _dotT_a(h_last, dys.astype(bf16))
    douts["bs0"][:] += jnp.sum(dys, axis=0, keepdims=True)
    dh = dh + _dot_bT(dys.astype(bf16), ws["ws0"])

    # sine trunk backward: d sin(a y) = a cos(a y), premultiplied in cs
    for i in range(n_layers - 1, -1, -1):
        dy = dh * cs[i].astype(f32)
        h_prev = x if i == 0 else hs[i - 1]
        douts[f"t{i}"][:] += _dotT_a(h_prev, dy.astype(bf16))
        douts[f"b{i}"][:] += jnp.sum(dy, axis=0, keepdims=True)
        if i > 0:
            dh = _dot_bT(dy.astype(bf16), ws[f"t{i}"])


def _bwd_kernel(n_layers, alphas, names, *refs):
    """Recompute backward: the whole forward re-runs per row-block in VMEM
    (zero activation HBM traffic); cos factors held f32."""
    x_ref, d_ref, dout_ref = refs[0], refs[1], refs[2]
    ws = {n: refs[3 + i][:] for i, n in enumerate(names)}
    douts = {n: refs[3 + len(names) + i] for i, n in enumerate(names)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for n in names:
            douts[n][:] = jnp.zeros_like(douts[n])

    x = x_ref[:]
    d = d_ref[:]
    _, _, sv = _fwd_siren(x, d, ws, n_layers, alphas, save=True)
    hs = sv["h"]                                   # bf16 chain, kept by save
    cs = [alphas[i] * _sincos_fast(alphas[i] * sv["y"][i], want_sin=False,
                                   want_cos=True)[1]
          for i in range(n_layers)]
    _bwd_grads_siren(n_layers, names, ws, douts, x, d,
                     _expand_dout(dout_ref[:]), hs, cs, sv)


def _fwd_kernel_save(n_layers, alphas, names, *refs):
    """Forward kernel that ALSO streams the trunk activations and the
    premultiplied sine derivatives to HBM (acts_ref [bN, 2*n_layers*D]
    bf16: h_i at cols [i*D:(i+1)*D], a_i cos(a_i y_i) at
    [(n_layers+i)*D:(n_layers+i+1)*D])."""
    x_ref, d_ref = refs[0], refs[1]
    ws = {n: refs[2 + i][:] for i, n in enumerate(names)}
    out_ref, acts_ref = refs[2 + len(names)], refs[3 + len(names)]
    rgb, sigma, sv = _fwd_siren(x_ref[:], d_ref[:], ws, n_layers, alphas,
                                save_hc=True)
    D = ws["wf"].shape[0]
    for i in range(n_layers):
        acts_ref[:, i * D:(i + 1) * D] = sv["h"][i]
        acts_ref[:, (n_layers + i) * D:(n_layers + i + 1) * D] = sv["c"][i]
    out_ref[:, 0:3] = rgb[:, 0:3]
    out_ref[:, 3:4] = sigma[:, 0:1]


def _bwd_kernel_saved(n_layers, alphas, names, *refs):
    """Saved-acts backward: reads the trunk chain + derivative factors saved
    by _fwd_kernel_save and recomputes only the head stack — no trunk GEMMs
    and no transcendentals in the backward."""
    x_ref, d_ref, dout_ref, acts_ref = refs[0], refs[1], refs[2], refs[3]
    ws = {n: refs[4 + i][:] for i, n in enumerate(names)}
    douts = {n: refs[4 + len(names) + i] for i, n in enumerate(names)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for n in names:
            douts[n][:] = jnp.zeros_like(douts[n])

    d = d_ref[:]
    acts = acts_ref[:]
    D = ws["wf"].shape[0]
    hs = [acts[:, i * D:(i + 1) * D] for i in range(n_layers)]
    cs = [acts[:, (n_layers + i) * D:(n_layers + i + 1) * D]
          for i in range(n_layers)]
    _, _, sv = _heads_siren(hs[-1], d, ws, save=True)
    _bwd_grads_siren(n_layers, names, ws, douts, x_ref[:], d,
                     _expand_dout(dout_ref[:]), hs, cs, sv)


def make_fused_siren_mlp(n_layers: int, alphas: Tuple[float, ...],
                         block_rows: int = 256, interpret: bool = False,
                         save_acts: bool = False):
    """Custom-VJP fused SiNeRF: (flat_weights, x_pad, d_pad) -> [N, 4].

    save_acts: stream the trunk activations + premultiplied sine
    derivatives ([N, 2*n_layers*D] bf16) to HBM in the forward and skip the
    trunk recompute (GEMMs AND transcendentals) in the backward. Without
    the recompute's f32 y-list the row block can rise past the 256-row
    VMEM ceiling of the recompute mode (pass block_rows explicitly)."""
    names = siren_weight_names(n_layers)
    alphas = tuple(float(a) for a in alphas)

    def row_spec(cols):
        return pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def fwd_call(flat, x, d, save):
        n = x.shape[0]
        if save:
            D = flat[names.index("wf")].shape[0]
            kern = functools.partial(_fwd_kernel_save, n_layers, alphas,
                                     names)
            out_specs = (row_spec(4), row_spec(2 * n_layers * D))
            out_shape = (jax.ShapeDtypeStruct((n, 4), jnp.float32),
                         jax.ShapeDtypeStruct((n, 2 * n_layers * D),
                                              jnp.bfloat16))
        else:
            kern = functools.partial(_fwd_kernel, n_layers, alphas, names)
            out_specs = row_spec(4)
            out_shape = jax.ShapeDtypeStruct((n, 4), jnp.float32)
        return pl.pallas_call(
            kern,
            grid=(n // block_rows,),
            in_specs=[
                row_spec(x.shape[1]),
                row_spec(d.shape[1]),
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(x, d, *flat)

    def bwd_call(flat, x, d, acts, dout):
        n = x.shape[0]
        # 16-lane pad only; kernels tile to 128 (_expand_dout) — a 128-lane
        # f32 pad costs ~16x the real cotangent HBM traffic
        dout16 = jnp.pad(dout.astype(jnp.float32), ((0, 0), (0, 12)))
        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat]
        dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM) for w in flat]
        if save_acts:
            kern = functools.partial(_bwd_kernel_saved, n_layers, alphas,
                                     names)
            operands = (x, d, dout16, acts)
            acts_specs = [row_spec(acts.shape[1])]
        else:
            kern = functools.partial(_bwd_kernel, n_layers, alphas, names)
            operands = (x, d, dout16)
            acts_specs = []
        return pl.pallas_call(
            kern,
            grid=(n // block_rows,),
            in_specs=[
                row_spec(x.shape[1]),
                row_spec(d.shape[1]),
                row_spec(16),
                *acts_specs,
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat],
            ],
            out_specs=tuple(dw_specs),
            out_shape=tuple(dw_shapes),
            interpret=interpret,
        )(*operands, *flat)

    @jax.custom_vjp
    def fused(flat, x, d):
        # primal (non-differentiated) calls never save (see mlp_train.py)
        return fwd_call(flat, x, d, save=False)

    def fused_fwd(flat, x, d):
        if save_acts:
            out, acts = fwd_call(flat, x, d, save=True)
            return out, (flat, x, d, acts)
        return fwd_call(flat, x, d, save=False), (flat, x, d, None)

    def fused_bwd(res, dout):
        flat, x, d, acts = res
        dws = bwd_call(flat, x, d, acts, dout)
        dws = [g.astype(w.dtype) for g, w in zip(dws, flat)]
        return (type(flat)(dws) if isinstance(flat, tuple) else dws,
                jnp.zeros_like(x), jnp.zeros_like(d))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def make_fused_siren_model_fn(model_cfg, enc_cfg=None,
                              block_rows: Optional[int] = None,
                              interpret: bool = False,
                              save_acts: Optional[bool] = None):
    """Drop-in trainable model_fn for SiNeRF (mirrors
    mlp_train.make_fused_train_model_fn's signature; FreeNeRF frequency
    masks are no-ops for SiNeRF — it consumes raw coordinates).

    save_acts: None resolves from model_cfg.siren_save_acts (see
    ModelConfig). block_rows: None = per-mode v5e optimum (512 saved-acts /
    256 recompute — the recompute's f32 y-list caps it, see module doc)."""
    n_layers = model_cfg.n_layers
    alphas = (30.0,) + (1.0,) * (n_layers - 1)      # run-nerf.py:69
    if save_acts is None:
        save_acts = bool(getattr(model_cfg, "siren_save_acts", True))
    if block_rows is None:
        block_rows = 512 if save_acts else 256
    fused = make_fused_siren_mlp(n_layers, alphas, block_rows=block_rows,
                                 interpret=interpret, save_acts=save_acts)

    def apply_fn(params, x, dirs, pos_mask=None, dir_mask=None):
        prepped = prep_siren_params(params, n_layers=n_layers)
        flat = tuple(_flat_siren(prepped, n_layers))
        shape = x.shape[:-1]
        x2 = x.reshape(-1, 3)
        d2 = dirs.reshape(-1, 3)
        n = x2.shape[0]
        n_pad = _round_up(max(n, block_rows), block_rows)
        dp = prepped["d_in_pad"]
        xp = jnp.zeros((n_pad, dp), jnp.bfloat16)
        xp = xp.at[:n, :3].set(x2.astype(jnp.bfloat16))
        ddp = jnp.zeros((n_pad, dp), jnp.bfloat16)
        ddp = ddp.at[:n, :3].set(d2.astype(jnp.bfloat16))
        out = fused(flat, xp, ddp)[:n]
        return out.reshape(*shape, 4)

    return apply_fn
