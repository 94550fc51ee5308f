"""Fused NeRF-MLP Pallas kernel: the whole trunk + heads in VMEM.

Replaces the XLA per-layer GEMM pipeline for the render hot path (reference:
the cuBLAS/cuDNN MLP eval inside nerfacc's sigma_fn/rgb_sigma_fn callbacks,
rendering.py:58-84). XLA stages each [N, 256] activation through HBM
(~1.6 GB of traffic per 196k-point forward); this kernel keeps every
activation in VMEM so the forward runs at MXU speed.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * Inputs are PRE-ENCODED features (positional + view-dir Fourier features,
    computed by XLA on the VPU — encoding is cheap and pre-encoding avoids
    in-kernel layout shuffles of [N, 3] points).
  * The skip concat (reference models.py:120-123) and the view branch concat
    (models.py:130-133) are algebraically split into TWO GEMMs each
    (W @ [h, e] == W_h @ h + W_e @ e) — no lane-dim concatenation needed.
  * Weights are bfloat16-cast, padded to lane multiples, and kept whole in
    VMEM (~1.3 MB); the grid walks row blocks of points, so Mosaic leaves
    the (index-map-constant) weight blocks resident across programs.
  * Math matches core.models.NeRF in bfloat16 compute mode bit-for-bit up to
    bf16 rounding (equivalence-tested against model.apply in tests).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def encode_lane_consts(n_freqs: int, log_space: bool = True, d_in: int = 3):
    """Static lane constants for the IN-KERNEL periodic-4 encoding layout.

    The fused train kernels can compute the positional encoding themselves
    (ops/pallas/mlp_train.py) from a [N, 16] f32 operand holding FOUR tiled
    copies of [v0, v1, v2, 0]: concatenating that operand L/16 times puts
    v[lane % 4] on every lane with period 4 — no lane gather/shuffle needed.
    The encoding LAYOUT is therefore lane 4g+j (j in 0..2):
      g == 0           -> identity v_j
      1 <= g <= F      -> sin(f_{g-1} v_j)
      F < g <= 2F      -> cos(f_{g-F-1} v_j)
    (j == 3 lanes and groups past 2F are zero). prep_params(enc_lanes=...)
    permutes the encoding-consuming weight ROWS into the same layout, so
    the kernel math is unchanged — only the feature order differs from the
    reference [x, sin f0 x, cos f0 x, ...] interleaving.

    Returns (L, src, valid, freq): lane count (multiple of 16), the source
    feature row per lane (into the reference-layout encoding), a {0,1}
    validity mask, and the per-lane frequency — all static numpy.
    """
    import numpy as np

    groups = 1 + 2 * n_freqs
    L = _round_up(4 * groups, 16)
    if log_space:
        freqs = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    else:
        freqs = np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs)
    src = np.zeros(L, np.int32)
    valid = np.zeros(L, np.float32)
    freq = np.zeros(L, np.float32)
    for g in range(groups):
        for j in range(d_in):
            lane = 4 * g + j
            if g == 0:
                src[lane] = j
            elif g <= n_freqs:
                src[lane] = d_in + 2 * d_in * (g - 1) + j
                freq[lane] = freqs[g - 1]
            else:
                src[lane] = d_in + 2 * d_in * (g - 1 - n_freqs) + d_in + j
                freq[lane] = freqs[g - 1 - n_freqs]
            valid[lane] = 1.0
    return L, src, valid, freq


def expand_lane_mask(mask, n_freqs: int, L: int):
    """[F] per-band FreeNeRF mask -> [1, L] per-lane multiplier (identity
    lanes 1, invalid lanes 0) for the in-kernel encoding. mask None =
    identity."""
    import numpy as np

    _, _, valid, _ = encode_lane_consts(n_freqs, d_in=3)
    lane = np.arange(L)
    g = lane // 4
    band = np.where(g == 0, 0, np.where(g <= n_freqs, g - 1,
                                        g - 1 - n_freqs))
    if mask is None:
        return jnp.asarray(valid)[None, :]
    per_lane = jnp.where(jnp.asarray(g == 0),
                         1.0, jnp.asarray(mask)[jnp.asarray(band)])
    return (per_lane * jnp.asarray(valid))[None, :]


def encode_lane_operand(n_freqs: int, log_space: bool = True, mask=None):
    """Packed [3, L] f32 lane-constant operand for the in-kernel encoding
    (ops/pallas/mlp_train.py::_encode_block): row 0 = per-lane frequency
    (0 on identity/invalid lanes -> the kernel selects raw pass-through
    there), row 1 = per-lane phase (pi/2 on cos lanes — folds cos into the
    shared sin polynomial), row 2 = validity x FreeNeRF mask
    (expand_lane_mask; `mask` may be a traced [F] array or None). Packing
    group identity into [1, L] rows instead of an in-kernel broadcasted
    iota keeps [bN, L]-sized integer/select temporaries off the kernel's
    scoped-VMEM stack — the margin that lets the saved-acts backward keep
    1024-row blocks."""
    import numpy as np

    L, _, _, freq = encode_lane_consts(n_freqs, log_space)
    g = np.arange(L) // 4
    phase = np.where(g > n_freqs, np.pi / 2, 0.0).astype(np.float32)
    m = expand_lane_mask(mask, n_freqs, L)
    return jnp.concatenate([jnp.asarray(freq)[None, :],
                            jnp.asarray(phase)[None, :],
                            m.astype(jnp.float32)], axis=0)


def prep_params(
    params: dict,
    n_layers: int = 8,
    skip: Tuple[int, ...] = (4,),
    compute_dtype=jnp.bfloat16,
    enc_lanes: Optional[Tuple[int, int]] = None,
) -> dict:
    """Flatten a flax NeRF params tree into padded bf16 kernel operands.

    Returns a dict of arrays:
      trunk_w: list over layers — plain layers get one [in, 256] matrix;
        the layer after each skip gets (W_h [256, 256], W_e [enc_pad, 256]).
      heads: sigma [256, 128pad], connection [256, 256],
        branch (W_feat [256, 128], W_dir [encd_pad, 128]), rgb [128, 128pad].

    enc_lanes: (n_freqs, n_freqs_views) — permute the encoding-consuming
    weight rows (layers_0, skip W_e, branch W_d) into the periodic-4
    IN-KERNEL encoding layout (encode_lane_consts) instead of zero-padding
    the reference layout; d_enc_pad/d_dir_pad become the lane counts L.
    """
    if skip and max(skip) >= n_layers - 1:
        raise ValueError(
            "fused kernel requires the skip concat to feed a TRUNK layer "
            f"(skip {skip} with n_layers {n_layers} would feed the heads)")
    p = params["params"]
    d_enc = p["layers_0"]["kernel"].shape[0]          # e.g. 63
    d_enc_pad = _round_up(d_enc, 64)
    cd = compute_dtype

    def pad_rows(w, rows):
        return jnp.zeros((rows, w.shape[1]), cd).at[: w.shape[0]].set(
            w.astype(cd))

    def lane_remap(w, src, valid):
        wl = jnp.take(w.astype(cd), jnp.asarray(src), axis=0)
        return wl * jnp.asarray(valid, cd)[:, None]

    enc_rows = pad_rows                 # encoding-consuming weight rows
    dir_rows = pad_rows                 # view-dir-consuming weight rows
    if enc_lanes is not None:
        Lx, src_x, valid_x, _ = encode_lane_consts(enc_lanes[0])
        Ld, src_d, valid_d, _ = encode_lane_consts(enc_lanes[1])
        d_enc_pad = Lx
        enc_rows = lambda w, rows: lane_remap(w, src_x, valid_x)  # noqa: E731
        dir_rows = lambda w, rows: lane_remap(w, src_d, valid_d)  # noqa: E731

    def pad_cols(w, cols):
        return jnp.zeros((w.shape[0], cols), cd).at[:, : w.shape[1]].set(
            w.astype(cd))

    out = {"d_enc": d_enc, "d_enc_pad": d_enc_pad}
    trunk_w, trunk_b = [], []
    for i in range(n_layers):
        w = p[f"layers_{i}"]["kernel"]
        b = p[f"layers_{i}"]["bias"].astype(cd)[None, :]
        if i > 0 and (i - 1) in skip:
            d = w.shape[1]
            w_h = w[:d].astype(cd)                     # [256, 256]
            w_e = enc_rows(w[d:], d_enc_pad)           # [enc_pad, 256]
            trunk_w.append((w_h, w_e))
        elif i == 0:
            trunk_w.append(enc_rows(w, d_enc_pad))
        else:
            trunk_w.append(w.astype(cd))
        trunk_b.append(b)

    d = p["connection"]["kernel"].shape[0]
    d_dir = p["branch"]["kernel"].shape[0] - d         # e.g. 27
    d_dir_pad = Ld if enc_lanes is not None else _round_up(d_dir, 32)
    out["d_dir"] = d_dir
    out["d_dir_pad"] = d_dir_pad

    out["trunk_w"] = trunk_w
    out["trunk_b"] = trunk_b
    out["w_sigma"] = pad_cols(p["sigma"]["kernel"], 128)
    out["b_sigma"] = pad_cols(p["sigma"]["bias"][None, :], 128)
    out["w_conn"] = p["connection"]["kernel"].astype(cd)
    out["b_conn"] = p["connection"]["bias"].astype(cd)[None, :]
    wb = p["branch"]["kernel"]
    out["w_branch_h"] = wb[:d].astype(cd)
    out["w_branch_d"] = dir_rows(wb[d:], d_dir_pad)
    out["b_branch"] = p["branch"]["bias"].astype(cd)[None, :]
    out["w_rgb"] = pad_cols(p["rgb"]["kernel"], 128)
    out["b_rgb"] = pad_cols(p["rgb"]["bias"][None, :], 128)
    out["n_layers"] = n_layers
    out["skip"] = tuple(skip)
    return out


def _kernel_body(n_layers, skip, density_activation, *refs):
    """Shared kernel: refs = (encx, encd, *weights, out)."""
    it = iter(refs)
    encx_ref = next(it)
    encd_ref = next(it)
    trunk = []
    for i in range(n_layers):
        if i > 0 and (i - 1) in skip:
            trunk.append((next(it), next(it), next(it)))
        else:
            trunk.append((next(it), next(it)))
    w_sigma, b_sigma, w_conn, b_conn = next(it), next(it), next(it), next(it)
    w_branch_h, w_branch_d, b_branch = next(it), next(it), next(it)
    w_rgb, b_rgb = next(it), next(it)
    out_ref = next(it)

    f32 = jnp.float32
    encx = encx_ref[:]
    h = None
    for i, layer in enumerate(trunk):
        if len(layer) == 3:
            w_h, w_e, b = layer
            y = (jnp.dot(h, w_h[:], preferred_element_type=f32)
                 + jnp.dot(encx, w_e[:], preferred_element_type=f32))
        elif i == 0:
            w, b = layer
            y = jnp.dot(encx, w[:], preferred_element_type=f32)
        else:
            w, b = layer
            y = jnp.dot(h, w[:], preferred_element_type=f32)
        h = jnp.maximum(y + b[:].astype(f32), 0.0).astype(jnp.bfloat16)

    sigma = (jnp.dot(h, w_sigma[:], preferred_element_type=f32)
             + b_sigma[:].astype(f32))                       # [BN, 128] col0
    if density_activation == "relu":
        sigma = jnp.maximum(sigma, 0.0)
    elif density_activation == "trunc_exp":
        sigma = jnp.exp(jnp.clip(sigma, -15.0, 15.0))

    feat = (jnp.dot(h, w_conn[:], preferred_element_type=f32)
            + b_conn[:].astype(f32)).astype(jnp.bfloat16)
    br = (jnp.dot(feat, w_branch_h[:], preferred_element_type=f32)
          + jnp.dot(encd_ref[:], w_branch_d[:], preferred_element_type=f32)
          + b_branch[:].astype(f32))
    br = jnp.maximum(br, 0.0).astype(jnp.bfloat16)
    rgb = jax.nn.sigmoid(
        jnp.dot(br, w_rgb[:], preferred_element_type=f32)
        + b_rgb[:].astype(f32))                              # [BN, 128] 0:3

    out_ref[:, 0:3] = rgb[:, 0:3]
    out_ref[:, 3:4] = sigma[:, 0:1]


@functools.partial(jax.jit, static_argnames=("n_layers", "skip",
                                             "density_activation",
                                             "block_rows", "interpret"))
def _fused_call(encx, encd, flat_weights, n_layers, skip,
                density_activation, block_rows, interpret=False):
    n = encx.shape[0]
    grid = (n // block_rows,)
    win = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_weights]
    kernel = functools.partial(_kernel_body, n_layers, skip,
                               density_activation)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, encx.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, encd.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *win,
        ],
        out_specs=pl.BlockSpec((block_rows, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        interpret=interpret,
    )(encx, encd, *flat_weights)


def _flatten_prepped(prepped) -> list:
    flat = []
    for i, layer in enumerate(prepped["trunk_w"]):
        if isinstance(layer, tuple):
            flat.extend([layer[0], layer[1], prepped["trunk_b"][i]])
        else:
            flat.extend([layer, prepped["trunk_b"][i]])
    flat.extend([prepped["w_sigma"], prepped["b_sigma"], prepped["w_conn"],
                 prepped["b_conn"], prepped["w_branch_h"],
                 prepped["w_branch_d"], prepped["b_branch"],
                 prepped["w_rgb"], prepped["b_rgb"]])
    return flat


def fused_nerf_mlp(
    prepped: dict,
    encx: jax.Array,
    encd: jax.Array,
    density_activation: str = "none",
    block_rows: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused MLP on pre-encoded features.

    Args:
      prepped: prep_params output. NOTE: contains static python ints — pass
        via closure when wrapping in jit, not as a traced argument.
      encx: [N, d_enc] positional features (any float dtype; cast to bf16).
        N is padded internally to a block multiple.
      encd: [N, d_dir_enc] view-dir features.
      interpret: pallas interpreter mode (CPU tests).

    Returns:
      [N, 4] float32 [rgb (sigmoid), sigma (raw/activated)].
    """
    n = encx.shape[0]
    n_pad = _round_up(max(n, block_rows), block_rows)
    ex = jnp.zeros((n_pad, prepped["d_enc_pad"]), jnp.bfloat16)
    ex = ex.at[:n, : encx.shape[1]].set(encx.astype(jnp.bfloat16))
    ed = jnp.zeros((n_pad, prepped["d_dir_pad"]), jnp.bfloat16)
    ed = ed.at[:n, : encd.shape[1]].set(encd.astype(jnp.bfloat16))
    out = _fused_call(ex, ed, tuple(_flatten_prepped(prepped)),
                      prepped["n_layers"], prepped["skip"],
                      density_activation, block_rows, interpret)
    return out[:n]


def make_fused_model_fn(
    params: dict,
    n_layers: int = 8,
    skip: Tuple[int, ...] = (4,),
    n_freqs: int = 10,
    n_freqs_views: int = 4,
    log_space: bool = True,
    density_activation: str = "none",
    interpret: bool = False,
    pos_mask=None,
    dir_mask=None,
):
    """Build a drop-in `model_fn(x, dirs) -> [..., 4]` backed by the fused
    kernel — interchangeable with `lambda x, d: model.apply(params, x, d)`
    for full-mode rendering (density-only calls fall back to needing dirs).

    pos_mask/dir_mask: optional FreeNeRF frequency masks applied to the
    encodings (mid-training validation renders).
    """
    from fsnerf_tpu.core.encoding import positional_encoding

    prepped = prep_params(params, n_layers=n_layers, skip=skip)

    def model_fn(x, dirs=None):
        assert dirs is not None, "fused kernel computes rgb+sigma jointly"
        shape = x.shape[:-1]
        encx = positional_encoding(x.reshape(-1, 3), n_freqs, log_space,
                                   pos_mask)
        encd = positional_encoding(dirs.reshape(-1, 3), n_freqs_views,
                                   log_space, dir_mask)
        out = fused_nerf_mlp(prepped, encx, encd,
                             density_activation=density_activation,
                             interpret=interpret)
        return out.reshape(*shape, 4)

    return model_fn


# ---------------------------------------------------------------------------
# Density-only kernel (trunk + sigma head — the occupancy-grid refresh path)
# ---------------------------------------------------------------------------

def _density_kernel_body(n_layers, skip, density_activation, *refs):
    """refs = (encx, *trunk-and-sigma weights, out)."""
    it = iter(refs)
    encx_ref = next(it)
    trunk = []
    for i in range(n_layers):
        if i > 0 and (i - 1) in skip:
            trunk.append((next(it), next(it), next(it)))
        else:
            trunk.append((next(it), next(it)))
    w_sigma, b_sigma = next(it), next(it)
    out_ref = next(it)

    f32 = jnp.float32
    encx = encx_ref[:]
    h = None
    for i, layer in enumerate(trunk):
        if len(layer) == 3:
            w_h, w_e, b = layer
            y = (jnp.dot(h, w_h[:], preferred_element_type=f32)
                 + jnp.dot(encx, w_e[:], preferred_element_type=f32))
        elif i == 0:
            w, b = layer
            y = jnp.dot(encx, w[:], preferred_element_type=f32)
        else:
            w, b = layer
            y = jnp.dot(h, w[:], preferred_element_type=f32)
        h = jnp.maximum(y + b[:].astype(f32), 0.0).astype(jnp.bfloat16)

    sigma = (jnp.dot(h, w_sigma[:], preferred_element_type=f32)
             + b_sigma[:].astype(f32))
    if density_activation == "relu":
        sigma = jnp.maximum(sigma, 0.0)
    elif density_activation == "trunc_exp":
        sigma = jnp.exp(jnp.clip(sigma, -15.0, 15.0))
    out_ref[:] = sigma[:, 0:1]


@functools.partial(jax.jit, static_argnames=("n_layers", "skip",
                                             "density_activation",
                                             "block_rows", "interpret"))
def _density_call(encx, flat_weights, n_layers, skip, density_activation,
                  block_rows, interpret=False):
    n = encx.shape[0]
    kernel = functools.partial(_density_kernel_body, n_layers, skip,
                               density_activation)
    return pl.pallas_call(
        kernel,
        grid=(n // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, encx.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_weights],
        ],
        out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
    )(encx, *flat_weights)


def _flatten_density(prepped) -> list:
    flat = []
    for i, layer in enumerate(prepped["trunk_w"]):
        if isinstance(layer, tuple):
            flat.extend([layer[0], layer[1], prepped["trunk_b"][i]])
        else:
            flat.extend([layer, prepped["trunk_b"][i]])
    flat.extend([prepped["w_sigma"], prepped["b_sigma"]])
    return flat


def fused_density(
    prepped: dict,
    encx: jax.Array,
    density_activation: str = "none",
    block_rows: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Density-only fused MLP (trunk + sigma head, no view branch).

    Matches the occupancy-grid EMA refresh workload (og.update's density_fn;
    reference run-nerf.py:288-289 occ_eval_fn). MEASURED NOT A WIN for that
    path on v5e: wiring it into maybe_update_grid ran the full train step ~4%
    slower than the XLA density pass (forward-only workloads pipeline better
    through XLA — same result as the round-1 fused inference kernel). Kept as
    tested infrastructure for future in-kernel fusion of refresh + binarize.

    Returns [N] raw/activated sigma.
    """
    n = encx.shape[0]
    n_pad = _round_up(max(n, block_rows), block_rows)
    ex = jnp.zeros((n_pad, prepped["d_enc_pad"]), jnp.bfloat16)
    ex = ex.at[:n, : encx.shape[1]].set(encx.astype(jnp.bfloat16))
    out = _density_call(ex, tuple(_flatten_density(prepped)),
                        prepped["n_layers"], prepped["skip"],
                        density_activation, block_rows, interpret)
    return out[:n, 0]


def make_fused_density_fn(
    params: dict,
    n_layers: int = 8,
    skip: Tuple[int, ...] = (4,),
    n_freqs: int = 10,
    log_space: bool = True,
    density_activation: str = "none",
    interpret: bool = False,
    pos_mask=None,
):
    """Drop-in density_fn(x [N,3]) -> [N] sigma for og.update."""
    from fsnerf_tpu.core.encoding import positional_encoding

    prepped = prep_params(params, n_layers=n_layers, skip=skip)

    def density_fn(x):
        shape = x.shape[:-1]
        encx = positional_encoding(x.reshape(-1, 3), n_freqs, log_space,
                                   pos_mask)
        return fused_density(prepped, encx,
                             density_activation=density_activation,
                             interpret=interpret).reshape(shape)

    return density_fn
