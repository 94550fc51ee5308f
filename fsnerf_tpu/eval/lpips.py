"""LPIPS perceptual metric: VGG16 backbone + learned linear heads, in flax.

Reference counterpart: lpips.LPIPS(net='vgg') — cuDNN VGG16 convs invoked at
run-nerf.py:100,163-177 (whose result the reference then discards at :178).
Here the architecture is implemented natively (XLA handles convs on the MXU);
the PRETRAINED WEIGHTS (torchvision VGG16 + LPIPS linear layers) do not ship
with this offline environment, so `load_lpips()` returns None unless a
weights file is provided — eval then reports lpips=None, which is exactly
the reference's effective behavior.

Weight file format (npz), convertible from the torch lpips package with
`python -m fsnerf_tpu.eval.lpips export <out.npz>` on a machine that has it:
  conv{i}_kernel [kh, kw, cin, cout], conv{i}_bias [cout]  for i in 0..12
  lin{j} [c_j] non-negative per-channel weights            for j in 0..4
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: channel widths, 'M' = 2x2 maxpool.
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
# indices (in conv order) after which LPIPS taps features: relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3
_TAPS = [1, 3, 6, 9, 12]

# lpips input scaling layer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__),
                               "lpips_vgg_weights.npz")


def _vgg_features(x: jax.Array, weights: dict) -> list:
    """Run VGG16 convs, returning the 5 tapped relu feature maps.

    x: [H, W, 3] scaled input -> NCHW conv pipeline.
    """
    h = x[None].transpose(0, 3, 1, 2)      # [1, 3, H, W]
    feats = []
    conv_i = 0
    for c in _VGG_CFG:
        if c == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
            continue
        k = weights[f"conv{conv_i}_kernel"]    # [kh, kw, cin, cout]
        b = weights[f"conv{conv_i}_bias"]
        h = jax.lax.conv_general_dilated(
            h, jnp.transpose(k, (3, 2, 0, 1)), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = jax.nn.relu(h + b[None, :, None, None])
        if conv_i in _TAPS:
            feats.append(h)
        conv_i += 1
    return feats


def lpips_distance(img0: jax.Array, img1: jax.Array,
                   weights: dict) -> jax.Array:
    """LPIPS(img0, img1) for [H, W, 3] images in [0, 1]."""
    def prep(im):
        im = im * 2.0 - 1.0                        # [-1, 1]
        return (im - _SHIFT) / _SCALE

    f0 = _vgg_features(prep(img0), weights)
    f1 = _vgg_features(prep(img1), weights)
    total = jnp.zeros(())
    for j, (a, b) in enumerate(zip(f0, f1)):
        # unit-normalize along channels
        an = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        bn = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (an - bn) ** 2                         # [1, C, H, W]
        lin = weights[f"lin{j}"]                   # [C]
        total = total + jnp.mean(jnp.sum(d * lin[None, :, None, None],
                                         axis=1))
    return total


def load_lpips(path: Optional[str] = None) -> Optional[Callable]:
    """Return a jitted (img0, img1) -> scalar LPIPS fn, or None if weights
    are unavailable (offline environment)."""
    path = path or os.environ.get("FSNERF_LPIPS_WEIGHTS", DEFAULT_WEIGHTS)
    if not os.path.exists(path):
        return None
    raw = np.load(path)
    weights = {k: jnp.asarray(raw[k]) for k in raw.files}
    return jax.jit(lambda a, b: lpips_distance(a, b, weights))


def export_from_torch(out_path: str) -> None:
    """Convert torchvision VGG16 + lpips linear weights to the npz format
    (requires the torch `lpips` package; run where it is installed)."""
    import lpips as lpips_pkg  # type: ignore
    import torch

    net = lpips_pkg.LPIPS(net="vgg")
    out = {}
    conv_i = 0
    for layer in net.net.slice1 + net.net.slice2 + net.net.slice3 + \
            net.net.slice4 + net.net.slice5:  # type: ignore
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{conv_i}_kernel"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0))
            out[f"conv{conv_i}_bias"] = layer.bias.detach().numpy()
            conv_i += 1
    for j, lin in enumerate(net.lins):
        out[f"lin{j}"] = (
            lin.model[-1].weight.detach().numpy().reshape(-1))
    np.savez(out_path, **out)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 2 and sys.argv[1] == "export":
        export_from_torch(sys.argv[2])
