"""Torch-checkpoint interop: migrate reference `nn.pt` state dicts.

The reference persists trained models with
``torch.save(model.state_dict(), <out>/.../model/nn.pt)``
(reference src/run-nerf.py:420-437) and reloads them for --render_only
(run-nerf.py:414-417). A user switching to fsnerf_tpu can load those
checkpoints directly — and export back for any reference-side tooling.

Key schemas (reference src/core/models.py):

  NeRF   (models.py:96-108):   layers.{i}.{weight,bias}  i = 0..n_layers-1,
         sigma.*, connection.*, branch.*, rgb.*
  SiNeRF (models.py:269-283):  first_layers.{i}.fc_layer.* (SirenLinear wraps
         an nn.Linear as `fc_layer`, models.py:201), sigma_layers.0.fc_layer.*,
         sigma_layers.1.*, fc_feature.*, rgb_layers.0.fc_layer.*,
         rgb_layers.1.*

torch.nn.Linear stores `weight` as [out, in]; flax kernels are [in, out],
so every weight transposes on the way through. Sizes (n_layers, d_filter,
skip, n_freqs) are carried by the tensor shapes — the mapping is purely
name-based, so any reference-legal architecture round-trips.

Entry points:
  import_torch_state_dict  state-dict (tensors or arrays) -> flax params
  export_torch_state_dict  flax params -> reference-keyed numpy state dict
  load_torch_checkpoint    nn.pt path -> flax params (torch imported lazily;
                           optional shape/structure validation vs a live
                           params tree)

CLI: ``--import_torch_ckpt nn.pt`` initializes training from the imported
weights, or (with ``--render_only``) renders them directly — the occupancy
grid the checkpoint does not carry is rebuilt from the imported densities.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

__all__ = [
    "detect_family",
    "import_torch_state_dict",
    "export_torch_state_dict",
    "load_torch_checkpoint",
]

# flax module name <-> reference state-dict prefix, for the fixed-name heads.
_NERF_HEADS = ("sigma", "connection", "branch", "rgb")
_SINERF_FIXED = {
    "sigma_0": "sigma_layers.0.fc_layer",
    "sigma_1": "sigma_layers.1",
    "fc_feature": "fc_feature",
    "rgb_0": "rgb_layers.0.fc_layer",
    "rgb_1": "rgb_layers.1",
}
_SINERF_FIXED_INV = {v: k for k, v in _SINERF_FIXED.items()}


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):            # torch tensor, no hard torch import
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def detect_family(keys) -> str:
    """'nerf' | 'sinerf' from reference state-dict key names."""
    keys = list(keys)
    if any(k.startswith("first_layers.") for k in keys):
        return "sinerf"
    if any(k.startswith("layers.") for k in keys):
        return "nerf"
    raise ValueError(
        "state dict matches neither reference NeRF (layers.*) nor SiNeRF "
        f"(first_layers.*) schema; keys: {sorted(keys)[:8]}...")


def _flax_name(prefix: str, family: str) -> str:
    """Reference key prefix (everything before .weight/.bias) -> flax module."""
    if family == "nerf":
        m = re.fullmatch(r"layers\.(\d+)", prefix)
        if m:
            return f"layers_{m.group(1)}"
        if prefix in _NERF_HEADS:
            return prefix
    else:
        m = re.fullmatch(r"first_layers\.(\d+)\.fc_layer", prefix)
        if m:
            return f"first_{m.group(1)}"
        if prefix in _SINERF_FIXED_INV:
            return _SINERF_FIXED_INV[prefix]
    raise ValueError(f"unrecognized reference {family} key: {prefix!r}")


def _torch_prefix(name: str) -> str:
    """flax module name -> reference state-dict prefix (both families)."""
    m = re.fullmatch(r"layers_(\d+)", name)
    if m:
        return f"layers.{m.group(1)}"
    if name in _NERF_HEADS:
        return name
    m = re.fullmatch(r"first_(\d+)", name)
    if m:
        return f"first_layers.{m.group(1)}.fc_layer"
    if name in _SINERF_FIXED:
        return _SINERF_FIXED[name]
    raise ValueError(f"unrecognized flax module name: {name!r}")


def import_torch_state_dict(state_dict: Dict) -> Dict:
    """Reference state dict -> flax params pytree {'params': {module: ...}}.

    Accepts torch tensors or anything np.asarray takes. Raises on unknown
    keys and on modules missing either weight or bias.
    """
    family = detect_family(state_dict.keys())
    modules: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in state_dict.items():
        prefix, _, leaf = key.rpartition(".")
        if leaf not in ("weight", "bias"):
            raise ValueError(f"unexpected state-dict entry: {key!r}")
        name = _flax_name(prefix, family)
        arr = _to_numpy(val)
        entry = modules.setdefault(name, {})
        if leaf == "weight":
            entry["kernel"] = np.ascontiguousarray(arr.T)   # [out,in]->[in,out]
        else:
            entry["bias"] = arr
    for name, entry in modules.items():
        missing = {"kernel", "bias"} - set(entry)
        if missing:
            raise ValueError(f"module {name!r} missing {sorted(missing)}")
    return {"params": modules}


def export_torch_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """flax params -> reference-keyed numpy state dict (import's inverse)."""
    p = params.get("params", params)
    out: Dict[str, np.ndarray] = {}
    for name, entry in p.items():
        prefix = _torch_prefix(name)
        out[f"{prefix}.weight"] = np.ascontiguousarray(
            _to_numpy(entry["kernel"]).T)
        out[f"{prefix}.bias"] = _to_numpy(entry["bias"])
    return out


def load_torch_checkpoint(path: str, expect: Optional[Dict] = None) -> Dict:
    """Load a reference nn.pt and convert to flax params.

    expect: an initialized params tree (e.g. from init_params) to validate
    structure and shapes against — catches architecture mismatches (wrong
    n_layers/d_filter/skip/n_freqs) with a precise error instead of a shape
    blow-up deep inside jit.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = import_torch_state_dict(sd)
    if expect is not None:
        import jax

        want = jax.tree.structure(expect)
        got = jax.tree.structure(params)
        if want != got:
            raise ValueError(
                f"imported checkpoint structure does not match the configured "
                f"model:\n  config expects {want}\n  checkpoint has {got}")
        for kp, a in jax.tree_util.tree_leaves_with_path(expect):
            b = params
            for k in kp:
                b = b[k.key]
            if tuple(a.shape) != tuple(b.shape):
                path_s = "/".join(k.key for k in kp)
                raise ValueError(
                    f"shape mismatch at {path_s}: config expects {a.shape}, "
                    f"checkpoint has {b.shape} — check n_layers/d_filter/"
                    f"skip/n_freqs against the checkpoint's training config")
    return params
