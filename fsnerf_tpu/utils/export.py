"""AOT serving artifacts: serialize a compiled frame renderer to disk.

The reference has no deployment story — rendering is driven in-process by
the research script (reference src/run-nerf.py:440-468). For production
serving, re-tracing and re-compiling a Python model at process start is the
wrong shape: this module exports the trained renderer as a self-contained
StableHLO artifact (jax.export) with the parameters and occupancy grid baked
in as constants. A serving process needs only JAX and this file back — no
model code, no config system, no checkpoint restore:

    fn, meta = load_render_artifact(path)     # fn: (rays_o, rays_d)
    rgb, depth = render_frame_exported(path_or_loaded, pose)

Self-containment: `load_render_artifact` needs only JAX (the artifact
carries the whole program); the `render_frame_exported` convenience ALSO
imports fsnerf_tpu.data.rays for camera-ray generation — a serving process
that builds its own rays can use the loaded callable directly without the
package.

Artifacts are platform-specific (the export records the lowering platform;
a TPU export replays on TPU only — Pallas custom calls included, verified
on v5e). Chunk shapes are static: the callable accepts exactly
[chunksize, 3] ray arrays and `render_frame_exported` does the chunk/pad
loop, mirroring render/renderer.py::render_frame.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ARTIFACT_FILE = "renderer.stablehlo"
_META_FILE = "meta.json"


def export_render_artifact(
    chunk_renderer: Callable,
    chunksize: int,
    out_path: str,
    *,
    hwf: Tuple[int, int, float],
    near: float,
    far: float,
    ndc: bool = False,
    extra_meta: Optional[dict] = None,
) -> str:
    """Serialize `chunk_renderer` (a jitted (rays_o, rays_d) -> (rgb, depth)
    program from render/renderer.py::make_chunk_renderer, with params/grid
    closed over) to `out_path/`.

    Returns the artifact directory path.
    """
    from jax import export as jexport

    spec = jax.ShapeDtypeStruct((chunksize, 3), jnp.float32)
    exported = jexport.export(
        chunk_renderer if hasattr(chunk_renderer, "lower")
        else jax.jit(chunk_renderer))(spec, spec)
    os.makedirs(out_path, exist_ok=True)
    with open(os.path.join(out_path, _ARTIFACT_FILE), "wb") as fh:
        fh.write(exported.serialize())
    meta = {
        "chunksize": int(chunksize),
        "hwf": [int(hwf[0]), int(hwf[1]), float(hwf[2])],
        "near": float(near),
        "far": float(far),
        "ndc": bool(ndc),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    meta.update(extra_meta or {})
    with open(os.path.join(out_path, _META_FILE), "w") as fh:
        json.dump(meta, fh, indent=1)
    return out_path


def load_render_artifact(path: str) -> Tuple[Callable, dict]:
    """Deserialize an exported renderer: returns (fn, meta).

    fn(rays_o, rays_d) is jitted; both arguments must be
    [meta["chunksize"], 3] float32 (use render_frame_exported for whole
    frames)."""
    from jax import export as jexport

    with open(os.path.join(path, _ARTIFACT_FILE), "rb") as fh:
        exported = jexport.deserialize(bytearray(fh.read()))
    with open(os.path.join(path, _META_FILE)) as fh:
        meta = json.load(fh)
    return jax.jit(exported.call), meta


def render_frame_exported(artifact, pose,
                          compact_transfer: bool = False,
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Render a full frame from a pose through an exported renderer.

    `artifact`: a path or a (fn, meta) pair from load_render_artifact.
    Mirrors render/renderer.py::render_frame's chunk/pad loop (static chunk
    shapes; padded rays point down the -z axis and are cropped after).

    `compact_transfer`: quantize on device before the device->host pull
    (rgb to uint8 with to8b semantics, depth to float16) — 4x less
    transfer; use on tunneled/remote TPU setups where device->host
    bandwidth is the bottleneck (see render/renderer.py::render_path).

    Returns (rgb [H, W, 3], depth [H, W]) as numpy arrays (uint8/float16
    when compact_transfer).
    """
    from fsnerf_tpu.data.rays import get_rays, to_ndc

    fn, meta = (load_render_artifact(artifact)
                if isinstance(artifact, (str, os.PathLike)) else artifact)
    H, W, focal = meta["hwf"]
    chunksize = meta["chunksize"]
    rays_o, rays_d = get_rays(jnp.asarray(pose, jnp.float32), (H, W, focal))
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    if meta.get("ndc"):
        rays_o, rays_d = to_ndc(rays_o, rays_d, (H, W, focal), 1.0)
    n_rays = H * W
    n_chunks = -(-n_rays // chunksize)
    pad = n_chunks * chunksize - n_rays
    if pad:
        rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
        rays_d = jnp.concatenate(
            [rays_d, jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (pad, 1))],
            axis=0)
    imgs, depths = [], []
    for c in range(n_chunks):
        sl = slice(c * chunksize, (c + 1) * chunksize)
        rgb, depth = fn(rays_o[sl], rays_d[sl])
        imgs.append(rgb)
        depths.append(depth)
    img = jnp.concatenate(imgs, axis=0)[:n_rays].reshape(H, W, 3)
    depth = jnp.clip(jnp.concatenate(depths, axis=0)[:n_rays],
                     meta["near"], meta["far"]).reshape(H, W)
    if compact_transfer:
        img = (255.0 * jnp.clip(img, 0.0, 1.0)).astype(jnp.uint8)
        depth = depth.astype(jnp.float16)
    return np.asarray(img), np.asarray(depth)
