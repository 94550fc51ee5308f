"""Device mesh construction and sharding helpers.

Design (scaling-book recipe): one 1-D mesh axis 'data' over all chips; rays
are i.i.d., so data parallelism over rays is exact — sharded gradients psum
to the same math as single-chip. The model (a ~1.2M-param MLP) and the
occupancy grid are replicated; there is no TP/PP/EP axis because there is
nothing to shard at this model scale (SURVEY.md section 2.3: 'not applicable
by design').
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D mesh over the first `n_devices` devices (0 = all)."""
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a (rays_o, rays_d, rgb) batch sharded over the ray axis."""
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, grid, opt state) across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
