"""Device mesh construction and sharding helpers.

Design (scaling-book recipe): one 1-D mesh axis 'data' over all chips; rays
are i.i.d., so data parallelism over rays is exact — sharded gradients psum
to the same math as single-chip. The model (a ~1.2M-param MLP) and the
occupancy grid are replicated; there is no TP/PP/EP axis because there is
nothing to shard at this model scale (SURVEY.md section 2.3: 'not applicable
by design').

Multi-host: in a multi-process run (one JAX process per host / slice), the
mesh becomes 2-D ('replica' over DCN x 'data' over ICI) with hosts laid out
on the OUTER axis — the gradient reduction then resolves hierarchically
(reduce-scatter/all-reduce on ICI inside each slice, a single all-reduce of
the already-reduced values over DCN), which is the layout the slow DCN hop
wants. All sharding helpers treat every mesh axis as a batch axis, so the
same code serves both shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-process JAX (one process per host).

    On TPU pods jax.distributed.initialize() autodetects everything from the
    runtime metadata; arguments are for manual (e.g. GPU/CPU) bring-up.
    No-op when already initialized or when running single-process.

    MUST run before any backend-touching JAX API (jax.devices(),
    jax.process_count(), ...): initialize() after backend init fails. The
    is-already-initialized check therefore uses jax.distributed.is_initialized
    — which does NOT touch the backend — never process_count().
    """
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:                # single-process environment
            return
    else:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def make_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    """Data-parallel mesh over the first `n_devices` devices (0 = all).

    Single-process: a 1-D ('data',) mesh. Multi-process: a 2-D
    ('replica', 'data') hybrid mesh with processes on the outer (DCN) axis —
    see make_hybrid_mesh. Both shard batches over every axis and replicate
    params, so downstream code is shape-agnostic.
    """
    if jax.process_count() > 1 and not n_devices:
        return make_hybrid_mesh()
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_hybrid_mesh(dcn_axis: str = "replica", ici_axis: str = "data",
                     n_groups: int = 0) -> Mesh:
    """2-D mesh: process/slice groups on the outer (DCN) axis, each group's
    chips on the inner (ICI) axis.

    Devices are grouped by process_index (host locality == ICI locality on
    TPU slices). `n_groups` overrides the grouping for single-process
    testing — e.g. n_groups=2 on the 8-device virtual CPU mesh simulates
    2 hosts x 4 chips. NOTE: n_groups is keyword-only in spirit — the first
    positional is the AXIS NAME; make_hybrid_mesh(2) would silently name an
    axis `2` (ints are legal jax axis names, and collectives then misparse
    them as positional axes), hence the guard below.
    """
    assert isinstance(dcn_axis, str) and isinstance(ici_axis, str), (
        "axis names must be strings — did you mean n_groups=...?")
    devs = jax.devices()
    if n_groups:
        assert len(devs) % n_groups == 0, (len(devs), n_groups)
        arr = np.array(devs).reshape(n_groups, -1)
    else:
        by_proc = {}
        for d in devs:
            by_proc.setdefault(d.process_index, []).append(d)
        counts = {len(v) for v in by_proc.values()}
        assert len(counts) == 1, f"uneven devices per process: {by_proc}"
        arr = np.array([by_proc[p] for p in sorted(by_proc)])
    return Mesh(arr, (dcn_axis, ici_axis))


def batch_sharding(mesh: Mesh, axis: str = None) -> NamedSharding:
    """Shard the leading (ray) axis across EVERY mesh axis (1-D: 'data';
    hybrid: ('replica', 'data') — rays are i.i.d. so both are batch axes)."""
    axes = (axis,) if axis else tuple(mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = None):
    """Place a (rays_o, rays_d, rgb) batch sharded over the ray axis."""
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, grid, opt state) across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
