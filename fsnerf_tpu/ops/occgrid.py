"""Multi-level binarized occupancy grid (pure JAX, jit-compatible pytree).

TPU-native replacement for nerfacc.OccGridEstimator (reference: built at
run-nerf.py:96-98 with res 128, levels 1 synthetic / 4 llff; updated every
step via update_every_n_steps at run-nerf.py:287-295 with occ_eval_fn =
model(x) * render_step_size and occ_thre 1e-2).

Redesign: instead of driving CUDA DDA traversal, the grid is a *mask source*
for dense sample lattices (ops/sampling.py). Semantics preserved from nerfacc
0.5.3:
  * level l covers the base AABB scaled by 2**l about its center; a point is
    classified by the finest level containing it.
  * EMA update: occs <- max(occs * ema_decay, occ_eval(x)) on refreshed cells,
    evaluated at uniformly jittered positions inside each cell.
  * binarize at occ > min(occ_thre, mean(occs)).
  * warmup (step < warmup_steps): refresh ALL cells; afterwards refresh a
    1/update_parts round-robin slice (static shapes; nerfacc samples 1/4 of
    cells uniformly at random + occupied cells — round-robin gives the same
    refresh rate deterministically without gather/scatter of random indices).

The grid state is a flax.struct pytree so it threads through jit/scan and
shards trivially (it is replicated across the data-parallel mesh).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class OccGrid:
    occs: jax.Array        # [L, res**3] float32 EMA occupancy values
    occs_q: Optional[jax.Array]
                           # [L, res**3] uint32 PACKED query table: high 16
                           # bits = occ ERODED over a Chebyshev radius of
                           # query_dilation+1 cells, as bf16 (the early-
                           # termination optical-depth estimate), low 16
                           # bits = occ max-pooled over a
                           # (2*query_dilation+1)^2 XY window as bf16 (the
                           # stride-lossless occupancy test; the raw occ at
                           # radius 0). One row gather serves both. The od
                           # channel must UNDERESTIMATE the ray's true
                           # optical depth: any overestimate truncates rays
                           # before their true termination and training
                           # parks floaters in the kept prefix. Feeding the
                           # dilated max collapsed training through its own
                           # dilation shell (r3 study); even the cell's OWN
                           # occ is an overestimate for rays that merely
                           # clip a surface cell — on thin geometry
                           # (LatticeScene) grazing rays collect phantom od
                           # from shell cells and the occgrid path lost
                           # ~15 dB held-out vs early-stop-off (r5 study,
                           # benchmarks/ab_lattice_occgrid.py). Erosion
                           # zeroes every cell reachable without entering
                           # the material, so od only accumulates strictly
                           # inside solids — conservative by construction,
                           # and it keeps the behind-surface pruning that
                           # volumetric interiors (the bench sphere) rely
                           # on. None = no od estimate (early stop
                           # disabled); queries read occupancy from occs
                           # directly. The Z halves of both windows happen
                           # at query time as lane-window min/max over the
                           # gathered row — free, no extra table.
    binaries: jax.Array    # [L, res**3] bool (= occs > thre; kept for
                           # diagnostics; queries derive occupancy from
                           # occs_q + thre with a single gather)
    thre: jax.Array        # scalar binarization threshold
    base_aabb: jax.Array   # [6]
    resolution: int = flax.struct.field(pytree_node=False, default=128)
    levels: int = flax.struct.field(pytree_node=False, default=1)
    # Chebyshev dilation radius of the query tables. Radius r makes a query
    # stride of 2*(r+1)*cell/dt_max lossless (see auto_query_plan): every
    # sample's cell is within r cells (per axis) of its group's queried
    # sample's cell, so occupied cells can never be missed — dilation only
    # adds conservative false-positives at region boundaries.
    query_dilation: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def n_cells(self) -> int:
        return self.resolution ** 3


def create(aabb, resolution: int = 128, levels: int = 1,
           query_dilation: int = 0) -> OccGrid:
    """Fresh grid, fully occupied (nerfacc starts binaries at zero but its
    sampling only prunes via the sigma callback until the first update; an
    all-occupied start means the first steps sample everywhere, matching the
    effective reference behavior before the grid warms up). thre starts
    negative so occs=0 cells count as occupied until the first update."""
    n = resolution ** 3
    occs = jnp.zeros((levels, n), jnp.float32)
    return OccGrid(
        occs=occs,
        occs_q=_build_query_table(occs, resolution, query_dilation),
        binaries=jnp.ones((levels, n), bool),
        thre=jnp.asarray(-1.0, jnp.float32),
        base_aabb=jnp.asarray(aabb, jnp.float32),
        resolution=resolution,
        levels=levels,
        query_dilation=query_dilation,
    )


def _dilate_xy(occs: jax.Array, res: int, radius: int) -> jax.Array:
    """Max-pool each level's [res, res, res] volume over a (2r+1)^2 window in
    the (ix, iy) axes (separable shifted maxima, -inf edge semantics). The
    iz axis is NOT pooled here: queries gather whole z-rows, so the z window
    is applied in-register (query-time lane max) at zero HBM cost."""
    L = occs.shape[0]
    vol = occs.reshape(L, res, res, res)
    for axis in (1, 2):
        for _ in range(radius):
            lo = jnp.concatenate(
                [vol[(slice(None),) * axis + (slice(1, None),)],
                 jnp.full_like(vol[(slice(None),) * axis + (slice(0, 1),)],
                               -jnp.inf)], axis=axis)
            hi = jnp.concatenate(
                [jnp.full_like(vol[(slice(None),) * axis + (slice(0, 1),)],
                               -jnp.inf),
                 vol[(slice(None),) * axis + (slice(0, -1),)]], axis=axis)
            vol = jnp.maximum(vol, jnp.maximum(lo, hi))
    return vol.reshape(L, res ** 3)


def _erode_xy(occs: jax.Array, res: int, radius: int) -> jax.Array:
    """Min-pool each level's [res, res, res] volume over a (2r+1)^2 window in
    the (ix, iy) axes (separable shifted minima). Edge semantics: outside
    the volume is EMPTY (occ 0), so boundary cells erode to 0 — a cell only
    keeps its value if every XY neighbor within r exists and is at least as
    occupied. The iz half of the erosion window is applied in-register at
    query time (lane-window min), mirroring _dilate_xy."""
    L = occs.shape[0]
    vol = occs.reshape(L, res, res, res)
    for axis in (1, 2):
        for _ in range(radius):
            zero = jnp.zeros_like(
                vol[(slice(None),) * axis + (slice(0, 1),)])
            lo = jnp.concatenate(
                [vol[(slice(None),) * axis + (slice(1, None),)], zero],
                axis=axis)
            hi = jnp.concatenate(
                [zero, vol[(slice(None),) * axis + (slice(0, -1),)]],
                axis=axis)
            vol = jnp.minimum(vol, jnp.minimum(lo, hi))
    return vol.reshape(L, res ** 3)


def _bf16_bits(x: jax.Array) -> jax.Array:
    """bf16 bit pattern of non-negative f32 values, as uint32 in [0, 2^16)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.bfloat16), jnp.uint16)
    return b.astype(jnp.uint32)


def _build_query_table(occs: jax.Array, res: int, radius: int) -> jax.Array:
    """Packed uint32 query table (see OccGrid.occs_q): the eroded od channel
    (bf16, high bits; XY erosion radius = query radius + 1, covering the
    strided query's up-to-`radius`-cell position slack plus one cell for
    the sample's own shell) alongside the XY-dilated occupancy max (bf16,
    low bits; the raw occ at radius 0). Both halves are nudged one bf16 ulp
    in their CONSERVATIVE direction before rounding: occupancy up (a flip
    below threshold would hide a surface), od down (a flip up would
    truncate a ray early)."""
    ero = _erode_xy(occs, res, radius + 1) * (1.0 - 2.0 ** -8)
    base = occs if radius <= 0 else _dilate_xy(occs, res, radius)
    dil = base * (1.0 + 2.0 ** -8)   # conservative
    return (_bf16_bits(ero) << 16) | _bf16_bits(dil)


def _unpack_query_rows(rows: jax.Array):
    """(eroded_occ, dilated_occ) f32 halves of packed uint32 query rows."""
    ero = jax.lax.bitcast_convert_type(
        (rows >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    dil = jax.lax.bitcast_convert_type(
        (rows & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    return ero, dil


def level_aabb(base_aabb: jax.Array, level: int) -> jax.Array:
    """AABB of `level`: base scaled by 2**level about its center."""
    lo, hi = base_aabb[:3], base_aabb[3:]
    center = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo) * (2.0 ** level)
    return jnp.concatenate([center - half, center + half])


def outer_aabb(grid: OccGrid) -> jax.Array:
    """AABB of the coarsest level — the sampling domain for rays."""
    return level_aabb(grid.base_aabb, grid.levels - 1)


def _cell_index(norm: jax.Array, res: int) -> jax.Array:
    """Flattened cell index for normalized coords in [0,1)^3. norm: [..., 3]."""
    ijk = jnp.clip((norm * res).astype(jnp.int32), 0, res - 1)
    return (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]


def query(grid: OccGrid, x: jax.Array) -> jax.Array:
    """Occupancy lookup: True where the finest containing level says occupied.

    TPU lowering note: a flat per-sample gather from the [res^3] grid is
    latency-bound (~4.5 ms for 512k samples on v5e); gathering whole z-rows
    ([res] cells — the embedding-lookup pattern) and selecting the cell with
    a compare-multiply-reduce is ~3x faster. The per-sample LEVEL is resolved
    first so any number of levels costs exactly one row gather.

    Args:
      x: [..., 3] world-space points.

    Returns:
      [...] bool; False outside all levels.
    """
    res = grid.resolution
    row = jnp.zeros(x.shape[:-1], jnp.int32)
    z = jnp.zeros(x.shape[:-1], jnp.int32)
    found = jnp.zeros(x.shape[:-1], bool)
    for l in range(grid.levels):          # static unroll (levels <= 4)
        ab = level_aabb(grid.base_aabb, l)
        lo, hi = ab[:3], ab[3:]
        norm = (x - lo) / (hi - lo)
        inb = jnp.all((norm >= 0.0) & (norm < 1.0), axis=-1)
        ijk = jnp.clip((norm * res).astype(jnp.int32), 0, res - 1)
        row_l = (l * res + ijk[..., 0]) * res + ijk[..., 1]
        take = inb & ~found
        row = jnp.where(take, row_l, row)
        z = jnp.where(take, ijk[..., 2], z)
        found = found | inb
    _, dil = _gather_query_values(grid, row, z)
    return (dil > grid.thre) & found


def _gather_query_values(grid: OccGrid, row: jax.Array, z: jax.Array):
    """ONE whole-z-row gather -> (eroded_occ, occupancy_value) per query.

    eroded_occ: the Chebyshev-eroded EMA occ (the early-termination
    optical-depth estimate — must UNDERESTIMATE, see OccGrid.occs_q; the
    XY erosion lives in the packed table, the Z half is an in-register
    lane-window MIN, with out-of-volume z treated as empty). 0 when the
    grid has no query table (no od estimate -> early stop inert).
    occupancy_value: the value the `> thre` occupancy test uses — the
    Chebyshev-dilated max when query_dilation > 0 (XY half from the packed
    table, Z half as an in-register lane-window max), else the cell's own
    occ.
    """
    res = grid.resolution
    n2 = grid.levels * res * res
    radius = grid.query_dilation
    iota_shape = (*row.shape, res)
    iota = jax.lax.broadcasted_iota(jnp.int32, iota_shape, len(row.shape))
    hit = iota == z[..., None]
    if grid.occs_q is None:
        rows = grid.occs.reshape(n2, res)[row]
        own = jnp.sum(rows * hit.astype(rows.dtype), axis=-1)
        return jnp.zeros_like(own), own
    rows = grid.occs_q.reshape(n2, res)[row]
    ero_rows, dil_rows = _unpack_query_rows(rows)
    er = radius + 1
    win_e = jnp.abs(iota - z[..., None]) <= er
    ero = jnp.min(jnp.where(win_e, ero_rows, jnp.inf), axis=-1)
    # z-window rows clipped by the volume boundary see EMPTY outside
    ero = jnp.where((z < er) | (z > res - 1 - er), 0.0, ero)
    if radius > 0:
        win = jnp.abs(iota - z[..., None]) <= radius
        dil = jnp.max(jnp.where(win, dil_rows, -jnp.inf), axis=-1)
    else:
        dil = jnp.sum(dil_rows * hit.astype(dil_rows.dtype), axis=-1)
    return ero, dil


def auto_query_stride(aabb, resolution: int, step_size: float,
                      n_samples: int, max_stride: int = 4,
                      dilation: int = 0) -> int:
    """Largest safe sample stride for occupancy queries.

    Ray samples march at `step_size` but grid cells are typically several
    steps wide, so querying every sample is redundant HBM gather traffic
    (the gather cost is LINEAR in row count: ~3 ns/row on v5e — the dominant
    non-MLP train-step cost and the dominant render-chunk cost at stride 1).

    dilation == 0: querying one sample per group of `stride` is provably
    lossless for any cell at least stride*step_size wide: such a cell covers
    >= stride consecutive sample indices, and any `stride` consecutive
    integers contain a multiple of `stride` (the queried one). Cells clipped
    shorter than that at a ray's corner crossing can be missed — the same
    quantization nerfacc's fixed-step DDA midpoint sampling has (reference
    rendering.py:66-74).

    dilation == r > 0 (query tables Chebyshev-dilated by r cells, see
    OccGrid.query_dilation): every group member lies within (stride/2)*dt of
    its queried sample, so its cell index differs by at most
    ceil((stride/2)*dt / cell) per axis; stride is lossless against the
    dilated tables whenever (stride/2)*dt_max <= r*cell — i.e. each unit of
    dilation radius doubles the admissible stride, at the cost of
    conservative false-positive occupancy one shell of r cells wide around
    occupied regions.

    Static (host) computation: aabb must be concrete (scene metadata).

    Safety uses the WORST-CASE sample spacing: rays whose AABB segment
    exceeds n_samples * step_size spread their budget over the segment
    (ops/sampling.py::uniform_samples), so dt can grow up to
    diagonal / n_samples.
    """
    import numpy as np
    ab = np.asarray(aabb, np.float64)
    ext = ab[3:] - ab[:3]
    cell = float(np.min(ext)) / resolution
    dt_max = max(step_size, float(np.linalg.norm(ext)) / n_samples)

    def ok(s: int) -> bool:
        if dilation > 0:
            return (s / 2) * dt_max <= dilation * cell
        return cell >= s * dt_max

    s = 1
    while s * 2 <= max_stride and ok(s * 2) and n_samples % (s * 2) == 0:
        s *= 2
    return s


def resolve_query_plan(sampling_cfg, aabb):
    """(query_stride, query_dilation) for a SamplingConfig + concrete scene
    aabb. 0 stride in the config = auto: pick the dilation radius in
    {0, 1, 2} whose admissible stride is largest (ties favor the smaller
    radius — thinner false-positive shell). Each dilation unit doubles the
    lossless stride, and the gather cost is linear in row count; measured
    at the bench geometry: radius 2/stride 8 is +14% train throughput over
    radius 1/stride 4 at unchanged settled K, and quality-NEUTRAL at full
    scale (3-seed 8k-iter study, BASELINE.md r3: the r3s8 arm's mean
    held-out PSNR 28.06 is the best of all arms). The od-based early
    termination reads the ERODED occ (packed table, radius+1), so neither
    the dilation shell nor clipped surface cells ever feed the
    transmittance estimate (r5 erosion fix, OccGrid.occs_q).
    """
    if sampling_cfg.strategy != "occgrid":
        return 1, 0
    dil_cfg = getattr(sampling_cfg, "query_dilation", None)
    if sampling_cfg.query_stride:
        return int(sampling_cfg.query_stride), int(dil_cfg or 0)
    args = (aabb, sampling_cfg.grid_resolution,
            sampling_cfg.render_step_size, sampling_cfg.n_samples)
    max_stride = int(getattr(sampling_cfg, "query_max_stride", 0) or 8)
    if dil_cfg is not None:
        return auto_query_stride(*args, max_stride=max_stride,
                                 dilation=int(dil_cfg)), int(dil_cfg)
    s_best, d_best = auto_query_stride(*args, max_stride=max_stride,
                                       dilation=0), 0
    for r in (1, 2):
        s_r = auto_query_stride(*args, max_stride=max_stride, dilation=r)
        if s_r > s_best:
            s_best, d_best = s_r, r
    return s_best, d_best


def resolve_query_stride(sampling_cfg, aabb) -> int:
    """Effective query stride for a SamplingConfig + concrete scene aabb
    (0 in the config = auto). The stride half of resolve_query_plan."""
    return resolve_query_plan(sampling_cfg, aabb)[0]


def query_with_density(grid: OccGrid, x: jax.Array):
    """Like query(), also returning an EMA occupancy od ESTIMATE.

    The value is the Chebyshev-ERODED EMA of occ_eval ~= sigma *
    render_step_size (run-nerf.py:288-289) — a standing UNDERestimate of
    per-sample optical depth for transmittance-based early termination
    (the dense counterpart of nerfacc's sigma_fn visibility pruning at
    sampling time, reference rendering.py:66-74; nerfacc evaluates the
    live MLP for this, we use the 16-step-EMA grid, eroded so od only
    accumulates strictly inside material — see OccGrid.occs_q for why an
    overestimate collapses training on thin geometry). 0 (early stop
    inert) when the grid carries no query table.

    Returns:
      (occupied [...] bool, occ_value [...] float32).
    """
    res = grid.resolution
    row = jnp.zeros(x.shape[:-1], jnp.int32)
    z = jnp.zeros(x.shape[:-1], jnp.int32)
    found = jnp.zeros(x.shape[:-1], bool)
    for l in range(grid.levels):
        ab = level_aabb(grid.base_aabb, l)
        lo, hi = ab[:3], ab[3:]
        norm = (x - lo) / (hi - lo)
        inb = jnp.all((norm >= 0.0) & (norm < 1.0), axis=-1)
        ijk = jnp.clip((norm * res).astype(jnp.int32), 0, res - 1)
        row_l = (l * res + ijk[..., 0]) * res + ijk[..., 1]
        take = inb & ~found
        row = jnp.where(take, row_l, row)
        z = jnp.where(take, ijk[..., 2], z)
        found = found | inb
    # ONE gather serves both outputs: occupancy is derived as
    # dilated_value > thre (the update stores the binarization threshold) and
    # the od estimate is the ERODED occ, unpacked from the same packed
    # row (see OccGrid.occs_q — any overestimate must never feed the
    # transmittance estimate). Measured: the gather cost is per ROW, ~linear
    # in row count and insensitive to row width/dtype — row COUNT is what
    # matters, hence the query_stride decimation in the renderer and the
    # dilated occupancy test that doubles the admissible stride
    # (auto_query_stride).
    own, dil = _gather_query_values(grid, row, z)
    occ = (dil > grid.thre) & found
    return occ, jnp.where(found, own, 0.0)


def _cell_positions(
    flat_idx: jax.Array, ab: jax.Array, res: int, key: Optional[jax.Array],
    u=None,
) -> jax.Array:
    """World positions inside cells `flat_idx` of the level with AABB `ab`,
    uniformly jittered within each cell (center when key is None). A
    precomputed jitter `u` overrides the key (the sharded refresh generates
    the FULL region's jitter replicated, then slices — so per-cell jitter is
    identical to the unsharded update)."""
    iz = flat_idx % res
    iy = (flat_idx // res) % res
    ix = flat_idx // (res * res)
    ijk = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32)
    if u is None:
        u = 0.5 if key is None else jax.random.uniform(key, ijk.shape)
    lo, hi = ab[:3], ab[3:]
    return lo + (ijk + u) / res * (hi - lo)


def _axes_index(plan) -> jax.Array:
    """Row-major linear device index over mesh axes `plan` = ((name, size),
    ...) (matches parallel/train_parallel.py::_global_index and the
    concatenation order of lax.all_gather with a tuple axis_name: first axis
    slowest). Sizes ride in statically: jax.lax.axis_size lowers to
    psum(1, name), which fails to trace inside the refresh's lax.cond on a
    multi-axis mesh."""
    idx = jax.lax.axis_index(plan[0][0])
    for name, size in plan[1:]:
        idx = idx * size + jax.lax.axis_index(name)
    return idx


def update(
    grid: OccGrid,
    density_fn: Callable[[jax.Array], jax.Array],
    key: Optional[jax.Array],
    step: jax.Array,
    render_step_size: float = 5e-3,
    occ_thre: float = 1e-2,
    ema_decay: float = 0.95,
    warmup_steps: int = 256,
    update_parts: int = 4,
    update_interval: int = 16,
    hold_steps: int = 0,
    shard_axes=None,
) -> OccGrid:
    """One occupancy-grid refresh (nerfacc update_every_n_steps semantics).

    Call every `update_interval` steps. `density_fn` maps [N, 3] -> [N] raw
    sigma; occ_eval = sigma * render_step_size (run-nerf.py:288-289).

    jit-safe: warm-up vs partial refresh is a lax.cond on `step`; the partial
    slice is a round-robin dynamic_slice with a static size.

    shard_axes: optional ((axis_name, axis_size), ...) mesh-axis plan when
    called inside shard_map (sizes are static mesh facts; querying them with
    jax.lax.axis_size inside the refresh's lax.cond fails to trace on a
    multi-axis mesh). The density eval (the expensive stage: the full MLP
    over the refreshed cells, ~13% of early-phase step time single-chip) is
    then partitioned across the mesh's devices and all-gathered, instead of
    every chip redundantly evaluating all cells. Exact: the cell indices and
    per-cell jitter are computed replicated (negligible cost) and each chip
    evaluates a contiguous slice — per-row MLP outputs are independent, so
    the gathered result is bitwise-equal to the replicated update (asserted
    on the virtual 8-mesh, tests/test_parallel.py). Falls back to the
    replicated eval when the refresh-slice size is not divisible by the
    device count.
    """
    res, L = grid.resolution, grid.levels
    n = grid.n_cells
    keys = (jax.random.split(key, L) if key is not None else [None] * L)

    def eval_level(l: int, flat_idx: jax.Array) -> jax.Array:
        ab = level_aabb(grid.base_aabb, l)
        k_cells = flat_idx.shape[0]
        if shard_axes:
            n_dev = 1
            for _, size in shard_axes:
                n_dev *= size
            if n_dev > 1 and k_cells % n_dev == 0:
                u = (jax.random.uniform(keys[l], (k_cells, 3))
                     if keys[l] is not None else None)
                k_loc = k_cells // n_dev
                start = _axes_index(shard_axes) * k_loc
                idx_loc = jax.lax.dynamic_slice_in_dim(flat_idx, start, k_loc)
                u_loc = (None if u is None else
                         jax.lax.dynamic_slice_in_dim(u, start, k_loc))
                x = _cell_positions(idx_loc, ab, res, None, u=u_loc)
                occ_loc = density_fn(x) * render_step_size
                # gather one axis at a time, fastest-varying (minor) axis
                # first — composes to the row-major device order of
                # _axes_index. (A single all_gather with a tuple axis_name
                # hits the same multi-axis tracing failure as lax.axis_size
                # inside this lax.cond.)
                for name, _ in reversed(shard_axes):
                    occ_loc = jax.lax.all_gather(occ_loc, name, axis=0,
                                                 tiled=True)
                return occ_loc
        x = _cell_positions(flat_idx, ab, res, keys[l])
        return density_fn(x) * render_step_size

    def full_update(occs: jax.Array) -> jax.Array:
        all_idx = jnp.arange(n, dtype=jnp.int32)
        new = jnp.stack([eval_level(l, all_idx) for l in range(L)])
        return jnp.maximum(occs * ema_decay, new)

    def partial_update(occs: jax.Array) -> jax.Array:
        part = (step // update_interval) % update_parts
        k = n // update_parts
        start = (part * k).astype(jnp.int32)
        idx = start + jnp.arange(k, dtype=jnp.int32)
        new = jnp.stack([eval_level(l, idx) for l in range(L)])   # [L, k]
        old = jax.lax.dynamic_slice(occs, (0, start), (L, k))
        upd = jnp.maximum(old * ema_decay, new)
        return jax.lax.dynamic_update_slice(occs, upd, (0, start))

    occs = jax.lax.cond(step < warmup_steps, full_update, partial_update,
                        grid.occs)
    thre = jnp.minimum(occ_thre, jnp.mean(occs))
    if hold_steps:
        # Culling hold (r5): while step < hold_steps the binarization
        # threshold stays -1 (every cell occupied) but the EMA keeps
        # accumulating, so culling starts from a warm grid the moment the
        # hold lifts. Used to keep the grid from culling structure the
        # FreeNeRF-masked encoder has not yet been ALLOWED to form: with
        # annealed frequency masking the low-band-only early model has
        # near-zero density at thin structure, the grid culls those cells,
        # and they never receive samples again — measured -8.4 dB at n=8
        # on the lattice scene (BASELINE.md r5 freq x occgrid study).
        thre = jnp.where(step < hold_steps, jnp.float32(-1.0), thre)
    # The packed query table is rebuilt over the FULL volume each update
    # (dilation mixes neighbor cells, so a partial-slice rebuild would go
    # stale at slice borders): two separable shifted-max passes + the bf16
    # pack over the [L, res^3] volume — negligible vs the density eval.
    occs_q = _build_query_table(occs, res, grid.query_dilation)
    return grid.replace(occs=occs, occs_q=occs_q, binaries=occs > thre,
                        thre=thre)


def with_occs(grid: OccGrid, occs: jax.Array, thre) -> OccGrid:
    """Replace the EMA occupancy values CONSISTENTLY: rebuilds the dilated
    query table and the diagnostic binaries. Use this (not grid.replace)
    when injecting occupancy by hand — a bare replace(occs=...) leaves
    occs_q stale and queries would not see the change."""
    occs = jnp.asarray(occs, jnp.float32)
    thre = jnp.asarray(thre, jnp.float32)
    return grid.replace(
        occs=occs,
        occs_q=_build_query_table(occs, grid.resolution,
                                  grid.query_dilation),
        binaries=occs > thre,
        thre=thre)


def conservative(grid: OccGrid) -> OccGrid:
    """Exact-occupancy EVAL view of a trained grid: undilated occupancy
    queries (no false-positive shells, stride-1 semantics) with the eroded
    od channel rebuilt at radius 0 (unbiased early termination). This is
    the protocol quality studies should render under — a bare
    grid.replace(occs_q=None) would also disable early termination
    entirely (no od estimate), which is conservative but slower."""
    return grid.replace(
        query_dilation=0,
        occs_q=_build_query_table(grid.occs, grid.resolution, 0))


def occupancy_fraction(grid: OccGrid) -> jax.Array:
    """Fraction of occupied cells (diagnostic)."""
    return jnp.mean(grid.binaries.astype(jnp.float32))
