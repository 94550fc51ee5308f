"""Micro A/B: Mosaic's jnp.exp / jax.nn.sigmoid lowering vs the
fastmath.py polynomial replacements (_exp_fast / _sigmoid_fast).

Motivation: the round-3 sincos audit found Mosaic lowers jnp.sin ~10x
slower than a range-reduced polynomial, and the ROADMAP lesson says to
audit EVERY in-kernel transcendental. The fused kernels still call
jnp.exp (render.py compositing: alpha / transmittance carry / trunc_exp
sigma) and jax.nn.sigmoid (every rgb head: a full [bN, 128] map in
render.py::_mlp_chunk, mlp.py, mlp_train.py forward, siren.py heads).

Method: one Pallas kernel per variant applies the op CHAIN_DEPTH times
chained on a [N, 128] f32 block (chaining amortizes the HBM stream so the
measurement isolates VPU op cost); `mul` is the no-transcendental floor.
Timing is fetch-fenced (jax.block_until_ready is flaky through the axon
tunnel — CLAUDE.md).

RESULT (v5e, 2026-08-20): MEASURED DEAD END — Mosaic's exp is already at
the elementwise floor (hardware exp): mul 0.488 ms / exp_mosaic 0.545 /
sigmoid_mosaic 0.794 vs exp_fast 1.686 / sigmoid_fast 1.974 ms. The
polynomial is 3x SLOWER. The sin/cos 10x win does NOT generalize; the
fast helpers live here (not fastmath.py) because they must not be used.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/ab_fastexp.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _exp_fast(x):
    """exp via 2^n exponent-field bit trick + deg-5 2^f Taylor on
    [-0.5, 0.5] (max rel err 5.1e-6 over [-86, 20]; clip makes any finite
    input safe). Measured 3x SLOWER than Mosaic's jnp.exp on v5e."""
    f32 = jnp.float32
    z = jnp.clip(x * f32(1.4426950408889634), -126.0, 126.0)  # log2(e)
    n = jnp.round(z)
    f = z - n
    p = (f32(1.0) + f * (f32(0.6931471805599453)
         + f * (f32(0.2402265069591007) + f * (f32(0.05550410866482158)
         + f * (f32(0.009618129107628477)
         + f * f32(0.0013333558146428443))))))
    sc = jax.lax.bitcast_convert_type(
        (n.astype(jnp.int32) + 127) << 23, jnp.float32)
    return p * sc


def _sigmoid_fast(x):
    return 1.0 / (1.0 + _exp_fast(-x))

N = 131072
BLOCK = 1024
CHAIN = 8
SCAN = 30

OPS = {
    "mul": lambda x: x * jnp.float32(1.0000001),
    "exp_mosaic": lambda x: jnp.exp(-jnp.abs(x) * 1e-3),
    "exp_fast": lambda x: _exp_fast(-jnp.abs(x) * 1e-3),
    "sigmoid_mosaic": lambda x: jax.nn.sigmoid(x * 1e-3),
    "sigmoid_fast": lambda x: _sigmoid_fast(x * 1e-3),
}


def _kernel(op, x_ref, o_ref):
    h = x_ref[:]
    for _ in range(CHAIN):
        h = op(h)
    o_ref[:] = h


def make_fn(name):
    op = OPS[name]
    call = pl.pallas_call(
        functools.partial(_kernel, op),
        grid=(N // BLOCK,),
        in_specs=[pl.BlockSpec((BLOCK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
    )
    return call


def timeit(tag, fn, x):
    @jax.jit
    def looped(x):
        return jax.lax.scan(
            lambda c, i: ((fn(x + c).ravel()[0] * 1e-20).astype(jnp.float32),
                          None),
            jnp.float32(0.0), jnp.arange(SCAN))[0]

    float(np.asarray(looped(x)))                 # warm + drain
    t0 = time.perf_counter()
    for _ in range(3):
        out = looped(x)
    carry = float(np.asarray(out))               # completion fence
    dt = (time.perf_counter() - t0) / 3 / SCAN
    print(f"{tag:>16}: {dt * 1e3:7.3f} ms  ({dt * 1e9 / (N * 128 * CHAIN):6.3f}"
          f" ns/elem/app, carry {carry:.2e})", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, 128), jnp.float32) * 10.0
    # numeric sanity first (on-device, chained 8x vs chained numpy)
    got_e = np.asarray(make_fn("exp_fast")(x)[:BLOCK], np.float64)
    r = np.asarray(x[:BLOCK], np.float64)
    for _ in range(CHAIN):
        r = np.exp(-np.abs(r) * 1e-3)
    print("exp_fast chain max rel err:",
          np.max(np.abs(got_e - r) / np.abs(r)))
    base = None
    for name in OPS:
        dt = timeit(name, make_fn(name), x)
        if name == "mul":
            base = dt
    print(f"(floor mul = {base * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()
