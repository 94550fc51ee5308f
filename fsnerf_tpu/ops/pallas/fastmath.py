"""In-kernel fast transcendental helpers shared by the Pallas kernels.

Mosaic lowers jnp.sin/jnp.cos to a conservative multi-op VPU sequence that
measured ~10x slower than a range-reduced minimax polynomial
(benchmarks/sol_siren.py: 6.5-9 ms of an 8.3-11 ms SIREN forward at 131k
rows vs ~0.7-1.2 ms for the polynomial). _sincos_fast lives here so BOTH
the SIREN kernels (ops/pallas/siren.py) and the NeRF train kernels'
in-kernel positional encoding (ops/pallas/mlp_train.py) can use it without
a circular import. Accuracy is pinned by
tests/test_pallas.py::test_sincos_fast_accuracy.
"""

from __future__ import annotations

import jax.numpy as jnp

# NOTE (round 4, benchmarks/ab_fastexp.py): jnp.exp and jax.nn.sigmoid do
# NOT need this treatment — Mosaic lowers them essentially at the
# elementwise floor on v5e (exp 0.545 ms vs mul floor 0.488 ms at 131k x
# 128 x 8 chained applications; a 2^n-bit-trick + deg-5 polynomial exp
# measured 3x SLOWER at 1.686 ms). The sin/cos slowness is specific to
# sin/cos. Audit transcendentals, but measure before replacing.


def _sincos_fast(x, want_sin: bool = True, want_cos: bool = False):
    """sin/cos by explicit range reduction + minimax polynomials — the
    in-kernel replacement for jnp.sin/jnp.cos.

    HOW: k = round(x/pi); r = x - k*pi by two-step Cody-Waite (exact for
    |x| <= ~1e4 — SIREN arguments are |30 y| <= a few hundred; NeRF
    positional-encoding arguments are |2^(F-1) x| <= ~2k for grid-bounded
    points); sin(x) = (-1)^k sin(r), cos(x) = (-1)^k cos(r) with
    |r| <= pi/2; odd deg-5 / even deg-8 minimax polynomials. The sin poly
    is a TRUE minimax fit with a free leading coefficient (r5,
    benchmarks/sol_siren_render.py): max abs error 6.8e-5 on the reduced
    range — better than the previous non-equioscillating deg-7 (~9e-5)
    and one FMA shorter (+4% on the fused SiNeRF render kernel, whose
    sincos chain is 27% of runtime). Max abs error vs f64 over |x| <= 40:
    ~7e-5 (sin) / ~1.3e-5 (cos) — both far below the bf16 rounding
    (~4e-3 at 1.0) of every consumer: activations/derivative factors/
    encoded features are consumed as bf16 by the next GEMM in all paths.
    When BOTH sin and cos are needed, the range reduction is shared.
    """
    f32 = jnp.float32
    k = jnp.round(x * f32(0.3183098861837907))      # 1/pi
    r = x - k * f32(3.140625)                        # pi split: 8-bit head
    r = r - k * f32(9.67653589793e-4)                # + correction
    km = k - 2.0 * jnp.floor(k * 0.5)                # parity of k: 0 or 1
    sign = 1.0 - 2.0 * km                            # (-1)^k
    r2 = r * r
    sin_x = cos_x = None
    if want_sin:
        s = r * (f32(9.99696825e-1) + r2 * (f32(-1.65673162e-1)
                 + r2 * f32(7.51440369e-3)))
        sin_x = sign * s
    if want_cos:
        c = (f32(1.0) + r2 * (f32(-0.5) + r2 * (f32(4.166664568e-2)
             + r2 * (f32(-1.388731625e-3) + r2 * f32(2.443315711e-5)))))
        cos_x = sign * c
    return sin_x, cos_x
