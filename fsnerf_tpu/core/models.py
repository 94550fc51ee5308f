"""NeRF-family radiance-field models in flax.linen.

Behavioral parity with reference src/core/models.py:
  * NeRF — models.py:53-143. 8x256 ReLU trunk with input skip-concat AFTER the
    activation of each layer index in `skip` (models.py:120-123), raw
    (unactivated) sigma head (models.py:105,127), bottleneck `connection`
    layer, 128-wide view branch over [connection, dir_enc], sigmoid RGB,
    output concat [rgb, sigma] (models.py:138). Density-only mode when
    dirs is None (models.py:139-141).
  * SiNeRF — models.py:237-309. SIREN trunk with per-layer frequencies
    alpha=[30,1,...,1] (run-nerf.py:69), SIREN init sigma=1/d (first layer) or
    sqrt(6/d) (models.py:210-220), ReLU sigma head, sigmoid RGB head fed RAW
    (unencoded) view dirs (models.py:304).

Initialization matches torch.nn.Linear defaults (U(-1/sqrt(fan_in),
1/sqrt(fan_in)) for both kernel and bias) so training dynamics track the
reference. All matmuls run through an optional compute dtype (bfloat16 on the
MXU with float32 accumulation) while parameters stay float32.

New capability: both models accept per-band frequency masks (FreeNeRF
annealing) threaded into the positional encoders; identity masks reproduce the
reference exactly.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fsnerf_tpu.core.encoding import positional_encoding


def torch_linear_init(fan_in: int) -> Tuple[Callable, Callable]:
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def kernel_init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    def bias_init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return kernel_init, bias_init


def siren_init(fan_in: int, is_first: bool, c: float = 6.0):
    """SIREN init (reference models.py:210-220): U(-s, s) with
    s = 1/fan_in (first layer) else sqrt(c/fan_in); bias uses the same s."""
    sigma = (1.0 / fan_in) if is_first else math.sqrt(c / fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -sigma, sigma)

    return init, init


class TorchDense(nn.Module):
    """Dense layer with torch default init and a compute-dtype cast.

    Params are stored float32. In bfloat16 mode the ENTIRE activation chain
    (matmul output, bias add, nonlinearity) stays bfloat16: the MXU still
    accumulates each product in float32 internally, but outputs — and
    therefore the backward pass's cotangents — are bfloat16, which keeps the
    gradient matmuls on the fast MXU path (f32 cotangents would silently run
    every dW/dx GEMM at the ~8x slower fp32 MXU rate). In float32 mode,
    Precision.HIGHEST prevents the TPU default bf16-input downcast.
    """

    features: int
    fan_in: int
    compute_dtype: jnp.dtype = jnp.float32
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k_init, b_init = torch_linear_init(self.fan_in)
        kernel = self.param("kernel", self.kernel_init or k_init,
                            (self.fan_in, self.features))
        bias = self.param("bias", self.bias_init or b_init, (self.features,))
        cd = self.compute_dtype
        y = jax.lax.dot_general(
            x.astype(cd), kernel.astype(cd),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=cd,
            precision=_matmul_precision(cd),
        )
        return y + bias.astype(cd)


def _matmul_precision(compute_dtype) -> jax.lax.Precision:
    """float32 mode must not silently downcast matmul inputs to bf16 (the TPU
    default); bfloat16 mode takes the fast single-pass MXU path."""
    return (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _density_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "none":
        return lambda s: s
    if name == "relu":
        return jax.nn.relu
    if name == "trunc_exp":
        # exp with clamped input: stable density activation for bf16 runs
        return lambda s: jnp.exp(jnp.clip(s, -15.0, 15.0))
    raise ValueError(f"Unknown density activation: {name}")


class NeRF(nn.Module):
    """Original-paper NeRF MLP (reference models.py:53-143)."""

    n_layers: int = 8
    d_filter: int = 256
    skip: Tuple[int, ...] = (4,)
    d_pos: int = 3
    d_dir: int = 3
    n_freqs: int = 10
    n_freqs_views: int = 4
    log_space: bool = True
    density_activation: str = "none"
    compute_dtype: jnp.dtype = jnp.float32
    # --no_dirs (reference parser.py:28: "do not model view-dependent
    # effects"; unconsumed there — wired here): the RGB branch sees only the
    # bottleneck feature, no direction encoding, so radiance is Lambertian.
    use_viewdirs: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        dirs: Optional[jax.Array] = None,
        pos_mask: Optional[jax.Array] = None,
        dir_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Returns [..., 4] = [rgb, sigma] when dirs given, else [..., 1] sigma.

        pos_mask/dir_mask: optional [n_freqs]/[n_freqs_views] FreeNeRF masks.
        """
        d = self.d_filter
        x_in = positional_encoding(x, self.n_freqs, self.log_space, pos_mask)
        d_pos_enc = x_in.shape[-1]

        h = x_in
        fan = d_pos_enc
        for i in range(self.n_layers):
            h = jax.nn.relu(
                TorchDense(d, fan, self.compute_dtype, name=f"layers_{i}")(h))
            if i in self.skip:
                h = jnp.concatenate([h, x_in], axis=-1)
                fan = d + d_pos_enc
            else:
                fan = d

        sigma = TorchDense(1, fan, self.compute_dtype, name="sigma")(h)
        sigma = _density_activation(self.density_activation)(sigma)
        if dirs is None:
            return sigma

        feat = TorchDense(d, fan, self.compute_dtype, name="connection")(h)
        if self.use_viewdirs:
            dir_in = positional_encoding(dirs, self.n_freqs_views,
                                         self.log_space, dir_mask)
            b_in = jnp.concatenate([feat, dir_in], axis=-1)
        else:
            b_in = feat
        b = jax.nn.relu(
            TorchDense(d // 2, b_in.shape[-1], self.compute_dtype,
                       name="branch")(b_in))
        rgb = jax.nn.sigmoid(
            TorchDense(3, d // 2, self.compute_dtype, name="rgb")(b))
        return jnp.concatenate([rgb, sigma], axis=-1)


class SirenDense(nn.Module):
    """SIREN layer: sin(w * (Wx + b)) (reference models.py:172-234)."""

    features: int
    fan_in: int
    w: float = 1.0
    is_first: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k_init, b_init = siren_init(self.fan_in, self.is_first)
        kernel = self.param("kernel", k_init, (self.fan_in, self.features))
        bias = self.param("bias", b_init, (self.features,))
        # SIREN stays float32-accurate: sin phase precision matters, so the
        # output is promoted to f32 before the sine regardless of mode.
        y = jax.lax.dot_general(
            x.astype(self.compute_dtype), kernel.astype(self.compute_dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_matmul_precision(self.compute_dtype),
        ) + bias
        return jnp.sin(self.w * y)


class SiNeRF(nn.Module):
    """SIREN MLP for NeRF (reference models.py:237-309)."""

    width: int = 256
    alpha: Tuple[float, ...] = (30.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    d_pos: int = 3
    d_dir: int = 3
    compute_dtype: jnp.dtype = jnp.float32
    use_viewdirs: bool = True       # --no_dirs: Lambertian RGB head

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        dirs: Optional[jax.Array] = None,
        pos_mask: Optional[jax.Array] = None,
        dir_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        w = self.width
        h = SirenDense(w, self.d_pos, self.alpha[0], is_first=True,
                       compute_dtype=self.compute_dtype, name="first_0")(x)
        for i, a in enumerate(self.alpha[1:]):
            h = SirenDense(w, w, a, compute_dtype=self.compute_dtype,
                           name=f"first_{i + 1}")(h)

        def sigma_head(h):
            s = SirenDense(w // 2, w, 1.0, compute_dtype=self.compute_dtype,
                           name="sigma_0")(h)
            s = TorchDense(1, w // 2, self.compute_dtype, name="sigma_1")(s)
            return jax.nn.relu(s)

        if dirs is None:
            return sigma_head(h)

        sigma = sigma_head(h)
        feat = TorchDense(w, w, self.compute_dtype, name="fc_feature")(h)
        # RGB head receives RAW (unencoded) view directions (models.py:304)
        if self.use_viewdirs:
            r = jnp.concatenate([feat, dirs], axis=-1)
            d_r = w + self.d_dir
        else:
            r, d_r = feat, w
        r = SirenDense(w // 2, d_r, 1.0,
                       compute_dtype=self.compute_dtype, name="rgb_0")(r)
        rgb = jax.nn.sigmoid(
            TorchDense(3, w // 2, self.compute_dtype, name="rgb_1")(r))
        return jnp.concatenate([rgb, sigma], axis=-1)


def make_model(cfg) -> nn.Module:
    """Build a model from a Config (reference init_models, run-nerf.py:55-102)."""
    compute_dtype = jnp.bfloat16 if cfg.train.dtype == "bfloat16" else jnp.float32
    if cfg.model.model == "nerf":
        return NeRF(
            n_layers=cfg.model.n_layers,
            d_filter=cfg.model.d_filter,
            skip=tuple(cfg.model.skip),
            d_pos=cfg.encoder.d_input,
            d_dir=cfg.encoder.d_input,
            n_freqs=cfg.encoder.n_freqs,
            n_freqs_views=cfg.encoder.n_freqs_views,
            log_space=cfg.encoder.log_space,
            density_activation=cfg.model.density_activation,
            compute_dtype=compute_dtype,
            use_viewdirs=not cfg.encoder.no_dirs,
        )
    if cfg.model.model == "sinerf":
        alpha = (30.0,) + (1.0,) * (cfg.model.n_layers - 1)  # run-nerf.py:69
        return SiNeRF(
            width=cfg.model.d_filter,
            alpha=alpha,
            d_pos=cfg.encoder.d_input,
            d_dir=cfg.encoder.d_input,
            compute_dtype=compute_dtype,
            use_viewdirs=not cfg.encoder.no_dirs,
        )
    raise ValueError(f"Model {cfg.model.model} not supported")


def init_params(model: nn.Module, key: jax.Array) -> dict:
    """Initialize parameters with dummy full-mode inputs."""
    x = jnp.zeros((1, 3), jnp.float32)
    d = jnp.zeros((1, 3), jnp.float32)
    return model.init(key, x, d)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
