"""Model parity tests: flax NeRF/SiNeRF vs an independently written torch
replica of the reference architecture (src/core/models.py:53-309).

The torch modules below are re-derived from the reference's documented
structure (not copied) purely as a cross-check oracle: we copy flax params
into them and require identical forward outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fsnerf_tpu.core.models import NeRF, SiNeRF, init_params, param_count


def _enc_t(x, F, log_space=True):
    freqs = 2.0 ** torch.linspace(0.0, F - 1, F) if log_space else \
        torch.linspace(1.0, 2.0 ** (F - 1), F)
    out = [x]
    for f in freqs:
        out += [torch.sin(x * f), torch.cos(x * f)]
    return torch.cat(out, dim=-1)


class TorchNeRF(torch.nn.Module):
    """Oracle replica of the reference NeRF MLP."""

    def __init__(self, n_layers=8, d=256, skip=(4,), F=10, Fv=4):
        super().__init__()
        self.skip, self.F, self.Fv = skip, F, Fv
        d_pos = 3 * (1 + 2 * F)
        d_dir = 3 * (1 + 2 * Fv)
        dims = []
        for j in range(n_layers):
            if j == 0:
                dims.append(d_pos)
            elif (j - 1) in skip:
                dims.append(d + d_pos)
            else:
                dims.append(d)
        self.layers = torch.nn.ModuleList(
            [torch.nn.Linear(dims[j], d) for j in range(n_layers)])
        trunk_out = d + d_pos if (n_layers - 1) in skip else d
        self.sigma = torch.nn.Linear(trunk_out, 1)
        self.connection = torch.nn.Linear(trunk_out, d)
        self.branch = torch.nn.Linear(d + d_dir, d // 2)
        self.rgb = torch.nn.Linear(d // 2, 3)

    def forward(self, x, dirs=None):
        x_in = _enc_t(x, self.F)
        h = x_in
        for j, layer in enumerate(self.layers):
            h = torch.relu(layer(h))
            if j in self.skip:
                h = torch.cat([h, x_in], dim=-1)
        sigma = self.sigma(h)
        if dirs is None:
            return sigma
        feat = self.connection(h)
        b = torch.cat([feat, _enc_t(dirs, self.Fv)], dim=-1)
        rgb = torch.sigmoid(self.rgb(torch.relu(self.branch(b))))
        return torch.cat([rgb, sigma], dim=-1)


def _copy_dense(torch_linear, flax_params):
    with torch.no_grad():
        torch_linear.weight.copy_(
            torch.from_numpy(np.asarray(flax_params["kernel"]).T))
        torch_linear.bias.copy_(
            torch.from_numpy(np.asarray(flax_params["bias"])))


def test_nerf_forward_matches_torch_replica():
    model = NeRF()
    params = init_params(model, jax.random.key(0))
    p = params["params"]

    tm = TorchNeRF()
    for j in range(8):
        _copy_dense(tm.layers[j], p[f"layers_{j}"])
    _copy_dense(tm.sigma, p["sigma"])
    _copy_dense(tm.connection, p["connection"])
    _copy_dense(tm.branch, p["branch"])
    _copy_dense(tm.rgb, p["rgb"])

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    got = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(d)))
    want = tm(torch.from_numpy(x), torch.from_numpy(d)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)

    # density-only mode (reference models.py:139-141)
    got_s = np.asarray(model.apply(params, jnp.asarray(x)))
    want_s = tm(torch.from_numpy(x)).detach().numpy()
    assert got_s.shape == (64, 1)
    np.testing.assert_allclose(got_s, want_s, atol=2e-5)


def test_nerf_output_layout_rgb_then_sigma():
    model = NeRF()
    params = init_params(model, jax.random.key(1))
    x = jnp.zeros((4, 3))
    d = jnp.zeros((4, 3))
    out = model.apply(params, x, d)
    assert out.shape == (4, 4)
    # rgb channels pass through sigmoid -> in (0, 1)
    rgb = np.asarray(out[..., :3])
    assert (rgb > 0).all() and (rgb < 1).all()


def test_nerf_param_count_matches_reference_arch():
    """8x256 trunk, skip at 4, F=10/4: count the reference layer dims."""
    model = NeRF()
    params = init_params(model, jax.random.key(0))
    d_pos, d_dir, d = 63, 27, 256
    expect = (d_pos * d + d)                       # layer 0
    for j in range(1, 8):
        din = d + d_pos if j == 5 else d           # widened after skip@4
        expect += din * d + d
    expect += d * 1 + 1                            # sigma
    expect += d * d + d                            # connection
    expect += (d + d_dir) * (d // 2) + d // 2      # branch
    expect += (d // 2) * 3 + 3                     # rgb
    assert param_count(params) == expect


def test_nerf_torch_style_init_bounds():
    model = NeRF()
    params = init_params(model, jax.random.key(0))["params"]
    k = np.asarray(params["layers_1"]["kernel"])
    bound = 1.0 / np.sqrt(k.shape[0])
    assert np.abs(k).max() <= bound
    assert np.abs(k).max() > 0.8 * bound           # actually fills the range
    b = np.asarray(params["layers_1"]["bias"])
    assert np.abs(b).max() <= bound


def test_nerf_density_activation_options():
    for act, check in [("relu", lambda s: (s >= 0).all()),
                       ("trunc_exp", lambda s: (s > 0).all())]:
        model = NeRF(density_activation=act)
        params = init_params(model, jax.random.key(2))
        s = np.asarray(model.apply(params, jnp.ones((16, 3)) * 0.3))
        assert check(s), act


class TorchSiNeRF(torch.nn.Module):
    """Oracle replica of the reference SiNeRF."""

    def __init__(self, width=256, alpha=(30.0,) + (1.0,) * 7):
        super().__init__()
        self.alpha = alpha
        dims = [3] + [width] * (len(alpha) - 1)
        self.first = torch.nn.ModuleList(
            [torch.nn.Linear(dims[i], width) for i in range(len(alpha))])
        self.sigma0 = torch.nn.Linear(width, width // 2)
        self.sigma1 = torch.nn.Linear(width // 2, 1)
        self.fc_feature = torch.nn.Linear(width, width)
        self.rgb0 = torch.nn.Linear(width + 3, width // 2)
        self.rgb1 = torch.nn.Linear(width // 2, 3)

    def forward(self, x, dirs=None):
        h = x
        for a, layer in zip(self.alpha, self.first):
            h = torch.sin(a * layer(h))
        sigma = torch.relu(self.sigma1(torch.sin(1.0 * self.sigma0(h))))
        if dirs is None:
            return sigma
        feat = self.fc_feature(h)
        r = torch.cat([feat, dirs], dim=-1)
        rgb = torch.sigmoid(self.rgb1(torch.sin(1.0 * self.rgb0(r))))
        return torch.cat([rgb, sigma], dim=-1)


def test_sinerf_forward_matches_torch_replica():
    model = SiNeRF()
    params = init_params(model, jax.random.key(3))
    p = params["params"]

    tm = TorchSiNeRF()
    for i in range(8):
        _copy_dense(tm.first[i], p[f"first_{i}"])
    _copy_dense(tm.sigma0, p["sigma_0"])
    _copy_dense(tm.sigma1, p["sigma_1"])
    _copy_dense(tm.fc_feature, p["fc_feature"])
    _copy_dense(tm.rgb0, p["rgb_0"])
    _copy_dense(tm.rgb1, p["rgb_1"])

    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 3)).astype(np.float32)
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    got = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(d)))
    want = tm(torch.from_numpy(x), torch.from_numpy(d)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)

    got_s = np.asarray(model.apply(params, jnp.asarray(x)))
    want_s = tm(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got_s, want_s, atol=2e-5)
    assert (got_s >= 0).all()  # ReLU sigma head (models.py:273-277)


def test_sinerf_siren_init_scales():
    model = SiNeRF()
    params = init_params(model, jax.random.key(4))["params"]
    k0 = np.asarray(params["first_0"]["kernel"])   # first: U(-1/3, 1/3)
    assert np.abs(k0).max() <= 1.0 / 3 + 1e-6
    k1 = np.asarray(params["first_1"]["kernel"])   # later: U(-sqrt(6/256), .)
    bound = np.sqrt(6.0 / 256.0)
    assert np.abs(k1).max() <= bound + 1e-6
    assert np.abs(k1).max() > 0.8 * bound


def test_nerf_freq_mask_threading():
    """Zero pos mask at init reduces encoding to identity features only."""
    model = NeRF()
    params = init_params(model, jax.random.key(5))
    x = jnp.ones((4, 3)) * 0.2
    d = jnp.ones((4, 3)) * 0.5
    full = model.apply(params, x, d)
    masked = model.apply(params, x, d,
                         pos_mask=jnp.zeros(10), dir_mask=jnp.zeros(4))
    assert not np.allclose(np.asarray(full), np.asarray(masked))
    ident = model.apply(params, x, d,
                        pos_mask=jnp.ones(10), dir_mask=jnp.ones(4))
    np.testing.assert_allclose(np.asarray(full), np.asarray(ident), atol=1e-6)


def test_no_dirs_models_are_view_independent():
    """--no_dirs (reference parser.py:28, unconsumed there): the RGB head
    must not depend on view direction; density mode is unchanged."""
    import jax

    for cls, kw in ((NeRF, dict(n_layers=2, d_filter=32, skip=(1,),
                                n_freqs=3, n_freqs_views=2)),
                    (SiNeRF, dict(width=32, alpha=(30.0, 1.0)))):
        model = cls(use_viewdirs=False, **kw)
        params = init_params(model, jax.random.key(6))
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        d1 = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        d2 = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        o1 = np.asarray(model.apply(params, x, d1))
        o2 = np.asarray(model.apply(params, x, d2))
        assert o1.shape == (8, 4)
        np.testing.assert_allclose(o1, o2, atol=0)       # Lambertian
        sig = np.asarray(model.apply(params, x))
        np.testing.assert_allclose(sig[:, 0], o1[:, 3], atol=1e-6)


def test_no_dirs_config_builds_and_disables_fused():
    from fsnerf_tpu.config import Config, EncoderConfig
    from fsnerf_tpu.core.models import make_model
    from fsnerf_tpu.train.step import resolve_fused_kernel

    cfg = Config(encoder=EncoderConfig(no_dirs=True))
    model = make_model(cfg)
    assert model.use_viewdirs is False
    assert resolve_fused_kernel(
        cfg.replace(model=cfg.model.__class__(fused_kernel=True))) is False
