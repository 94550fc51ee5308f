"""Torch-checkpoint interop tests (utils/torch_interop.py).

A reference user's nn.pt (torch.save(model.state_dict()), reference
run-nerf.py:420-437) must import into flax params that produce the SAME
forward as the torch model, and export back key-for-key. The torch oracles
from test_models.py re-derive the reference architectures, so their
state dicts (renamed to the reference key schemas where the oracle's
attribute names differ) stand in for real reference checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from fsnerf_tpu.core.models import NeRF, SiNeRF, init_params
from fsnerf_tpu.utils.torch_interop import (
    detect_family,
    export_torch_state_dict,
    import_torch_state_dict,
    load_torch_checkpoint,
)
from tests.test_models import TorchNeRF, TorchSiNeRF


def _reference_nerf_sd(tm: TorchNeRF) -> dict:
    """TorchNeRF attribute names already match the reference NeRF schema
    (layers.{i}, sigma, connection, branch, rgb — reference models.py:
    100-108)."""
    return tm.state_dict()


def _reference_sinerf_sd(tm: TorchSiNeRF) -> dict:
    """Rename TorchSiNeRF's flat oracle names to the reference SiNeRF
    schema (first_layers.{i}.fc_layer, sigma_layers.{0.fc_layer,1},
    fc_feature, rgb_layers.{0.fc_layer,1} — reference models.py:269-283)."""
    ren = {}
    for k, v in tm.state_dict().items():
        prefix, _, leaf = k.rpartition(".")
        if prefix.startswith("first."):
            i = prefix.split(".")[1]
            prefix = f"first_layers.{i}.fc_layer"
        else:
            prefix = {
                "sigma0": "sigma_layers.0.fc_layer",
                "sigma1": "sigma_layers.1",
                "fc_feature": "fc_feature",
                "rgb0": "rgb_layers.0.fc_layer",
                "rgb1": "rgb_layers.1",
            }[prefix]
        ren[f"{prefix}.{leaf}"] = v
    return ren


def test_import_nerf_forward_parity():
    torch.manual_seed(0)
    tm = TorchNeRF()
    params = import_torch_state_dict(_reference_nerf_sd(tm))
    model = NeRF()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    got = np.asarray(model.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), jnp.asarray(d)))
    want = tm(torch.from_numpy(x), torch.from_numpy(d)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_import_sinerf_forward_parity():
    torch.manual_seed(1)
    tm = TorchSiNeRF()
    params = import_torch_state_dict(_reference_sinerf_sd(tm))
    model = SiNeRF()

    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 3)).astype(np.float32)
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    got = np.asarray(model.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x), jnp.asarray(d)))
    want = tm(torch.from_numpy(x), torch.from_numpy(d)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("family", ["nerf", "sinerf"])
def test_round_trip_export(family):
    torch.manual_seed(2)
    sd = (_reference_nerf_sd(TorchNeRF()) if family == "nerf"
          else _reference_sinerf_sd(TorchSiNeRF()))
    assert detect_family(sd.keys()) == family
    back = export_torch_state_dict(import_torch_state_dict(sd))
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].numpy())


def test_export_our_params_loads_into_torch_oracle():
    """Our trained params flow BACK to reference tooling: export, load into
    the torch oracle via load_state_dict (strict), same forward."""
    model = NeRF()
    params = init_params(model, jax.random.key(7))
    sd = {k: torch.from_numpy(v)
          for k, v in export_torch_state_dict(params).items()}
    tm = TorchNeRF()
    tm.load_state_dict(sd, strict=True)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(16, 3)).astype(np.float32)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    got = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(d)))
    want = tm(torch.from_numpy(x), torch.from_numpy(d)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_load_torch_checkpoint_file_and_validation(tmp_path):
    torch.manual_seed(3)
    tm = TorchNeRF()
    path = str(tmp_path / "nn.pt")
    torch.save(_reference_nerf_sd(tm), path)

    model = NeRF()
    expect = init_params(model, jax.random.key(0))
    params = load_torch_checkpoint(path, expect=expect)
    assert jax.tree.structure(params) == jax.tree.structure(expect)

    # architecture mismatch -> precise error, not a jit shape blow-up
    small = init_params(NeRF(n_layers=8, d_filter=128), jax.random.key(0))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_torch_checkpoint(path, expect=small)
    tiny = init_params(NeRF(n_layers=2, skip=(1,)), jax.random.key(0))
    with pytest.raises(ValueError, match="structure"):
        load_torch_checkpoint(path, expect=tiny)


def test_import_rejects_malformed():
    with pytest.raises(ValueError, match="neither"):
        import_torch_state_dict({"foo.weight": np.zeros((4, 4))})
    with pytest.raises(ValueError, match="unrecognized"):
        import_torch_state_dict({"layers.0.weight": np.zeros((4, 4)),
                                 "layers.0.bias": np.zeros(4),
                                 "bogus.weight": np.zeros((4, 4))})
    with pytest.raises(ValueError, match="missing"):
        import_torch_state_dict({"layers.0.weight": np.zeros((4, 4))})
