"""Test harness: force CPU backend with 8 virtual devices (SURVEY.md section 4).

Must run before the first jax import anywhere in the test session so
multi-chip sharding tests can build an 8-device mesh without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone does not stick in this environment (the axon TPU plugin
# is pre-wired via JAX_PLATFORMS=axon); the config update does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() >= 8, jax.device_count()
