"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding paths (pjit/shard_map over a Mesh) are exercised on a
virtual CPU device mesh, per the reference test-strategy analysis
(SURVEY.md §4). In this environment the TPU PJRT plugin registers itself
regardless of JAX_PLATFORMS, so we additionally pin jax_default_device to a
CPU device after import; helpers that need a mesh should use
``jax.devices("cpu")`` explicitly.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize sets jax_platforms="axon,cpu" at interpreter start;
# the first backend init then dials the TPU tunnel, which blocks the whole
# suite whenever the tunnel is wedged. Tests are CPU-only by design — pin
# the platform list BEFORE any backend call so the axon client is never
# constructed. (Setting JAX_PLATFORMS in the environment is not enough:
# register() overrides it via jax.config.)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices(n: int = 8):
    return jax.devices("cpu")[:n]
