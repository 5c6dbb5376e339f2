"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on `xla_force_host_platform_device_count=8`
CPU devices (no TPU pod required); bench.py runs on the real chip instead.
Must set the env vars before jax initialises its backends.
"""
import os

# Force-override: the environment pins JAX_PLATFORMS=axon (the TPU relay),
# whose per-op eager dispatch latency is ~100ms — unusable for unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
