"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on `xla_force_host_platform_device_count=8`
CPU devices (no TPU pod required); bench.py runs on the real chip instead.

The environment pins JAX_PLATFORMS=axon (a remote TPU relay whose presence
makes some XLA compiles take minutes).  We unregister the axon backend
factory and force the CPU platform before any backend initialises.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

from jax._src import xla_bridge  # noqa: E402

xla_bridge._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, jax.devices()
