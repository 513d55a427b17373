"""Test config: force CPU JAX with an 8-device virtual mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); real-TPU behavior is exercised by
``bench.py`` and the driver's compile checks.

NOTE: this environment pins ``JAX_PLATFORMS=axon`` (TPU tunnel) and the env
var cannot be overridden from outside — ``jax.config.update`` is the only
reliable way to force CPU here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
