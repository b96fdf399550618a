"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single (remote) chip; tests instead validate
numerics and multi-chip sharding on CPU via
``--xla_force_host_platform_device_count=8``.

The environment pre-registers a TPU PJRT plugin via sitecustomize and pins
``JAX_PLATFORMS`` before any conftest runs, so we must override through
``jax.config`` (the env var was already consumed at interpreter start) and
set the XLA flag before the first backend initialization.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
