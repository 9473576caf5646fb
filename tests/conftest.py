"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analog of multi-node testing without a cluster (SURVEY §4.3):
``xla_force_host_platform_device_count=8`` fakes an 8-device mesh so
data-parallel sharding tests can assert sharded-step == single-device-step.

Note: the axon sitecustomize pre-imports jax before pytest starts, so the
``JAX_PLATFORMS`` env var is already baked into the config default; we must
switch platforms via ``jax.config.update``. ``XLA_FLAGS`` is still read at
CPU-client creation (lazy), so setting it here is early enough.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
