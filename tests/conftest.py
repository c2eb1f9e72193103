"""Test harness config: force CPU with an 8-device virtual mesh.

The container's sitecustomize (axon PJRT boot) imports jax at interpreter
startup and pins the remote-TPU `axon` platform, so plain env vars are too
late. Backend *initialization* is still lazy, though — updating jax.config and
XLA_FLAGS here (before any test touches a device) reliably lands tests on a
virtual 8-device CPU mesh, which is the contract for multi-chip sharding tests
(real hardware has a single tunneled chip).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.devices()}"
    )
