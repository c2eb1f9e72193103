"""Import FIRST in debug scripts: pin jax to a virtual 8-device CPU mesh.

Mirrors tests/conftest.py — the container's sitecustomize imports jax at
interpreter startup and pins the remote-TPU `axon` platform; backend init is
lazy, so flipping config here (before any device touch) lands on CPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
