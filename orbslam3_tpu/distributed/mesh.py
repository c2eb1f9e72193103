"""Device-mesh construction for the distributed back-end.

The reference scales by POSIX threads over a shared-memory map
(`/root/reference/src/System.cc:198,215,237`); the TPU-native design instead
shards the *numerics* over a `jax.sharding.Mesh`:

  axis "lm"     — landmark shards for distributed bundle adjustment
                  (Schur camera reduction assembled with psum over ICI);
  axis "client" — data-parallel tracking lanes, one per edge client
                  (the fork's per-client Tracking threads,
                  `System.cc:248-266`).

On hardware this is a pod slice; tests use a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_lm: int | None = None, n_client: int = 1,
              devices=None) -> Mesh:
    """Build a (client, lm) mesh over the available devices.

    With the default `n_client=1` this is a pure landmark-sharding mesh for
    distributed BA; multi-client deployments split the same devices into
    tracking lanes x BA shards.
    """
    devices = devices if devices is not None else jax.devices()
    if n_lm is None:
        n_lm = len(devices) // n_client
    assert n_client * n_lm <= len(devices), (
        f"mesh {n_client}x{n_lm} needs {n_client * n_lm} devices, "
        f"have {len(devices)}"
    )
    dev = np.asarray(devices[: n_client * n_lm]).reshape(n_client, n_lm)
    return Mesh(dev, axis_names=("client", "lm"))
