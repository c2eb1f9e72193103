"""Multi-host compute plane: jax.distributed init + global-mesh sharded BA.

The ICI-plane counterpart of `host_exchange` (DCN): after two hosts weld
their maps, they solve the merged bundle-adjustment problem TOGETHER on one
global device mesh — landmarks sharded across every device of every host,
poses replicated, the reduced camera system psum'd across the whole mesh
(`sharded_ba._shard_iteration`). On TPU pods the same code runs over ICI;
on CPU test rigs the collectives ride gloo over the coordination service.

Reference analog: none — the reference's only cross-host mechanism is a
serialized Atlas file (`System.cc:1529-1673`); a joint multi-host solve is
the scaling axis the TPU redesign adds (BASELINE.md "frames/s at 1 chip /
1 host / >= 2 hosts").
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orbslam3_tpu.opt.ba import BAProblem
from .sharded_ba import make_sharded_ba, route_observations


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_devices: int | None = None,
               platform: str | None = None):
    """Join the multi-host runtime. On CPU backends this configures the
    virtual device count and gloo collectives BEFORE the backend
    initializes; call first thing in the process. `platform` pins the
    backend (e.g. "cpu" for the 2-process test rig); None keeps the
    environment's default (TPU pods)."""
    if platform:
        jax.config.update("jax_platforms", platform)
    if local_devices is not None:
        jax.config.update("jax_num_cpu_devices", int(local_devices))
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # non-CPU backend or newer flag name; harmless
        pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "lm") -> Mesh:
    """One mesh over every device of every participating process."""
    return Mesh(np.asarray(jax.devices()).reshape(-1), (axis,))


def _to_global(x, sharding):
    """Host-replicated numpy -> global jax.Array with the given sharding
    (every process holds the full array; each contributes its shards)."""
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def global_ba(prob: BAProblem, camera, mesh: Mesh | None = None,
              n_iters: int = 8, axis: str = "lm"):
    """Run the landmark-sharded BA over the global mesh.

    `prob` must be host-replicated (identical on every process — ship it
    with `host_exchange.send_arrays` first). Landmark capacity is padded to
    the device count; observations are routed to their landmark's shard.
    Returns (prob_out, costs) with host-local numpy results.
    """
    mesh = mesh or global_mesh(axis)
    n_dev = mesh.devices.size
    P_total = prob.points.shape[0]
    pad = (-P_total) % n_dev
    if pad:
        prob = prob._replace(
            points=np.concatenate(
                [np.asarray(prob.points),
                 np.zeros((pad, 3), np.asarray(prob.points).dtype)]),
            fixed_lm=np.concatenate(
                [np.asarray(prob.fixed_lm), np.ones(pad, bool)]))
    prob = route_observations(prob, n_dev)

    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    g = BAProblem(
        R=_to_global(prob.R, rep), t=_to_global(prob.t, rep),
        points=_to_global(prob.points, shard),
        kf_idx=_to_global(prob.kf_idx, shard),
        lm_idx=_to_global(prob.lm_idx, shard),
        uv=_to_global(prob.uv, shard), info=_to_global(prob.info, shard),
        valid=_to_global(prob.valid, shard),
        fixed_kf=_to_global(prob.fixed_kf, rep),
        fixed_lm=_to_global(prob.fixed_lm, shard))
    run = make_sharded_ba(mesh, camera, n_iters=n_iters, axis=axis)
    out, costs = run(g)
    # fetch results back to every host: R/t/costs replicate (every shard is
    # addressable); the landmark shards live on remote devices too, so they
    # come home through a process allgather
    R = np.asarray(jax.device_get(out.R.addressable_data(0)))
    t = np.asarray(jax.device_get(out.t.addressable_data(0)))
    cost_h = np.asarray(jax.device_get(costs.addressable_data(0)))
    pts_arr = out.points
    if pts_arr.is_fully_addressable:
        pts = np.asarray(jax.device_get(pts_arr))
    else:
        from jax.experimental import multihost_utils
        pts = np.asarray(multihost_utils.process_allgather(pts_arr,
                                                           tiled=True))
    return out._replace(R=R, t=t, points=pts), cost_h
