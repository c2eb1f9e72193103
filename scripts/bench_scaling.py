"""Sharded-BA scaling record (BASELINE.md "frames/s at 1 chip / 1 host /
>= 2 hosts"; VERDICT r4 next-step #4).

Measures the landmark-sharded Schur BA (`distributed.sharded_ba`) at a
reference-scale global-BA problem on 1/2/4/8-device meshes and writes
SCALING.json. On this CPU rig the 8 "devices" are virtual shards over 2
physical cores, so WALL-CLOCK parallel speedup is capped at ~2x by the
host; the scale-invariant signals recorded alongside are the per-device
observation/landmark shard sizes (which halve perfectly with device count
— the quantity that sets wall time on real multi-chip ICI) and the
per-iteration collective payload (the 6Mx6M reduced system psum).

Usage: python scripts/bench_scaling.py [--out SCALING.json]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip())

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.opt.ba import BAProblem
from orbslam3_tpu.distributed.sharded_ba import (make_sharded_ba,
                                                 route_observations)


def build_problem(M=96, P=8192, O=49152, seed=5):
    """Reference-scale global BA: ~100 KFs, 8k landmarks, ~50k obs (a EuRoC
    MH-sequence-sized map, cf. BASELINE.md)."""
    rng = np.random.default_rng(seed)
    cam = Camera.pinhole(458.0, 458.0, 320.0, 240.0)
    pts = np.stack([rng.uniform(-4, 4, P), rng.uniform(-3, 3, P),
                    rng.uniform(4, 12, P)], -1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (M, 1, 1))
    t = rng.uniform(-0.5, 0.5, (M, 3)).astype(np.float32)
    kf_idx = rng.integers(0, M, O).astype(np.int32)
    lm_idx = rng.integers(0, P, O).astype(np.int32)
    xc = np.einsum("oij,oj->oi", R[kf_idx], pts[lm_idx]) + t[kf_idx]
    uv = np.asarray(cam.project(jnp.asarray(xc)))
    uv = uv + rng.normal(0, 0.5, uv.shape).astype(np.float32)
    fixed = np.zeros(M, bool)
    fixed[0] = True
    prob = BAProblem(
        R=jnp.asarray(R), t=jnp.asarray(t), points=jnp.asarray(pts),
        kf_idx=jnp.asarray(kf_idx), lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uv), info=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool), fixed_kf=jnp.asarray(fixed),
        fixed_lm=jnp.zeros(P, bool))
    return prob, cam


def measure(n_dev: int, prob: BAProblem, cam, n_iters=8, reps=3):
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devices).reshape(-1), ("lm",))
    routed = route_observations(prob, n_dev)
    run = make_sharded_ba(mesh, cam, n_iters=n_iters)
    out, costs = run(routed)  # compile + warm
    jax.block_until_ready(costs)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out, costs = run(routed)
        jax.block_until_ready(costs)
        best = min(best, time.perf_counter() - t0)
    M = int(prob.R.shape[0])
    return {
        "n_devices": n_dev,
        "ms_per_iter": round(best / n_iters * 1e3, 3),
        "obs_per_device": int(routed.valid.shape[0] // n_dev),
        "landmarks_per_device": int(routed.points.shape[0] // n_dev),
        "psum_payload_floats": 36 * M * M + 6 * M,
        "final_cost": float(np.asarray(costs)[-1]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json"))
    args = ap.parse_args()

    prob, cam = build_problem()
    rows = [measure(n, prob, cam) for n in (1, 2, 4, 8)]
    base_cost = rows[0]["final_cost"]
    for r in rows:
        assert abs(r["final_cost"] - base_cost) < 0.05 * abs(base_cost) + 1, \
            "sharded solve diverges across device counts"
    record = {
        "benchmark": "sharded_global_ba",
        "problem": {"keyframes": 96, "landmarks": 8192,
                    "observations": 49152, "iters_timed": 8},
        "host": {"physical_cores": os.cpu_count(),
                 "note": "virtual CPU mesh: wall-clock speedup capped by "
                         "physical cores; obs/landmarks per device are the "
                         "scale-invariant signals"},
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
