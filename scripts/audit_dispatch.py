"""Per-frame dispatch / transfer / host-work audit on a CO-LOCATED backend.

Answers the open real-time question (VERDICT r4 weak #3): with no network
tunnel between host and device, how many device programs and host<->device
transfers does one tracked frame cost, and how much non-device host work is
left? The reference's tracking thread does everything on the host in
20-40 ms/frame (BASELINE.md §B); our target shape is a handful of fused
device programs per frame with ~zero host numeric work.

Method: run the full mono pipeline (tracking + async mapping + vocabulary)
on the CPU backend (host == device, ~0 transfer cost), steady state over a
rendered EuRoC-like sequence at the 1000-feature operating point.
  * dispatches/frame: `timing.count()` tallies at the tracker's device-call
    sites, cross-checked by timing wrappers around the jitted entry points;
  * transfers/frame: EXTERNAL ground truth from jax's transfer guard
    (C++-logged, counted by `timing.transfer_audit` — not self-reported);
  * host ms/frame: frame wall minus the blocked wall of every device call
    (wrappers `block_until_ready` their outputs, so device time is fully
    attributed; what remains is Python/numpy bookkeeping).

Prints ONE JSON line; bench.py runs this as a subprocess and folds the
numbers into its report.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


DEV_WALL = [0.0]
DEV_CALLS = [0]


def timed(f):
    def g(*a, **k):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*a, **k))
        DEV_WALL[0] += time.perf_counter() - t0
        DEV_CALLS[0] += 1
        return out
    return g


def patch_device_entry_points():
    """Wrap every jitted function the tracking thread calls, in the
    namespaces it calls them from."""
    import orbslam3_tpu.engine.tracking as T
    import orbslam3_tpu.imu.preintegration as P
    import orbslam3_tpu.opt.pose_inertial as PI
    import orbslam3_tpu.vision.frame as VF
    T.fused_track_pose = timed(T.fused_track_pose)
    T.extract_features = timed(T.extract_features)
    T.optimize_pose = timed(T.optimize_pose)
    VF.extract_features = timed(VF.extract_features)
    P.preintegrate = timed(P.preintegrate)
    P.corrected_deltas = timed(P.corrected_deltas)
    P.merge = timed(P.merge)
    PI.optimize_pose_inertial = timed(PI.optimize_pose_inertial)


def main():
    from orbslam3_tpu.core.camera import Camera
    from orbslam3_tpu.datasets.render import BoxScene
    from orbslam3_tpu.datasets.synth_euroc import excited_trajectory
    from orbslam3_tpu.engine.system import Sensor, Slam, SystemConfig
    from orbslam3_tpu.engine.tracking import TrackerConfig
    from orbslam3_tpu.slam_map.map_state import MapConfig
    from orbslam3_tpu.utils import timing

    patch_device_entry_points()

    W, H, NF = 752, 480, 1000
    fx = 458.0
    cam = Camera.pinhole(fx, fx, W / 2, H / 2, width=W, height=H)
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
    scene = BoxScene.default(seed=2)
    center = (scene.lo + scene.hi) / 2.0
    center = (float(center[0]), float(center[1]), float(center[2]) + 3.0)
    n_frames = 60
    R_cw, t_cw, _, _, _, _ = excited_trajectory(
        n_frames, 20.0, 200.0, center, radius=3.0, arc=0.7,
        excitation=0.04, seed=2)
    imgs = [scene.render(K, R_cw[i], t_cw[i], W, H, seed=1000 + i)
            for i in range(n_frames)]

    vocab = None
    try:
        from orbslam3_tpu.place.vocab import load_default_vocabulary
        vocab = load_default_vocabulary()
    except Exception:
        pass
    cfg = SystemConfig(sensor=Sensor.MONOCULAR,
                       map=MapConfig(256, 20000, NF),
                       tracker=TrackerConfig(n_features=NF),
                       async_mapping=True)
    slam = Slam(cam, cfg, vocab=vocab)
    ts = np.arange(n_frames) / 20.0
    dev_imgs = [jnp.asarray(im, jnp.float32) for im in imgs]

    n_warm = 15
    for i in range(n_warm):
        slam.track_monocular(dev_imgs[i], float(ts[i]))

    timing.reset_counts()
    DEV_WALL[0] = 0.0
    DEV_CALLS[0] = 0
    n_meas = n_frames - n_warm
    box = {}
    walls, devs = [], []
    t0 = time.perf_counter()
    with timing.transfer_audit(box):
        for i in range(n_warm, n_frames):
            d0 = DEV_WALL[0]
            f0 = time.perf_counter()
            slam.track_monocular(dev_imgs[i], float(ts[i]))
            walls.append(time.perf_counter() - f0)
            devs.append(DEV_WALL[0] - d0)
    wall = time.perf_counter() - t0
    try:
        slam.shutdown()
    except Exception:
        pass

    counted = sum(timing.counts().values())
    walls = np.asarray(walls) * 1e3
    devs = np.asarray(devs) * 1e3
    hosts = walls - devs
    ms = wall / n_meas * 1e3
    print(json.dumps({
        "ms_per_frame_colocated": round(ms, 2),
        "ms_per_frame_median": round(float(np.median(walls)), 2),
        "device_ms_per_frame_median": round(float(np.median(devs)), 2),
        "host_ms_per_frame_median": round(float(np.median(hosts)), 2),
        "host_ms_per_frame_p90": round(float(np.percentile(hosts, 90)), 2),
        "dispatches_per_frame": round(counted / n_meas, 2),
        "device_calls_per_frame": round(DEV_CALLS[0] / n_meas, 2),
        "transfers_h2d_per_frame": round(box.get("h2d", 0) / n_meas, 2),
        "transfers_d2h_per_frame": round(box.get("d2h", 0) / n_meas, 2),
        "dispatch_breakdown": {k: round(v / n_meas, 2)
                               for k, v in sorted(timing.counts().items())},
        "n_frames_measured": n_meas,
    }))


if __name__ == "__main__":
    main()
