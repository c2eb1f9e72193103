"""Edge-assisted SLAM server: the fork's `mono_inertial_edge` main.

Reference: `/root/reference/Examples/Monocular-Inertial/mono_inertial_edge.cc`
(:45-141) — start System + Server, accept phone clients streaming
keypoints+descriptors+IMU (SlamPktVI over TCP :8080) and acoustic interval
reports (:8848), periodically broadcast chirp "emit" commands, convert
interval pairs to inter-device distances, fuse them with SLAM poses
(`PoseOptimizationDistanceGivenScale`, Optimizer.cc:5590) and rewrite the
affected trajectory entries; on shutdown save per-client trajectories.

Usage:
  python apps/run_edge_server.py [--config yaml] [--port 8080]
      [--acoustic-port 8848] [--duration 60] [--out-dir traj_out] [--cpu]

With --selftest: spins up fake phone clients in-process (edge/client_sim)
replaying a synthetic sequence, so the full wire path runs with no hardware.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='')
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--port', type=int, default=8080)
    ap.add_argument('--acoustic-port', type=int, default=8848)
    ap.add_argument('--duration', type=float, default=60.0)
    ap.add_argument('--acoustic-period', type=float, default=2.0)
    ap.add_argument('--out-dir', default='traj_out')
    ap.add_argument('--features', type=int, default=1000)
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--selftest', action='store_true',
                    help='run fake phone clients in-process')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np

    from orbslam3_tpu.core.camera import Camera
    from orbslam3_tpu.edge import acoustic
    from orbslam3_tpu.edge.server import EdgeServer
    from orbslam3_tpu.engine.system import Slam, Sensor, SystemConfig
    from orbslam3_tpu.engine.tracking import TrackerConfig
    from orbslam3_tpu.slam_map.map_state import MapConfig

    if args.config:
        from orbslam3_tpu.config import Settings
        st = Settings.from_yaml(args.config, sensor='imu_monocular')
        cam = st.camera()
        sys_cfg = st.system_config()
        sys_cfg.imu_calib = st.imu_calib()
    else:
        cam = Camera.pinhole(458.0, 458.0, 320.0, 240.0,
                             width=640, height=480)
        sys_cfg = SystemConfig(
            sensor=Sensor.IMU_MONOCULAR,
            map=MapConfig(256, 20000, args.features),
            tracker=TrackerConfig(n_features=args.features))
        from orbslam3_tpu.imu.preintegration import ImuCalib
        sys_cfg.imu_calib = ImuCalib.create()

    slam = Slam(cam, sys_cfg)
    server = EdgeServer(slam.track_edge, host=args.host,
                        slam_port=args.port,
                        acoustic_port=args.acoustic_port)
    print(f'edge server on {args.host}:{args.port} '
          f'(acoustic :{args.acoustic_port})')

    phones = []
    if args.selftest:
        from orbslam3_tpu.edge.client_sim import FakePhone
        from orbslam3_tpu.utils import synth
        world = synth.make_world(n_points=3000, seed=2)
        R_gt, t_gt = synth.orbit_trajectory(n_frames=200, radius=3.0, arc=1.0)
        for cid in range(2):
            phones.append((FakePhone(args.host, args.port,
                                     args.acoustic_port),
                           world, R_gt, t_gt, cid))
        print('selftest: 2 fake phones connected')

    t_end = time.time() + args.duration
    last_emit = 0.0
    frame_i = 0
    try:
        while time.time() < t_end:
            now = time.time()
            # acoustic schedule (server.cc:168-189): wait for all clients,
            # broadcast "emit", phones chirp + report intervals
            if now - last_emit >= args.acoustic_period and server.lanes:
                server.broadcast_emit()
                last_emit = now
                dists = server.cal_acoustic()
                if dists:
                    _fuse_acoustic(server, dists, np)
            if phones and frame_i < 200:
                for phone, world, R_gt, t_gt, cid in phones:
                    feats, _ = synth.render_features(
                        world, R_gt[frame_i], t_gt[frame_i], cam,
                        capacity=args.features, seed=900 + frame_i + cid)
                    uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
                    db = np.asarray(feats.desc)[np.asarray(feats.valid)]
                    phone.send_frame(frame_i, int((100 + frame_i * 0.05)
                                                  * 1e9), uv, db)
                frame_i += 1
                time.sleep(0.01)
            else:
                time.sleep(0.05)
    except KeyboardInterrupt:
        pass

    os.makedirs(args.out_dir, exist_ok=True)
    for cid in list(slam.trackers):
        path = os.path.join(args.out_dir, f'traj_client{cid}.txt')
        slam.save_trajectory_tum(path, client_id=cid)
        print('saved', path)
    for p in phones:
        p[0].close()
    server.close()
    slam.shutdown()
    return 0


def _fuse_acoustic(server, dists, np):
    """Acoustic fusion pass (mono_inertial_edge.cc:50-91): for each client
    with a fresh pose, solve position given ranges to the other clients'
    SLAM positions (PoseOptimizationDistanceGivenScale) and rewrite the
    trajectory entry."""
    from orbslam3_tpu.edge import acoustic
    lanes = list(server.lanes.values())
    positions = {ln.client_id: ln.latest_position() for ln in lanes}
    for ln in lanes:
        pos = positions.get(ln.client_id)
        others = [positions[o.client_id] for o in lanes
                  if o.client_id != ln.client_id
                  and positions.get(o.client_id) is not None]
        if pos is None or not others or not dists:
            continue
        idx, p0 = pos
        anchors = np.asarray([p for _, p in others], np.float32)
        d = np.asarray(dists[:len(others)], np.float32)
        new_p = acoustic.optimize_position_given_scale(
            np.asarray(p0, np.float32), anchors, d, 1.0)
        ln.rewrite_traj(idx, np.asarray(new_p))


if __name__ == '__main__':
    sys.exit(main())
