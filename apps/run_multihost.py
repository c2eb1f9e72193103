"""Two-host SLAM demo: cross-host map weld + joint global-mesh BA.

The multi-host story end to end (BASELINE.md "frames/s at 1 chip / 1 host /
>= 2 hosts"; reference analog: the serialized-Atlas hand-off,
`/root/reference/src/System.cc:1529-1673`):

  1. Both processes join one jax.distributed runtime (CPU rig: 2 procs x 4
     virtual devices = one 8-device global mesh; on TPU pods the same code
     spans hosts over ICI).
  2. Each process tracks its own SEGMENT of the trajectory against the
     shared world (feature-level synthetic frames) — two SLAM sessions on
     two hosts.
  3. Host 1 streams its finished map to host 0 over TCP as keyframe blocks
     (`distributed.host_exchange`, DCN plane); host 0 adopts + welds it
     into its Atlas (`Atlas.weld`).
  4. Host 0 broadcasts the merged BA problem back; BOTH hosts solve it
     together with the landmark-sharded Schur BA on the global mesh
     (`distributed.multihost.global_ba`, ICI plane).

Run (two shells or the test harness):
  python apps/run_multihost.py --process-id 0 --coordinator localhost:9801
  python apps/run_multihost.py --process-id 1 --coordinator localhost:9801
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--process-id', type=int, required=True)
    ap.add_argument('--coordinator', default='localhost:9801')
    ap.add_argument('--map-port', type=int, default=9802)
    ap.add_argument('--n-frames', type=int, default=120)
    ap.add_argument('--n-points', type=int, default=1500)
    ap.add_argument('--local-devices', type=int, default=4)
    ap.add_argument('--ba-iters', type=int, default=8)
    ap.add_argument('--platform', default='cpu',
                    help="'cpu' for the virtual-device rig; 'none' keeps "
                         "the environment default (TPU pod slices)")
    args = ap.parse_args()
    pid = args.process_id

    from orbslam3_tpu.distributed import multihost
    multihost.initialize(args.coordinator, num_processes=2, process_id=pid,
                         local_devices=args.local_devices,
                         platform=None if args.platform == 'none'
                         else args.platform)
    import jax
    import numpy as np
    n_global = jax.device_count()
    print(f'[{pid}] joined: {n_global} global devices '
          f'({jax.local_device_count()} local)', flush=True)

    from orbslam3_tpu.core.camera import Camera
    from orbslam3_tpu.distributed import host_exchange as hx
    from orbslam3_tpu.engine.local_mapping import LocalMapper
    from orbslam3_tpu.engine.tracking import Tracker, TrackerConfig
    from orbslam3_tpu.evaluation import ate_rmse
    from orbslam3_tpu.opt.ba import BAProblem
    from orbslam3_tpu.slam_map.atlas import Atlas
    from orbslam3_tpu.slam_map.map_state import MapConfig
    from orbslam3_tpu.utils import synth

    cam = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)
    cfg = MapConfig(max_keyframes=128, max_points=16384,
                    features_per_frame=500)

    # ---- 2. track my segment of the shared world (overlapping split)
    n = args.n_frames
    world = synth.make_world(n_points=args.n_points, seed=11)
    R_gt, t_gt = synth.orbit_trajectory(n_frames=n, radius=3.0,
                                        arc=1.2 * np.pi)
    half = n // 2
    overlap = n // 8
    seg = (range(0, half + overlap) if pid == 0
           else range(half - overlap, n))
    atlas = Atlas(cfg)
    m = atlas.active
    tracker = Tracker(cam, m, TrackerConfig(n_features=500),
                      local_mapper=LocalMapper(cam, m))
    for i in seg:
        feats, _ = synth.render_features(world, R_gt[i], t_gt[i], cam,
                                         capacity=500, seed=50_000 + i)
        tracker.process_features(feats, i * 0.05)
    print(f'[{pid}] tracked segment: {m.n_keyframes} KFs '
          f'{m.n_points} points', flush=True)

    # ---- 3. DCN plane: host 1 ships its map to host 0; host 0 welds
    if pid == 1:
        sock = hx.connect(args.map_port)
        hx.send_map(sock, m)
        name, arrays = hx.recv_arrays(sock)  # merged BA problem
        prob = BAProblem(**{k: arrays[k] for k in BAProblem._fields})
        kfs = arrays['__kfs__']
    else:
        sock = hx.serve_once(args.map_port)
        remote = hx.recv_map(sock, cfg, map_id=99)
        rid = atlas.adopt(remote)
        n_before = m.n_keyframes
        # both sessions share the world gauge here; production merges get
        # the seam Sim3 from place recognition (LoopCloser._merge_maps)
        kf_map = atlas.weld(m.map_id, rid, 1.0, np.eye(3, dtype=np.float32),
                            np.zeros(3, np.float32))
        print(f'[{pid}] welded {len(kf_map)} remote KFs into map '
              f'{m.map_id} ({n_before} -> {m.n_keyframes} KFs)', flush=True)
        # merged BA problem over the welded map
        kfs = m.keyframe_ids()
        slot = np.full(m.cfg.max_keyframes, -1, np.int64)
        slot[kfs] = np.arange(len(kfs))
        mp_ids = np.nonzero(m.mp_valid)[0]
        pslot = np.full(m.cfg.max_points, -1, np.int64)
        pslot[mp_ids] = np.arange(len(mp_ids))
        kk, ss, mm = m.observations_of(mp_ids)
        fixed = np.zeros(len(kfs), bool)
        fixed[0] = True
        prob = BAProblem(
            R=m.kf_R[kfs], t=m.kf_t[kfs], points=m.mp_pos[mp_ids],
            kf_idx=slot[kk].astype(np.int32),
            lm_idx=pslot[mm].astype(np.int32),
            uv=m.kf_uv[kk, ss].astype(np.float32),
            info=(1.0 / 1.2 ** (2 * m.kf_octave[kk, ss])).astype(
                np.float32),
            valid=np.ones(len(kk), bool), fixed_kf=fixed,
            fixed_lm=np.zeros(len(mp_ids), bool))
        arrays = {k: np.asarray(getattr(prob, k))
                  for k in BAProblem._fields}
        arrays['__kfs__'] = kfs
        hx.send_arrays(sock, 'merged_ba', arrays)

    # ---- 4. ICI plane: joint solve on the global mesh (both processes)
    import time
    t0 = time.perf_counter()
    out, costs = multihost.global_ba(prob, cam, n_iters=args.ba_iters)
    wall = time.perf_counter() - t0
    print(f'[{pid}] joint BA on {n_global}-device global mesh: cost '
          f'{float(costs[0]):.1f} -> {float(costs[-1]):.1f} in '
          f'{wall:.1f}s', flush=True)
    assert costs[-1] <= costs[0], 'joint BA diverged'

    if pid == 0:
        m.kf_R[kfs] = out.R.astype(np.float32)
        m.kf_t[kfs] = out.t.astype(np.float32)
        centers = np.array([-out.R[i].T @ out.t[i]
                            for i in range(len(kfs))])
        fids = m.kf_frame_id[kfs]
        gt_c = np.array([-R_gt[f].T @ t_gt[f] for f in fids])
        ate = ate_rmse(centers, gt_c, with_scale=True)
        print(f'[{pid}] merged-map KF ATE after joint BA: '
              f'{ate * 1e3:.1f} mm over {len(kfs)} KFs', flush=True)
        print(f'MULTIHOST OK welded_kfs={len(kfs)} ate_mm={ate * 1e3:.1f}',
              flush=True)
    else:
        print('MULTIHOST OK (worker)', flush=True)
    sock.close()


if __name__ == '__main__':
    main()
