"""TUM-RGBD dataset runner.

Framework analog of the reference's RGB-D example main
(`/root/reference/Examples/RGB-D/rgbd_tum.cc:35-160`): load associated
rgb+depth pairs -> per-frame TrackRGBD -> save trajectory -> report metric
ATE against ground truth (RGB-D fixes scale, so no alignment).

Usage:
  python apps/run_rgbd.py --seq <dir> [--config <yaml>]
         [--association <file>] [--max-frames N] [--save-tum out.txt] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seq', required=True,
                    help='TUM-RGBD sequence dir (rgb/ depth/ rgb.txt ...)')
    ap.add_argument('--config', default='',
                    help='settings yaml (default: <seq>/config.yaml)')
    ap.add_argument('--association', default='',
                    help='associate.py output file (default: associate '
                         'rgb.txt/depth.txt by nearest timestamp)')
    ap.add_argument('--max-frames', type=int, default=0)
    ap.add_argument('--save-tum', default='')
    ap.add_argument('--vocab', default='auto',
                    help="vocabulary .npz: 'auto' (shipped), 'none', or path")
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--quiet', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np

    from orbslam3_tpu.config import Settings
    from orbslam3_tpu.datasets.tum_rgbd import load_tum_rgbd
    from orbslam3_tpu.engine.system import Slam
    from orbslam3_tpu.evaluation import ate_rmse
    from orbslam3_tpu.slam_map.map_state import MapConfig

    seq = load_tum_rgbd(args.seq, association_file=args.association or None)
    n = len(seq) if args.max_frames <= 0 else min(len(seq), args.max_frames)
    print(f'{n} associated rgb-d pairs')

    cfg_path = args.config or os.path.join(args.seq, 'config.yaml')
    st = Settings.from_yaml(cfg_path, sensor='rgbd')
    cfg = st.system_config(map_cfg=MapConfig(
        max_keyframes=256, max_points=20000,
        features_per_frame=st.n_features))
    vocab = None
    if args.vocab != 'none':
        from orbslam3_tpu.place.vocab import (Vocabulary,
                                              load_default_vocabulary)
        vocab = (load_default_vocabulary() if args.vocab == 'auto'
                 else Vocabulary.load(args.vocab))
    slam = Slam(st.camera(), cfg, vocab=vocab)
    # reference inverts DepthMapFactor once (Tracking.cc ctor): raw 16-bit
    # depth * (1/factor) = meters
    inv_factor = (1.0 / st.depth_map_factor
                  if abs(st.depth_map_factor) > 1e-5 else 1.0)

    t_start = time.time()
    for i in range(n):
        slam.track_rgbd(seq.read_image(i), seq.read_depth(i),
                        float(seq.image_ts[i]), depth_factor=inv_factor)
        if not args.quiet and (i % 20 == 0 or i == n - 1):
            tr = slam.trackers[0]
            print(f'[{i:4d}] state={tr.state.name} '
                  f'kfs={slam.atlas.active.n_keyframes} '
                  f'pts={slam.atlas.active.n_points}')
    wall = time.time() - t_start
    print(f'{n} frames in {wall:.1f} s ({1e3 * wall / n:.1f} ms/frame)')

    if args.save_tum:
        slam.save_trajectory_tum(args.save_tum)
        print('saved', args.save_tum)

    if seq.gt_ts is not None:
        poses = slam._full_poses(0)
        if poses:
            ts = np.array([p[0] for p in poses])
            est = np.array([p[2] for p in poses])
            gt = seq.gt_positions_at(ts)
            ate = ate_rmse(est, gt, with_scale=False)  # metric: depth = scale
            print(f'metric ATE: {ate * 100:.2f} cm over {len(poses)} frames')


if __name__ == '__main__':
    main()
