"""KITTI odometry runner (stereo or monocular).

Framework analog of the reference's KITTI example mains
(`/root/reference/Examples/Stereo/stereo_kitti.cc:35-150` and
`Examples/Monocular/mono_kitti.cc`): load image_0[/image_1] + times.txt,
per-frame Track, save the KITTI-format trajectory, report ATE against the
odometry ground-truth poses file when given.

Usage:
  python apps/run_kitti.py --seq <dir> --config <KITTIxx.yaml> [--mono]
         [--poses 00.txt] [--max-frames N] [--save-kitti out.txt] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seq', required=True,
                    help='KITTI sequence dir (image_0/ [image_1/] times.txt)')
    ap.add_argument('--config', default='',
                    help='settings yaml (default: <seq>/config.yaml)')
    ap.add_argument('--mono', action='store_true',
                    help='monocular instead of stereo')
    ap.add_argument('--poses', default='',
                    help='GT poses file (dataset poses/NN.txt) for ATE')
    ap.add_argument('--max-frames', type=int, default=0)
    ap.add_argument('--save-kitti', default='')
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
    from orbslam3_tpu.datasets import load_kitti
    from orbslam3_tpu.engine.system import Slam
    from orbslam3_tpu.evaluation import ate_rmse
    from orbslam3_tpu.slam_map.map_state import MapConfig

    seq = load_kitti(args.seq, poses_file=args.poses or None,
                     stereo=not args.mono)
    n = len(seq) if args.max_frames <= 0 else min(len(seq), args.max_frames)
    print(f'{n} frames ({"mono" if args.mono else "stereo"})')

    cfg_path = args.config or os.path.join(args.seq, 'config.yaml')
    st = Settings.from_yaml(cfg_path,
                            sensor='monocular' if args.mono else 'stereo')
    cfg = st.system_config(map_cfg=MapConfig(
        max_keyframes=512, max_points=40000,
        features_per_frame=st.n_features))
    vocab = None
    if args.vocab != 'none':
        from orbslam3_tpu.place.vocab import (Vocabulary,
                                              load_default_vocabulary)
        vocab = (load_default_vocabulary() if args.vocab == 'auto'
                 else Vocabulary.load(args.vocab))
    slam = Slam(st.camera(), cfg, vocab=vocab)

    t_start = time.time()
    for i in range(n):
        if args.mono:
            slam.track_monocular(seq.read_image(i), float(seq.image_ts[i]))
        else:
            slam.track_stereo(seq.read_image(i), seq.read_image(i, right=True),
                              float(seq.image_ts[i]))
        if not args.quiet and (i % 50 == 0 or i == n - 1):
            tr = slam.trackers[0]
            print(f'[{i:5d}] state={tr.state.name} '
                  f'kfs={slam.atlas.active.n_keyframes} '
                  f'pts={slam.atlas.active.n_points}')
    wall = time.time() - t_start
    print(f'{n} frames in {wall:.1f} s ({1e3 * wall / n:.1f} ms/frame)')

    if args.save_kitti:
        slam.save_trajectory_kitti(args.save_kitti)
        print('saved', args.save_kitti)

    if seq.gt_poses is not None:
        poses = slam._full_poses(0)
        if poses:
            ts = np.array([p[0] for p in poses])
            est = np.array([p[2] for p in poses])
            # KITTI GT rows are frame-indexed; map times back to indices
            lut = {round(float(t), 6): i for i, t in enumerate(seq.image_ts)}
            idx = np.array([lut.get(round(float(t), 6), -1) for t in ts])
            sel = idx >= 0
            gt = seq.gt_poses[idx[sel], :, 3]
            ate = ate_rmse(est[sel], gt, with_scale=args.mono)
            kind = 'scale-aligned' if args.mono else 'metric'
            print(f'{kind} ATE: {ate * 100:.2f} cm over {int(sel.sum())} '
                  f'frames')


if __name__ == '__main__':
    main()
