"""EuRoC / TUM-VI dataset runner: mono and mono-inertial SLAM on real data.

Framework analog of the reference dataset mains
(`/root/reference/Examples/Monocular-Inertial/mono_inertial_euroc.cc:40-246`):
load images + IMU -> per-frame Track with the frame's IMU window -> save
trajectory -> report ATE against ground truth.

Usage:
  python apps/run_euroc.py --seq <dir> [--config <yaml>] [--imu]
         [--tumvi] [--max-frames N] [--save-tum out.txt] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seq', required=True, help='sequence dir (contains mav0/)')
    ap.add_argument('--config', default='',
                    help='settings yaml (default: <seq>/config.yaml)')
    ap.add_argument('--times', default='', help='optional frame times file')
    ap.add_argument('--imu', action='store_true', help='inertial mode')
    ap.add_argument('--stereo', action='store_true', help='stereo mode')
    ap.add_argument('--tumvi', action='store_true', help='TUM-VI GT layout')
    ap.add_argument('--max-frames', type=int, default=0)
    ap.add_argument('--save-tum', default='')
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--quiet', action='store_true')
    ap.add_argument('--load-atlas', default='',
                    help='warm-start from an atlas checkpoint (.npz)')
    ap.add_argument('--save-atlas', default='',
                    help='save the atlas checkpoint at shutdown')
    ap.add_argument('--vocab', default='auto',
                    help="vocabulary .npz for loop closing/relocalization: "
                         "'auto' (shipped 100k-word artifact), 'none', or "
                         "a path")
    ap.add_argument('--localization', action='store_true',
                    help='localization-only mode: freeze mapping, track + '
                         'relocalize against the loaded atlas '
                         '(System::ActivateLocalizationMode)')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np

    from orbslam3_tpu.config import Settings
    from orbslam3_tpu.datasets import load_euroc, load_tumvi, imu_batches
    from orbslam3_tpu.engine.system import Slam
    from orbslam3_tpu.evaluation import ate_rmse
    from orbslam3_tpu.slam_map.map_state import MapConfig

    loader = load_tumvi if args.tumvi else load_euroc
    seq = loader(args.seq, times_file=args.times or None,
                 stereo=args.stereo)
    n = len(seq) if args.max_frames <= 0 else min(len(seq), args.max_frames)
    print(f'{n} frames, {len(seq.imu_ts)} IMU samples, '
          f'GT={"yes" if seq.gt_ts is not None else "no"}')

    cfg_path = args.config or os.path.join(args.seq, 'config.yaml')
    base = 'stereo' if args.stereo else 'monocular'
    sensor = f'imu_{base}' if args.imu else base
    settings = Settings.from_yaml(cfg_path, sensor=sensor)
    cam = settings.camera()
    sys_cfg = settings.system_config(
        map_cfg=MapConfig(max_keyframes=256, max_points=20000,
                          features_per_frame=settings.n_features))
    if args.imu:
        sys_cfg.imu_calib = settings.imu_calib()
    vocab = None
    if args.vocab != 'none':
        from orbslam3_tpu.place.vocab import (Vocabulary,
                                              load_default_vocabulary)
        vocab = (load_default_vocabulary() if args.vocab == 'auto'
                 else Vocabulary.load(args.vocab))
        if vocab is not None:
            print(f'vocabulary: {vocab.n_words} words')
    slam = Slam(cam, sys_cfg, vocab=vocab,
                load_atlas_from=args.load_atlas or None)
    if args.localization:
        slam.activate_localization_mode()

    import cv2
    imu_iter = imu_batches(seq) if args.imu else None
    need_resize = (settings.new_width > 0 and settings.new_height > 0)
    t_wall = time.time()
    track_ms = []
    for i in range(n):
        img = seq.read_image(i)
        if need_resize:
            img = cv2.resize(img, (settings.new_width, settings.new_height))
        imu = next(imu_iter) if imu_iter else None
        t0 = time.time()
        if args.stereo:
            img_r = seq.read_image(i, right=True)
            if need_resize:
                img_r = cv2.resize(img_r,
                                   (settings.new_width, settings.new_height))
            slam.track_stereo(img, img_r, float(seq.image_ts[i]), imu=imu)
        else:
            slam.track_monocular(img, float(seq.image_ts[i]), imu=imu)
        track_ms.append(1e3 * (time.time() - t0))
        if not args.quiet and (i % 20 == 0 or i == n - 1):
            info = slam.print_info()
            print(f'frame {i:4d}  state={info["state"]:<16s} '
                  f'kfs={info["n_kfs"]:3d} mps={info["n_mps"]:6d} '
                  f'track={track_ms[-1]:6.1f} ms')
    wall = time.time() - t_wall
    med = float(np.median(track_ms))
    print(f'\n{n} frames in {wall:.1f}s ({n / wall:.1f} fps); '
          f'median track {med:.1f} ms')

    if args.save_tum:
        slam.save_trajectory_tum(args.save_tum)
        print('saved', args.save_tum)
    if args.save_atlas:
        slam.save_atlas(args.save_atlas)
        print('saved atlas', args.save_atlas)
    if seq.gt_ts is not None:
        poses = slam._full_poses(0)
        if len(poses) >= 5:
            ts = np.array([p[0] for p in poses])
            est = np.array([p[2] for p in poses])  # camera centers
            gt = seq.gt_positions_at(ts)
            metric_scale = args.imu or args.stereo
            ate = ate_rmse(est, gt, with_scale=not metric_scale)
            tag = '' if metric_scale else 'scale-aligned '
            print(f'ATE RMSE ({tag}{len(poses)} frames): {ate * 1e3:.1f} mm')
            return 0
        print('too few tracked frames for ATE')
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
