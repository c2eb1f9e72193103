"""Pixel-phone offline dataset runner (multi-sequence mono-inertial).

Framework analog of the fork's offline phone main
(`/root/reference/Examples/Monocular-Inertial/mono_inertial_pixel.cc:33-130`):
TUM-VI-style loading — an image directory + a timestamps file (one ns
timestamp per line, image at `<dir>/<ts>.png`) + a EuRoC-format IMU csv —
with MULTI-SEQUENCE support: each `--seq images,times,imu` triple runs in
order with `ChangeDataset` between (`mono_inertial_pixel.cc:260`), so each
sequence starts a fresh Atlas map and place recognition may weld them.

Usage:
  python apps/run_pixel.py --config PIXEL6.yaml \
      --seq imgs1,times1.txt,imu1.csv [--seq imgs2,times2.txt,imu2.csv ...]
      [--save-tum out.txt] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def load_pixel_sequence(img_dir: str, times_file: str, imu_csv: str):
    """(image paths, image ts (s), imu ts, gyro, acc) — LoadImagesTUMVI +
    LoadIMU (mono_inertial_pixel.cc:306-370)."""
    import numpy as np
    paths, ts = [], []
    with open(times_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            item = line.split()[0].split(',')[0]
            paths.append(os.path.join(img_dir, item + '.png'))
            ts.append(float(item) * 1e-9)
    rows = []
    with open(imu_csv) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            rows.append([float(x) for x in line.split(',')[:7]])
    arr = np.asarray(rows, np.float64)
    return (paths, np.asarray(ts, np.float64),
            arr[:, 0] * 1e-9, arr[:, 1:4], arr[:, 4:7])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--seq', action='append', required=True,
                    metavar='IMAGES,TIMES,IMU',
                    help='one sequence triple; repeat for multi-sequence')
    ap.add_argument('--save-tum', default='')
    ap.add_argument('--vocab', default='auto')
    ap.add_argument('--max-frames', type=int, default=0)
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--quiet', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import cv2
    import numpy as np

    from orbslam3_tpu.config import Settings
    from orbslam3_tpu.engine.system import Slam
    from orbslam3_tpu.slam_map.map_state import MapConfig

    st = Settings.from_yaml(args.config, sensor='imu-monocular')
    cfg = st.system_config(map_cfg=MapConfig(
        max_keyframes=256, max_points=20000,
        features_per_frame=st.n_features))
    cfg.imu_calib = st.imu_calib()
    vocab = None
    if args.vocab != 'none':
        from orbslam3_tpu.place.vocab import (Vocabulary,
                                              load_default_vocabulary)
        vocab = (load_default_vocabulary() if args.vocab == 'auto'
                 else Vocabulary.load(args.vocab))
    slam = Slam(st.camera(), cfg, vocab=vocab)

    need_resize = st.new_width > 0 and st.new_height > 0
    for si, triple in enumerate(args.seq):
        img_dir, times_file, imu_csv = triple.split(',')
        paths, img_ts, imu_ts, gyro, acc = load_pixel_sequence(
            img_dir, times_file, imu_csv)
        n = len(paths) if args.max_frames <= 0 else min(len(paths),
                                                        args.max_frames)
        print(f'sequence {si}: {n} frames, {len(imu_ts)} IMU samples')
        j = int(np.searchsorted(imu_ts, img_ts[0], side='right'))
        for i in range(n):
            img = cv2.imread(paths[i], cv2.IMREAD_GRAYSCALE)
            if img is None:
                print(f'skipping unreadable {paths[i]}')
                continue
            if need_resize:
                img = cv2.resize(img, (st.new_width, st.new_height))
            j2 = int(np.searchsorted(imu_ts, img_ts[i], side='right'))
            imu = [(float(imu_ts[k]), gyro[k].astype(np.float32),
                    acc[k].astype(np.float32)) for k in range(j, j2)]
            j = j2
            slam.track_monocular(img, float(img_ts[i]), imu=imu)
            if not args.quiet and i % 50 == 0:
                tr = slam.trackers[0]
                print(f'[s{si} {i:5d}] state={tr.state.name} '
                      f'kfs={slam.atlas.active.n_keyframes}')
        if si < len(args.seq) - 1:
            slam.change_dataset()   # reference mono_inertial_pixel.cc:260

    if args.save_tum:
        slam.save_trajectory_tum(args.save_tum)
        print('saved', args.save_tum)
    print(slam.print_info())


if __name__ == '__main__':
    main()
