"""ATE evaluation CLI — port of the reference's evaluation harness.

Replaces `/root/reference/evaluation/evaluate_ate_scale.py` +
`associate.py`: associates an estimated TUM-format trajectory with ground
truth by timestamp, Horn-aligns (optionally with optimal monocular scale),
and prints RMSE stats.

Usage: python apps/eval_ate.py GT_FILE EST_FILE [--scale] [--max-dt 0.02]
GT accepts EuRoC csv (ns timestamps) or TUM txt.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from orbslam3_tpu.evaluation import associate, umeyama_alignment  # noqa: E402


def load_traj(path: str):
    """Load TUM txt (`ts x y z ...`) or EuRoC csv (`ts_ns,x,y,z,...`)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            parts = line.replace(',', ' ').split()
            rows.append([float(p) for p in parts[:4]])
    a = np.asarray(rows)
    ts = a[:, 0]
    if ts.max() > 1e14:   # nanoseconds
        ts = ts * 1e-9
    return ts, a[:, 1:4]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('gt')
    ap.add_argument('est')
    ap.add_argument('--scale', action='store_true',
                    help='optimal scale alignment (monocular)')
    ap.add_argument('--max-dt', type=float, default=0.02)
    args = ap.parse_args()

    ts_g, p_g = load_traj(args.gt)
    ts_e, p_e = load_traj(args.est)
    ia, ib = associate(ts_e, ts_g, max_dt=args.max_dt)
    if len(ia) < 2:
        print('error: fewer than 2 associated pairs', file=sys.stderr)
        return 2
    est, gt = p_e[ia], p_g[ib]
    s, R, t = umeyama_alignment(est, gt, with_scale=args.scale)
    aligned = s * est @ R.T + t
    err = np.linalg.norm(aligned - gt, axis=1)
    print(f'compared_pose_pairs {len(err)} pairs')
    print(f'absolute_translational_error.rmse '
          f'{np.sqrt(np.mean(err ** 2)):.6f} m')
    print(f'absolute_translational_error.mean {err.mean():.6f} m')
    print(f'absolute_translational_error.median {np.median(err):.6f} m')
    print(f'absolute_translational_error.std {err.std():.6f} m')
    print(f'absolute_translational_error.min {err.min():.6f} m')
    print(f'absolute_translational_error.max {err.max():.6f} m')
    if args.scale:
        print(f'alignment_scale {s:.6f}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
