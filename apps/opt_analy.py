"""Offline acoustic + IMU fusion analysis harness.

Reference analog: `/root/reference/Examples/imu_acoustic_opt_analy.cc`
(modes dispatched in `main`, :18-35) — replay logged or simulated
trajectories, ranges and IMU deltas through the fork's acoustic optimizers
(`Optimizer.cc:5590-5896`) and report position errors per mode.

Modes:
  pos        PoseOptimizationDistanceGivenScale — position from ranges
  regu       PoseOptimizationDistanceRegu — + previous-position regularizer
  imu        IMUAcousticOptimization — ranges + IMU relative-motion factors
  key        IMUAcousticKeyOptimization — keyed variant over a window
  calib      CalibOptimization — solve mic offset t_mc + metric scale

Usage:
  python apps/opt_analy.py [--mode all] [--noise 0.03] [--n 40] [--seed 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', default='all',
                    choices=['all', 'pos', 'regu', 'imu', 'key', 'calib'])
    ap.add_argument('--noise', type=float, default=0.03,
                    help='range noise sigma [m] (acoustic ~3 cm)')
    ap.add_argument('--n', type=int, default=40, help='trajectory length')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np
    from orbslam3_tpu.edge import acoustic

    rng = np.random.default_rng(args.seed)
    # simulated scene: 3 anchor devices + a walking user
    anchors = np.asarray([[0, 0, 0], [3.0, 0, 0.2], [1.5, 2.5, -0.1]],
                         np.float32)
    t = np.linspace(0, 2 * np.pi, args.n)
    traj = np.stack([1.5 + 1.0 * np.cos(t), 1.2 + 0.8 * np.sin(t),
                     0.1 * np.sin(2 * t)], -1).astype(np.float32)

    def ranges(p):
        d = np.linalg.norm(anchors - p, axis=1)
        return (d + rng.normal(0, args.noise, d.shape)).astype(np.float32)

    report = {}
    if args.mode in ('all', 'pos'):
        errs = []
        for p in traj:
            est = np.asarray(acoustic.optimize_position_given_scale(
                p + rng.normal(0, 0.3, 3).astype(np.float32),
                anchors, ranges(p), 1.0))
            errs.append(np.linalg.norm(est - p))
        report['pos'] = float(np.mean(errs))
    if args.mode in ('all', 'regu'):
        errs = []
        prev = traj[0]
        for p in traj:
            est = np.asarray(acoustic.optimize_position_regularized(
                p + rng.normal(0, 0.3, 3).astype(np.float32),
                prev, anchors, ranges(p), 1.0))
            errs.append(np.linalg.norm(est - p))
            prev = est
        report['regu'] = float(np.mean(errs))
    if args.mode in ('all', 'imu'):
        W = 6
        errs = []
        for i in range(W, len(traj)):
            chain = traj[i - W:i + 1]
            dp = np.zeros_like(chain)
            dp[1:] = np.diff(chain, axis=0) + rng.normal(
                0, 0.01, (W, 3)).astype(np.float32)
            est = np.asarray(acoustic.imu_acoustic_optimize(
                chain + rng.normal(0, 0.2, chain.shape).astype(np.float32),
                dp.astype(np.float32), anchors, ranges(chain[-1]), 1.0))
            errs.append(np.linalg.norm(est[-1] - chain[-1]))
        report['imu'] = float(np.mean(errs))
    if args.mode in ('all', 'key'):
        W = 5
        errs = []
        for i in range(W, len(traj)):
            dps = np.diff(traj[i - W:i + 1], axis=0).astype(np.float32)
            dps += rng.normal(0, 0.01, dps.shape).astype(np.float32)
            ds = np.stack([ranges(p) for p in traj[i - W:i + 1]])
            est = np.asarray(acoustic.imu_acoustic_key_optimize(
                traj[i - W:i + 1] + rng.normal(0, 0.2, (W + 1, 3)
                                               ).astype(np.float32),
                dps, ds, anchors, 1.0))
            errs.append(np.linalg.norm(est[-1] - traj[i]))
        report['key'] = float(np.mean(errs))
    if args.mode in ('all', 'calib'):
        # mic offset + scale recovery (CalibOptimization, Optimizer.cc:5845)
        from scipy.spatial.transform import Rotation
        t_mc_true = np.asarray([0.05, -0.02, 0.08], np.float32)
        s_true = 1.7
        K, M = 20, 3
        R0 = Rotation.random(K, rng).as_matrix().astype(np.float32)
        t0s = rng.uniform(-2, 2, (K, 3)).astype(np.float32)
        R_others = Rotation.random(M, rng).as_matrix().astype(np.float32)
        t_others = rng.uniform(-2, 2, (M, 3)).astype(np.float32)
        wm0 = np.einsum('kij,j->ki', R0, -s_true * t_mc_true) + t0s
        wm1 = np.einsum('mij,j->mi', R_others, -s_true * t_mc_true) + t_others
        d = (np.linalg.norm(wm0[:, None] - wm1[None, :], axis=-1) / s_true
             + rng.normal(0, args.noise, (K, M)))
        est = acoustic.calibrate_mic_offset(
            np.zeros(3, np.float32), 1.0, R0, t0s, R_others, t_others,
            d.astype(np.float32), n_iters=30)
        t_mc_est, s_est = np.asarray(est[0]), float(est[1])
        report['calib'] = dict(
            t_mc_err=float(np.linalg.norm(t_mc_est - t_mc_true)),
            scale_err=abs(s_est - s_true) / s_true)

    print('\n== acoustic fusion analysis ==')
    for k, v in report.items():
        if isinstance(v, dict):
            print(f'{k:6s}: ' + ', '.join(f'{a}={b:.4f}'
                                          for a, b in v.items()))
        else:
            print(f'{k:6s}: mean position error {v * 100:.1f} cm')
    return 0


if __name__ == '__main__':
    sys.exit(main())
