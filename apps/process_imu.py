"""IMU noise calibration: Allan-deviation analysis of a static recording.

Reference analog:
`/root/reference/Examples/Calibration/python_scripts/process_imu.py` +
Calibration_Tutorial.pdf — estimate the white-noise density (N) and bias
random walk (B) for gyro and accelerometer from a long stationary log, the
values that go into the yaml IMU.NoiseGyro/NoiseAcc/GyroWalk/AccWalk fields.

Method: overlapping Allan variance per axis; N is read at tau = 1 s on the
-1/2 slope, B at the +1/2 slope minimum (standard Kalibr/IMU-TK recipe).

Usage:
  python apps/process_imu.py --imu <mav0/imu0/data.csv> [--out allan.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def allan_deviation(x, fs, taus):
    """Overlapping Allan deviation of rate signal x sampled at fs."""
    import numpy as np
    theta = np.cumsum(x) / fs           # integrated signal
    N = len(theta)
    out = []
    for tau in taus:
        m = int(round(tau * fs))
        if m < 1 or 2 * m >= N:
            out.append(np.nan)
            continue
        d = theta[2 * m:] - 2 * theta[m:-m] + theta[:-2 * m]
        avar = 0.5 * np.mean(d ** 2) / tau ** 2
        out.append(np.sqrt(avar))
    return np.asarray(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--imu', required=True, help='EuRoC-format imu0 csv')
    ap.add_argument('--out', default='')
    args = ap.parse_args()

    import numpy as np
    rows = np.genfromtxt(args.imu, delimiter=',', comments='#')
    ts = rows[:, 0] * 1e-9
    gyro = rows[:, 1:4]
    acc = rows[:, 4:7]
    fs = 1.0 / np.median(np.diff(ts))
    dur = ts[-1] - ts[0]
    print(f'{len(ts)} samples @ {fs:.1f} Hz, {dur:.1f} s')
    taus = np.logspace(np.log10(2 / fs), np.log10(max(dur / 10, 1.0)), 60)

    results = {}
    for name, sig in (('gyro', gyro), ('acc', acc)):
        adevs = np.stack([allan_deviation(sig[:, k] - sig[:, k].mean(), fs,
                                          taus) for k in range(3)])
        adev = np.nanmean(adevs, axis=0)
        # white noise N: sigma(tau) = N / sqrt(tau) -> read at tau=1s
        i1 = int(np.nanargmin(np.abs(taus - 1.0)))
        N = adev[i1] * np.sqrt(taus[i1])
        # random walk B: sigma(tau) = B sqrt(tau/3) -> read at the minimum
        imin = int(np.nanargmin(adev))
        B = adev[imin] * np.sqrt(3.0 / taus[imin])
        results[name] = (N, B, adev)
        unit = 'rad/s' if name == 'gyro' else 'm/s^2'
        print(f'{name}: noise density N = {N:.6g} {unit}/sqrt(Hz), '
              f'random walk B = {B:.6g} {unit}*sqrt(Hz)')

    print('\nyaml fields:')
    print(f'IMU.NoiseGyro: {results["gyro"][0]:.6g}')
    print(f'IMU.GyroWalk: {results["gyro"][1]:.6g}')
    print(f'IMU.NoiseAcc: {results["acc"][0]:.6g}')
    print(f'IMU.AccWalk: {results["acc"][1]:.6g}')

    if args.out:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 5))
        for name in results:
            ax.loglog(taus, results[name][2], label=name)
        ax.set_xlabel('tau [s]'); ax.set_ylabel('Allan deviation')
        ax.grid(True, which='both', alpha=0.3); ax.legend()
        fig.savefig(args.out, dpi=140)
        print('wrote', args.out)
    return 0


if __name__ == '__main__':
    sys.exit(main())
