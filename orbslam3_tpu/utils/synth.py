"""Synthetic SLAM sequence generators for tests and benchmarks.

The build environment has no EuRoC/TUM-VI data (zero egress), so end-to-end
behavior is validated on generated worlds with exact ground truth — the role
the reference fills with dataset example binaries (SURVEY.md section 4).

Two modes:
  * feature-level: per-frame `FrameFeatures` synthesized from a persistent
    3-D landmark field (per-landmark 256-bit descriptor with per-observation
    bit flips, pixel noise, dropout, distractor features). Exercises data
    association, tracking, mapping, BA — everything but pixel processing.
  * image-level: textured-quad renderings for extraction-in-the-loop tests.
  * IMU: analytic trajectories with exact angular velocity / acceleration
    samples for preintegration and VI-init tests.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from orbslam3_tpu.core import lie
import jax.numpy as jnp


@dataclasses.dataclass
class SynthWorld:
    points: np.ndarray        # (P,3) landmark positions
    desc_bits: np.ndarray     # (P,256) uint8 canonical descriptors
    rng: np.random.Generator
    scale_d0: np.ndarray = None   # (P,) per-landmark scale-anchor distance


def make_world(n_points=2000, box=((-8, 8), (-5, 5), (2, 14)), seed=0,
               min_center_dist: float = 0.0) -> SynthWorld:
    """`min_center_dist` > 0 rejects landmarks closer than that to the box
    center. A trajectory that passes THROUGH its landmark field sweeps
    per-point viewing-distance ratios beyond any 8-level/1.2x pyramid's
    scale-invariance span (1.2^8 = 4.3x) — such points are legitimately
    unmatchable across the pass in the reference too. Long-duration orbit
    fixtures (the capacity soak) keep the field outside the orbit's near
    zone, like real indoor datasets where the camera doesn't fly through
    the furniture."""
    rng = np.random.default_rng(seed)
    center_np = np.array([(b[0] + b[1]) / 2.0 for b in box], np.float32)
    pts = np.zeros((0, 3), np.float32)
    while len(pts) < n_points:
        cand = np.stack(
            [rng.uniform(*box[i], n_points) for i in range(3)], axis=-1
        ).astype(np.float32)
        if min_center_dist > 0:
            cand = cand[np.linalg.norm(cand - center_np, axis=1)
                        >= min_center_dist]
        pts = np.concatenate([pts, cand])[:n_points]
    bits = rng.integers(0, 2, (n_points, 256)).astype(np.uint8)
    # Physical scale model: each landmark has a fixed apparent size, so the
    # pyramid level it is detected at follows its viewing DISTANCE —
    # level = ceil(log(d0/d)/log 1.2), the exact relation the matcher's
    # PredictScale / scale-band gates assume (MapPoint::PredictScale,
    # reference MapPoint.cc). Pre-r5 synth emitted octave 0 at every
    # distance, which violates that contract: as a trajectory changes view
    # distance >20%, the (correct) frustum gates reject every stale
    # landmark and feature-level runs starve (the r4/r5 soak LOST).
    # d0 = distance at which the landmark would appear at the COARSEST
    # level, anchored to the world center so center-orbiting views (the
    # standard fixture trajectory, radius <= 3) span levels 0..7 without
    # saturating the clip.
    d0 = (np.linalg.norm(pts - center_np, axis=1) + 3.2).astype(np.float32)
    return SynthWorld(points=pts, desc_bits=bits, rng=rng, scale_d0=d0)


def orbit_trajectory(n_frames=120, radius=3.0, height=0.4, center=(0, 0, 8.0),
                     arc=1.2, forward_axis=2):
    """Camera orbit segment looking at `center`. Returns (R_cw, t_cw) lists
    (world->camera poses)."""
    Rs, ts = [], []
    cx, cy, cz = center
    for i in range(n_frames):
        a = arc * i / max(n_frames - 1, 1) - arc / 2
        cam_pos = np.array(
            [cx + radius * np.sin(a), cy + height * np.sin(2 * a), cz - radius * np.cos(a)],
            np.float32,
        )
        # look-at: z-axis towards center
        z = np.asarray(center, np.float32) - cam_pos
        z = z / np.linalg.norm(z)
        x = np.cross(np.array([0.0, 1.0, 0.0], np.float32), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=-1)  # columns = camera axes in world
        R_cw = R_wc.T
        t_cw = -R_cw @ cam_pos
        Rs.append(R_cw.astype(np.float32))
        ts.append(t_cw.astype(np.float32))
    return np.stack(Rs), np.stack(ts)


def render_features(
    world: SynthWorld,
    R_cw: np.ndarray, t_cw: np.ndarray,
    camera,
    capacity: int = 600,
    noise_px: float = 0.4,
    bit_flips: int = 10,
    dropout: float = 0.15,
    n_distractors: int = 40,
    seed: int = 0,
):
    """Synthesize one frame's FrameFeatures + ground-truth landmark ids."""
    from orbslam3_tpu.vision.frame import FrameFeatures
    from orbslam3_tpu.kernels.orb_descriptor import pack_bits

    rng = np.random.default_rng(seed)
    xc = world.points @ R_cw.T + t_cw
    uv = np.asarray(camera.project(jnp.asarray(xc)))
    w, h = camera.width, camera.height
    vis = (
        (xc[:, 2] > 0.3)
        & (uv[:, 0] >= 8) & (uv[:, 0] < w - 8)
        & (uv[:, 1] >= 8) & (uv[:, 1] < h - 8)
    )
    vis &= rng.uniform(size=len(vis)) > dropout
    ids = np.nonzero(vis)[0]
    rng.shuffle(ids)
    ids = ids[: capacity - n_distractors]
    n = len(ids)

    uv_obs = uv[ids] + rng.normal(scale=noise_px, size=(n, 2))
    bits = world.desc_bits[ids].copy()
    flips = rng.integers(0, 256, (n, bit_flips))
    for k in range(bit_flips):
        bits[np.arange(n), flips[:, k]] ^= 1
    # distance-consistent pyramid level (see make_world scale model)
    if world.scale_d0 is not None:
        d = np.linalg.norm(xc[ids], axis=1)
        oct_obs = np.ceil(np.log(np.maximum(world.scale_d0[ids], 1e-6)
                                 / np.maximum(d, 1e-6)) / np.log(1.2))
        oct_obs = np.clip(oct_obs, 0, 7).astype(np.int32)
    else:
        oct_obs = np.zeros(n, np.int32)

    n_d = min(n_distractors, capacity - n)
    uv_dis = np.stack(
        [rng.uniform(0, w, n_d), rng.uniform(0, h, n_d)], axis=-1
    )
    bits_dis = rng.integers(0, 2, (n_d, 256)).astype(np.uint8)

    total = n + n_d
    uv_all = np.zeros((capacity, 2), np.float32)
    uv_all[:n] = uv_obs
    uv_all[n:total] = uv_dis
    bits_all = np.zeros((capacity, 256), np.uint8)
    bits_all[:n] = bits
    bits_all[n:total] = bits_dis
    gt_ids = np.full(capacity, -1, np.int64)
    gt_ids[:n] = ids
    valid = np.zeros(capacity, bool)
    valid[:total] = True

    packed = np.asarray(pack_bits(jnp.asarray(bits_all, jnp.uint32)))
    oct_all = np.zeros(capacity, np.int32)
    oct_all[:n] = oct_obs
    feats = FrameFeatures(
        uv=jnp.asarray(uv_all),
        uv_raw=jnp.asarray(uv_all),
        response=jnp.asarray(valid, jnp.float32),
        angle=jnp.zeros(capacity, jnp.float32),
        octave=jnp.asarray(oct_all),
        desc=jnp.asarray(packed),
        valid=jnp.asarray(valid),
    )
    return feats, gt_ids


def imu_orbit_samples(R_cw, t_cw, ts, rate=200.0, g=9.81, seed=0,
                      gyro_noise=0.0, acc_noise=0.0, gyro_bias=None, acc_bias=None):
    """Finite-difference IMU samples consistent with a camera pose sequence
    (body == camera frame). Returns per-interval (acc, gyro, dt) arrays lists.
    """
    rng = np.random.default_rng(seed)
    # world-frame positions and rotations of the body
    R_wb = np.swapaxes(R_cw, -1, -2)
    p_wb = -np.einsum("nij,nj->ni", R_wb, t_cw)
    out = []
    g_w = np.array([0.0, 0.0, -g])
    for i in range(len(ts) - 1):
        t0, t1 = ts[i], ts[i + 1]
        n = max(int(round((t1 - t0) * rate)), 2)
        tau = np.linspace(t0, t1, n + 1)
        # interpolate pose: slerp via log/exp, linear position w/ spline accel
        # use quadratic fit over [i-1, i, i+1] for acceleration
        im = max(i - 1, 0)
        ip = min(i + 2, len(ts) - 1)
        # angular velocity (body): log(R_wb_i^T R_wb_{i+1}) / dt
        dR = R_wb[i].T @ R_wb[i + 1]
        w_b = np.asarray(lie.so3_log(jnp.asarray(dR.astype(np.float32)))) / (t1 - t0)
        # acceleration via central differences of position
        if 0 < i < len(ts) - 2:
            dt = ts[i + 1] - ts[i]
            a_w = (p_wb[i + 2] - p_wb[i + 1] - p_wb[i] + p_wb[i - 1]) / (2 * dt * dt)
        else:
            a_w = np.zeros(3)
        acc_b = R_wb[i].T @ (a_w - g_w)
        dt_s = np.diff(tau)
        acc = np.tile(acc_b, (n, 1))
        gyr = np.tile(w_b, (n, 1))
        if gyro_noise > 0:
            gyr = gyr + rng.normal(scale=gyro_noise, size=gyr.shape)
        if acc_noise > 0:
            acc = acc + rng.normal(scale=acc_noise, size=acc.shape)
        if gyro_bias is not None:
            gyr = gyr + gyro_bias
        if acc_bias is not None:
            acc = acc + acc_bias
        out.append((acc.astype(np.float32), gyr.astype(np.float32),
                    dt_s.astype(np.float32)))
    return out


# ---------------------------------------------------------------------------
# Exact IMU simulation (float64 fine integration of analytic body rates)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ImuTrajectory:
    """Ground-truth body trajectory + IMU samples from analytic body rates.

    States are at the IMU sample times: R_wb[k] etc. correspond to t[k].
    Samples (gyro/acc/dt) are per interval [t[k], t[k+1]] evaluated at the
    interval midpoint (the convention `preintegrate` integrates with).
    """

    t: np.ndarray       # (K+1,) sample times
    R_wb: np.ndarray    # (K+1,3,3) body->world rotations
    p_wb: np.ndarray    # (K+1,3) body positions (world)
    v_wb: np.ndarray    # (K+1,3) body velocities (world)
    gyro: np.ndarray    # (K,3) measured angular rate (body) incl. bias
    acc: np.ndarray     # (K,3) measured specific force (body) incl. bias
    dt: np.ndarray      # (K,)

    def gt_deltas(self, i: int, j: int, g=9.81):
        """Reference preintegration deltas between sample times i < j:
        dR = Ri^T Rj; dV = Ri^T (vj - vi - g dT); dP = Ri^T (pj - pi - vi dT
        - 0.5 g dT^2) — the quantities `Preintegrated` estimates."""
        g_w = np.array([0.0, 0.0, -g])
        dT = self.t[j] - self.t[i]
        Ri = self.R_wb[i]
        dR = Ri.T @ self.R_wb[j]
        dV = Ri.T @ (self.v_wb[j] - self.v_wb[i] - g_w * dT)
        dP = Ri.T @ (self.p_wb[j] - self.p_wb[i] - self.v_wb[i] * dT
                     - 0.5 * g_w * dT * dT)
        return dR, dV, dP, dT


def simulate_imu(duration=2.0, rate=200.0, substeps=40, seed=0, g=9.81,
                 gyro_bias=(0.0, 0.0, 0.0), acc_bias=(0.0, 0.0, 0.0),
                 gyro_noise=0.0, acc_noise=0.0,
                 w_scale=0.6, f_scale=1.2) -> ImuTrajectory:
    """Integrate smooth analytic body rates in float64.

    w_b(t), f_b(t) are sums of incommensurate sinusoids (seeded); f_b is the
    SPECIFIC FORCE in the body frame (what an accelerometer measures), so the
    world acceleration is a_w = R_wb f_b + g_w.
    """
    rng = np.random.default_rng(seed)
    aw = rng.uniform(0.5, 2.0, (3, 2))
    ph = rng.uniform(0, 2 * np.pi, (3, 4))

    def w_fn(t):
        return w_scale * np.array([
            np.sin(aw[0, 0] * t + ph[0, 0]) + 0.5 * np.cos(aw[0, 1] * t + ph[0, 1]),
            np.sin(aw[1, 0] * t + ph[1, 0]) + 0.5 * np.cos(aw[1, 1] * t + ph[1, 1]),
            np.sin(aw[2, 0] * t + ph[2, 0]),
        ])

    def f_fn(t):
        return f_scale * np.array([
            np.sin(aw[0, 1] * t + ph[0, 2]),
            np.cos(aw[1, 1] * t + ph[1, 2]),
            np.sin(aw[2, 1] * t + ph[2, 3]),
        ]) + np.array([0.0, 0.0, g])  # roughly gravity-supporting

    from scipy.spatial.transform import Rotation as _Rot

    K = int(round(duration * rate))
    h = 1.0 / (rate * substeps)
    g_w = np.array([0.0, 0.0, -g])
    R = np.eye(3)
    p = np.zeros(3)
    v = np.zeros(3)
    t_cur = 0.0
    states_t = [0.0]
    states_R = [R.copy()]
    states_p = [p.copy()]
    states_v = [v.copy()]
    gyro_s, acc_s, dt_s = [], [], []
    bg = np.asarray(gyro_bias, np.float64)
    ba = np.asarray(acc_bias, np.float64)
    for k in range(K):
        t_mid_sample = t_cur + 0.5 / rate
        gyro_s.append(w_fn(t_mid_sample) + bg
                      + rng.normal(scale=gyro_noise, size=3))
        acc_s.append(f_fn(t_mid_sample) + ba
                     + rng.normal(scale=acc_noise, size=3))
        dt_s.append(1.0 / rate)
        for _ in range(substeps):
            tm = t_cur + 0.5 * h
            w = w_fn(tm)
            f = f_fn(tm)
            R_mid = R @ _Rot.from_rotvec(w * 0.5 * h).as_matrix()
            a_w = R_mid @ f + g_w
            p = p + v * h + 0.5 * a_w * h * h
            v = v + a_w * h
            R = R @ _Rot.from_rotvec(w * h).as_matrix()
            t_cur += h
        states_t.append(t_cur)
        states_R.append(R.copy())
        states_p.append(p.copy())
        states_v.append(v.copy())
    return ImuTrajectory(
        t=np.asarray(states_t), R_wb=np.asarray(states_R),
        p_wb=np.asarray(states_p), v_wb=np.asarray(states_v),
        gyro=np.asarray(gyro_s), acc=np.asarray(acc_s), dt=np.asarray(dt_s),
    )
