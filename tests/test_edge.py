"""Edge layer: wire codecs, acoustic fusion solvers, loopback server."""

import time

import numpy as np
import pytest

from orbslam3_tpu.edge import acoustic, wire
from orbslam3_tpu.edge.client_sim import FakePhone
from orbslam3_tpu.edge.server import EdgeServer

rng = np.random.default_rng(7)


# ------------------------------------------------------------------ codecs

def _random_frame(n=120, m=9):
    uv = rng.uniform(0, 640, (n, 2)).round().astype(np.float32)
    desc = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    ts = (np.arange(m, dtype=np.int64) * 5_000_000) + 1_700_000_000_000_000_000
    gyro = rng.normal(0, 1, (m, 3)).astype(np.float32)
    acc = rng.normal(0, 9.8, (m, 3)).astype(np.float32)
    return uv, desc, ts, gyro, acc


def test_slampkt_roundtrip():
    uv, desc, ts, gyro, acc = _random_frame()
    payload = wire.encode_frame(42, 123456789012345, uv, desc, ts, gyro, acc)
    assert len(payload) == 16 + 120 * 36 + 9 * 32
    pkt = wire.decode_frame(payload)
    assert pkt.frame_id == 42 and pkt.timestamp_ns == 123456789012345
    np.testing.assert_array_equal(pkt.uv, uv)
    np.testing.assert_array_equal(pkt.desc, desc)
    np.testing.assert_array_equal(pkt.imu_ts_ns, ts)
    np.testing.assert_array_equal(pkt.imu_gyro, gyro)
    np.testing.assert_array_equal(pkt.imu_acc, acc)


def test_slampkt_byte_layout_matches_reference():
    """Spot-check the exact byte layout of slampkt_vi.h: LE id/ts, BE counts,
    BE keypoint coords, LE IMU floats."""
    uv = np.array([[0x0102, 0x0304]], np.float32)
    desc = np.arange(32, dtype=np.uint8)[None]
    p = wire.encode_frame(1, 2, uv, desc, [3], [[0.5, 0, 0]], [[0, 0, 9.81]])
    assert p[0:4] == (1).to_bytes(4, 'little')
    assert p[4:12] == (2).to_bytes(8, 'little')
    assert p[12:14] == bytes([0, 1])           # n_pts = 1 big-endian
    assert p[14:16] == bytes([0, 1])           # n_imu = 1 big-endian
    assert p[16:18] == bytes([0x01, 0x02])     # x big-endian
    assert p[18:20] == bytes([0x03, 0x04])     # y big-endian
    assert p[20:52] == bytes(range(32))        # descriptor verbatim
    assert p[52:60] == (3).to_bytes(8, 'little')  # imu ts LE
    assert p[60:64] == np.float32(0.5).tobytes()  # gyro x LE float


def test_cmdpkt_roundtrip():
    c0 = wire.encode_cmd_feature_count(1000)
    assert wire.decode_cmd(c0) == (0, 1000)
    c1 = wire.encode_cmd_pose_delay(0.033, [1.0, -2.0, 0.5])
    code, (delay, pos) = wire.decode_cmd(c1)
    assert code == 1 and abs(delay - 0.033) < 1e-6
    np.testing.assert_allclose(pos, [1.0, -2.0, 0.5])


def test_stream_decoder_fragmentation():
    frames = [wire.frame_packet(bytes([i] * (10 + i))) for i in range(5)]
    blob = b''.join(frames)
    dec = wire.StreamDecoder()
    got = []
    for k in range(0, len(blob), 7):   # feed in 7-byte fragments
        got.extend(dec.feed(blob[k:k + 7]))
    assert got == [bytes([i] * (10 + i)) for i in range(5)]


# ---------------------------------------------------------------- acoustic

def test_interval_to_distance_matches_reference_model():
    # d = (331.3 + 0.606*27.1)·(n1+n2)/(2·48000) + 0.0272
    d, ok = acoustic.interval_to_distance(300, 280)
    expect = (331.3 + 0.606 * 27.1) * 580 / 96000 + 0.0272
    assert abs(float(d) - expect) < 1e-5 and bool(ok)
    d_bad, ok_bad = acoustic.interval_to_distance(30000, 30000)
    assert not bool(ok_bad)   # > 4 m rejected


def test_trilateration_given_scale():
    true_pos = np.array([1.0, -0.5, 2.0])
    anchors = rng.uniform(-3, 3, (5, 3))
    scale = 2.5   # slam -> metric
    dists = scale * np.linalg.norm(true_pos - anchors, axis=1)
    est = acoustic.optimize_position_given_scale(
        true_pos + rng.normal(0, 0.3, 3), anchors, dists, scale)
    np.testing.assert_allclose(np.asarray(est), true_pos, atol=1e-3)


def test_trilateration_regularized_pulls_to_last():
    anchors = np.array([[0., 0, 0], [2, 0, 0]])
    true_pos = np.array([1.0, 1.0, 0.0])
    dists = np.linalg.norm(true_pos - anchors, axis=1)
    est = acoustic.optimize_position_regularized(
        true_pos + 0.2, true_pos, anchors, dists, 1.0)
    # 2 anchors underdetermine 3D; the regularizer must keep us near last
    assert np.linalg.norm(np.asarray(est) - true_pos) < 0.25


def test_imu_acoustic_chain():
    T = 6
    true = np.cumsum(rng.normal(0, 0.5, (T, 3)), axis=0)
    deltas = np.vstack([np.zeros(3), np.diff(true, axis=0)])
    anchors = rng.uniform(-4, 4, (4, 3))
    dists = np.linalg.norm(true[-1] - anchors, axis=1)
    noisy = true + rng.normal(0, 0.2, (T, 3))
    est = acoustic.imu_acoustic_optimize(noisy, deltas, anchors, dists, 1.0)
    np.testing.assert_allclose(np.asarray(est)[-1], true[-1], atol=2e-2)


def test_imu_acoustic_key_chain_first_fixed():
    T = 5
    true = np.cumsum(rng.normal(0, 0.4, (T, 3)), axis=0)
    delta = np.diff(true, axis=0)
    anchors = rng.uniform(-4, 4, (3, 3))
    dists = np.stack([np.linalg.norm(p - anchors, axis=1) for p in true[1:]])
    noisy = true.copy()
    noisy[1:] += rng.normal(0, 0.3, (T - 1, 3))
    est = np.asarray(acoustic.imu_acoustic_key_optimize(
        noisy, delta, dists, anchors, 1.0))
    np.testing.assert_allclose(est[0], true[0])        # fixed vertex
    np.testing.assert_allclose(est, true, atol=2e-2)


def test_calibration_recovers_offset_and_scale():
    true_mc = np.array([0.03, -0.01, 0.05])
    true_s = 0.5    # real world -> slam
    K, M = 12, 3

    def rand_rot(n):
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        w, x, y, z = q.T
        return np.stack([
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ], axis=1)

    R0, t0 = rand_rot(K), rng.uniform(-2, 2, (K, 3))
    R1, t1 = rand_rot(M), rng.uniform(-2, 2, (M, 3))
    wm0 = np.einsum('kij,j->ki', R0, -true_s * true_mc) + t0
    wm1 = np.einsum('mij,j->mi', R1, -true_s * true_mc) + t1
    d = np.linalg.norm(wm0[:, None] - wm1[None, :], axis=-1) / true_s
    mc, s = acoustic.calibrate_mic_offset(
        true_mc + rng.normal(0, 0.02, 3), true_s * 1.2, R0, t0, R1, t1, d,
        n_iters=30)
    assert abs(float(s) - true_s) < 1e-3
    np.testing.assert_allclose(np.asarray(mc), true_mc, atol=5e-3)


# ----------------------------------------------------------- loopback e2e

def test_loopback_server_two_clients():
    """Full edge path without phones: 2 fake phones stream frames + report
    chirp intervals; server tracks (stub), replies pose+budget, converts
    intervals to distances."""
    tracked = []

    def stub_track(cid, pkt):
        tracked.append((cid, pkt.frame_id, pkt.uv.shape[0]))
        if pkt.frame_id < 2:
            return None  # "initializing"
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.1 * pkt.frame_id, 0, float(cid)], np.float32)
        return R, t

    srv = EdgeServer(stub_track, slam_port=0, acoustic_port=0, max_clients=2)
    phones = [FakePhone('127.0.0.1', srv.slam_port, srv.acoustic_port, i)
              for i in range(2)]
    try:
        time.sleep(0.3)
        uv, desc, ts, gyro, acc = _random_frame(50, 4)
        for fid in range(8):
            for ph in phones:
                ph.send_frame(fid, int(1e9 * (100 + fid * 0.05)), uv, desc,
                              ts, gyro, acc)
            time.sleep(0.02)
        deadline = time.time() + 5
        while time.time() < deadline and (
                len(srv.lanes) < 2 or srv.lanes[0].stats.frames_tracked < 8):
            time.sleep(0.05)
        assert len(srv.lanes) == 2
        # client 0 tracks every frame; client 1 (relocalize-mode skip off
        # after first success) tracked at least the 1-in-5 frames
        assert srv.lanes[0].stats.frames_tracked == 8
        assert srv.lanes[1].stats.frames_tracked >= 1
        # phones got pose replies and a feature-budget command
        deadline = time.time() + 3
        while time.time() < deadline and not phones[0].poses:
            time.sleep(0.05)
        assert phones[0].poses, 'no pose replies received'
        assert phones[0].feature_budget in (500, 1000)
        # acoustic: server emits, phones report intervals, CalAcoustic
        true_d = 1.5
        n_half = FakePhone.distance_to_interval(true_d)
        base = [ph.emit_count for ph in phones]
        srv.broadcast_emit()
        assert phones[0].wait_emit(base[0], 3.0)
        assert phones[1].wait_emit(base[1], 3.0)
        phones[0].report_intervals({1: n_half})
        phones[1].report_intervals({0: n_half})
        deadline = time.time() + 3
        while time.time() < deadline and (
                0 not in srv.lanes[1].intervals
                or srv.lanes[1].intervals[0].empty()
                or 1 not in srv.lanes[0].intervals
                or srv.lanes[0].intervals[1].empty()):
            time.sleep(0.05)
        dists = srv.cal_acoustic()
        assert len(dists) == 1 and abs(dists[0] - true_d) < 0.01
    finally:
        for ph in phones:
            ph.close()
        srv.close()
