"""Native C++ wire codec (orbslam3_tpu/native): byte-exact parity with the
pure-numpy reference codec in edge/wire.py, plus the stream scanner against
the Python StreamDecoder."""

import ctypes

import numpy as np
import pytest

from orbslam3_tpu.edge import wire
from orbslam3_tpu.native import load_wirecodec

RNG = np.random.default_rng(3)

pytestmark = pytest.mark.skipif(
    load_wirecodec() is None, reason="no C++ toolchain on this host")


def _random_frame(n=300, m=20):
    uv = np.round(RNG.uniform(0, 640, (n, 2))).astype(np.float32)
    desc = RNG.integers(0, 256, (n, 32), dtype=np.uint8)
    imu_ts = RNG.integers(10**15, 10**16, m, dtype=np.int64)
    gyro = RNG.normal(0, 1, (m, 3)).astype(np.float32)
    acc = RNG.normal(0, 9.8, (m, 3)).astype(np.float32)
    return uv, desc, imu_ts, gyro, acc


def test_decode_parity_with_python():
    uv, desc, imu_ts, gyro, acc = _random_frame()
    payload = wire.encode_frame(7, 123456789012345, uv, desc, imu_ts,
                                gyro, acc)
    a = wire.decode_frame_py(payload)
    b = wire.decode_frame_native(payload)
    assert b is not None
    assert b.frame_id == a.frame_id and b.timestamp_ns == a.timestamp_ns
    np.testing.assert_array_equal(a.uv, b.uv)
    np.testing.assert_array_equal(a.desc, b.desc)
    np.testing.assert_array_equal(a.imu_ts_ns, b.imu_ts_ns)
    np.testing.assert_array_equal(a.imu_gyro, b.imu_gyro)
    np.testing.assert_array_equal(a.imu_acc, b.imu_acc)


def test_native_encode_matches_python_encode():
    lib = load_wirecodec()
    uv, desc, imu_ts, gyro, acc = _random_frame(n=64, m=7)
    ref = wire.encode_frame(3, 42, uv, desc, imu_ts, gyro, acc)
    out = np.empty(len(ref), np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    written = lib.svi_encode(
        3, 42, uv.ctypes.data_as(f32p),
        desc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 64,
        imu_ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        gyro.ctypes.data_as(f32p), acc.ctypes.data_as(f32p), 7,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert written == len(ref)
    assert out.tobytes() == ref


def test_native_encode_rounding_and_clamping_parity():
    """Half-pixel and out-of-range coordinates: the native encoder must
    match np.round (half-to-even) and clamp instead of wrapping on the
    float->u16 cast (ADVICE r4: the old x+0.5f diverged on .5 ties and hit
    UB on negatives)."""
    lib = load_wirecodec()
    uv = np.array([[0.5, 1.5], [2.5, 3.5], [10.49, 10.51],
                   [-3.0, -0.4], [70000.0, 65535.4], [65534.5, 65535.5]],
                  np.float32)
    n = len(uv)
    desc = RNG.integers(0, 256, (n, 32), dtype=np.uint8)
    ref = wire.encode_frame(9, 77, uv, desc)
    out = np.empty(len(ref), np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    null_i64 = ctypes.POINTER(ctypes.c_int64)()
    null_f32 = ctypes.POINTER(ctypes.c_float)()
    written = lib.svi_encode(
        9, 77, uv.ctypes.data_as(f32p),
        desc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
        null_i64, null_f32, null_f32, 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert written == len(ref)
    assert out.tobytes() == ref
    # and the decoded values are the clamped, banker's-rounded coordinates
    dec = wire.decode_frame_py(ref)
    np.testing.assert_array_equal(
        dec.uv, np.clip(np.round(uv), 0, 65535).astype(np.float32))


def test_decode_frame_returns_none_for_malformed():
    """decode_frame (the server's entry point) must return None — not
    raise — for malformed payloads, so a bad packet can't kill a client
    lane (ADVICE r4)."""
    uv, desc, imu_ts, gyro, acc = _random_frame(n=10, m=2)
    payload = wire.encode_frame(1, 2, uv, desc, imu_ts, gyro, acc)
    assert wire.decode_frame(payload[:-5]) is None
    assert wire.decode_frame(payload[:8]) is None
    assert wire.decode_frame(b"") is None
    assert wire.decode_frame(payload) is not None


def test_decode_rejects_truncated_payload():
    uv, desc, imu_ts, gyro, acc = _random_frame(n=10, m=2)
    payload = wire.encode_frame(1, 2, uv, desc, imu_ts, gyro, acc)
    assert wire.decode_frame_native(payload[:-5]) is None
    assert wire.decode_frame_native(payload[:8]) is None


def test_stream_scan_matches_python_decoder():
    lib = load_wirecodec()
    payloads = [wire.encode_frame(i, i * 10, *(_random_frame(
        n=int(RNG.integers(1, 50)), m=int(RNG.integers(0, 10)))[:2]))
        for i in range(6)]
    stream = b"".join(wire.frame_packet(p) for p in payloads)
    # split mid-packet: the scanner must stop at the last complete one
    cut = len(stream) - 13
    buf = np.frombuffer(stream[:cut], np.uint8)
    spans = np.empty(2 * 32, np.int64)
    consumed = ctypes.c_int64()
    n = lib.svi_scan_stream(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cut,
        spans.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 32,
        ctypes.byref(consumed))
    dec = wire.StreamDecoder()
    got_py = dec.feed(stream[:cut])
    assert n == len(got_py)
    for i in range(n):
        off, ln = spans[2 * i], spans[2 * i + 1]
        assert stream[off:off + ln] == got_py[i]
    # feeding the tail afterwards completes the final packet
    rest = dec.feed(stream[cut:])
    assert rest == payloads[len(got_py):]
