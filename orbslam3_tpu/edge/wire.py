"""Binary wire codecs for the edge protocol.

Byte-compatible with the reference fork's phone protocol so existing phone
apps can talk to this server unchanged:

* ``SlamPktVI`` (`/root/reference/include/Socket/slampkt_vi.h:19-22,85-166`):
  16 B header — frame id (i32 LE), image timestamp (i64 LE), #keypoints
  (u16 BE), #IMU samples (u16 BE) — followed by 36 B per keypoint (x, y as
  u16 BE + 32 B ORB descriptor) and 32 B per IMU sample (timestamp ns i64 LE
  + 3×f32 gyro LE + 3×f32 accel LE).
* ``CmdPkt`` (`/root/reference/include/Socket/cmdpkt.h:40-81`): code 0 =
  set feature count (u16 BE); code 1 = SLAM processing delay (f32 LE) +
  camera-center position (3×f32 LE).
* Stream framing: 2-byte big-endian length prefix, 64 KiB max packet
  (`slampkt_vi.h:184-191`).

Decoding goes straight into padded numpy arrays shaped for the device
pipeline (fixed feature capacity + validity mask) instead of per-point
object lists.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

INFO_LEN = 16
PT_LEN = 36
IMU_LEN = 32
DESC_LEN = 32
MAX_PACKET = 65536


@dataclass
class FramePacket:
    """One decoded SlamPktVI frame."""

    frame_id: int
    timestamp_ns: int
    uv: np.ndarray        # (n, 2) float32 pixel coords
    desc: np.ndarray      # (n, 32) uint8 ORB descriptors
    imu_ts_ns: np.ndarray  # (m,) int64
    imu_gyro: np.ndarray   # (m, 3) float32
    imu_acc: np.ndarray    # (m, 3) float32


def encode_frame(frame_id: int, timestamp_ns: int, uv: np.ndarray,
                 desc: np.ndarray, imu_ts_ns=None, imu_gyro=None,
                 imu_acc=None) -> bytes:
    """Serialize a frame to the SlamPktVI payload (no length prefix)."""
    uv = np.asarray(uv)
    desc = np.ascontiguousarray(desc, dtype=np.uint8)
    n = uv.shape[0]
    assert desc.shape == (n, DESC_LEN)
    imu_ts_ns = np.asarray(imu_ts_ns if imu_ts_ns is not None else [], np.int64)
    m = imu_ts_ns.shape[0]
    imu_gyro = np.asarray(imu_gyro if imu_gyro is not None else np.zeros((0, 3)), np.float32)
    imu_acc = np.asarray(imu_acc if imu_acc is not None else np.zeros((0, 3)), np.float32)

    head = struct.pack('<iq', int(frame_id), int(timestamp_ns))
    head += struct.pack('>HH', n, m)

    # keypoint block: u16-BE x, u16-BE y, 32-byte descriptor, vectorized
    kp = np.zeros((n, PT_LEN), np.uint8)
    xy = np.clip(np.round(uv), 0, 65535).astype(np.uint16)
    kp[:, 0] = (xy[:, 0] >> 8) & 0xFF
    kp[:, 1] = xy[:, 0] & 0xFF
    kp[:, 2] = (xy[:, 1] >> 8) & 0xFF
    kp[:, 3] = xy[:, 1] & 0xFF
    kp[:, 4:] = desc

    # IMU block: i64-LE ts, 3 f32-LE gyro, 3 f32-LE accel
    imu = np.zeros((m, IMU_LEN), np.uint8)
    if m:
        imu[:, :8] = imu_ts_ns.astype('<i8').view(np.uint8).reshape(m, 8)
        imu[:, 8:20] = imu_gyro.astype('<f4').view(np.uint8).reshape(m, 12)
        imu[:, 20:32] = imu_acc.astype('<f4').view(np.uint8).reshape(m, 12)

    return head + kp.tobytes() + imu.tobytes()


def decode_frame_py(payload: bytes) -> FramePacket:
    """Pure-numpy SlamPktVI parse (inverse of `encode_frame`) — the
    behavioural reference for the native codec and the fallback on hosts
    without a C++ toolchain."""
    frame_id, timestamp_ns = struct.unpack_from('<iq', payload, 0)
    n, m = struct.unpack_from('>HH', payload, 12)
    buf = np.frombuffer(payload, np.uint8)

    kp = buf[INFO_LEN:INFO_LEN + n * PT_LEN].reshape(n, PT_LEN)
    x = kp[:, 0].astype(np.uint16) * 256 + kp[:, 1]
    y = kp[:, 2].astype(np.uint16) * 256 + kp[:, 3]
    uv = np.stack([x, y], axis=1).astype(np.float32)
    desc = np.ascontiguousarray(kp[:, 4:])

    off = INFO_LEN + n * PT_LEN
    imu = buf[off:off + m * IMU_LEN].reshape(m, IMU_LEN)
    imu_ts = np.ascontiguousarray(imu[:, :8]).view('<i8').reshape(m)
    gyro = np.ascontiguousarray(imu[:, 8:20]).view('<f4').reshape(m, 3)
    acc = np.ascontiguousarray(imu[:, 20:32]).view('<f4').reshape(m, 3)
    return FramePacket(frame_id, timestamp_ns, uv, desc,
                       imu_ts.copy(), gyro.copy(), acc.copy())


def decode_frame_native(payload: bytes) -> FramePacket | None:
    """SlamPktVI parse through the C++ codec (orbslam3_tpu/native);
    returns None when the native library is unavailable or the payload is
    malformed — callers fall back to `decode_frame_py`."""
    import ctypes

    from orbslam3_tpu.native import load_wirecodec
    lib = load_wirecodec()
    if lib is None:
        return None
    buf = np.frombuffer(payload, np.uint8)
    p = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    fid = ctypes.c_int32()
    ts = ctypes.c_int64()
    n = ctypes.c_int32()
    m = ctypes.c_int32()
    if lib.svi_header(p, len(payload), ctypes.byref(fid), ctypes.byref(ts),
                      ctypes.byref(n), ctypes.byref(m)) != 0:
        return None
    uv = np.empty((n.value, 2), np.float32)
    desc = np.empty((n.value, DESC_LEN), np.uint8)
    imu_ts = np.empty(m.value, np.int64)
    gyro = np.empty((m.value, 3), np.float32)
    acc = np.empty((m.value, 3), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.svi_decode(
        p, len(payload), uv.ctypes.data_as(f32p),
        desc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        imu_ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        gyro.ctypes.data_as(f32p), acc.ctypes.data_as(f32p))
    if rc != 0:
        return None
    return FramePacket(fid.value, ts.value, uv, desc, imu_ts, gyro, acc)


def decode_frame(payload: bytes) -> FramePacket | None:
    """Parse a SlamPktVI payload: native C++ codec when available, numpy
    otherwise. Returns None for a malformed payload (header shorter than
    16 bytes or counts inconsistent with the payload length) — the server
    drops such packets with a warning instead of tearing down the client
    lane (the reference's receiveLoop likewise skips bad frames,
    `src/Socket/client.cc:105-127`)."""
    if len(payload) < INFO_LEN:
        return None
    n, m = struct.unpack_from('>HH', payload, 12)
    if len(payload) < INFO_LEN + n * PT_LEN + m * IMU_LEN:
        return None
    pkt = decode_frame_native(payload)
    return pkt if pkt is not None else decode_frame_py(payload)


# ---------------------------------------------------------------- CmdPkt

CMD_FEATURE_COUNT = 0
CMD_POSE_DELAY = 1


def encode_cmd_feature_count(n: int) -> bytes:
    return bytes([CMD_FEATURE_COUNT, (n >> 8) & 0xFF, n & 0xFF])


def encode_cmd_pose_delay(delay_s: float, pos_wc: np.ndarray) -> bytes:
    p = np.asarray(pos_wc, np.float32)
    return bytes([CMD_POSE_DELAY]) + struct.pack('<f', float(delay_s)) + \
        struct.pack('<3f', float(p[0]), float(p[1]), float(p[2]))


def decode_cmd(payload: bytes):
    """Returns (code, value): code 0 -> int feature count; 1 -> (delay, pos)."""
    code = payload[0]
    if code == CMD_FEATURE_COUNT:
        return code, (payload[1] << 8) | payload[2]
    if code == CMD_POSE_DELAY:
        delay = struct.unpack_from('<f', payload, 1)[0]
        pos = np.array(struct.unpack_from('<3f', payload, 5), np.float32)
        return code, (delay, pos)
    raise ValueError(f'unknown cmd code {code}')


# ---------------------------------------------------------------- framing

def frame_packet(payload: bytes) -> bytes:
    """Prepend the 2-byte big-endian length prefix."""
    if len(payload) > MAX_PACKET:
        raise ValueError(f'packet too large: {len(payload)}')
    return struct.pack('>H', len(payload)) + payload


class StreamDecoder:
    """Incremental length-prefixed packet reassembly (the receiveLoop's
    2-byte-length + chunked-recv logic, `client.cc:105-127`)."""

    def __init__(self):
        self._buf = bytearray()

    def feed(self, data: bytes):
        """Append received bytes; yield complete payloads."""
        self._buf.extend(data)
        out = []
        while True:
            if len(self._buf) < 2:
                break
            length = (self._buf[0] << 8) | self._buf[1]
            if len(self._buf) < 2 + length:
                break
            out.append(bytes(self._buf[2:2 + length]))
            del self._buf[:2 + length]
        return out
