// Native edge-ingestion codec: SlamPktVI decode/encode + stream framing.
//
// TPU-native counterpart of the reference fork's C++ socket layer
// (/root/reference/include/Socket/slampkt_vi.h:19-22,85-166 and the
// receiveLoop framing in src/Socket/client.cc:105-127).  The JAX compute
// path never touches this file; it is the DCN-side runtime — the hot
// per-packet byte shuffling between the TCP socket and the padded numpy
// arrays the device pipeline consumes.  Compiled on demand by
// orbslam3_tpu/native/__init__.py (g++ -O3 -shared -fPIC) and loaded via
// ctypes; the pure-numpy codec in edge/wire.py remains the fallback and the
// behavioural reference.
//
// Wire layout (byte-compatible with the phone app):
//   header  16 B : frame id (i32 LE), image ts (i64 LE),
//                  #keypoints (u16 BE), #IMU samples (u16 BE)
//   keypoint 36 B: x (u16 BE), y (u16 BE), 32 B ORB descriptor
//   IMU     32 B : ts ns (i64 LE), 3xf32 gyro LE, 3xf32 accel LE
//   framing      : 2-byte BE length prefix, 64 KiB max packet.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kInfoLen = 16;
constexpr int kPtLen = 36;
constexpr int kImuLen = 32;
constexpr int kDescLen = 32;

inline uint16_t be16(const uint8_t* p) {
  return static_cast<uint16_t>((p[0] << 8) | p[1]);
}

inline void put_be16(uint8_t* p, uint16_t v) {
  p[0] = static_cast<uint8_t>(v >> 8);
  p[1] = static_cast<uint8_t>(v & 0xFF);
}

// Match numpy's np.round (banker's rounding, the Python encoder's
// behaviour) and clamp to the u16 range: a negative or huge float
// coordinate must not hit UB on the float->uint16 cast.
inline uint16_t round_coord(float v) {
  const float r = nearbyintf(v);  // default FE_TONEAREST = half-to-even
  if (!(r > 0.0f)) return 0;      // also catches NaN
  if (r >= 65535.0f) return 65535;
  return static_cast<uint16_t>(r);
}

}  // namespace

extern "C" {

// Parse the 16-byte header. Returns 0 on success, -1 if the payload is
// shorter than the header or inconsistent with its own counts.
int svi_header(const uint8_t* payload, int64_t len, int32_t* frame_id,
               int64_t* ts_ns, int32_t* n_kp, int32_t* n_imu) {
  if (len < kInfoLen) return -1;
  std::memcpy(frame_id, payload, 4);       // i32 LE (host is LE)
  std::memcpy(ts_ns, payload + 4, 8);      // i64 LE
  *n_kp = be16(payload + 12);
  *n_imu = be16(payload + 14);
  if (len < kInfoLen + static_cast<int64_t>(*n_kp) * kPtLen +
                static_cast<int64_t>(*n_imu) * kImuLen)
    return -1;
  return 0;
}

// Decode keypoints + IMU into caller-provided arrays:
//   uv      : float32 [n_kp, 2]
//   desc    : uint8   [n_kp, 32]
//   imu_ts  : int64   [n_imu]
//   imu_gyr : float32 [n_imu, 3]
//   imu_acc : float32 [n_imu, 3]
// Caller sizes them from svi_header. Returns 0 on success.
int svi_decode(const uint8_t* payload, int64_t len, float* uv, uint8_t* desc,
               int64_t* imu_ts, float* imu_gyr, float* imu_acc) {
  int32_t frame_id, n_kp, n_imu;
  int64_t ts_ns;
  if (svi_header(payload, len, &frame_id, &ts_ns, &n_kp, &n_imu) != 0)
    return -1;
  const uint8_t* kp = payload + kInfoLen;
  for (int i = 0; i < n_kp; ++i, kp += kPtLen) {
    uv[2 * i] = static_cast<float>(be16(kp));
    uv[2 * i + 1] = static_cast<float>(be16(kp + 2));
    std::memcpy(desc + kDescLen * i, kp + 4, kDescLen);
  }
  const uint8_t* im = payload + kInfoLen +
                      static_cast<int64_t>(n_kp) * kPtLen;
  for (int i = 0; i < n_imu; ++i, im += kImuLen) {
    std::memcpy(imu_ts + i, im, 8);
    std::memcpy(imu_gyr + 3 * i, im + 8, 12);
    std::memcpy(imu_acc + 3 * i, im + 20, 12);
  }
  return 0;
}

// Encode a frame into `out` (caller allocates 16 + 36*n_kp + 32*n_imu
// bytes).  uv is float32 [n_kp, 2] (rounded to nearest u16 like the
// reference's integer keypoints), desc uint8 [n_kp, 32].  Returns the
// number of bytes written.
int64_t svi_encode(int32_t frame_id, int64_t ts_ns, const float* uv,
                   const uint8_t* desc, int32_t n_kp, const int64_t* imu_ts,
                   const float* imu_gyr, const float* imu_acc, int32_t n_imu,
                   uint8_t* out) {
  std::memcpy(out, &frame_id, 4);
  std::memcpy(out + 4, &ts_ns, 8);
  put_be16(out + 12, static_cast<uint16_t>(n_kp));
  put_be16(out + 14, static_cast<uint16_t>(n_imu));
  uint8_t* kp = out + kInfoLen;
  for (int i = 0; i < n_kp; ++i, kp += kPtLen) {
    const float x = uv[2 * i], y = uv[2 * i + 1];
    put_be16(kp, round_coord(x));
    put_be16(kp + 2, round_coord(y));
    std::memcpy(kp + 4, desc + kDescLen * i, kDescLen);
  }
  uint8_t* im = out + kInfoLen + static_cast<int64_t>(n_kp) * kPtLen;
  for (int i = 0; i < n_imu; ++i, im += kImuLen) {
    std::memcpy(im, imu_ts + i, 8);
    std::memcpy(im + 8, imu_gyr + 3 * i, 12);
    std::memcpy(im + 20, imu_acc + 3 * i, 12);
  }
  return kInfoLen + static_cast<int64_t>(n_kp) * kPtLen +
         static_cast<int64_t>(n_imu) * kImuLen;
}

// Scan a length-prefixed byte stream (2-byte BE length per packet):
// writes up to `max_out` (offset, length) pairs of COMPLETE payloads into
// `spans` and returns the number found; *consumed is set to the number of
// stream bytes covered by complete packets (the caller keeps the tail).
int32_t svi_scan_stream(const uint8_t* buf, int64_t len, int64_t* spans,
                        int32_t max_out, int64_t* consumed) {
  int64_t off = 0;
  int32_t n = 0;
  while (off + 2 <= len && n < max_out) {
    const int64_t plen = be16(buf + off);
    if (off + 2 + plen > len) break;
    spans[2 * n] = off + 2;
    spans[2 * n + 1] = plen;
    off += 2 + plen;
    ++n;
  }
  *consumed = off;
  return n;
}

}  // extern "C"
