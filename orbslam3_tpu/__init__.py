"""orbslam3_tpu — a TPU-native visual-inertial SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ORB-SLAM3 V1.0
plus the JiangongChen edge-assisted multi-client fork (reference layout in
SURVEY.md). Functional core (all numerics are pure jitted functions over
fixed-shape device tensors), actor shell (host-side Python owns state machines,
queues and networking).

Subpackage map (mirrors SURVEY.md section 7):
  core/        Lie groups (SO3/SE3/Sim3), camera models, robust losses
  kernels/     Pallas + XLA device kernels: ORB pyramid/FAST/BRIEF, Hamming match
  vision/      frame pipeline, matching policies, two-view init, PnP, Sim3 RANSAC
  imu/         preintegration (scan), visual-inertial initialization solves
  opt/         factor library + sparse Gauss-Newton/LM with Schur elimination
  slam_map/    map state tensors (keyframes/map points/observations), covisibility
  place/       binary-bag-of-words vocabulary, inverted index, relocalization
  engine/      tracking front-end, local mapping, loop closing, System facade
  distributed/ device mesh, sharded bundle adjustment, map-block exchange
  edge/        SlamPktVI/CmdPkt wire codecs, TCP server, client simulator, acoustics
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/estimation code is dominated by tiny (3x3 .. 15x15) matrix algebra
# where TPU's default bf16 matmul passes lose ~1e-3 — fatal for pose chains
# and covariance propagation. Default to full-f32 matmuls; throughput-critical
# kernels (Hamming matcher, BA blocks) opt in to lower precision explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")
