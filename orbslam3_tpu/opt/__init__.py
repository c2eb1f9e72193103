from orbslam3_tpu.opt import pose_gn, ba  # noqa: F401
