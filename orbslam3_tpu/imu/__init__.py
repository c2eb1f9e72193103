from orbslam3_tpu.imu import preintegration  # noqa: F401
