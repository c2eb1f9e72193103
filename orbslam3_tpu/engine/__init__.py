from orbslam3_tpu.engine import tracking, local_mapping  # noqa: F401
