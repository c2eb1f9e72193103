from orbslam3_tpu.vision import frame  # noqa: F401
