from orbslam3_tpu.core import lie, camera, robust  # noqa: F401
