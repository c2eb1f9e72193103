from orbslam3_tpu.distributed.mesh import make_mesh  # noqa: F401
