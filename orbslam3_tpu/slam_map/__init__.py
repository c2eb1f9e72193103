from orbslam3_tpu.slam_map import map_state  # noqa: F401
