from orbslam3_tpu.kernels import image, fast, orb_descriptor, hamming  # noqa: F401
