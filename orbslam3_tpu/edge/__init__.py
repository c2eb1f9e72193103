"""Edge-assisted multi-client SLAM layer.

TPU-native re-design of the reference fork's socket layer
(`/root/reference/src/Socket/{server,client}.cc`): phones stream
keypoints+descriptors+IMU (not images) to the server, which runs one tracking
lane per client against a shared Atlas back-end, plus an acoustic-ranging
side channel fused by small dense LM solves on device.
"""
