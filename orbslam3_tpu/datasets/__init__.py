"""Dataset loaders (EuRoC/TUM-VI ASL layout, KITTI odometry) and the
synthetic EuRoC-format sequence generator used for self-contained tests.

Framework analog of the reference's per-dataset example mains
(`/root/reference/Examples/Monocular-Inertial/mono_inertial_euroc.cc:40-120`
LoadImages/LoadIMU pattern): loading is host-side Python; frames stream into
the jitted tracking pipeline.
"""

from .euroc import AslSequence, load_euroc, load_tumvi, imu_batches
from .kitti import KittiSequence, load_kitti
from .tum_rgbd import TumRgbdSequence, load_tum_rgbd

__all__ = [
    "AslSequence", "load_euroc", "load_tumvi", "imu_batches",
    "KittiSequence", "load_kitti",
    "TumRgbdSequence", "load_tum_rgbd",
]
