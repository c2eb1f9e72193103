"""Typed settings — reference-compatible YAML configs.

Reads the reference's two-generation OpenCV-FileStorage YAML schema without
OpenCV: the new format gated on ``File.version: "1.0"`` parsed by `Settings`
(`/root/reference/src/Settings.cc`, `include/Settings.h:53-125`; full schema
in `Examples/Monocular-Inertial/PIXEL6.yaml`) and the legacy flat
``Camera.fx``-style format parsed by `Tracking::Parse{Cam,ORB,IMU}ParamFile`
(`/root/reference/src/Tracking.cc:711-1517`). Field names are accepted
verbatim so the reference's dataset configs (EuRoC, TUM-VI, KITTI, PIXEL4/6)
run unchanged.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np


def _load_opencv_yaml(path: str) -> dict:
    """Parse an OpenCV-FileStorage YAML (tolerates the `%YAML:1.0` directive
    and `!!opencv-matrix` tags) into a flat {dotted.key: value} dict."""
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    def _cv_matrix(loader, node):
        m = loader.construct_mapping(node, deep=True)
        return np.asarray(m['data'], np.float64).reshape(
            int(m['rows']), int(m['cols']))

    _Loader.add_constructor('tag:yaml.org,2002:opencv-matrix', _cv_matrix)
    _Loader.add_constructor('!opencv-matrix', _cv_matrix)

    with open(path) as f:
        text = f.read()
    text = re.sub(r'^%YAML[^\n]*\n', '', text)
    # OpenCV writes "key: !!opencv-matrix" — PyYAML resolves !! to the
    # yaml.org 2002 namespace, handled by the constructor above.
    data = yaml.load(text, Loader=_Loader) or {}
    return data


@dataclass
class ImuSettings:
    noise_gyro: float = 1.7e-4
    noise_acc: float = 2.0e-3
    gyro_walk: float = 1.9e-5
    acc_walk: float = 3.0e-3
    frequency: float = 200.0
    T_b_c1: np.ndarray = field(default_factory=lambda: np.eye(4))
    insert_kfs_when_lost: bool = True


@dataclass
class Settings:
    """Validated, typed view of a reference config file."""

    # camera
    camera_type: str = 'PinHole'      # PinHole | KannalaBrandt8 | Rectified
    fx: float = 458.0
    fy: float = 458.0
    cx: float = 320.0
    cy: float = 240.0
    dist: tuple = (0.0, 0.0, 0.0, 0.0)   # k1 k2 p1 p2 [k3] or KB8 k1..k4
    width: int = 752
    height: int = 480
    fps: float = 30.0
    rgb: bool = True
    new_width: int = -1               # Camera.newWidth resize target
    new_height: int = -1
    # stereo
    stereo: bool = False
    bf: float = 0.0                   # baseline * fx (Camera.bf)
    th_depth: float = 35.0            # close/far point threshold
    T_c1_c2: np.ndarray | None = None  # stereo extrinsics (Stereo.T_c1_c2)
    # right camera (non-rectified stereo); None -> same as left
    fx2: float | None = None
    fy2: float | None = None
    cx2: float | None = None
    cy2: float | None = None
    dist2: tuple | None = None
    # rgbd
    rgbd: bool = False
    depth_map_factor: float = 1.0
    # imu
    inertial: bool = False
    imu: ImuSettings = field(default_factory=ImuSettings)
    # orb extractor
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    # system
    load_atlas_from: str = ''
    save_atlas_to: str = ''
    th_far_points: float = 0.0
    loop_closing: bool = True

    # ------------------------------------------------------------- factory

    @staticmethod
    def from_yaml(path: str, sensor: str = 'monocular') -> 'Settings':
        d = _load_opencv_yaml(path)
        s = Settings()
        s.inertial = 'imu' in sensor.lower() or 'inertial' in sensor.lower()
        s.stereo = 'stereo' in sensor.lower()
        s.rgbd = 'rgbd' in sensor.lower() or 'rgb-d' in sensor.lower()
        new_format = str(d.get('File.version', '')) == '1.0'
        cam = 'Camera1' if new_format else 'Camera'

        def get(key, default=None):
            return d.get(key, default)

        s.camera_type = str(get('Camera.type', 'PinHole'))
        s.fx = float(get(f'{cam}.fx', s.fx))
        s.fy = float(get(f'{cam}.fy', s.fy))
        s.cx = float(get(f'{cam}.cx', s.cx))
        s.cy = float(get(f'{cam}.cy', s.cy))
        if s.camera_type == 'KannalaBrandt8':
            s.dist = tuple(float(get(f'{cam}.k{i}', 0.0)) for i in (1, 2, 3, 4))
        else:
            s.dist = (float(get(f'{cam}.k1', 0.0)), float(get(f'{cam}.k2', 0.0)),
                      float(get(f'{cam}.p1', 0.0)), float(get(f'{cam}.p2', 0.0)),
                      float(get(f'{cam}.k3', 0.0)))
        s.width = int(get('Camera.width', s.width))
        s.height = int(get('Camera.height', s.height))
        s.fps = float(get('Camera.fps', get('Camera.fs', s.fps)))
        s.rgb = bool(int(get('Camera.RGB', 1)))
        s.new_width = int(get('Camera.newWidth', -1))
        s.new_height = int(get('Camera.newHeight', -1))
        s.bf = float(get('Camera.bf', 0.0))
        s.th_depth = float(get('Stereo.ThDepth', get('Camera.ThDepth',
                                                     get('ThDepth', 35.0))))
        if get('Stereo.T_c1_c2') is not None:
            s.T_c1_c2 = np.asarray(get('Stereo.T_c1_c2'), np.float64)
        # right camera intrinsics (fisheye pairs are NOT rectified, so
        # Camera2 keeps its own calibration; reference Settings::readCamera2)
        if get('Camera2.fx') is not None:
            s.fx2 = float(get('Camera2.fx'))
            s.fy2 = float(get('Camera2.fy', s.fx2))
            s.cx2 = float(get('Camera2.cx', 0.0))
            s.cy2 = float(get('Camera2.cy', 0.0))
            if s.camera_type == 'KannalaBrandt8':
                s.dist2 = tuple(float(get(f'Camera2.k{i}', 0.0))
                                for i in (1, 2, 3, 4))
            else:
                s.dist2 = (float(get('Camera2.k1', 0.0)),
                           float(get('Camera2.k2', 0.0)),
                           float(get('Camera2.p1', 0.0)),
                           float(get('Camera2.p2', 0.0)),
                           float(get('Camera2.k3', 0.0)))
        s.depth_map_factor = float(get('RGBD.DepthMapFactor',
                                       get('DepthMapFactor', 1.0)))
        # IMU
        imu = ImuSettings(
            noise_gyro=float(get('IMU.NoiseGyro', 1.7e-4)),
            noise_acc=float(get('IMU.NoiseAcc', 2e-3)),
            gyro_walk=float(get('IMU.GyroWalk', 1.9e-5)),
            acc_walk=float(get('IMU.AccWalk', 3e-3)),
            frequency=float(get('IMU.Frequency', 200.0)),
            insert_kfs_when_lost=bool(int(get('IMU.InsertKFsWhenLost', 1))),
        )
        Tbc = get('IMU.T_b_c1', get('Tbc'))
        if Tbc is not None:
            imu.T_b_c1 = np.asarray(Tbc, np.float64).reshape(4, 4)
        s.imu = imu
        # ORB
        s.n_features = int(get('ORBextractor.nFeatures', s.n_features))
        s.scale_factor = float(get('ORBextractor.scaleFactor', s.scale_factor))
        s.n_levels = int(get('ORBextractor.nLevels', s.n_levels))
        s.ini_th_fast = int(get('ORBextractor.iniThFAST', s.ini_th_fast))
        s.min_th_fast = int(get('ORBextractor.minThFAST', s.min_th_fast))
        # system
        s.load_atlas_from = str(get('System.LoadAtlasFromFile', ''))
        s.save_atlas_to = str(get('System.SaveAtlasToFile', ''))
        s.th_far_points = float(get('thFarPoints', 0.0))
        lc = get('loopClosing')
        if lc is not None:
            s.loop_closing = bool(int(lc))
        return s

    # ------------------------------------------------------------ adapters

    def rectification(self):
        """Precomputed stereo rectification maps for raw pinhole pairs
        (reference `Settings::precomputeRectificationMaps`,
        src/Settings.cc:485-528). Built lazily once; None when the config
        is not an unrectified pinhole stereo pair."""
        if getattr(self, '_rect', '__unset__') != '__unset__':
            return self._rect
        rect = None
        needs_rect = False
        if self.T_c1_c2 is not None:
            # an identity-rotation, distortion-free pair is already
            # rectified (reference "Rectified" camera type) — skip the remap
            distorted = (any(abs(k) > 1e-12 for k in self.dist)
                         or any(abs(k) > 1e-12 for k in (self.dist2 or ())))
            rotated = (np.abs(self.T_c1_c2[:3, :3] - np.eye(3)).max()
                       > 1e-9)
            needs_rect = distorted or rotated
        if (self.stereo and self.camera_type == 'PinHole'
                and needs_rect and self.fx2 is not None):
            from .vision.rectify import RectifyMaps
            K1 = np.array([[self.fx, 0, self.cx], [0, self.fy, self.cy],
                           [0, 0, 1.0]])
            K2 = np.array([[self.fx2, 0, self.cx2], [0, self.fy2, self.cy2],
                           [0, 0, 1.0]])
            # T_c1_c2 maps cam2 coords into cam1; stereo_rectify wants the
            # left->right transform (x_r = R12 x_l + t12), i.e. its inverse
            T = self.T_c1_c2
            R12 = T[:3, :3].T
            t12 = -R12 @ T[:3, 3]
            rect = RectifyMaps(K1, self.dist, K2, self.dist2 or (0.,) * 5,
                               (self.width, self.height), R12, t12)
        self._rect = rect
        return rect

    def camera(self):
        """Build the device camera model (resized intrinsics if requested).

        For an unrectified pinhole stereo pair this is the RECTIFIED
        camera — the shared ideal pinhole both remapped images obey
        (reference updates calibration1_ from P1, Settings.cc:511-516)."""
        from .core.camera import Camera
        rect = self.rectification()
        if rect is not None:
            K = rect.K_new
            return Camera.pinhole(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                                  width=self.width, height=self.height)
        fx, fy, cx, cy = self.fx, self.fy, self.cx, self.cy
        w, h = self.width, self.height
        if self.new_width > 0 and self.new_height > 0:
            sx = self.new_width / w
            sy = self.new_height / h
            fx, cx, fy, cy = fx * sx, cx * sx, fy * sy, cy * sy
            w, h = self.new_width, self.new_height
        if self.camera_type == 'KannalaBrandt8':
            return Camera.kb8(fx, fy, cx, cy, *self.dist[:4],
                              width=w, height=h)
        dist = self.dist if self.camera_type == 'PinHole' else (0.,) * 5
        return Camera.pinhole(fx, fy, cx, cy, dist=tuple(dist),
                              width=w, height=h)

    def camera2(self):
        """Right camera model for non-rectified stereo pairs (falls back to
        the left intrinsics when Camera2.* is absent)."""
        from .core.camera import Camera
        if self.fx2 is None:
            return self.camera()
        if self.camera_type == 'KannalaBrandt8':
            return Camera.kb8(self.fx2, self.fy2, self.cx2, self.cy2,
                              *self.dist2[:4],
                              width=self.width, height=self.height)
        return Camera.pinhole(self.fx2, self.fy2, self.cx2, self.cy2,
                              dist=tuple(self.dist2 or (0.,) * 5),
                              width=self.width, height=self.height)

    def imu_calib(self):
        """Device ImuCalib from the yaml IMU block (reference
        `Settings::readIMU`, src/Settings.cc)."""
        from .imu.preintegration import ImuCalib
        Tbc = self.imu.T_b_c1
        rect = self.rectification()
        if rect is not None:
            # rectification rotates camera1's frame by R1; fold that into
            # the body<->camera extrinsic: Tbc' = Tbc * (R1, 0)^-1
            # (reference Settings.cc:521-526, IMU_STEREO branch)
            Tr = np.eye(4)
            Tr[:3, :3] = rect.R1
            Tbc = Tbc @ np.linalg.inv(Tr)
        return ImuCalib.create(
            Tbc=Tbc, noise_gyro=self.imu.noise_gyro,
            noise_acc=self.imu.noise_acc, walk_gyro=self.imu.gyro_walk,
            walk_acc=self.imu.acc_walk, freq=self.imu.frequency)

    def system_config(self, map_cfg=None):
        from .engine.system import Sensor, SystemConfig
        from .engine.tracking import TrackerConfig
        from .slam_map.map_state import MapConfig
        if self.stereo:
            sensor = Sensor.IMU_STEREO if self.inertial else Sensor.STEREO
        elif self.rgbd:
            sensor = Sensor.IMU_RGBD if self.inertial else Sensor.RGBD
        else:
            sensor = (Sensor.IMU_MONOCULAR if self.inertial
                      else Sensor.MONOCULAR)
        mc = map_cfg or MapConfig(features_per_frame=self.n_features)
        rect = self.rectification()
        bf = self.bf
        if rect is not None:
            # bf from the rectified geometry (Settings.cc:518-519)
            bf = float(rect.bf)
        elif bf <= 0 and self.stereo and self.T_c1_c2 is not None:
            # bf = baseline * fx (reference Settings::readCamera2)
            fx = self.fx
            if self.new_width > 0:
                fx = fx * self.new_width / self.width
            bf = float(np.linalg.norm(self.T_c1_c2[:3, 3])) * fx
        tracker = TrackerConfig(n_features=self.n_features, bf=bf,
                                th_depth=self.th_depth, rectify=rect,
                                # ORBextractor.* knobs + thFarPoints flow
                                # through to extraction / the depth gate
                                # (reference Settings.cc ORB block;
                                # Tracking.cc mThFarPoints)
                                n_levels=self.n_levels,
                                scale_factor=self.scale_factor,
                                ini_th_fast=float(self.ini_th_fast),
                                min_th_fast=float(self.min_th_fast),
                                th_far_points=self.th_far_points)
        if (self.stereo and self.camera_type == 'KannalaBrandt8'
                and self.T_c1_c2 is not None):
            # non-rectified fisheye pair: dispatch the KB8 two-view
            # triangulation path instead of the rectified row search
            # (KannalaBrandt8::TriangulateMatches; Settings.cc Tlr parsing)
            T = self.T_c1_c2  # pose of cam2 in cam1: x_c1 = R t * x_c2
            R12 = T[:3, :3].astype(np.float32)
            t12 = T[:3, 3].astype(np.float32)
            tracker.fisheye_stereo = True
            tracker.camera2 = self.camera2()
            tracker.stereo_R_rl = R12.T              # right<-left
            tracker.stereo_t_rl = (-R12.T @ t12).astype(np.float32)
            tracker.baseline_m = float(np.linalg.norm(t12))
            tracker.bf = 0.0  # no rectified virtual-uR residuals
        if self.stereo or self.inertial or self.rgbd:
            # reference thRefRatio: 0.75 for stereo/RGB-D/inertial, 0.9 mono
            # (Tracking::NeedNewKeyFrame, Tracking.cc:3208 region)
            tracker.kf_ref_ratio = 0.75
        return SystemConfig(
            sensor=sensor, map=mc, tracker=tracker,
            use_loop_closing=self.loop_closing,
            imu_calib=self.imu_calib() if self.inertial else None)
