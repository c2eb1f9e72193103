"""Fake-phone replayer: drives the edge server without real devices.

The reference has no in-tree client harness — phones link the shared packet
headers (`/root/reference/include/Socket/slampkt_vi.h:126-166` serializer
ctor implies the app shares them). This module closes that test gap
(SURVEY.md §4): it serializes pre-extracted features + IMU into SlamPktVI
packets, streams them over TCP, consumes CmdPkt replies (adaptive feature
budget, pose+delay), and answers acoustic "emit" commands with synthetic
chirp intervals derived from ground-truth distances (inverting the distance
model in `server.cc:247-249`).
"""

from __future__ import annotations

import socket
import threading

import numpy as np

from . import wire
from .acoustic import K_DISTANCE, SAMPLE_RATE, speed_of_sound


class FakePhone:
    """One simulated phone client."""

    def __init__(self, host: str, slam_port: int, acoustic_port: int = None,
                 client_id: int = 0):
        self.id = client_id
        self.sock = socket.create_connection((host, slam_port))
        self.ac_sock = (socket.create_connection((host, acoustic_port))
                        if acoustic_port is not None else None)
        self.feature_budget = wire.MAX_PACKET  # updated by CMD 0 replies
        self.poses: list[tuple[float, np.ndarray]] = []  # (delay, t_wc)
        self.max_clients = 1
        self._alive = True
        self._dec = wire.StreamDecoder()
        self._reply_t = threading.Thread(target=self._reply_loop, daemon=True)
        self._reply_t.start()
        self._emit_count = 0
        self._emit_cv = threading.Condition()
        if self.ac_sock is not None:
            threading.Thread(target=self._acoustic_loop, daemon=True).start()

    def send_frame(self, frame_id: int, timestamp_ns: int, uv: np.ndarray,
                   desc: np.ndarray, imu_ts_ns=None, imu_gyro=None,
                   imu_acc=None):
        payload = wire.encode_frame(frame_id, timestamp_ns, uv, desc,
                                    imu_ts_ns, imu_gyro, imu_acc)
        self.sock.sendall(wire.frame_packet(payload))

    def _reply_loop(self):
        try:
            while self._alive:
                data = self.sock.recv(4096)
                if not data:
                    break
                for payload in self._dec.feed(data):
                    code, val = wire.decode_cmd(payload)
                    if code == wire.CMD_FEATURE_COUNT:
                        self.feature_budget = val
                    else:
                        self.poses.append(val)
        except OSError:
            pass

    # ----------------------------------------------------------- acoustic

    def _acoustic_loop(self):
        buf = b''
        try:
            while self._alive:
                data = self.ac_sock.recv(1024)
                if not data:
                    break
                buf += data
                while b'\n' in buf:
                    line, buf = buf.split(b'\n', 1)
                    if line == b'emit':
                        with self._emit_cv:
                            self._emit_count += 1
                            self._emit_cv.notify_all()
                    elif b',' in line:  # handshake "<id>,<max_clients>"
                        _, mc = line.split(b',')
                        self.max_clients = int(mc)
        except OSError:
            pass

    @property
    def emit_count(self) -> int:
        with self._emit_cv:
            return self._emit_count

    def wait_emit(self, since: int = 0, timeout: float = 5.0) -> bool:
        """Wait until more than `since` emit commands have been received."""
        with self._emit_cv:
            self._emit_cv.wait_for(lambda: self._emit_count > since, timeout)
            return self._emit_count > since

    def report_intervals(self, intervals: dict[int, int]):
        """Send a `peer_id n` interval report line."""
        msg = ' '.join(f'{p} {n}' for p, n in intervals.items()) + '\n'
        self.ac_sock.sendall(msg.encode())

    @staticmethod
    def distance_to_interval(d_m: float, temperature_c: float = 27.1) -> int:
        """Invert d = c·(n1+n2)/(2·fs)+k assuming symmetric halves: returns
        one half-interval n such that two phones each reporting n yield d."""
        c = speed_of_sound(temperature_c)
        return int(round((d_m - K_DISTANCE) * SAMPLE_RATE / c))

    def close(self):
        self._alive = False
        for s in (self.sock, self.ac_sock):
            if s is not None:
                try:
                    s.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                try:
                    s.close()
                except OSError:
                    pass
