"""Edge SLAM server: TCP ingestion plane feeding per-client tracking lanes.

TPU-native re-design of the reference fork's threaded socket server
(`/root/reference/src/Socket/server.cc`, `client.cc`): one listener for the
SLAM feature stream (default :8080) and one for the acoustic side channel
(default :8848). Each accepted phone gets a server-side ``ClientLane`` with a
receive thread (length-prefixed SlamPktVI reassembly -> frame queue) and a
track thread (dequeue -> IMU handoff -> tracking step -> adaptive feature
budget -> pose+delay reply), mirroring `client.cc:94-211`.

The compute itself is NOT here — the server calls a ``track_fn`` provided by
the System facade; device work stays in jitted pipelines. This layer is
DCN-side I/O only.
"""

from __future__ import annotations

import queue
import socket
import threading
import time
from dataclasses import dataclass, field

import numpy as np

from . import wire
from .acoustic import K_DISTANCE, SAMPLE_RATE, speed_of_sound
from ..utils import verbose as _verbose

# Reference budgets: 1000 features when initializing/lost, 500 when OK,
# secondary clients track 1-in-5 frames (`client.cc:4,166,184-191`).
N_FEATURES_INIT = 1000
N_FEATURES_TRACKING = 500
K_TRACK = 5


@dataclass
class LaneStats:
    frames_received: int = 0
    frames_tracked: int = 0
    recv_times: list = field(default_factory=list)
    send_times: list = field(default_factory=list)


class ClientLane:
    """Server-side proxy for one phone (reference `Client`)."""

    def __init__(self, client_id: int, conn: socket.socket, server):
        self.id = client_id
        self.conn = conn
        self.server = server
        self.frame_q: "queue.Queue[wire.FramePacket]" = queue.Queue(maxsize=64)
        self.ac_conn: socket.socket | None = None
        # per-peer FIFO of reported chirp intervals (reference
        # `Client::intervals`, `client.cc:213-235`)
        self.intervals: dict[int, queue.Queue] = {}
        self.trajectory: list = []   # (ts, R_cw, t_cw, ttrack)
        self.stats = LaneStats()
        self.init_flag = False       # True while lost/initializing
        self._alive = True
        self._lock = threading.Lock()
        self._recv_t = threading.Thread(target=self._receive_loop, daemon=True)
        self._track_t = threading.Thread(target=self._track_loop, daemon=True)
        self._recv_t.start()
        self._track_t.start()

    # ------------------------------------------------------------ threads

    def _receive_loop(self):
        dec = wire.StreamDecoder()
        try:
            while self._alive:
                data = self.conn.recv(4096)
                if not data:
                    break
                for payload in dec.feed(data):
                    pkt = wire.decode_frame(payload)
                    if pkt is None:  # malformed packet: drop, keep the lane
                        _verbose.normal(
                            f"client {self.id}: dropping malformed packet "
                            f"({len(payload)} bytes)")
                        continue
                    self.stats.frames_received += 1
                    self.stats.recv_times.append(time.monotonic())
                    try:
                        self.frame_q.put(pkt, timeout=1.0)
                    except queue.Full:
                        pass  # drop under backpressure
        except OSError:
            pass
        finally:
            self._alive = False

    def _track_loop(self):
        while self._alive or not self.frame_q.empty():
            try:
                pkt = self.frame_q.get(timeout=0.2)
            except queue.Empty:
                continue
            # non-primary clients in relocalize mode track 1-in-k frames
            if self.id != 0 and not self.init_flag and \
                    pkt.frame_id % self.server.k_track != 0:
                continue
            t0 = time.monotonic()
            result = self.server.track_fn(self.id, pkt)
            ttrack = time.monotonic() - t0
            self.stats.frames_tracked += 1
            ok = result is not None
            if ok:
                R_cw, t_cw = result
                with self._lock:
                    self.trajectory.append(
                        (pkt.timestamp_ns * 1e-9, np.asarray(R_cw),
                         np.asarray(t_cw), ttrack))
            # adaptive feature budget (client.cc:184-191)
            if not self.init_flag and not ok:
                self._send(wire.encode_cmd_feature_count(
                    self.server.n_features_init))
                self.init_flag = True
            elif self.init_flag and ok:
                self._send(wire.encode_cmd_feature_count(
                    self.server.n_features_tracking))
                self.init_flag = False
            # pose + processing delay back to the phone (client.cc:203)
            twc = (-np.asarray(R_cw).T @ np.asarray(t_cw)) if ok \
                else np.zeros(3, np.float32)
            recvs = self.stats.recv_times
            self.stats.send_times.append(time.monotonic())
            delay = self.stats.send_times[-1] - \
                recvs[min(len(self.stats.send_times), len(recvs)) - 1]
            self._send(wire.encode_cmd_pose_delay(delay, twc))

    def _send(self, payload: bytes):
        try:
            self.conn.sendall(wire.frame_packet(payload))
        except OSError:
            self._alive = False

    # ----------------------------------------------------------- acoustic

    def attach_acoustic(self, conn: socket.socket):
        self.ac_conn = conn
        threading.Thread(target=self._acoustic_loop, daemon=True).start()

    def _acoustic_loop(self):
        """Parse interval reports: whitespace-separated `peer_id interval`
        pairs per message (client.cc:213-235)."""
        buf = b''
        try:
            # handshake: "<id>,<max_clients>\n"
            self.ac_conn.sendall(
                f'{self.id},{self.server.max_clients}\n'.encode())
            while self._alive:
                data = self.ac_conn.recv(1024)
                if not data:
                    break
                buf += data
                while b'\n' in buf:
                    line, buf = buf.split(b'\n', 1)
                    toks = line.split()
                    for i in range(len(toks) // 2):
                        peer = int(float(toks[2 * i]))
                        n = int(float(toks[2 * i + 1]))
                        self.intervals.setdefault(peer, queue.Queue()).put(n)
        except OSError:
            pass

    def emit(self):
        if self.ac_conn is not None:
            try:
                self.ac_conn.sendall(b'emit\n')
            except OSError:
                pass

    def latest_position(self):
        """Camera center in world coords of the latest tracked frame."""
        with self._lock:
            if not self.trajectory:
                return None, None
            ts, R_cw, t_cw, _ = self.trajectory[-1]
            return ts, (-R_cw.T @ t_cw)

    def rewrite_traj(self, idx: int, t_wc: np.ndarray):
        """Overwrite a stored position after acoustic correction
        (reference `Client::rewriteTraj`, `client.cc:237-271`)."""
        with self._lock:
            ts, R_cw, _, tt = self.trajectory[idx]
            self.trajectory[idx] = (ts, R_cw, -R_cw @ np.asarray(t_wc), tt)

    def close(self):
        self._alive = False
        for c in (self.conn, self.ac_conn):
            if c is not None:
                try:
                    c.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                try:
                    c.close()
                except OSError:
                    pass


class EdgeServer:
    """Accepts up to ``max_clients`` phones; spawns a ClientLane per
    connection (reference `Server::Listening`, `server.cc:115-141`).

    ``track_fn(client_id, FramePacket) -> (R_cw, t_cw) | None`` is supplied
    by the System facade (`System::TrackEdge` equivalent).
    """

    def __init__(self, track_fn, host: str = '127.0.0.1',
                 slam_port: int = 8080, acoustic_port: int = 8848,
                 max_clients: int = 2,
                 n_features_init: int = N_FEATURES_INIT,
                 n_features_tracking: int = N_FEATURES_TRACKING,
                 k_track: int = K_TRACK,
                 temperature_c: float = 27.1):
        self.track_fn = track_fn
        self.max_clients = max_clients
        self.n_features_init = n_features_init
        self.n_features_tracking = n_features_tracking
        self.k_track = k_track
        self.temperature_c = temperature_c
        self.lanes: list[ClientLane] = []
        self._alive = True
        # distance-pair history for calibration (server.cc CalAcoustic)
        self.hist_pos1, self.hist_pos2, self.hist_dist = [], [], []

        self._sock = socket.create_server((host, slam_port))
        self._ac_sock = socket.create_server((host, acoustic_port))
        self.slam_port = self._sock.getsockname()[1]
        self.acoustic_port = self._ac_sock.getsockname()[1]
        self._threads = [
            threading.Thread(target=self._listen_slam, daemon=True),
            threading.Thread(target=self._listen_acoustic, daemon=True),
        ]
        for t in self._threads:
            t.start()

    def _listen_slam(self):
        while self._alive and len(self.lanes) < self.max_clients:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                break
            lane = ClientLane(len(self.lanes), conn, self)
            self.lanes.append(lane)

    def _listen_acoustic(self):
        n = 0
        while self._alive and n < self.max_clients:
            try:
                conn, _ = self._ac_sock.accept()
            except OSError:
                break
            while n >= len(self.lanes) and self._alive:
                time.sleep(0.003)
            if not self._alive:
                break
            self.lanes[n].attach_acoustic(conn)
            n += 1

    # ----------------------------------------------------------- acoustic

    def broadcast_emit(self):
        for lane in self.lanes:
            lane.emit()

    def cal_acoustic(self) -> list[float]:
        """Convert pending interval pairs to metric distances
        (`server.cc:232-270`): d = c·(n1+n2)/(2·fs) + k, gated to (0, 4) m.
        Returns client-0 distances; other pairs go to calibration history."""
        c = speed_of_sound(self.temperature_c)
        out = []
        for i, li in enumerate(self.lanes):
            _, pos1 = li.latest_position()
            for j in range(i + 1, len(self.lanes)):
                lj = self.lanes[j]
                qi = li.intervals.get(j)
                qj = lj.intervals.get(i)
                if qi is None or qj is None or qi.empty() or qj.empty():
                    continue
                n1, n2 = qi.get(), qj.get()
                d = c * (n1 + n2) / (2 * SAMPLE_RATE) + K_DISTANCE
                if not (0.0 < d < 4.0):
                    continue
                if i == 0:
                    out.append(d)
                else:
                    _, pos2 = lj.latest_position()
                    if pos1 is not None and pos2 is not None:
                        self.hist_pos1.append(pos1)
                        self.hist_pos2.append(pos2)
                        self.hist_dist.append(d)
        return out

    def close(self):
        self._alive = False
        for s in (self._sock, self._ac_sock):
            try:
                s.close()
            except OSError:
                pass
        for lane in self.lanes:
            lane.close()
