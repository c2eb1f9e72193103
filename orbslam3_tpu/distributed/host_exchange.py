"""Cross-host map exchange over TCP (the DCN plane of the multi-host story).

Ships `map_blocks` keyframe blocks between SLAM hosts with the same
length-prefixed framing discipline as the edge wire protocol, so a stored
map can be welded into another host's Atlas (`fetch_remote_map` ->
`Atlas.weld`). Reference analog: the whole-Atlas boost serialization +
file hand-off (`/root/reference/src/System.cc:1529-1673`) — redesigned as
streamed, bounded, resumable tensor blocks instead of one monolithic
object graph on a shared disk.

Framing: every message is [u32 big-endian length][payload]; a map is sent
as one `MAP` header (json: n_blocks, map_id) followed by that many
serialized blocks; arbitrary side-channel payloads (e.g. a BA problem for
a joint cross-host solve) use the same framing with a different header
kind. Single-purpose and synchronous by design — the caller owns threads.
"""

from __future__ import annotations

import json
import socket
import struct

import numpy as np

from orbslam3_tpu.slam_map.map_state import MapConfig, MapState
from .map_blocks import (deserialize_block, fetch_remote_map, map_to_blocks,
                         serialize_block)

_LEN = struct.Struct(">I")
MAX_MSG = 256 * 1024 * 1024  # one block is <= a few MB; guard corrupt frames


def send_msg(sock: socket.socket, payload: bytes):
    sock.sendall(_LEN.pack(len(payload)) + payload)


def recv_msg(sock: socket.socket) -> bytes:
    hdr = _recv_exact(sock, _LEN.size)
    (n,) = _LEN.unpack(hdr)
    if n > MAX_MSG:
        raise ValueError(f"oversized frame: {n} bytes")
    return _recv_exact(sock, n)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n > 0:
        chunk = sock.recv(min(n, 1 << 20))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        chunks.append(chunk)
        n -= len(chunk)
    return b"".join(chunks)


# ------------------------------------------------------------------ map send
def send_map(sock: socket.socket, m: MapState, block_kfs: int = 64):
    """Stream a map as blocks over an open socket."""
    blocks = map_to_blocks(m, block_kfs=block_kfs)
    head = json.dumps({"kind": "map", "n_blocks": len(blocks),
                       "map_id": int(m.map_id)}).encode()
    send_msg(sock, head)
    for blk in blocks:
        send_msg(sock, serialize_block(blk))


def recv_map(sock: socket.socket, cfg: MapConfig,
             map_id: int = 0) -> MapState:
    """Receive one map (blocking); returns a reassembled MapState."""
    head = json.loads(recv_msg(sock).decode())
    if head.get("kind") != "map":
        raise ValueError(f"expected map header, got {head}")
    raw = [recv_msg(sock) for _ in range(int(head["n_blocks"]))]
    return fetch_remote_map(raw, cfg, map_id=map_id)


# ------------------------------------------------------- array dict exchange
def send_arrays(sock: socket.socket, name: str, arrays: dict):
    """Ship a dict of numpy arrays (e.g. a routed BAProblem) to the peer."""
    import io
    buf = io.BytesIO()
    np.savez_compressed(buf, **{k: np.asarray(v) for k, v in arrays.items()})
    head = json.dumps({"kind": "arrays", "name": name}).encode()
    send_msg(sock, head)
    send_msg(sock, buf.getvalue())


def recv_arrays(sock: socket.socket) -> tuple[str, dict]:
    import io
    head = json.loads(recv_msg(sock).decode())
    if head.get("kind") != "arrays":
        raise ValueError(f"expected arrays header, got {head}")
    with np.load(io.BytesIO(recv_msg(sock)), allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    return head["name"], arrays


# ----------------------------------------------------------------- listeners
def serve_once(port: int, timeout: float = 120.0) -> socket.socket:
    """Accept exactly one peer connection on localhost:port."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", port))
    srv.listen(1)
    srv.settimeout(timeout)
    conn, _ = srv.accept()
    srv.close()
    conn.settimeout(timeout)
    return conn


def connect(port: int, host: str = "127.0.0.1", timeout: float = 120.0,
            retries: int = 100, delay: float = 0.2) -> socket.socket:
    """Connect to a peer, retrying while it boots."""
    import time
    last = None
    for _ in range(retries):
        try:
            sock = socket.create_connection((host, port), timeout=timeout)
            sock.settimeout(timeout)
            return sock
        except OSError as e:
            last = e
            time.sleep(delay)
    raise ConnectionError(f"cannot reach {host}:{port}: {last}")
