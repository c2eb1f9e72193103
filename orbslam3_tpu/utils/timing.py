"""Per-stage timing harness.

Reproduces the reference's `REGISTER_TIMES` instrumentation
(`/root/reference/include/Tracking.h:202-210`, printed by
`Tracking::PrintTimeStats` to terminal + `ExecTimeMean.txt`): per-frame stage
timers in tracking (extract / IMU-integration / pose-prediction /
local-map track / new-KF) and per-keyframe timers in mapping (culling /
triangulation / fuse / local-BA) and loop closing.

Design: a process-global registry of named stage series. `stage(name)` is a
context manager; `jax.block_until_ready` is NOT called here — callers time
whole host-visible stages, which is what the reference measures too.
Disabled by default (zero overhead beyond a perf_counter pair); enable with
`timing.enable()` or env ORBSLAM3_TPU_TIMING=1.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import numpy as np

_enabled = bool(int(os.environ.get("ORBSLAM3_TPU_TIMING", "0")))
_series: dict[str, list] = defaultdict(list)


def enable(on: bool = True):
    global _enabled
    _enabled = on


def enabled() -> bool:
    return _enabled


def reset():
    _series.clear()


@contextlib.contextmanager
def stage(name: str):
    """Time a stage; appends milliseconds to the named series when enabled."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _series[name].append((time.perf_counter() - t0) * 1e3)


def record(name: str, ms: float):
    if _enabled:
        _series[name].append(ms)


def stats() -> dict[str, dict]:
    """{stage: {n, mean_ms, median_ms, p90_ms, total_ms}}."""
    out = {}
    for name, xs in _series.items():
        a = np.asarray(xs)
        out[name] = dict(n=len(a), mean_ms=float(a.mean()),
                         median_ms=float(np.median(a)),
                         p90_ms=float(np.percentile(a, 90)),
                         total_ms=float(a.sum()))
    return out


def print_time_stats(file=None):
    """`Tracking::PrintTimeStats` equivalent: mean/median per stage."""
    import sys
    f = file or sys.stdout
    rows = sorted(stats().items())
    if not rows:
        print("(timing disabled or no samples)", file=f)
        return
    w = max(len(n) for n, _ in rows)
    print(f"{'stage'.ljust(w)}      n     mean ms   median ms      p90 ms",
          file=f)
    for name, s in rows:
        print(f"{name.ljust(w)} {s['n']:6d} {s['mean_ms']:11.2f} "
              f"{s['median_ms']:11.2f} {s['p90_ms']:11.2f}", file=f)


def save(path: str = "ExecTimeMean.txt"):
    with open(path, "w") as f:
        print_time_stats(file=f)


# -- dispatch / transfer audit ------------------------------------------------
# The reference's real-time claim rests on a tight host loop; ours rests on
# FEW device round-trips per frame. `count()` tallies device-program launches
# at the hot-path call sites (an int increment — always on); `transfer_audit`
# measures host<->device transfers EXTERNALLY via jax's transfer guard, whose
# log lines are emitted by the C++ runtime on stderr (guard_lib.cc) — an
# instrumentation-free ground truth the self-counts can be checked against.

_counts: dict[str, int] = defaultdict(int)


def count(name: str, k: int = 1):
    _counts[name] += k


def counts() -> dict[str, int]:
    return dict(_counts)


def reset_counts():
    _counts.clear()


@contextlib.contextmanager
def transfer_audit(box: dict):
    """Counts h2d/d2h transfers inside the block into `box`.

    Redirects OS-level stderr (fd 2) to a temp file and enables
    `jax.transfer_guard("log")`; the XLA guard logs one line per transfer.
    Everything else written to stderr inside the block is replayed
    afterwards. Donated/committed on-device arrays do not log (correct: we
    want the host<->device boundary, not device arithmetic)."""
    import re
    import sys
    import tempfile

    import jax

    sys.stderr.flush()
    saved = os.dup(2)
    tf = tempfile.TemporaryFile(mode="w+b")
    os.dup2(tf.fileno(), 2)
    try:
        with jax.transfer_guard("log"):
            yield box
    finally:
        sys.stderr.flush()
        os.dup2(saved, 2)
        os.close(saved)
        tf.seek(0)
        text = tf.read().decode(errors="replace")
        tf.close()
        box["h2d"] = len(re.findall(r"host-to-device transfer", text))
        box["d2h"] = len(re.findall(r"device-to-host transfer", text))
        # replay non-guard lines so real errors aren't swallowed
        other = [ln for ln in text.splitlines()
                 if "transfer:" not in ln and ln.strip()]
        if other:
            sys.stderr.write("\n".join(other) + "\n")
