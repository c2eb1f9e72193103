"""Asynchronous mapping back-end: LocalMapping + LoopClosing on a worker
thread with a keyframe queue and interruptible BA.

Reproduces the reference's thread architecture
(`/root/reference/src/System.cc:198,215`: `LocalMapping::Run` and
`LoopClosing::Run` threads; `LocalMapping.cc:288-300` KF queue;
`mbAbortBA` at :292): tracking inserts keyframes and returns immediately;
the worker drains the queue, aborting an in-flight local BA when a new
keyframe arrives; loop detection runs after each processed keyframe on the
same worker (the reference uses a third thread for it — here the two
back-end stages share one worker, which preserves the property that matters:
the TRACKING thread never blocks on mapping).

Synchronization: Python-side map mutations are individually GIL-atomic
numpy ops; cross-stage consistency uses the map-level mutex
(`MapState.lock`, the reference's `mMutexMapUpdate`, Map.h:141) held by the
worker around map-mutating stages and by callers that need a consistent
multi-array view.
"""

from __future__ import annotations

import threading
from collections import deque


class AsyncBackend:
    """Worker thread draining a keyframe queue through `process_fn`.

    `process_fn(k, abort)` is the whole per-keyframe back-end iteration
    (local mapping + loop closing + any system hooks); `abort` is a nullary
    callable that turns true when further keyframes are waiting."""

    def __init__(self, process_fn):
        self.process_fn = process_fn
        self._queue: deque[int] = deque()
        self._cv = threading.Condition()
        self._abort_ba = False
        self._stop = False
        self._busy = False
        self._errors: list[BaseException] = []
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="local-mapping")
        self._thread.start()

    # ------------------------------------------------------------ producer
    def insert_keyframe(self, k: int):
        """`LocalMapping::InsertKeyFrame` (LocalMapping.cc:288-300): enqueue
        and raise the abort flag so an in-flight BA yields."""
        with self._cv:
            self._queue.append(int(k))
            self._abort_ba = True
            self._cv.notify()

    def queue_len(self) -> int:
        with self._cv:
            return len(self._queue)

    def accept_keyframes(self) -> bool:
        """Backpressure signal (reference `AcceptKeyFrames`): advisory —
        the tracker may decide to skip KF insertion when the queue is deep."""
        with self._cv:
            return len(self._queue) < 3

    def flush(self, timeout: float = 120.0):
        """Block until the queue is drained and the worker is idle (used by
        Shutdown and deterministic tests)."""
        import time
        t0 = time.time()
        while time.time() - t0 < timeout:
            with self._cv:
                if not self._queue and not self._busy:
                    return
            time.sleep(0.005)
        raise TimeoutError("async backend did not drain")

    def shutdown(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=30.0)
        if self._errors:
            raise self._errors[0]

    @property
    def errors(self):
        return list(self._errors)

    # ------------------------------------------------------------ consumer
    def _abort_requested(self) -> bool:
        with self._cv:
            return self._abort_ba

    def _run(self):
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait(timeout=0.2)
                if self._stop and not self._queue:
                    return
                k = self._queue.popleft()
                # only abort BA when MORE keyframes are waiting behind this
                # one (mbAbortBA is reset at the top of each Run iteration)
                self._abort_ba = bool(self._queue)
                self._busy = True
            try:
                self.process_fn(k, self._abort_requested)
            except Exception as e:  # keep the worker alive; surface later
                self._errors.append(e)
            finally:
                with self._cv:
                    self._busy = False
