"""Headline benchmark: tracking front-end latency per frame on one chip.

Measures the flagship per-frame device program (ORB extraction -> projection
association -> robust pose GN, i.e. `__graft_entry__.entry()`), the hot path
the reference runs in 20-40 ms/frame on a desktop i7
(`/root/reference/README.md` §2 real-time claim; BASELINE.md §B "Tracking
thread latency" ~30 ms midpoint).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline > 1 means faster than the reference baseline.
"""

import json
import os
import time

import numpy as np
import jax

# Persistent compilation cache: the frontend program is large (pyramid atlas
# + matcher + pose GN); first compile is minutes, cached runs are instant.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

BASELINE_MS = 30.0  # reference tracking ms/frame midpoint (i7, BASELINE.md)


def main():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    img, rest = args[0], args[1:]
    step = jax.jit(fn)

    # warmup / compile
    out = step(img, *rest)
    jax.block_until_ready(out)

    # steady-state: feed fresh frames (new pixel content, same shapes),
    # pre-staged on device. On production TPU hosts the frame DMA is
    # ~0.1 ms (1.4 MB over PCIe); in this dev environment the axon tunnel
    # adds ~60 ms/transfer, which would swamp the number being measured
    # (the per-frame device program). Median-of-batches resists tunnel
    # dispatch jitter.
    rng = np.random.default_rng(1)
    frames = [jnp.asarray(rng.uniform(0, 255, img.shape), jnp.float32)
              for _ in range(8)]
    jax.block_until_ready(frames)
    batches = []
    for rep in range(7):
        n_iters = 16
        t_start = time.perf_counter()
        for i in range(n_iters):
            out = step(frames[i % len(frames)], *rest)
        jax.block_until_ready(out)
        batches.append((time.perf_counter() - t_start) / n_iters * 1e3)
    ms = float(np.median(batches))

    print(json.dumps({
        "metric": "tracking_frontend_ms_per_frame",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
