"""Fused Pallas TPU kernel: masked Hamming top-2 descriptor matching.

This is the hot data-association op behind every `ORBmatcher::Search*` policy
(`/root/reference/src/ORBmatcher.cc` — SearchByProjection / SearchByBoW /
SearchForInitialization / SearchForTriangulation / Fuse all reduce to "best +
second-best Hamming distance over a candidate mask").

The unfused XLA path (kernels/hamming.py) materializes the full (N, M) int32
distance matrix in HBM, then re-reads it for masking and `top_k`. At tracking
rates (N,M ~ 1-2k, every frame, several call sites) that is 3 HBM round-trips
of ~16 MB each. This kernel fuses the three stages in VMEM:

  1. Hamming via MXU: descriptors as +/-1 f32 planes, dist = (256 - A.B^T)/2
     (exact — +/-1 dot products are small integers, accumulated in f32).
  2. Candidate mask applied in-register.
  3. Top-2 (best, runner-up, argmin) reduced per row-tile before anything
     touches HBM. Output is O(N), not O(N*M).

Grid: 1-D over row tiles of A; B (transposed planes) and the mask column block
stay resident in VMEM per tile. VMEM budget at TILE_N=128, M=2048:
B^T (256x2048 f32) 2 MB + dist (128x2048 f32) 1 MB + mask 0.25 MB — well
under the ~16 MB/core budget, so no inner M loop is needed at SLAM sizes.

On non-TPU backends the caller (kernels/hamming.py `masked_match_ratio`)
falls back to the unfused XLA path; `interpret=True` exercises this kernel
in tests on the CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BITS = 256
TILE_N = 128
LANE = 128
BIG = float(1 << 20)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _top2_kernel(a_ref, bt_ref, mask_ref, idx_ref, best_ref, second_ref):
    a = a_ref[:]          # (TILE_N, 256) bf16 +/-1 planes
    bt = bt_ref[:]        # (256, M) bf16 +/-1 planes, transposed
    mask = mask_ref[:]    # (TILE_N, M) uint8, 1 = candidate allowed

    dot = jnp.dot(a, bt, preferred_element_type=jnp.float32)
    dist = (N_BITS - dot) * 0.5
    dist = jnp.where(mask != 0, dist, BIG)

    m = dist.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (a.shape[0], m), 1)

    best = jnp.min(dist, axis=1, keepdims=True)              # (TILE_N, 1)
    is_best = dist == best
    # first column achieving the min (ties: lowest index, like the reference's
    # sequential candidate scan)
    idx = jnp.min(jnp.where(is_best, cols, m), axis=1, keepdims=True)
    second = jnp.min(jnp.where(cols == idx, BIG, dist), axis=1, keepdims=True)

    idx_ref[:] = idx
    best_ref[:] = best.astype(jnp.int32)
    second_ref[:] = second.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def masked_top2(
    planes_a: jax.Array,   # (N, 256) +/-1 planes (any float/int dtype)
    planes_b: jax.Array,   # (M, 256)
    mask: jax.Array,       # (N, M) bool — True where b[j] is a candidate for a[i]
    interpret: bool = False,
):
    """Fused masked Hamming best/second-best match.

    Returns (idx (N,) int32, best (N,) int32, second (N,) int32). Rows with an
    empty candidate set get best/second == BIG (callers' thresholds reject
    them, same as the reference's `bestDist <= TH_*` gates).
    """
    n, m = planes_a.shape[0], planes_b.shape[0]
    n_pad = _round_up(max(n, 8), TILE_N)
    m_pad = _round_up(max(m, LANE), LANE)

    # f32 operands: the Mosaic toolchain in this image rejects bf16 tpu.matmul
    # ("Bad lhs type"); f32 +/-1 planes are exact and still MXU-eligible.
    a = jnp.zeros((n_pad, N_BITS), jnp.float32).at[:n].set(
        planes_a.astype(jnp.float32))
    bt = jnp.zeros((N_BITS, m_pad), jnp.float32).at[:, :m].set(
        planes_b.astype(jnp.float32).T)
    mask_u8 = jnp.zeros((n_pad, m_pad), jnp.uint8).at[:n, :m].set(
        mask.astype(jnp.uint8))

    grid = (n_pad // TILE_N,)
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
    ]
    idx, best, second = pl.pallas_call(
        _top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, N_BITS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_BITS, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * N_BITS,
            bytes_accessed=(n_pad * N_BITS * 4 + N_BITS * m_pad * 4
                            + n_pad * m_pad + 3 * n_pad * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, bt, mask_u8)

    # out-of-range idx (empty candidate rows picked the padded sentinel m_pad)
    idx = jnp.clip(idx[:n, 0], 0, max(m - 1, 0))
    return idx, best[:n, 0], second[:n, 0]
