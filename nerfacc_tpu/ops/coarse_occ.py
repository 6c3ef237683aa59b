"""Gather-free coarse-occupancy lookup — Pallas TPU kernel.

The windowed traverser's phase 1 tests every coarse window midpoint against
a pooled occupancy grid.  As an XLA gather that costs ~4 ns per candidate
row (serialized random access); this kernel instead evaluates the lookup as
dense one-hot contractions entirely in VMEM/registers:

    occ[n] = sum_{r,l} onehot(row_n)[r] * onehot(lane_n)[l] * S[r, l]

with the pooled grid flattened to ``S (levels*Rx, Ry*Rz)`` (at 32^3 and <=8
levels that is at most (256, 1024) f32 = 1 MB — VMEM resident).  Per block
of 512 candidates: one (512, rows) @ (rows, lanes) MXU matmul plus an
iota-compare lane mask — no random memory access anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512


def _kernel(row_ref, lane_ref, s_ref, out_ref):
    rows = s_ref.shape[0]
    lanes = s_ref.shape[1]
    row = row_ref[:]  # (BLK, 1) int32
    lane = lane_ref[:]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BLK, rows), 1)
    oh_row = (row_ids == row).astype(jnp.bfloat16)
    picked = jnp.dot(
        oh_row, s_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (BLK, lanes)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (BLK, lanes), 1)
    oh_lane = (lane_ids == lane).astype(jnp.float32)
    out_ref[:] = jnp.sum(picked * oh_lane, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def coarse_occ_lookup(
    row: jnp.ndarray,
    lane: jnp.ndarray,
    summary: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Look up ``summary[row[n], lane[n]]`` for all n without gathers.

    Args:
        row: (N,) int32 in [0, summary.shape[0]).
        lane: (N,) int32 in [0, summary.shape[1]).
        summary: (rows, lanes) f32 table (rows*lanes <= ~1M).

    Returns:
        (N,) f32 values.
    """
    n = row.shape[0]
    pad = (-n) % BLK
    rowp = jnp.pad(row, (0, pad)).reshape(-1, 1)
    lanep = jnp.pad(lane, (0, pad)).reshape(-1, 1)
    grid = (rowp.shape[0] // BLK,)
    rows, lanes = summary.shape
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rowp.shape[0], 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rows, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(rowp, lanep, summary)
    return out[:n, 0]
