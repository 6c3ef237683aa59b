"""Per-lane VMEM-resident table gather (Pallas/Mosaic TPU).

``out[i, l] = src[idx[i, l], l]`` — each of the 128 lanes carries its own
``(T,)`` table column and its own index stream.  This is the ONE random
-access primitive Mosaic lowers today (``tpu.dynamic_gather``; see
jax/_src/pallas/mosaic/lowering.py ``_gather_lowering_rule``): operands
must be 2-D and **same-shape** — src, idx and out are all ``(T, 128)``
per call, so the sample-block height is pinned to the table height.

Role: the building block for a VMEM-resident multiresolution hash-grid
lookup (VERDICT r4 task 3).  STATUS: dead end on current Mosaic — the
lowering additionally requires the source to fit ONE vreg along the
gathered dimension ("Not implemented: Multiple source vregs along gather
dimension"; T=8 f32 lowers, T=16 does not), so per-lane tables cap at
8 rows.  Kept interpret-mode tested as the reference semantics for a
future primitive; see ops/hash_vmem.py and PERF.md for the full verdict.

Reference role: tcnn HashGrid forward (reference
examples/radiance_fields/ngp.py:110-163); the reference fuses hash +
gather + lerp in one CUDA kernel — here the gather is the only part XLA
cannot already do well.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lane_gather"]


def _kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_gather(
    src: jnp.ndarray, idx: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """Gather ``out[i, l] = src[idx[i, l], l]``.

    Args:
        src: ``(T, 128)`` table columns (any f32/bf16 dtype).  Kept
            VMEM-resident across the sample grid (constant index map).
        idx: ``(n, 128)`` int32 row ids in ``[0, T)``; ``n`` must be a
            multiple of ``T`` (the Mosaic same-shape constraint pins the
            block height to ``T``).
        interpret: run in Pallas interpret mode (CPU tests).

    Returns:
        ``(n, 128)`` gathered values, ``out[i, l] = src[idx[i, l], l]``.
    """
    t, lanes = src.shape
    n = idx.shape[0]
    if lanes != 128:
        raise ValueError(f"src must have 128 lanes, got {lanes}")
    if n % t != 0:
        raise ValueError(f"idx rows ({n}) must be a multiple of T ({t})")
    return pl.pallas_call(
        _kernel,
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((t, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 128), src.dtype),
        interpret=interpret,
    )(src, idx)
