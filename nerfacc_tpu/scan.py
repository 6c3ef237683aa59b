"""Segmented inclusive/exclusive sum and product scans.

TPU-native analog of the reference's CUDA/CUB segmented scans
(reference: nerfacc/scan.py:14-282, cuda/csrc/scan.cu, scan_cub.cu).

Three layouts, mirroring the reference API:

* batched ``(..., n)``: plain ``cumsum`` / ``cumprod`` on the last axis.
* flattened ``(all_samples,)`` + ``packed_info (n_rays, 2)``.
* flattened ``(all_samples,)`` + ``indices (all_samples,)`` (ray id per item).

Flattened layouts are implemented as a *segmented* scan via
``jax.lax.associative_scan`` with segment-start flags — fully XLA-native and
differentiable (JAX autodiff yields the reversed-scan gradients that the
reference implements by hand in scan.py:285-468).  Unlike the reference, the
``exclusive_prod`` gradient here is exact even when an input equals zero (the
reference documents this known defect at cuda/csrc/scan.cu:209-210).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _flags_from_packed_info(packed_info: jnp.ndarray, n: int) -> jnp.ndarray:
    """Segment-start flags from ``[chunk_start, chunk_cnt]`` rows.

    Assumes chunks are contiguous and cover the flattened array in order
    (the layout produced by :func:`nerfacc_tpu.pack.pack_info`).
    """
    starts = packed_info[:, 0]
    cnts = packed_info[:, 1]
    flags = jnp.zeros((n,), dtype=bool)
    # Only mark starts of non-empty chunks; empty chunks contribute nothing.
    safe_starts = jnp.where(cnts > 0, starts, n)  # out-of-range drops the update
    flags = flags.at[safe_starts].set(True, mode="drop")
    return flags


def _flags_from_indices(indices: jnp.ndarray) -> jnp.ndarray:
    n = indices.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    prev = jnp.concatenate([indices[:1] - 1, indices[:-1]])
    return indices != prev


def _segmented_scan(vals: jnp.ndarray, flags: jnp.ndarray, op: str) -> jnp.ndarray:
    """Inclusive segmented scan along a flat array.

    Classic segmented-scan operator: carry ``(flag, val)`` pairs where the
    combine resets the accumulation at segment boundaries.  Associative, so it
    maps onto ``lax.associative_scan`` (log-depth, vectorized on TPU).
    """
    if op == "sum":
        binop = jnp.add
    elif op == "prod":
        binop = jnp.multiply
    else:  # pragma: no cover
        raise ValueError(op)

    def combine(a, b):
        a_flag, a_val = a
        b_flag, b_val = b
        val = jnp.where(b_flag, b_val, binop(a_val, b_val))
        return (a_flag | b_flag, val)

    _, out = jax.lax.associative_scan(combine, (flags, vals))
    return out


def _exclusive_from_inclusive(
    inclusive: jnp.ndarray, vals: jnp.ndarray, flags: jnp.ndarray, identity: float
) -> jnp.ndarray:
    n = inclusive.shape[0]
    if n == 0:
        return inclusive
    shifted = jnp.concatenate(
        [jnp.full((1,), identity, dtype=inclusive.dtype), inclusive[:-1]]
    )
    return jnp.where(flags, jnp.asarray(identity, dtype=inclusive.dtype), shifted)


def _dispatch(
    inputs: jnp.ndarray,
    packed_info: Optional[jnp.ndarray],
    indices: Optional[jnp.ndarray],
    op: str,
    exclusive: bool,
) -> jnp.ndarray:
    if indices is not None and packed_info is not None:
        raise ValueError("Only one of `indices` and `packed_info` can be specified.")
    identity = 0.0 if op == "sum" else 1.0

    if indices is None and packed_info is None:
        # Batched scan on the last dimension.
        if exclusive:
            pad = (
                jnp.zeros_like(inputs[..., :1])
                if op == "sum"
                else jnp.ones_like(inputs[..., :1])
            )
            shifted = jnp.concatenate([pad, inputs[..., :-1]], axis=-1)
            fn = jnp.cumsum if op == "sum" else jnp.cumprod
            return fn(shifted, axis=-1)
        fn = jnp.cumsum if op == "sum" else jnp.cumprod
        return fn(inputs, axis=-1)

    assert inputs.ndim == 1, "inputs must be flattened."
    if indices is not None:
        assert indices.shape == inputs.shape, (
            "indices must be 1-D with the same shape as inputs."
        )
        flags = _flags_from_indices(indices)
    else:
        assert packed_info.ndim == 2 and packed_info.shape[-1] == 2, (
            "packed_info must be 2-D with shape (B, 2)."
        )
        flags = _flags_from_packed_info(packed_info, inputs.shape[0])

    inclusive = _segmented_scan(inputs, flags, op)
    if exclusive:
        return _exclusive_from_inclusive(inclusive, inputs, flags, identity)
    return inclusive


def _normalize_by_segment_total(
    out: jnp.ndarray,
    inputs: jnp.ndarray,
    packed_info: Optional[jnp.ndarray],
    indices: Optional[jnp.ndarray],
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Divide each element by its segment's total — the reference kernels'
    ``normalize`` option (cuda/csrc/include/utils_scan.cuh:101-110; never
    reached from the reference's Python, exposed here for completeness)."""
    if indices is None and packed_info is None:
        total = jnp.sum(inputs, axis=-1, keepdims=True)
        return out / jnp.where(jnp.abs(total) > eps, total, 1.0)
    incl = _dispatch(inputs, packed_info, indices, "sum", exclusive=False)
    if indices is not None:
        flags = _flags_from_indices(indices)
    else:
        flags = _flags_from_packed_info(packed_info, inputs.shape[0])
    # spread each segment's total (its last inclusive value) across the
    # segment: scatter end values by segment ordinal, gather back per element
    n = inputs.shape[0]
    is_end = jnp.concatenate([flags[1:], jnp.ones((1,), bool)])
    segment_id = jnp.cumsum(flags.astype(jnp.int32)) - 1
    totals_by_seg = (
        jnp.zeros((n,), out.dtype)
        .at[jnp.where(is_end, segment_id, n)]
        .set(incl, mode="drop")
    )
    total = jnp.take(totals_by_seg, jnp.clip(segment_id, 0, n - 1))
    return out / jnp.where(jnp.abs(total) > eps, total, 1.0)


def inclusive_sum(
    inputs: jnp.ndarray,
    packed_info: Optional[jnp.ndarray] = None,
    indices: Optional[jnp.ndarray] = None,
    normalize: bool = False,
) -> jnp.ndarray:
    """Inclusive sum that supports flattened tensors.

    ``normalize=True`` divides every element by its segment's total (the
    reference CUDA kernels' option, utils_scan.cuh:101-110).

    Equivalent to ``jnp.cumsum(inputs, axis=-1)`` for batched inputs; for a
    flattened tensor, segments are given by ``packed_info`` or ``indices``
    (reference: nerfacc/scan.py:14-77).

    Example::

        >>> inputs = jnp.array([1., 2., 3., 4., 5., 6., 7., 8., 9.])
        >>> packed_info = jnp.array([[0, 2], [2, 3], [5, 4]])
        >>> inclusive_sum(inputs, packed_info)
        [ 1.,  3.,  3.,  7., 12.,  6., 13., 21., 30.]
    """
    out = _dispatch(inputs, packed_info, indices, "sum", exclusive=False)
    if normalize:
        out = _normalize_by_segment_total(out, inputs, packed_info, indices)
    return out


def exclusive_sum(
    inputs: jnp.ndarray,
    packed_info: Optional[jnp.ndarray] = None,
    indices: Optional[jnp.ndarray] = None,
    normalize: bool = False,
) -> jnp.ndarray:
    """Exclusive sum that supports flattened tensors.

    ``normalize=True`` divides by the segment total (see inclusive_sum).

    (reference: nerfacc/scan.py:80-145)

    Example::

        >>> exclusive_sum(inputs, packed_info)
        [ 0.,  1.,  0.,  3.,  7.,  0.,  6., 13., 21.]
    """
    out = _dispatch(inputs, packed_info, indices, "sum", exclusive=True)
    if normalize:
        out = _normalize_by_segment_total(out, inputs, packed_info, indices)
    return out


def inclusive_prod(
    inputs: jnp.ndarray,
    packed_info: Optional[jnp.ndarray] = None,
    indices: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inclusive product that supports flattened tensors.

    (reference: nerfacc/scan.py:148-211)

    Example::

        >>> inclusive_prod(inputs, packed_info)
        [1., 2., 3., 12., 60., 6., 42., 336., 3024.]
    """
    return _dispatch(inputs, packed_info, indices, "prod", exclusive=False)


def exclusive_prod(
    inputs: jnp.ndarray,
    packed_info: Optional[jnp.ndarray] = None,
    indices: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exclusive product that supports flattened tensors.

    (reference: nerfacc/scan.py:214-282)

    Example::

        >>> exclusive_prod(inputs, packed_info)
        [1., 1., 1., 3., 12., 1., 6., 42., 336.]
    """
    return _dispatch(inputs, packed_info, indices, "prod", exclusive=True)
