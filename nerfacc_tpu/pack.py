"""Packing utilities (reference: nerfacc/pack.py:10-49)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def pack_info(ray_indices: jnp.ndarray, n_rays: Optional[int] = None) -> jnp.ndarray:
    """Convert per-sample ray indices to packed info ``[chunk_start, chunk_cnt]``.

    ``ray_indices`` must be sorted ascending (samples of the same ray are
    contiguous), matching the reference contract (nerfacc/pack.py:10-49).

    Args:
        ray_indices: (all_samples,) int ray id per sample.
        n_rays: number of rays; inferred as ``max(ray_indices)+1`` if None
            (requires a concrete array — pass explicitly under ``jit``).

    Returns:
        (n_rays, 2) int32 tensor of ``[chunk_start, chunk_cnt]``.
    """
    assert ray_indices.ndim == 1, "ray_indices must be a 1-D tensor."
    if n_rays is None:
        n_rays = int(ray_indices.max()) + 1 if ray_indices.size > 0 else 0
    chunk_cnts = jnp.bincount(ray_indices, length=n_rays)
    chunk_starts = jnp.cumsum(chunk_cnts) - chunk_cnts
    return jnp.stack([chunk_starts, chunk_cnts], axis=-1).astype(jnp.int32)
