"""Regularization losses (reference: nerfacc/losses.py)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .scan import exclusive_sum
from .volrend import accumulate_along_rays


def distortion(
    weights: jnp.ndarray,
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    ray_indices: jnp.ndarray,
    n_rays: int,
    masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mip-NeRF 360 distortion regularization (reference: nerfacc/losses.py:7-41).

    Args:
        weights: (n_samples,) flattened rendering weights.
        t_starts / t_ends: (n_samples,) sample bounds.
        ray_indices: (n_samples,) ray ids.
        n_rays: total number of rays.
        masks: optional validity mask for padded inputs.

    Returns:
        (n_rays, 1) per-ray distortion loss.
    """
    assert weights.shape == t_starts.shape == t_ends.shape == ray_indices.shape
    if masks is not None:
        weights = jnp.where(masks, weights, 0.0)
    t_mids = 0.5 * (t_starts + t_ends)
    t_deltas = t_ends - t_starts
    loss_uni = (1 / 3) * (t_deltas * weights**2)
    loss_bi_0 = weights * t_mids * exclusive_sum(weights, indices=ray_indices)
    loss_bi_1 = weights * exclusive_sum(weights * t_mids, indices=ray_indices)
    loss_bi = 2 * (loss_bi_0 - loss_bi_1)
    loss = loss_uni + loss_bi
    return accumulate_along_rays(loss, None, ray_indices, n_rays)
