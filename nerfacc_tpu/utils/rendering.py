"""Render-loop helpers: sample compaction and occgrid ray rendering.

TPU-native analog of the reference's example render loops
(reference: examples/utils.py:54-439).  The padded traversal output is
compacted into a fixed-size flat sample buffer (static shapes for XLA) so the
radiance field only evaluates real samples — the TPU equivalent of the
reference's exact-size packed buffers.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..grid import TraversalResult
from ..volrend import (
    accumulate_along_rays,
    render_weight_from_density,
)


class CompactSamples(NamedTuple):
    """Fixed-budget flat sample buffer.

    Attributes:
        ray_indices: (budget,) int32 ray id per slot (0 for empty slots).
        t_starts / t_ends: (budget,) sample bounds (0 for empty slots).
        valid: (budget,) slot holds a real sample.
        num_valid: () total real samples (<= budget; samples past the budget
            are dropped).
        overflow: () number of dropped samples (for the dynamic batch-size
            controller).
    """

    ray_indices: jnp.ndarray
    t_starts: jnp.ndarray
    t_ends: jnp.ndarray
    valid: jnp.ndarray
    num_valid: jnp.ndarray
    overflow: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("budget",))
def compact_samples(res: TraversalResult, budget: int) -> CompactSamples:
    """Scatter valid padded samples into a flat fixed-size buffer, preserving
    (ray, sample) order — the static-shape analog of the reference's packed
    layout (reference: cuda/csrc/grid.cu:405-471 exact two-pass alloc)."""
    n_rays, K = res.valid.shape
    flat_valid = res.valid.reshape(-1)
    pos = jnp.cumsum(flat_valid.astype(jnp.int32)) - flat_valid.astype(jnp.int32)
    keep = flat_valid & (pos < budget)
    slot = jnp.where(keep, pos, budget)  # out-of-range slots are dropped

    ray_ids = (
        jnp.arange(n_rays * K, dtype=jnp.int32) // K
    )
    t0 = res.t_starts.reshape(-1)
    t1 = res.t_ends.reshape(-1)

    out_ray = jnp.zeros((budget,), jnp.int32).at[slot].set(
        ray_ids, mode="drop"
    )
    out_t0 = jnp.zeros((budget,), t0.dtype).at[slot].set(t0, mode="drop")
    out_t1 = jnp.zeros((budget,), t1.dtype).at[slot].set(t1, mode="drop")
    total = jnp.sum(flat_valid.astype(jnp.int32))
    num_valid = jnp.minimum(total, budget)
    valid = jnp.arange(budget, dtype=jnp.int32) < num_valid
    return CompactSamples(
        out_ray, out_t0, out_t1, valid, num_valid, total - num_valid
    )


def render_rays_with_occgrid(
    rgb_sigma_fn: Callable,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    samples: CompactSamples,
    render_bkgd: Optional[jnp.ndarray] = None,
    expected_depths: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Differentiable composite of a compacted sample buffer.

    Args:
        rgb_sigma_fn: ``(positions (N,3), dirs (N,3)) -> (rgbs (N,3),
            sigmas (N,))`` evaluated only on the flat budget buffer.
        rays_o / rays_d: (n_rays, 3).
        samples: a :class:`CompactSamples`.

    Returns:
        colors (n_rays, 3), opacities (n_rays, 1), depths (n_rays, 1), extras.
    """
    n_rays = rays_o.shape[0]
    t_mid = 0.5 * (samples.t_starts + samples.t_ends)
    o = jnp.take(rays_o, samples.ray_indices, axis=0)
    d = jnp.take(rays_d, samples.ray_indices, axis=0)
    positions = o + t_mid[:, None] * d

    rgbs, sigmas = rgb_sigma_fn(positions, d)

    weights, trans, alphas = render_weight_from_density(
        samples.t_starts,
        samples.t_ends,
        sigmas,
        ray_indices=samples.ray_indices,
        n_rays=n_rays,
        masks=samples.valid,
    )
    colors = accumulate_along_rays(
        weights, rgbs, samples.ray_indices, n_rays
    )
    opacities = accumulate_along_rays(
        weights, None, samples.ray_indices, n_rays
    )
    depths = accumulate_along_rays(
        weights, t_mid[:, None], samples.ray_indices, n_rays
    )
    if expected_depths:
        depths = depths / jnp.clip(opacities, min=jnp.finfo(colors.dtype).eps)
    if render_bkgd is not None:
        colors = colors + render_bkgd * (1.0 - opacities)
    extras = {
        "weights": weights,
        "trans": trans,
        "alphas": alphas,
        "sigmas": sigmas,
        "rgbs": rgbs,
        "n_rendering_samples": samples.num_valid,
    }
    return colors, opacities, depths, extras


def render_image_with_occgrid(
    field_fn: Callable,
    occ_state,
    rays_o,
    rays_d,
    render_bkgd=None,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    render_step_size: float = 5e-3,
    cone_angle: float = 0.0,
    alpha_thre: float = 0.0,
    early_stop_eps: float = 1e-4,
    max_samples: int = 1024,
    chunk: int = 8192,
    sample_budget: int = 2**18,
):
    """Chunked full-image rendering (reference: examples/utils.py:54-167).

    Args:
        field_fn: ``(positions, dirs) -> (rgbs, sigmas)``.
        occ_state: :class:`OccGridState`.
        rays_o / rays_d: (n_pixels, 3) flattened image rays.

    Returns:
        (colors, opacities, depths) stacked over all pixels.
    """
    import numpy as np

    from ..estimators.occ_grid import sampling_padded

    @jax.jit
    def _render_chunk(occ_state, o, d, bkgd):
        res = sampling_padded(
            occ_state,
            o,
            d,
            near_plane=near_plane,
            far_plane=far_plane,
            render_step_size=render_step_size,
            cone_angle=cone_angle,
            alpha_thre=alpha_thre,
            early_stop_eps=early_stop_eps,
            max_samples=max_samples,
        )
        samples = compact_samples(res, sample_budget)
        colors, opacities, depths, _ = render_rays_with_occgrid(
            field_fn, o, d, samples, render_bkgd=bkgd
        )
        return colors, opacities, depths

    n = rays_o.shape[0]
    outs = []
    for s in range(0, n, chunk):
        o = rays_o[s : s + chunk]
        d = rays_d[s : s + chunk]
        pad = chunk - o.shape[0]
        if pad > 0:
            o = jnp.pad(o, ((0, pad), (0, 0)), constant_values=1e8)
            d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        c, a, dep = _render_chunk(occ_state, o, d, render_bkgd)
        if pad > 0:
            c, a, dep = c[:-pad], a[:-pad], dep[:-pad]
        outs.append((np.asarray(c), np.asarray(a), np.asarray(dep)))
    colors = np.concatenate([o[0] for o in outs])
    opacities = np.concatenate([o[1] for o in outs])
    depths = np.concatenate([o[2] for o in outs])
    return colors, opacities, depths
