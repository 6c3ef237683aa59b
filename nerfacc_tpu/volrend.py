"""Differentiable volume rendering ops.

TPU-native analog of the reference's volume-rendering layer
(reference: nerfacc/volrend.py).  All ops support both the batched/padded
``(n_rays, n_samples)`` layout (the TPU fast path — everything stays
static-shape and fuses into a handful of XLA ops) and the flattened
``(all_samples,)`` layout with ``ray_indices``/``packed_info`` for API
fidelity with the reference.

Padded-layout extension: every op accepts an optional boolean ``masks`` with
the same shape as the sample tensor.  Masked-out (padding) samples behave as
if absent: they contribute alpha=0 / weight=0 and do not advance the
transmittance.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .pack import pack_info  # noqa: F401  (re-exported for API parity)
from .scan import exclusive_prod, exclusive_sum


def _apply_mask(x: jnp.ndarray, masks: Optional[jnp.ndarray], fill: float):
    if masks is None:
        return x
    return jnp.where(masks, x, jnp.asarray(fill, dtype=x.dtype))


def render_transmittance_from_alpha(
    alphas: jnp.ndarray,
    packed_info: Optional[jnp.ndarray] = None,
    ray_indices: Optional[jnp.ndarray] = None,
    n_rays: Optional[int] = None,
    prefix_trans: Optional[jnp.ndarray] = None,
    masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Transmittance ``T_i = prod_{j<i}(1 - alpha_j)`` from alpha.

    (reference: nerfacc/volrend.py:167-216)

    Example::

        >>> alphas = jnp.array([0.4, 0.8, 0.1, 0.8, 0.1, 0.0, 0.9])
        >>> ray_indices = jnp.array([0, 0, 0, 1, 1, 2, 2])
        >>> render_transmittance_from_alpha(alphas, ray_indices=ray_indices)
        [1.0, 0.6, 0.12, 1.0, 0.2, 1.0, 1.0]
    """
    alphas = _apply_mask(alphas, masks, 0.0)
    trans = exclusive_prod(
        1.0 - alphas, packed_info=packed_info, indices=ray_indices
    )
    if prefix_trans is not None:
        trans = trans * prefix_trans
    return trans


def render_transmittance_from_density(
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    sigmas: jnp.ndarray,
    packed_info: Optional[jnp.ndarray] = None,
    ray_indices: Optional[jnp.ndarray] = None,
    n_rays: Optional[int] = None,
    prefix_trans: Optional[jnp.ndarray] = None,
    masks: Optional[jnp.ndarray] = None,
    indices_sorted: bool = False,
    seg_starts: Optional[jnp.ndarray] = None,
    seg_ends: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transmittance ``T_i = exp(-sum_{j<i} sigma_j * delta_j)`` and alphas.

    (reference: nerfacc/volrend.py:219-278)

    Example::

        >>> t_starts = jnp.array([0., 1., 2., 3., 4., 5., 6.])
        >>> t_ends = jnp.array([1., 2., 3., 4., 5., 6., 7.])
        >>> sigmas = jnp.array([0.4, 0.8, 0.1, 0.8, 0.1, 0.0, 0.9])
        >>> ray_indices = jnp.array([0, 0, 0, 1, 1, 2, 2])
        >>> trans, alphas = render_transmittance_from_density(
        ...     t_starts, t_ends, sigmas, ray_indices=ray_indices)
        trans:  [1.00, 0.67, 0.30, 1.00, 0.45, 1.00, 1.00]
        alphas: [0.33, 0.55, 0.095, 0.55, 0.095, 0.00, 0.59]
    """
    sigmas_dt = sigmas * (t_ends - t_starts)
    sigmas_dt = _apply_mask(sigmas_dt, masks, 0.0)
    # Saturate the per-sample optical depth.  Observably exact: at 40,
    # alpha = 1 - 4e-18 and every later sample's transmittance is 0 to f32,
    # and the true gradient (exp(-x)) is already ~0 there.  Load-bearing for
    # numerics: the segmented exclusive sum below rides ONE GLOBAL f32
    # cumsum whose rounding error scales with the global running magnitude —
    # uncapped hard-surface densities (trunc_exp admits 1e13; sigma*dt
    # ~5e10/sample) push that error to O(1)..O(1e8), producing trans > 1 /
    # negative exclusive sums and, downstream, weight sums past the prefix
    # (measured: the round-5 opaque eval break, scripts/diag_eval_break.py
    # — 16 pixels at -74 from compounding prefix oscillation).
    sigmas_dt = jnp.minimum(sigmas_dt, 40.0)
    alphas = 1.0 - jnp.exp(-sigmas_dt)
    if indices_sorted and ray_indices is not None and n_rays is not None:
        # Sorted flat layout (compacted buffers): scatter/reverse-free
        # segmented sum with a custom VJP — ~50x cheaper fwd+bwd on TPU
        # than the associative-scan path (see ops/sorted_segments.py).
        from .ops.sorted_segments import exclusive_sum_sorted

        # last positional flag: sigma * dt >= 0 (custom_vjp takes no kwargs)
        excl = exclusive_sum_sorted(
            sigmas_dt, ray_indices, n_rays, seg_starts, seg_ends, True
        )
        excl = _apply_mask(excl, masks, 0.0)  # fill slots hold garbage
    else:
        excl = exclusive_sum(
            sigmas_dt, packed_info=packed_info, indices=ray_indices
        )
    trans = jnp.exp(-excl)
    if prefix_trans is not None:
        trans = trans * prefix_trans
    return trans, alphas


def render_weight_from_alpha(
    alphas: jnp.ndarray,
    packed_info: Optional[jnp.ndarray] = None,
    ray_indices: Optional[jnp.ndarray] = None,
    n_rays: Optional[int] = None,
    prefix_trans: Optional[jnp.ndarray] = None,
    masks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rendering weights ``w_i = T_i * alpha_i`` from alpha.

    (reference: nerfacc/volrend.py:281-323)
    """
    alphas = _apply_mask(alphas, masks, 0.0)
    trans = render_transmittance_from_alpha(
        alphas, packed_info, ray_indices, n_rays, prefix_trans
    )
    weights = trans * alphas
    return weights, trans


def render_weight_from_density(
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    sigmas: jnp.ndarray,
    packed_info: Optional[jnp.ndarray] = None,
    ray_indices: Optional[jnp.ndarray] = None,
    n_rays: Optional[int] = None,
    prefix_trans: Optional[jnp.ndarray] = None,
    masks: Optional[jnp.ndarray] = None,
    indices_sorted: bool = False,
    seg_starts: Optional[jnp.ndarray] = None,
    seg_ends: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rendering weights from density (reference: nerfacc/volrend.py:326-376)."""
    trans, alphas = render_transmittance_from_density(
        t_starts,
        t_ends,
        sigmas,
        packed_info,
        ray_indices,
        n_rays,
        prefix_trans,
        masks,
        indices_sorted,
        seg_starts,
        seg_ends,
    )
    weights = trans * alphas
    return weights, trans, alphas


def render_visibility_from_alpha(
    alphas: jnp.ndarray,
    packed_info: Optional[jnp.ndarray] = None,
    ray_indices: Optional[jnp.ndarray] = None,
    n_rays: Optional[int] = None,
    early_stop_eps: float = 1e-4,
    alpha_thre: float = 0.0,
    prefix_trans: Optional[jnp.ndarray] = None,
    masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Visibility mask: ``T >= early_stop_eps`` and ``alpha >= alpha_thre``.

    (reference: nerfacc/volrend.py:379-432).  Not differentiable.
    """
    alphas = jax.lax.stop_gradient(_apply_mask(alphas, masks, 0.0))
    trans = render_transmittance_from_alpha(
        alphas, packed_info, ray_indices, n_rays, prefix_trans
    )
    vis = trans >= early_stop_eps
    vis = jnp.where(alpha_thre > 0, vis & (alphas >= alpha_thre), vis)
    if masks is not None:
        vis = vis & masks
    return vis


def render_visibility_from_density(
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    sigmas: jnp.ndarray,
    packed_info: Optional[jnp.ndarray] = None,
    ray_indices: Optional[jnp.ndarray] = None,
    n_rays: Optional[int] = None,
    early_stop_eps: float = 1e-4,
    alpha_thre: float = 0.0,
    prefix_trans: Optional[jnp.ndarray] = None,
    masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Visibility mask computed from densities.

    (reference: nerfacc/volrend.py:435-494).  Not differentiable.
    """
    sigmas = jax.lax.stop_gradient(sigmas)
    trans, alphas = render_transmittance_from_density(
        t_starts, t_ends, sigmas, packed_info, ray_indices, n_rays, prefix_trans, masks
    )
    vis = trans >= early_stop_eps
    vis = jnp.where(alpha_thre > 0, vis & (alphas >= alpha_thre), vis)
    if masks is not None:
        vis = vis & masks
    return vis


def _sorted_segment_sum(
    src: jnp.ndarray, ray_indices: jnp.ndarray, n_rays: int
) -> jnp.ndarray:
    """Segment sum for *sorted* segment ids, scatter-free.

    TPU scatters serialize; for sorted ids the same reduction (fwd and bwd)
    is one cumsum plus boundary gathers (ops/sorted_segments.py).
    """
    from .ops.sorted_segments import segment_sum_sorted

    return segment_sum_sorted(src, ray_indices, n_rays)


def accumulate_along_rays(
    weights: jnp.ndarray,
    values: Optional[jnp.ndarray] = None,
    ray_indices: Optional[jnp.ndarray] = None,
    n_rays: Optional[int] = None,
    masks: Optional[jnp.ndarray] = None,
    indices_sorted: bool = False,
) -> jnp.ndarray:
    """Accumulate ``sum_i w_i * v_i`` along each ray.

    Flattened layout scatters with ``segment_sum`` (the XLA analog of the
    reference's ``index_add_``, nerfacc/volrend.py:497-561), or — when the
    caller knows ``ray_indices`` is sorted (``indices_sorted=True``) — a
    scatter-free segmented-scan reduction; batched layout reduces over the
    sample axis.

    Returns:
        (n_rays, D) accumulated values (D=1 when ``values`` is None).
    """
    weights = _apply_mask(weights, masks, 0.0)
    if values is None:
        src = weights[..., None]
    else:
        assert values.ndim == weights.ndim + 1
        assert values.shape[:-1] == weights.shape
        src = weights[..., None] * values
    if ray_indices is not None:
        assert n_rays is not None, "n_rays must be provided"
        assert weights.ndim == 1, "weights must be flattened"
        if indices_sorted:
            return _sorted_segment_sum(src, ray_indices, n_rays)
        return jax.ops.segment_sum(src, ray_indices, num_segments=n_rays)
    return jnp.sum(src, axis=-2)


def accumulate_along_rays_(
    weights: jnp.ndarray,
    values: Optional[jnp.ndarray] = None,
    ray_indices: Optional[jnp.ndarray] = None,
    outputs: Optional[jnp.ndarray] = None,
    masks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Accumulate into an existing buffer and return the updated buffer.

    Functional analog of the reference's in-place ``accumulate_along_rays_``
    (nerfacc/volrend.py:564-587): JAX arrays are immutable, so the "in-place"
    contract becomes "add to ``outputs`` and return the new array".
    """
    n_rays = outputs.shape[0]
    delta = accumulate_along_rays(weights, values, ray_indices, n_rays, masks)
    if delta.shape[-1] != outputs.shape[-1] and values is None:
        delta = jnp.broadcast_to(delta, outputs.shape)
    return outputs + delta


def rendering(
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    ray_indices: Optional[jnp.ndarray] = None,
    n_rays: Optional[int] = None,
    rgb_sigma_fn: Optional[Callable] = None,
    rgb_alpha_fn: Optional[Callable] = None,
    render_bkgd: Optional[jnp.ndarray] = None,
    expected_depths: bool = True,
    masks: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict]:
    """Render rays through a radiance field defined by the user callback.

    Differentiable to the outputs of ``rgb_sigma_fn`` / ``rgb_alpha_fn`` (not
    to ``t_starts``/``t_ends``/``ray_indices``), matching the reference
    contract (nerfacc/volrend.py:15-164).

    The callbacks take ``(t_starts, t_ends, ray_indices)`` (``ray_indices`` is
    None in the batched layout) and return ``(rgbs (..., 3), sigmas (...))``
    or ``(rgbs, alphas)``.

    Returns:
        colors (n_rays, 3), opacities (n_rays, 1), depths (n_rays, 1) and a
        dict of extras ({weights, alphas, trans, [sigmas], rgbs}).
    """
    if ray_indices is not None:
        assert t_starts.shape == t_ends.shape == ray_indices.shape, (
            "t_starts, t_ends and ray_indices must have the same shape."
        )
    if rgb_sigma_fn is None and rgb_alpha_fn is None:
        raise ValueError(
            "At least one of `rgb_sigma_fn` and `rgb_alpha_fn` should be specified."
        )

    if rgb_sigma_fn is not None:
        rgbs, sigmas = rgb_sigma_fn(t_starts, t_ends, ray_indices)
        assert rgbs.shape[-1] == 3, f"rgbs must have 3 channels, got {rgbs.shape}"
        assert sigmas.shape == t_starts.shape, (
            f"sigmas must have shape of (N,)! Got {sigmas.shape}"
        )
        weights, trans, alphas = render_weight_from_density(
            t_starts, t_ends, sigmas,
            ray_indices=ray_indices, n_rays=n_rays, masks=masks,
        )
        extras = {
            "weights": weights,
            "alphas": alphas,
            "trans": trans,
            "sigmas": sigmas,
            "rgbs": rgbs,
        }
    else:
        rgbs, alphas = rgb_alpha_fn(t_starts, t_ends, ray_indices)
        assert rgbs.shape[-1] == 3, f"rgbs must have 3 channels, got {rgbs.shape}"
        assert alphas.shape == t_starts.shape, (
            f"alphas must have shape of (N,)! Got {alphas.shape}"
        )
        weights, trans = render_weight_from_alpha(
            alphas, ray_indices=ray_indices, n_rays=n_rays, masks=masks
        )
        extras = {
            "weights": weights,
            "trans": trans,
            "rgbs": rgbs,
            "alphas": alphas,
        }

    colors = accumulate_along_rays(
        weights, values=rgbs, ray_indices=ray_indices, n_rays=n_rays
    )
    opacities = accumulate_along_rays(
        weights, values=None, ray_indices=ray_indices, n_rays=n_rays
    )
    depths = accumulate_along_rays(
        weights,
        values=(t_starts + t_ends)[..., None] / 2.0,
        ray_indices=ray_indices,
        n_rays=n_rays,
    )
    if expected_depths:
        eps = jnp.finfo(rgbs.dtype).eps
        depths = depths / jnp.clip(opacities, min=eps)

    if render_bkgd is not None:
        colors = colors + render_bkgd * (1.0 - opacities)

    return colors, opacities, depths, extras
