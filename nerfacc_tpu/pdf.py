"""PDF ops: per-ray searchsorted and inverse-transform importance sampling.

TPU-native analog of the reference's CUDA PDF kernels
(reference: nerfacc/pdf.py, cuda/csrc/pdf.cu).  The batched layout (the one
the proposal-network estimator actually uses, prop_net.py:96-120) is pure
vectorized XLA: ``cumsum -> searchsorted -> lerp``.  The flattened layout is a
vectorized binary search with per-query segment bounds — a fixed 32-step
``fori_loop``, no divergence.

Stratified jitter uses explicit ``jax.random`` keys (single jitter per ray),
replacing the reference's implicit global Philox generator (pdf.cu:133-145).
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .data_specs import RayIntervals, RaySamples


def _upper_bound(
    data: jnp.ndarray,
    base: jnp.ndarray,
    last: jnp.ndarray,
    values: jnp.ndarray,
) -> jnp.ndarray:
    """Vectorized ``upper_bound`` over per-query ranges ``[base, last)``.

    Matches pdf.cu:44-63: first index ``p`` in ``[base, last)`` with
    ``data[p] > value`` (returns ``last`` if none).  Fixed-trip binary search
    so every query runs in lockstep on the VPU.
    """
    lo = jnp.broadcast_to(base, values.shape).astype(jnp.int32)
    hi = jnp.broadcast_to(last, values.shape).astype(jnp.int32)

    # ceil(log2(max_range)) iterations; 32 covers any int32 range.
    def body(_, carry):
        lo, hi = carry
        active = lo < hi
        mid = lo + (hi - lo) // 2
        mid_val = jnp.take(data, jnp.clip(mid, 0, data.shape[0] - 1))
        greater = mid_val > values
        lo = jnp.where(active & ~greater, mid + 1, lo)
        hi = jnp.where(active & greater, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return lo


def _segment_bounds(
    spec: Union[RayIntervals, RaySamples], ray_ids: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query (base, last) index range of the key segments."""
    starts = spec.packed_info[:, 0]
    cnts = spec.packed_info[:, 1]
    base = jnp.take(starts, ray_ids)
    last = base + jnp.take(cnts, ray_ids) - 1
    return base, last


def _query_ray_ids(
    spec: Union[RayIntervals, RaySamples]
) -> jnp.ndarray:
    if spec.ray_indices is not None:
        return spec.ray_indices
    # Recover ray id from packed_info by binary search over chunk starts
    # (pdf.cu:65-80).
    starts = spec.packed_info[:, 0]
    n = spec.vals.shape[0]
    ids = jnp.searchsorted(starts, jnp.arange(n), side="right") - 1
    return ids.astype(jnp.int32)


def searchsorted(
    sorted_sequence: Union[RayIntervals, RaySamples],
    values: Union[RayIntervals, RaySamples],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray searchsorted with "right" bound semantics.

    Returns ``(ids_left, ids_right)`` such that
    ``key.vals[ids_left] <= query < key.vals[ids_right]`` with out-of-range
    queries clamped into each ray's own span
    (reference: nerfacc/pdf.py:13-62, pdf.cu:244-286).

    Flattened ids are global offsets; batched ids are per-row.

    Example::

        >>> key = RayIntervals(vals=jnp.array([0., 1., 0., 1., 2.]),
        ...                    packed_info=jnp.array([[0, 2], [2, 3]]))
        >>> query = RayIntervals(vals=jnp.array([0.5, 1.5, 2.5]),
        ...                      packed_info=jnp.array([[0, 1], [1, 2]]))
        >>> searchsorted(key, query)
        ([0, 3, 3], [1, 4, 4])
    """
    q_vals = values.vals
    k_vals = sorted_sequence.vals

    if q_vals.ndim > 1:  # batched query
        assert k_vals.ndim > 1
        n_rows, _ = q_vals.shape
        k_edges = k_vals.shape[-1]
        flat_q = q_vals.reshape(-1)
        row_ids = jnp.repeat(
            jnp.arange(n_rows, dtype=jnp.int32), q_vals.shape[-1]
        )
        base = row_ids * k_edges
        last = base + k_edges - 1
        p = _upper_bound(k_vals.reshape(-1), base, last, flat_q)
        ids_left = jnp.clip(p - 1, base, last) - base
        ids_right = jnp.clip(p, base, last) - base
        return (
            ids_left.reshape(q_vals.shape),
            ids_right.reshape(q_vals.shape),
        )

    ray_ids = _query_ray_ids(values)
    if k_vals.ndim > 1:
        k_edges = k_vals.shape[-1]
        base = ray_ids * k_edges
        last = base + k_edges - 1
        k_flat = k_vals.reshape(-1)
    else:
        base, last = _segment_bounds(sorted_sequence, ray_ids)
        k_flat = k_vals
    p = _upper_bound(k_flat, base, last, q_vals)
    ids_left = jnp.clip(p - 1, base, last)
    ids_right = jnp.clip(p, base, last)
    return ids_left, ids_right


def importance_sampling(
    intervals: RayIntervals,
    cdfs: jnp.ndarray,
    n_intervals_per_ray,
    stratified: bool = False,
    key: Optional[jax.Array] = None,
    max_intervals_per_ray: Optional[int] = None,
) -> Tuple[RayIntervals, RaySamples]:
    """Inverse-transform sampling of per-ray CDFs (batched layout).

    Given interval edges and CDF values at the edges, draws
    ``n_intervals_per_ray`` samples per ray at uniform CDF positions
    ``u = u_floor + (sid + bias) * u_step`` (bias 0.5 deterministic, or one
    uniform draw per ray when stratified), inverse-lerps them through the CDF,
    and builds new interval edges at sample midpoints clamped to the input
    span (reference: nerfacc/pdf.py:65-131, pdf.cu:98-241, 358-421).

    Args:
        intervals: batched ``RayIntervals`` with ``vals (n_rays, n_edges)``.
        cdfs: (n_rays, n_edges) CDF at the edges.
        n_intervals_per_ray: static sample count per ray.
        stratified: jitter the CDF positions (requires ``key``).
        key: ``jax.random`` key for stratified jitter.

    Returns:
        intervals (n_rays, n+1) and samples (n_rays, n), batched.

    Example::

        >>> intervals = RayIntervals(vals=jnp.array([[0., 1.], [0., 2.]]))
        >>> cdfs = jnp.array([[0., 0.5], [0., 1.]])
        >>> iv, s = importance_sampling(intervals, cdfs, 2)
    """
    if not isinstance(n_intervals_per_ray, int):
        return _importance_sampling_varying(
            intervals,
            cdfs,
            jnp.asarray(n_intervals_per_ray),
            stratified,
            key,
            max_intervals_per_ray,
        )
    vals = intervals.vals
    assert vals.ndim == 2, (
        "pass a per-ray n_intervals_per_ray array for flattened inputs"
    )
    n_rays, n_edges = vals.shape
    n = n_intervals_per_ray

    u_floor = cdfs[:, :1]
    u_ceil = cdfs[:, -1:]
    u_step = (u_ceil - u_floor) / n

    if stratified:
        assert key is not None, "stratified sampling requires a PRNG key"
        bias = jax.random.uniform(key, (n_rays, 1), dtype=cdfs.dtype)
    else:
        bias = jnp.full((n_rays, 1), 0.5, dtype=cdfs.dtype)

    sid = jnp.arange(n, dtype=cdfs.dtype)[None, :]
    u = u_floor + (sid + bias) * u_step  # (n_rays, n)

    # upper_bound over the first n_edges-1 edges of each row (pdf.cu:147-151).
    flat_u = u.reshape(-1)
    row_ids = jnp.repeat(jnp.arange(n_rays, dtype=jnp.int32), n)
    base = row_ids * n_edges
    last = base + n_edges - 1
    p = _upper_bound(cdfs.reshape(-1), base, last, flat_u)
    p0 = jnp.clip(p - 1, base, last)
    p1 = jnp.clip(p, base, last)

    cdfs_flat = cdfs.reshape(-1)
    vals_flat = vals.reshape(-1)
    u_lower = jnp.take(cdfs_flat, p0)
    u_upper = jnp.take(cdfs_flat, p1)
    t_lower = jnp.take(vals_flat, p0)
    t_upper = jnp.take(vals_flat, p1)

    denom = u_upper - u_lower
    mid = 0.5 * (t_lower + t_upper)
    lerped = (flat_u - u_lower) * (t_upper - t_lower) / jnp.where(
        denom < 1e-10, 1.0, denom
    ) + t_lower
    t = jnp.where(denom < 1e-10, mid, lerped)
    samples_vals = t.reshape(n_rays, n)

    # Build interval edges at midpoints of consecutive samples, clamped to
    # the input span (pdf.cu:169-241).
    t_min = vals[:, :1]
    t_max = vals[:, -1:]
    if n > 1:
        inner = 0.5 * (samples_vals[:, 1:] + samples_vals[:, :-1])
        first = jnp.maximum(
            samples_vals[:, :1]
            - 0.5 * (samples_vals[:, 1:2] - samples_vals[:, :1]),
            t_min,
        )
        lastv = jnp.minimum(
            samples_vals[:, -1:]
            + 0.5 * (samples_vals[:, -1:] - samples_vals[:, -2:-1]),
            t_max,
        )
        edges = jnp.concatenate([first, inner, lastv], axis=-1)
    else:
        edges = jnp.concatenate([t_min, t_max], axis=-1)

    return RayIntervals(vals=edges), RaySamples(vals=samples_vals)


def _importance_sampling_varying(
    intervals: RayIntervals,
    cdfs: jnp.ndarray,
    n_per_ray: jnp.ndarray,
    stratified: bool,
    key: Optional[jax.Array],
    max_n: Optional[int],
) -> Tuple[RayIntervals, RaySamples]:
    """Per-ray sample counts (the reference's tensor overload,
    pdf.cu:294-355).  TPU formulation: padded ``(n_rays, max_n)`` outputs
    with validity masks instead of exact-size packed buffers; sample ``sid``
    of ray ``r`` is valid iff ``sid < n_per_ray[r]``.

    Accepts flattened (``packed_info``) or batched interval inputs.
    """
    n_rays = n_per_ray.shape[0]
    if max_n is None:
        max_n = int(n_per_ray.max())  # requires concrete values
    vals = intervals.vals

    if vals.ndim == 2:
        n_edges = vals.shape[-1]
        base = jnp.arange(n_rays, dtype=jnp.int32) * n_edges
        last = base + n_edges - 1
        flat_vals = vals.reshape(-1)
        flat_cdfs = cdfs.reshape(-1)
    else:
        starts = intervals.packed_info[:, 0].astype(jnp.int32)
        cnts = intervals.packed_info[:, 1].astype(jnp.int32)
        base = starts
        last = starts + jnp.maximum(cnts, 1) - 1
        flat_vals = vals
        flat_cdfs = cdfs.reshape(-1)

    u_floor = jnp.take(flat_cdfs, base)  # (n_rays,)
    u_ceil = jnp.take(flat_cdfs, last)
    safe_n = jnp.maximum(n_per_ray, 1).astype(flat_cdfs.dtype)
    u_step = (u_ceil - u_floor) / safe_n

    if stratified:
        assert key is not None, "stratified sampling requires a PRNG key"
        bias = jax.random.uniform(key, (n_rays, 1), dtype=flat_cdfs.dtype)
    else:
        bias = jnp.full((n_rays, 1), 0.5, dtype=flat_cdfs.dtype)

    sid = jnp.arange(max_n, dtype=flat_cdfs.dtype)[None, :]
    u = u_floor[:, None] + (sid + bias) * u_step[:, None]  # (n_rays, max_n)

    flat_u = u.reshape(-1)
    base_b = jnp.repeat(base, max_n)
    last_b = jnp.repeat(last, max_n)
    p = _upper_bound(flat_cdfs, base_b, last_b, flat_u)
    p0 = jnp.clip(p - 1, base_b, last_b)
    p1 = jnp.clip(p, base_b, last_b)

    u_lower = jnp.take(flat_cdfs, p0)
    u_upper = jnp.take(flat_cdfs, p1)
    t_lower = jnp.take(flat_vals, p0)
    t_upper = jnp.take(flat_vals, p1)
    denom = u_upper - u_lower
    mid = 0.5 * (t_lower + t_upper)
    lerped = (flat_u - u_lower) * (t_upper - t_lower) / jnp.where(
        denom < 1e-10, 1.0, denom
    ) + t_lower
    t = jnp.where(denom < 1e-10, mid, lerped).reshape(n_rays, max_n)

    sample_valid = jnp.arange(max_n)[None, :] < n_per_ray[:, None]

    t_min = jnp.take(flat_vals, base)[:, None]
    t_max = jnp.take(flat_vals, last)[:, None]
    if max_n > 1:
        inner = 0.5 * (t[:, 1:] + t[:, :-1])
        first = jnp.maximum(t[:, :1] - 0.5 * (t[:, 1:2] - t[:, :1]), t_min)
        # per-ray last sample index varies: the closing edge sits after
        # sample n_r - 1; build all edges then mask
        lastv = jnp.minimum(
            t[:, -1:] + 0.5 * (t[:, -1:] - t[:, -2:-1]), t_max
        )
        edges = jnp.concatenate([first, inner, lastv], axis=-1)
    else:
        edges = jnp.concatenate([t_min, t_max], axis=-1)
    edge_valid = jnp.arange(max_n + 1)[None, :] <= n_per_ray[:, None]
    is_left = edge_valid & (jnp.arange(max_n + 1)[None, :] < n_per_ray[:, None])
    is_right = edge_valid & (jnp.arange(max_n + 1)[None, :] > 0)

    return (
        RayIntervals(vals=edges, is_left=is_left, is_right=is_right),
        RaySamples(vals=t, is_valid=sample_valid),
    )


def _sample_from_weighted(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    stratified: bool = False,
    vmin: float = -jnp.inf,
    vmax: float = jnp.inf,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure reference resampler for testing (reference: nerfacc/pdf.py:134-219).

    Args:
        bins: (..., B + 1) interval edges.
        weights: (..., B).

    Returns:
        (samples (..., S + 1), centers (..., S)).
    """
    B = weights.shape[-1]
    S = num_samples
    assert bins.shape[-1] == B + 1
    eps = jnp.finfo(weights.dtype).eps

    pdf = weights / jnp.clip(
        jnp.sum(jnp.abs(weights), axis=-1, keepdims=True), min=eps
    )
    cdf = jnp.concatenate(
        [
            jnp.zeros_like(pdf[..., :1]),
            jnp.cumsum(pdf[..., :-1], axis=-1),
            jnp.ones_like(pdf[..., :1]),
        ],
        axis=-1,
    )

    if not stratified:
        pad = 1 / (2 * S)
        u = jnp.linspace(pad, 1 - pad - eps, S, dtype=bins.dtype)
        u = jnp.broadcast_to(u, bins.shape[:-1] + (S,))
    else:
        assert key is not None
        u_max = eps + (1 - eps) / S
        max_jitter = (1 - u_max) / (S - 1) - eps
        u = (
            jnp.linspace(0, 1 - u_max, S, dtype=bins.dtype)
            + jax.random.uniform(key, bins.shape[:-1] + (1,), dtype=bins.dtype)
            * max_jitter
        )

    ceil = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        cdf.reshape(-1, cdf.shape[-1]), u.reshape(-1, S)
    ).reshape(u.shape)
    floor = ceil - 1

    cdf0 = jnp.take_along_axis(cdf, floor, axis=-1)
    cdf1 = jnp.take_along_axis(cdf, ceil, axis=-1)
    b0 = jnp.take_along_axis(bins, floor, axis=-1)
    b1 = jnp.take_along_axis(bins, ceil, axis=-1)

    t = (u - cdf0) / jnp.clip(cdf1 - cdf0, min=eps)
    centers = b0 + t * (b1 - b0)

    samples = 0.5 * (centers[..., 1:] + centers[..., :-1])
    samples = jnp.concatenate(
        [
            jnp.clip(2 * centers[..., :1] - samples[..., :1], min=vmin),
            samples,
            jnp.clip(2 * centers[..., -1:] - samples[..., -1:], max=vmax),
        ],
        axis=-1,
    )
    return samples, centers
