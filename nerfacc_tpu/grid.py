"""Ray-AABB intersection and multi-level occupancy-grid traversal.

TPU-native redesign of the reference's CUDA DDA traversal
(reference: nerfacc/grid.py:13-237, cuda/csrc/grid.cu:23-519,
cuda/csrc/include/utils_grid.cuh:10-142).

Key insight that replaces the sequential per-ray DDA with a fully-parallel
formulation: when ``step_size > 0``, the reference kernel only ever advances
its marching variable by ``dt = clamp(t * cone_angle, step_size, 1e10)``
(grid.cu:23-28, 157-162, 199-204, 213-216) — both when skipping empty space
and when emitting samples.  The marching therefore follows the *deterministic
orbit* ``t_{k+1} = t_k + dt(t_k)`` starting at the near plane, and occupancy
only decides **which** lattice points are emitted.  A lattice point ``k`` is
emitted iff its midpoint ``m_k = (t_k + t_{k+1}) / 2`` falls (a) inside a
valid grid segment of the sorted ray/grid-intersection event list
(grid.cu:129-151) and (b) inside an occupied voxel of that segment's grid
level (grid.cu:184-261).

So instead of a divergent while-loop per ray we evaluate **all candidates in
parallel**: a ``(n_rays, max_samples)`` lattice, one gather into the binary
grid per candidate, one mask.  Static shapes, VPU-friendly, no scalar loops.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .data_specs import RayIntervals, RaySamples


def ray_aabb_intersect(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    aabbs: jnp.ndarray,
    near_plane: float = -float("inf"),
    far_plane: float = float("inf"),
    miss_value: float = float("inf"),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ray-AABB intersection via the slab method.

    (reference: nerfacc/grid.py:13-51, cuda/csrc/grid.cu:284-313,
    utils_grid.cuh:10-55).  One broadcasted ``(n_rays, m)`` evaluation — no
    kernel needed on TPU.

    Args:
        rays_o: (n_rays, 3) ray origins.
        rays_d: (n_rays, 3) normalized ray directions.
        aabbs: (m, 6) axis-aligned boxes {xmin, ymin, zmin, xmax, ymax, zmax}.
        near_plane / far_plane: clamp range for hit distances.
        miss_value: fill value for missed pairs.

    Returns:
        t_mins (n_rays, m), t_maxs (n_rays, m), hits (n_rays, m) bool.
    """
    assert rays_o.ndim == 2 and rays_o.shape[-1] == 3
    assert rays_d.ndim == 2 and rays_d.shape[-1] == 3
    assert aabbs.ndim == 2 and aabbs.shape[-1] == 6

    aabb_min = aabbs[:, :3]  # (m, 3)
    aabb_max = aabbs[:, 3:]

    inv_dir = 1.0 / rays_d  # inf where dir == 0, matching CUDA semantics
    t1 = (aabb_min[None, :, :] - rays_o[:, None, :]) * inv_dir[:, None, :]
    t2 = (aabb_max[None, :, :] - rays_o[:, None, :]) * inv_dir[:, None, :]

    t_mins = jnp.max(jnp.minimum(t1, t2), axis=-1)  # (n, m)
    t_maxs = jnp.min(jnp.maximum(t1, t2), axis=-1)

    # CUDA path: hit iff slabs overlap and tmax > 0 (utils_grid.cuh:34-50).
    hits = (t_maxs > t_mins) & (t_maxs > 0)

    t_mins = jnp.clip(t_mins, near_plane, far_plane)
    t_maxs = jnp.clip(t_maxs, near_plane, far_plane)

    t_mins = jnp.where(hits, t_mins, miss_value)
    t_maxs = jnp.where(hits, t_maxs, miss_value)
    return t_mins, t_maxs, hits


# Pure-array traversal result: the padded/static-shape native layout.
class TraversalResult(NamedTuple):
    """Fixed-shape traversal output.

    Attributes:
        t_starts / t_ends: (n_rays, max_samples) candidate interval bounds
            on the marching orbit.
        valid: (n_rays, max_samples) bool; candidate ``k`` was emitted.
        termination_planes: (n_rays,) resume point for iterative rendering
            (the orbit value right after the last processed candidate).
        terminated: (n_rays,) bool; the ray's traversal finished inside this
            candidate window (no more samples beyond it).
    """

    t_starts: jnp.ndarray
    t_ends: jnp.ndarray
    valid: jnp.ndarray
    termination_planes: jnp.ndarray
    terminated: jnp.ndarray

    @property
    def t_mids(self) -> jnp.ndarray:
        return 0.5 * (self.t_starts + self.t_ends)

    @property
    def t_edges(self) -> jnp.ndarray:
        """Shared-edge lattice (valid for contiguous-lattice traversals)."""
        return jnp.concatenate([self.t_starts, self.t_ends[:, -1:]], axis=-1)


def _orbit_t(
    near_planes: jnp.ndarray,
    k: jnp.ndarray,
    step_size: float,
    cone_angle: float,
) -> jnp.ndarray:
    """Closed form of the reference's marching orbit (grid.cu:23-28).

    ``t_{k+1} = t_k + clamp(t_k * cone_angle, step_size, 1e10)``: linear steps
    of ``step_size`` while ``t < step_size / cone_angle``, geometric growth by
    ``(1 + cone_angle)`` afterwards.  ``k`` may be any (broadcastable) array
    of orbit indices.

    Returns:
        orbit values ``t_k``, shape = broadcast(near[:, None], k).
    """
    near = near_planes[:, None] if near_planes.ndim == 1 else near_planes
    k = k.astype(near.dtype)
    if cone_angle <= 0.0:
        return near + k * step_size
    tau = step_size / cone_angle
    n_lin = jnp.clip(jnp.ceil((tau - near) / step_size), min=0.0)
    t_lin_end = near + n_lin * step_size
    linear = near + k * step_size
    geom = t_lin_end * jnp.power(1.0 + cone_angle, jnp.maximum(k - n_lin, 0.0))
    return jnp.where(k <= n_lin, linear, geom)


def _march_lattice(
    near_planes: jnp.ndarray, step_size: float, cone_angle: float, n_edges: int
) -> jnp.ndarray:
    """(n_rays, n_edges) consecutive orbit values, ``t_0 = near_plane``."""
    k = jnp.arange(n_edges, dtype=near_planes.dtype)[None, :]
    return _orbit_t(near_planes, k, step_size, cone_angle)


def _grid_segments(
    t_sorted: jnp.ndarray,
    t_indices: jnp.ndarray,
    hits: jnp.ndarray,
    near_planes: jnp.ndarray,
    far_planes: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Resolve the sorted entry/exit event list into disjoint grid segments.

    Vectorized replay of the event-walk in grid.cu:129-151: between
    consecutive sorted events lies one segment; it is traversed with the grid
    level of the entering event, or — after a leaving event — with the level
    of the *next* event if that one is also a leaving event of a hit grid.

    Args:
        t_sorted: (n_rays, 2m) sorted intersection distances.
        t_indices: (n_rays, 2m) argsort indices (< m: entering grid ``i``;
            >= m: leaving grid ``i - m``).
        hits: (n_rays, m) hit flags.

    Returns:
        seg_lo, seg_hi (n_rays, 2m-1), seg_level int32, seg_valid bool.
    """
    n_rays, two_m = t_sorted.shape
    m = two_m // 2

    ev_level = (t_indices % m).astype(jnp.int32)  # (n, 2m)
    ev_entering = t_indices < m
    ev_hit = jnp.take_along_axis(hits, ev_level, axis=-1)

    lev_this = ev_level[:, :-1]
    lev_next = ev_level[:, 1:]
    entering_this = ev_entering[:, :-1]
    entering_next = ev_entering[:, 1:]
    hit_this = ev_hit[:, :-1]
    hit_next = ev_hit[:, 1:]

    # Entering a hit grid -> segment belongs to it.  Leaving a hit grid with
    # the next event also a leave of a hit grid -> still inside that grid.
    seg_valid = jnp.where(
        entering_this,
        hit_this,
        hit_this & (~entering_next) & hit_next,
    )
    seg_level = jnp.where(entering_this, lev_this, lev_next)

    seg_lo = jnp.maximum(t_sorted[:, :-1], near_planes[:, None])
    seg_hi = jnp.minimum(t_sorted[:, 1:], far_planes[:, None])
    seg_valid = seg_valid & (seg_lo < seg_hi)
    return seg_lo, seg_hi, seg_level, seg_valid


def _occupancy_lookup(
    pos: jnp.ndarray,
    level: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
) -> jnp.ndarray:
    """Gather the binary occupancy of ``pos`` at per-sample grid ``level``.

    Direct voxel-index computation replaces the reference's incremental DDA
    cell stepping (utils_grid.cuh:58-142): the sample's voxel is simply
    ``floor((pos - lo) / (hi - lo) * res)`` in its level's AABB.
    """
    m = binaries.shape[0]
    res = jnp.asarray(binaries.shape[1:], dtype=pos.dtype)
    # Select the per-sample AABB with a dense sweep over the <=8 levels:
    # m*N elementwise selects beat per-sample gather rows on TPU (random
    # gathers cost ~4ns/row regardless of width).
    lo = jnp.broadcast_to(aabbs[0, :3], pos.shape)
    hi = jnp.broadcast_to(aabbs[0, 3:], pos.shape)
    for l in range(1, m):
        sel = (level == l)[..., None]
        lo = jnp.where(sel, aabbs[l, :3], lo)
        hi = jnp.where(sel, aabbs[l, 3:], hi)
    u = (pos - lo) / (hi - lo)
    idx = jnp.clip(
        jnp.floor(u * res).astype(jnp.int32),
        0,
        jnp.asarray(binaries.shape[1:], dtype=jnp.int32) - 1,
    )
    rx, ry, rz = binaries.shape[1:]
    flat = ((level * rx + idx[..., 0]) * ry + idx[..., 1]) * rz + idx[..., 2]
    return jnp.take(binaries.reshape(-1), flat)


def _occupancy_lookup_dot(
    pos: jnp.ndarray,
    level: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
) -> jnp.ndarray:
    """Exact occupancy lookup as a one-hot MXU contraction — for SMALL grids
    (the pooled coarse grid: <= ~16k cells per level).

    A random gather costs ~7 ns/index on this TPU; for a bit table of W
    32-bit words the equivalent (N, W) one-hot @ (W, 32) bf16 matmul runs at
    MXU speed and XLA fuses the iota-compare one-hot without materializing
    it.  Bit values 0/1 are exact in bf16.
    """
    m = binaries.shape[0]
    res = jnp.asarray(binaries.shape[1:], dtype=pos.dtype)
    lo = jnp.broadcast_to(aabbs[0, :3], pos.shape)
    hi = jnp.broadcast_to(aabbs[0, 3:], pos.shape)
    for l in range(1, m):
        sel = (level == l)[..., None]
        lo = jnp.where(sel, aabbs[l, :3], lo)
        hi = jnp.where(sel, aabbs[l, 3:], hi)
    u = (pos - lo) / (hi - lo)
    idx = jnp.clip(
        jnp.floor(u * res).astype(jnp.int32),
        0,
        jnp.asarray(binaries.shape[1:], dtype=jnp.int32) - 1,
    )
    rx, ry, rz = binaries.shape[1:]
    flat = ((level * rx + idx[..., 0]) * ry + idx[..., 1]) * rz + idx[..., 2]
    total = m * rx * ry * rz
    n_words = (total + 31) // 32
    pad = n_words * 32 - total
    bits = binaries.reshape(-1)
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((pad,), bool)])
    table = bits.reshape(n_words, 32).astype(jnp.bfloat16)

    shape = flat.shape
    flat1 = flat.reshape(-1)
    word = flat1 // 32
    bit = flat1 % 32
    oh = (
        word[:, None] == jnp.arange(n_words, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        oh, table, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, 32)
    picked = jnp.sum(
        jnp.where(
            bit[:, None] == jnp.arange(32, dtype=jnp.int32)[None, :],
            rows,
            0.0,
        ),
        axis=-1,
    )
    return (picked > 0.5).reshape(shape)


def _pack_bits_z(binaries: jnp.ndarray) -> jnp.ndarray:
    """Pack the occupancy bits along z into int32 words:
    ``words[m, ix, iy, izw]`` holds voxels ``iz in [izw*32, izw*32+32)``.
    Pure elementwise — cheap to rebuild inside the jit every step."""
    m, rx, ry, rz = binaries.shape
    pad = (-rz) % 32
    b = binaries
    if pad:
        b = jnp.concatenate(
            [b, jnp.zeros((m, rx, ry, pad), bool)], axis=-1
        )
    b = b.reshape(m, rx, ry, -1, 32)
    weights = (jnp.int32(1) << jnp.arange(32, dtype=jnp.int32))
    return jnp.sum(b.astype(jnp.int32) * weights, axis=-1)


def _occupancy_lookup_window_words(
    pos: jnp.ndarray,
    level: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
    n_probes: int = 3,
) -> jnp.ndarray:
    """Occupancy for window-shaped candidates ``pos (W, f, 3)`` with ~f/3x
    fewer gathers: gather one bit-packed z-word per distinct word RUN of the
    window and resolve every candidate against its run's word elementwise.

    The word index along a window's candidate axis is piecewise-constant
    (a window spans ~1-2 voxels), so the window touches only a handful of
    distinct words.  Probing the first ``n_probes`` runs is EXACT for every
    candidate in those runs — strictly tighter than probing fixed positions
    at the same gather count (measured: fixed 3-probe emitted ~2.6% false
    samples on the bench scene at steady state; run-start probing ~0.6%).
    Candidates in later runs (window crosses >= n_probes word boundaries —
    corner cases, rare) are conservatively reported OCCUPIED: they render
    through the field with sigma-driven weights, so the result is a slight
    superset of the reference's sample set, never a miss.

    Exactness bound: a window of ``f`` candidates has at most ``f``
    distinct word runs (``run_id < f`` by construction), so
    ``n_probes == window_size`` is EXACT — the conservative fallback can
    never trigger (tests/test_pooled_traversal.py::
    test_fine_probes_window_size_is_exact asserts bit-for-bit equality
    with the per-candidate path, including under cone-angle stepping).
    """
    W, f = level.shape
    m = binaries.shape[0]
    rx, ry, rz = binaries.shape[1:]
    rzw = (rz + 31) // 32
    words = _pack_bits_z(binaries).reshape(-1)  # (m * rx * ry * rzw,)

    res = jnp.asarray(binaries.shape[1:], dtype=pos.dtype)
    lo = jnp.broadcast_to(aabbs[0, :3], pos.shape)
    hi = jnp.broadcast_to(aabbs[0, 3:], pos.shape)
    for l in range(1, m):
        sel = (level == l)[..., None]
        lo = jnp.where(sel, aabbs[l, :3], lo)
        hi = jnp.where(sel, aabbs[l, 3:], hi)
    u = (pos - lo) / (hi - lo)
    idx = jnp.clip(
        jnp.floor(u * res).astype(jnp.int32),
        0,
        jnp.asarray(binaries.shape[1:], dtype=jnp.int32) - 1,
    )
    word_idx = (
        (level * rx + idx[..., 0]) * ry + idx[..., 1]
    ) * rzw + idx[..., 2] // 32  # (W, f)
    bit = idx[..., 2] % 32

    # 0-based run index of each candidate along the window axis.
    run_start = jnp.concatenate(
        [
            jnp.ones((W, 1), bool),
            word_idx[:, 1:] != word_idx[:, :-1],
        ],
        axis=1,
    )
    run_id = jnp.cumsum(run_start.astype(jnp.int32), axis=1) - 1  # (W, f)

    occ = jnp.zeros((W, f), bool)
    matched = jnp.zeros((W, f), bool)
    for k in range(n_probes):
        in_k = run_id == k
        # word index of run k (0 if the window has < k+1 runs; in_k is then
        # all-False so the garbage word is never consulted)
        widx_k = jnp.max(jnp.where(in_k, word_idx, 0), axis=1)  # (W,)
        w_k = jnp.take(words, widx_k)  # (W,) int32 gather
        bit_k = ((w_k[:, None] >> bit) & 1) > 0
        occ = occ | (in_k & bit_k)
        matched = matched | in_k
    # candidates beyond the probed runs: conservative occupied
    return occ | ~matched


def _occupancy_lookup_window_box(
    pos: jnp.ndarray,
    level: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
) -> jnp.ndarray:
    """Occupancy for window-shaped candidates ``pos (W, f, 3)`` with ONE
    bit-word row gather per window: fetch the 3x3x3 word neighborhood of the
    window's MIDDLE candidate and resolve every candidate elementwise
    against it.

    Why this is enough: with uniform sub-voxel stepping the whole window
    spans ``window_size * step_size`` world units, so every candidate's
    voxel lies within one cell of the middle candidate's per axis whenever
    ``(window_size / 2) * step_size <= voxel_size`` (z-words pack 32 voxels,
    so the word delta along z is even smaller).  Under that bound — which
    holds for the shipping uniform-stepping configs and is checked
    statically by the trainer — the box lookup is EXACT: bit-for-bit the
    per-candidate gather (tests/test_pooled_traversal.py::
    test_fine_box_mode_is_exact).  Candidates outside the box (oversized
    steps, cone-angle growth, level changes within a window) are
    conservatively reported OCCUPIED — the same never-a-miss superset
    semantics as the run-start fallback.

    Cost: the run-start scheme needs ``window_size`` single-word gathers for
    structural exactness (one per possible word run); this needs one 27-word
    row gather (random-gather cost on this TPU is per ROW, ~7-8 ns,
    regardless of width — see PERF.md cost model), plus a cheap elementwise
    27-way select.  The neighbor table is 27 shifted copies of the packed
    word array (<= a few MB), rebuilt inside the jit each call.
    """
    W, f = level.shape
    m = binaries.shape[0]
    rx, ry, rz = binaries.shape[1:]
    rzw = (rz + 31) // 32
    words = _pack_bits_z(binaries)  # (m, rx, ry, rzw)
    # 3x3x3 neighbor table: out-of-range neighbors pad to 0 (= unoccupied,
    # which is exact — outside the grid is empty space).
    wp = jnp.pad(words, ((0, 0), (1, 1), (1, 1), (1, 1)))
    words27 = jnp.stack(
        [
            wp[:, ax : ax + rx, ay : ay + ry, az : az + rzw]
            for ax in range(3)
            for ay in range(3)
            for az in range(3)
        ],
        axis=-1,
    ).reshape(-1, 27)  # (m*rx*ry*rzw, 27)

    res = jnp.asarray(binaries.shape[1:], dtype=pos.dtype)
    lo = jnp.broadcast_to(aabbs[0, :3], pos.shape)
    hi = jnp.broadcast_to(aabbs[0, 3:], pos.shape)
    for l in range(1, m):
        sel = (level == l)[..., None]
        lo = jnp.where(sel, aabbs[l, :3], lo)
        hi = jnp.where(sel, aabbs[l, 3:], hi)
    u = (pos - lo) / (hi - lo)
    idx = jnp.clip(
        jnp.floor(u * res).astype(jnp.int32),
        0,
        jnp.asarray(binaries.shape[1:], dtype=jnp.int32) - 1,
    )
    izw = idx[..., 2] // 32
    bit = idx[..., 2] % 32

    mid = f // 2
    a_lvl = level[:, mid]
    a_x, a_y = idx[:, mid, 0], idx[:, mid, 1]
    a_zw = izw[:, mid]
    a_word = ((a_lvl * rx + a_x) * ry + a_y) * rzw + a_zw  # (W,)
    rows = jnp.take(words27, a_word, axis=0)  # (W, 27) int32 row gather

    dx = idx[..., 0] - a_x[:, None]
    dy = idx[..., 1] - a_y[:, None]
    dz = izw - a_zw[:, None]
    covered = (
        (level == a_lvl[:, None])
        & (jnp.abs(dx) <= 1)
        & (jnp.abs(dy) <= 1)
        & (jnp.abs(dz) <= 1)
    )
    sel27 = jnp.where(covered, (dx + 1) * 9 + (dy + 1) * 3 + (dz + 1), 0)
    word = jnp.sum(
        jnp.where(
            sel27[..., None] == jnp.arange(27, dtype=jnp.int32),
            rows[:, None, :],
            0,
        ),
        axis=-1,
    )  # (W, f)
    occ = ((word >> bit) & 1) > 0
    return jnp.where(covered, occ, True)


def _orbit_index(
    near: jnp.ndarray, t: jnp.ndarray, step_size: float, cone_angle: float
) -> jnp.ndarray:
    """Smallest orbit index ``k`` whose midpoint ``m_k >= t`` (closed-form
    inverse of :func:`_orbit_t`)."""
    if cone_angle <= 0.0:
        k = jnp.ceil((t - near) / step_size - 0.5)
        return jnp.clip(k, min=0.0).astype(jnp.int32)
    tau = step_size / cone_angle
    n_lin = jnp.clip(jnp.ceil((tau - near) / step_size), min=0.0)
    t_lin_end = near + n_lin * step_size
    k_lin = jnp.ceil((t - near) / step_size - 0.5)
    # geometric regime: m_k = t_k * (1 + cone/2), t_k = t_lin_end * g^(k-n_lin)
    g = 1.0 + cone_angle
    ratio = jnp.clip(t / (1.0 + 0.5 * cone_angle) / jnp.clip(t_lin_end, min=1e-10), min=1e-10)
    k_geo = n_lin + jnp.ceil(jnp.log(ratio) / jnp.log(g))
    k = jnp.where(t <= t_lin_end * (1.0 + 0.5 * cone_angle), k_lin, k_geo)
    return jnp.clip(k, min=0.0).astype(jnp.int32)


def pool_binaries(binaries: jnp.ndarray, pool: int, dilation: int = 1) -> jnp.ndarray:
    """Conservative low-res occupancy: max-pool by ``pool`` then dilate by
    ``dilation`` cells (a coarse cell is set if any fine cell within reach is
    set).  Used as the first phase of the windowed traversal."""
    m, rx, ry, rz = binaries.shape
    assert rx % pool == 0 and ry % pool == 0 and rz % pool == 0
    x = jax.lax.reduce_window(
        binaries,
        False,
        jax.lax.bitwise_or,
        (1, pool, pool, pool),
        (1, pool, pool, pool),
        "VALID",
    )
    if dilation > 0:
        w = 2 * dilation + 1
        x = jax.lax.reduce_window(
            x, False, jax.lax.bitwise_or, (1, w, w, w), (1, 1, 1, 1), "SAME"
        )
    return x


def _coarse_window_phase(
    rays_o,
    rays_d,
    binaries,
    aabbs,
    near_planes,
    far_planes,
    step_size,
    cone_angle,
    Kc,
    f,
    pool,
    dilation,
    rays_mask,
    coarse=None,
):
    """Phase 1 of the coarse-to-fine traversals: march the orbit at a stride
    of ``f`` steps against a max-pooled + dilated occupancy grid and flag the
    windows that may contain fine-valid samples (conservative).

    ``coarse``: optional precomputed pooled grid(s) replacing the on-the-fly
    ``pool_binaries`` — a single (m, cx, cy, cz) array, or a tuple of them at
    DIFFERENT resolutions for a pyramid descent (octree role): a window
    survives only if every level says occupied, so finer levels prune what
    coarser ones let through.  Levels must be conservative (max-pooled with
    ``dilation >= 1``, see :func:`pool_binaries`) or windows are wrongly
    rejected.  Estimators that keep a persistent mip pyramid
    (``SparseGridEstimator.pyramid``) pass it here instead of re-pooling
    every call.

    Returns ``(window_valid (n, Kc), j0 (n, 1), Tc (n, Kc+1), seg_lo, seg_hi,
    seg_level, seg_valid)``.
    """
    n_rays = rays_o.shape[0]
    t_mins, t_maxs, hits = ray_aabb_intersect(rays_o, rays_d, aabbs)
    t_cat = jnp.concatenate([t_mins, t_maxs], axis=-1)
    t_indices = jnp.argsort(t_cat, axis=-1, stable=True)
    t_sorted = jnp.take_along_axis(t_cat, t_indices, axis=-1)
    seg_lo, seg_hi, seg_level, seg_valid = _grid_segments(
        t_sorted, t_indices, hits, near_planes, far_planes
    )
    n_segments = seg_lo.shape[-1]

    if coarse is None:
        coarse_levels = (pool_binaries(binaries, pool, dilation),)
    elif isinstance(coarse, (tuple, list)):
        coarse_levels = tuple(coarse)
    else:
        coarse_levels = (coarse,)
    # Start each ray's window sweep at its first grid-segment entry (rounded
    # down to a window boundary so everything stays on the orbit) — rays
    # from outside the grids would otherwise burn ~25% of their coarse
    # candidates on empty space before the first AABB.
    t_entry = jnp.min(jnp.where(seg_valid, seg_lo, jnp.inf), axis=-1)
    k_entry = _orbit_index(near_planes, t_entry, step_size, cone_angle)
    k_entry = jnp.where(jnp.isfinite(t_entry), (k_entry // f) * f, 0)
    j0 = (k_entry // f)[:, None]  # first window index per ray

    Tc = _orbit_t(
        near_planes,
        (j0 + jnp.arange(Kc + 1, dtype=jnp.int32)[None, :]) * f,
        step_size, cone_angle,
    )  # (n, Kc+1)
    Mc = 0.5 * (Tc[:, :-1] + Tc[:, 1:])

    intersects = jnp.zeros((n_rays, Kc), dtype=bool)
    mid_inside = jnp.zeros((n_rays, Kc), dtype=bool)
    level_c = jnp.zeros((n_rays, Kc), dtype=jnp.int32)
    for j in range(n_segments):
        lo = seg_lo[:, j : j + 1]
        hi = seg_hi[:, j : j + 1]
        sv = seg_valid[:, j : j + 1]
        inter_j = sv & (lo < Tc[:, 1:]) & (hi > Tc[:, :-1])
        mid_j = sv & (Mc >= lo) & (Mc < hi)
        intersects = intersects | inter_j
        mid_inside = mid_inside | mid_j
        level_c = jnp.where(
            mid_j | (inter_j & ~mid_inside), seg_level[:, j : j + 1], level_c
        )

    pos_c = rays_o[:, None, :] + Mc[..., None] * rays_d[:, None, :]
    if cone_angle > 0.0:
        # With geometric step growth a far window's half-extent can exceed
        # the pool*dilation reach around its midpoint's coarse cell, so the
        # midpoint probe alone could reject an occupied window; probe the
        # two window edges as well.  (Still approximate for extreme
        # cone_angle/window_size products — raise ``dilation`` if the
        # truncation fraction reported by the trainer climbs.)
        pos_a = rays_o[:, None, :] + Tc[:, :-1, None] * rays_d[:, None, :]
        pos_b = rays_o[:, None, :] + Tc[:, 1:, None] * rays_d[:, None, :]
    occ_c = jnp.ones(Mc.shape, dtype=bool)
    for cg in coarse_levels:
        # small coarse grids take the exact MXU one-hot path (~10x cheaper
        # than the gather at 128^3/pool=4); big ones fall back to the gather
        _coarse_lookup = (
            _occupancy_lookup_dot
            if cg.size <= (1 << 17)
            else _occupancy_lookup
        )
        occ_l = _coarse_lookup(pos_c, level_c, cg, aabbs)
        if cone_angle > 0.0:
            occ_l = (
                occ_l
                | _coarse_lookup(pos_a, level_c, cg, aabbs)
                | _coarse_lookup(pos_b, level_c, cg, aabbs)
            )
        # pyramid descent: every level must agree the window may be occupied
        occ_c = occ_c & occ_l
    # windows whose midpoint is outside every segment but that still touch
    # one (segment entry/exit straddlers) are kept unconditionally —
    # conservative; the fine phase re-tests exactly.
    window_valid = intersects & (occ_c | ~mid_inside)
    if rays_mask is not None:
        window_valid = window_valid & rays_mask[:, None]
    return window_valid, j0, Tc, seg_lo, seg_hi, seg_level, seg_valid


class WindowSamples(NamedTuple):
    """Flat window-pooled traversal output (static shapes).

    The valid coarse windows of ALL rays are compacted into one flat pool of
    ``window_budget`` windows (order-preserving by (ray, window)), and only
    the pool is fine-tested.  Rays share the pool, so there is no per-ray
    window cap and no per-ray quality cliff; pool exhaustion truncates a ray
    SUFFIX exactly like the sample budget does.

    Attributes:
        t_starts / t_ends: (window_budget, window_size) candidate bounds.
        valid: same shape; candidate emitted.
        ray_ids: (window_budget,) ray of each window (n_rays for empty
            slots; nondecreasing).
        counts: (n_rays,) valid samples per ray within the pool.
        termination_planes / terminated: (n_rays,) — reference
            ``traverse_grids`` resume semantics (grid.cu:274-275).
        window_overflow: () number of valid windows dropped by the pool.
        rays_o / rays_d: (window_budget, 3) the window's ray origin and
            direction — EXACT f32 copies carried through the traversal's
            own payload gather, so downstream consumers never need a
            per-sample ray lookup (a random gather costs ~2 ms at 2^18
            samples; a one-hot MXU spread rounds to bf16 at default
            precision — both measured worse than just widening this gather).
        near / wk: (window_budget,) the window's ray near plane and first
            orbit index — lets ``compact_samples_from_windows`` recompute
            every kept sample's (t_start, t_end) analytically from ONE
            per-window row gather instead of gathering a per-sample payload
            table (which cost a (Wb*f, 6) broadcast materialization +
            reshape on top of the gather — ~0.6 ms/step at bench shapes).
    """

    t_starts: jnp.ndarray
    t_ends: jnp.ndarray
    valid: jnp.ndarray
    ray_ids: jnp.ndarray
    counts: jnp.ndarray
    termination_planes: jnp.ndarray
    terminated: jnp.ndarray
    window_overflow: jnp.ndarray
    rays_o: jnp.ndarray
    rays_d: jnp.ndarray
    near: Optional[jnp.ndarray] = None
    wk: Optional[jnp.ndarray] = None


def _pool_payload(
    j0r, near_planes, rays_o, rays_d, seg_lo, seg_hi, seg_level, seg_valid,
    extra=None,
):
    """Per-ray payload table consumed by the fine phase via ONE row gather
    per pool window: [j0, near, o(3), d(3), seg_lo, seg_hi, seg_level,
    seg_valid] — separate takes cost ~0.5 ms each on this backend
    regardless of width, so everything rides one gather.  ``extra``
    appends caller lanes after the segment block (the sort-free window
    compaction rides its rank->lane table here; row-gather cost is per
    ROW, so widening is nearly free)."""
    dtype = rays_o.dtype
    parts = [
        j0r.astype(dtype)[:, None],
        near_planes[:, None],
        rays_o,
        rays_d,
        seg_lo,
        seg_hi,
        seg_level.astype(dtype),
        seg_valid.astype(dtype),
    ]
    if extra is not None:
        parts.append(extra.astype(dtype))
    return jnp.concatenate(parts, axis=-1)  # (n_rays, 8 + 4*n_segments [+E])


def _fine_phase_from_payload(
    prow, wj, n_segments, f, step_size, cone_angle, binaries, aabbs,
    fine_probes,
):
    """Exact fine-lattice test for a pool of windows, given their gathered
    payload rows (layout of :func:`_pool_payload`) and coarse slot indices
    ``wj`` (pool,).  Returns ``(t0, t1, valid, o_w, d_w, near_w, wk)``
    with shapes ``(pool, f)`` / ``(pool, 3)`` / ``(pool,)``; ``valid``
    combines the geometric segment test with the occupancy lookup (one
    27-word box row gather per window when ``fine_probes == -1``, run-start
    word probes when ``fine_probes > 0``, per-candidate gather
    otherwise)."""
    j0_w = prow[:, 0].astype(jnp.int32)
    near_w = prow[:, 1]
    o_w = prow[:, 2:5]
    d_w = prow[:, 5:8]
    slo_w = prow[:, 8 : 8 + n_segments]
    shi_w = prow[:, 8 + n_segments : 8 + 2 * n_segments]
    slev_w = prow[:, 8 + 2 * n_segments : 8 + 3 * n_segments].astype(jnp.int32)
    sval_w = prow[:, 8 + 3 * n_segments : 8 + 4 * n_segments] > 0.5

    wk = (j0_w + wj) * f  # (pool,) first orbit index
    k_fine = wk[:, None] + jnp.arange(f, dtype=jnp.int32)[None, :]
    t0 = _orbit_t(near_w, k_fine, step_size, cone_angle)
    t1 = _orbit_t(near_w, k_fine + 1, step_size, cone_angle)
    t_mids = 0.5 * (t0 + t1)

    inside_any = jnp.zeros(t_mids.shape, dtype=bool)
    level = jnp.zeros(t_mids.shape, dtype=jnp.int32)
    for j in range(n_segments):
        inside_j = (
            sval_w[:, j : j + 1]
            & (t_mids >= slo_w[:, j : j + 1])
            & (t_mids < shi_w[:, j : j + 1])
        )
        inside_any = inside_any | inside_j
        level = jnp.where(inside_j, slev_w[:, j : j + 1], level)

    pos = o_w[:, None, :] + t_mids[..., None] * d_w[:, None, :]
    if fine_probes == -1:
        occupied = _occupancy_lookup_window_box(pos, level, binaries, aabbs)
    elif fine_probes > 0:
        occupied = _occupancy_lookup_window_words(
            pos, level, binaries, aabbs, fine_probes
        )
    else:
        occupied = _occupancy_lookup(pos, level, binaries, aabbs)
    return t0, t1, inside_any & occupied, o_w, d_w, near_w, wk


@functools.partial(
    jax.jit,
    static_argnames=(
        "step_size",
        "cone_angle",
        "window_budget",
        "window_size",
        "max_coarse",
        "pool",
        "dilation",
        "fine_probes",
        "compaction",
    ),
)
def traverse_grids_pooled(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
    near_planes: Optional[jnp.ndarray] = None,
    far_planes: Optional[jnp.ndarray] = None,
    step_size: float = 1e-3,
    cone_angle: float = 0.0,
    window_budget: int = 1 << 16,
    window_size: int = 8,
    max_coarse: int = 160,
    pool: int = 4,
    dilation: int = 1,
    rays_mask: Optional[jnp.ndarray] = None,
    fine_probes: int = 0,
    coarse_binaries=None,
    compaction: str = "onehot",
) -> WindowSamples:
    """Coarse-to-fine traversal with a GLOBAL window pool.

    ``compaction``: "onehot" (default) = sort-free hierarchical cumsum
    inversion of the window pool (ops/compaction.py); "sort" = the legacy
    order-preserving key sort.  Bit-identical outputs (tested).

    ``coarse_binaries``: optional precomputed pooled grid(s) for the window
    phase — one array, or a tuple at several resolutions for a pyramid
    descent (see :func:`_coarse_window_phase`).  ``None`` pools on the fly.

    ``fine_probes > 0`` switches the fine occupancy test to the bit-packed
    run-start probe scheme (:func:`_occupancy_lookup_window_words`) with
    that many word-fetches per window — ~f/probes fewer gathers, exact for
    windows spanning <= fine_probes distinct bit-words (virtually all) and
    a tiny conservative superset beyond.  0 = exact per-candidate gather;
    fine_probes == window_size is ALSO exact (structural run-count bound,
    see :func:`_occupancy_lookup_window_words`) at 1-D word gathers instead
    of the slower per-candidate 2-D gather.  ``fine_probes == -1`` uses ONE
    27-word neighborhood row gather per window
    (:func:`_occupancy_lookup_window_box`) — exact whenever
    ``(window_size / 2) * step_size <= voxel_size`` with uniform stepping
    (the shipping static configs), conservative superset beyond.

    Same two-phase scheme as :func:`traverse_grids_windowed` but the fine
    phase runs on the batch-wide pool of surviving windows instead of a fixed
    per-ray count: the fine occupancy gather (the most expensive op of the
    train step, ~8 ns/row on TPU) only touches windows that can hold samples,
    and dense rays borrow pool capacity from sparse ones.

    Returns a :class:`WindowSamples` (flat layout, ready for
    ``compact_samples_from_windows``).
    """
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype
    f = window_size
    Kc = max_coarse
    Wb = window_budget
    assert Wb <= n_rays * Kc, "window_budget exceeds the candidate count"
    if near_planes is None:
        near_planes = jnp.zeros((n_rays,), dtype)
    if far_planes is None:
        far_planes = jnp.full((n_rays,), jnp.inf, dtype)

    (window_valid, j0, Tc, seg_lo, seg_hi, seg_level, seg_valid) = (
        _coarse_window_phase(
            rays_o, rays_d, binaries, aabbs, near_planes, far_planes,
            step_size, cone_angle, Kc, f, pool, dilation, rays_mask,
            coarse=coarse_binaries,
        )
    )
    n_segments = seg_lo.shape[-1]
    j0r = j0[:, 0]

    # ---- window compaction (sort-free; see ops/compaction.py) ------------
    # The p-th surviving window's (ray, rank) comes from inverting the
    # per-ray count cumsum — two levels of vectorized compares + one exact
    # byte-split one-hot row fetch — and its coarse slot j is resolved from
    # the ray's validity-cumsum lanes riding the payload gather (one
    # (Wb, Kc) compare+sum; no (n, Kc, Kc) table).  Replaces the
    # (n_rays*Kc)-key sort that was 9.7% of round-5 device time
    # (bit-identical outputs; the legacy sort path remains under
    # compaction="sort" and in the equality tests).
    from .ops.compaction import (
        lane_from_cumsum,
        stable_partition_rows,
        valid_cumsum_lanes,
    )

    if compaction == "sort":
        counts_w = jnp.sum(window_valid.astype(jnp.int32), axis=-1)  # (n,)
        nw = n_rays * Kc
        wv_flat = window_valid.reshape(-1)
        iota = jnp.arange(nw, dtype=jnp.int32)
        keys = jnp.where(wv_flat, iota, iota + nw)
        _, order = jax.lax.sort_key_val(keys, iota)
        wsel = order[:Wb]
        total_w = jnp.sum(counts_w)
        wray_raw = wsel // Kc
        wj = wsel % Kc
        j_cs = None
    else:
        j_cs = valid_cumsum_lanes(window_valid)  # (n_rays, Kc)
        counts_w = j_cs[:, -1].astype(jnp.int32)
        # rank comes from a per-ray exclusive-cumsum payload lane (rank =
        # p - C_excl[ray], resolved AFTER the payload gather) rather than
        # stable_partition_rows' masked-max rank output — the unused rank
        # lets XLA dead-code-eliminate the two (Wb, s) where+max fusions.
        c_incl = jnp.cumsum(counts_w)
        ray_excl = (c_incl - counts_w).astype(j_cs.dtype)
        j_cs = jnp.concatenate([j_cs, ray_excl[:, None]], axis=-1)
        wray_raw, _unused_rank, total_w = stable_partition_rows(
            counts_w, Wb
        )
        wj = None
    w_in = jnp.arange(Wb, dtype=jnp.int32) < jnp.minimum(total_w, Wb)
    wray = jnp.where(w_in, wray_raw, n_rays).astype(jnp.int32)
    wray_c = jnp.minimum(wray, n_rays - 1)

    # ---- fine phase on the pool ------------------------------------------
    pay = _pool_payload(
        j0r, near_planes, rays_o, rays_d, seg_lo, seg_hi, seg_level,
        seg_valid, extra=j_cs,
    )
    prow = jnp.take(pay, wray_c, axis=0)  # (Wb, C)
    # NOTE: a one-hot MXU spread of the payload was tried and reverted:
    # exactness forces Precision.HIGHEST (the TPU default bf16 dot rounds
    # t values), and inf segment bounds of grid-missing rays poison a
    # matmul spread with 0*inf NaNs — sanitizing + 6-pass precision ate the
    # win over this plain row gather.
    if wj is None:
        cs_off = 8 + 4 * n_segments
        wrank = (
            jnp.arange(Wb, dtype=jnp.int32)
            - prow[:, cs_off + Kc].astype(jnp.int32)
        )
        wj = lane_from_cumsum(prow[:, cs_off : cs_off + Kc], wrank)
        wj = jnp.clip(wj, 0, Kc - 1)
    t0, t1, fine_valid, o_w, d_w, near_w, wk_w = _fine_phase_from_payload(
        prow, wj, n_segments, f, step_size, cone_angle, binaries, aabbs,
        fine_probes,
    )
    valid = fine_valid & w_in[:, None]

    # ---- per-ray sample counts within the pool ----------------------------
    wcnt = jnp.sum(valid.astype(jnp.int32), axis=-1)  # (Wb,)
    C0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(wcnt)]
    )  # (Wb+1,)
    cum_w = jnp.cumsum(counts_w)
    ends_w = jnp.clip(cum_w, 0, Wb)
    starts_w = jnp.clip(cum_w - counts_w, 0, Wb)
    counts = jnp.take(C0, ends_w) - jnp.take(C0, starts_w)  # (n_rays,)

    # ---- termination -------------------------------------------------------
    t_hi_last = jnp.max(jnp.where(seg_valid, seg_hi, -jnp.inf), axis=-1)
    has_any_segment = jnp.any(seg_valid, axis=-1)
    k_natural = _orbit_index(near_planes, t_hi_last, step_size, cone_angle)
    kept_w = jnp.clip(Wb - (cum_w - counts_w), 0, counts_w)
    truncated = kept_w < counts_w
    sweep_exhausted = t_hi_last > Tc[:, -1]
    # first unprocessed valid window (defined when truncated)
    cs = jnp.cumsum(window_valid.astype(jnp.int32), axis=-1)
    first_unproc = jnp.argmax(cs > kept_w[:, None], axis=-1)
    k_stop = jnp.where(
        truncated,
        (j0r + first_unproc) * f,
        jnp.where(sweep_exhausted, (j0r + Kc) * f, k_natural),
    )
    termination_planes = _orbit_t(
        near_planes, k_stop[:, None], step_size, cone_angle
    )[:, 0]
    termination_planes = jnp.where(
        has_any_segment, termination_planes, near_planes
    )
    terminated = jnp.where(
        has_any_segment, ~(truncated | sweep_exhausted), True
    )
    if rays_mask is not None:
        termination_planes = jnp.where(
            rays_mask, termination_planes, near_planes
        )
        terminated = jnp.where(rays_mask, terminated, True)

    return WindowSamples(
        t0, t1, valid, wray, counts, termination_planes, terminated,
        total_w - jnp.minimum(total_w, Wb), o_w, d_w, near_w, wk_w,
    )


class CoarsePool(NamedTuple):
    """Precomputed coarse-phase state for cursor-based marching rounds.

    The multi-round eval renderer used to re-run the ENTIRE coarse window
    phase (orbit + segment events + pooled-occupancy tests over
    ``n_rays * max_coarse`` windows) plus a fresh global window sort on
    every resume round, although a resumed ray re-derives exactly the same
    surviving windows.  This structure is built ONCE per ray batch: the
    coarse phase runs once, every surviving window goes into one ray-major
    sorted list, and each round just consumes the next windows per ray via
    a cursor — no re-coarse, no full-size re-sort (reference analog: the
    test renderer's persistent alive-ray marching state,
    examples/utils.py:267-439).

    Attributes:
        wlist: (W_max,) int32 ``ray * Kc + slot`` of each surviving window,
            ray-major; ``n_rays * Kc`` on filler entries.
        w_in: (W_max,) entry holds a real window.
        ray_e: (W_max,) ray of each entry (``n_rays`` on filler).
        l_local: (W_max,) rank of the window within its ray (0-based).
        counts_w: (n_rays,) listed surviving windows per ray.
        pay: (n_rays, 8 + 4 * n_segments) fine-phase payload table
            (:func:`_pool_payload`).
        near: (n_rays,) orbit origin the window indices refer to.
        resume_planes: (n_rays,) where coverage ends — the re-coarse
            near plane for rays whose windows were exhausted (list
            truncation or coarse-sweep exhaustion).
        needs_recoarse: (n_rays,) coverage ended before the ray's natural
            scene exit; after consuming ``counts_w`` windows the caller
            must rebuild the pool from ``resume_planes``.
        has_seg: (n_rays,) ray intersects any grid at all.
    """

    wlist: jnp.ndarray
    w_in: jnp.ndarray
    ray_e: jnp.ndarray
    l_local: jnp.ndarray
    counts_w: jnp.ndarray
    pay: jnp.ndarray
    near: jnp.ndarray
    resume_planes: jnp.ndarray
    needs_recoarse: jnp.ndarray
    has_seg: jnp.ndarray


def build_coarse_pool(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
    near_planes: jnp.ndarray,
    far_planes: jnp.ndarray,
    step_size: float,
    cone_angle: float,
    max_coarse: int,
    window_size: int,
    pool: int = 4,
    dilation: int = 1,
    max_windows: int = 1 << 17,
    rays_mask: Optional[jnp.ndarray] = None,
    coarse_binaries=None,
) -> CoarsePool:
    """Run the coarse window phase once and freeze it into a
    :class:`CoarsePool` for cursor-based rounds
    (:func:`pooled_round_from_coarse`)."""
    from .ops.sorted_segments import spread_table

    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype
    f = window_size
    Kc = max_coarse
    (window_valid, j0, Tc, seg_lo, seg_hi, seg_level, seg_valid) = (
        _coarse_window_phase(
            rays_o, rays_d, binaries, aabbs, near_planes, far_planes,
            step_size, cone_angle, Kc, f, pool, dilation, rays_mask,
            coarse=coarse_binaries,
        )
    )
    j0r = j0[:, 0]

    nw = n_rays * Kc
    W_max = min(max_windows, nw)
    wv_flat = window_valid.reshape(-1)
    iota = jnp.arange(nw, dtype=jnp.int32)
    keys = jnp.where(wv_flat, iota, iota + nw)
    _, order = jax.lax.sort_key_val(keys, iota)
    wsel = order[:W_max]
    counts_raw = jnp.sum(window_valid.astype(jnp.int32), axis=-1)
    total_w = jnp.sum(counts_raw)
    w_in = jnp.arange(W_max, dtype=jnp.int32) < jnp.minimum(total_w, W_max)
    wlist = jnp.where(w_in, wsel, nw)
    ray_e = jnp.where(w_in, wsel // Kc, n_rays).astype(jnp.int32)
    G0 = jnp.cumsum(counts_raw) - counts_raw
    counts_w = jnp.clip(W_max - G0, 0, counts_raw)
    pool_truncated = counts_w < counts_raw
    # local window rank per entry (exact one-hot spread of the ray starts)
    G0_e = spread_table(G0.astype(dtype), ray_e, n_rays)
    l_local = jnp.arange(W_max, dtype=jnp.int32) - G0_e.astype(jnp.int32)

    pay = _pool_payload(
        j0r, near_planes, rays_o, rays_d, seg_lo, seg_hi, seg_level,
        seg_valid,
    )

    t_hi_last = jnp.max(jnp.where(seg_valid, seg_hi, -jnp.inf), axis=-1)
    has_seg = jnp.any(seg_valid, axis=-1)
    sweep_exhausted = t_hi_last > Tc[:, -1]
    cs = jnp.cumsum(window_valid.astype(jnp.int32), axis=-1)
    first_unlisted = jnp.argmax(cs > counts_w[:, None], axis=-1)
    k_after = jnp.where(
        pool_truncated,
        (j0r + first_unlisted) * f,
        (j0r + Kc) * f,
    )
    resume_planes = _orbit_t(
        near_planes, k_after[:, None], step_size, cone_angle
    )[:, 0]
    resume_planes = jnp.where(has_seg, resume_planes, near_planes)
    needs_recoarse = has_seg & (pool_truncated | sweep_exhausted)
    if rays_mask is not None:
        needs_recoarse = needs_recoarse & rays_mask
    return CoarsePool(
        wlist, w_in, ray_e, l_local, counts_w, pay, near_planes,
        resume_planes, needs_recoarse, has_seg,
    )


def pooled_round_from_coarse(
    cpool: CoarsePool,
    cursor: jnp.ndarray,
    alive: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
    step_size: float,
    cone_angle: float,
    max_coarse: int,
    window_size: int,
    window_budget: int,
    sample_budget: int,
    fine_probes: int = 0,
) -> Tuple[WindowSamples, jnp.ndarray]:
    """One marching round over a prebuilt :class:`CoarsePool`: take each
    alive ray's next unconsumed windows (up to ``window_budget`` across the
    batch, ray-major), fine-test only those, and report how many windows
    each ray fully consumed so the caller can advance its cursor.

    Sample-budget truncation rolls back to WINDOW granularity: a window
    whose samples do not all fit in ``sample_budget`` contributes nothing
    this round (its candidates are masked out) and is re-visited next
    round — so cursor resume composites every sample exactly once.

    Returns ``(WindowSamples, advance)``; ``ws.counts`` already reflects
    the rollback, so ``compact_samples_from_windows(ws, sample_budget, n)``
    never overflows.
    """
    from .ops.sorted_segments import spread_table

    f = window_size
    Kc = max_coarse
    Wb = window_budget
    W_max = cpool.wlist.shape[0]
    n_rays = cpool.counts_w.shape[0]

    # per-entry eligibility: this ray's cursor has not passed the window
    ca = jnp.stack(
        [cursor.astype(jnp.float32), alive.astype(jnp.float32)], axis=-1
    )
    ca_e = spread_table(ca, cpool.ray_e, n_rays)
    elig = (
        cpool.w_in
        & (cpool.l_local >= ca_e[:, 0].astype(jnp.int32))
        & (ca_e[:, 1] > 0.5)
    )
    iota = jnp.arange(W_max, dtype=jnp.int32)
    keys = jnp.where(elig, iota, iota + W_max)
    _, order = jax.lax.sort_key_val(keys, iota)
    sel = order[:Wb]

    rem = jnp.clip(
        jnp.where(alive, cpool.counts_w - cursor, 0), 0, None
    )
    total_rem = jnp.sum(rem)
    S = jnp.cumsum(rem) - rem
    kept = jnp.clip(Wb - S, 0, rem)
    pool_in = jnp.arange(Wb, dtype=jnp.int32) < jnp.minimum(total_rem, Wb)

    wsel = jnp.take(cpool.wlist, sel)
    wray = jnp.where(pool_in, wsel // Kc, n_rays).astype(jnp.int32)
    wray_c = jnp.minimum(wray, n_rays - 1)
    wj = wsel % Kc

    prow = jnp.take(cpool.pay, wray_c, axis=0)
    n_segments = (cpool.pay.shape[1] - 8) // 4
    t0, t1, fine_valid, o_w, d_w, near_w, wk_w = _fine_phase_from_payload(
        prow, wj, n_segments, f, step_size, cone_angle, binaries, aabbs,
        fine_probes,
    )
    valid = fine_valid & pool_in[:, None]

    # window-granular sample-budget rollback
    wcnt = jnp.sum(valid.astype(jnp.int32), axis=-1)
    C0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(wcnt)]
    )
    P = jnp.sum((C0[1:] <= sample_budget).astype(jnp.int32))
    valid = valid & (jnp.arange(Wb, dtype=jnp.int32) < P)[:, None]
    kept_full = jnp.clip(P - S, 0, kept)
    advance = kept_full

    ends_w = jnp.clip(S + kept_full, 0, Wb)
    starts_w = jnp.clip(S, 0, Wb)
    counts = jnp.take(C0, ends_w) - jnp.take(C0, starts_w)

    new_cursor = cursor + advance
    terminated = new_cursor >= cpool.counts_w
    ws = WindowSamples(
        t0, t1, valid, wray, counts,
        cpool.resume_planes, terminated,
        total_rem - jnp.minimum(total_rem, Wb), o_w, d_w, near_w, wk_w,
    )
    return ws, advance


@functools.partial(
    jax.jit,
    static_argnames=(
        "step_size",
        "cone_angle",
        "n_windows",
        "window_size",
        "max_coarse",
        "pool",
        "dilation",
    ),
)
def traverse_grids_windowed(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
    near_planes: Optional[jnp.ndarray] = None,
    far_planes: Optional[jnp.ndarray] = None,
    step_size: float = 1e-3,
    cone_angle: float = 0.0,
    n_windows: int = 40,
    window_size: int = 8,
    max_coarse: int = 192,
    pool: int = 4,
    dilation: int = 1,
    rays_mask: Optional[jnp.ndarray] = None,
    coarse_binaries=None,
) -> TraversalResult:
    """Coarse-to-fine traversal: 2-4x fewer random-occupancy rows per ray.

    ``coarse_binaries``: optional precomputed pooled grid(s) for phase 1
    (single array or descent tuple, see :func:`_coarse_window_phase`).

    Phase 1 walks the marching orbit at a stride of ``window_size`` against a
    max-pooled + dilated occupancy grid (conservative for uniform stepping:
    with ``cone_angle == 0`` a window's half-extent never exceeds the
    pool+dilation reach at the defaults, so no fine-valid window is rejected;
    with ``cone_angle > 0`` the window edges are probed too — see phase 1
    body).  Phase 2 selects each ray's first
    ``n_windows`` surviving windows and evaluates the exact fine lattice only
    inside them.  Both phases stay on the same orbit, so results match
    :func:`traverse_grids_padded` exactly wherever the window budget is not
    exhausted; exhaustion is reported via ``terminated`` / resumable
    ``termination_planes`` like the reference's ``traverse_steps_limit``
    (grid.cu:184,208).

    Returns:
        :class:`TraversalResult` with ``(n_rays, n_windows * window_size)``
        candidate buffers.
    """
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype
    f = window_size
    Kc = max_coarse
    W = n_windows
    if near_planes is None:
        near_planes = jnp.zeros((n_rays,), dtype)
    if far_planes is None:
        far_planes = jnp.full((n_rays,), jnp.inf, dtype)

    (window_valid, j0, Tc, seg_lo, seg_hi, seg_level, seg_valid) = (
        _coarse_window_phase(
            rays_o, rays_d, binaries, aabbs, near_planes, far_planes,
            step_size, cone_angle, Kc, f, pool, dilation, rays_mask,
            coarse=coarse_binaries,
        )
    )
    n_segments = seg_lo.shape[-1]

    # ---- phase 2: first W surviving windows, exact fine lattice ---------
    iota_w = jnp.broadcast_to(
        jnp.arange(Kc, dtype=jnp.int32)[None, :], (n_rays, Kc)
    )
    keys = jnp.where(window_valid, iota_w, iota_w + Kc)
    keys_sorted = jnp.sort(keys, axis=-1)
    sel_keys = keys_sorted[:, :W]
    wvalid = sel_keys < Kc
    wsel = jnp.where(wvalid, sel_keys, 0)

    k_fine = (
        ((j0 + wsel) * f)[:, :, None]
        + jnp.arange(f, dtype=jnp.int32)[None, None, :]
    ).reshape(n_rays, W * f)
    t0 = _orbit_t(near_planes, k_fine, step_size, cone_angle)
    t1 = _orbit_t(near_planes, k_fine + 1, step_size, cone_angle)
    t_mids = 0.5 * (t0 + t1)

    inside_any = jnp.zeros(t_mids.shape, dtype=bool)
    level = jnp.zeros(t_mids.shape, dtype=jnp.int32)
    for j in range(n_segments):
        inside_j = (
            seg_valid[:, j : j + 1]
            & (t_mids >= seg_lo[:, j : j + 1])
            & (t_mids < seg_hi[:, j : j + 1])
        )
        inside_any = inside_any | inside_j
        level = jnp.where(inside_j, seg_level[:, j : j + 1], level)

    pos = rays_o[:, None, :] + t_mids[..., None] * rays_d[:, None, :]
    occupied = _occupancy_lookup(pos, level, binaries, aabbs)
    valid = inside_any & occupied & jnp.repeat(wvalid, f, axis=-1)
    if rays_mask is not None:
        valid = valid & rays_mask[:, None]

    # ---- termination -----------------------------------------------------
    t_hi_last = jnp.max(jnp.where(seg_valid, seg_hi, -jnp.inf), axis=-1)
    has_any_segment = jnp.any(seg_valid, axis=-1)
    k_natural = _orbit_index(near_planes, t_hi_last, step_size, cone_angle)
    n_valid_windows = jnp.sum(window_valid.astype(jnp.int32), axis=-1)
    truncated = n_valid_windows > W
    # Valid grid segments extending past the coarse sweep's extent were never
    # examined: the ray is NOT terminated and must resume at the sweep end
    # (otherwise far-scene samples are silently dropped with no resume
    # signal, and trainer completion masks count those rays as done).
    sweep_exhausted = t_hi_last > Tc[:, -1]
    # first unprocessed valid window (defined when truncated)
    j_next = jnp.where(truncated, j0[:, 0] + keys_sorted[:, W % Kc], 0)
    k_stop = jnp.where(
        truncated,
        j_next * f,
        jnp.where(sweep_exhausted, (j0[:, 0] + Kc) * f, k_natural),
    )
    termination_planes = _orbit_t(
        near_planes, k_stop[:, None], step_size, cone_angle
    )[:, 0]
    termination_planes = jnp.where(
        has_any_segment, termination_planes, near_planes
    )
    terminated = jnp.where(
        has_any_segment, ~(truncated | sweep_exhausted), True
    )
    if rays_mask is not None:
        termination_planes = jnp.where(rays_mask, termination_planes, near_planes)
        terminated = jnp.where(rays_mask, terminated, True)

    return TraversalResult(t0, t1, valid, termination_planes, terminated)


@functools.partial(
    jax.jit,
    static_argnames=("step_size", "cone_angle", "max_samples", "valid_samples_limit"),
)
def traverse_grids_padded(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
    near_planes: Optional[jnp.ndarray] = None,
    far_planes: Optional[jnp.ndarray] = None,
    step_size: float = 1e-3,
    cone_angle: float = 0.0,
    max_samples: int = 1024,
    rays_mask: Optional[jnp.ndarray] = None,
    valid_samples_limit: Optional[int] = None,
) -> TraversalResult:
    """Traverse multiple occupancy grids — padded/static-shape fast path.

    Fully-parallel equivalent of the reference's ``traverse_grids`` with
    ``step_size > 0`` (grid.cu:68-282): evaluates all ``max_samples``
    marching-lattice candidates per ray at once (see module docstring for the
    equivalence argument).

    Args:
        rays_o, rays_d: (n_rays, 3).
        binaries: (m, resx, resy, resz) bool occupancy.
        aabbs: (m, 6).
        near_planes / far_planes: (n_rays,), defaults 0 / +inf.
        step_size: marching step (> 0).
        cone_angle: linear step growth; 0 = uniform stepping.
        max_samples: static number of lattice candidates per ray.
        rays_mask: optional (n_rays,) bool; skip rays where False.
        valid_samples_limit: optional static cap on *emitted* samples per ray
            (the reference's ``traverse_steps_limit``, grid.cu:184,208).

    Returns:
        A :class:`TraversalResult`.
    """
    assert step_size > 0.0, "use traverse_grids_voxel for step_size <= 0"
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype
    if near_planes is None:
        near_planes = jnp.zeros((n_rays,), dtype)
    if far_planes is None:
        far_planes = jnp.full((n_rays,), jnp.inf, dtype)

    t_mins, t_maxs, hits = ray_aabb_intersect(rays_o, rays_d, aabbs)
    t_cat = jnp.concatenate([t_mins, t_maxs], axis=-1)
    t_indices = jnp.argsort(t_cat, axis=-1, stable=True)
    t_sorted = jnp.take_along_axis(t_cat, t_indices, axis=-1)

    seg_lo, seg_hi, seg_level, seg_valid = _grid_segments(
        t_sorted, t_indices, hits, near_planes, far_planes
    )

    t_edges = _march_lattice(near_planes, step_size, cone_angle, max_samples + 1)
    t_mids = 0.5 * (t_edges[:, :-1] + t_edges[:, 1:])  # (n, K)

    # Which segment contains each candidate midpoint?  Segments are disjoint,
    # so a masked sum selects the unique owner.  n_segments = 2m-1 <= 15.
    inside_any = jnp.zeros(t_mids.shape, dtype=bool)
    level = jnp.zeros(t_mids.shape, dtype=jnp.int32)
    n_segments = seg_lo.shape[-1]
    for j in range(n_segments):
        inside_j = (
            seg_valid[:, j : j + 1]
            & (t_mids >= seg_lo[:, j : j + 1])
            & (t_mids < seg_hi[:, j : j + 1])
        )
        inside_any = inside_any | inside_j
        level = jnp.where(inside_j, seg_level[:, j : j + 1], level)

    pos = rays_o[:, None, :] + t_mids[..., None] * rays_d[:, None, :]
    occupied = _occupancy_lookup(pos, level, binaries, aabbs)
    valid = inside_any & occupied

    if rays_mask is not None:
        valid = valid & rays_mask[:, None]

    if valid_samples_limit is not None:
        n_before = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - valid.astype(
            jnp.int32
        )
        valid = valid & (n_before < valid_samples_limit)

    # Termination plane: the lattice point right after the last processed
    # candidate (grid.cu:274-275).  Natural end = first lattice edge whose
    # midpoint clears the farthest valid segment; clamped into the window.
    t_hi_last = jnp.max(
        jnp.where(seg_valid, seg_hi, -jnp.inf), axis=-1
    )  # (n,)
    beyond = t_mids >= t_hi_last[:, None]  # candidates past all segments
    k_natural = jnp.argmax(beyond, axis=-1)  # first True, or 0 if none
    any_beyond = jnp.any(beyond, axis=-1)
    k_stop = jnp.where(any_beyond, k_natural, valid.shape[1])
    if valid_samples_limit is not None:
        total_valid = jnp.sum(valid.astype(jnp.int32), axis=-1)
        hit_limit = total_valid >= valid_samples_limit
        # index right after the limit-th valid sample
        reached = jnp.cumsum(valid.astype(jnp.int32), axis=-1) >= valid_samples_limit
        k_limit = jnp.argmax(reached, axis=-1) + 1
        k_stop = jnp.where(hit_limit, jnp.minimum(k_stop, k_limit), k_stop)
    terminated = k_stop < valid.shape[1]
    has_any_segment = jnp.any(seg_valid, axis=-1)
    termination_planes = jnp.take_along_axis(
        t_edges, jnp.minimum(k_stop, valid.shape[1])[:, None], axis=-1
    )[:, 0]
    termination_planes = jnp.where(
        has_any_segment, termination_planes, near_planes
    )
    terminated = jnp.where(has_any_segment, terminated, True)
    if rays_mask is not None:
        termination_planes = jnp.where(
            rays_mask, termination_planes, near_planes
        )

    return TraversalResult(
        t_edges[:, :-1], t_edges[:, 1:], valid, termination_planes, terminated
    )


@functools.partial(jax.jit, static_argnames=("max_edges",))
def traverse_grids_voxel(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
    near_planes: Optional[jnp.ndarray] = None,
    far_planes: Optional[jnp.ndarray] = None,
    max_edges: int = 1024,
    rays_mask: Optional[jnp.ndarray] = None,
) -> TraversalResult:
    """Per-voxel-interval traversal: the reference's ``step_size <= 0`` mode
    (grid.cu:104-107, 218-245 — one interval per voxel crossing).

    TPU formulation: the voxel-boundary crossing times of a ray are the
    union of three arithmetic progressions per grid level (one per axis,
    spacing ``voxel_size / |d|``), plus the grid-segment entry/exit times.
    Generate them all in parallel, sort per ray, and emit the interval
    between consecutive edges iff its midpoint lies in an occupied voxel of
    its segment's level.  No sequential DDA anywhere.

    Returns a :class:`TraversalResult` with ``(n_rays, max_edges - 1)``
    ragged-edge intervals (``t_starts[k] = edge[k]``, ``t_ends[k] =
    edge[k+1]``; unlike the uniform lattice, edges are irregular).

    Budget truncation is REPORTED, not silent: if a ray needs more crossings
    than ``max_edges`` admits (sort cutoff) or more than the per-progression
    cap ``k_per`` (e.g. long diagonals through fine grids), intervals past
    the trusted horizon are invalidated, ``terminated[ray] = False`` and
    ``termination_planes[ray]`` is the horizon — re-call with
    ``near_planes = termination_planes`` to resume, matching the reference's
    ``traverse_steps_limit`` resume contract (grid.cu:274-275).
    """
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype
    m = binaries.shape[0]
    if near_planes is None:
        near_planes = jnp.zeros((n_rays,), dtype)
    if far_planes is None:
        far_planes = jnp.full((n_rays,), jnp.inf, dtype)

    t_mins, t_maxs, hits = ray_aabb_intersect(rays_o, rays_d, aabbs)
    t_cat = jnp.concatenate([t_mins, t_maxs], axis=-1)
    t_indices = jnp.argsort(t_cat, axis=-1, stable=True)
    t_sorted = jnp.take_along_axis(t_cat, t_indices, axis=-1)
    seg_lo, seg_hi, seg_level, seg_valid = _grid_segments(
        t_sorted, t_indices, hits, near_planes, far_planes
    )
    n_segments = seg_lo.shape[-1]

    t_enter = jnp.min(jnp.where(seg_valid, seg_lo, jnp.inf), axis=-1)
    t_exit = jnp.max(jnp.where(seg_valid, seg_hi, -jnp.inf), axis=-1)
    has_seg = jnp.any(seg_valid, axis=-1)
    t_enter = jnp.where(has_seg, t_enter, 0.0)
    t_exit = jnp.where(has_seg, t_exit, 0.0)

    # Candidate edges: per (level, axis) arithmetic progressions of plane
    # crossings starting at the first plane after t_enter.
    res = jnp.asarray(binaries.shape[1:], dtype=dtype)  # (3,)
    k_per = max((max_edges - 2 * n_segments) // (3 * m), 1)
    seqs = []
    seq_cov = []  # per-progression trusted horizon (inf = fully covered)
    for l in range(m):
        lo_l = aabbs[l, :3]
        hi_l = aabbs[l, 3:]
        vox = (hi_l - lo_l) / res  # (3,)
        for a in range(3):
            d_a = rays_d[:, a]
            o_a = rays_o[:, a]
            inv = 1.0 / jnp.where(jnp.abs(d_a) < 1e-12, 1e-12, d_a)
            delta = jnp.abs(vox[a] * inv)  # (n,)
            # plane index at t_enter, then walk outward in +t
            x_enter = o_a + t_enter * d_a
            i_enter = (x_enter - lo_l[a]) / vox[a]
            # first crossing strictly after t_enter
            next_plane = jnp.where(d_a >= 0, jnp.ceil(i_enter), jnp.floor(i_enter))
            t_first = (lo_l[a] + next_plane * vox[a] - o_a) * inv
            t_first = jnp.where(
                t_first <= t_enter, t_first + delta, t_first
            )
            ks = jnp.arange(k_per, dtype=dtype)[None, :]
            seqs.append(t_first[:, None] + ks * delta[:, None])
            # If the first UNGENERATED crossing (index k_per) still lies
            # before t_exit, this progression was truncated: edges past the
            # last generated crossing are untrustworthy (intervals there
            # would silently span multiple voxels).
            last_gen = t_first + (k_per - 1) * delta
            seq_cov.append(
                jnp.where(last_gen + delta <= t_exit, last_gen, jnp.inf)
            )
    # segment entry/exit edges
    seqs.append(jnp.where(seg_valid, seg_lo, jnp.inf))
    seqs.append(jnp.where(seg_valid, seg_hi, jnp.inf))
    edges = jnp.concatenate(seqs, axis=-1)
    # out-of-range edges pushed to +inf so they sort to the back
    edges = jnp.where((edges >= t_enter[:, None]) & (edges <= t_exit[:, None]),
                      edges, jnp.inf)
    n_in_range = jnp.sum(jnp.isfinite(edges), axis=-1)
    edges = jnp.sort(edges, axis=-1)
    E = min(max_edges, edges.shape[-1])
    cut = n_in_range > E
    edges = edges[:, :E]
    # Trusted horizon: min over progression exhaustion and the sort cutoff.
    # Beyond it crossings are missing, so intervals are invalid and the ray
    # must be resumable from there (reference resume contract grid.cu:274-275).
    t_cov = jnp.minimum(
        jnp.min(jnp.stack(seq_cov, axis=-1), axis=-1),
        jnp.where(cut, edges[:, E - 1], jnp.inf),
    )

    t0 = edges[:, :-1]
    t1 = edges[:, 1:]
    t_mids = 0.5 * (t0 + t1)
    finite = jnp.isfinite(t_mids) & (t1 - t0 > 1e-9)

    inside_any = jnp.zeros(t_mids.shape, dtype=bool)
    level = jnp.zeros(t_mids.shape, dtype=jnp.int32)
    for j in range(n_segments):
        inside_j = (
            seg_valid[:, j : j + 1]
            & (t_mids >= seg_lo[:, j : j + 1])
            & (t_mids < seg_hi[:, j : j + 1])
        )
        inside_any = inside_any | inside_j
        level = jnp.where(inside_j, seg_level[:, j : j + 1], level)

    safe_mids = jnp.where(finite, t_mids, 0.0)
    pos = rays_o[:, None, :] + safe_mids[..., None] * rays_d[:, None, :]
    occupied = _occupancy_lookup(pos, level, binaries, aabbs)
    valid = finite & inside_any & occupied
    # Drop intervals past the trusted horizon: an interval whose far edge
    # exceeds t_cov may straddle ungenerated crossings.
    valid = valid & (t1 <= t_cov[:, None])
    if rays_mask is not None:
        valid = valid & rays_mask[:, None]

    truncated = t_cov < t_exit
    if rays_mask is not None:
        truncated = truncated & rays_mask  # masked rays: nothing to resume
    termination_planes = jnp.where(
        truncated, t_cov, jnp.where(has_seg, t_exit, near_planes)
    )
    terminated = ~truncated
    safe_t0 = jnp.where(jnp.isfinite(t0), t0, 0.0)
    safe_t1 = jnp.where(jnp.isfinite(t1), t1, 0.0)
    return TraversalResult(
        safe_t0, safe_t1, valid, termination_planes, terminated
    )


def traverse_grids(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    binaries: jnp.ndarray,
    aabbs: jnp.ndarray,
    near_planes: Optional[jnp.ndarray] = None,
    far_planes: Optional[jnp.ndarray] = None,
    step_size: float = 1e-3,
    cone_angle: float = 0.0,
    traverse_steps_limit: Optional[int] = None,
    over_allocate: bool = False,
    rays_mask: Optional[jnp.ndarray] = None,
    max_samples: int = 1024,
) -> Tuple[RayIntervals, RaySamples, jnp.ndarray]:
    """Reference-compatible wrapper around :func:`traverse_grids_padded`.

    Returns padded-layout :class:`RayIntervals` / :class:`RaySamples` whose
    ``is_left`` / ``is_right`` / ``is_valid`` masks carry the emission
    pattern, mirroring the shared-edge encoding of the reference
    (grid.cu:218-255): interval ``k`` spans edges ``k`` and ``k+1``.

    (reference: nerfacc/grid.py:93-192)
    """
    # The reference enforces the per-ray step cap in BOTH modes
    # (grid.cu:184,208): apply it whenever the caller passes one.
    limit = traverse_steps_limit
    if step_size <= 0.0:
        # one interval per voxel crossing (reference grid.cu:104-107)
        res = traverse_grids_voxel(
            rays_o,
            rays_d,
            binaries,
            aabbs,
            near_planes,
            far_planes,
            max_edges=max_samples + 1,
            rays_mask=rays_mask,
        )
        if limit is not None:
            n_before = jnp.cumsum(res.valid.astype(jnp.int32), axis=-1) - (
                res.valid.astype(jnp.int32)
            )
            res = res._replace(valid=res.valid & (n_before < limit))
    else:
        res = traverse_grids_padded(
            rays_o,
            rays_d,
            binaries,
            aabbs,
            near_planes,
            far_planes,
            step_size=step_size,
            cone_angle=cone_angle,
            max_samples=max_samples,
            rays_mask=rays_mask,
            valid_samples_limit=limit,
        )
    n_rays, K = res.valid.shape
    pad_false = jnp.zeros((n_rays, 1), dtype=bool)
    is_left = jnp.concatenate([res.valid, pad_false], axis=-1)
    is_right = jnp.concatenate([pad_false, res.valid], axis=-1)
    ray_ids = jnp.broadcast_to(
        jnp.arange(n_rays, dtype=jnp.int32)[:, None], (n_rays, K)
    )
    intervals = RayIntervals(
        vals=res.t_edges, is_left=is_left, is_right=is_right
    )
    samples = RaySamples(
        vals=res.t_mids, ray_indices=ray_ids, is_valid=res.valid
    )
    return intervals, samples, res.termination_planes


def _enlarge_aabb(aabb: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Scale an AABB about its center (reference: nerfacc/grid.py:195-198)."""
    center = (aabb[:3] + aabb[3:]) / 2
    extent = (aabb[3:] - aabb[:3]) / 2
    return jnp.concatenate([center - extent * factor, center + extent * factor])


def _query(
    x: jnp.ndarray, data: jnp.ndarray, base_aabb: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query multi-level grid values at points, selecting the mip level from
    the point's distance to the base AABB center.

    (reference: nerfacc/grid.py:201-237 — test helper.)
    """
    aabb_min, aabb_max = base_aabb[:3], base_aabb[3:]
    x_norm = (x - aabb_min) / (aabb_max - aabb_min)

    maxval = jnp.abs(x_norm - 0.5).max(axis=-1)
    maxval = jnp.clip(maxval, min=0.1)

    _, exponent = jnp.frexp(maxval)
    mip = jnp.clip(exponent + 1, min=0)
    selector = mip < data.shape[0]

    scale = jnp.asarray(2**mip, dtype=x.dtype)
    x_unit = (x_norm - 0.5) / scale[:, None] + 0.5

    resolution = jnp.asarray(data.shape[1:], dtype=jnp.int32)
    ix = (x_unit * resolution).astype(jnp.int32)
    ix = jnp.clip(ix, 0, resolution - 1)
    mip = jnp.clip(mip, max=data.shape[0] - 1)

    vals = data[mip, ix[:, 0], ix[:, 1], ix[:, 2]] * selector
    return vals, selector
