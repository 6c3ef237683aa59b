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
        ray_indices: (budget,) int32 ray id per slot. Empty trailing slots
            hold ``n_rays`` (one past the last ray) so the buffer stays
            nondecreasing — required by ``indices_sorted=True`` consumers —
            and out-of-range ids are dropped by every segment reduction.
        t_starts / t_ends: (budget,) sample bounds (0 for empty slots).
        valid: (budget,) slot holds a real sample.
        num_valid: () total real samples (<= budget; samples past the budget
            are dropped).
        overflow: () number of dropped samples (for the dynamic batch-size
            controller).
        first_incomplete_ray: () id of the first ray whose samples were
            truncated by the budget (== n_rays when nothing was dropped).
            Rays >= this id have wrong renders and must be masked out of any
            training loss.
        seg_starts / seg_ends: (n_rays,) first and last slot index of each
            ray's samples in the buffer (ends inclusive; ends < starts for
            empty rays).  Computed analytically from the per-ray counts so
            the compositing ops never need a searchsorted.
    """

    ray_indices: jnp.ndarray
    t_starts: jnp.ndarray
    t_ends: jnp.ndarray
    valid: jnp.ndarray
    num_valid: jnp.ndarray
    overflow: jnp.ndarray
    first_incomplete_ray: jnp.ndarray
    seg_starts: jnp.ndarray
    seg_ends: jnp.ndarray
    # per-sample ray origin/direction, carried through the compaction
    # payload gather when the traversal provides them (WindowSamples.rays_o)
    # — EXACT f32, no per-sample ray lookup needed downstream.  None for
    # the padded-traversal path.
    rays_o: Optional[jnp.ndarray] = None
    rays_d: Optional[jnp.ndarray] = None
    # optional extra per-sample channels (e.g. resumable prefix
    # transmittance in the pooled inference renderer)
    extras: Optional[jnp.ndarray] = None


@functools.partial(jax.jit, static_argnames=("budget",))
def compact_samples(res: TraversalResult, budget: int) -> CompactSamples:
    """Gather valid padded samples into a flat fixed-size buffer, preserving
    (ray, sample) order — the static-shape analog of the reference's packed
    layout (reference: cuda/csrc/grid.cu:405-471 exact two-pass alloc).

    Implemented as a key sort (valid candidates keep their original order
    key, invalid ones are pushed past the end) followed by one narrow
    row-gather of the surviving slots — TPU sorts are fast and scatters are
    not, so sort-compaction is ~6x cheaper than a scatter here.
    """
    n_rays, K = res.valid.shape
    n = n_rays * K
    flat_valid = res.valid.reshape(-1)
    iota = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(flat_valid, iota, iota + n)
    _, order = jax.lax.sort_key_val(keys, iota)
    sel = order[:budget]  # first `budget` valid candidates, in order
    if budget > n:  # small shards can have fewer candidates than the budget
        sel = jnp.concatenate(
            [sel, jnp.zeros((budget - n,), jnp.int32)]
        )

    payload = jnp.stack(
        [res.t_starts.reshape(-1), res.t_ends.reshape(-1)], axis=-1
    )
    rows = jnp.take(payload, sel, axis=0)  # (budget, 2)
    g_t0, g_t1 = rows[:, 0], rows[:, 1]
    counts = jnp.sum(res.valid.astype(jnp.int32), axis=-1)  # (n_rays,)
    total = jnp.sum(counts)
    num_valid = jnp.minimum(total, budget)
    valid = jnp.arange(budget, dtype=jnp.int32) < num_valid
    # Invalid slots get ray id n_rays (NOT 0): compaction preserves order, so
    # only a fill value >= every real id keeps the buffer sorted — a 0 fill
    # breaks the segment ends used by the sorted reductions and corrupts
    # per-ray sums whenever the buffer is partially filled.
    out_ray = jnp.where(valid, sel // K, n_rays).astype(jnp.int32)
    out_t0 = jnp.where(valid, g_t0, 0.0)
    out_t1 = jnp.where(valid, g_t1, 0.0)
    overflow = total - num_valid
    # Segment boundaries, analytically: compaction preserves ray order, so
    # ray r's kept samples occupy [cumsum(counts)[r-1], ...+counts[r]) cut
    # at the budget.  (Saves the compositing ops a searchsorted each.)
    ends_excl = jnp.cumsum(counts)
    seg_starts = jnp.minimum(ends_excl - counts, budget).astype(jnp.int32)
    seg_ends = (jnp.minimum(ends_excl, budget) - 1).astype(jnp.int32)
    # The sort keeps (ray, sample) order, so truncation hits a ray suffix:
    # the first dropped sample's ray and everything after it is incomplete.
    last_kept_ray = out_ray[jnp.maximum(num_valid - 1, 0)]
    first_incomplete = jnp.where(
        overflow > 0, last_kept_ray, jnp.asarray(n_rays, jnp.int32)
    )
    return CompactSamples(
        out_ray, out_t0, out_t1, valid, num_valid, overflow, first_incomplete,
        seg_starts, seg_ends,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "budget", "n_rays", "step_size", "cone_angle", "compaction"
    ),
)
def compact_samples_from_windows(
    ws,
    budget: int,
    n_rays: int,
    extras: Optional[jnp.ndarray] = None,
    step_size: Optional[float] = None,
    cone_angle: float = 0.0,
    compaction: str = "onehot",
) -> CompactSamples:
    """Compact a :class:`~nerfacc_tpu.grid.WindowSamples` pool into the flat
    fixed-budget sample buffer (same contract as :func:`compact_samples`).

    The pool is already (ray, window)-ordered, so a stable compaction of
    ``window_budget * window_size`` candidates suffices — this is 2-3x
    smaller than compacting the padded ``(n_rays, max_samples)`` layout.
    ``compaction="onehot"`` (default) sorts a SINGLE operand (the p-th
    kept candidate is recovered as ``key % n``), halving the sort
    network's data movement vs the legacy ``"sort"`` (key, value) sort —
    bit-identical outputs (tested).  See the in-body comment for why the
    sort, not the ops/compaction.py cumsum inversion, is the right
    algorithm at THIS stage's shapes.

    With ``step_size`` given (and the pool carrying ``near``/``wk``), the
    payload is WINDOW-granular: one ``(budget,)`` row gather of the
    per-window table [ray, near, wk, o, d, extras...] at ``sel // f``, and
    each sample's (t_start, t_end) is recomputed from the closed-form
    marching orbit — the same expression the fine phase evaluated, so the
    values are bit-identical.  This replaces the per-sample payload table
    (whose (Wb*f, 6) broadcast + reshape materialization cost ~0.6 ms/step
    at bench shapes) with pure per-sample arithmetic.  Without
    ``step_size`` the legacy per-sample-table gather runs.
    """
    from ..grid import _orbit_t

    Wb, f = ws.valid.shape
    n = Wb * f
    analytic = step_size is not None and ws.near is not None

    # Stable compaction via one order-preserving key sort.  A
    # cumsum-inversion alternative (ops/compaction.py) was built and
    # measured at this stage's shapes (budget 2^18 outputs over ~52k
    # windows): every (budget, ~256) f32 intermediate it needs is a
    # >=134 MB HBM pass, and it lost to the sort end-to-end (18.6M vs
    # 23.1M samples/s) — the inversion only pays where the output count
    # is small (the WINDOW stage, see traverse_grids_pooled).  What does
    # pay here: compaction="onehot" (default) sorts ONE operand instead
    # of (key, value) — the value is recoverable as ``key % n`` since
    # valid keys are their own iota and invalid keys are iota + n —
    # halving the sort network's data movement, bit-identically.
    flat_valid = ws.valid.reshape(-1)
    iota = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(flat_valid, iota, iota + n)
    if compaction == "onehot":
        sel = jax.lax.sort(keys)[:budget] % n
    else:
        _, order = jax.lax.sort_key_val(keys, iota)
        sel = order[:budget]
    if budget > n:
        sel = jnp.concatenate([sel, jnp.zeros((budget - n,), jnp.int32)])
    total = jnp.sum(ws.counts)
    sel_w = sel // f
    lane_sel = (sel % f).astype(jnp.float32)

    num_valid = jnp.minimum(total, budget)
    valid = jnp.arange(budget, dtype=jnp.int32) < num_valid

    if analytic:
        per_window = [
            ws.ray_ids.astype(jnp.float32)[:, None],
            ws.near[:, None],
            ws.wk.astype(jnp.float32)[:, None],
            ws.rays_o,
            ws.rays_d,
        ]
        if extras is not None:
            per_window.append(
                extras[:, None] if extras.ndim == 1 else extras
            )
        pw = jnp.concatenate(per_window, axis=-1)  # (Wb, 9 + C)
        rows = jnp.take(pw, sel_w, axis=0)  # (budget, 9 + C)
        lane = lane_sel
        ex_off = 9
        k = rows[:, 2] + lane  # orbit index of the sample
        t0 = _orbit_t(rows[:, 1:2], k[:, None], step_size, cone_angle)[:, 0]
        t1 = _orbit_t(
            rows[:, 1:2], k[:, None] + 1.0, step_size, cone_angle
        )[:, 0]
        out_ray = jnp.where(valid, rows[:, 0].astype(jnp.int32), n_rays)
        out_t0 = jnp.where(valid, t0, 0.0)
        out_t1 = jnp.where(valid, t1, 0.0)
        out_o = jnp.where(valid[:, None], rows[:, 3:6], 0.0)
        out_d = jnp.where(valid[:, None], rows[:, 6:9], 0.0)
        out_extras = (
            jnp.where(valid[:, None], rows[:, ex_off:], 0.0)
            if extras is not None
            else None
        )
    else:
        ray_f = jnp.broadcast_to(
            ws.ray_ids[:, None].astype(jnp.float32), (Wb, f)
        ).reshape(-1)
        per_window = [ws.rays_o, ws.rays_d]
        if extras is not None:
            per_window.append(
                extras[:, None] if extras.ndim == 1 else extras
            )
        pw = jnp.concatenate(per_window, axis=-1)  # (Wb, 6 + C)
        n_pw = pw.shape[-1]
        payload = jnp.concatenate(
            [
                jnp.stack(
                    [ws.t_starts.reshape(-1), ws.t_ends.reshape(-1), ray_f],
                    axis=-1,
                ),
                jnp.broadcast_to(
                    pw[:, None, :], (Wb, f, n_pw)
                ).reshape(n, n_pw),
            ],
            axis=-1,
        )
        rows = jnp.take(payload, sel, axis=0)  # (budget, 3 + 6 + C)
        out_ray = jnp.where(valid, rows[:, 2].astype(jnp.int32), n_rays)
        out_t0 = jnp.where(valid, rows[:, 0], 0.0)
        out_t1 = jnp.where(valid, rows[:, 1], 0.0)
        out_o = jnp.where(valid[:, None], rows[:, 3:6], 0.0)
        out_d = jnp.where(valid[:, None], rows[:, 6:9], 0.0)
        out_extras = (
            jnp.where(valid[:, None], rows[:, 9:], 0.0)
            if extras is not None
            else None
        )
    overflow = total - num_valid
    ends_excl = jnp.cumsum(ws.counts)
    seg_starts = jnp.minimum(ends_excl - ws.counts, budget).astype(jnp.int32)
    seg_ends = (jnp.minimum(ends_excl, budget) - 1).astype(jnp.int32)
    last_kept_ray = out_ray[jnp.maximum(num_valid - 1, 0)]
    first_incomplete = jnp.where(
        overflow > 0, last_kept_ray, jnp.asarray(n_rays, jnp.int32)
    )
    return CompactSamples(
        out_ray, out_t0, out_t1, valid, num_valid, overflow, first_incomplete,
        seg_starts, seg_ends, out_o, out_d, out_extras,
    )


def render_rays_with_occgrid(
    rgb_sigma_fn: Callable,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    samples: CompactSamples,
    render_bkgd: Optional[jnp.ndarray] = None,
    expected_depths: bool = True,
    prefix_trans: Optional[jnp.ndarray] = None,
    prefix_trans_samples: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Differentiable composite of a compacted sample buffer.

    Args:
        rgb_sigma_fn: ``(positions (N,3), dirs (N,3), ray_indices (N,)) ->
            (rgbs (N,3), sigmas (N,))`` evaluated only on the flat budget
            buffer (``ray_indices`` lets time/appearance-conditioned fields
            look up per-ray extras).
        rays_o / rays_d: (n_rays, 3).
        samples: a :class:`CompactSamples`.  If it carries per-sample
            ``rays_o``/``rays_d`` (the pooled-traversal compaction does),
            those exact values are used and no per-sample ray lookup runs.
        prefix_trans: optional (n_rays, 1) per-ray transmittance carried in
            from earlier marching rounds (the reference's resumable
            ``prefix_trans``, examples/utils.py:384-391) — enables chunked /
            multi-round rendering where opacity accumulates across calls.
        prefix_trans_samples: the same, already per-sample ``(budget,)``
            (e.g. carried through the compaction payload) — preferred.

    Returns:
        colors (n_rays, 3), opacities (n_rays, 1), depths (n_rays, 1), extras.
    """
    n_rays = rays_o.shape[0]
    t_mid = 0.5 * (samples.t_starts + samples.t_ends)
    pt_samples = prefix_trans_samples
    if samples.rays_o is not None:
        o, d = samples.rays_o, samples.rays_d
        if pt_samples is None and prefix_trans is not None:
            from ..ops.sorted_segments import spread_table

            pt_samples = spread_table(
                prefix_trans[:, 0], samples.ray_indices, n_rays
            )
    else:
        # padded-path fallback: per-sample ray lookup via the exact one-hot
        # limb spread (empty slots hold ray id n_rays -> o = d = 0,
        # harmless NaN-free positions, outputs masked by w = 0)
        from ..ops.sorted_segments import spread_table

        ray_table = jnp.concatenate([rays_o, rays_d], axis=-1)
        if prefix_trans is not None:
            ray_table = jnp.concatenate([ray_table, prefix_trans], axis=-1)
        od = spread_table(ray_table, samples.ray_indices, n_rays)
        o, d = od[:, :3], od[:, 3:6]
        if pt_samples is None and prefix_trans is not None:
            pt_samples = od[:, 6]
    positions = o + t_mid[:, None] * d
    gather_ids = jnp.minimum(samples.ray_indices, n_rays - 1)

    rgbs, sigmas = rgb_sigma_fn(positions, d, gather_ids)

    weights, trans, alphas = render_weight_from_density(
        samples.t_starts,
        samples.t_ends,
        sigmas,
        ray_indices=samples.ray_indices,
        n_rays=n_rays,
        masks=samples.valid,
        prefix_trans=pt_samples,
        indices_sorted=True,
        seg_starts=samples.seg_starts,
        seg_ends=samples.seg_ends,
    )
    # One fused scatter-free accumulation for rgb (3), opacity (1), depth (1)
    # — compacted ray indices are sorted by construction.
    packed = jnp.concatenate(
        [rgbs, jnp.ones_like(t_mid[:, None]), t_mid[:, None]], axis=-1
    )
    from ..ops.sorted_segments import segment_sum_sorted

    accum = segment_sum_sorted(
        weights[:, None] * packed,
        samples.ray_indices,
        n_rays,
        samples.seg_starts,
        samples.seg_ends,
    )
    colors = accum[:, :3]
    opacities = accum[:, 3:4]
    depths = accum[:, 4:5]
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


def render_rays_occgrid_test(
    field_fn: Callable,
    occ_state,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    render_bkgd: Optional[jnp.ndarray] = None,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    render_step_size: float = 5e-3,
    cone_angle: float = 0.0,
    early_stop_eps: float = 1e-4,
    window: int = 64,
    max_iters: int = 64,
    expected_depths: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Iterative alive-ray inference renderer — fixed shapes, jittable.

    TPU-native analog of the reference's Instant-NGP-style test renderer
    (reference: examples/utils.py:267-439): march alive rays a fixed
    candidate ``window`` at a time, composite incrementally with resumable
    transmittance (``prefix_trans``), kill rays that saturate opacity or run
    out of scene, resume survivors from their termination planes.  All state
    is (n_rays,)-shaped, so the whole loop is one ``lax.while_loop``.

    Args:
        field_fn: ``(positions, dirs) -> (rgbs, sigmas)``.
        occ_state: :class:`OccGridState`.

    Returns:
        colors (n_rays, 3), opacities (n_rays, 1), depths (n_rays, 1).
    """
    from ..estimators.occ_grid import OccGridState  # noqa: F401
    from ..grid import traverse_grids_padded

    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype

    def cond(carry):
        i, near, alive, *_ = carry
        return (i < max_iters) & jnp.any(alive)

    def body(carry):
        i, near, alive, color, opacity, depth = carry
        res = traverse_grids_padded(
            rays_o,
            rays_d,
            occ_state.binaries,
            occ_state.aabbs,
            near_planes=near,
            far_planes=jnp.full((n_rays,), far_plane, dtype),
            step_size=render_step_size,
            cone_angle=cone_angle,
            max_samples=window,
            rays_mask=alive,
        )
        t0, t1, valid = res.t_starts, res.t_ends, res.valid
        t_mid = 0.5 * (t0 + t1)
        pos = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
        dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)
        rgbs, sigmas = field_fn(pos.reshape(-1, 3), dirs.reshape(-1, 3))
        rgbs = rgbs.reshape(n_rays, window, 3)
        sigmas = sigmas.reshape(n_rays, window)

        prefix_trans = jnp.broadcast_to(
            (1.0 - opacity), (n_rays, window)
        )
        weights, trans, alphas = render_weight_from_density(
            t0, t1, sigmas, masks=valid, prefix_trans=prefix_trans
        )
        color = color + jnp.sum(weights[..., None] * rgbs, axis=1)
        opacity = opacity + jnp.sum(weights, axis=1, keepdims=True)
        depth = depth + jnp.sum(weights * t_mid, axis=1, keepdims=True)

        alive = alive & ~res.terminated & (
            opacity[:, 0] <= 1.0 - early_stop_eps
        )
        return (i + 1, res.termination_planes, alive, color, opacity, depth)

    near0 = jnp.full((n_rays,), near_plane, dtype)
    init = (
        jnp.zeros((), jnp.int32),
        near0,
        jnp.ones((n_rays,), bool),
        jnp.zeros((n_rays, 3), dtype),
        jnp.zeros((n_rays, 1), dtype),
        jnp.zeros((n_rays, 1), dtype),
    )
    _, _, _, color, opacity, depth = jax.lax.while_loop(cond, body, init)

    if expected_depths:
        depth = depth / jnp.clip(opacity, min=jnp.finfo(dtype).eps)
    if render_bkgd is not None:
        color = color + render_bkgd * (1.0 - opacity)
    return color, opacity, depth


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
            lambda p, dd, rid: field_fn(p, dd), o, d, samples, render_bkgd=bkgd
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


def make_pooled_eval_round(
    field_fn: Callable,
    occ_state,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    render_step_size: float = 5e-3,
    cone_angle: float = 0.0,
    early_stop_eps: float = 1e-4,
    budget: int = 1 << 18,
    window_budget: Optional[int] = None,
    window_size: int = 8,
    max_coarse: int = 160,
):
    """One marching ROUND of the pooled inference renderer, as a pure
    function suitable for ``jax.jit``.

    Inference with the full-batch while-loop renderer
    (:func:`render_rays_occgrid_test`) pays (n_rays, window) field work per
    iteration until the LAST ray dies — the straggler tail costs full-batch
    iterations.  This renderer instead marches with the pooled traversal +
    flat compaction used by the train step: each round samples up to
    ``budget`` real samples across the whole chunk (dead rays cost nothing),
    composites them with resumable ``prefix_trans``, and reports per-ray
    resume planes.  2-3 rounds finish a typical chunk vs ~32 window
    iterations — ~10x faster at eval (measured 1.57 s -> 0.16 s per 256^2
    frame).

    Resume semantics (exact):
      * pool-truncated rays resume from ``ws.termination_planes``
        (the traversal's own resumable contract);
      * budget-truncated rays resume from the ``t_end`` of their last kept
        sample — the space between consecutive valid samples is empty by
        construction, so re-marching from there re-finds exactly the
        dropped samples;
      * untouched rays keep their current near plane.

    Returns:
        ``round_fn(rays_o, rays_d, near, alive, color, opacity, depth) ->
        (near', alive', color', opacity', depth')`` — accumulates into the
        running image; loop it (host-side) until ``alive`` empties.
    """
    from ..grid import traverse_grids_pooled

    wb = window_budget if window_budget is not None else max(budget // 4, 1024)

    def round_fn(rays_o, rays_d, near, alive, color, opacity, depth):
        n_rays = rays_o.shape[0]
        dtype = rays_o.dtype
        ws = traverse_grids_pooled(
            rays_o,
            rays_d,
            occ_state.binaries,
            occ_state.aabbs,
            near_planes=near,
            far_planes=jnp.full((n_rays,), far_plane, dtype),
            step_size=render_step_size,
            cone_angle=cone_angle,
            window_budget=wb,
            window_size=window_size,
            max_coarse=max_coarse,
            rays_mask=alive,
        )
        # resumable transmittance rides the compaction payload: one cheap
        # per-window gather instead of any per-sample lookup.  Clamp to
        # [0, 1]: fp overshoot can push accumulated opacity slightly past 1,
        # and a NEGATIVE prefix would flip this round's weights and set up
        # an amplifying opacity oscillation across rounds (the round-5
        # opaque eval break, scripts/diag_eval_break.py).
        prefix_w = jnp.take(
            jnp.clip(1.0 - opacity[:, 0], 0.0, 1.0),
            jnp.minimum(ws.ray_ids, n_rays - 1),
        )
        samples = compact_samples_from_windows(
            ws, budget, n_rays, extras=prefix_w,
            step_size=render_step_size, cone_angle=cone_angle,
        )

        def rgb_sigma_fn(positions, dirs, ray_indices):
            rgbs, sigmas = field_fn(positions, dirs)
            return rgbs, sigmas

        c, o_add, d_add, _ = render_rays_with_occgrid(
            rgb_sigma_fn,
            rays_o,
            rays_d,
            samples,
            render_bkgd=None,
            expected_depths=False,
            prefix_trans_samples=samples.extras[:, 0],
        )
        color = color + c
        opacity = opacity + o_add
        depth = depth + d_add

        # resume planes
        counts = ws.counts
        ends_excl = jnp.cumsum(counts)
        kept = jnp.clip(
            jnp.asarray(samples.t_starts.shape[0], jnp.int32)
            - (ends_excl - counts),
            0,
            counts,
        )
        fully = kept == counts
        last_idx = jnp.clip(
            samples.seg_starts + kept - 1, 0, samples.t_starts.shape[0] - 1
        )
        t_last = jnp.take(samples.t_ends, last_idx)
        resume = jnp.where(
            fully,
            ws.termination_planes,
            jnp.where(kept > 0, t_last, near),
        )
        alive = (
            alive
            & (opacity[:, 0] <= 1.0 - early_stop_eps)
            & ~(fully & ws.terminated)
        )
        resume = jnp.where(alive, resume, near)
        return resume, alive, color, opacity, depth

    return round_fn


def make_cursor_eval_chunk(
    field_fn: Callable,
    occ_state,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    render_step_size: float = 5e-3,
    cone_angle: float = 0.0,
    early_stop_eps: float = 1e-4,
    sample_budget: int = 1 << 17,
    window_size: int = 8,
    max_coarse: int = 160,
    fine_probes: int = 0,
    window_budget: Optional[int] = None,
    max_windows: int = 1 << 17,
    max_rounds: int = 64,
    max_recoarse: int = 4,
):
    """Cursor-based pooled inference renderer — one jittable function per
    chunk, coarse phase hoisted OUT of the round loop.

    The previous pooled renderer (:func:`make_pooled_eval_round`) re-ran the
    full coarse window phase (orbit + segment events + pooled-occupancy
    tests over ``n_rays * max_coarse`` windows, ~8 ms at 8k rays) plus a
    fresh ``n_rays * max_coarse``-key window sort on every resume round,
    although a resumed ray re-derives exactly the same surviving windows it
    already found.  Here the coarse phase runs ONCE per chunk into a
    :class:`~nerfacc_tpu.grid.CoarsePool` (ray-major sorted window list),
    and each round consumes the next windows per ray via a cursor
    (:func:`~nerfacc_tpu.grid.pooled_round_from_coarse`) — per-round cost
    drops to the fine probes + field + composite on the actual pool.
    Saturated rays stop contributing windows between rounds (resumable
    ``prefix_trans`` compositing, reference examples/utils.py:384-391);
    rays that outrun the window list or the coarse sweep re-coarse from
    their resume planes in a rare outer iteration.

    Returns ``chunk_fn(rays_o, rays_d) -> (color, opacity, depth)`` — pure;
    jit it once per (field, occ_state donation) pattern.
    """
    from ..grid import build_coarse_pool, pooled_round_from_coarse

    f = window_size
    wb = (
        window_budget
        if window_budget is not None
        else max((3 * sample_budget) // (2 * f), 1024)
    )

    def chunk_fn(rays_o, rays_d):
        n_rays = rays_o.shape[0]
        dtype = rays_o.dtype
        far = jnp.full((n_rays,), far_plane, dtype)

        def composite(ws, color, opacity, depth):
            # clamped like make_pooled_eval_round: a negative prefix from
            # opacity overshoot amplifies round-over-round (eval break).
            prefix_w = jnp.take(
                jnp.clip(1.0 - opacity[:, 0], 0.0, 1.0),
                jnp.minimum(ws.ray_ids, n_rays - 1),
            )
            samples = compact_samples_from_windows(
                ws, sample_budget, n_rays, extras=prefix_w,
                step_size=render_step_size, cone_angle=cone_angle,
            )
            c, o_add, d_add, _ = render_rays_with_occgrid(
                lambda p, dd, rid: field_fn(p, dd),
                rays_o,
                rays_d,
                samples,
                render_bkgd=None,
                expected_depths=False,
                prefix_trans_samples=samples.extras[:, 0],
            )
            return color + c, opacity + o_add, depth + d_add

        def outer_cond(carry):
            i, near, active, *_ = carry
            return (i < max_recoarse) & jnp.any(active)

        def outer_body(carry):
            i, near, active, color, opacity, depth = carry
            cpool = build_coarse_pool(
                rays_o, rays_d, occ_state.binaries, occ_state.aabbs,
                near, far, render_step_size, cone_angle, max_coarse, f,
                max_windows=max_windows, rays_mask=active,
            )

            def inner_cond(c):
                j, cursor, alive, *_ = c
                return (j < max_rounds) & jnp.any(alive)

            def inner_body(c):
                j, cursor, alive, color, opacity, depth = c
                ws, advance = pooled_round_from_coarse(
                    cpool, cursor, alive,
                    occ_state.binaries, occ_state.aabbs,
                    render_step_size, cone_angle, max_coarse, f,
                    wb, sample_budget, fine_probes,
                )
                color, opacity, depth = composite(
                    ws, color, opacity, depth
                )
                cursor = cursor + advance
                alive = (
                    alive
                    & (opacity[:, 0] <= 1.0 - early_stop_eps)
                    & (cursor < cpool.counts_w)
                )
                return (j + 1, cursor, alive, color, opacity, depth)

            init = (
                jnp.zeros((), jnp.int32),
                jnp.zeros((n_rays,), jnp.int32),
                active & (cpool.counts_w > 0),
                color,
                opacity,
                depth,
            )
            _, cursor, _, color, opacity, depth = jax.lax.while_loop(
                inner_cond, inner_body, init
            )
            unsat = opacity[:, 0] <= 1.0 - early_stop_eps
            active = (
                active
                & unsat
                & cpool.needs_recoarse
                & (cursor >= cpool.counts_w)
            )
            near = jnp.where(active, cpool.resume_planes, near)
            return (i + 1, near, active, color, opacity, depth)

        init = (
            jnp.zeros((), jnp.int32),
            jnp.full((n_rays,), near_plane, dtype),
            jnp.ones((n_rays,), bool),
            jnp.zeros((n_rays, 3), dtype),
            jnp.zeros((n_rays, 1), dtype),
            jnp.zeros((n_rays, 1), dtype),
        )
        _, _, _, color, opacity, depth = jax.lax.while_loop(
            outer_cond, outer_body, init
        )
        return color, opacity, depth

    return chunk_fn


def render_rays_occgrid_pooled(
    field_fn: Callable,
    occ_state,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    render_bkgd: Optional[jnp.ndarray] = None,
    max_rounds: int = 16,
    expected_depths: bool = True,
    jit_round: bool = False,
    **round_kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Standalone pooled inference renderer (see
    :func:`make_pooled_eval_round`): host-loops the round function until no
    rays are alive.  Callers that render many chunks should build + jit the
    round function once instead (the trainer does)."""
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype
    round_fn = make_pooled_eval_round(field_fn, occ_state, **round_kwargs)
    if jit_round:
        round_fn = jax.jit(round_fn)
    near = jnp.full(
        (n_rays,), round_kwargs.get("near_plane", 0.0), dtype
    )
    alive = jnp.ones((n_rays,), bool)
    color = jnp.zeros((n_rays, 3), dtype)
    opacity = jnp.zeros((n_rays, 1), dtype)
    depth = jnp.zeros((n_rays, 1), dtype)
    import numpy as _np

    for _ in range(max_rounds):
        near, alive, color, opacity, depth = round_fn(
            rays_o, rays_d, near, alive, color, opacity, depth
        )
        if not bool(_np.any(_np.asarray(alive))):
            break
    if expected_depths:
        depth = depth / jnp.clip(opacity, min=jnp.finfo(dtype).eps)
    if render_bkgd is not None:
        color = color + render_bkgd * (1.0 - opacity)
    return color, opacity, depth
