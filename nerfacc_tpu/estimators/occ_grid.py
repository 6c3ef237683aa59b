"""Occupancy-grid transmittance estimator (Instant-NGP style).

TPU-native rebuild of the reference ``OccGridEstimator``
(reference: nerfacc/estimators/occ_grid.py:14-404).  The estimator state is a
pytree (:class:`OccGridState`) and every operation has a pure functional form
(``sampling_padded``, ``update_occ_grid``) so the whole train step — sampling,
rendering, loss, grid update — can live inside one ``jit``.  The class
wrapper mirrors the reference's stateful OO API for parity and tests.

Shape policy: sampling returns padded ``(n_rays, max_samples)`` buffers with
a validity mask (static shapes); the reference's exact-size flattened layout
is available through the non-jittable :meth:`OccGridEstimator.sampling`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import (
    TraversalResult,
    WindowSamples,
    _enlarge_aabb,
    traverse_grids_padded,
    traverse_grids_pooled,
    traverse_grids_windowed,
)
from ..volrend import (
    render_visibility_from_alpha,
    render_visibility_from_density,
)
from .base import AbstractEstimator


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class OccGridState:
    """Occupancy grid buffers (reference: occ_grid.py:66-75).

    Attributes:
        aabbs: (levels, 6); level ``i`` is the roi enlarged by ``2**i``.
        occs: (levels * cells_per_lvl,) float EMA occupancy; ``-1`` marks
            cells invisible to every camera (``mark_invisible_cells``).
        binaries: (levels, rx, ry, rz) bool occupancy used by traversal.
    """

    aabbs: jnp.ndarray
    occs: jnp.ndarray
    binaries: jnp.ndarray

    @property
    def levels(self) -> int:
        return self.binaries.shape[0]

    @property
    def resolution(self) -> Tuple[int, int, int]:
        return self.binaries.shape[1:]

    @property
    def cells_per_lvl(self) -> int:
        rx, ry, rz = self.binaries.shape[1:]
        return rx * ry * rz

    def tree_flatten(self):
        return ((self.aabbs, self.occs, self.binaries), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_occ_grid(
    roi_aabb: Union[List[float], jnp.ndarray],
    resolution: Union[int, List[int]] = 128,
    levels: int = 1,
) -> OccGridState:
    """Create an all-empty occupancy grid state (reference: occ_grid.py:29-83)."""
    if isinstance(resolution, int):
        resolution = [resolution] * 3
    resolution = tuple(int(r) for r in resolution)
    assert len(resolution) == 3

    roi_aabb = jnp.asarray(roi_aabb, dtype=jnp.float32)
    assert roi_aabb.shape[0] == 6
    aabbs = jnp.stack(
        [_enlarge_aabb(roi_aabb, 2**i) for i in range(levels)], axis=0
    )
    cells = int(np.prod(resolution))
    return OccGridState(
        aabbs=aabbs,
        occs=jnp.zeros((levels * cells,), jnp.float32),
        binaries=jnp.zeros((levels,) + resolution, bool),
    )


def _cell_coords(ids: jnp.ndarray, resolution: Tuple[int, int, int]) -> jnp.ndarray:
    """Flat cell id -> (ix, iy, iz), row-major as in ``_meshgrid3d``."""
    rx, ry, rz = resolution
    iz = ids % rz
    iy = (ids // rz) % ry
    ix = ids // (ry * rz)
    return jnp.stack([ix, iy, iz], axis=-1)


def _chunked_eval(
    fn: Callable, x: jnp.ndarray, chunk: int = 2**21
) -> jnp.ndarray:
    """Evaluate ``fn`` over (N, 3) points in sequential chunks via
    ``lax.map`` to bound peak memory (the occupancy warmup touches millions
    of cells; evaluating them at once OOMs the hash-grid intermediates).
    Chunks are large (2^18) — sequential chunks serialize the update, so
    fewer/larger is faster as long as intermediates fit HBM."""
    n = x.shape[0]
    if n <= chunk:
        return fn(x)
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)])
    out = jax.lax.map(fn, x.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


def _eval_cells(
    state: OccGridState,
    cell_ids: jnp.ndarray,  # (levels, n) flat ids within a level
    key: jax.Array,
    occ_eval_fn: Callable,
    eval_chunk: int = 2**21,
) -> jnp.ndarray:
    """Query occupancy at a uniformly-jittered point inside each voxel.

    (reference: occ_grid.py:385-392)
    """
    levels, n = cell_ids.shape
    res = jnp.asarray(state.resolution, jnp.float32)
    coords = _cell_coords(cell_ids, state.resolution).astype(jnp.float32)
    jitter = jax.random.uniform(key, (levels, n, 3), jnp.float32)
    x = (coords + jitter) / res  # in [0, 1]^3
    lo = state.aabbs[:, None, :3]
    hi = state.aabbs[:, None, 3:]
    x_world = lo + x * (hi - lo)
    occ = _chunked_eval(
        lambda pts: jnp.reshape(occ_eval_fn(pts), (-1,)),
        x_world.reshape(-1, 3),
        chunk=eval_chunk,
    )
    return occ.reshape(levels, n)


def _ema_update(
    occs: jnp.ndarray,
    flat_ids: jnp.ndarray,
    occ_vals: jnp.ndarray,
    update_mask: jnp.ndarray,
    ema_decay: float,
) -> jnp.ndarray:
    """Duplicate-safe EMA-max scatter ``occs[ids] = max(occs[ids]*decay, occ)``.

    (reference: occ_grid.py:395-398; the reference's plain index assignment is
    write-order nondeterministic for duplicate ids — this uses scatter-max.)
    """
    n = occs.shape[0]
    safe_ids = jnp.where(update_mask, flat_ids, n)  # out-of-range -> dropped
    touched = (
        jnp.zeros((n,), bool).at[safe_ids].set(True, mode="drop")
    )
    occs = jnp.where(touched, occs * ema_decay, occs)
    return occs.at[safe_ids].max(occ_vals, mode="drop")


def update_occ_grid(
    state: OccGridState,
    key: jax.Array,
    step: jnp.ndarray,
    occ_eval_fn: Callable,
    occ_thre: float = 1e-2,
    ema_decay: float = 0.95,
    warmup_steps: int = 256,
    dense: bool = False,
    eval_chunk: int = 2**21,
    dense_stripes: int = 1,
    update_interval: int = 16,
) -> OccGridState:
    """One EMA occupancy update — pure, jittable (reference: occ_grid.py:366-404).

    During warmup all cells are updated; afterwards 1/4 of the cells are
    sampled uniformly plus an equal number drawn uniformly from the occupied
    cells (reference: occ_grid.py:345-364 — realized here as a fixed-shape
    ``categorical`` over the binary mask instead of ``nonzero``).

    ``dense=True`` refreshes ALL cells every update instead (the warmup
    path).  On TPU the reference's sparse sampled update is
    counterproductive: the occupied-cell draw needs a 2M-key sort and the
    sparse write needs two ~1M-row scatters (~20 ms together), while the
    extra field evaluations of the dense path ride the MXU (~6 ms) — and
    every cell refreshes 4x more often than the reference's schedule.

    ``eval_chunk`` bounds the number of cells fed to ``occ_eval_fn`` per
    sequential chunk — fields with layout-padded intermediates (the hash
    encoder's (n, L, 8) tensors tile-pad 16x on TPU) OOM at the default
    whole-grid chunk and advertise a smaller ``max_eval_chunk``.

    ``dense_stripes`` (dense mode only): once past ``warmup_steps``, each
    update refreshes ONE rotating contiguous 1/S stripe of every level's
    cells instead of the whole grid — still scatter-free (the EMA lands via
    ``dynamic_update_slice``), at 1/S the field evaluations.  Every cell is
    revisited every ``S * update_interval`` steps (update_interval is only
    used to derive the stripe cursor from ``step``); during warmup the full
    grid refreshes every update as before.  S=1 (default) is the full dense
    refresh.  On revisit the EMA applies ``ema_decay ** S`` so a cell's
    occupancy decays at the same per-step rate as under the dense path
    (per-update decay alone would let stale occupied cells persist ~S x
    longer); between revisits a cell's value — and the binarization built
    from it — is simply S-updates stale, which is the scheme's one real
    divergence from dense refresh.
    """
    levels = state.levels
    cells = state.cells_per_lvl
    k_all, k_uni, k_occ, k_eval = jax.random.split(key, 4)

    def warmup_update(state: OccGridState) -> OccGridState:
        # all cells in layout order: the EMA-max is a dense elementwise
        # update — no scatter needed (scatters cost ~7 ms per 1M rows here)
        all_ids = jnp.broadcast_to(
            jnp.arange(cells, dtype=jnp.int32)[None, :], (levels, cells)
        )
        occ = _eval_cells(
            state, all_ids, k_eval, occ_eval_fn, eval_chunk
        ).reshape(-1)
        visible = state.occs >= 0.0
        occs = jnp.where(
            visible, jnp.maximum(state.occs * ema_decay, occ), state.occs
        )
        return dataclasses.replace(state, occs=occs)

    def sampled_update(state: OccGridState) -> OccGridState:
        n = cells // 4
        uniform_ids = jax.random.randint(
            k_uni, (levels, n), 0, cells, dtype=jnp.int32
        )
        bin_flat = state.binaries.reshape(levels, cells)
        # Uniform sample of occupied cells without replacement via one key
        # sort: occupied cells get random keys below every empty cell's key,
        # so the first n sorted ids are a uniform occupied subset.  (The
        # reference uses nonzero()+randint, occ_grid.py:356-361 — dynamic
        # shapes; a categorical over 2M cells is quadratic on TPU.)
        # Keys are bit-packed int32 (empty flag in bit 30, 24 random bits)
        # and sorted flat 1-D: a 2-D f32 sort of (levels, 2M) measured 25 ms
        # on-chip vs ~4 ms for the flat int32 sort.
        rbits = jax.random.bits(k_occ, (levels * cells,)).astype(jnp.uint32)
        keys = ((rbits >> 8) | jnp.where(bin_flat.reshape(-1), 0, 1 << 30)).astype(
            jnp.int32
        )
        cell_iota = jnp.broadcast_to(
            jnp.arange(cells, dtype=jnp.int32)[None, :], (levels, cells)
        )
        if levels == 1:
            _, occupied_flat = jax.lax.sort_key_val(
                keys, cell_iota.reshape(-1)
            )
            occupied_ids = occupied_flat[None, :n]
        else:
            _, occupied_ids = jax.lax.sort_key_val(
                keys.reshape(levels, cells), cell_iota
            )
            occupied_ids = occupied_ids[:, :n]

        cell_ids = jnp.concatenate([uniform_ids, occupied_ids], axis=-1)
        occ = _eval_cells(state, cell_ids, k_eval, occ_eval_fn, eval_chunk)
        flat = (
            jnp.arange(levels, dtype=jnp.int32)[:, None] * cells + cell_ids
        )
        visible = jnp.take(state.occs, flat) >= 0.0
        occs = _ema_update(
            state.occs,
            flat.reshape(-1),
            occ.reshape(-1),
            visible.reshape(-1),
            ema_decay,
        )
        return dataclasses.replace(state, occs=occs)

    def striped_update(state: OccGridState) -> OccGridState:
        # rotating contiguous stripe: cells [start, start+n) of every level
        n = cells // dense_stripes
        start = (
            (step // update_interval) % dense_stripes
        ).astype(jnp.int32) * n
        ids = jnp.broadcast_to(
            (start + jnp.arange(n, dtype=jnp.int32))[None, :], (levels, n)
        )
        occ = _eval_cells(state, ids, k_eval, occ_eval_fn, eval_chunk)
        occs2d = state.occs.reshape(levels, cells)
        cur = jax.lax.dynamic_slice(occs2d, (0, start), (levels, n))
        visible = cur >= 0.0
        # decay^S on revisit: each cell is touched once per S updates, so
        # compounding the per-update decay keeps the EMA timescale equal to
        # the dense path's (without this, stale occupied cells would persist
        # ~S x longer under striping).
        stripe_decay = ema_decay**dense_stripes
        new = jnp.where(visible, jnp.maximum(cur * stripe_decay, occ), cur)
        occs2d = jax.lax.dynamic_update_slice(occs2d, new, (0, start))
        return dataclasses.replace(state, occs=occs2d.reshape(-1))

    if dense:
        if dense_stripes > 1:
            assert cells % dense_stripes == 0, (
                f"dense_stripes={dense_stripes} must divide cells={cells}"
            )
            state = jax.lax.cond(
                step < warmup_steps, warmup_update, striped_update, state
            )
        else:
            state = warmup_update(state)
    else:
        state = jax.lax.cond(
            step < warmup_steps, warmup_update, sampled_update, state
        )

    # Binarize: threshold at min(mean of visible occupancies, occ_thre)
    # (reference: occ_grid.py:403-404).
    visible = state.occs >= 0
    mean_occ = jnp.sum(jnp.where(visible, state.occs, 0.0)) / jnp.clip(
        jnp.sum(visible), min=1
    )
    thre = jnp.minimum(mean_occ, occ_thre)
    binaries = (state.occs > thre).reshape(state.binaries.shape)
    return dataclasses.replace(state, binaries=binaries)


def sampling_padded(
    state: OccGridState,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    sigma_fn: Optional[Callable] = None,
    alpha_fn: Optional[Callable] = None,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    t_min: Optional[jnp.ndarray] = None,
    t_max: Optional[jnp.ndarray] = None,
    render_step_size: float = 1e-3,
    early_stop_eps: float = 1e-4,
    alpha_thre: float = 0.0,
    stratified: bool = False,
    cone_angle: float = 0.0,
    key: Optional[jax.Array] = None,
    max_samples: int = 1024,
    windowed: bool = False,
    n_windows: int = 48,
    window_size: int = 8,
    max_coarse: int = 160,
) -> TraversalResult:
    """Sampling with spatial skipping — padded fast path, pure and jittable.

    (reference: occ_grid.py:85-221).  Returns a :class:`TraversalResult`
    whose ``valid`` mask already excludes occluded/transparent samples when a
    ``sigma_fn``/``alpha_fn`` is given.  The callbacks receive padded
    ``(n_rays, max_samples)`` tensors plus broadcast ``ray_indices``.

    With ``windowed=True`` the coarse-to-fine traverser is used (2x fewer
    random-occupancy rows; see :func:`traverse_grids_windowed`) and the
    output has ``n_windows * window_size`` candidates per ray.
    """
    n_rays = rays_o.shape[0]
    near_planes = jnp.full((n_rays,), near_plane, rays_o.dtype)
    far_planes = jnp.full((n_rays,), far_plane, rays_o.dtype)
    if t_min is not None:
        near_planes = jnp.maximum(near_planes, t_min)
    if t_max is not None:
        far_planes = jnp.minimum(far_planes, t_max)
    if stratified:
        assert key is not None, "stratified sampling requires a PRNG key"
        near_planes = near_planes + (
            jax.random.uniform(key, (n_rays,), rays_o.dtype) * render_step_size
        )

    if windowed:
        res = traverse_grids_windowed(
            rays_o,
            rays_d,
            state.binaries,
            state.aabbs,
            near_planes,
            far_planes,
            step_size=render_step_size,
            cone_angle=cone_angle,
            n_windows=n_windows,
            window_size=window_size,
            max_coarse=max_coarse,
        )
    else:
        res = traverse_grids_padded(
            rays_o,
            rays_d,
            state.binaries,
            state.aabbs,
            near_planes,
            far_planes,
            step_size=render_step_size,
            cone_angle=cone_angle,
            max_samples=max_samples,
        )
    t_starts, t_ends, valid = res.t_starts, res.t_ends, res.valid

    if (alpha_thre > 0.0 or early_stop_eps > 0.0) and (
        sigma_fn is not None or alpha_fn is not None
    ):
        alpha_thre = jnp.minimum(alpha_thre, jnp.mean(state.occs))
        ray_indices = jnp.broadcast_to(
            jnp.arange(n_rays, dtype=jnp.int32)[:, None], valid.shape
        )
        if sigma_fn is not None:
            sigmas = sigma_fn(t_starts, t_ends, ray_indices)
            vis = render_visibility_from_density(
                t_starts,
                t_ends,
                sigmas,
                early_stop_eps=early_stop_eps,
                alpha_thre=alpha_thre,
                masks=valid,
            )
        else:
            alphas = alpha_fn(t_starts, t_ends, ray_indices)
            vis = render_visibility_from_alpha(
                alphas,
                early_stop_eps=early_stop_eps,
                alpha_thre=alpha_thre,
                masks=valid,
            )
        valid = valid & vis

    return TraversalResult(
        res.t_starts, res.t_ends, valid, res.termination_planes, res.terminated
    )


def sampling_pooled(
    state: OccGridState,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near_plane: float = 0.0,
    far_plane: float = 1e10,
    t_min: Optional[jnp.ndarray] = None,
    t_max: Optional[jnp.ndarray] = None,
    render_step_size: float = 1e-3,
    stratified: bool = False,
    cone_angle: float = 0.0,
    key: Optional[jax.Array] = None,
    window_budget: int = 1 << 16,
    window_size: int = 8,
    max_coarse: int = 160,
    fine_probes: int = 0,
    compaction: str = "onehot",
) -> WindowSamples:
    """Sampling with spatial skipping via the GLOBAL window pool — the
    train-path fast traversal (see :func:`~nerfacc_tpu.grid.
    traverse_grids_pooled`).  Pure and jittable; feed the result to
    ``compact_samples_from_windows``.

    (reference: occ_grid.py:85-221 semantics, without the optional
    sigma/alpha visibility filtering — training uses the budget-compacted
    render path where empty samples already composite to zero weight.)
    """
    n_rays = rays_o.shape[0]
    near_planes = jnp.full((n_rays,), near_plane, rays_o.dtype)
    far_planes = jnp.full((n_rays,), far_plane, rays_o.dtype)
    if t_min is not None:
        near_planes = jnp.maximum(near_planes, t_min)
    if t_max is not None:
        far_planes = jnp.minimum(far_planes, t_max)
    if stratified:
        assert key is not None, "stratified sampling requires a PRNG key"
        near_planes = near_planes + (
            jax.random.uniform(key, (n_rays,), rays_o.dtype) * render_step_size
        )
    return traverse_grids_pooled(
        rays_o,
        rays_d,
        state.binaries,
        state.aabbs,
        near_planes,
        far_planes,
        step_size=render_step_size,
        cone_angle=cone_angle,
        window_budget=window_budget,
        window_size=window_size,
        max_coarse=max_coarse,
        fine_probes=fine_probes,
        compaction=compaction,
    )


class OccGridEstimator(AbstractEstimator):
    """Occupancy grid estimator — reference-compatible stateful wrapper.

    (reference: nerfacc/estimators/occ_grid.py:14-404)

    Args:
        roi_aabb: (6,) region of interest.
        resolution: int or (3,) grid resolution. Default 128.
        levels: number of cascade levels. Default 1.
        max_samples: static per-ray candidate budget for padded sampling.
        seed: PRNG seed for stratified jitter / cell sampling.
    """

    DIM: int = 3

    def __init__(
        self,
        roi_aabb: Union[List[float], jnp.ndarray],
        resolution: Union[int, List[int]] = 128,
        levels: int = 1,
        max_samples: int = 1024,
        seed: int = 0,
        **kwargs,
    ) -> None:
        super().__init__()
        self.state = init_occ_grid(roi_aabb, resolution, levels)
        self.levels = levels
        self.cells_per_lvl = self.state.cells_per_lvl
        self.max_samples = max_samples
        self._key = jax.random.PRNGKey(seed)

    # -- convenience accessors mirroring the reference buffers ------------
    @property
    def aabbs(self) -> jnp.ndarray:
        return self.state.aabbs

    @property
    def occs(self) -> jnp.ndarray:
        return self.state.occs

    @property
    def binaries(self) -> jnp.ndarray:
        return self.state.binaries

    @property
    def resolution(self) -> jnp.ndarray:
        return jnp.asarray(self.state.resolution, jnp.int32)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def sampling(
        self,
        rays_o: jnp.ndarray,
        rays_d: jnp.ndarray,
        sigma_fn: Optional[Callable] = None,
        alpha_fn: Optional[Callable] = None,
        near_plane: float = 0.0,
        far_plane: float = 1e10,
        t_min: Optional[jnp.ndarray] = None,
        t_max: Optional[jnp.ndarray] = None,
        render_step_size: float = 1e-3,
        early_stop_eps: float = 1e-4,
        alpha_thre: float = 0.0,
        stratified: bool = False,
        cone_angle: float = 0.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Reference-compatible sampling: exact-size flattened output.

        Note: involves a host sync for the exact sizes — use
        :func:`sampling_padded` inside jitted training steps.

        Returns:
            ray_indices (n_samples,), t_starts (n_samples,), t_ends (n_samples,).
        """
        if sigma_fn is not None or alpha_fn is not None:
            # Adapt flattened-callback signature to the padded layout.
            def padded_fn(t0, t1, rid):
                fn = sigma_fn if sigma_fn is not None else alpha_fn
                shape = t0.shape
                out = fn(t0.reshape(-1), t1.reshape(-1), rid.reshape(-1))
                return out.reshape(shape)

            pad_sigma_fn = padded_fn if sigma_fn is not None else None
            pad_alpha_fn = padded_fn if alpha_fn is not None else None
        else:
            pad_sigma_fn = pad_alpha_fn = None

        res = sampling_padded(
            self.state,
            rays_o,
            rays_d,
            sigma_fn=pad_sigma_fn,
            alpha_fn=pad_alpha_fn,
            near_plane=near_plane,
            far_plane=far_plane,
            t_min=t_min,
            t_max=t_max,
            render_step_size=render_step_size,
            early_stop_eps=early_stop_eps,
            alpha_thre=alpha_thre,
            stratified=stratified,
            cone_angle=cone_angle,
            key=self._next_key() if stratified else None,
            max_samples=self.max_samples,
        )
        valid = np.asarray(res.valid)
        ray_ids, sample_ids = np.nonzero(valid)
        t_starts = np.asarray(res.t_starts)[ray_ids, sample_ids]
        t_ends = np.asarray(res.t_ends)[ray_ids, sample_ids]
        return (
            jnp.asarray(ray_ids, jnp.int32),
            jnp.asarray(t_starts),
            jnp.asarray(t_ends),
        )

    def update_every_n_steps(
        self,
        step: int,
        occ_eval_fn: Callable,
        occ_thre: float = 1e-2,
        ema_decay: float = 0.95,
        warmup_steps: int = 256,
        n: int = 16,
    ) -> None:
        """EMA-update the grid every ``n`` steps (reference: occ_grid.py:223-259)."""
        if not self.training:
            raise RuntimeError(
                "You should only call this function only during training. "
                "Please call update_occ_grid() directly if you want to update "
                "the field during inference."
            )
        if step % n == 0 and self.training:
            self.state = update_occ_grid(
                self.state,
                self._next_key(),
                jnp.asarray(step),
                occ_eval_fn,
                occ_thre=occ_thre,
                ema_decay=ema_decay,
                warmup_steps=warmup_steps,
            )

    def mark_invisible_cells(
        self,
        K: jnp.ndarray,
        c2w: jnp.ndarray,
        width: int,
        height: int,
        near_plane: float = 0.0,
        chunk: int = 32**3,
    ) -> None:
        """Mark cells invisible to all cameras with occupancy -1.

        (reference: occ_grid.py:261-332; adapted from ngp_pl).  Should run
        once before training.
        """
        K = jnp.asarray(K, jnp.float32)
        c2w = jnp.asarray(c2w, jnp.float32)
        assert K.ndim == 3 and K.shape[1:] == (3, 3)
        assert c2w.ndim == 3 and c2w.shape[1:] in ((3, 4), (4, 4))

        N_cams = c2w.shape[0]
        w2c_R = jnp.swapaxes(c2w[:, :3, :3], 1, 2)  # (N, 3, 3)
        w2c_T = -w2c_R @ c2w[:, :3, 3:]  # (N, 3, 1)

        res = jnp.asarray(self.state.resolution, jnp.float32)
        cells = self.cells_per_lvl
        occs = np.asarray(self.state.occs).copy()
        all_ids = np.arange(cells, dtype=np.int32)

        for lvl in range(self.levels):
            lvl_occs = occs[lvl * cells : (lvl + 1) * cells]
            indices = all_ids[lvl_occs >= 0.0]
            for i in range(0, len(indices), chunk):
                ids = jnp.asarray(indices[i : i + chunk])
                coords = _cell_coords(ids, self.state.resolution).astype(
                    jnp.float32
                )
                x = coords / (res - 1)
                xyzs_w = (
                    self.state.aabbs[lvl, :3]
                    + x * (self.state.aabbs[lvl, 3:] - self.state.aabbs[lvl, :3])
                ).T  # (3, chunk)
                xyzs_c = w2c_R @ xyzs_w + w2c_T  # (N, 3, chunk)
                uvd = K @ xyzs_c
                uv = uvd[:, :2] / uvd[:, 2:]
                in_image = (
                    (uvd[:, 2] >= 0)
                    & (uv[:, 0] >= 0)
                    & (uv[:, 0] < width)
                    & (uv[:, 1] >= 0)
                    & (uv[:, 1] < height)
                )
                covered = (uvd[:, 2] >= near_plane) & in_image
                count = covered.sum(axis=0) / N_cams
                too_near = (uvd[:, 2] < near_plane) & in_image
                too_near_any = too_near.any(axis=0)
                valid_mask = (count > 0) & (~too_near_any)
                vals = np.where(np.asarray(valid_mask), 0.0, -1.0)
                occs[lvl * cells + indices[i : i + chunk]] = vals
        self.state = dataclasses.replace(self.state, occs=jnp.asarray(occs))

    def state_dict(self) -> Dict[str, Any]:
        return {
            "aabbs": self.state.aabbs,
            "occs": self.state.occs,
            "binaries": self.state.binaries,
        }

    def load_state_dict(self, state_dict: Dict[str, Any]) -> None:
        self.state = OccGridState(
            aabbs=jnp.asarray(state_dict["aabbs"]),
            occs=jnp.asarray(state_dict["occs"]),
            binaries=jnp.asarray(state_dict["binaries"]),
        )
