"""Sparse hierarchical occupancy estimators — the TPU-native analog of the
reference's pluggable VDB / N3Tree estimator family.

Reference:
  * ``VDBEstimator`` + ``traverse_vdbs`` (nerfacc/estimators/vdb.py:20-337)
    — an fvdb ``GridBatch`` sparse voxel grid with per-voxel enable/disable
    updates and ``uniform_ray_samples`` traversal.
  * ``N3TreeEstimator`` (nerfacc/estimators/n3tree.py:23-170) — the same
    protocol over an svox octree.

TPU rethink: fvdb/svox exist to keep SPARSE topology on chips where dense
grids blow memory and pointer-chasing is cheap.  On TPU the tradeoffs
invert — pointer structures are hostile to the vector units, while a
bit-packed dense bitmap of a 128^3 grid is 256 KB and a full mip pyramid
adds ~15% — so the idiomatic equivalent is:

  * storage: z-packed uint32 occupancy words (1 bit/voxel, ``SparseGrid``)
    with the float EMA buffer kept only for the region of interest;
  * hierarchy: a max-pooled mip pyramid (the octree role) consumed by the
    coarse phase of the pooled/windowed traversals;
  * updates: the VDB enable/disable protocol — only TOUCHED voxels change
    state (unlike ``OccGridEstimator`` which re-binarizes every cell).

The estimator exposes the exact reference ``sampling()`` /
``update_every_n_steps()`` protocol, so it is a drop-in alternative wherever
``OccGridEstimator`` fits (``estimator.sampling(...)`` in the train loops).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, List, Mapping, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import (
    _pack_bits_z,
    pool_binaries,
    traverse_grids_padded,
    traverse_grids_windowed,
)
from ..volrend import (
    render_visibility_from_alpha,
    render_visibility_from_density,
)
from .base import AbstractEstimator
from .occ_grid import _cell_coords, _chunked_eval


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseGrid:
    """Bit-packed voxel grid — the ``GridBatch`` analog.

    Attributes:
        words: (rx, ry, ceil(rz/32)) int32; bit ``iz % 32`` of
            ``words[ix, iy, iz // 32]`` = voxel (ix, iy, iz) enabled.
        aabb: (6,) world bounds.
        resolution: (3,) static voxel counts (aux data, not traced).
    """

    words: jnp.ndarray
    aabb: jnp.ndarray
    resolution: Tuple[int, int, int]

    def tree_flatten(self):
        return ((self.words, self.aabb), self.resolution)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @property
    def total_voxels(self) -> int:
        rx, ry, rz = self.resolution
        return rx * ry * rz

    @property
    def binaries(self) -> jnp.ndarray:
        """Unpacked (1, rx, ry, rz) bool view (built on the fly; the packed
        words are the persistent storage)."""
        rx, ry, rz = self.resolution
        bits = (
            self.words[..., None] >> jnp.arange(32, dtype=jnp.int32)
        ) & 1
        return (bits.reshape(rx, ry, -1)[:, :, :rz] > 0)[None]

    @property
    def voxel_sizes(self) -> jnp.ndarray:
        res = jnp.asarray(self.resolution, jnp.float32)
        return (self.aabb[3:] - self.aabb[:3]) / res

    def ijk_enabled(self) -> jnp.ndarray:
        """(n, 3) enabled voxel coordinates (host-side convenience)."""
        return jnp.stack(jnp.nonzero(self.binaries[0]), axis=-1)

    def mip_pyramid(self, levels: int = 3) -> List[jnp.ndarray]:
        """Max-pooled occupancy pyramid (octree analog): level i pools by
        2^i.  Level 0 is the base grid."""
        out = [self.binaries]
        for _ in range(1, levels):
            out.append(pool_binaries(out[-1], 2, dilation=0))
        return out


def sparse_grid_from_ijk(
    ijk: Union[np.ndarray, jnp.ndarray],
    resolution: Union[int, Tuple[int, int, int]],
    aabb: Union[List[float], jnp.ndarray],
) -> SparseGrid:
    """Build a :class:`SparseGrid` from enabled voxel coordinates
    (reference: fvdb ``sparse_grid_from_ijk``, vdb.py:69-74)."""
    if isinstance(resolution, int):
        resolution = (resolution,) * 3
    rx, ry, rz = resolution
    dense = np.zeros((rx, ry, rz), bool)
    ijk = np.asarray(ijk)
    if len(ijk):
        dense[ijk[:, 0], ijk[:, 1], ijk[:, 2]] = True
    return sparse_grid_from_dense(dense, aabb)


def sparse_grid_from_dense(
    dense: Union[np.ndarray, jnp.ndarray],
    aabb: Union[List[float], jnp.ndarray],
) -> SparseGrid:
    """Build a :class:`SparseGrid` from a dense (rx, ry, rz) bool mask."""
    dense = jnp.asarray(dense, bool)
    words = _pack_bits_z(dense[None])[0]
    return SparseGrid(
        words=words,
        aabb=jnp.asarray(aabb, jnp.float32),
        resolution=tuple(int(r) for r in dense.shape),
    )


def traverse_vdbs(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    grid: SparseGrid,
    near_planes: Optional[jnp.ndarray] = None,
    far_planes: Optional[jnp.ndarray] = None,
    step_size: float = 1e-3,
    cone_angle: float = 0.0,
    max_samples: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Traverse a sparse grid — flat exact-size outputs like the reference
    ``traverse_vdbs`` (vdb.py:20-57): ``(t_starts, t_ends, ray_indices)``.

    Involves a host sync for the exact sizes (like the reference, whose
    output size is data-dependent); inside jitted code use
    ``traverse_grids_padded(grid.binaries, ...)`` directly.
    """
    n_rays = rays_o.shape[0]
    aabbs = grid.aabb[None]
    res = traverse_grids_padded(
        rays_o,
        rays_d,
        grid.binaries,
        aabbs,
        near_planes,
        far_planes,
        step_size=step_size,
        cone_angle=cone_angle,
        max_samples=max_samples,
    )
    valid = np.asarray(res.valid)
    ray_ids, sample_ids = np.nonzero(valid)
    t_starts = np.asarray(res.t_starts)[ray_ids, sample_ids]
    t_ends = np.asarray(res.t_ends)[ray_ids, sample_ids]
    return (
        jnp.asarray(t_starts),
        jnp.asarray(t_ends),
        jnp.asarray(ray_ids, jnp.int32),
    )


class SparseGridEstimator(AbstractEstimator):
    """Sparse-grid transmittance estimator — ``VDBEstimator`` analog
    (reference: nerfacc/estimators/vdb.py:60-337).

    Args:
        init_grid: a :class:`SparseGrid` (or None to start fully enabled).
        roi_aabb: world bounds when ``init_grid`` is None.
        resolution: voxel resolution when ``init_grid`` is None.
    """

    def __init__(
        self,
        init_grid: Optional[SparseGrid] = None,
        roi_aabb: Optional[Union[List[float], jnp.ndarray]] = None,
        resolution: Union[int, Tuple[int, int, int]] = 128,
        max_samples: int = 1024,
        seed: int = 0,
        pyramid_levels: int = 3,
    ) -> None:
        super().__init__()
        if init_grid is None:
            assert roi_aabb is not None
            if isinstance(resolution, int):
                resolution = (resolution,) * 3
            dense = np.zeros(resolution, bool)
            init_grid = sparse_grid_from_dense(dense, roi_aabb)
        self.grid = init_grid
        # float occupancy EMA for every voxel of the roi (the reference keeps
        # occs for the initial ijk set, vdb.py:77-80)
        self.occs = jnp.zeros((self.grid.total_voxels,), jnp.float32)
        self.max_samples = max_samples
        self.pyramid_levels = pyramid_levels
        self._key = jax.random.PRNGKey(seed)
        # pyramid + dilated-coarse caches, keyed on grid object identity (a
        # strong ref to the source grid, so identity can't be recycled)
        self._pyramid_src: Optional[SparseGrid] = None
        self._pyramid: Optional[List[jnp.ndarray]] = None
        self._coarse_cache: Dict[Tuple[int, int], jnp.ndarray] = {}

    # -- persistent mip pyramid (the octree role) ---------------------------
    def pyramid(self) -> List[jnp.ndarray]:
        """Persistent max-pooled occupancy pyramid of the current grid —
        rebuilt only when the grid changes, NOT on every sampling call.
        Level ``i`` pools the base binaries by ``2**i`` (undilated: the pure
        octree interior nodes; dilation for traversal conservativeness is
        applied per-use by :meth:`_dilated`)."""
        if self._pyramid is None or self._pyramid_src is not self.grid:
            self._pyramid = self.grid.mip_pyramid(self.pyramid_levels)
            self._pyramid_src = self.grid
            self._coarse_cache = {}
        return self._pyramid

    def _dilated(self, lvl: int, pool: int, dilation: int) -> jnp.ndarray:
        """Pyramid level ``lvl`` dilated so its world reach is at least the
        ``pool * dilation`` base cells the windowed traversal's
        conservativeness contract assumes (see
        :func:`~nerfacc_tpu.grid._coarse_window_phase`): a level pooled by
        ``p`` needs ``ceil(pool * dilation / p)`` coarse-cell dilation."""
        p = 1 << lvl
        d = max(1, math.ceil(pool * dilation / p))
        key = (lvl, d)
        if key not in self._coarse_cache:
            pyr = self.pyramid()
            self._coarse_cache[key] = pool_binaries(pyr[lvl], 1, d)
        return self._coarse_cache[key]

    def _coarse_levels(
        self, pool: int, dilation: int
    ) -> Tuple[jnp.ndarray, ...]:
        """Coarse grid(s) the window phase tests against — a single pyramid
        level here; :class:`N3TreeEstimator` returns a multi-level descent."""
        lvl = min(int(math.log2(pool)), self.pyramid_levels - 1)
        return (self._dilated(lvl, pool, dilation),)

    # -- reference-parity accessors ----------------------------------------
    @property
    def binaries(self) -> jnp.ndarray:
        return self.grid.binaries

    @property
    def aabbs(self) -> jnp.ndarray:
        return self.grid.aabb[None]

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
        traversal: str = "windowed",
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Sampling with spatial skipping (reference: vdb.py:108-238).

        Returns exact-size flattened ``(ray_indices, t_starts, t_ends)``.

        ``traversal="windowed"`` (default) drives the coarse-to-fine
        traversal from the PERSISTENT mip pyramid (:meth:`pyramid`) — the
        octree/VDB hierarchy doing its job: the coarse phase tests pyramid
        nodes instead of re-pooling the base grid every call, and window
        budget exhaustion resumes from the reported termination planes, so
        results match the exhaustive ``"padded"`` path exactly.
        """
        n_rays = rays_o.shape[0]
        near_planes = jnp.full((n_rays,), near_plane, rays_o.dtype)
        far_planes = jnp.full((n_rays,), far_plane, rays_o.dtype)
        if t_min is not None:
            near_planes = jnp.maximum(near_planes, t_min)
        if t_max is not None:
            far_planes = jnp.minimum(far_planes, t_max)
        if stratified:
            near_planes = near_planes + (
                jax.random.uniform(self._next_key(), (n_rays,), rays_o.dtype)
                * render_step_size
            )
        if traversal == "windowed":
            ray_indices, t_starts, t_ends = self._sampling_pyramid(
                rays_o, rays_d, near_planes, far_planes,
                render_step_size, cone_angle,
            )
        else:
            t_starts, t_ends, ray_indices = traverse_vdbs(
                rays_o,
                rays_d,
                self.grid,
                near_planes,
                far_planes,
                step_size=render_step_size,
                cone_angle=cone_angle,
                max_samples=self.max_samples,
            )

        # skip invisible space (reference: vdb.py:240-270)
        if (alpha_thre > 0.0 or early_stop_eps > 0.0) and (
            sigma_fn is not None or alpha_fn is not None
        ):
            alpha_thre = min(alpha_thre, float(jnp.mean(self.occs)))
            if sigma_fn is not None:
                sigmas = sigma_fn(t_starts, t_ends, ray_indices)
                masks = render_visibility_from_density(
                    t_starts,
                    t_ends,
                    sigmas,
                    ray_indices=ray_indices,
                    n_rays=n_rays,
                    early_stop_eps=early_stop_eps,
                    alpha_thre=alpha_thre,
                )
            else:
                alphas = alpha_fn(t_starts, t_ends, ray_indices)
                masks = render_visibility_from_alpha(
                    alphas,
                    ray_indices=ray_indices,
                    n_rays=n_rays,
                    early_stop_eps=early_stop_eps,
                    alpha_thre=alpha_thre,
                )
            masks = np.asarray(masks)
            ray_indices = jnp.asarray(np.asarray(ray_indices)[masks])
            t_starts = jnp.asarray(np.asarray(t_starts)[masks])
            t_ends = jnp.asarray(np.asarray(t_ends)[masks])
        return ray_indices, t_starts, t_ends

    def _sampling_pyramid(
        self,
        rays_o: jnp.ndarray,
        rays_d: jnp.ndarray,
        near_planes: jnp.ndarray,
        far_planes: jnp.ndarray,
        step_size: float,
        cone_angle: float,
        pool: int = 4,
        dilation: int = 1,
        max_rounds: int = 64,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Windowed traversal whose coarse phase consumes the persistent mip
        pyramid; exhausted window budgets resume from the termination planes
        until every ray terminates, so the flat output equals the padded
        path's (this method owns the host sync, like the reference's
        data-dependent ``uniform_ray_samples``, vdb.py:171-238)."""
        n_rays = rays_o.shape[0]
        coarse = self._coarse_levels(pool, dilation)
        binaries, aabbs = self.grid.binaries, self.grid.aabb[None]
        rid_acc: List[np.ndarray] = []
        t0_acc: List[np.ndarray] = []
        t1_acc: List[np.ndarray] = []
        near = near_planes
        alive = np.ones((n_rays,), bool)
        for _ in range(max_rounds):
            res = traverse_grids_windowed(
                rays_o,
                rays_d,
                binaries,
                aabbs,
                near,
                far_planes,
                step_size=step_size,
                cone_angle=cone_angle,
                pool=pool,
                dilation=dilation,
                rays_mask=jnp.asarray(alive),
                coarse_binaries=coarse,
            )
            valid = np.asarray(res.valid)
            rid, sid = np.nonzero(valid)
            rid_acc.append(rid.astype(np.int32))
            t0_acc.append(np.asarray(res.t_starts)[rid, sid])
            t1_acc.append(np.asarray(res.t_ends)[rid, sid])
            alive = alive & ~np.asarray(res.terminated)
            if not alive.any():
                break
            near = jnp.asarray(res.termination_planes)
        rid = np.concatenate(rid_acc)
        t0 = np.concatenate(t0_acc)
        t1 = np.concatenate(t1_acc)
        # rounds advance monotonically in t, so per-ray order is already
        # ascending; a stable sort on ray id restores the reference's
        # (ray-major, t-ascending) flat layout
        order = np.argsort(rid, kind="stable")
        return (
            jnp.asarray(rid[order]),
            jnp.asarray(t0[order]),
            jnp.asarray(t1[order]),
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
        """EMA update + per-voxel enable/disable (reference: vdb.py:272-337).

        Unlike ``OccGridEstimator`` (which re-binarizes every cell from the
        EMA buffer), only the TOUCHED voxels change enabled state — the VDB
        protocol."""
        if not self.training:
            raise RuntimeError(
                "You should only call this function only during training."
            )
        if step % n == 0:
            self._update(
                step, occ_eval_fn, occ_thre, ema_decay, warmup_steps
            )

    def _update(
        self, step, occ_eval_fn, occ_thre, ema_decay, warmup_steps
    ) -> None:
        rx, ry, rz = self.grid.resolution
        cells = self.grid.total_voxels
        k_sel, k_jit = jax.random.split(self._next_key())

        if step < warmup_steps:
            ids = jnp.arange(cells, dtype=jnp.int32)
        else:
            # n/4 uniform + n/4 currently-enabled (reference: vdb.py:283-303)
            n_q = cells // 4
            k1, k2 = jax.random.split(k_sel)
            uniform_ids = jax.random.randint(k1, (n_q,), 0, cells)
            enabled_flat = self.grid.binaries[0].reshape(-1)
            # uniform over enabled cells via key sort (static shapes)
            keys = jax.random.uniform(k2, (cells,)) + jnp.where(
                enabled_flat, 0.0, 1.0
            )
            _, order = jax.lax.sort_key_val(
                keys, jnp.arange(cells, dtype=jnp.int32)
            )
            ids = jnp.concatenate([uniform_ids, order[:n_q]])

        coords = _cell_coords(ids, self.grid.resolution).astype(jnp.float32)
        jitter = jax.random.uniform(k_jit, coords.shape)
        res = jnp.asarray(self.grid.resolution, jnp.float32)
        x = (coords + jitter) / res
        lo, hi = self.grid.aabb[:3], self.grid.aabb[3:]
        occ = _chunked_eval(
            lambda pts: jnp.reshape(occ_eval_fn(pts), (-1,)),
            lo + x * (hi - lo),
        )

        # occs[ids] = max(occs[ids] * decay, occ) — duplicate-safe: decay the
        # touched entries densely, then scatter-max the new samples
        touched = jnp.zeros((cells,), bool).at[ids].set(True, mode="drop")
        occs = jnp.where(touched, self.occs * ema_decay, self.occs)
        self.occs = occs.at[ids].max(occ, mode="drop")

        thre = jnp.minimum(jnp.mean(self.occs), occ_thre)
        active = self.occs[ids] >= thre
        # enable/disable only the touched voxels
        enabled = self.grid.binaries[0].reshape(-1)
        enabled = enabled.at[ids].set(active, mode="drop")
        dense = enabled.reshape(self.grid.resolution)
        self.grid = sparse_grid_from_dense(dense, self.grid.aabb)

    def state_dict(self) -> Dict[str, Any]:
        """Carries the sparse grid itself (reference: vdb.py:82-100)."""
        return {
            "grid_words": self.grid.words,
            "grid_aabb": self.grid.aabb,
            "grid_resolution": self.grid.resolution,
            "occs": self.occs,
        }

    def load_state_dict(self, state_dict: Mapping[str, Any]) -> None:
        self.grid = SparseGrid(
            words=jnp.asarray(state_dict["grid_words"]),
            aabb=jnp.asarray(state_dict["grid_aabb"]),
            resolution=tuple(state_dict["grid_resolution"]),
        )
        self.occs = jnp.asarray(state_dict["occs"])


class N3TreeEstimator(SparseGridEstimator):
    """Octree-flavoured estimator (reference: nerfacc/estimators/n3tree.py:23,
    not exported there either).  The TPU realization of the octree is the
    bit-packed mip pyramid of :class:`SparseGrid` (:meth:`pyramid`) — a
    pointerless complete octree.  Unlike the base estimator (which tests one
    pyramid level in the coarse phase), sampling here performs a PYRAMID
    DESCENT (the reference's svox tree walk, n3tree.py:160-170): each
    traversal window must pass every pyramid level from the coarsest down,
    so finer interior nodes prune windows the coarser ones let through —
    all levels conservative, hence results still exact."""

    def _coarse_levels(
        self, pool: int, dilation: int
    ) -> Tuple[jnp.ndarray, ...]:
        top = min(int(math.log2(pool)), self.pyramid_levels - 1)
        # coarsest -> finer descent; the finest descent level is one below
        # the base pool (reach-preserving dilation keeps it conservative)
        lvls = range(top, max(top - 2, 0), -1) if top > 0 else (0,)
        return tuple(self._dilated(l, pool, dilation) for l in lvls)


# reference-name alias: a user porting `from nerfacc import VDBEstimator`
# lands on the TPU-native sparse estimator
VDBEstimator = SparseGridEstimator
