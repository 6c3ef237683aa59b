"""Dense voxel-grid radiance field (DVGO/Plenoxels role) — one row gather
per sample per level.

Why this exists: the factorized (CP/tri-plane) fields are the TPU's
all-matmul fast path but share capacity globally — every table weight
serves many cells — and the measured consequence (PERF.md round-4 sweep)
is a per-STEP convergence gap to directly-indexed grids: the hash field
reaches 28 dB in 500 steps where every factorized variant needs ~2500.
Directly-indexed features close that gap, and the reference ecosystem's
fast-converging families (DVGO's density+feature voxels, Plenoxels,
TiNeuVox's neural voxels, Instant-NGP's hash table) are all built on them.

The TPU problem with voxel grids is the gather: 8 trilinear corners x N
samples at ~7-8 ns per random index is ~16 ms per 2^18-sample step — and
the hash encoder needs 16 levels of it (PERF.md Leads #3).  The move here:
random-gather cost on this chip is per ROW, nearly independent of row
width (PERF.md cost model, same fact the box-27 occupancy probe exploits).
So we materialize, inside the jit, a NEIGHBORHOOD table ``T[cell] =
concat(G[cell + (dx,dy,dz)] for dx,dy,dz in {0,1}^3)`` — 8C channels per
row — and fetch all eight trilinear corners with ONE row gather per
sample per level (~2 ms per 2^18 samples instead of ~16).  The backward
pass needs exactly one scatter-add of the per-row cotangents into the
duplicated table followed by an elementwise 8-shift fold back onto the
grid (custom VJP below) — measured-cheap next to the forward.

Reference role: tcnn hash grid (reference examples/radiance_fields/
ngp.py:110-163) / DVGO voxels; this is the direct-indexing quality tier
next to `CPRadianceField` (all-matmul) and `NGPRadianceField` (hash
parity path).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .encoders import spherical_harmonics_16
from .ngp import _mlp_apply, _mlp_init, contract_to_unisphere, trunc_exp


def _neighborhood_table(grid: jnp.ndarray) -> jnp.ndarray:
    """(X, Y, Z, C) grid -> (X*Y*Z, 8C) rows of the 2x2x2 corner block at
    each cell (edge-replicated on the high side, matching clipped
    trilinear indexing)."""
    X, Y, Z, C = grid.shape
    g = jnp.pad(grid, ((0, 1), (0, 1), (0, 1), (0, 0)), mode="edge")
    corners = [
        g[dx : dx + X, dy : dy + Y, dz : dz + Z]
        for dx in (0, 1)
        for dy in (0, 1)
        for dz in (0, 1)
    ]
    return jnp.concatenate(corners, axis=-1).reshape(X * Y * Z, 8 * C)


def _corner_weights(grid_shape, u):
    X, Y, Z, _ = grid_shape
    res = jnp.asarray([X, Y, Z], u.dtype)
    pos = jnp.clip(u, 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res.astype(jnp.int32) - 1)
    frac = pos - i0.astype(pos.dtype)
    flat = (i0[:, 0] * Y + i0[:, 1]) * Z + i0[:, 2]
    # weight per corner (dx, dy, dz) in the same order as the table rows
    wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], axis=-1)  # (N, 2)
    wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], axis=-1)
    wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], axis=-1)
    w = (
        wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    ).reshape(-1, 8)  # (N, 8)
    return flat, w, frac


@functools.lru_cache(maxsize=None)
def _make_trilinear(X: int, Y: int, Z: int, C: int):
    """Build the custom-VJP trilinear gather for one static grid shape
    (the shape must be static in the backward; custom_vjp residuals can
    only carry arrays)."""

    def fwd_parts(grid, u):
        table = _neighborhood_table(grid)
        flat, w, frac = _corner_weights((X, Y, Z, C), u)
        rows = jnp.take(table, flat, axis=0)  # (N, 8C) — THE gather
        corners = rows.reshape(-1, 8, C)
        f = jnp.sum(corners * w[..., None], axis=1)  # (N, C)
        return f, (corners, w, frac, flat)

    @jax.custom_vjp
    def trilinear(grid: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        return fwd_parts(grid, u)[0]

    def fwd(grid, u):
        return fwd_parts(grid, u)

    def bwd(res, g):
        corners, w, frac, flat = res
        n_cells = X * Y * Z
        # d/dgrid: per-row corner cotangents, ONE scatter-add into the
        # duplicated table, then an elementwise 8-shift fold to the grid.
        row_cot = (w[..., None] * g[:, None, :]).reshape(-1, 8 * C)
        dtable = jnp.zeros((n_cells, 8 * C), g.dtype).at[flat].add(row_cot)
        dtable = dtable.reshape(X, Y, Z, 8, C)
        dgrid = jnp.zeros((X + 1, Y + 1, Z + 1, C), g.dtype)
        k = 0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    dgrid = dgrid.at[
                        dx : dx + X, dy : dy + Y, dz : dz + Z
                    ].add(dtable[:, :, :, k])
                    k += 1
        # edge-replicated pad: each overflow slab folds onto the edge cell
        dgrid = dgrid.at[X - 1].add(dgrid[X])
        dgrid = dgrid.at[:, Y - 1].add(dgrid[:, Y])
        dgrid = dgrid.at[:, :, Z - 1].add(dgrid[:, :, Z])
        dgrid = dgrid[:X, :Y, :Z]

        # d/du: analytic trilinear weight derivative (cheap elementwise) —
        # needed only when positions carry gradients (pose optimization);
        # scaled by (res - 1) for the [0,1] -> grid mapping (clip
        # subgradient outside the range is intentionally ignored).
        cor = corners.reshape(-1, 2, 2, 2, C)
        one = jnp.ones_like(frac[:, 0])
        pairs = [
            jnp.stack([1.0 - frac[:, a], frac[:, a]], -1) for a in range(3)
        ]
        dpair = jnp.stack([-one, one], -1)

        def _axis_d(axis):
            wa = dpair if axis == 0 else pairs[0]
            wb = dpair if axis == 1 else pairs[1]
            wc = dpair if axis == 2 else pairs[2]
            ww = (
                wa[:, :, None, None]
                * wb[:, None, :, None]
                * wc[:, None, None, :]
            )
            return jnp.sum(
                jnp.sum(cor * ww[..., None], axis=(1, 2, 3)) * g, axis=-1
            )

        scale = jnp.asarray([X - 1, Y - 1, Z - 1], g.dtype)
        du = jnp.stack([_axis_d(0), _axis_d(1), _axis_d(2)], axis=-1) * scale
        return dgrid, du.astype(frac.dtype)

    trilinear.defvjp(fwd, bwd)
    return trilinear


def _trilinear_gather(grid: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of ``grid`` (X, Y, Z, C) at ``u`` in
    [0, 1]^3 (clipped) — forward via one (N,) row gather of the 8C-wide
    neighborhood table; custom VJP (see :func:`_make_trilinear`)."""
    return _make_trilinear(*map(int, grid.shape))(grid, u)


@dataclasses.dataclass(frozen=True)
class VoxelGridEncoder:
    """Multi-level dense voxel feature grid, one row gather per level.

    Attributes:
        resolutions: per-level grid resolutions (cubic).
        channels: per-level feature channels.
    """

    resolutions: Sequence[int] = (64, 128)
    channels: Sequence[int] = (4, 4)

    @property
    def output_dim(self) -> int:
        return int(sum(self.channels))

    def init(self, key: jax.Array) -> Dict:
        grids = []
        for R, C in zip(self.resolutions, self.channels):
            key, sub = jax.random.split(key)
            # near-zero init: the MLP head starts from its own bias regime
            # and the voxels learn residual detail (DVGO-style)
            grids.append(
                0.1 * jax.random.normal(sub, (R, R, R, C), jnp.float32)
            )
        return {"grids": grids}

    def __call__(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        feats = [
            _trilinear_gather(grid, x) for grid in params["grids"]
        ]
        return jnp.concatenate(feats, axis=-1)

    def param_regularizer(self, params: Dict) -> jnp.ndarray:
        """TV smoothness over the voxel grids."""
        terms = []
        for g in params["grids"]:
            dx = g[1:] - g[:-1]
            dy = g[:, 1:] - g[:, :-1]
            dz = g[:, :, 1:] - g[:, :, :-1]
            terms.append(
                jnp.mean(dx * dx) + jnp.mean(dy * dy) + jnp.mean(dz * dz)
            )
        return sum(terms)


@dataclasses.dataclass(frozen=True)
class VoxelRadianceField:
    """Radiance field over dense voxel features + small MLPs — the
    direct-indexing (DVGO/hash-role) quality tier, TPU-native.

    Same interface as :class:`CPRadianceField`/:class:`NGPRadianceField`.
    """

    aabb: Tuple[float, ...]
    unbounded: bool = False
    resolutions: Sequence[int] = (64, 128)
    channels: Sequence[int] = (4, 4)
    geo_feat_dim: int = 15
    hidden_dim: int = 64
    use_viewdirs: bool = True
    compute_dtype: Any = jnp.bfloat16

    def __post_init__(self):
        object.__setattr__(
            self,
            "encoder",
            VoxelGridEncoder(
                resolutions=tuple(self.resolutions),
                channels=tuple(self.channels),
            ),
        )

    @property
    def max_eval_chunk(self) -> int:
        # the (N, 8C) gathered rows are small; the duplicated-table build
        # is per-call constant — whole-grid occupancy refreshes are fine
        return 2**21

    def init(self, key: jax.Array) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "encoder": self.encoder.init(k1),
            "mlp_base": _mlp_init(
                k2,
                [
                    self.encoder.output_dim,
                    self.hidden_dim,
                    1 + self.geo_feat_dim,
                ],
            ),
        }
        head_in = (16 if self.use_viewdirs else 0) + self.geo_feat_dim
        params["mlp_head"] = _mlp_init(
            k3, [head_in, self.hidden_dim, self.hidden_dim, 3]
        )
        return params

    def _normalize(self, x: jnp.ndarray):
        aabb = jnp.asarray(self.aabb, jnp.float32)
        if self.unbounded:
            u = contract_to_unisphere(x, aabb)
            selector = jnp.ones(x.shape[:-1], bool)
        else:
            lo, hi = aabb[:3], aabb[3:]
            u = (x - lo) / (hi - lo)
            selector = ((u > 0.0) & (u < 1.0)).all(axis=-1)
        return u, selector

    def query_density(self, params, x, return_feat: bool = False):
        u, selector = self._normalize(x)
        feats = self.encoder(params["encoder"], u)
        h = _mlp_apply(params["mlp_base"], feats, self.compute_dtype)
        raw_density, geo_feat = h[..., :1], h[..., 1:]
        density = trunc_exp(raw_density - 1.0) * selector[..., None]
        if return_feat:
            return density, geo_feat
        return density

    def query_opacity(self, params, x, step_size: float):
        return self.query_density(params, x) * step_size

    def param_regularizer(self, params) -> jnp.ndarray:
        return self.encoder.param_regularizer(params["encoder"])

    def __call__(self, params, positions, directions=None):
        density, geo_feat = self.query_density(
            params, positions, return_feat=True
        )
        if self.use_viewdirs and directions is not None:
            d = spherical_harmonics_16(directions)
            h = jnp.concatenate([d, geo_feat], axis=-1)
        else:
            h = geo_feat
        rgb = jax.nn.sigmoid(
            _mlp_apply(params["mlp_head"], h, self.compute_dtype)
        )
        return rgb, density
