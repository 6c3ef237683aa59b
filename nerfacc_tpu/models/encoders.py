"""Input encoders: multiresolution hash grid, spherical harmonics, sinusoidal.

TPU-native replacements for the reference's external tinycudann dependency
(reference: examples/radiance_fields/ngp.py:110-163 configures tcnn HashGrid
16 levels x 2 features, 2^19 table, res 16..4096, and a degree-4
SphericalHarmonics view encoding) and the pure-torch ``SinusoidalEncoder``
(examples/radiance_fields/mlp.py:46-81).

The hash grid is one big gather from a ``(L*T, F)`` table — HBM-bandwidth
bound, which is exactly what TPUs are good at when the gather is batched.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.hash_vmem import fold_table, hash_vmem_lookup, plan_lanes
from ..ops.table_grad import accumulate_table_rows

# tcnn's spatial hash primes (common/grid.h upstream; public constants).
_PRIMES = (1, 2654435761, 805459861)


def _hash_corners(x, resolutions, table_size):
    """Corner hash ids and trilinear weights for all levels.

    Args:
        x: (n, 3) positions in [0, 1].
        resolutions: per-level grid resolutions (length L).
        table_size: per-level table rows T (power of two).

    Returns:
        idx: (n, L, 8) int32 per-level hash ids in [0, T).
        w: (n, L, 8) trilinear corner weights (dx-major corner order).
    """
    res = jnp.asarray(resolutions, dtype=x.dtype)  # (L,)
    pos = x[:, None, :] * res[None, :, None]  # (n, L, 3)
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0
    offsets = jnp.asarray(
        [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        dtype=jnp.int32,
    )  # (8, 3)
    corners = i0[:, :, None, :] + offsets[None, None, :, :]  # (n, L, 8, 3)
    cx = corners[..., 0].astype(jnp.uint32)
    cy = corners[..., 1].astype(jnp.uint32)
    cz = corners[..., 2].astype(jnp.uint32)
    hashed = (
        cx * jnp.uint32(_PRIMES[0])
        ^ cy * jnp.uint32(_PRIMES[1])
        ^ cz * jnp.uint32(_PRIMES[2])
    ) & jnp.uint32(table_size - 1)
    idx = hashed.astype(jnp.int32)
    wx = jnp.stack([1.0 - frac[..., 0], frac[..., 0]], axis=-1)  # (n, L, 2)
    wy = jnp.stack([1.0 - frac[..., 1], frac[..., 1]], axis=-1)
    wz = jnp.stack([1.0 - frac[..., 2], frac[..., 2]], axis=-1)
    w = (
        wx[:, :, :, None, None]
        * wy[:, :, None, :, None]
        * wz[:, :, None, None, :]
    ).reshape(idx.shape)
    return idx, w


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _vmem_encode(table, x, cfg):
    """Fused VMEM hash encode: forward = one Pallas kernel pass.

    ``cfg = (resolutions, block, win)``.  x is NOT differentiable on
    this path (positions are sampling outputs in every consumer; use
    lookup='xla' for pose/warp gradients through the encoder).
    """
    resolutions, _, _ = cfg
    l, t, f = table.shape
    q = plan_lanes(l, f)
    src = fold_table(table)
    tr = src.shape[0]
    n = x.shape[0]
    n_pad = -(-n // tr) * tr
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    out = hash_vmem_lookup(src, xp, resolutions=resolutions)
    return out[:n, : l * f * q].reshape(n, l, f, q).sum(-1)


def _vmem_encode_fwd(table, x, cfg):
    return _vmem_encode(table, x, cfg), (table.shape, x)


def _vmem_encode_bwd(cfg, res, cot):
    resolutions, block, win = cfg
    (l, t, f), x = res
    idx, w = _hash_corners(x, resolutions, t)  # (n, L, 8) x2
    level_offset = (jnp.arange(l, dtype=jnp.int32) * t)[None, :, None]
    rows = (idx + level_offset).reshape(-1)
    upd = (w[..., None] * cot[:, :, None, :]).reshape(-1, f)
    g_table = accumulate_table_rows(
        rows, upd, l * t, block_updates=block, win=win, win_per_block=4
    ).reshape(l, t, f)
    return g_table, jnp.zeros_like(x)


_vmem_encode.defvjp(_vmem_encode_fwd, _vmem_encode_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_blend(table_flat, flat_idx, w, grad_cfg):
    """``sum_c w[..., c] * table_flat[flat_idx[..., c]]`` with a
    scatter-free table backward.

    Args:
        table_flat: (rows, F) parameters.
        flat_idx: (n, L, 8) int32 global row ids.
        w: (n, L, 8) trilinear corner weights.
        grad_cfg: static (block_updates, win, win_per_block) for
            :func:`accumulate_table_rows`.

    Forward math is identical to the plain autodiff path; only the
    table cotangent is rerouted through the sorted-block accumulator
    (XLA's scatter-add costs ~60 ns/row — ~520 ms for the NGP hash
    backward; the sorted path measures ~3x faster, PERF.md).
    """
    feats = jnp.take(table_flat, flat_idx, axis=0)  # (n, L, 8, F)
    return jnp.sum(feats * w[..., None], axis=2)  # (n, L, F)


def _gather_blend_fwd(table_flat, flat_idx, w, grad_cfg):
    feats = jnp.take(table_flat, flat_idx, axis=0)
    out = jnp.sum(feats * w[..., None], axis=2)
    return out, (table_flat.shape[0], flat_idx, w, feats)


def _gather_blend_bwd(grad_cfg, res, cot):
    rows, flat_idx, w, feats = res
    block, win, wpb = grad_cfg
    # cot: (n, L, F).  Per-corner update rows = w * cot.
    upd = w[..., None] * cot[:, :, None, :]  # (n, L, 8, F)
    f = upd.shape[-1]
    g_table = accumulate_table_rows(
        flat_idx.reshape(-1),
        upd.reshape(-1, f),
        rows,
        block_updates=block,
        win=win,
        win_per_block=wpb,
    )
    g_w = jnp.sum(feats * cot[:, :, None, :], axis=-1)  # (n, L, 8)
    return g_table, None, g_w


_gather_blend.defvjp(_gather_blend_fwd, _gather_blend_bwd)


@dataclasses.dataclass(frozen=True)
class HashGridEncoder:
    """Multiresolution hash-grid encoder (Instant-NGP).

    Static configuration; parameters live in the pytree returned by
    :meth:`init`.

    Attributes:
        n_levels: number of resolution levels (L).
        n_features_per_level: features per level (F).
        log2_hashmap_size: log2 of per-level table size (T).
        base_resolution: coarsest grid resolution.
        max_resolution: finest grid resolution.
    """

    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 4096
    # "scatter": plain autodiff (XLA scatter-add backward).
    # "sorted_blocks": scatter-free sorted-block table gradient
    # (ops/table_grad.py) — ~3x faster backward at hash-training shapes.
    table_grad: str = "scatter"
    # "xla": flat HBM row gather (any table size, x-differentiable).
    # "vmem": fused Pallas kernel with the whole table VMEM-resident
    # (ops/hash_vmem.py) — interpret-mode reference ONLY: current Mosaic
    # cannot lower tpu.dynamic_gather past one vreg of source rows (the
    # measured dead end of VERDICT r4 task 3; see PERF.md).  No
    # x-gradients on this path; table gradient always via sorted blocks.
    lookup: str = "xla"

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def resolutions(self) -> Tuple[int, ...]:
        if self.n_levels == 1:
            return (self.base_resolution,)
        growth = math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )
        return tuple(
            int(math.floor(self.base_resolution * growth**l))
            for l in range(self.n_levels)
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
        """Table parameters ``(L, T, F)``, uniform in [-1e-4, 1e-4] (tcnn's
        default hash-grid init)."""
        return jax.random.uniform(
            key,
            (self.n_levels, self.table_size, self.n_features_per_level),
            dtype,
            minval=-1e-4,
            maxval=1e-4,
        )

    def __call__(self, table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """Encode points.

        Args:
            table: (L, T, F) parameters.
            x: (..., 3) positions in [0, 1]^3 (out-of-range clamps).

        Returns:
            (..., L * F) features (trilinear blend of 8 corners per level).
        """
        batch_shape = x.shape[:-1]
        x = x.reshape(-1, 3)
        n = x.shape[0]
        L, T, F = table.shape

        # Sorted blocks of a uniform stream span ~rows*block/n slots;
        # cover 2x that (the measured-fastest margin, PERF.md; the
        # repair branch keeps arbitrary streams exact), floored so
        # tiny tables still tile.
        n_upd = max(n * L * 8, 1)
        block = min(8192, 1 << max(n_upd - 1, 1).bit_length())
        span = max((L * T) * block // n_upd, 1024)
        win = max(1024, (1 << (span - 1).bit_length()) // 2)

        if self.lookup == "vmem":
            if F != 2:
                raise ValueError("lookup='vmem' supports F=2 tables only")
            out = _vmem_encode(table, x, (self.resolutions, block, win))
            return out.reshape(batch_shape + (L * F,))

        # Per tcnn: scale by resolution, corners at floor/floor+1.
        idx, w = _hash_corners(x, self.resolutions, T)  # (n, L, 8) x2
        level_offset = (jnp.arange(L, dtype=jnp.int32) * T)[None, :, None]
        flat_idx = idx + level_offset  # (n, L, 8)

        table_flat = table.reshape(L * T, F)
        if self.table_grad == "sorted_blocks":
            out = _gather_blend(table_flat, flat_idx, w, (block, win, 4))
        else:
            feats = jnp.take(table_flat, flat_idx, axis=0)  # (n, L, 8, F)
            out = jnp.sum(feats * w[..., None], axis=2)  # (n, L, F)
        return out.reshape(batch_shape + (L * F,))


def spherical_harmonics_16(d: jnp.ndarray) -> jnp.ndarray:
    """Real spherical harmonics basis up to degree 4 (16 components).

    Replaces tcnn's ``SphericalHarmonics`` degree-4 view encoding
    (reference: examples/radiance_fields/ngp.py:111-124).

    Args:
        d: (..., 3) unit view directions.

    Returns:
        (..., 16) basis values.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    return jnp.stack(
        [
            0.28209479177387814 * jnp.ones_like(x),
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ],
        axis=-1,
    )


@dataclasses.dataclass(frozen=True)
class SinusoidalEncoder:
    """Positional (sinusoidal) encoder (reference: mlp.py:46-81).

    Encodes ``x`` to ``[x?, sin(2^k x), cos(2^k x)]`` for
    ``k in [min_deg, max_deg)``.
    """

    x_dim: int
    min_deg: int = 0
    max_deg: int = 10
    use_identity: bool = True

    @property
    def latent_dim(self) -> int:
        return (
            int(self.use_identity) + (self.max_deg - self.min_deg) * 2
        ) * self.x_dim

    def __call__(self, x: jnp.ndarray, alpha=None) -> jnp.ndarray:
        """Encode; ``alpha`` enables the BARF coarse-to-fine window.

        With ``alpha`` set (a scalar in ``[0, max_deg - min_deg]``), frequency
        band ``k`` (0-based from ``min_deg``) is weighted by the smooth window
        ``(1 - cos(pi * clip(alpha - k, 0, 1))) / 2`` — 0 until the schedule
        reaches the band, 1 once it passes (BARF eq. 14).  The identity part
        is never windowed.
        """
        if self.max_deg == self.min_deg:
            return x
        scales = jnp.asarray(
            [2**i for i in range(self.min_deg, self.max_deg)], dtype=x.dtype
        )
        xb = (x[..., None, :] * scales[:, None]).reshape(
            x.shape[:-1] + (-1,)
        )
        latent = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
        if alpha is not None:
            k = jnp.arange(self.max_deg - self.min_deg, dtype=latent.dtype)
            w = 0.5 * (
                1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - k, 0.0, 1.0))
            )
            w = jnp.repeat(w, self.x_dim)  # degree-major layout of xb
            latent = latent * jnp.concatenate([w, w], axis=-1)
        if self.use_identity:
            latent = jnp.concatenate([x, latent], axis=-1)
        return latent
