"""K-Planes dynamic (space-time) radiance field — all-matmul, TPU-native.

The reference benchmarks nerfacc with K-Planes on D-NeRF (reference:
docs/source/examples/dynamic/kplanes.rst:10-27 — mean PSNR 30.29 at 40 min
vs the official 70 min; the model code lives in an external submodule).
This is the in-tree TPU-native equivalent: a 4-D (x, y, z, t) scene is
factorized into SIX feature planes per level — the three spatial pairs
(xy, xz, yz) and the three space-time pairs (xt, yt, zt) — whose bilinear
features combine multiplicatively (Hadamard) per K-Planes, concatenated
over resolution levels, feeding the same small MLPs as the static fields.

Why planes-as-matmuls: a bilinear plane lookup is normally a 4-neighbor 2-D
gather — serial and bandwidth-starved on this memory system (PERF.md cost
model).  At plane resolutions <= ~128 it is instead the exact dense chain
``hat_u @ P`` (one (N, R) x (R, R*rank) MXU matmul) followed by a local
``hat_v`` contraction that XLA fuses into the matmul epilogue — zero
gathers, exact bilinear semantics, same trick as the static tri-plane
levels (cp_field.CPGridEncoder.plane_resolutions).

Time planes initialize to EXACTLY one so the scene starts static and
motion is learned as a multiplicative perturbation (the K-Planes paper's
init); the spatial planes use the same near-one init as the CP tables.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .encoders import spherical_harmonics_16
from .ngp import _mlp_apply, _mlp_init, contract_to_unisphere, trunc_exp

# (xy, xz, yz, xt, yt, zt) — coordinate index pairs into (x, y, z, t)
_PAIRS = ((0, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 3))


@dataclasses.dataclass(frozen=True)
class KPlanesEncoder:
    """Multi-level 6-plane space-time encoder.

    Attributes:
        resolutions: per-level 2-D plane resolutions (shared by all six
            planes of the level, space and time axes alike).
        ranks: per-level feature width (= output features per level).
    """

    resolutions: Sequence[int] = (32, 64)
    ranks: Sequence[int] = (16, 16)
    compute_dtype: Any = jnp.bfloat16
    # Per-plane feature activation applied after the bilinear interp:
    #   "none" — raw features (the paper's formulation).  The 6-way
    #       Hadamard product then has a multiplicative positive-feedback
    #       loop: d(prod)/d(f_i) = prod of the OTHER five, so once plane
    #       magnitudes drift above ~1 every gradient amplifies the drift
    #       (measured: TV 1e-4 collapses 30 -> 9 dB by step 10k; TV 1e-3
    #       damps it — docs/benchmarks.md).
    #   "tanh" — f -> 1 + tanh(f - 1): identity-like at the near-one init
    #       (value, slope both match), bounded to (0, 2), so the product
    #       stays in (0, 64) and the feedback loop cannot run away; the
    #       density's dynamic range comes from the MLP + trunc_exp.
    plane_activation: str = "none"
    # Amplitude prior: adds amp_prior * mean((plane - 1)^2) PER LEVEL to
    # param_regularizer (same units as the TV terms, scaled together by
    # the trainer's field_reg_weight).  A leash on plane magnitude that —
    # unlike TV — doesn't couple neighboring texels, so it damps the
    # product feedback without the over-smoothing cost of TV 1e-3.
    amp_prior: float = 0.0

    @property
    def output_dim(self) -> int:
        return int(sum(self.ranks))

    def init(self, key: jax.Array) -> Dict:
        planes = []
        for R, rank in zip(self.resolutions, self.ranks):
            key, sub = jax.random.split(key)
            p = 1.0 + 0.1 * jax.random.normal(
                sub, (6, R, R, rank), jnp.float32
            )
            # time-involving planes start at exactly 1: static-scene bias,
            # motion enters as a learned multiplicative perturbation
            p = p.at[3:].set(1.0)
            planes.append(p)
        return {"planes": planes}

    def __call__(self, params: Dict, q: jnp.ndarray) -> jnp.ndarray:
        """Encode 4-D points ``q = (x, y, z, t) in [0, 1]^4`` (clamped) to
        ``(N, sum(ranks))`` features."""
        q = jnp.clip(q, 0.0, 1.0)
        feats = [
            self._level_encode(q, plane, R=R)
            for R, plane in zip(self.resolutions, params["planes"])
        ]
        return jnp.concatenate(feats, axis=-1)

    def _level_encode(self, q, plane, *, R: int) -> jnp.ndarray:
        """One level: Hadamard product of six bilinear plane features."""
        rank = plane.shape[-1]
        cd = self.compute_dtype
        pos = q.T * (R - 1)  # (4, N)
        grid = jnp.arange(R, dtype=q.dtype)
        hat = jnp.maximum(
            0.0, 1.0 - jnp.abs(pos[:, :, None] - grid[None, None, :])
        ).astype(cd)  # (4, N, R) — per coordinate, shared across planes
        hat_u = jnp.stack([hat[a] for a, _ in _PAIRS])  # (6, N, R)
        tbl = plane.astype(cd).reshape(6, R, R * rank)
        t = jax.lax.dot_general(
            hat_u,
            tbl,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=cd,
        ).reshape(6, -1, R, rank)  # (6, N, R, rank)
        hat_v = jnp.stack([hat[b] for _, b in _PAIRS])  # (6, N, R)
        f = jnp.sum(t * hat_v[..., None], axis=2)  # (6, N, rank)
        if self.plane_activation == "tanh":
            # bounded features: identity-like at the near-1 init, (0, 2)
            # range — breaks the Hadamard positive-feedback loop (see the
            # attribute docstring); applied in f32 so the bound is exact
            f = 1.0 + jnp.tanh(f.astype(jnp.float32) - 1.0)
            f = f.astype(self.compute_dtype)
        out = f[0]
        for i in range(1, 6):
            out = out * f[i]
        return out.astype(jnp.float32)

    def param_regularizer(self, params: Dict) -> jnp.ndarray:
        """K-Planes priors: TV smoothness over every plane axis plus the
        1-D second-difference time-smoothness prior on the time axis of the
        space-time planes (axis 2 of plane entries 3..5)."""
        terms = []
        for plane in params["planes"]:
            du = plane[:, 1:, :, :] - plane[:, :-1, :, :]
            dv = plane[:, :, 1:, :] - plane[:, :, :-1, :]
            terms.append(jnp.mean(du * du) + jnp.mean(dv * dv))
            t2 = (
                plane[3:, :, 2:, :]
                - 2.0 * plane[3:, :, 1:-1, :]
                + plane[3:, :, :-2, :]
            )
            terms.append(jnp.mean(t2 * t2))
            if self.amp_prior > 0.0:
                d1 = plane - 1.0
                terms.append(self.amp_prior * jnp.mean(d1 * d1))
        return sum(terms)


@dataclasses.dataclass(frozen=True)
class KPlanesRadianceField:
    """Dynamic radiance field over the K-Planes encoder + small MLPs.

    Drop-in for :class:`~nerfacc_tpu.models.mlp.TNeRFRadianceField` (same
    time-dependent protocol: ``query_density(params, x, t)``,
    ``__call__(params, x, t, condition)``, and ``query_opacity`` drawing
    random frame times per queried cell for occupancy updates) with an
    all-matmul compute path instead of warp MLPs.
    """

    aabb: Tuple[float, ...] = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)
    unbounded: bool = False
    resolutions: Sequence[int] = (32, 64)
    ranks: Sequence[int] = (16, 16)
    geo_feat_dim: int = 15
    hidden_dim: int = 64
    use_viewdirs: bool = True
    compute_dtype: Any = jnp.bfloat16
    plane_activation: str = "none"
    amp_prior: float = 0.0

    def __post_init__(self):
        object.__setattr__(
            self,
            "encoder",
            KPlanesEncoder(
                resolutions=tuple(self.resolutions),
                ranks=tuple(self.ranks),
                compute_dtype=self.compute_dtype,
                plane_activation=self.plane_activation,
                amp_prior=self.amp_prior,
            ),
        )

    @property
    def max_eval_chunk(self) -> int:
        """Occupancy-update eval chunk bound (see update_occ_grid): each
        plane level materializes a (6, N, R*rank) bf16 dot output — the
        dense refresh's whole-grid N (2M cells at 128^3) would be tens of
        GB.  Cap the chunk so the intermediate stays ~<=1.5 GB."""
        per = sum(R * r for R, r in zip(self.resolutions, self.ranks))
        cap = max(2**12, int(1.25e8) // max(per, 1))
        return 1 << (cap.bit_length() - 1)

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

    def _features(self, params, x, t):
        u, selector = self._normalize(x)
        tt = jnp.clip(t.reshape(-1, 1).astype(jnp.float32), 0.0, 1.0)
        q = jnp.concatenate([u, tt], axis=-1)
        return self.encoder(params["encoder"], q), selector

    def query_density(
        self, params, x, t, return_feat: bool = False
    ):
        feats, selector = self._features(params, x, t)
        h = _mlp_apply(params["mlp_base"], feats, self.compute_dtype)
        raw_density, geo_feat = h[..., :1], h[..., 1:]
        density = trunc_exp(raw_density - 1.0) * selector[..., None]
        if return_feat:
            return density, geo_feat
        return density

    def query_opacity(
        self,
        params: Dict,
        x: jnp.ndarray,
        timestamps: jnp.ndarray,
        step_size: float,
        key: jax.Array,
    ) -> jnp.ndarray:
        """Random frame time per queried cell (reference: mlp.py:264-271)."""
        idxs = jax.random.randint(key, (x.shape[0],), 0, timestamps.shape[0])
        t = timestamps[idxs]
        return self.query_density(params, x, t) * step_size

    def param_regularizer(self, params) -> jnp.ndarray:
        """TV + time-smoothness priors over the plane tables (wire via the
        trainer's ``field_reg_weight``)."""
        return self.encoder.param_regularizer(params["encoder"])

    def __call__(
        self,
        params: Dict,
        x: jnp.ndarray,
        t: jnp.ndarray,
        condition: Optional[jnp.ndarray] = None,
    ):
        density, geo_feat = self.query_density(params, x, t, return_feat=True)
        if self.use_viewdirs and condition is not None:
            d = spherical_harmonics_16(condition)
            h = jnp.concatenate([d, geo_feat], axis=-1)
        else:
            h = geo_feat
        rgb = jax.nn.sigmoid(
            _mlp_apply(params["mlp_head"], h, self.compute_dtype)
        )
        return rgb, density
