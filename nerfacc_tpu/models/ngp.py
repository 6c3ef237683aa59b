"""Instant-NGP radiance field: hash-grid encoder + small fused MLPs.

TPU-native replacement for the reference's tinycudann-backed NGP field
(reference: examples/radiance_fields/ngp.py:69-286).  The hash grid and MLPs
are plain JAX — the encoder is a batched gather (HBM-bound), the 64-wide MLPs
are MXU matmuls in bf16 with fp32 accumulation.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .encoders import HashGridEncoder, spherical_harmonics_16


@jax.custom_vjp
def trunc_exp(x):
    """exp with clamped backward (reference: ngp.py:23-39, from torch-ngp).

    The forward is additionally capped at exp(30) ~ 1e13 (the reference's
    is not): a density of 1e13 is already opacity 1 within any step size,
    but an UNCAPPED exp overflows f32 at x ~ 88 and the resulting
    inf * 0 products in the transmittance chain turn the whole train state
    NaN — measured on the hard-surface (opaque) procedural scene, where
    surface-fitting pushes raw densities far past the soft-scene regime.
    """
    return jnp.exp(jnp.clip(x, max=30.0))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.clip(x, max=30.0)), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def contract_to_unisphere(
    x: jnp.ndarray,
    aabb: jnp.ndarray,
    eps: float = 1e-6,
    derivative: bool = False,
) -> jnp.ndarray:
    """Mip-NeRF 360 scene contraction to the unit sphere, remapped to [0, 1].

    (reference: ngp.py:42-66)
    """
    aabb_min, aabb_max = aabb[..., :3], aabb[..., 3:]
    x = (x - aabb_min) / (aabb_max - aabb_min)
    x = x * 2 - 1  # aabb is at [-1, 1]
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    mask = mag[..., 0] > 1

    if derivative:
        dev = (2 * mag - 1) / mag**2 + 2 * x**2 * (
            1 / mag**3 - (2 * mag - 1) / mag**4
        )
        dev = jnp.where(mask[..., None], dev, 1.0)
        return jnp.clip(dev, min=eps)
    safe_mag = jnp.maximum(mag, eps)
    contracted = (2 - 1 / safe_mag) * (x / safe_mag)
    x = jnp.where(mask[..., None], contracted, x)
    return x / 4 + 0.5  # [-inf, inf] is at [0, 1]


def _mlp_init(key, dims):
    params = []
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        # tcnn FullyFusedMLP uses a He-uniform style init.
        a = (6.0 / (d_in + d_out)) ** 0.5
        params.append(
            jax.random.uniform(sub, (d_in, d_out), jnp.float32, -a, a)
        )
    return params


def _mlp_apply(params, x, compute_dtype=jnp.bfloat16):
    """Bias-free ReLU MLP (tcnn FullyFusedMLP has no biases)."""
    x = x.astype(compute_dtype)
    for i, w in enumerate(params):
        x = jnp.dot(
            x, w.astype(compute_dtype), preferred_element_type=jnp.float32
        )
        if i < len(params) - 1:
            x = jax.nn.relu(x).astype(compute_dtype)
    return x


def _cubify_aabb(aabb: jnp.ndarray) -> jnp.ndarray:
    """Enforce a cube aabb (reference: ngp.py:89-93)."""
    center = (aabb[:3] + aabb[3:]) / 2.0
    size = jnp.max(aabb[3:] - aabb[:3])
    return jnp.concatenate([center - size / 2.0, center + size / 2.0])


@dataclasses.dataclass(frozen=True)
class NGPRadianceField:
    """Instant-NGP radiance field (reference: ngp.py:69-217).

    Hash grid (16 levels x 2 feats, 2^19 table, res 16..4096) -> 1-hidden
    64-wide density MLP -> (SH-16 viewdir + 15 geo feats) -> 2-hidden 64-wide
    color MLP.  ``density = trunc_exp(raw - 1)``, rgb sigmoid.
    """

    aabb: Tuple[float, ...]
    num_dim: int = 3
    use_viewdirs: bool = True
    unbounded: bool = False
    base_resolution: int = 16
    max_resolution: int = 4096
    geo_feat_dim: int = 15
    n_levels: int = 16
    log2_hashmap_size: int = 19
    hidden_dim: int = 64
    compute_dtype: Any = jnp.bfloat16
    # Occupancy-refresh chunk bound: the hash encoder materializes
    # (n, L, 8[, F]) intermediates whose tiny minor dims tile-pad up to
    # 16x on TPU — a whole-grid (2^21-cell) dense refresh tries to
    # allocate ~32 GB.  Consumers (NGPOccTrainer's update_occ_grid) cap
    # their eval chunk at this.
    max_eval_chunk: int = 2**15
    # Table-gradient path for the hash encoder (see HashGridEncoder).
    table_grad: str = "sorted_blocks"
    # Lookup path: "xla" flat gather, or "vmem" (interpret-mode-only
    # fused Pallas kernel — the measured Mosaic dead end, ops/hash_vmem.py).
    hash_lookup: str = "xla"

    def __post_init__(self):
        object.__setattr__(
            self,
            "encoder",
            HashGridEncoder(
                n_levels=self.n_levels,
                n_features_per_level=2,
                log2_hashmap_size=self.log2_hashmap_size,
                base_resolution=self.base_resolution,
                max_resolution=self.max_resolution,
                table_grad=self.table_grad,
                lookup=self.hash_lookup,
            ),
        )

    def _aabb(self) -> jnp.ndarray:
        return _cubify_aabb(jnp.asarray(self.aabb, jnp.float32))

    def init(self, key: jax.Array) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "encoder": self.encoder.init(k1),
            "mlp_base": _mlp_init(
                k2,
                [self.encoder.output_dim, self.hidden_dim, 1 + self.geo_feat_dim],
            ),
        }
        head_in = (16 if self.use_viewdirs else 0) + self.geo_feat_dim
        params["mlp_head"] = _mlp_init(
            k3, [head_in, self.hidden_dim, self.hidden_dim, 3]
        )
        return params

    def _normalize(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        aabb = self._aabb()
        if self.unbounded:
            u = contract_to_unisphere(x, aabb)
            selector = jnp.ones(x.shape[:-1], bool)
        else:
            lo, hi = aabb[:3], aabb[3:]
            u = (x - lo) / (hi - lo)
            selector = ((u > 0.0) & (u < 1.0)).all(axis=-1)
        return u, selector

    def query_density(
        self, params: Dict, x: jnp.ndarray, return_feat: bool = False
    ):
        """(reference: ngp.py:165-187)"""
        u, selector = self._normalize(x)
        feats = self.encoder(params["encoder"], u)
        h = _mlp_apply(params["mlp_base"], feats, self.compute_dtype)
        raw_density, geo_feat = h[..., :1], h[..., 1:]
        density = trunc_exp(raw_density - 1.0) * selector[..., None]
        if return_feat:
            return density, geo_feat
        return density

    def _query_rgb(
        self,
        params: Dict,
        dirs: Optional[jnp.ndarray],
        embedding: jnp.ndarray,
        apply_act: bool = True,
    ) -> jnp.ndarray:
        """(reference: ngp.py:189-204)"""
        if self.use_viewdirs:
            d = spherical_harmonics_16(dirs)
            h = jnp.concatenate([d, embedding], axis=-1)
        else:
            h = embedding
        rgb = _mlp_apply(params["mlp_head"], h, self.compute_dtype)
        if apply_act:
            rgb = jax.nn.sigmoid(rgb)
        return rgb

    def query_opacity(
        self, params: Dict, x: jnp.ndarray, step_size: float
    ) -> jnp.ndarray:
        return self.query_density(params, x) * step_size

    def __call__(
        self,
        params: Dict,
        positions: jnp.ndarray,
        directions: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.use_viewdirs and directions is not None:
            assert positions.shape == directions.shape
        density, embedding = self.query_density(params, positions, return_feat=True)
        rgb = self._query_rgb(params, directions, embedding)
        return rgb, density


@dataclasses.dataclass(frozen=True)
class NGPDensityField:
    """Instant-NGP density field for proposal resampling (reference: ngp.py:220-286)."""

    aabb: Tuple[float, ...]
    num_dim: int = 3
    unbounded: bool = False
    base_resolution: int = 16
    max_resolution: int = 128
    n_levels: int = 5
    log2_hashmap_size: int = 17
    hidden_dim: int = 64
    compute_dtype: Any = jnp.bfloat16
    max_eval_chunk: int = 2**16  # see NGPRadianceField.max_eval_chunk
    table_grad: str = "sorted_blocks"  # see HashGridEncoder
    hash_lookup: str = "xla"  # see NGPRadianceField.hash_lookup

    def __post_init__(self):
        object.__setattr__(
            self,
            "encoder",
            HashGridEncoder(
                n_levels=self.n_levels,
                n_features_per_level=2,
                log2_hashmap_size=self.log2_hashmap_size,
                base_resolution=self.base_resolution,
                max_resolution=self.max_resolution,
                table_grad=self.table_grad,
                lookup=self.hash_lookup,
            ),
        )

    def init(self, key: jax.Array) -> Dict:
        k1, k2 = jax.random.split(key)
        return {
            "encoder": self.encoder.init(k1),
            "mlp_base": _mlp_init(k2, [self.encoder.output_dim, self.hidden_dim, 1]),
        }

    def __call__(self, params: Dict, positions: jnp.ndarray) -> jnp.ndarray:
        aabb = jnp.asarray(self.aabb, jnp.float32)
        if self.unbounded:
            u = contract_to_unisphere(positions, aabb)
            selector = jnp.ones(positions.shape[:-1], bool)
        else:
            lo, hi = aabb[:3], aabb[3:]
            u = (positions - lo) / (hi - lo)
            selector = ((u > 0.0) & (u < 1.0)).all(axis=-1)
        feats = self.encoder(params["encoder"], u)
        raw = _mlp_apply(params["mlp_base"], feats, self.compute_dtype)
        return trunc_exp(raw - 1.0) * selector[..., None]
