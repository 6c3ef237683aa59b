"""MLP radiance fields: vanilla NeRF and T-NeRF (dynamic scenes).

TPU-native rebuild of the reference example fields
(reference: examples/radiance_fields/mlp.py:14-283).  Models are frozen
config dataclasses with ``init(key) -> params`` and pure apply methods —
everything jit/grad/vmap-composable.  Matmuls run in a configurable compute
dtype (bf16 by default) with fp32 accumulation for the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .encoders import SinusoidalEncoder


def _xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    a = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def _linear_init(key, in_dim, out_dim, w_init=_xavier_uniform):
    return {
        "w": w_init(key, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def _linear(p, x, compute_dtype=None):
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = p["w"].astype(compute_dtype)
    else:
        w = p["w"]
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + p["b"]


@dataclasses.dataclass(frozen=True)
class MLP:
    """Plain MLP with optional skip connections (reference: mlp.py:14-101)."""

    input_dim: int
    output_dim: Optional[int] = None
    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = 4
    output_enabled: bool = True
    output_init_scale: Optional[float] = None  # uniform [0, b] when set
    compute_dtype: Any = None

    def init(self, key: jax.Array) -> Dict:
        keys = jax.random.split(key, self.net_depth + 1)
        layers: List[Dict] = []
        in_features = self.input_dim
        for i in range(self.net_depth):
            layers.append(_linear_init(keys[i], in_features, self.net_width))
            if (
                self.skip_layer is not None
                and i % self.skip_layer == 0
                and i > 0
            ):
                in_features = self.net_width + self.input_dim
            else:
                in_features = self.net_width
        params = {"hidden": layers}
        if self.output_enabled:
            if self.output_init_scale is not None:
                w_init = lambda k, s, d=jnp.float32: jax.random.uniform(
                    k, s, d, minval=0.0, maxval=self.output_init_scale
                )
            else:
                w_init = _xavier_uniform
            params["output"] = _linear_init(
                keys[-1], in_features, self.output_dim, w_init
            )
        return params

    @property
    def final_dim(self) -> int:
        if self.output_enabled:
            return self.output_dim
        if self.skip_layer is not None and self.net_depth > 0:
            # width of the feature after the last hidden layer (+concat skip)
            last = self.net_depth - 1
            if last % self.skip_layer == 0 and last > 0:
                return self.net_width + self.input_dim
        return self.net_width

    def __call__(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        inputs = x
        for i in range(self.net_depth):
            x = _linear(params["hidden"][i], x, self.compute_dtype)
            x = jax.nn.relu(x)
            if (
                self.skip_layer is not None
                and i % self.skip_layer == 0
                and i > 0
            ):
                x = jnp.concatenate([x, inputs], axis=-1)
        if self.output_enabled:
            x = _linear(params["output"], x, self.compute_dtype)
        return x


@dataclasses.dataclass(frozen=True)
class NerfMLP:
    """NeRF trunk: base MLP + sigma head + view-conditioned rgb branch
    (reference: mlp.py:114-165)."""

    input_dim: int
    condition_dim: int
    net_depth: int = 8
    net_width: int = 256
    skip_layer: Optional[int] = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128
    compute_dtype: Any = None

    def __post_init__(self):
        object.__setattr__(
            self,
            "base",
            MLP(
                input_dim=self.input_dim,
                net_depth=self.net_depth,
                net_width=self.net_width,
                skip_layer=self.skip_layer,
                output_enabled=False,
                compute_dtype=self.compute_dtype,
            ),
        )
        hidden = self.base.final_dim
        object.__setattr__(
            self,
            "sigma_layer",
            MLP(hidden, 1, net_depth=0, skip_layer=None,
                compute_dtype=self.compute_dtype),
        )
        object.__setattr__(
            self,
            "bottleneck_layer",
            MLP(hidden, self.net_width, net_depth=0, skip_layer=None,
                compute_dtype=self.compute_dtype),
        )
        object.__setattr__(
            self,
            "rgb_layer",
            MLP(
                input_dim=self.net_width + self.condition_dim,
                output_dim=3,
                net_depth=self.net_depth_condition,
                net_width=self.net_width_condition,
                skip_layer=None,
                compute_dtype=self.compute_dtype,
            ),
        )

    def init(self, key: jax.Array) -> Dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "base": self.base.init(k1),
            "sigma": self.sigma_layer.init(k2),
            "bottleneck": self.bottleneck_layer.init(k3),
            "rgb": self.rgb_layer.init(k4),
        }

    def query_density(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        h = self.base(params["base"], x)
        return self.sigma_layer(params["sigma"], h)

    def __call__(
        self, params: Dict, x: jnp.ndarray, condition: Optional[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.base(params["base"], x)
        raw_sigma = self.sigma_layer(params["sigma"], h)
        if condition is not None:
            if condition.shape[:-1] != h.shape[:-1]:
                condition = jnp.broadcast_to(
                    condition.reshape(
                        condition.shape[:1]
                        + (1,) * (h.ndim - condition.ndim)
                        + condition.shape[-1:]
                    ),
                    h.shape[:-1] + condition.shape[-1:],
                )
            bottleneck = self.bottleneck_layer(params["bottleneck"], h)
            h = jnp.concatenate([bottleneck, condition], axis=-1)
        raw_rgb = self.rgb_layer(params["rgb"], h)
        return raw_rgb, raw_sigma


@dataclasses.dataclass(frozen=True)
class VanillaNeRFRadianceField:
    """The original NeRF field: 8x256 MLP, skip at 4, PE degrees 10/4
    (reference: mlp.py:206-245)."""

    net_depth: int = 8
    net_width: int = 256
    skip_layer: int = 4
    net_depth_condition: int = 1
    net_width_condition: int = 128
    compute_dtype: Any = None

    def __post_init__(self):
        object.__setattr__(
            self, "posi_encoder", SinusoidalEncoder(3, 0, 10, True)
        )
        object.__setattr__(
            self, "view_encoder", SinusoidalEncoder(3, 0, 4, True)
        )
        object.__setattr__(
            self,
            "mlp",
            NerfMLP(
                input_dim=self.posi_encoder.latent_dim,
                condition_dim=self.view_encoder.latent_dim,
                net_depth=self.net_depth,
                net_width=self.net_width,
                skip_layer=self.skip_layer,
                net_depth_condition=self.net_depth_condition,
                net_width_condition=self.net_width_condition,
                compute_dtype=self.compute_dtype,
            ),
        )

    def init(self, key: jax.Array) -> Dict:
        return self.mlp.init(key)

    def query_opacity(
        self, params: Dict, x: jnp.ndarray, step_size: float
    ) -> jnp.ndarray:
        # density * step_size ~= 1 - exp(-density * step_size) for small
        # values (reference: mlp.py:228-233).
        return self.query_density(params, x) * step_size

    def query_density(
        self, params: Dict, x: jnp.ndarray, pe_alpha=None
    ) -> jnp.ndarray:
        h = self.posi_encoder(x, alpha=pe_alpha)
        sigma = self.mlp.query_density(params, h)
        return jax.nn.relu(sigma)

    def __call__(
        self,
        params: Dict,
        x: jnp.ndarray,
        condition: Optional[jnp.ndarray] = None,
        pe_alpha=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``pe_alpha`` is the BARF coarse-to-fine positional-encoding window
        (see :func:`~nerfacc_tpu.models.pose.coarse_to_fine_alpha`); ``None``
        keeps the full spectrum (plain NeRF)."""
        h = self.posi_encoder(x, alpha=pe_alpha)
        cond = self.view_encoder(condition) if condition is not None else None
        rgb, sigma = self.mlp(params, h, cond)
        return jax.nn.sigmoid(rgb), jax.nn.relu(sigma)


@dataclasses.dataclass(frozen=True)
class TNeRFRadianceField:
    """T-NeRF for dynamic scenes: a 4x64 warp MLP conditioned on time feeding
    a vanilla NeRF (reference: mlp.py:248-283)."""

    compute_dtype: Any = None

    def __post_init__(self):
        object.__setattr__(
            self, "posi_encoder", SinusoidalEncoder(3, 0, 4, True)
        )
        object.__setattr__(
            self, "time_encoder", SinusoidalEncoder(1, 0, 4, True)
        )
        object.__setattr__(
            self,
            "warp",
            MLP(
                input_dim=self.posi_encoder.latent_dim
                + self.time_encoder.latent_dim,
                output_dim=3,
                net_depth=4,
                net_width=64,
                skip_layer=2,
                output_init_scale=1e-4,
                compute_dtype=self.compute_dtype,
            ),
        )
        object.__setattr__(
            self,
            "nerf",
            VanillaNeRFRadianceField(compute_dtype=self.compute_dtype),
        )

    def init(self, key: jax.Array) -> Dict:
        k1, k2 = jax.random.split(key)
        return {"warp": self.warp.init(k1), "nerf": self.nerf.init(k2)}

    def _warped(self, params: Dict, x: jnp.ndarray, t: jnp.ndarray):
        return x + self.warp(
            params["warp"],
            jnp.concatenate(
                [self.posi_encoder(x), self.time_encoder(t)], axis=-1
            ),
        )

    def query_opacity(
        self,
        params: Dict,
        x: jnp.ndarray,
        timestamps: jnp.ndarray,
        step_size: float,
        key: jax.Array,
    ) -> jnp.ndarray:
        idxs = jax.random.randint(key, (x.shape[0],), 0, timestamps.shape[0])
        t = timestamps[idxs]
        return self.query_density(params, x, t) * step_size

    def query_density(
        self, params: Dict, x: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        x = self._warped(params, x, t)
        return self.nerf.query_density(params["nerf"], x)

    def __call__(
        self,
        params: Dict,
        x: jnp.ndarray,
        t: jnp.ndarray,
        condition: Optional[jnp.ndarray] = None,
    ):
        x = self._warped(params, x, t)
        return self.nerf(params["nerf"], x, condition=condition)


@dataclasses.dataclass(frozen=True)
class NDRTNeRFRadianceField:
    """Dynamic-scene field with an INVERTIBLE deformation network
    (reference: mlp.py:286-395, after https://arxiv.org/pdf/2206.15258.pdf).

    The warp is three coupled real-NVP-style blocks; each block updates the
    third coordinate additively from the other two, then rigidly moves the
    first two by a time-conditioned 2-D rotation+translation — both steps are
    exactly invertible, so the deformation cannot collapse space.  Axes are
    cyclically permuted between blocks.
    """

    compute_dtype: Any = None

    def __post_init__(self):
        object.__setattr__(
            self, "time_encoder", SinusoidalEncoder(1, 0, 4, True)
        )
        object.__setattr__(
            self, "posi_encoder_1", SinusoidalEncoder(2, 0, 4, True)
        )
        object.__setattr__(
            self, "posi_encoder_2", SinusoidalEncoder(1, 0, 4, True)
        )
        object.__setattr__(
            self,
            "warp1",
            MLP(
                input_dim=self.posi_encoder_1.latent_dim + 64,
                output_dim=1,
                net_depth=2,
                net_width=128,
                skip_layer=None,
                output_init_scale=1e-4,
                compute_dtype=self.compute_dtype,
            ),
        )
        object.__setattr__(
            self,
            "warp2",
            MLP(
                input_dim=self.posi_encoder_2.latent_dim + 64,
                output_dim=1 + 2,
                net_depth=1,
                net_width=128,
                skip_layer=None,
                output_init_scale=1e-4,
                compute_dtype=self.compute_dtype,
            ),
        )
        object.__setattr__(
            self,
            "nerf",
            VanillaNeRFRadianceField(compute_dtype=self.compute_dtype),
        )

    def init(self, key: jax.Array) -> Dict:
        keys = jax.random.split(key, 13)
        t_lat = self.time_encoder.latent_dim
        return {
            "warp1": [self.warp1.init(keys[i]) for i in range(3)],
            "warp2": [self.warp2.init(keys[3 + i]) for i in range(3)],
            "time1": [
                _linear_init(keys[6 + i], t_lat, 64) for i in range(3)
            ],
            "time2": [
                _linear_init(keys[9 + i], t_lat, 64) for i in range(3)
            ],
            "nerf": self.nerf.init(keys[12]),
        }

    def _warp_block(self, params, x, t_enc, i):
        uv, w = x[:, :2], x[:, 2:]
        # additive coupling on the third coordinate
        tfeat1 = _linear(params["time1"][i], t_enc, self.compute_dtype)
        dw = self.warp1(
            params["warp1"][i],
            jnp.concatenate([self.posi_encoder_1(uv), tfeat1], axis=-1),
        )
        w = w + dw
        # time+depth conditioned inverse 2-D rigid motion on the other two
        tfeat2 = _linear(params["time2"][i], t_enc, self.compute_dtype)
        rt = self.warp2(
            params["warp2"][i],
            jnp.concatenate([self.posi_encoder_2(w), tfeat2], axis=-1),
        )
        theta = rt[:, 0]
        tr = rt[:, 1:]
        c, s = jnp.cos(theta), jnp.sin(theta)
        p = uv - tr
        uv = jnp.stack(
            [c * p[:, 0] - s * p[:, 1], s * p[:, 0] + c * p[:, 1]], axis=-1
        )
        return jnp.concatenate([uv, w], axis=-1)

    def warp(self, params: Dict, x: jnp.ndarray, t: jnp.ndarray):
        t_enc = self.time_encoder(t)
        x = self._warp_block(params, x, t_enc, 0)
        x = x[..., jnp.array([1, 2, 0])]
        x = self._warp_block(params, x, t_enc, 1)
        x = x[..., jnp.array([2, 0, 1])]
        x = self._warp_block(params, x, t_enc, 2)
        return x

    def query_opacity(
        self,
        params: Dict,
        x: jnp.ndarray,
        timestamps: jnp.ndarray,
        step_size: float,
        key: jax.Array,
    ) -> jnp.ndarray:
        idxs = jax.random.randint(key, (x.shape[0],), 0, timestamps.shape[0])
        t = timestamps[idxs]
        return self.query_density(params, x, t) * step_size

    def query_density(
        self, params: Dict, x: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        x = self.warp(params, x, t)
        return self.nerf.query_density(params["nerf"], x)

    def __call__(
        self,
        params: Dict,
        x: jnp.ndarray,
        t: jnp.ndarray,
        condition: Optional[jnp.ndarray] = None,
    ):
        x = self.warp(params, x, t)
        return self.nerf(params["nerf"], x, condition=condition)
