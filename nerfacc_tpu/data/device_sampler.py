"""Device-resident random ray-batch sampling.

The reference train loops draw each batch on the GPU (dataset tensors live
on-device; `torch.randint` + fancy indexing — reference:
examples/datasets/nerf_synthetic.py:104-160).  The TPU analog stages the
whole image set + camera rig on device ONCE and draws every batch *inside*
the jitted train program: profiling the proposal trainer showed the fused
device step at ~8 ms while the training loop sustained ~13.5 ms/step — the
gap was host-side numpy batch assembly + per-call H2D, which this module
removes entirely (the host only dispatches; see PERF.md "Proposal-network
path").

A batch drawn here matches the host loaders' `__getitem__` bit-for-bit in
structure: gathers of uint8 RGBA pixels, pinhole ray directions through the
camera-to-world rotation (OpenGL convention by default), and background
compositing — validated against `ProceduralSceneLoader` in
tests/test_device_sampler.py.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceRaySampler:
    """Stages a pinhole-camera dataset on device; draws jittable ray batches.

    Args:
        images: (n_images, H, W, 4) uint8 RGBA (or (.., 3) RGB).
        camtoworlds: (n_images, 4, 4) or (n_images, 3, 4) camera-to-world.
        K: (3, 3) shared pinhole intrinsics.
        num_rays: rays per batch (static shape).
        color_bkgd_aug: "white" | "black" | "random" (per-batch draw).
        opengl_camera: OpenGL convention (camera looks down -z, y up).
    """

    def __init__(
        self,
        images: np.ndarray,
        camtoworlds: np.ndarray,
        K: np.ndarray,
        num_rays: int,
        color_bkgd_aug: str = "white",
        opengl_camera: bool = True,
    ):
        images = np.asarray(images)
        assert images.ndim == 4 and images.shape[-1] in (3, 4)
        if images.shape[-1] == 3:
            alpha = np.full(images.shape[:-1] + (1,), 255, images.dtype)
            images = np.concatenate([images, alpha], axis=-1)
        n, h, w, _ = images.shape
        # the flat pixel index is computed in int32 inside the jit; beyond
        # 2^31 pixels it would silently wrap and gather wrong rows
        assert n * h * w < 2**31, (
            f"image set has {n * h * w} pixels — exceeds the int32 flat "
            "pixel index (downsample or shard the image table)"
        )
        self.n_images, self.height, self.width = n, h, w
        self.num_rays = int(num_rays)
        self.color_bkgd_aug = color_bkgd_aug
        self.opengl_camera = bool(opengl_camera)
        # flat pixel table: ONE row gather per batch instead of 3-axis
        # advanced indexing (which XLA lowers to the same gather anyway,
        # but the flat layout makes the cost explicit: num_rays rows)
        self.arrays = {
            "pixels": jnp.asarray(
                images.reshape(n * h * w, images.shape[-1]), jnp.uint8
            ),
            "c2w": jnp.asarray(
                np.asarray(camtoworlds)[:, :3, :4], jnp.float32
            ),
            "K": jnp.asarray(np.asarray(K), jnp.float32),
        }

    def with_num_rays(self, num_rays: int) -> "DeviceRaySampler":
        """A sampler drawing ``num_rays``-ray batches from the SAME staged
        device tables (no copy) — for bucketed dynamic batch sizing, where
        each bucket is its own static shape / jit specialization.

        Clones are cached per ray count: samplers are jit static args keyed
        by identity, so returning a fresh object each call would recompile
        the train program every dispatch.  The cache dict is SHARED between
        the base sampler and every clone — resizing from a clone
        (``s.with_num_rays(64).with_num_rays(96)``) must return the same
        object as resizing from the base, or the jit cache forks."""
        num_rays = int(num_rays)
        if num_rays == self.num_rays:
            return self
        cache = self.__dict__.setdefault("_clones", {})
        cache.setdefault(self.num_rays, self)
        if num_rays not in cache:
            clone = object.__new__(DeviceRaySampler)
            clone.__dict__.update(
                {k: v for k, v in self.__dict__.items() if k != "_clones"}
            )
            clone.num_rays = num_rays
            clone._clones = cache  # shared, so clones-of-clones dedupe
            cache[num_rays] = clone
        return cache[num_rays]

    @classmethod
    def from_loader(cls, loader, num_rays: int = None) -> "DeviceRaySampler":
        """Build from any loader exposing images/camtoworlds/K (the
        procedural + nerf_synthetic loaders' attribute protocol)."""
        if num_rays is None:
            num_rays = loader.num_rays
        assert isinstance(num_rays, int) and num_rays > 0, (
            f"num_rays must be a positive int, got {num_rays!r} "
            "(test-split loaders carry num_rays=None — pass it explicitly)"
        )
        return cls(
            images=np.asarray(loader.images),
            camtoworlds=np.asarray(loader.camtoworlds),
            K=np.asarray(loader.K),
            num_rays=num_rays,
            color_bkgd_aug=getattr(loader, "color_bkgd_aug", "white"),
            opengl_camera=getattr(loader, "OPENGL_CAMERA", True),
        )

    def sample(self, arrays: Dict, key: jax.Array) -> Dict[str, jnp.ndarray]:
        """Draw one training batch (pure function of (arrays, key); jit/scan
        safe).  ``arrays`` is ``self.arrays`` threaded through the caller's
        jitted program so the tables live as program inputs, not constants."""
        n_rays = self.num_rays
        kid, kx, ky, kb = jax.random.split(key, 4)
        image_id = jax.random.randint(kid, (n_rays,), 0, self.n_images)
        x = jax.random.randint(kx, (n_rays,), 0, self.width)
        y = jax.random.randint(ky, (n_rays,), 0, self.height)

        flat = (image_id * self.height + y) * self.width + x
        rgba = jnp.take(arrays["pixels"], flat, axis=0).astype(
            jnp.float32
        ) / 255.0

        if self.color_bkgd_aug == "random":
            color_bkgd = jax.random.uniform(kb, (3,), jnp.float32)
        elif self.color_bkgd_aug == "white":
            color_bkgd = jnp.ones(3, jnp.float32)
        else:
            color_bkgd = jnp.zeros(3, jnp.float32)

        rgb = rgba[:, :3] * rgba[:, 3:] + color_bkgd * (1.0 - rgba[:, 3:])
        origins, viewdirs = self._rays(arrays, image_id, x, y)
        return {
            "rgb": rgb,
            "rays_o": origins,
            "rays_d": viewdirs,
            "color_bkgd": color_bkgd,
        }

    def _rays(
        self, arrays: Dict, image_id: jnp.ndarray, x, y
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pinhole rays — same math as the host loaders
        (procedural.py:_rays_for_pixels, nerf_synthetic.py:126-146)."""
        K = arrays["K"]
        sign = -1.0 if self.opengl_camera else 1.0
        xf = x.astype(jnp.float32)
        yf = y.astype(jnp.float32)
        camera_dirs = jnp.stack(
            [
                (xf + 0.5 - K[0, 2]) / K[0, 0],
                (yf + 0.5 - K[1, 2]) / K[1, 1] * sign,
                jnp.full_like(xf, sign),
            ],
            axis=-1,
        )  # (n_rays, 3)
        c2w = jnp.take(arrays["c2w"], image_id, axis=0)  # (n_rays, 3, 4)
        directions = jnp.einsum("nij,nj->ni", c2w[:, :, :3], camera_dirs)
        origins = c2w[:, :, 3]
        viewdirs = directions / jnp.linalg.norm(
            directions, axis=-1, keepdims=True
        )
        return origins, viewdirs
