"""Camera lens undistortion via fixed-iteration Newton solves.

TPU-native analog of the reference's CUDA Newton kernels
(reference: nerfacc/cameras.py, cuda/csrc/camera.cu,
cuda/csrc/include/utils_camera.cuh).  A fixed-trip-count Newton iteration is
pure ``lax.fori_loop`` — no kernel needed.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _compute_residual_and_jacobian(
    x: jnp.ndarray,
    y: jnp.ndarray,
    xd: jnp.ndarray,
    yd: jnp.ndarray,
    params: jnp.ndarray,
) -> Tuple[jnp.ndarray, ...]:
    """Residual and Jacobian of the 8-parameter OpenCV distortion model.

    (reference: nerfacc/cameras.py:124-171, utils_camera.cuh:13-66)
    """
    k1, k2, p1, p2, k3, k4, k5, k6 = jnp.moveaxis(params, -1, 0)

    r = x * x + y * y
    alpha = 1.0 + r * (k1 + r * (k2 + r * k3))
    beta = 1.0 + r * (k4 + r * (k5 + r * k6))
    d = alpha / beta

    fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
    fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd

    alpha_r = k1 + r * (2.0 * k2 + r * (3.0 * k3))
    beta_r = k4 + r * (2.0 * k5 + r * (3.0 * k6))

    d_r = (alpha_r * beta - alpha * beta_r) / (beta * beta)
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r

    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y

    return fx, fy, fx_x, fx_y, fy_x, fy_y


def opencv_lens_undistortion(
    uv: jnp.ndarray, params: jnp.ndarray, eps: float = 1e-6, iters: int = 10
) -> jnp.ndarray:
    """Undistort OpenCV lens distortion by Newton iteration.

    (reference: nerfacc/cameras.py:13-46, 174-211).  Not differentiable by
    contract (wrapped in ``stop_gradient``).

    Args:
        uv: (..., 2) distorted coordinates.
        params: (..., N) with N in {0, 1, 2, 4, 8}: subsets of
            {k1, k2, p1, p2, k3, k4, k5, k6}, zero-padded to 8.
        eps: Newton denominator guard.
        iters: fixed Newton iteration count.

    Returns:
        (..., 2) undistorted coordinates.
    """
    assert uv.shape[-1] == 2
    n = params.shape[-1]
    assert n in (0, 1, 2, 4, 8)
    if n == 0:
        return uv
    if n < 8:
        pad = [(0, 0)] * (params.ndim - 1) + [(0, 8 - n)]
        params = jnp.pad(params, pad)
    params = jnp.broadcast_to(params, uv.shape[:-1] + (8,))

    x0 = uv[..., 0]
    y0 = uv[..., 1]

    def body(_, xy):
        x, y = xy
        fx, fy, fx_x, fx_y, fy_x, fy_y = _compute_residual_and_jacobian(
            x, y, x0, y0, params
        )
        denom = fy_x * fx_y - fx_x * fy_y
        mask = jnp.abs(denom) > eps
        step_x = jnp.where(mask, (fx * fy_y - fy * fx_y) / denom, 0.0)
        step_y = jnp.where(mask, (fy * fx_x - fx * fy_x) / denom, 0.0)
        return (x + step_x, y + step_y)

    x, y = jax.lax.fori_loop(0, iters, body, (x0, y0))
    return jax.lax.stop_gradient(jnp.stack([x, y], axis=-1))


def opencv_lens_undistortion_fisheye(
    uv: jnp.ndarray, params: jnp.ndarray, eps: float = 1e-6, iters: int = 10
) -> jnp.ndarray:
    """Undistort the OpenCV fisheye model {k1, k2, k3, k4} by Newton on theta.

    (reference: nerfacc/cameras.py:49-71, utils_camera.cuh:140-196)
    """
    assert uv.shape[-1] == 2
    assert params.shape[-1] == 4
    params = jnp.broadcast_to(params, uv.shape[:-1] + (4,))
    k1, k2, k3, k4 = jnp.moveaxis(params, -1, 0)

    u, v = uv[..., 0], uv[..., 1]
    theta_d = jnp.sqrt(u * u + v * v)
    theta_d_clipped = jnp.clip(theta_d, -jnp.pi / 2, jnp.pi / 2)

    def body(_, theta):
        t2 = theta * theta
        t4 = t2 * t2
        t6 = t4 * t2
        t8 = t4 * t4
        k1t2, k2t4, k3t6, k4t8 = k1 * t2, k2 * t4, k3 * t6, k4 * t8
        f = theta * (1 + k1t2 + k2t4 + k3t6 + k4t8) - theta_d_clipped
        fp = 1 + 3 * k1t2 + 5 * k2t4 + 7 * k3t6 + 9 * k4t8
        step = jnp.where(jnp.abs(fp) > eps, f / fp, 0.0)
        return theta - step

    theta = jax.lax.fori_loop(0, iters, body, theta_d_clipped)
    scale = jnp.where(
        theta_d > eps, jnp.tan(theta) / jnp.clip(theta_d, min=eps), 1.0
    )
    return jax.lax.stop_gradient(uv * scale[..., None])


def _opencv_lens_distortion(uv: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Forward OpenCV distortion model (reference: nerfacc/cameras.py:74-90)."""
    k1, k2, p1, p2, k3, k4, k5, k6 = jnp.moveaxis(params, -1, 0)
    u, v = uv[..., 0], uv[..., 1]
    r2 = u * u + v * v
    r4 = r2**2
    r6 = r4 * r2
    ratial = (1 + k1 * r2 + k2 * r4 + k3 * r6) / (1 + k4 * r2 + k5 * r4 + k6 * r6)
    fx = 2 * p1 * u * v + p2 * (r2 + 2 * u * u)
    fy = 2 * p2 * u * v + p1 * (r2 + 2 * v * v)
    return jnp.stack([u * ratial + fx, v * ratial + fy], axis=-1)


def _opencv_lens_distortion_fisheye(
    uv: jnp.ndarray, params: jnp.ndarray, eps: float = 1e-10
) -> jnp.ndarray:
    """Forward OpenCV fisheye distortion (reference: nerfacc/cameras.py:93-120)."""
    assert params.shape[-1] == 4
    k1, k2, k3, k4 = jnp.moveaxis(params, -1, 0)
    u, v = uv[..., 0], uv[..., 1]
    r = jnp.sqrt(u * u + v * v)
    theta = jnp.arctan(r)
    theta_d = theta * (
        1 + k1 * theta**2 + k2 * theta**4 + k3 * theta**6 + k4 * theta**8
    )
    scale = theta_d / jnp.clip(r, min=eps)
    return uv * scale[..., None]


def _opencv_lens_distortion_12(
    uv: jnp.ndarray, params: jnp.ndarray
) -> jnp.ndarray:
    """Forward 12-parameter OpenCV model (k1..k6, p1, p2, s1..s4) — rational
    radial + tangential + thin-prism terms (reference layout:
    cuda/csrc/include/utils_camera.cuh:112-135)."""
    assert params.shape[-1] == 12
    k1, k2, k3, k4, k5, k6, p1, p2, s1, s2, s3, s4 = jnp.moveaxis(
        params, -1, 0
    )
    x, y = uv[..., 0], uv[..., 1]
    r2 = x * x + y * y
    cdist = (1 + ((k3 * r2 + k2) * r2 + k1) * r2) / (
        1 + ((k6 * r2 + k5) * r2 + k4) * r2
    )
    dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x) + s1 * r2 + s2 * r2 * r2
    dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y + s3 * r2 + s4 * r2 * r2
    return jnp.stack([x * cdist + dx, y * cdist + dy], axis=-1)


def opencv_lens_undistortion_12(
    uv: jnp.ndarray, params: jnp.ndarray, iters: int = 20
) -> jnp.ndarray:
    """Undistort the 12-parameter OpenCV model by OpenCV's fixed-point
    iteration (reference: utils_camera.cuh:112-135, dispatched from
    camera.cu:49-105 — a path the reference's own Python wrapper asserts
    away; exposed here for completeness).

    Args:
        uv: (..., 2) distorted normalized coordinates.
        params: (..., 12) = {k1..k6, p1, p2, s1..s4}.
    """
    assert uv.shape[-1] == 2
    assert params.shape[-1] == 12
    params = jnp.broadcast_to(params, uv.shape[:-1] + (12,))
    k1, k2, k3, k4, k5, k6, p1, p2, s1, s2, s3, s4 = jnp.moveaxis(
        params, -1, 0
    )
    u, v = uv[..., 0], uv[..., 1]

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        icdist = (1 + ((k6 * r2 + k5) * r2 + k4) * r2) / (
            1 + ((k3 * r2 + k2) * r2 + k1) * r2
        )
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x) + s1 * r2 + s2 * r2 * r2
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y + s3 * r2 + s4 * r2 * r2
        return ((u - dx) * icdist, (v - dy) * icdist)

    x, y = jax.lax.fori_loop(0, iters, body, (u, v))
    return jax.lax.stop_gradient(jnp.stack([x, y], axis=-1))
