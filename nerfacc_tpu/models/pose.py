"""Camera-pose optimization utilities (BARF-style pose refinement).

The reference benchmarks nerfacc with BARF — bundle-adjusting NeRF that
jointly optimizes the radiance field and per-camera SE(3) corrections with a
coarse-to-fine positional-encoding schedule (reference:
docs/source/examples/camera/barf.rst:10-40; the benchmark submodule itself is
external).  This module provides the TPU-native building blocks:

- :func:`se3_exp`: exponential map from a 6-vector twist to a (3, 4) pose,
  with Taylor-stable small-angle branches (pure ``jnp``, batched, exactly
  differentiable — pose gradients flow through ray generation).
- :func:`compose_pose`: left-apply a refinement to camera-to-world poses.
- :func:`umeyama_alignment` / :func:`pose_registration_errors`: the BARF
  evaluation protocol — similarity(Sim3)-align the estimated camera centers
  to ground truth, then report rotation (degrees) and translation errors.
- :func:`coarse_to_fine_alpha`: the annealing schedule driving the
  frequency window of :class:`~nerfacc_tpu.models.encoders.SinusoidalEncoder`.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix of ``w (..., 3)`` -> (..., 3, 3)."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3).

    Args:
        xi: (..., 6) twists ``[omega (rotation, axis-angle), rho
            (translation generator)]``.

    Returns:
        (..., 3, 4) rigid transforms ``[R | t]`` with ``R = exp([omega]x)``
        and ``t = V(omega) @ rho`` (the standard SE(3) V-matrix).  The
        trigonometric coefficients switch to their Taylor expansions below
        ``theta < 1e-4`` so gradients stay finite at the identity — the
        starting point of every pose refinement.
    """
    omega = xi[..., :3]
    rho = xi[..., 3:]
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 < 1e-8
    # Safe denominators: the UNSELECTED branch of a `where` still gets
    # differentiated, and 0/0 there poisons the gradient with NaNs — so the
    # exact branch divides by 1 whenever the Taylor branch is selected.
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)

    # sin(t)/t, (1-cos(t))/t^2, (t-sin(t))/t^3 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe
    )
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2_safe * theta),
    )

    W = _hat(omega)
    # precision="highest": TPU matmuls default to single-pass bf16 — an
    # ~0.4% relative error that, through W@W and the downstream compose,
    # quantizes rotations at the ~0.2-1 DEGREE level.  Measured: Sim3
    # registration of poses perturbed by 0.01 deg of noise reads ~1.2 deg
    # on the TPU backend with default precision and 0.010 deg with
    # "highest" — the entire round-4 "BARF rotation floor" was this.
    # The matrices are (n, 3, 3); full f32 costs nothing measurable.
    W2 = jnp.einsum("...ij,...jk->...ik", W, W, precision="highest")
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho, precision="highest")
    return jnp.concatenate([R, t[..., None]], axis=-1)


def compose_pose(delta: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Left-compose a refinement with camera-to-world poses.

    ``result = delta @ pose`` in homogeneous coordinates:
    ``R' = Rd @ Rp``, ``t' = Rd @ tp + td``.  Both inputs (..., 3, 4).
    """
    Rd, td = delta[..., :3], delta[..., 3]
    Rp, tp = pose[..., :3], pose[..., 3]
    # "highest": see se3_exp — bf16-default 3x3 products put a ~0.2-1 deg
    # noise floor under every pose this touches.
    R = jnp.einsum("...ij,...jk->...ik", Rd, Rp, precision="highest")
    t = jnp.einsum("...ij,...j->...i", Rd, tp, precision="highest") + td
    return jnp.concatenate([R, t[..., None]], axis=-1)


def perturb_poses(
    key: jax.Array,
    camtoworlds: jnp.ndarray,
    rot_std: float = 0.05,
    trans_std: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply random SE(3) noise to poses (the BARF experimental setup:
    synthetic scenes with known poses perturbed by gaussian twists).

    Returns:
        (noisy (..., 3, 4) poses, the (..., 6) ground-truth twists applied).
    """
    n = camtoworlds.shape[0]
    k1, k2 = jax.random.split(key)
    omega = rot_std * jax.random.normal(k1, (n, 3), camtoworlds.dtype)
    rho = trans_std * jax.random.normal(k2, (n, 3), camtoworlds.dtype)
    xi = jnp.concatenate([omega, rho], axis=-1)
    return compose_pose(se3_exp(xi), camtoworlds[..., :3, :4]), xi


def umeyama_alignment(
    src: np.ndarray, dst: np.ndarray
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Similarity transform (s, R, t) minimizing ``||dst - (s R src + t)||``.

    Standard Umeyama closed form via SVD of the cross-covariance (used by
    the BARF evaluation to remove the gauge freedom of joint pose+scene
    optimization before measuring pose error).  NumPy (evaluation-time only).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_s = (xs**2).sum() / src.shape[0]
    s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    t = mu_d - s * R @ mu_s
    return s, R, t


def pose_registration_errors(
    c2w_est: np.ndarray, c2w_gt: np.ndarray
) -> Dict[str, float]:
    """BARF-style pose error after Sim3 alignment.

    Aligns the estimated camera centers to ground truth with
    :func:`umeyama_alignment`, then reports the mean geodesic rotation error
    (degrees) and the mean translation error (in aligned ground-truth units)
    — the two numbers barf.rst reports (R 0.070 deg / T 0.0035 on
    nerf-synthetic).
    """
    c2w_est = np.asarray(c2w_est, np.float64)
    c2w_gt = np.asarray(c2w_gt, np.float64)
    s, R, t = umeyama_alignment(c2w_est[:, :3, 3], c2w_gt[:, :3, 3])
    centers = (s * (R @ c2w_est[:, :3, 3].T)).T + t
    trans_err = np.linalg.norm(centers - c2w_gt[:, :3, 3], axis=-1)
    R_est = R[None] @ c2w_est[:, :3, :3]
    rel = np.einsum("nij,nkj->nik", R_est, c2w_gt[:, :3, :3])  # R_est R_gt^T
    cos = np.clip((np.trace(rel, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    rot_err_deg = np.degrees(np.arccos(cos))
    return {
        "rot_deg": float(rot_err_deg.mean()),
        "trans": float(trans_err.mean()),
    }


def coarse_to_fine_alpha(
    step: jnp.ndarray,
    max_steps: int,
    max_deg: int,
    start_frac: float = 0.1,
    end_frac: float = 0.5,
) -> jnp.ndarray:
    """BARF coarse-to-fine annealing: the PE frequency window ``alpha``
    ramps linearly from 0 to ``max_deg`` over
    ``[start_frac, end_frac] * max_steps`` (BARF anneals over 20k-100k of
    200k steps; the fractions are knobs).  Feed the result to
    ``SinusoidalEncoder(..., alpha=...)``.
    """
    s0 = start_frac * max_steps
    s1 = end_frac * max_steps
    frac = jnp.clip((step - s0) / jnp.maximum(s1 - s0, 1.0), 0.0, 1.0)
    return frac * max_deg
