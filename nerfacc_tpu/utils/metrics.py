"""Image quality metrics for eval loops: PSNR and SSIM.

The reference's example eval reports PSNR and LPIPS
(reference: examples/train_ngp_nerf_occ.py:246-272).  LPIPS requires
pretrained VGG/AlexNet weights, which cannot be fetched in this
zero-egress environment — SSIM (Wang et al. 2004) fills the
second-metric role with no external weights.  Pure numpy on the host:
eval images are small (a few hundred k pixels) and the separable 11x11
Gaussian filter is a handful of milliseconds, so there is no reason to
burn a device dispatch on it.
"""
from __future__ import annotations

import numpy as np

__all__ = ["psnr", "ssim"]


def psnr(img: np.ndarray, ref: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio between two images in [0, data_range]."""
    img = np.asarray(img, np.float64)
    ref = np.asarray(ref, np.float64)
    mse = float(np.mean((img - ref) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-10) / (data_range**2)))


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _filter2d_sep(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid'-mode Gaussian filter over the two leading (H, W)
    axes of an (H, W, C) array, one channel at a time."""
    n = k.size

    def conv1d(a, axis):
        # sliding windows along `axis`, contracted against the kernel
        a = np.moveaxis(a, axis, -1)
        shape = a.shape[:-1] + (a.shape[-1] - n + 1, n)
        strides = a.strides + (a.strides[-1],)
        win = np.lib.stride_tricks.as_strided(a, shape=shape, strides=strides)
        out = win @ k
        return np.moveaxis(out, -1, axis)

    return conv1d(conv1d(img, 0), 1)


def ssim(
    img: np.ndarray,
    ref: np.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Mean structural similarity (Wang et al. 2004), matching the standard
    torchmetrics/skimage configuration: 11x11 Gaussian window, sigma 1.5,
    per-channel then averaged, 'valid' padding."""
    img = np.asarray(img, np.float64)
    ref = np.asarray(ref, np.float64)
    if img.ndim == 2:
        img = img[..., None]
        ref = ref[..., None]
    if img.shape != ref.shape:
        raise ValueError(f"shape mismatch: {img.shape} vs {ref.shape}")
    if min(img.shape[0], img.shape[1]) < kernel_size:
        raise ValueError("image smaller than the SSIM window")

    k = _gaussian_kernel(kernel_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter2d_sep(img, k)
    mu_y = _filter2d_sep(ref, k)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sig_xx = _filter2d_sep(img * img, k) - mu_xx
    sig_yy = _filter2d_sep(ref * ref, k) - mu_yy
    sig_xy = _filter2d_sep(img * ref, k) - mu_xy

    num = (2.0 * mu_xy + c1) * (2.0 * sig_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sig_xx + sig_yy + c2)
    return float(np.mean(num / den))
