"""PSNR/SSIM eval metrics (utils/metrics.py) — the second-metric role of the
reference's PSNR+LPIPS eval (reference examples/train_ngp_nerf_occ.py:246-272;
LPIPS needs pretrained weights, SSIM does not)."""
import numpy as np
import pytest
from scipy import ndimage

from nerfacc_tpu.utils.metrics import _filter2d_sep, _gaussian_kernel, psnr, ssim


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20
    assert abs(psnr(a, b) - 20.0) < 1e-9


def test_gaussian_filter_matches_scipy():
    rng = np.random.default_rng(0)
    img = rng.random((24, 20, 3))
    k = _gaussian_kernel(11, 1.5)
    ours = _filter2d_sep(img, k)
    k2d = np.outer(k, k)
    ref = np.stack(
        [ndimage.convolve(img[..., c], k2d, mode="constant") for c in range(3)],
        axis=-1,
    )[5:-5, 5:-5]  # crop to 'valid'
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(1)
    img = rng.random((32, 32, 3))
    assert abs(ssim(img, img) - 1.0) < 1e-12


def test_ssim_flat_images_closed_form():
    # zero-variance images: SSIM = (2*mx*my + c1) / (mx^2 + my^2 + c1)
    mx, my = 0.3, 0.5
    a = np.full((16, 16), mx)
    b = np.full((16, 16), my)
    c1 = 0.01**2
    expect = (2 * mx * my + c1) / (mx**2 + my**2 + c1)
    assert abs(ssim(a, b) - expect) < 1e-12


def test_ssim_orders_degradations():
    rng = np.random.default_rng(2)
    img = np.clip(
        ndimage.gaussian_filter(rng.random((48, 48, 3)), (2, 2, 0)), 0, 1
    )
    small = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
    large = np.clip(img + rng.normal(0, 0.15, img.shape), 0, 1)
    s_small, s_large = ssim(small, img), ssim(large, img)
    assert 1.0 > s_small > s_large
    assert ssim(img, small) == pytest.approx(s_small)  # symmetric


def test_ssim_rejects_tiny_images():
    with pytest.raises(ValueError):
        ssim(np.zeros((8, 8)), np.zeros((8, 8)))
