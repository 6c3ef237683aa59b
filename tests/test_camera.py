"""Camera undistortion tests (ported from reference tests/test_camera.py):
distort-undistort round trips for the OpenCV and fisheye models."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import (
    opencv_lens_undistortion,
    opencv_lens_undistortion_fisheye,
)
from nerfacc_tpu.cameras import (
    _opencv_lens_distortion,
    _opencv_lens_distortion_fisheye,
)


def test_opencv_lens_undistortion_roundtrip():
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (3, 1000, 2), minval=-1.0, maxval=1.0)
    params = jax.random.uniform(k2, (8,), minval=-0.01, maxval=0.01)

    x_d = _opencv_lens_distortion(x, params)
    x_rec = opencv_lens_undistortion(x_d, params, 1e-10, 10)
    np.testing.assert_allclose(x_rec, x, atol=1e-5)


def test_opencv_lens_undistortion_padded_params():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (100, 2), minval=-1.0, maxval=1.0)
    p4 = jax.random.uniform(k2, (4,), minval=-0.01, maxval=0.01)
    p8 = jnp.pad(p4, (0, 4))
    np.testing.assert_allclose(
        opencv_lens_undistortion(x, p4),
        opencv_lens_undistortion(x, p8),
        atol=1e-7,
    )
    # N == 0 is the identity
    np.testing.assert_allclose(
        opencv_lens_undistortion(x, jnp.zeros((0,))), x
    )


def test_opencv_lens_undistortion_fisheye_roundtrip():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (1000, 2), minval=-0.5, maxval=0.5)
    params = jax.random.uniform(k2, (4,), minval=-0.01, maxval=0.01)

    x_d = _opencv_lens_distortion_fisheye(x, params)
    x_rec = opencv_lens_undistortion_fisheye(x_d, params, 1e-10, 20)
    np.testing.assert_allclose(x_rec, x, atol=1e-5)


def test_opencv_12param_round_trip():
    """12-parameter model: distort(undistort(x)) == x (reference path
    camera.cu:49-105, dead from the reference's Python — live here)."""
    import numpy as np
    import jax.numpy as jnp

    from nerfacc_tpu.cameras import (
        _opencv_lens_distortion_12,
        opencv_lens_undistortion_12,
    )

    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(-0.4, 0.4, (128, 2)).astype(np.float32))
    params = jnp.asarray(
        [1e-2, -2e-3, 1e-4, 5e-3, -1e-3, 1e-4, 1e-3, -5e-4,
         2e-4, -1e-4, 1e-4, 5e-5], jnp.float32)
    distorted = _opencv_lens_distortion_12(uv, params)
    restored = opencv_lens_undistortion_12(distorted, params)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(uv),
                               atol=1e-5)
