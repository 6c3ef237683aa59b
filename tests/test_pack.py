"""pack_info golden test (ported from reference tests/test_pack.py)."""
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import pack_info


def test_pack_info():
    ray_indices = jnp.array([0, 0, 1, 1, 1, 2, 2, 2, 2], dtype=jnp.int32)
    packed = pack_info(ray_indices, n_rays=3)
    np.testing.assert_array_equal(packed, [[0, 2], [2, 3], [5, 4]])


def test_pack_info_with_empty_ray():
    ray_indices = jnp.array([0, 0, 2, 2, 2], dtype=jnp.int32)
    packed = pack_info(ray_indices, n_rays=3)
    np.testing.assert_array_equal(packed, [[0, 2], [2, 0], [2, 3]])
