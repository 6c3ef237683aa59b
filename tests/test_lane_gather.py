"""Per-lane VMEM gather primitive (ops/lane_gather.py), interpret mode.

On-TPU timing lives in scripts/pallas_gather_probe2.py; here we pin the
semantics (out[i, l] = src[idx[i, l], l]) and the shape contract.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu.ops.lane_gather import lane_gather


def test_lane_gather_semantics_interpret():
    T, N = 64, 256
    src = jax.random.normal(jax.random.PRNGKey(0), (T, 128))
    idx = jax.random.randint(jax.random.PRNGKey(1), (N, 128), 0, T, jnp.int32)
    out = lane_gather(src, idx, interpret=True)
    want = np.asarray(src)[np.asarray(idx), np.arange(128)[None, :]]
    assert np.array_equal(np.asarray(out), want)


def test_lane_gather_shape_contract():
    src = jnp.zeros((64, 128))
    with pytest.raises(ValueError, match="multiple of T"):
        lane_gather(src, jnp.zeros((96, 128), jnp.int32), interpret=True)
    with pytest.raises(ValueError, match="128 lanes"):
        lane_gather(
            jnp.zeros((64, 64)), jnp.zeros((64, 64), jnp.int32),
            interpret=True,
        )
