"""Pallas kernel tests (interpreter mode — runs on the CPU suite)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.ops.coarse_occ import coarse_occ_lookup
from nerfacc_tpu.ops.hat_matmul import hat_interp_matmul


def test_hat_interp_matmul_fwd():
    key = jax.random.PRNGKey(0)
    N, R, rank = 700, 64, 8  # non-multiple of BLK exercises padding
    x = jax.random.uniform(key, (N,))
    line = jax.random.normal(jax.random.PRNGKey(1), (R, rank))

    out = hat_interp_matmul(x, line, interpret=True)
    pos = np.asarray(x)[:, None] * (R - 1)
    w = np.maximum(0.0, 1.0 - np.abs(pos - np.arange(R)[None, :]))
    ref = w.astype(np.float32) @ np.asarray(line)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)  # bf16 matmul


def test_hat_interp_matmul_grads():
    key = jax.random.PRNGKey(2)
    N, R, rank = 256, 32, 4
    x = jax.random.uniform(key, (N,), minval=0.05, maxval=0.95)
    line = jax.random.normal(jax.random.PRNGKey(3), (R, rank))

    def pl_loss(x, l):
        return jnp.sum(jnp.sin(hat_interp_matmul(x, l, interpret=True)))

    def ref_loss(x, l):
        w = jnp.maximum(
            0.0,
            1.0
            - jnp.abs(
                x[:, None] * (R - 1)
                - jnp.arange(R, dtype=jnp.float32)[None, :]
            ),
        )
        return jnp.sum(jnp.sin(w @ l))

    gx, gl = jax.grad(pl_loss, argnums=(0, 1))(x, line)
    rx, rl = jax.grad(ref_loss, argnums=(0, 1))(x, line)
    np.testing.assert_allclose(gx, rx, atol=0.5, rtol=5e-2)
    np.testing.assert_allclose(gl, rl, atol=5e-2, rtol=5e-2)


def test_coarse_occ_lookup():
    key = jax.random.PRNGKey(0)
    rows, lanes = 64, 256
    S = (jax.random.uniform(key, (rows, lanes)) > 0.8).astype(jnp.float32)
    N = 1000
    row = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, rows)
    lane = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, lanes)
    out = coarse_occ_lookup(row, lane, S, interpret=True)
    ref = np.asarray(S)[np.asarray(row), np.asarray(lane)]
    np.testing.assert_array_equal(np.asarray(out), ref)
