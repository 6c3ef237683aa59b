"""Fused CP-level Pallas kernel vs the XLA reference path (fwd + grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu.ops.cp_level import cp_level_encode


def _xla_ref(u, lines):
    """The CPGridEncoder XLA path for one level (cp_field.py)."""
    _, R, rank = lines.shape
    pos = u.T * (R - 1)  # (3, N)
    grid = jnp.arange(R, dtype=u.dtype)
    w = jnp.maximum(
        0.0, 1.0 - jnp.abs(pos[:, :, None] - grid[None, None, :])
    ).astype(jnp.bfloat16)
    a = jax.lax.dot_general(
        w,
        lines.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return a[0] * a[1] * a[2]


@pytest.mark.parametrize("R,rank,n", [(16, 8, 37), (64, 16, 128)])
def test_cp_level_matches_xla(R, rank, n):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n, 3))
    lines = 1.0 + 0.1 * jax.random.normal(k2, (3, R, rank))

    out = cp_level_encode(u, lines, True)
    ref = _xla_ref(u, lines)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_cp_level_line_grads_match_xla():
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    n, R, rank = 50, 32, 8
    u = jax.random.uniform(k1, (n, 3))
    lines = 1.0 + 0.1 * jax.random.normal(k2, (3, R, rank))
    cot = jax.random.normal(k3, (n, rank))

    def loss_k(lines):
        return jnp.sum(cp_level_encode(u, lines, True) * cot)

    def loss_r(lines):
        return jnp.sum(_xla_ref(u, lines) * cot)

    gk = jax.grad(loss_k)(lines)
    gr = jax.grad(loss_r)(lines)
    # The kernel's backward rounds the product cotangent to bf16 before the
    # MXU transpose-dot (XLA's autodiff keeps it f32): elementwise agreement
    # is bf16-level, structural agreement should be tight.
    np.testing.assert_allclose(gk, gr, atol=5e-2)
    rel_fro = jnp.linalg.norm(gk - gr) / jnp.linalg.norm(gr)
    assert rel_fro < 5e-3, rel_fro


def test_cp_level_padding_and_edges():
    """Non-multiple-of-BLK N and boundary coordinates (u = 0, 1)."""
    R, rank = 16, 8
    lines = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (3, R, rank))
    u = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.25, 0.75]])
    out = cp_level_encode(u, lines, True)
    ref = _xla_ref(u, lines)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
    # u=0 picks row 0 exactly; u=1 picks row R-1 exactly
    exp0 = lines[0, 0] * lines[1, 0] * lines[2, 0]
    np.testing.assert_allclose(out[0], exp0, atol=2e-2, rtol=2e-2)
