"""Scan tests (ported from reference tests/test_scan.py): three-way layout
equivalence (batched vs packed_info vs indices) for forward and gradients,
plus the exact docstring goldens from reference nerfacc/scan.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu import (
    exclusive_prod,
    exclusive_sum,
    inclusive_prod,
    inclusive_sum,
    pack_info,
)

OPS = {
    "inclusive_sum": inclusive_sum,
    "exclusive_sum": exclusive_sum,
    "inclusive_prod": inclusive_prod,
    "exclusive_prod": exclusive_prod,
}

GOLDEN_INPUT = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0])
GOLDEN_PACKED = jnp.array([[0, 2], [2, 3], [5, 4]])
GOLDENS = {
    "inclusive_sum": [1.0, 3.0, 3.0, 7.0, 12.0, 6.0, 13.0, 21.0, 30.0],
    "exclusive_sum": [0.0, 1.0, 0.0, 3.0, 7.0, 0.0, 6.0, 13.0, 21.0],
    "inclusive_prod": [1.0, 2.0, 3.0, 12.0, 60.0, 6.0, 42.0, 336.0, 3024.0],
    "exclusive_prod": [1.0, 1.0, 1.0, 3.0, 12.0, 1.0, 6.0, 42.0, 336.0],
}


@pytest.mark.parametrize("name", list(OPS))
def test_docstring_goldens(name):
    out = OPS[name](GOLDEN_INPUT, GOLDEN_PACKED)
    np.testing.assert_allclose(out, GOLDENS[name], rtol=1e-6)


def _make_batch(key, n_rays=32, n_samples=17):
    k1, k2 = jax.random.split(key)
    data = jax.random.uniform(k1, (n_rays, n_samples)) + 0.1
    # uneven chunk sizes including empty ones
    cnts = jax.random.randint(k2, (n_rays,), 0, n_samples + 1)
    return data, cnts


@pytest.mark.parametrize("name", list(OPS))
def test_three_way_equivalence(name):
    """Batched vs packed_info vs indices must agree forward and backward
    (reference tests/test_scan.py:8-172)."""
    fn = OPS[name]
    data, cnts = _make_batch(jax.random.PRNGKey(3))
    n_rays, n_samples = data.shape

    # build flattened layout
    mask = np.arange(n_samples)[None, :] < np.asarray(cnts)[:, None]
    flat = jnp.asarray(np.asarray(data)[mask])
    ray_ids = jnp.asarray(np.repeat(np.arange(n_rays), np.asarray(cnts)))
    packed = pack_info(ray_ids, n_rays)

    out_packed = fn(flat, packed_info=packed)
    out_indices = fn(flat, indices=ray_ids)
    np.testing.assert_allclose(out_packed, out_indices, rtol=1e-5)

    # batched equivalence per ray
    out_batched = np.asarray(fn(data))
    np.testing.assert_allclose(
        np.asarray(out_packed), out_batched[mask], rtol=2e-5, atol=3e-4
    )

    # gradients
    g_packed = jax.grad(lambda x: jnp.sum(fn(x, packed_info=packed) ** 2))(flat)
    g_indices = jax.grad(lambda x: jnp.sum(fn(x, indices=ray_ids) ** 2))(flat)
    np.testing.assert_allclose(g_packed, g_indices, rtol=1e-4, atol=3e-4)

    g_batched = np.asarray(
        jax.grad(
            lambda x: jnp.sum(
                jnp.where(jnp.asarray(mask), fn(x), 0.0) ** 2
            )
        )(data)
    )
    np.testing.assert_allclose(
        np.asarray(g_packed), g_batched[mask], rtol=1e-4, atol=3e-4
    )


def test_exclusive_prod_grad_at_zero():
    """The reference documents its exclusive_prod gradient as wrong when an
    input is exactly 0 (cuda/csrc/scan.cu:209-210); ours must be exact."""
    x = jnp.array([0.5, 0.0, 2.0, 3.0])
    packed = jnp.array([[0, 4]])
    g = jax.grad(lambda v: jnp.sum(exclusive_prod(v, packed)))(x)
    # out = [1, .5, 0, 0]; d/dx0 = 1 + x1 + x1x2 = 1; wait manually:
    # out = [1, x0, x0x1, x0x1x2] -> d/dx0 = 1 + x1 + x1*x2 = 1 + 0 + 0 = 1
    # d/dx1 = x0 + x0*x2 = .5 + 1.0 = 1.5 ; d/dx2 = x0*x1 = 0 ; d/dx3 = 0
    np.testing.assert_allclose(g, [1.0, 1.5, 0.0, 0.0], rtol=1e-6)


def test_empty_and_single_chunks():
    flat = jnp.array([2.0, 3.0, 4.0])
    packed = jnp.array([[0, 1], [1, 0], [1, 2]])
    np.testing.assert_allclose(
        inclusive_sum(flat, packed), [2.0, 3.0, 7.0], rtol=1e-6
    )
    np.testing.assert_allclose(
        exclusive_prod(flat, packed), [1.0, 1.0, 3.0], rtol=1e-6
    )


def test_normalize_option():
    """normalize=True divides by the segment total (reference kernel option
    utils_scan.cuh:101-110, unreachable from the reference's Python)."""
    import jax.numpy as jnp
    import numpy as np

    from nerfacc_tpu.scan import exclusive_sum, inclusive_sum

    inputs = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0])
    packed_info = jnp.array([[0, 2], [2, 3], [5, 4]])
    incl = inclusive_sum(inputs, packed_info, normalize=True)
    want = np.array([1 / 3, 1.0, 3 / 12, 7 / 12, 1.0, 6 / 30, 13 / 30,
                     21 / 30, 1.0])
    np.testing.assert_allclose(np.asarray(incl), want, atol=1e-6)

    ids = jnp.array([0, 0, 1, 1, 1, 2, 2, 2, 2])
    excl = exclusive_sum(inputs, indices=ids, normalize=True)
    want_e = np.array([0, 1 / 3, 0, 3 / 12, 7 / 12, 0, 6 / 30, 13 / 30,
                       21 / 30])
    np.testing.assert_allclose(np.asarray(excl), want_e, atol=1e-6)

    # batched layout
    b = inclusive_sum(inputs.reshape(3, 3), normalize=True)
    np.testing.assert_allclose(
        np.asarray(b)[:, -1], [1.0, 1.0, 1.0], atol=1e-6)
