"""Tests for the scatter-free sorted-segment ops (ops/sorted_segments.py).

These are the training-path fast ops: forward AND backward must match the
generic implementations (associative-scan exclusive_sum, segment_sum scatter)
on sorted ids, including empty leading/interior rays and compacted-buffer
fill slots (ids == n_rays).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu.ops.sorted_segments import (
    exclusive_sum_sorted,
    segment_sum_sorted,
)
from nerfacc_tpu.scan import exclusive_sum


def _make_sorted_ids(rng, n, n_rays, empty_rays=()):
    w = rng.random(n_rays)
    for r in empty_rays:
        w[r] = 0.0
    counts = rng.multinomial(n, w / w.sum())
    for r in empty_rays:
        assert counts[r] == 0
    return np.repeat(np.arange(n_rays, dtype=np.int32), counts)


@pytest.mark.parametrize("empty_rays", [(), (0,), (0, 3, 7)])
def test_exclusive_sum_sorted_matches_reference(empty_rays):
    rng = np.random.default_rng(0)
    n, n_rays = 512, 16
    ids = jnp.asarray(_make_sorted_ids(rng, n, n_rays, empty_rays))
    vals = jnp.asarray(rng.random(n, dtype=np.float32))

    out = exclusive_sum_sorted(vals, ids, n_rays)
    ref = exclusive_sum(vals, indices=ids)
    # the global-prefix formulation carries O(sum over ALL segments) f32
    # rounding instead of per-segment rounding: tolerate a few ulp of the
    # global total (same tolerance class as the reference's own CUB-vs-torch
    # exclusive_sum test, reference tests/test_scan.py:82-88)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_exclusive_sum_sorted_grad_matches():
    rng = np.random.default_rng(1)
    n, n_rays = 512, 16
    ids = jnp.asarray(_make_sorted_ids(rng, n, n_rays, (2,)))
    vals = jnp.asarray(rng.random(n, dtype=np.float32))
    cot = jnp.asarray(rng.random(n, dtype=np.float32))

    g_fast = jax.grad(lambda v: jnp.sum(exclusive_sum_sorted(v, ids, n_rays) * cot))(vals)
    g_ref = jax.grad(lambda v: jnp.sum(exclusive_sum(v, indices=ids) * cot))(vals)
    np.testing.assert_allclose(g_fast, g_ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("channels", [None, 5])
@pytest.mark.parametrize("empty_rays", [(), (0,), (0, 15)])
def test_segment_sum_sorted_matches_scatter(channels, empty_rays):
    rng = np.random.default_rng(2)
    n, n_rays = 512, 16
    ids = jnp.asarray(_make_sorted_ids(rng, n, n_rays, empty_rays))
    shape = (n,) if channels is None else (n, channels)
    src = jnp.asarray(rng.random(shape, dtype=np.float32))

    out = segment_sum_sorted(src, ids, n_rays)
    ref = jax.ops.segment_sum(src, ids, num_segments=n_rays)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_segment_sum_sorted_grad_matches():
    rng = np.random.default_rng(3)
    n, n_rays = 512, 16
    ids = jnp.asarray(_make_sorted_ids(rng, n, n_rays))
    src = jnp.asarray(rng.random((n, 3), dtype=np.float32))
    cot = jnp.asarray(rng.random((n_rays, 3), dtype=np.float32))

    g_fast = jax.grad(
        lambda s: jnp.sum(segment_sum_sorted(s, ids, n_rays) * cot)
    )(src)
    g_ref = jax.grad(
        lambda s: jnp.sum(jax.ops.segment_sum(s, ids, num_segments=n_rays) * cot)
    )(src)
    np.testing.assert_allclose(g_fast, g_ref, atol=1e-5, rtol=1e-5)


def test_fill_slots_excluded():
    """Compacted buffers pad trailing slots with ids == n_rays: they must not
    contribute to any segment, and grads through real slots must be exact."""
    n_rays = 4
    ids = jnp.asarray([0, 0, 1, 3, 4, 4], jnp.int32)  # 2 fill slots
    src = jnp.asarray([1.0, 2.0, 3.0, 4.0, 99.0, 99.0])

    out = segment_sum_sorted(src[:, None], ids, n_rays)
    np.testing.assert_allclose(out[:, 0], [3.0, 3.0, 0.0, 4.0])

    excl = exclusive_sum_sorted(src, ids, n_rays)
    np.testing.assert_allclose(excl[:4], [0.0, 1.0, 0.0, 0.0])

    # grad: only real slots receive correct cotangents; fill-slot grads are
    # unspecified but must be finite (callers mask them)
    def loss(v):
        mask = ids < n_rays
        masked = jnp.where(mask, v, 0.0)
        e = exclusive_sum_sorted(masked, ids, n_rays)
        e = jnp.where(mask, e, 0.0)
        return jnp.sum(e * jnp.arange(6.0))

    g = jax.grad(loss)(src)
    # analytic: d/dv[j] sum_i cot[i] * excl[i]; cot = [0,1,2,3,4,5]
    # ray 0: excl = [0, v0] -> dv0 = 1; ray 1 single sample -> 0; ray 3 -> 0
    np.testing.assert_allclose(g[:4], [1.0, 0.0, 0.0, 0.0], atol=1e-6)
    assert np.all(np.isfinite(np.asarray(g)))


def test_render_weight_sorted_path_matches_generic():
    """render_weight_from_density(indices_sorted=True) == generic path, fwd
    and grad, on a partially-filled compacted buffer."""
    from nerfacc_tpu.volrend import render_weight_from_density

    rng = np.random.default_rng(4)
    n, n_rays = 256, 8
    ids_real = _make_sorted_ids(rng, n - 32, n_rays)
    ids = jnp.asarray(np.concatenate([ids_real, np.full(32, n_rays, np.int32)]))
    masks = ids < n_rays
    t0 = jnp.asarray(np.sort(rng.random(n, dtype=np.float32)))
    t1 = t0 + 0.01
    sig = jnp.asarray(rng.random(n, dtype=np.float32) * 10)

    def run(sorted_flag):
        def loss(s):
            w, tr, al = render_weight_from_density(
                t0, t1, s, ray_indices=ids, n_rays=n_rays, masks=masks,
                indices_sorted=sorted_flag)
            return jnp.sum(w**2), (w, tr, al)

        (l, (w, tr, al)), g = jax.value_and_grad(loss, has_aux=True)(sig)
        return w, tr, al, g

    w1, tr1, al1, g1 = run(True)
    w2, tr2, al2, g2 = run(False)
    np.testing.assert_allclose(w1, w2, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.where(masks, tr1, 1.0), np.where(masks, tr2, 1.0),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(g1, g2, atol=1e-5, rtol=1e-5)
