"""PDF tests (ported from reference tests/test_pdf.py): searchsorted vs
jnp.searchsorted, importance_sampling vs the pure resampler, _pdf_loss vs the
reference loss, plus the exact docstring goldens."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import importance_sampling, searchsorted
from nerfacc_tpu.data_specs import RayIntervals
from nerfacc_tpu.estimators.prop_net import _lossfun_outer, _pdf_loss
from nerfacc_tpu.pdf import _sample_from_weighted


def _create_intervals(key, n_rays, n_samples):
    vals = jnp.sort(jax.random.uniform(key, (n_rays, n_samples + 1)), axis=-1)
    return RayIntervals(vals=vals)


def test_searchsorted_batched():
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    query = _create_intervals(k1, 10, 100)
    key = _create_intervals(k2, 10, 100)

    ids_left, ids_right = searchsorted(key, query)
    y = jnp.take_along_axis(key.vals, ids_right, axis=-1)

    _ids_right = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="right")
    )(key.vals, query.vals)
    _ids_right = jnp.clip(_ids_right, 0, key.vals.shape[-1] - 1)
    _y = jnp.take_along_axis(key.vals, _ids_right, axis=-1)

    np.testing.assert_array_equal(ids_right, _ids_right)
    np.testing.assert_allclose(y, _y)


def test_searchsorted_flattened_golden():
    """Docstring golden (reference nerfacc/pdf.py:39-56)."""
    key = RayIntervals(
        vals=jnp.array([0.0, 1.0, 0.0, 1.0, 2.0]),
        packed_info=jnp.array([[0, 2], [2, 3]]),
    )
    query = RayIntervals(
        vals=jnp.array([0.5, 1.5, 2.5]),
        packed_info=jnp.array([[0, 1], [1, 2]]),
    )
    ids_left, ids_right = searchsorted(key, query)
    np.testing.assert_array_equal(ids_left, [0, 3, 3])
    np.testing.assert_array_equal(ids_right, [1, 4, 4])
    np.testing.assert_allclose(jnp.take(key.vals, ids_left), [0.0, 1.0, 1.0])
    np.testing.assert_allclose(jnp.take(key.vals, ids_right), [1.0, 2.0, 2.0])


def test_importance_sampling_golden():
    """Docstring golden (reference nerfacc/pdf.py:104-121), batched layout."""
    intervals = RayIntervals(vals=jnp.array([[0.0, 1.0], [0.0, 2.0]]))
    cdfs = jnp.array([[0.0, 0.5], [0.0, 1.0]])
    iv, s = importance_sampling(intervals, cdfs, 2)
    np.testing.assert_allclose(
        iv.vals, [[0.0, 0.5, 1.0], [0.0, 1.0, 2.0]], atol=1e-6
    )
    np.testing.assert_allclose(
        s.vals, [[0.25, 0.75], [0.5, 1.5]], atol=1e-6
    )


def test_importance_sampling_vs_reference_resampler():
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    intervals = _create_intervals(k1, 5, 100)
    cdfs = jnp.sort(jax.random.uniform(k2, intervals.vals.shape), axis=-1)
    n = 100

    _intervals, _samples = importance_sampling(intervals, cdfs, n, False)

    for i in range(intervals.vals.shape[0]):
        vals, mids = _sample_from_weighted(
            intervals.vals[i : i + 1],
            cdfs[i : i + 1, 1:] - cdfs[i : i + 1, :-1],
            n,
            False,
            intervals.vals[i].min(),
            intervals.vals[i].max(),
        )
        np.testing.assert_allclose(
            _intervals.vals[i : i + 1], vals, atol=1e-4
        )
        np.testing.assert_allclose(_samples.vals[i : i + 1], mids, atol=1e-4)


def test_pdf_loss():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(42), 3)
    intervals = _create_intervals(k1, 5, 100)
    cdfs = jnp.sort(jax.random.uniform(k2, intervals.vals.shape), axis=-1)

    _intervals, _ = importance_sampling(intervals, cdfs, 10, False)
    _cdfs = jnp.sort(jax.random.uniform(k3, _intervals.vals.shape), axis=-1)

    loss = _pdf_loss(intervals, cdfs, _intervals, _cdfs)
    loss2 = _lossfun_outer(
        intervals.vals,
        cdfs[:, 1:] - cdfs[:, :-1],
        _intervals.vals,
        _cdfs[:, 1:] - _cdfs[:, :-1],
    )
    # fp tie-breaks where a query edge coincides exactly with a clamped key
    # edge can flip a searchsorted bin for isolated boundary elements (the
    # count of exact ties is backend-dependent); demand broad elementwise
    # agreement and close means overall.
    diff = np.abs(np.asarray(loss) - np.asarray(loss2))
    assert (diff < 1e-4).mean() > 0.95, (diff.max(), (diff >= 1e-4).sum())
    np.testing.assert_allclose(loss.mean(), loss2.mean(), atol=2e-4)


def test_importance_sampling_varying_counts():
    """Per-ray tensor counts (reference pdf.cu:294-355 overload): must match
    the batched mode where counts agree, and mask samples past each ray's
    count."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    intervals = _create_intervals(k1, 4, 32)
    cdfs = jnp.sort(jax.random.uniform(k2, intervals.vals.shape), axis=-1)

    # equal counts -> identical to the batched overload
    n = jnp.full((4,), 8, jnp.int32)
    iv_v, s_v = importance_sampling(intervals, cdfs, n, max_intervals_per_ray=8)
    iv_b, s_b = importance_sampling(intervals, cdfs, 8)
    np.testing.assert_allclose(s_v.vals, s_b.vals, atol=1e-5)
    np.testing.assert_allclose(iv_v.vals, iv_b.vals, atol=1e-5)
    assert np.asarray(s_v.is_valid).all()

    # unequal counts: per-ray prefix must match a per-ray batched run
    # counts drawn from {8, 4, 6} — small set keeps the per-ray reference
    # runs to three 1-row compiles while retaining a non-power-of-two count
    n = jnp.array([8, 4, 4, 6], jnp.int32)
    iv_v, s_v = importance_sampling(intervals, cdfs, n, max_intervals_per_ray=8)
    for r, nr in enumerate([8, 4, 4, 6]):
        iv_r, s_r = importance_sampling(
            RayIntervals(vals=intervals.vals[r : r + 1]),
            cdfs[r : r + 1],
            nr,
        )
        np.testing.assert_allclose(
            s_v.vals[r, :nr], s_r.vals[0], atol=1e-5
        )
        assert np.asarray(s_v.is_valid)[r, :nr].all()
        assert not np.asarray(s_v.is_valid)[r, nr:].any()
        # exact edge semantics incl. the CLOSING edge at position n_r
        # (pdf.cu:169-241: each ray behaves as its own n = n_r problem)
        np.testing.assert_allclose(
            iv_v.vals[r, : nr + 1], iv_r.vals[0], atol=1e-5
        )

    # n_r == 1 rays collapse to [t_min, t_max] (int-count n=1 rule)
    n = jnp.array([1, 3, 1, 5], jnp.int32)
    iv_v, s_v = importance_sampling(intervals, cdfs, n, max_intervals_per_ray=8)
    for r in (0, 2):
        np.testing.assert_allclose(
            iv_v.vals[r, 0], intervals.vals[r, 0], atol=1e-6
        )
        np.testing.assert_allclose(
            iv_v.vals[r, 1], intervals.vals[r, -1], atol=1e-6
        )


def test_importance_sampling_stratified():
    """Stratified sampling stays sorted and within bounds."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    intervals = _create_intervals(k1, 8, 32)
    cdfs = jnp.sort(jax.random.uniform(k2, intervals.vals.shape), axis=-1)
    iv, s = importance_sampling(intervals, cdfs, 16, True, key=k3)
    assert (jnp.diff(s.vals, axis=-1) >= 0).all()
    assert (iv.vals[:, 0] >= intervals.vals[:, 0] - 1e-6).all()
    assert (iv.vals[:, -1] <= intervals.vals[:, -1] + 1e-6).all()
