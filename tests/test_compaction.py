"""Compaction tests: order preservation, budget truncation bookkeeping, and
the flat-renderer equivalence with the batched layout."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.grid import TraversalResult
from nerfacc_tpu.utils.rendering import compact_samples


def _mk_result(valid):
    n_rays, K = valid.shape
    t0 = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.float32)[None, :], (n_rays, K)
    ) + 100.0 * jnp.arange(n_rays)[:, None]
    t1 = t0 + 1.0
    return TraversalResult(
        t0,
        t1,
        jnp.asarray(valid),
        jnp.zeros((n_rays,)),
        jnp.ones((n_rays,), bool),
    )


def test_compact_order_and_values():
    valid = np.zeros((3, 4), bool)
    valid[0, 1] = valid[0, 3] = True
    valid[2, 0] = valid[2, 2] = valid[2, 3] = True
    res = _mk_result(valid)
    s = compact_samples(res, budget=8)
    assert int(s.num_valid) == 5
    assert int(s.overflow) == 0
    np.testing.assert_array_equal(
        np.asarray(s.ray_indices)[:5], [0, 0, 2, 2, 2]
    )
    np.testing.assert_allclose(
        np.asarray(s.t_starts)[:5], [1.0, 3.0, 200.0, 202.0, 203.0]
    )
    assert not np.asarray(s.valid)[5:].any()
    assert int(s.first_incomplete_ray) == 3  # nothing truncated


def test_compact_budget_truncation():
    valid = np.ones((4, 4), bool)
    res = _mk_result(valid)
    s = compact_samples(res, budget=10)
    assert int(s.num_valid) == 10
    assert int(s.overflow) == 6
    # truncation hits ray 2 mid-way: rays >= 2 are incomplete
    assert int(s.first_incomplete_ray) == 2
    np.testing.assert_array_equal(
        np.asarray(s.ray_indices), [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    )


def test_compact_empty():
    valid = np.zeros((2, 4), bool)
    s = compact_samples(_mk_result(valid), budget=4)
    assert int(s.num_valid) == 0
    assert not np.asarray(s.valid).any()
    assert int(s.first_incomplete_ray) == 2


def test_compact_invalid_slots_keep_ids_sorted():
    """Empty trailing slots must hold n_rays (not 0), or the sorted-segment
    reduction used by the training render path corrupts per-ray sums."""
    valid = np.zeros((3, 4), bool)
    valid[1, 0] = valid[2, 1] = True
    s = compact_samples(_mk_result(valid), budget=8)
    ids = np.asarray(s.ray_indices)
    assert (np.diff(ids) >= 0).all(), ids
    assert (ids[int(s.num_valid):] == 3).all()


def test_sorted_accumulate_matches_segment_sum_partial_fill():
    """indices_sorted=True on a partially-filled compacted buffer must match
    the plain scatter segment_sum (regression: 0-filled trailing ids made
    searchsorted land in a bogus leading segment)."""
    from nerfacc_tpu.volrend import accumulate_along_rays

    rng = np.random.default_rng(0)
    n_rays, K = 16, 8
    valid = rng.random((n_rays, K)) < 0.4  # ~50% buffer fill at budget 64
    res = _mk_result(valid)
    s = compact_samples(res, budget=64)
    weights = jnp.where(
        s.valid, jnp.asarray(rng.random(64), jnp.float32), 0.0
    )
    values = jnp.asarray(rng.random((64, 3)), jnp.float32)
    fast = accumulate_along_rays(
        weights, values, s.ray_indices, n_rays, indices_sorted=True
    )
    ref = jax.ops.segment_sum(
        weights[:, None] * values,
        jnp.minimum(s.ray_indices, n_rays),  # out-of-range ids drop
        num_segments=n_rays + 1,
    )[:n_rays]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)
