"""Compaction tests.

Legacy contract: order preservation, budget truncation bookkeeping, the
sorted-ids invariant of the flat renderer.  Round-5 addition: the sort-free
hierarchical cumsum inversion (ops/compaction.py) must reproduce the
sort-trick stable compaction BIT-FOR-BIT — it replaced the two hottest ops
of the round-5 step trace, so equality is the whole contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu.grid import TraversalResult
from nerfacc_tpu.ops.compaction import (
    lane_from_cumsum,
    stable_partition_rows,
    valid_cumsum_lanes,
)
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


def _reference_partition(counts, budget):
    """numpy oracle: stable compaction row/rank via explicit expansion."""
    rows = np.repeat(np.arange(len(counts)), counts)
    ranks = np.concatenate([np.arange(c) for c in counts]) if len(rows) else (
        np.zeros((0,), np.int64)
    )
    out_row = np.full((budget,), len(counts), np.int32)
    out_rank = np.zeros((budget,), np.int32)
    k = min(budget, len(rows))
    out_row[:k] = rows[:k]
    out_rank[:k] = ranks[:k]
    return out_row, out_rank, len(rows)


@pytest.mark.parametrize(
    "n,budget,seed",
    [
        (7, 16, 0),        # tiny, budget > total
        (2048, 52428, 1),  # window-stage shape (rays -> pool)
        (52428, 262144, 2),  # sample-stage shape (windows -> budget)
        (100, 64, 3),      # budget < total (truncation)
        (513, 1000, 4),    # non-power-of-two rows
    ],
)
def test_stable_partition_rows_matches_oracle(n, budget, seed):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 9, n).astype(np.int32)
    # sprinkle structure: runs of empty rows incl. at the boundaries
    counts[: min(3, n)] = 0
    counts[-min(2, n):] = 0
    if n > 20:
        counts[10:20] = 0
    row, rank, total = jax.jit(
        stable_partition_rows, static_argnums=1
    )(jnp.asarray(counts), budget)
    ref_row, ref_rank, ref_total = _reference_partition(counts, budget)
    assert int(total) == ref_total
    k = min(budget, ref_total)
    np.testing.assert_array_equal(np.asarray(row)[:k], ref_row[:k])
    np.testing.assert_array_equal(np.asarray(rank)[:k], ref_rank[:k])
    # past-total slots must report row == n (the mask contract)
    np.testing.assert_array_equal(
        np.asarray(row)[k:], np.full((budget - k,), n, np.int32)
    )


def test_stable_partition_all_empty_and_all_full():
    for counts in (np.zeros(64, np.int32), np.full(64, 8, np.int32)):
        row, rank, total = stable_partition_rows(jnp.asarray(counts), 128)
        ref_row, ref_rank, ref_total = _reference_partition(counts, 128)
        k = min(128, ref_total)
        assert int(total) == ref_total
        np.testing.assert_array_equal(np.asarray(row)[:k], ref_row[:k])
        np.testing.assert_array_equal(np.asarray(rank)[:k], ref_rank[:k])


def test_lane_from_cumsum():
    """lane_from_cumsum(valid_cumsum_lanes(v), q) = index of row's q-th set
    bit (m for q >= count)."""
    rng = np.random.default_rng(7)
    valid = rng.random((100, 8)) < 0.5
    cs = valid_cumsum_lanes(jnp.asarray(valid))
    np.testing.assert_array_equal(
        np.asarray(cs), np.cumsum(valid, axis=-1).astype(np.float32)
    )
    for q in range(8):
        lanes = lane_from_cumsum(cs, jnp.full((100,), q, jnp.int32))
        for r in range(100):
            set_bits = np.flatnonzero(valid[r])
            want = set_bits[q] if q < len(set_bits) else 8
            assert int(lanes[r]) == want, (r, q)


def test_pooled_traversal_onehot_matches_sort():
    """traverse_grids_pooled(compaction="onehot") must equal the legacy
    sort path on every VALID pool slot and on all per-ray outputs."""
    from nerfacc_tpu.grid import traverse_grids_pooled
    from tests.test_pooled_traversal import _scene

    state, rays_o, rays_d = _scene()
    n_rays = rays_o.shape[0]
    for cone in (0.0, 0.004):
        kw = dict(
            step_size=5e-3, cone_angle=cone, window_budget=n_rays * 64
        )
        a = traverse_grids_pooled(
            rays_o, rays_d, state.binaries, state.aabbs,
            compaction="sort", **kw,
        )
        b = traverse_grids_pooled(
            rays_o, rays_d, state.binaries, state.aabbs,
            compaction="onehot", **kw,
        )
        # per-ray outputs: exact
        for fld in ("counts", "termination_planes", "terminated",
                    "window_overflow"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, fld)), np.asarray(getattr(b, fld)),
                err_msg=fld,
            )
        # pool slots: exact wherever either path marks the slot valid
        np.testing.assert_array_equal(
            np.asarray(a.valid), np.asarray(b.valid)
        )
        m = np.asarray(a.valid)
        mrow = m.any(axis=-1)
        for fld in ("t_starts", "t_ends"):
            va, vb = np.asarray(getattr(a, fld)), np.asarray(getattr(b, fld))
            np.testing.assert_array_equal(va[m], vb[m], err_msg=fld)
        for fld in ("ray_ids", "rays_o", "rays_d", "near", "wk"):
            va, vb = np.asarray(getattr(a, fld)), np.asarray(getattr(b, fld))
            np.testing.assert_array_equal(va[mrow], vb[mrow], err_msg=fld)


def test_compact_from_windows_onehot_matches_sort():
    """compact_samples_from_windows: sort-free analytic path must equal the
    sort-based analytic path field-for-field (both already equal the legacy
    per-sample-table path)."""
    from nerfacc_tpu.grid import traverse_grids_pooled
    from nerfacc_tpu.utils.rendering import compact_samples_from_windows
    from tests.test_pooled_traversal import _scene

    state, rays_o, rays_d = _scene()
    n_rays = rays_o.shape[0]
    for cone in (0.0, 0.004):
        ws = traverse_grids_pooled(
            rays_o, rays_d, state.binaries, state.aabbs,
            step_size=5e-3, cone_angle=cone, window_budget=n_rays * 64,
        )
        extras = jnp.arange(ws.ray_ids.shape[0], dtype=jnp.float32)
        for budget in (4096, 1 << 14):
            a = compact_samples_from_windows(
                ws, budget, n_rays, extras=extras,
                step_size=5e-3, cone_angle=cone, compaction="sort",
            )
            b = compact_samples_from_windows(
                ws, budget, n_rays, extras=extras,
                step_size=5e-3, cone_angle=cone, compaction="onehot",
            )
            for fld in ("ray_indices", "valid", "seg_starts", "seg_ends",
                        "t_starts", "t_ends", "rays_o", "rays_d", "extras",
                        "num_valid", "overflow", "first_incomplete_ray"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, fld)),
                    np.asarray(getattr(b, fld)), err_msg=fld,
                )
