"""Pooled (global window pool) traversal must agree with the exact padded
traversal wherever no budget is exhausted, and report truncation honestly
when it is."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.estimators.occ_grid import init_occ_grid
from nerfacc_tpu.grid import traverse_grids_padded, traverse_grids_pooled
from nerfacc_tpu.utils.rendering import compact_samples_from_windows


def _scene(n_rays=64, res=32, seed=0):
    rng = np.random.default_rng(seed)
    state = init_occ_grid(jnp.asarray([-1.0, -1, -1, 1, 1, 1]), res, 1)
    bins = rng.random((1, res, res, res)) < 0.3
    state = state.__class__(
        aabbs=state.aabbs, occs=state.occs, binaries=jnp.asarray(bins)
    )
    origins = rng.normal(size=(n_rays, 3))
    origins = origins / np.linalg.norm(origins, axis=-1, keepdims=True) * 2.5
    dirs = -origins + rng.normal(size=(n_rays, 3)) * 0.2
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return state, jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32)


def _per_ray_mids(t0, t1, valid, ray_of_row):
    """set of valid sample midpoints per ray."""
    mids = 0.5 * (np.asarray(t0) + np.asarray(t1))
    v = np.asarray(valid)
    out = {}
    rows = np.asarray(ray_of_row)
    for i in range(v.shape[0]):
        r = int(rows[i])
        got = mids[i][v[i]]
        if len(got):
            out.setdefault(r, []).append(got)
    return {r: np.sort(np.concatenate(g)) for r, g in out.items()}


def test_pooled_matches_padded_with_ample_budget():
    state, rays_o, rays_d = _scene()
    n_rays = rays_o.shape[0]
    step = 5e-3

    ref = traverse_grids_padded(
        rays_o, rays_d, state.binaries, state.aabbs,
        step_size=step, max_samples=1024)
    ws = traverse_grids_pooled(
        rays_o, rays_d, state.binaries, state.aabbs,
        step_size=step, window_budget=n_rays * 128, window_size=8,
        max_coarse=160)

    assert bool(jnp.all(ws.terminated)), "ample budget must not truncate"
    assert int(ws.window_overflow) == 0

    ref_mids = _per_ray_mids(
        ref.t_starts, ref.t_ends, ref.valid,
        np.arange(n_rays))
    got_mids = _per_ray_mids(ws.t_starts, ws.t_ends, ws.valid, ws.ray_ids)
    assert set(ref_mids.keys()) == set(got_mids.keys())
    for r in ref_mids:
        np.testing.assert_allclose(ref_mids[r], got_mids[r], atol=1e-6)

    # per-ray counts bookkeeping
    ref_counts = np.asarray(jnp.sum(ref.valid, -1))
    np.testing.assert_array_equal(np.asarray(ws.counts), ref_counts)

    # termination planes match the exact traversal's for terminated rays
    np.testing.assert_allclose(
        np.asarray(ws.termination_planes),
        np.asarray(ref.termination_planes), atol=step + 1e-5)


def test_pooled_truncation_is_a_ray_suffix():
    state, rays_o, rays_d = _scene()
    ws_full = traverse_grids_pooled(
        rays_o, rays_d, state.binaries, state.aabbs,
        step_size=5e-3, window_budget=rays_o.shape[0] * 128)
    total_windows = int(jnp.sum(ws_full.ray_ids < rays_o.shape[0]))
    wb = max(total_windows // 2, 8)
    ws = traverse_grids_pooled(
        rays_o, rays_d, state.binaries, state.aabbs,
        step_size=5e-3, window_budget=wb)
    assert int(ws.window_overflow) > 0
    term = np.asarray(ws.terminated)
    counts_full = np.asarray(ws_full.counts)
    counts = np.asarray(ws.counts)
    # rays keeping fewer samples than the untruncated run must be flagged
    lost = counts < counts_full
    assert lost.any()
    assert not (lost & term).any(), "rays losing samples must be unterminated"
    # pool cut hits a contiguous ray suffix: every ray with windows after the
    # first losing ray is also affected or has no windows at all
    first_lost = np.argmax(lost)
    after = counts_full[first_lost + 1:] > 0
    assert np.all(lost[first_lost + 1:][after] | (counts[first_lost + 1:][after] == 0) | ~after | lost[first_lost + 1:][after])


def test_compact_from_windows_matches_direct():
    from nerfacc_tpu.utils.rendering import compact_samples

    state, rays_o, rays_d = _scene()
    n_rays = rays_o.shape[0]
    ref = traverse_grids_padded(
        rays_o, rays_d, state.binaries, state.aabbs,
        step_size=5e-3, max_samples=1024)
    ws = traverse_grids_pooled(
        rays_o, rays_d, state.binaries, state.aabbs,
        step_size=5e-3, window_budget=n_rays * 128)
    budget = 4096
    a = compact_samples(ref, budget)
    b = compact_samples_from_windows(ws, budget, n_rays)
    assert int(a.num_valid) == int(b.num_valid)
    nv = int(a.num_valid)
    np.testing.assert_array_equal(
        np.asarray(a.ray_indices)[:nv], np.asarray(b.ray_indices)[:nv])
    np.testing.assert_allclose(
        np.asarray(a.t_starts)[:nv], np.asarray(b.t_starts)[:nv], atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(a.seg_starts), np.asarray(b.seg_starts))
    np.testing.assert_array_equal(np.asarray(a.seg_ends), np.asarray(b.seg_ends))


def test_compact_analytic_payload_matches_legacy():
    """The analytic compaction payload (step_size given: one per-window row
    gather + closed-form orbit recompute) must reproduce the legacy
    per-sample-table gather EXACTLY — same expression, same f32 inputs, so
    bit-equality is the contract, for both uniform and cone stepping."""
    state, rays_o, rays_d = _scene()
    n_rays = rays_o.shape[0]
    for cone in (0.0, 0.004):
        ws = traverse_grids_pooled(
            rays_o, rays_d, state.binaries, state.aabbs,
            step_size=5e-3, cone_angle=cone,
            window_budget=n_rays * 64)
        legacy = compact_samples_from_windows(ws, 4096, n_rays)
        analytic = compact_samples_from_windows(
            ws, 4096, n_rays, step_size=5e-3, cone_angle=cone)
        assert ws.near is not None and ws.wk is not None
        for fld in ("ray_indices", "valid", "seg_starts", "seg_ends"):
            np.testing.assert_array_equal(
                np.asarray(getattr(legacy, fld)),
                np.asarray(getattr(analytic, fld)), err_msg=fld)
        for fld in ("t_starts", "t_ends", "rays_o", "rays_d"):
            np.testing.assert_array_equal(
                np.asarray(getattr(legacy, fld)),
                np.asarray(getattr(analytic, fld)), err_msg=fld)
        # extras ride the per-window row too
        extras = jnp.arange(ws.ray_ids.shape[0], dtype=jnp.float32)
        e_legacy = compact_samples_from_windows(
            ws, 4096, n_rays, extras=extras)
        e_analytic = compact_samples_from_windows(
            ws, 4096, n_rays, extras=extras,
            step_size=5e-3, cone_angle=cone)
        np.testing.assert_array_equal(
            np.asarray(e_legacy.extras), np.asarray(e_analytic.extras))


def test_fine_probes_superset_and_tight():
    """fine_probes>0 must emit a SUPERSET of the exact sample set, with only
    a small inflation (conservative block-corner fallbacks)."""
    state, rays_o, rays_d = _scene(n_rays=128, seed=3)
    n_rays = rays_o.shape[0]
    kw = dict(step_size=5e-3, window_budget=n_rays * 128, window_size=8,
              max_coarse=160)
    exact = traverse_grids_pooled(
        rays_o, rays_d, state.binaries, state.aabbs, fine_probes=0, **kw)
    approx = traverse_grids_pooled(
        rays_o, rays_d, state.binaries, state.aabbs, fine_probes=3, **kw)
    ve, va = np.asarray(exact.valid), np.asarray(approx.valid)
    # same windows in both runs (coarse phase identical) -> aligned slots
    assert (ve & ~va).sum() == 0, "approx must never drop an exact sample"
    inflation = (va & ~ve).sum() / max(ve.sum(), 1)
    assert inflation < 0.05, f"sample inflation too high: {inflation:.3f}"


def test_fine_probes_window_size_is_exact():
    """fine_probes == window_size is EXACT by construction: a window of f
    candidates has at most f distinct word-runs (run_id < f always), so the
    conservative unmatched-fallback can never trigger and every candidate is
    resolved against its own gathered word.  Must match fine_probes=0
    bit-for-bit — including with cone-angle (geometric) stepping, where
    growing dt maximizes word crossings per window."""
    for seed, cone in ((3, 0.0), (5, 0.0), (7, 0.004)):
        state, rays_o, rays_d = _scene(n_rays=128, seed=seed)
        n_rays = rays_o.shape[0]
        f = 8
        kw = dict(step_size=5e-3, window_budget=n_rays * 128, window_size=f,
                  max_coarse=160, cone_angle=cone)
        exact = traverse_grids_pooled(
            rays_o, rays_d, state.binaries, state.aabbs, fine_probes=0, **kw)
        probed = traverse_grids_pooled(
            rays_o, rays_d, state.binaries, state.aabbs, fine_probes=f, **kw)
        np.testing.assert_array_equal(
            np.asarray(exact.valid), np.asarray(probed.valid)
        )
        np.testing.assert_allclose(
            np.asarray(exact.t_starts), np.asarray(probed.t_starts)
        )


def test_fine_box_mode_is_exact():
    """fine_probes == -1 (one 27-word box row gather per window) is EXACT
    whenever (window_size / 2) * step_size <= voxel_size with uniform
    stepping: every candidate's voxel then sits within one cell of the
    middle candidate's per axis, so the box covers the whole window and the
    conservative fallback never triggers.  Here voxel = 2/32 = 0.0625 and
    (8/2) * 5e-3 = 0.02."""
    for seed in (3, 5, 11):
        state, rays_o, rays_d = _scene(n_rays=128, seed=seed)
        n_rays = rays_o.shape[0]
        f = 8
        kw = dict(step_size=5e-3, window_budget=n_rays * 128, window_size=f,
                  max_coarse=160)
        exact = traverse_grids_pooled(
            rays_o, rays_d, state.binaries, state.aabbs, fine_probes=0, **kw)
        box = traverse_grids_pooled(
            rays_o, rays_d, state.binaries, state.aabbs, fine_probes=-1, **kw)
        np.testing.assert_array_equal(
            np.asarray(exact.valid), np.asarray(box.valid)
        )
        np.testing.assert_allclose(
            np.asarray(exact.t_starts), np.asarray(box.t_starts)
        )


def test_fine_box_mode_is_conservative_superset_under_cone():
    """With cone-angle (geometric) stepping, dt eventually exceeds the box
    bound; uncovered candidates must fall back to conservative OCCUPIED —
    i.e. the box-mode valid set is a SUPERSET of the exact one, never a
    miss (same never-drop contract as the run-start probes' fallback)."""
    state, rays_o, rays_d = _scene(n_rays=128, seed=7)
    n_rays = rays_o.shape[0]
    kw = dict(step_size=5e-3, window_budget=n_rays * 128, window_size=8,
              max_coarse=160, cone_angle=0.02)
    exact = traverse_grids_pooled(
        rays_o, rays_d, state.binaries, state.aabbs, fine_probes=0, **kw)
    box = traverse_grids_pooled(
        rays_o, rays_d, state.binaries, state.aabbs, fine_probes=-1, **kw)
    ev, bv = np.asarray(exact.valid), np.asarray(box.valid)
    assert (bv | ~ev).all(), "box mode dropped an exact-valid sample"


def test_pooled_traversal_with_missing_rays():
    """Rays that MISS the grid carry inf segment bounds; the one-hot payload
    spread must not let 0*inf NaNs poison the pool (regression: all samples
    vanished on TPU for any batch containing a missing ray)."""
    state, rays_o, rays_d = _scene(n_rays=64)
    n = 64
    # point half the rays AWAY from the grid -> guaranteed misses
    rays_d = rays_d.at[n // 2 :].set(-rays_d[n // 2 :])
    ws = traverse_grids_pooled(
        rays_o, rays_d, state.binaries, state.aabbs,
        step_size=2e-2, window_budget=2048, window_size=8, max_coarse=96,
    )
    counts = np.asarray(ws.counts)
    assert counts[: n // 2].sum() > 0, "hitting rays lost their samples"
    assert (counts[n // 2 :] == 0).all(), "missing rays must emit nothing"
    assert np.isfinite(np.asarray(ws.t_starts)[np.asarray(ws.valid)]).all()
