"""traverse_grids_voxel: per-voxel intervals (reference step_size<=0 mode,
grid.cu:104-107, 218-245)."""
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.estimators.occ_grid import init_occ_grid
from nerfacc_tpu.grid import traverse_grids, traverse_grids_voxel


def _scene(n_rays=32, res=16, seed=0, occ_frac=0.3):
    rng = np.random.default_rng(seed)
    state = init_occ_grid(jnp.asarray([-1.0, -1, -1, 1, 1, 1]), res, 1)
    bins = rng.random((1, res, res, res)) < occ_frac
    state = state.__class__(
        aabbs=state.aabbs, occs=state.occs, binaries=jnp.asarray(bins)
    )
    origins = rng.normal(size=(n_rays, 3))
    origins = origins / np.linalg.norm(origins, axis=-1, keepdims=True) * 2.5
    dirs = -origins + rng.normal(size=(n_rays, 3)) * 0.2
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return state, jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32)


def _voxel_of(p, res=16):
    return np.clip(np.floor((p + 1.0) / 2.0 * res).astype(int), 0, res - 1)


def test_voxel_intervals_are_within_single_occupied_voxels():
    state, rays_o, rays_d = _scene()
    res = traverse_grids_voxel(
        rays_o, rays_d, state.binaries, state.aabbs, max_edges=512
    )
    t0 = np.asarray(res.t_starts)
    t1 = np.asarray(res.t_ends)
    v = np.asarray(res.valid)
    o = np.asarray(rays_o)
    d = np.asarray(rays_d)
    bins = np.asarray(state.binaries[0])
    eps = 1e-4
    n_checked = 0
    for i in range(v.shape[0]):
        for k in np.nonzero(v[i])[0]:
            pa = o[i] + (t0[i, k] + eps) * d[i]
            pb = o[i] + (t1[i, k] - eps) * d[i]
            va, vb = _voxel_of(pa), _voxel_of(pb)
            assert (va == vb).all(), (
                f"interval {i},{k} crosses a voxel boundary: {va} vs {vb}"
            )
            assert bins[va[0], va[1], va[2]], "interval in empty voxel"
            n_checked += 1
    assert n_checked > 100


def test_voxel_coverage_matches_brute_force():
    """Total per-ray length inside occupied voxels must match a fine uniform
    march."""
    state, rays_o, rays_d = _scene(seed=1)
    res = traverse_grids_voxel(
        rays_o, rays_d, state.binaries, state.aabbs, max_edges=512
    )
    t0 = np.asarray(res.t_starts)
    t1 = np.asarray(res.t_ends)
    v = np.asarray(res.valid)
    lengths = (np.where(v, t1 - t0, 0.0)).sum(-1)

    o = np.asarray(rays_o)
    d = np.asarray(rays_d)
    bins = np.asarray(state.binaries[0])
    dt = 1e-3
    ts = np.arange(0.0, 6.0, dt, dtype=np.float32)
    for i in range(o.shape[0]):
        p = o[i][None, :] + ts[:, None] * d[i][None, :]
        inside = (np.abs(p) < 1.0).all(-1)
        vox = _voxel_of(p)
        occ = bins[vox[:, 0], vox[:, 1], vox[:, 2]] & inside
        brute = occ.sum() * dt
        assert abs(brute - lengths[i]) < 0.03, (i, brute, lengths[i])


def test_voxel_truncation_reported_and_resumable():
    """A res=128 full-diagonal ray needs ~3*128 crossings; with a tight
    edge budget the traversal must NOT silently drop far intervals — it
    reports terminated=False with a resumable termination plane, and
    resuming from that plane recovers full coverage (reference resume
    contract, grid.cu:274-275)."""
    res = 128
    state = init_occ_grid(jnp.asarray([-1.0, -1, -1, 1, 1, 1]), res, 1)
    state = state.__class__(
        aabbs=state.aabbs,
        occs=state.occs,
        binaries=jnp.ones_like(state.binaries),
    )
    d = np.asarray([1.0, 1.0, 1.0]) / np.sqrt(3.0)
    rays_o = jnp.asarray([-2.0 * d], jnp.float32)
    rays_d = jnp.asarray([d], jnp.float32)
    diag_len = 2.0 * np.sqrt(3.0)  # chord through the cube

    def covered(r):
        t0, t1, v = np.asarray(r.t_starts), np.asarray(r.t_ends), np.asarray(r.valid)
        return float(np.where(v, t1 - t0, 0.0).sum())

    # generous budget: fully covered, terminated
    full = traverse_grids_voxel(
        rays_o, rays_d, state.binaries, state.aabbs, max_edges=1024
    )
    assert bool(full.terminated[0])
    assert abs(covered(full) - diag_len) < 1e-2

    # tight budget: truncation must be SIGNALED, kept intervals exact
    part = traverse_grids_voxel(
        rays_o, rays_d, state.binaries, state.aabbs, max_edges=256
    )
    assert not bool(part.terminated[0])
    tp = float(part.termination_planes[0])
    t_exit = 2.0 + np.sqrt(3.0)
    assert tp < t_exit - 1e-3
    # all kept intervals lie before the reported horizon
    t1 = np.asarray(part.t_ends)[0]
    v = np.asarray(part.valid)[0]
    assert (t1[v] <= tp + 1e-5).all()
    # resume from the termination plane: combined coverage is complete
    rest = traverse_grids_voxel(
        rays_o, rays_d, state.binaries, state.aabbs,
        near_planes=part.termination_planes, max_edges=256,
    )
    assert abs(covered(part) + covered(rest) - diag_len) < 2e-2


def test_wrapper_dispatches_step_size_zero():
    state, rays_o, rays_d = _scene(seed=2)
    intervals, samples, term = traverse_grids(
        rays_o, rays_d, state.binaries, state.aabbs,
        step_size=0.0, max_samples=511)
    v = np.asarray(samples.is_valid)
    assert v.any()
    # shared-edge encoding: interval k spans edge k, k+1
    np.testing.assert_array_equal(
        np.asarray(intervals.is_left)[:, :-1], v)
    np.testing.assert_array_equal(
        np.asarray(intervals.is_right)[:, 1:], v)
    # traverse_steps_limit applies in voxel mode too
    _, s2, _ = traverse_grids(
        rays_o, rays_d, state.binaries, state.aabbs,
        step_size=0.0, max_samples=511, traverse_steps_limit=3)
    counts = np.asarray(jnp.sum(s2.is_valid, -1))
    assert counts.max() <= 3
