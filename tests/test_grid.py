"""Grid tests (ported from reference tests/test_grid.py): ray-AABB
intersection properties, traversal midpoints landing in occupied voxels,
iterative (resumable) vs one-shot traversal, near/far clamping, per-ray
t_min/t_max, and the mark_invisible_cells golden cell counts."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import OccGridEstimator, ray_aabb_intersect
from nerfacc_tpu.grid import (
    _enlarge_aabb,
    _query,
    traverse_grids_padded,
)


def _random_rays(key, n_rays, origin_scale=1.0, unit_origin=False):
    k1, k2 = jax.random.split(key)
    if unit_origin:
        rays_o = jax.random.uniform(k1, (n_rays, 3))
    else:
        rays_o = jax.random.normal(k1, (n_rays, 3)) * origin_scale
    rays_d = jax.random.normal(k2, (n_rays, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o, rays_d


def test_ray_aabb_intersect():
    """(reference tests/test_grid.py:8-35)"""
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    n_rays, n_aabbs = 1000, 100

    rays_o, rays_d = _random_rays(k1, n_rays, unit_origin=True)
    aabb_min = jax.random.uniform(k2, (n_aabbs, 3))
    aabb_max = aabb_min + jax.random.uniform(k3, (n_aabbs, 3))
    aabbs = jnp.concatenate([aabb_min, aabb_max], axis=-1)

    tmins, tmaxs, hits = ray_aabb_intersect(rays_o, rays_d, aabbs)

    # numpy slab-method reference
    o = np.asarray(rays_o)[:, None, :]
    d = np.asarray(rays_d)[:, None, :]
    t1 = (np.asarray(aabb_min)[None] - o) / d
    t2 = (np.asarray(aabb_max)[None] - o) / d
    _tmins = np.minimum(t1, t2).max(-1)
    _tmaxs = np.maximum(t1, t2).min(-1)
    _hits = (_tmaxs > _tmins) & (_tmaxs > 0)
    _tmins = np.where(_hits, _tmins, np.inf)
    _tmaxs = np.where(_hits, _tmaxs, np.inf)

    np.testing.assert_array_equal(np.asarray(hits), _hits)
    np.testing.assert_allclose(np.asarray(tmins), _tmins, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tmaxs), _tmaxs, rtol=1e-5)

    # midpoints of hits must lie inside the boxes
    tmids = np.clip((np.asarray(tmins) + np.asarray(tmaxs)) / 2, 0.0, None)
    points = tmids[:, :, None] * np.asarray(rays_d)[:, None, :] + o
    inside = (
        (points >= np.asarray(aabb_min)[None] - 1e-6)
        & (points <= np.asarray(aabb_max)[None] + 1e-6)
    ).all(-1)
    assert (inside == np.asarray(hits)).mean() > 0.999


def test_traverse_grids_occupancy():
    """All emitted sample midpoints must be in occupied voxels at the mip
    level implied by their position (reference tests/test_grid.py:38-68)."""
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    n_rays, levels = 10, 4

    rays_o, rays_d = _random_rays(k1, n_rays)
    base_aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    aabbs = jnp.stack([_enlarge_aabb(base_aabb, 2**i) for i in range(levels)])
    binaries = jax.random.uniform(k2, (levels, 32, 32, 32)) > 0.5

    res = traverse_grids_padded(
        rays_o, rays_d, binaries, aabbs, step_size=0.05, max_samples=1024
    )
    assert bool(res.terminated.all()), "window must cover the whole scene"

    valid = np.asarray(res.valid)
    mids = np.asarray(res.t_mids)
    rid, sid = np.nonzero(valid)
    positions = jnp.asarray(
        np.asarray(rays_o)[rid] + np.asarray(rays_d)[rid] * mids[rid, sid][:, None]
    )
    occs, selector = _query(positions, binaries, base_aabb)
    assert np.asarray(selector).all()
    # allow a tiny fraction of level-boundary epsilon mismatches
    assert np.asarray(occs).mean() > 0.999, float(np.asarray(occs).mean())


def test_traverse_grids_iterative_resume():
    """Iterative over-allocate traversal with termination-plane resume must
    reproduce the one-shot traversal (reference tests/test_grid.py:71-131)."""
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    n_rays, levels = 10, 4

    rays_o, rays_d = _random_rays(k1, n_rays)
    base_aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    aabbs = jnp.stack([_enlarge_aabb(base_aabb, 2**i) for i in range(levels)])
    binaries = jax.random.uniform(k2, (levels, 32, 32, 32)) > 0.5
    step = 0.01

    ref = traverse_grids_padded(
        rays_o, rays_d, binaries, aabbs, step_size=step, max_samples=4096
    )
    assert bool(ref.terminated.all())
    ref_valid = np.asarray(ref.valid)
    ref_sum_t0 = (np.asarray(ref.t_starts) * ref_valid).sum(-1)
    ref_sum_t1 = (np.asarray(ref.t_ends) * ref_valid).sum(-1)

    # iterative: small candidate windows resumed from termination planes
    near = None
    alive = jnp.ones((n_rays,), bool)
    it_sum_t0 = np.zeros((n_rays,))
    it_sum_t1 = np.zeros((n_rays,))
    total_valid = 0
    for _ in range(40):
        res = traverse_grids_padded(
            rays_o,
            rays_d,
            binaries,
            aabbs,
            near_planes=near,
            step_size=step,
            max_samples=128,
            rays_mask=alive,
        )
        v = np.asarray(res.valid)
        it_sum_t0 += (np.asarray(res.t_starts) * v).sum(-1)
        it_sum_t1 += (np.asarray(res.t_ends) * v).sum(-1)
        total_valid += v.sum()
        near = res.termination_planes
        alive = alive & ~res.terminated
        if not bool(alive.any()):
            break
    assert not bool(alive.any()), "all rays should terminate"
    assert total_valid == ref_valid.sum()
    np.testing.assert_allclose(it_sum_t0, ref_sum_t0, atol=1e-1)
    np.testing.assert_allclose(it_sum_t1, ref_sum_t1, atol=1e-1)


def test_traverse_grids_windowed_matches_padded():
    """The coarse-to-fine windowed traverser must emit exactly the padded
    traverser's samples on rays whose window budget is not exhausted."""
    from nerfacc_tpu.grid import traverse_grids_windowed

    key = jax.random.PRNGKey(0)
    n_rays = 64
    rays_o, rays_d = _random_rays(key, n_rays, origin_scale=0.2)
    rays_o = rays_o + jnp.array([2.0, 0.0, 0.0])

    # coherent occupancy: a thick spherical shell
    g = jnp.stack(
        jnp.meshgrid(*[jnp.linspace(-1.4, 1.4, 32)] * 3, indexing="ij"), -1
    )
    r = jnp.linalg.norm(g, axis=-1)
    binaries = ((r > 0.6) & (r < 1.0))[None]
    aabbs = jnp.array([[-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]])

    rp = traverse_grids_padded(
        rays_o, rays_d, binaries, aabbs, step_size=0.02, max_samples=512
    )
    rw = traverse_grids_windowed(
        rays_o,
        rays_d,
        binaries,
        aabbs,
        step_size=0.02,
        n_windows=32,
        window_size=8,
        max_coarse=72,
        pool=4,
        dilation=1,
    )
    ok = np.asarray(rw.terminated)
    assert ok.mean() > 0.5, "too many truncated rays for this scene"
    vp, vw = np.asarray(rp.valid), np.asarray(rw.valid)
    tp0, tw0 = np.asarray(rp.t_starts), np.asarray(rw.t_starts)
    for rr in np.nonzero(ok)[0]:
        sp = set(np.round(tp0[rr][vp[rr]], 5).tolist())
        sw = set(np.round(tw0[rr][vw[rr]], 5).tolist())
        assert sp == sw, (rr, len(sp), len(sw))


def test_traverse_grids_windowed_sweep_exhaustion_resumes():
    """If valid segments extend past the coarse sweep extent, the ray must
    report terminated=False with a termination plane at the sweep end, so an
    iterative caller can resume and recover every padded-traverser sample."""
    from nerfacc_tpu.grid import traverse_grids_windowed

    key = jax.random.PRNGKey(3)
    n_rays = 16
    rays_o, rays_d = _random_rays(key, n_rays, origin_scale=0.2)
    rays_o = rays_o + jnp.array([2.0, 0.0, 0.0])

    g = jnp.stack(
        jnp.meshgrid(*[jnp.linspace(-1.4, 1.4, 32)] * 3, indexing="ij"), -1
    )
    r = jnp.linalg.norm(g, axis=-1)
    binaries = ((r > 0.6) & (r < 1.0))[None]
    aabbs = jnp.array([[-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]])
    step = 0.02

    rp = traverse_grids_padded(
        rays_o, rays_d, binaries, aabbs, step_size=step, max_samples=512
    )
    vp = np.asarray(rp.valid)

    # max_coarse=8 windows of 8 steps: the sweep spans only ~1.28 units of a
    # ~3-unit-deep scene, so every hitting ray exhausts the sweep.
    near = None
    alive = jnp.ones((n_rays,), bool)
    got = [set() for _ in range(n_rays)]
    for _ in range(30):
        rw = traverse_grids_windowed(
            rays_o,
            rays_d,
            binaries,
            aabbs,
            near_planes=near,
            step_size=step,
            n_windows=8,
            window_size=8,
            max_coarse=8,
            pool=4,
            dilation=1,
            rays_mask=alive,
        )
        vw = np.asarray(rw.valid)
        tw0 = np.asarray(rw.t_starts)
        for rr in np.nonzero(np.asarray(alive))[0]:
            got[rr].update(np.round(tw0[rr][vw[rr]], 5).tolist())
        near = rw.termination_planes
        alive = alive & ~rw.terminated
        if not bool(alive.any()):
            break
    assert not bool(alive.any())
    tp0 = np.asarray(rp.t_starts)
    for rr in range(n_rays):
        want = set(np.round(tp0[rr][vp[rr]], 5).tolist())
        assert want == got[rr], (rr, len(want), len(got[rr]))


def test_traverse_steps_limit_without_over_allocate():
    """traverse_steps_limit must cap emitted samples per ray in BOTH modes
    (reference grid.cu:184,208), not only when over_allocate=True."""
    from nerfacc_tpu.grid import traverse_grids

    key = jax.random.PRNGKey(7)
    rays_o, rays_d = _random_rays(key, 8)
    binaries = jnp.ones((1, 8, 8, 8), bool)
    aabbs = jnp.array([[-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]])
    _, samples, _ = traverse_grids(
        rays_o,
        rays_d,
        binaries,
        aabbs,
        step_size=0.05,
        traverse_steps_limit=5,
        over_allocate=False,
        max_samples=128,
    )
    per_ray = np.asarray(samples.is_valid).sum(-1)
    assert (per_ray <= 5).all(), per_ray


def test_traverse_grids_with_near_far_planes():
    """(reference tests/test_grid.py:134-159)"""
    rays_o = jnp.array([[-1.0, 0.0, 0.0]])
    rays_d = jnp.array([[1.0, 0.01, 0.01]])
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    binaries = jnp.ones((1, 1, 1, 1), bool)
    aabbs = jnp.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
    step = 0.05

    res = traverse_grids_padded(
        rays_o,
        rays_d,
        binaries,
        aabbs,
        near_planes=jnp.array([1.2]),
        far_planes=jnp.array([1.5]),
        step_size=step,
        max_samples=64,
    )
    v = np.asarray(res.valid)[0]
    t0 = np.asarray(res.t_starts)[0][v]
    t1 = np.asarray(res.t_ends)[0][v]
    assert (t0 >= 1.2 - step / 2).all()
    assert (t1 <= 1.5 + step / 2).all()


def test_sampling_with_min_max_distances():
    """(reference tests/test_grid.py:162-203)"""
    key = jax.random.PRNGKey(42)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_rays, levels, resolution = 64, 4, 32
    render_step_size = 0.01

    rays_o = jax.random.uniform(k1, (n_rays, 3)) * 2 - 1.0
    rays_d = jax.random.uniform(k2, (n_rays, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    binaries = (
        jax.random.uniform(k3, (levels, resolution, resolution, resolution))
        > 0.5
    )
    t_min = jax.random.uniform(k4, (n_rays,))
    t_max = t_min + jax.random.uniform(jax.random.PRNGKey(7), (n_rays,))

    estimator = OccGridEstimator(
        roi_aabb=aabb, resolution=resolution, levels=levels, max_samples=2048
    )
    import dataclasses

    estimator.state = dataclasses.replace(estimator.state, binaries=binaries)

    ray_indices, t_starts, t_ends = estimator.sampling(
        rays_o=rays_o,
        rays_d=rays_d,
        near_plane=0.15,
        far_plane=0.85,
        t_min=t_min,
        t_max=t_max,
        render_step_size=render_step_size,
    )
    t_min_np = np.asarray(t_min)[np.asarray(ray_indices)]
    t_max_np = np.asarray(t_max)[np.asarray(ray_indices)]
    assert (np.asarray(t_starts) >= t_min_np - render_step_size / 2).all()
    assert (np.asarray(t_ends) <= t_max_np + render_step_size / 2).all()


def test_mark_invisible_cells():
    """Golden cell counts (reference tests/test_grid.py:206-233) — the
    computation is deterministic, so the constants carry over exactly."""
    levels, resolution = 4, 32
    width = height = 100
    fx, fy = width, height
    cx, cy = width / 2, height / 2

    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    estimator = OccGridEstimator(
        roi_aabb=aabb, resolution=resolution, levels=levels
    )

    K = jnp.array([[[fx, 0, cx], [0, fy, cy], [0, 0, 1]]], jnp.float32)
    pose = jnp.array(
        [[[-1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, -1.0, 2.5]]]
    )

    estimator.mark_invisible_cells(K, pose, width, height)
    occs = np.asarray(estimator.occs)
    # The reference goldens are 77660 / 53412 (tests/test_grid.py:232-233);
    # ~50 cells project exactly onto the image border where fp rounding in a
    # different op order flips the in-image test, so allow that sliver.
    assert abs(int((occs == -1).sum()) - 77660) <= 100, (occs == -1).sum()
    assert abs(int((occs == 0).sum()) - 53412) <= 100, (occs == 0).sum()
    assert (occs == -1).sum() + (occs == 0).sum() == occs.size
