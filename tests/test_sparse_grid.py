"""SparseGridEstimator (VDB analog) agreement tests.

Port of the intent of reference tests/test_vdb.py:10-135: the sparse
estimator's traversal and update protocol must agree with the dense
OccGridEstimator on the same scene.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import (
    OccGridEstimator,
    SparseGridEstimator,
    sparse_grid_from_dense,
    sparse_grid_from_ijk,
    traverse_grids,
    traverse_vdbs,
)
from nerfacc_tpu.estimators.sparse_grid import N3TreeEstimator


def _rays(n_rays=64, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n_rays, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o + rng.normal(size=(n_rays, 3)) * 0.2
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_traverse_vdbs_matches_traverse_grids():
    """(reference: tests/test_vdb.py:10-58)"""
    rng = np.random.default_rng(42)
    reso = 32
    aabb = [-1.0, -1, -1, 1, 1, 1]
    dense = rng.random((reso, reso, reso)) > 0.5
    grid = sparse_grid_from_dense(dense, aabb)
    rays_o, rays_d = _rays()

    t0_v, t1_v, rid_v = traverse_vdbs(
        rays_o, rays_d, grid, step_size=1e-2, cone_angle=1e-3)

    intervals, samples, _ = traverse_grids(
        rays_o, rays_d, jnp.asarray(dense)[None],
        jnp.asarray(aabb, jnp.float32)[None],
        step_size=1e-2, cone_angle=1e-3)
    v = np.asarray(samples.is_valid)
    rid_g, sid = np.nonzero(v)
    t0_g = np.asarray(intervals.vals)[rid_g, sid]

    np.testing.assert_array_equal(np.asarray(rid_v), rid_g)
    np.testing.assert_allclose(np.asarray(t0_v), t0_g, atol=1e-6)


def test_ijk_roundtrip():
    rng = np.random.default_rng(1)
    reso = 16
    ijk = rng.integers(0, reso, (50, 3))
    grid = sparse_grid_from_ijk(ijk, reso, [-1, -1, -1, 1, 1, 1])
    dense = np.zeros((reso,) * 3, bool)
    dense[ijk[:, 0], ijk[:, 1], ijk[:, 2]] = True
    np.testing.assert_array_equal(np.asarray(grid.binaries[0]), dense)
    got = np.asarray(grid.ijk_enabled())
    want = np.stack(np.nonzero(dense), -1)
    np.testing.assert_array_equal(got, want)


def test_estimator_agreement_with_occgrid():
    """Same occ_eval_fn + same warmup update -> same enabled voxels and the
    same sampling output (reference: tests/test_vdb.py:61-135)."""
    aabb = [-1.0, -1, -1, 1, 1, 1]
    reso = 16

    def occ_eval_fn(x):
        # a fixed blob: occupied near the center
        return (jnp.linalg.norm(x, axis=-1, keepdims=True) < 0.6).astype(
            jnp.float32
        )

    occ_est = OccGridEstimator(roi_aabb=aabb, resolution=reso, levels=1, seed=7)
    sp_est = SparseGridEstimator(roi_aabb=aabb, resolution=reso, seed=7)
    occ_est.train()
    sp_est.train()
    occ_est.update_every_n_steps(0, occ_eval_fn, occ_thre=0.5)
    sp_est.update_every_n_steps(0, occ_eval_fn, occ_thre=0.5)

    b_occ = np.asarray(occ_est.binaries[0])
    b_sp = np.asarray(sp_est.binaries[0])
    # the jitter keys differ; compare against the analytic blob with a
    # one-voxel tolerance ring: strictly-inside voxels on, far voxels off
    centers = (np.stack(np.meshgrid(*[np.arange(reso)] * 3, indexing="ij"),
                        -1) + 0.5) / reso * 2.0 - 1.0
    r = np.linalg.norm(centers, axis=-1)
    vox_diag = 2.0 / reso * np.sqrt(3) / 2
    inside = r < 0.6 - vox_diag
    outside = r > 0.6 + vox_diag
    for b in (b_occ, b_sp):
        assert b[inside].all()
        assert not b[outside].any()

    # sampling agreement where the grids agree (they do on non-ring voxels;
    # make them exactly equal for the comparison)
    sp_est.grid = sparse_grid_from_dense(b_occ, aabb)
    rays_o, rays_d = _rays(seed=3)
    rid_a, t0_a, t1_a = occ_est.sampling(
        rays_o, rays_d, render_step_size=1e-2)
    rid_b, t0_b, t1_b = sp_est.sampling(
        rays_o, rays_d, render_step_size=1e-2)
    np.testing.assert_array_equal(np.asarray(rid_a), np.asarray(rid_b))
    np.testing.assert_allclose(np.asarray(t0_a), np.asarray(t0_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1_a), np.asarray(t1_b), atol=1e-6)


def test_enable_disable_only_touched():
    """VDB protocol: a sampled update flips only touched voxels."""
    aabb = [-1.0, -1, -1, 1, 1, 1]
    reso = 16
    rng = np.random.default_rng(5)
    dense = rng.random((reso,) * 3) > 0.3
    est = SparseGridEstimator(
        init_grid=sparse_grid_from_dense(dense, aabb), seed=1
    )
    est.train()
    est.occs = jnp.ones((est.grid.total_voxels,)) * 0.5
    before = np.asarray(est.binaries[0]).reshape(-1)
    # post-warmup sampled update with an all-empty eval: only the touched
    # quarter+quarter can change
    est.update_every_n_steps(
        512, lambda x: jnp.zeros((x.shape[0], 1)), occ_thre=1e-2,
        warmup_steps=256, n=16)
    after = np.asarray(est.binaries[0]).reshape(-1)
    changed = (before != after).sum()
    assert 0 < changed <= est.grid.total_voxels // 2 + 1


def test_state_dict_roundtrip():
    aabb = [-1.0, -1, -1, 1, 1, 1]
    rng = np.random.default_rng(9)
    dense = rng.random((16,) * 3) > 0.5
    est = SparseGridEstimator(init_grid=sparse_grid_from_dense(dense, aabb))
    sd = est.state_dict()
    est2 = SparseGridEstimator(roi_aabb=aabb, resolution=16)
    est2.load_state_dict(sd)
    np.testing.assert_array_equal(
        np.asarray(est.binaries), np.asarray(est2.binaries))


def test_pyramid_sampling_matches_padded():
    """The default (pyramid-driven windowed) sampling path must equal the
    exhaustive padded path exactly, including across window-budget resume
    rounds (reference contract: vdb.py:171-238 uniform_ray_samples)."""
    aabb = [-1.0, -1, -1, 1, 1, 1]
    rng = np.random.default_rng(21)
    dense = rng.random((32,) * 3) > 0.6
    est = SparseGridEstimator(
        init_grid=sparse_grid_from_dense(dense, aabb), seed=2
    )
    rays_o, rays_d = _rays(n_rays=48, seed=13)
    rid_w, t0_w, t1_w = est.sampling(
        rays_o, rays_d, render_step_size=1e-2, traversal="windowed")
    rid_p, t0_p, t1_p = est.sampling(
        rays_o, rays_d, render_step_size=1e-2, traversal="padded")
    np.testing.assert_array_equal(np.asarray(rid_w), np.asarray(rid_p))
    np.testing.assert_allclose(
        np.asarray(t0_w), np.asarray(t0_p), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t1_w), np.asarray(t1_p), atol=1e-5)


def test_pyramid_is_persistent_and_invalidates_on_grid_change():
    aabb = [-1.0, -1, -1, 1, 1, 1]
    rng = np.random.default_rng(23)
    dense = rng.random((16,) * 3) > 0.5
    est = SparseGridEstimator(
        init_grid=sparse_grid_from_dense(dense, aabb))
    p1 = est.pyramid()
    assert est.pyramid() is p1  # cached: no re-pooling per call
    c1 = est._coarse_levels(4, 1)
    assert est._coarse_levels(4, 1)[0] is c1[0]
    est.grid = sparse_grid_from_dense(~dense, aabb)
    p2 = est.pyramid()
    assert p2 is not p1  # grid change invalidates
    assert bool(np.asarray(p2[0]).any())


def test_n3tree_descent_sampling_exact():
    """Pyramid-descent (octree-walk) sampling prunes with MULTIPLE pyramid
    levels yet stays exact (every level conservative -> AND conservative);
    reference octree traversal role: n3tree.py:160-170."""
    aabb = [-1.0, -1, -1, 1, 1, 1]
    rng = np.random.default_rng(29)
    # sparse blobby occupancy: descent actually prunes here
    dense = rng.random((32,) * 3) > 0.92
    n3 = N3TreeEstimator(
        init_grid=sparse_grid_from_dense(dense, aabb), seed=4
    )
    # the descent must consult >1 pyramid level
    assert len(n3._coarse_levels(4, 1)) >= 2
    rays_o, rays_d = _rays(n_rays=48, seed=17)
    rid_w, t0_w, t1_w = n3.sampling(
        rays_o, rays_d, render_step_size=1e-2, traversal="windowed")
    rid_p, t0_p, t1_p = n3.sampling(
        rays_o, rays_d, render_step_size=1e-2, traversal="padded")
    np.testing.assert_array_equal(np.asarray(rid_w), np.asarray(rid_p))
    np.testing.assert_allclose(
        np.asarray(t0_w), np.asarray(t0_p), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t1_w), np.asarray(t1_p), atol=1e-5)


def test_mip_pyramid_is_conservative():
    rng = np.random.default_rng(11)
    dense = rng.random((16,) * 3) > 0.8
    grid = sparse_grid_from_dense(dense, [-1, -1, -1, 1, 1, 1])
    pyr = grid.mip_pyramid(3)
    assert [p.shape[1] for p in pyr] == [16, 8, 4]
    for lvl in (1, 2):
        p = np.asarray(pyr[lvl][0])
        base = np.asarray(pyr[0][0])
        f = 2 ** lvl
        for i in range(p.shape[0]):
            for j in range(p.shape[1]):
                for k in range(p.shape[2]):
                    blk = base[i*f:(i+1)*f, j*f:(j+1)*f, k*f:(k+1)*f]
                    assert p[i, j, k] == blk.any()
