"""Estimator tests: occupancy-grid EMA updates (warmup + sampled branches),
padded sampling with visibility filtering, and proposal-network sampling
(shape/cache/loss contracts per reference estimators/)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.estimators.occ_grid import (
    init_occ_grid,
    sampling_padded,
    update_occ_grid,
)
from nerfacc_tpu.estimators.prop_net import (
    propnet_loss,
    propnet_sampling,
)

AABB = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])


def sphere_occ_fn(x):
    """Occupied inside a radius-0.5 sphere."""
    return (jnp.linalg.norm(x, axis=-1) < 0.5).astype(jnp.float32)


def test_occ_grid_warmup_update_marks_sphere():
    state = init_occ_grid(AABB, resolution=16, levels=1)
    key = jax.random.PRNGKey(0)
    for step in range(3):
        key, sub = jax.random.split(key)
        state = update_occ_grid(
            state, sub, jnp.asarray(step), sphere_occ_fn, warmup_steps=10
        )
    binaries = np.asarray(state.binaries[0])
    # center occupied, corners empty
    assert binaries[8, 8, 8]
    assert not binaries[0, 0, 0]
    assert not binaries[15, 15, 0]
    frac = binaries.mean()
    # sphere of r=0.5 in [-1,1]^3 fills ~6.5% of the volume
    assert 0.02 < frac < 0.25, frac


def test_occ_grid_sampled_update_decays_stale_cells():
    state = init_occ_grid(AABB, resolution=16, levels=1)
    key = jax.random.PRNGKey(0)
    # bootstrap with everything occupied
    state = update_occ_grid(
        state, key, jnp.asarray(0), lambda x: jnp.ones(x.shape[0]),
        warmup_steps=10,
    )
    assert np.asarray(state.binaries).mean() > 0.99
    # then many sampled-phase updates with an empty field: EMA decays the
    # touched cells (each update touches ~half the cells; with decay 0.5 a
    # cell needs ~7 touches to fall below the 1e-2 threshold).  One jitted
    # program re-dispatched per step — per-call retracing made this the
    # slowest test of the suite (28 s) at identical coverage.
    upd = jax.jit(
        lambda st, k, step: update_occ_grid(
            st, k, step, lambda x: jnp.zeros(x.shape[0]),
            warmup_steps=10, ema_decay=0.5,
        )
    )
    for step in range(100, 124):
        key, sub = jax.random.split(key)
        state = upd(state, sub, jnp.asarray(step))
    assert np.asarray(state.binaries).mean() < 0.5


def test_occ_grid_striped_dense_update_covers_all_cells():
    """dense_stripes=S: each post-warmup update refreshes one rotating 1/S
    stripe; after S updates every cell has been refreshed, and the result
    matches a full dense refresh bit-for-bit for a deterministic field."""
    key = jax.random.PRNGKey(0)
    S, interval = 4, 16

    # piecewise-constant on voxels (boundaries at 0 align with voxel edges
    # at every level), so the in-voxel query jitter cannot change the value
    # between the two paths' different RNG draws
    def octant_occ_fn(x):
        return jnp.all(x > 0.0, axis=-1).astype(jnp.float32)

    # full dense refresh at a post-warmup step
    ref = init_occ_grid(AABB, resolution=16, levels=2)
    ref = update_occ_grid(
        ref, key, jnp.asarray(1000), octant_occ_fn, warmup_steps=10, dense=True
    )

    # striped: S consecutive update steps cycle through all stripes.
    st = init_occ_grid(AABB, resolution=16, levels=2)
    upd = jax.jit(
        lambda s, k, step: update_occ_grid(
            s, k, step, octant_occ_fn, warmup_steps=10, dense=True,
            dense_stripes=S, update_interval=interval,
        )
    )
    for i in range(S):
        key, sub = jax.random.split(key)
        st = upd(st, sub, jnp.asarray(1000 + i * interval))
    np.testing.assert_array_equal(
        np.asarray(st.binaries), np.asarray(ref.binaries)
    )
    # occs agree too: one EMA-max touch per cell from zero in both paths
    np.testing.assert_allclose(
        np.asarray(st.occs), np.asarray(ref.occs), atol=1e-7
    )

    # during warmup the striped config still refreshes the FULL grid
    w = init_occ_grid(AABB, resolution=16, levels=2)
    w = update_occ_grid(
        w, key, jnp.asarray(0), octant_occ_fn, warmup_steps=10, dense=True,
        dense_stripes=S, update_interval=interval,
    )
    np.testing.assert_array_equal(
        np.asarray(w.binaries), np.asarray(ref.binaries)
    )


def test_occ_grid_striped_decay_matches_dense_timescale():
    """Multi-round striped refresh: a cell is revisited once per S updates
    with decay^S applied, so after S updates of an empty field the EMA
    matches S dense updates (decay^S per cell) — stale cells die at the
    same per-step rate under both paths."""
    key = jax.random.PRNGKey(3)
    S, interval, decay = 4, 16, 0.5

    def ones(x):
        return jnp.ones(x.shape[0])

    def zeros(x):
        return jnp.zeros(x.shape[0])

    def run(stripes):
        st = init_occ_grid(AABB, resolution=16, levels=1)
        # bootstrap: one full refresh with an all-occupied field -> occs=1
        st = update_occ_grid(
            st, key, jnp.asarray(0), ones, warmup_steps=10, dense=True
        )
        upd = jax.jit(
            lambda s, k, step: update_occ_grid(
                s, k, step, zeros, warmup_steps=10, dense=True,
                dense_stripes=stripes, update_interval=interval,
                ema_decay=decay,
            )
        )
        k2 = key
        for i in range(S):
            k2, sub = jax.random.split(k2)
            st = upd(st, sub, jnp.asarray(1000 + i * interval))
        return np.asarray(st.occs)

    dense_occs = run(stripes=1)
    striped_occs = run(stripes=S)
    np.testing.assert_allclose(dense_occs, decay**S, atol=1e-7)
    np.testing.assert_allclose(striped_occs, dense_occs, atol=1e-7)


def test_sampling_padded_visibility_filter():
    state = init_occ_grid(AABB, resolution=16, levels=1)
    state = dataclasses.replace(
        state, binaries=jnp.ones_like(state.binaries)
    )
    rays_o = jnp.array([[0.0, 0.0, -2.0]] * 4)
    rays_d = jnp.array([[0.0, 0.0, 1.0]] * 4)

    res_all = sampling_padded(
        state, rays_o, rays_d, render_step_size=0.05, max_samples=128
    )
    n_all = int(res_all.valid.sum())
    assert n_all > 0

    # a sigma_fn returning huge density -> transmittance collapses after the
    # first few samples; the visibility filter must prune the occluded tail
    def sigma_fn(t0, t1, rid):
        return jnp.full(t0.shape, 100.0)

    res_vis = sampling_padded(
        state,
        rays_o,
        rays_d,
        sigma_fn=sigma_fn,
        render_step_size=0.05,
        early_stop_eps=1e-4,
        max_samples=128,
    )
    n_vis = int(res_vis.valid.sum())
    assert 0 < n_vis < n_all / 2, (n_vis, n_all)


def test_sampling_padded_stratified_jitter():
    state = init_occ_grid(AABB, resolution=8, levels=1)
    state = dataclasses.replace(state, binaries=jnp.ones_like(state.binaries))
    rays_o = jnp.array([[0.0, 0.0, -2.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    r1 = sampling_padded(
        state, rays_o, rays_d, render_step_size=0.05, max_samples=64,
        stratified=True, key=jax.random.PRNGKey(1),
    )
    r2 = sampling_padded(
        state, rays_o, rays_d, render_step_size=0.05, max_samples=64,
        stratified=True, key=jax.random.PRNGKey(2),
    )
    assert not np.allclose(np.asarray(r1.t_starts), np.asarray(r2.t_starts))


def test_propnet_sampling_shapes_and_loss():
    n_rays, num_samples = 8, 16

    def prop_fn(t0, t1):
        return jnp.ones_like(t0) * 0.5

    t0, t1, cache = propnet_sampling(
        [prop_fn, prop_fn],
        [32, 16],
        num_samples,
        n_rays,
        near_plane=0.2,
        far_plane=10.0,
        sampling_type="lindisp",
        requires_grad=True,
    )
    assert t0.shape == (n_rays, num_samples)
    assert t1.shape == (n_rays, num_samples)
    assert (np.asarray(t1) >= np.asarray(t0) - 1e-6).all()
    assert (np.asarray(t0) >= 0.2 - 1e-5).all()
    assert len(cache) == 3  # two proposal levels + final

    trans = jnp.linspace(1.0, 0.1, num_samples)[None].repeat(n_rays, 0)
    loss = propnet_loss(cache, trans, loss_scaler=4.0)
    assert np.isfinite(float(loss))

    # without requires_grad, the cache stays empty
    _, _, cache2 = propnet_sampling(
        [prop_fn], [8], num_samples, n_rays, 0.2, 10.0, "uniform"
    )
    assert cache2 == []
    assert float(propnet_loss(cache2, trans)) == 0.0


def test_propnet_uniform_spacing():
    """With constant density, uniform sampling yields ~even spacing."""

    def prop_fn(t0, t1):
        return jnp.zeros_like(t0)

    t0, t1, _ = propnet_sampling(
        [prop_fn], [16], 8, 4, near_plane=1.0, far_plane=2.0,
        sampling_type="uniform",
    )
    widths = np.asarray(t1 - t0)
    np.testing.assert_allclose(widths, widths.mean(), rtol=0.2)


def test_occ_grid_update_eval_chunk_invariant():
    """Chunking the occupancy-refresh field evals (eval_chunk — the bound
    NGP-family fields advertise via max_eval_chunk to avoid tile-padded
    OOM) must not change the resulting grid."""
    key = jax.random.PRNGKey(3)
    ref = init_occ_grid(AABB, resolution=16, levels=1)
    chunked = init_occ_grid(AABB, resolution=16, levels=1)
    for step in [0, 300]:  # warmup (dense) + post-warmup (sampled) paths
        key, sub = jax.random.split(key)
        ref = update_occ_grid(
            ref, sub, jnp.asarray(step), sphere_occ_fn, warmup_steps=10
        )
        chunked = update_occ_grid(
            chunked, sub, jnp.asarray(step), sphere_occ_fn,
            warmup_steps=10, eval_chunk=512,
        )
    np.testing.assert_allclose(
        np.asarray(ref.occs), np.asarray(chunked.occs), atol=1e-6
    )
    assert bool((ref.binaries == chunked.binaries).all())
