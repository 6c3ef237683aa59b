"""Rendering tests (ported from reference tests/test_rendering.py): golden
visibility/weights, density-vs-alpha consistency, golden gradients across all
four API variants, scatter-accumulate semantics incl. the empty ray, and the
padded/masked layout equivalence (TPU-native extension)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import (
    accumulate_along_rays,
    render_transmittance_from_density,
    render_visibility_from_alpha,
    render_weight_from_alpha,
    render_weight_from_density,
    rendering,
)

RAY_INDICES = jnp.array([0, 2, 2, 2, 2], dtype=jnp.int32)
PACKED_INFO = jnp.array([[0, 1], [1, 0], [1, 4]])


def test_render_visibility():
    alphas = jnp.array([0.4, 0.3, 0.8, 0.8, 0.5])
    # transmittance: [1.0, 1.0, 0.7, 0.14, 0.028]
    vis = render_visibility_from_alpha(
        alphas, ray_indices=RAY_INDICES, early_stop_eps=0.03, alpha_thre=0.0
    )
    np.testing.assert_array_equal(vis, [True, True, True, True, False])

    vis = render_visibility_from_alpha(
        alphas, ray_indices=RAY_INDICES, early_stop_eps=0.05, alpha_thre=0.35
    )
    np.testing.assert_array_equal(vis, [True, False, True, True, False])


def test_render_weight_from_alpha():
    alphas = jnp.array([0.4, 0.3, 0.8, 0.8, 0.5])
    weights, _ = render_weight_from_alpha(
        alphas, ray_indices=RAY_INDICES, n_rays=3
    )
    np.testing.assert_allclose(
        weights,
        [1.0 * 0.4, 1.0 * 0.3, 0.7 * 0.8, 0.14 * 0.8, 0.028 * 0.5],
        rtol=1e-5,
    )


def test_render_weight_from_density():
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    sigmas = jax.random.uniform(k1, (5,))
    t_starts = jax.random.uniform(k2, (5,))
    t_ends = jax.random.uniform(k3, (5,)) + 1.0
    alphas = 1.0 - jnp.exp(-sigmas * (t_ends - t_starts))

    weights, _, _ = render_weight_from_density(
        t_starts, t_ends, sigmas, ray_indices=RAY_INDICES, n_rays=3
    )
    weights_tgt, _ = render_weight_from_alpha(
        alphas, ray_indices=RAY_INDICES, n_rays=3
    )
    np.testing.assert_allclose(weights, weights_tgt, rtol=1e-5, atol=1e-6)


def test_accumulate_along_rays():
    weights = jnp.array([0.4, 0.3, 0.8, 0.8, 0.5])
    values = jax.random.uniform(jax.random.PRNGKey(0), (5, 2))

    ray_values = accumulate_along_rays(
        weights, values=values, ray_indices=RAY_INDICES, n_rays=3
    )
    assert ray_values.shape == (3, 2)
    np.testing.assert_allclose(
        ray_values[0], weights[0, None] * values[0], rtol=1e-6
    )
    assert (ray_values[1] == 0).all()  # empty ray
    np.testing.assert_allclose(
        ray_values[2],
        jnp.sum(weights[1:, None] * values[1:], axis=0),
        rtol=1e-5,
    )


def test_grads():
    """Golden weights and input gradients across the four API variants
    (reference tests/test_rendering.py:110-193)."""
    sigmas = jnp.array([0.4, 0.8, 0.1, 0.8, 0.1])
    t_starts = jax.random.uniform(jax.random.PRNGKey(1), (5,))
    t_ends = t_starts + 1.0

    weights_ref = np.array([0.3297, 0.5507, 0.0428, 0.2239, 0.0174])
    sigmas_grad_ref = np.array([0.6703, 0.1653, 0.1653, 0.1653, 0.1653])

    def check(fn):
        w = fn(sigmas)
        g = jax.grad(lambda s: fn(s).sum())(sigmas)
        np.testing.assert_allclose(w, weights_ref, atol=1e-4)
        np.testing.assert_allclose(g, sigmas_grad_ref, atol=1e-4)

    check(
        lambda s: render_transmittance_from_density(
            t_starts, t_ends, s, ray_indices=RAY_INDICES, n_rays=3
        )[0]
        * (1.0 - jnp.exp(-s * (t_ends - t_starts)))
    )
    check(
        lambda s: render_transmittance_from_density(
            t_starts, t_ends, s, packed_info=PACKED_INFO, n_rays=3
        )[0]
        * (1.0 - jnp.exp(-s * (t_ends - t_starts)))
    )
    check(
        lambda s: render_weight_from_density(
            t_starts, t_ends, s, ray_indices=RAY_INDICES, n_rays=3
        )[0]
    )
    check(
        lambda s: render_weight_from_density(
            t_starts, t_ends, s, packed_info=PACKED_INFO, n_rays=3
        )[0]
    )
    check(
        lambda s: render_weight_from_alpha(
            1.0 - jnp.exp(-s * (t_ends - t_starts)),
            ray_indices=RAY_INDICES,
            n_rays=3,
        )[0]
    )
    check(
        lambda s: render_weight_from_alpha(
            1.0 - jnp.exp(-s * (t_ends - t_starts)),
            packed_info=PACKED_INFO,
            n_rays=3,
        )[0]
    )


def test_rendering_flat():
    def rgb_sigma_fn(t_starts, t_ends, ray_indices):
        return jnp.stack([t_starts] * 3, axis=-1), t_starts

    t_starts = jax.random.uniform(jax.random.PRNGKey(2), (5,))
    t_ends = t_starts + 1.0
    colors, opacities, depths, extras = rendering(
        t_starts,
        t_ends,
        ray_indices=RAY_INDICES,
        n_rays=3,
        rgb_sigma_fn=rgb_sigma_fn,
    )
    assert colors.shape == (3, 3)
    assert opacities.shape == (3, 1)
    assert depths.shape == (3, 1)
    assert set(extras) == {"weights", "alphas", "trans", "sigmas", "rgbs"}


def test_padded_vs_flattened_equivalence():
    """TPU-native padded/masked layout must agree with the flattened layout."""
    key = jax.random.PRNGKey(7)
    n_rays, n_samples = 4, 8
    k1, k2, k3 = jax.random.split(key, 3)
    sigmas = jax.random.uniform(k1, (n_rays, n_samples)) * 3
    t_starts = jnp.cumsum(
        jax.random.uniform(k2, (n_rays, n_samples)), axis=-1
    )
    t_ends = t_starts + 0.1
    masks = jax.random.uniform(k3, (n_rays, n_samples)) > 0.4

    w_pad, tr_pad, al_pad = render_weight_from_density(
        t_starts, t_ends, sigmas, masks=masks
    )

    m = np.asarray(masks)
    ray_ids = jnp.asarray(np.nonzero(m.reshape(-1))[0] // n_samples)
    flat = lambda x: jnp.asarray(np.asarray(x)[m])
    w_flat, tr_flat, al_flat = render_weight_from_density(
        flat(t_starts), flat(t_ends), flat(sigmas),
        ray_indices=ray_ids, n_rays=n_rays,
    )
    np.testing.assert_allclose(np.asarray(w_pad)[m], w_flat, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tr_pad)[m], tr_flat, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(al_pad)[m], al_flat, rtol=1e-5)
    # masked-out samples contribute zero weight
    assert (np.asarray(w_pad)[~m] == 0).all()

    acc_pad = accumulate_along_rays(w_pad, values=t_starts[..., None])
    acc_flat = accumulate_along_rays(
        w_flat, values=flat(t_starts)[:, None], ray_indices=ray_ids, n_rays=n_rays
    )
    np.testing.assert_allclose(acc_pad, acc_flat, rtol=1e-5, atol=1e-6)


def test_extreme_density_weights_bounded():
    """Hard-surface densities (up to the trunc_exp cap, 1e13) must not
    corrupt transmittance: the sorted-segment exclusive sum rides one GLOBAL
    f32 cumsum, and uncapped sigma*dt (~5e10/sample) used to inflate its
    rounding error to O(1)+ — trans > 1, per-ray weight sums past 1, and the
    round-5 opaque eval break (scripts/diag_eval_break.py).  The optical-
    depth saturation in render_transmittance_from_density keeps the result
    within fp noise of the float64 per-segment oracle."""
    rng = np.random.default_rng(0)
    n_rays, total = 64, 1 << 14
    counts = rng.multinomial(total - n_rays, np.ones(n_rays) / n_rays) + 1
    ray_ids = np.repeat(np.arange(n_rays), counts)
    dt = rng.uniform(4e-3, 6e-3, total)
    t0 = np.concatenate(
        [np.cumsum(dt[ray_ids == r]) for r in range(n_rays)]
    )
    t1 = t0 + dt
    # log-uniform densities spanning soft to the trunc_exp forward cap
    sigmas = 10.0 ** rng.uniform(-1, 13, total)

    seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    seg_ends = (np.cumsum(counts) - 1).astype(np.int32)
    w, tr, al = render_weight_from_density(
        jnp.asarray(t0, jnp.float32), jnp.asarray(t1, jnp.float32),
        jnp.asarray(sigmas, jnp.float32),
        ray_indices=jnp.asarray(ray_ids, jnp.int32), n_rays=n_rays,
        indices_sorted=True,
        seg_starts=jnp.asarray(seg_starts), seg_ends=jnp.asarray(seg_ends),
    )
    w, tr, al = np.asarray(w), np.asarray(tr), np.asarray(al)
    assert np.isfinite(w).all() and np.isfinite(tr).all()
    assert tr.max() <= 1.0 + 1e-3
    assert w.min() >= -1e-3
    wsums = np.zeros(n_rays)
    np.add.at(wsums, ray_ids, w)
    # per-ray weight sums bounded by 1 within the block-decomposed
    # exclusive-sum error (~eps * block_sum, <= ~1e-3; was 0.01+ with the
    # global-cumsum forward)
    assert wsums.max() <= 1.0 + 1e-3

    # float64 per-segment oracle
    sdt = np.minimum(sigmas * dt, 40.0)
    excl = np.concatenate(
        [np.cumsum(sdt[ray_ids == r]) - sdt[ray_ids == r]
         for r in range(n_rays)]
    )
    tr_ref = np.exp(-excl)
    al_ref = 1.0 - np.exp(-sdt)
    np.testing.assert_allclose(tr, tr_ref, atol=1e-3)
    np.testing.assert_allclose(w, tr_ref * al_ref, atol=1e-3)
