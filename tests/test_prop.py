"""PropNetEstimator wrapper API parity tests."""
import jax
import jax.numpy as jnp
import numpy as np


def test_update_every_n_steps_takes_optimizer_step():
    """Wrapper parity with reference prop_net.py:156-193: the interlevel loss
    drives the estimator's own optimizer over the proposal params."""
    import optax

    from nerfacc_tpu.estimators.prop_net import PropNetEstimator
    from nerfacc_tpu.models.cp_field import CPDensityField

    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    pf = CPDensityField(aabb=aabb, resolutions=(8,), ranks=(4,), hidden_dim=16)
    params0 = pf.init(jax.random.PRNGKey(0))
    n_rays, num_samples = 8, 16
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.normal(size=(n_rays, 3)), jnp.float32) * 0.1
    rays_d = jnp.asarray(rng.normal(size=(n_rays, 3)), jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    def builder(params):
        def fn(t0, t1):
            t_mid = 0.5 * (t0 + t1)
            pos = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
            return pf(params, pos.reshape(-1, 3)).reshape(t0.shape)
        return [fn]

    est = PropNetEstimator(
        optimizer=optax.adam(1e-2), params=params0, sigma_fns_builder=builder
    )
    t0s, t1s = est.sampling(
        prop_samples=[32], num_samples=num_samples, n_rays=n_rays,
        near_plane=0.1, far_plane=3.0, sampling_type="uniform",
        requires_grad=True)
    assert t0s.shape == (n_rays, num_samples)
    trans = jnp.linspace(1.0, 0.1, num_samples)[None, :].repeat(n_rays, 0)
    loss = est.update_every_n_steps(trans, requires_grad=True, loss_scaler=8.0)
    assert np.isfinite(loss)
    # params actually moved
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b[0] - b[1]))),
        jax.tree_util.tree_map(lambda a, b: (a, b), params0, est.params),
        0.0,
    )
    assert diff > 0.0
    # requires_grad=False path: no-op, empty cache
    assert est.update_every_n_steps(trans, requires_grad=False) == 0.0
    assert est.prop_cache == []
