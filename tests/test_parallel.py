"""Data-parallel layer tests on the 8-virtual-device CPU mesh.

The reference has no distributed layer at all (SURVEY.md §2.12); this is the
repo's own bar: the DP step must (a) run on a real multi-device mesh and
(b) produce the same update as the single-chip step on the same global batch,
because it runs the *same* trainer body (``NGPOccTrainer._step_body``) per
shard with a globally-normalized loss and psum-ed gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu.models.cp_field import CPRadianceField
from nerfacc_tpu.parallel import make_dp_train_step, make_mesh, shard_batch
from nerfacc_tpu.trainers import NGPOccTrainer


def _make_trainer(**kw):
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    field = CPRadianceField(
        aabb=tuple(aabb), resolutions=(16, 64), ranks=(8, 8)
    )
    kw.setdefault("grid_resolution", 16)
    kw.setdefault("render_step_size", 2e-2)
    kw.setdefault("sample_budget", 4096)
    kw.setdefault("max_samples_per_ray", 256)
    kw.setdefault("warmup_steps", 4)
    kw.setdefault("update_interval", 2)
    return NGPOccTrainer(field=field, aabb=aabb, **kw)


def _make_batch(n_rays):
    key = jax.random.PRNGKey(0)
    rays_o = jax.random.normal(key, (n_rays, 3)) * 0.1 + jnp.array(
        [3.0, 0.0, 0.0]
    )
    rays_d = -rays_o / jnp.linalg.norm(rays_o, axis=-1, keepdims=True)
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (n_rays, 3))
    return {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "rgb": rgb,
        "color_bkgd": jnp.ones((3,)),
    }


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force an 8-device mesh"
    return make_mesh(8)


def test_dp_matches_single_device(mesh8):
    """1-device vs 8-device step: same global batch -> same loss and params
    (stratified jitter off so sampling is deterministic; budget large enough
    that neither the global nor the per-shard compaction truncates — the
    trainer's sample_budget is per-device under DP)."""
    batch = _make_batch(64)

    t_single = _make_trainer(stratified=False, sample_budget=16384)
    s_single = t_single.init_state()
    s_single, aux_single = t_single.train_step(s_single, batch)

    t_dp = _make_trainer(stratified=False, sample_budget=16384)
    s_dp = t_dp.init_state()
    step_fn = make_dp_train_step(t_dp, mesh8)
    s_dp, aux_dp = step_fn(s_dp, shard_batch(dict(batch), mesh8))

    np.testing.assert_allclose(
        float(aux_dp["loss"]), float(aux_single["loss"]), rtol=1e-5
    )
    assert int(aux_dp["n_rendering_samples"]) == int(
        aux_single["n_rendering_samples"]
    )
    assert int(aux_dp["n_rays_ok"]) == int(aux_single["n_rays_ok"])

    flat_s, _ = jax.tree_util.tree_flatten(s_single.params)
    flat_d, _ = jax.tree_util.tree_flatten(s_dp.params)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )
    # occupancy grids updated identically (replicated key)
    np.testing.assert_array_equal(
        np.asarray(s_single.occ_state.binaries),
        np.asarray(s_dp.occ_state.binaries),
    )


def _make_tp_trainer(model_axis="model", **kw):
    from nerfacc_tpu.parallel import make_tp_field

    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    field = make_tp_field(
        CPRadianceField(aabb=tuple(aabb), resolutions=(16, 64), ranks=(8, 8)),
        model_axis,
    )
    kw.setdefault("grid_resolution", 16)
    kw.setdefault("render_step_size", 2e-2)
    kw.setdefault("sample_budget", 4096)
    kw.setdefault("max_samples_per_ray", 256)
    kw.setdefault("warmup_steps", 4)
    kw.setdefault("update_interval", 2)
    return NGPOccTrainer(field=field, aabb=aabb, **kw)


def test_tp_step_matches_single_device():
    """(data=2, model=2) TP+DP step == single-chip step: same loss, same
    updated params (line tables sharded over rank; first base-MLP weight
    row-sharded in shard-major order via tp_w1_permutation)."""
    from nerfacc_tpu.parallel import (
        make_mesh_2d,
        make_tp_train_step,
        permute_w1,
        tp_w1_permutation,
    )

    batch = _make_batch(64)
    t_single = _make_trainer(stratified=False, sample_budget=16384)
    s_single = t_single.init_state()
    s_single, aux_single = t_single.train_step(s_single, batch)
    s_single, aux_single2 = t_single.train_step(s_single, batch)

    mesh = make_mesh_2d(2, 2)
    t_tp = _make_tp_trainer(stratified=False, sample_budget=16384)
    perm = tp_w1_permutation(t_tp.field.ranks, 2)
    s_tp = t_tp.init_state()
    s_tp = s_tp._replace(params=permute_w1(s_tp.params, perm))
    step_fn, shard_state, shard_tp_batch = make_tp_train_step(t_tp, mesh)
    s_tp = shard_state(s_tp)
    # two steps so the occupancy-update branch (model-axis psum under
    # lax.cond) executes on the mesh too
    s_tp, aux_tp = step_fn(s_tp, shard_tp_batch(dict(batch)))
    s_tp, aux_tp2 = step_fn(s_tp, shard_tp_batch(dict(batch)))

    np.testing.assert_allclose(
        float(aux_tp["loss"]), float(aux_single["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(aux_tp2["loss"]), float(aux_single2["loss"]), rtol=1e-4
    )
    assert int(aux_tp["n_rendering_samples"]) == int(
        aux_single["n_rendering_samples"]
    )

    # updated params agree: W1 modulo the shard-major row permutation,
    # everything else directly
    w1_single = np.asarray(s_single.params["mlp_base"][0])
    w1_tp = np.asarray(s_tp.params["mlp_base"][0])
    np.testing.assert_allclose(w1_tp, w1_single[perm], rtol=2e-4, atol=2e-5)
    for a, b in zip(
        s_single.params["encoder"]["lines"], s_tp.params["encoder"]["lines"]
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    for a, b in zip(s_single.params["mlp_head"], s_tp.params["mlp_head"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    np.testing.assert_array_equal(
        np.asarray(s_single.occ_state.binaries),
        np.asarray(s_tp.occ_state.binaries),
    )


def test_tp_sharding_is_real():
    """The compiled TP step must actually shard the line tables and W1 —
    guard against silent full replication."""
    from nerfacc_tpu.parallel import (
        make_mesh_2d,
        make_tp_train_step,
        permute_w1,
        tp_w1_permutation,
    )

    mesh = make_mesh_2d(2, 2)
    t_tp = _make_tp_trainer(stratified=False)
    perm = tp_w1_permutation(t_tp.field.ranks, 2)
    s_tp = t_tp.init_state()
    s_tp = s_tp._replace(params=permute_w1(s_tp.params, perm))
    step_fn, shard_state, shard_tp_batch = make_tp_train_step(t_tp, mesh)
    s_tp = shard_state(s_tp)
    line0 = s_tp.params["encoder"]["lines"][0]
    w1 = s_tp.params["mlp_base"][0]
    assert line0.addressable_shards[0].data.shape[-1] == line0.shape[-1] // 2
    assert w1.addressable_shards[0].data.shape[0] == w1.shape[0] // 2
    s_tp, aux = step_fn(s_tp, shard_tp_batch(_make_batch(64)))
    out_line0 = s_tp.params["encoder"]["lines"][0]
    assert (
        out_line0.addressable_shards[0].data.shape[-1]
        == out_line0.shape[-1] // 2
    )


def test_dp_prop_step_matches_single_device(mesh8):
    """Proposal-network trainer under DP: same global batch -> same loss and
    params as the single-chip step (stratified off; every loss term is a
    mean over equal ray shards, so pmean-ed grads equal the global grad)."""
    import optax  # noqa: F401  (trainer dependency)

    from nerfacc_tpu.models.cp_field import CPDensityField
    from nerfacc_tpu.parallel import make_dp_prop_step
    from nerfacc_tpu.trainers import NGPPropTrainer

    aabb = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)

    def make_trainer():
        return NGPPropTrainer(
            field=CPRadianceField(
                aabb=aabb, resolutions=(16, 64), ranks=(8, 8)
            ),
            prop_fields=[
                CPDensityField(
                    aabb=aabb, resolutions=(16,), ranks=(8,), hidden_dim=16
                )
            ],
            prop_samples=[32],
            num_samples=16,
            near_plane=2.0,
            far_plane=6.0,
            sampling_type="uniform",
            stratified=False,
        )

    batch = _make_batch(64)

    t_single = make_trainer()
    s_single = t_single.init_state()
    s_single, aux_single = t_single.train_step(
        s_single, batch, requires_grad=True
    )

    t_dp = make_trainer()
    s_dp = t_dp.init_state()
    step_fn = make_dp_prop_step(t_dp, mesh8)
    s_dp, aux_dp = step_fn(
        s_dp, shard_batch(dict(batch), mesh8), requires_grad=True
    )

    np.testing.assert_allclose(
        float(aux_dp["loss"]), float(aux_single["loss"]), rtol=1e-5
    )
    flat_s, _ = jax.tree_util.tree_flatten(s_single.params)
    flat_d, _ = jax.tree_util.tree_flatten(s_dp.params)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )


def test_dp_multi_step_trains(mesh8):
    """A few DP steps must run on the real 8-device mesh (finite loss,
    nonzero samples, occ-update branch on step 2 — absorbing the former
    test_dp_step_runs, which duplicated the compile) and reduce the loss
    on a fittable constant target."""
    trainer = _make_trainer(stratified=False)
    state = trainer.init_state()
    step_fn = make_dp_train_step(trainer, mesh8)
    batch = shard_batch(_make_batch(8 * 8), mesh8)
    losses = []
    for _ in range(6):
        state, aux = step_fn(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert int(aux["n_rendering_samples"]) > 0
    assert int(state.step) == 6
    assert losses[-1] < losses[0], losses
