"""Device-side ray sampler vs the host loaders' batch math.

The sampler must reproduce the host ``__getitem__`` pipeline exactly for
the same (image_id, x, y) pixels: RGBA fetch, background compositing, and
pinhole ray directions (reference loaders draw batches on-GPU with the same
structure: examples/datasets/nerf_synthetic.py:104-160).
"""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.data import DeviceRaySampler, ProceduralSceneLoader


def _loader():
    return ProceduralSceneLoader(
        split="train", num_rays=64, width=32, height=24, n_train=3, seed=0
    )


def test_rays_match_host_loader():
    ds = _loader()
    sampler = DeviceRaySampler.from_loader(ds, num_rays=64)

    rng = np.random.default_rng(1)
    image_id = rng.integers(0, len(ds.images), size=(64,))
    x = rng.integers(0, ds.WIDTH, size=(64,))
    y = rng.integers(0, ds.HEIGHT, size=(64,))

    o_host, d_host = ds._rays_for_pixels(image_id, x, y)
    o_dev, d_dev = sampler._rays(
        sampler.arrays, jnp.asarray(image_id), jnp.asarray(x), jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(o_dev), o_host, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_dev), d_host, atol=1e-6)


def test_pixels_match_host_compositing():
    ds = _loader()
    sampler = DeviceRaySampler.from_loader(ds, num_rays=64)
    rng = np.random.default_rng(2)
    image_id = rng.integers(0, len(ds.images), size=(64,))
    x = rng.integers(0, ds.WIDTH, size=(64,))
    y = rng.integers(0, ds.HEIGHT, size=(64,))

    rgba_host = ds.images[image_id, y, x].astype(np.float32) / 255.0
    bkgd = np.ones(3, np.float32)
    rgb_host = rgba_host[:, :3] * rgba_host[:, 3:] + bkgd * (
        1.0 - rgba_host[:, 3:]
    )

    flat = (image_id * sampler.height + y) * sampler.width + x
    rgba_dev = np.asarray(
        jnp.take(sampler.arrays["pixels"], jnp.asarray(flat), axis=0)
    ).astype(np.float32) / 255.0
    rgb_dev = rgba_dev[:, :3] * rgba_dev[:, 3:] + bkgd * (
        1.0 - rgba_dev[:, 3:]
    )
    np.testing.assert_allclose(rgb_dev, rgb_host, atol=1e-6)


def test_sample_batch_shapes_and_ranges():
    ds = _loader()
    sampler = DeviceRaySampler.from_loader(ds, num_rays=128)
    batch = jax.jit(sampler.sample)(sampler.arrays, jax.random.PRNGKey(0))
    assert batch["rgb"].shape == (128, 3)
    assert batch["rays_o"].shape == (128, 3)
    assert batch["rays_d"].shape == (128, 3)
    assert batch["color_bkgd"].shape == (3,)
    norms = np.linalg.norm(np.asarray(batch["rays_d"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert np.all(np.asarray(batch["rgb"]) >= 0.0)
    assert np.all(np.asarray(batch["rgb"]) <= 1.0)


def test_occ_trainer_steps_sampled_matches_structure():
    from nerfacc_tpu.models.cp_field import CPRadianceField
    from nerfacc_tpu.trainers import NGPOccTrainer

    ds = _loader()
    sampler = DeviceRaySampler.from_loader(ds, num_rays=32)
    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    trainer = NGPOccTrainer(
        field=CPRadianceField(aabb=tuple(aabb), resolutions=(16,), ranks=(8,),
                              hidden_dim=16),
        aabb=aabb,
        sample_budget=2048,
        max_samples_per_ray=64,
        render_step_size=5e-2,
        grid_resolution=32,
    )
    state = trainer.init_state()
    state, auxs = trainer.train_steps_sampled(state, sampler, 3)
    assert np.asarray(auxs["loss"]).shape == (3,)
    assert np.all(np.isfinite(np.asarray(auxs["loss"])))
    # bucketed resize reuses the staged tables and caches the clone
    s64 = sampler.with_num_rays(64)
    assert s64 is sampler.with_num_rays(64)
    assert s64.arrays["pixels"] is sampler.arrays["pixels"]
    state, auxs = trainer.train_steps_sampled(state, s64, 2)
    assert np.all(np.isfinite(np.asarray(auxs["loss"])))


def test_prop_trainer_steps_sampled_runs_and_learns():
    from nerfacc_tpu.models.cp_field import CPDensityField, CPRadianceField
    from nerfacc_tpu.trainers import NGPPropTrainer

    ds = _loader()
    sampler = DeviceRaySampler.from_loader(ds, num_rays=32)
    aabb = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)
    trainer = NGPPropTrainer(
        field=CPRadianceField(aabb=aabb, resolutions=(16,), ranks=(8,),
                              hidden_dim=16),
        prop_fields=[CPDensityField(aabb=aabb, resolutions=(16,), ranks=(8,),
                                    hidden_dim=16)],
        prop_samples=[16],
        num_samples=8,
        near_plane=2.0,
        far_plane=6.0,
    )
    state = trainer.init_state()
    rgs = np.array([True, False, True, False], bool)
    state, auxs = trainer.train_steps_sampled(state, sampler, rgs)
    losses = np.asarray(auxs["loss"])
    assert losses.shape == (4,)
    assert np.all(np.isfinite(losses))
    # a second fused call continues from the donated state
    state, auxs = trainer.train_steps_sampled(state, sampler, rgs)
    assert np.all(np.isfinite(np.asarray(auxs["loss"])))
