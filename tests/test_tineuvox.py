"""TiNeuVox-family field: rigid-at-init deformation, time dependence through
the deformation net and time embedding, occupancy protocol, and a
time-dependent trainer smoke run (reference benchmark family:
docs/source/examples/dynamic/tineuvox.rst)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.models import TiNeuVoxRadianceField

AABB = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)


def _small_field(**kw):
    kw.setdefault("resolutions", (8, 16))
    kw.setdefault("ranks", (4, 4))
    kw.setdefault("deform_width", 16)
    kw.setdefault("deform_depth", 2)
    return TiNeuVoxRadianceField(aabb=AABB, **kw)


def test_tineuvox_starts_rigid_but_time_conditioned():
    """The deformation output layer is ~zero-init, so Δx(t) ≈ 0 at init and
    the grid features are queried at the undeformed coordinate; density
    still varies slightly with t through the time embedding of the
    radiance net — and becomes strongly time-dependent once the deform
    net's output layer is perturbed."""
    field = _small_field()
    params = field.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1.0, 1.0, (32, 3)), jnp.float32
    )
    t0, t1 = jnp.zeros((32, 1)), jnp.full((32, 1), 0.8)

    # Δx at init is ~1e-4-scaled: the queried coordinate barely moves
    dx0 = np.asarray(field._deform(params, x, t0))
    dx1 = np.asarray(field._deform(params, x, t1))
    assert np.abs(dx0).max() < 1e-2 and np.abs(dx1).max() < 1e-2

    # after scaling the deform output layer up, motion changes density
    params2 = jax.tree.map(lambda a: a, params)
    params2["deform"] = list(params2["deform"])
    params2["deform"][-1] = params2["deform"][-1] * 1e4 + 0.05
    d0 = np.asarray(field.query_density(params2, x, t0))
    d1 = np.asarray(field.query_density(params2, x, t1))
    assert np.abs(d0 - d1).max() > 1e-6


def test_tineuvox_call_shapes_and_selector():
    field = _small_field()
    params = field.init(jax.random.PRNGKey(2))
    x = jnp.asarray(
        np.random.default_rng(3).uniform(-1.0, 1.0, (16, 3)), jnp.float32
    )
    t = jnp.full((16, 1), 0.25)
    rgb, sigma = field(params, x, t, condition=x)
    assert rgb.shape == (16, 3) and sigma.shape == (16, 1)
    assert np.isfinite(np.asarray(rgb)).all()
    # far outside the aabb the selector zeroes density (deformation at init
    # is too small to pull the point back inside)
    x_out = jnp.full((4, 3), 7.0)
    assert np.all(
        np.asarray(field.query_density(params, x_out, jnp.zeros((4, 1)))) == 0
    )
    # occupancy protocol: random frame times per cell
    ts = jnp.linspace(0.0, 1.0, 5)[:, None]
    op = field.query_opacity(params, x, ts, 0.01, jax.random.PRNGKey(4))
    assert op.shape == (16, 1) and np.isfinite(np.asarray(op)).all()
    # regularizer: finite scalar, differentiable
    reg = field.param_regularizer(params)
    assert np.isfinite(float(reg))
    g = jax.grad(lambda p: field.param_regularizer(p))(params)
    assert np.isfinite(
        float(np.asarray(g["encoder"]["lines"][0]).sum())
    )


def test_tineuvox_trainer_smoke():
    """NGPOccTrainer(time_dependent=True) over the TiNeuVox field on the
    dynamic procedural scene: finite decreasing loss, nonzero samples."""
    from nerfacc_tpu.data import ProceduralDynamicSceneLoader
    from nerfacc_tpu.trainers import NGPOccTrainer

    ds = ProceduralDynamicSceneLoader(
        split="train", num_rays=128, seed=0, width=48, height=48, n_train=6
    )
    field = _small_field()
    trainer = NGPOccTrainer(
        field=field,
        aabb=AABB,
        grid_resolution=16,
        render_step_size=0.05,
        sample_budget=2048,
        max_samples_per_ray=128,
        n_windows=8,
        window_size=4,
        warmup_steps=4,
        update_interval=2,
        max_steps=100,
        time_dependent=True,
        timestamps=ds.timestamps,
        field_reg_weight=1e-4,
    )
    state = trainer.init_state()
    losses = []
    for i in range(20):
        batch = ds[int(np.random.default_rng(i).integers(0, len(ds)))]
        state, aux = trainer.train_step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert int(np.asarray(aux["n_total_samples"])) > 0
