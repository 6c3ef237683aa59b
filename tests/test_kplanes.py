"""K-Planes dynamic field: bilinear-plane exactness vs a gather reference,
static-at-init time planes, regularizer, and a time-dependent trainer smoke
run (reference benchmark family: docs/source/examples/dynamic/kplanes.rst)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.models import KPlanesEncoder, KPlanesRadianceField

AABB = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)


def _bilinear_ref(plane: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Gather-based bilinear lookup reference: plane (R, R, rank), u/v in
    [0, 1] -> (N, rank)."""
    R = plane.shape[0]
    pu, pv = u * (R - 1), v * (R - 1)
    i0 = np.clip(np.floor(pu).astype(int), 0, R - 1)
    j0 = np.clip(np.floor(pv).astype(int), 0, R - 1)
    i1, j1 = np.minimum(i0 + 1, R - 1), np.minimum(j0 + 1, R - 1)
    fu, fv = (pu - i0)[:, None], (pv - j0)[:, None]
    return (
        plane[i0, j0] * (1 - fu) * (1 - fv)
        + plane[i1, j0] * fu * (1 - fv)
        + plane[i0, j1] * (1 - fu) * fv
        + plane[i1, j1] * fu * fv
    )


def test_kplanes_encoder_matches_gather_bilinear():
    """The matmul-chain plane evaluation must agree with 4-neighbor gather
    bilinear interpolation on every one of the six planes."""
    enc = KPlanesEncoder(resolutions=(9,), ranks=(4,), compute_dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = enc.init(key)
    # randomize ALL planes (incl. time planes, which init to 1)
    planes = 1.0 + 0.5 * jax.random.normal(key, params["planes"][0].shape)
    params = {"planes": [planes]}

    rng = np.random.default_rng(1)
    q = rng.random((64, 4)).astype(np.float32)
    out = np.asarray(enc(params, jnp.asarray(q)))

    pairs = ((0, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 3))
    pl = np.asarray(planes)
    expected = np.ones((64, 4), np.float32)
    for p, (a, b) in enumerate(pairs):
        expected = expected * _bilinear_ref(pl[p], q[:, a], q[:, b])
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_kplanes_static_at_init_then_time_dependent():
    field = KPlanesRadianceField(aabb=AABB, resolutions=(8,), ranks=(4,))
    params = field.init(jax.random.PRNGKey(3))
    x = jnp.asarray(
        np.random.default_rng(4).uniform(-1.0, 1.0, (16, 3)), jnp.float32
    )
    t0 = jnp.zeros((16, 1))
    t1 = jnp.full((16, 1), 0.7)
    d0 = np.asarray(field.query_density(params, x, t0))
    d1 = np.asarray(field.query_density(params, x, t1))
    # time planes init to exactly 1 -> the scene starts static
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-6)
    assert d0.shape == (16, 1)

    # perturb a time plane -> densities become time-dependent
    params["encoder"]["planes"][0] = (
        params["encoder"]["planes"][0]
        .at[3:]
        .add(
            0.3
            * jax.random.normal(
                jax.random.PRNGKey(5), params["encoder"]["planes"][0][3:].shape
            )
        )
    )
    d0 = np.asarray(field.query_density(params, x, t0))
    d1 = np.asarray(field.query_density(params, x, t1))
    assert np.abs(d0 - d1).max() > 1e-5

    # full call: shapes + outside-aabb selector
    rgb, sigma = field(params, x, t0, condition=x)
    assert rgb.shape == (16, 3) and sigma.shape == (16, 1)
    x_out = jnp.full((4, 3), 5.0)
    assert np.all(
        np.asarray(field.query_density(params, x_out, jnp.zeros((4, 1)))) == 0
    )

    # regularizer: finite scalar, differentiable
    reg = field.param_regularizer(params)
    assert np.isfinite(float(reg))
    g = jax.grad(lambda p: field.param_regularizer(p))(params)
    assert np.isfinite(
        float(np.asarray(g["encoder"]["planes"][0]).sum())
    )


def test_kplanes_trainer_smoke():
    """NGPOccTrainer(time_dependent=True) over the K-Planes field on the
    dynamic procedural scene: finite decreasing loss, nonzero samples."""
    from nerfacc_tpu.data import ProceduralDynamicSceneLoader
    from nerfacc_tpu.trainers import NGPOccTrainer

    ds = ProceduralDynamicSceneLoader(
        split="train", num_rays=128, seed=0, width=48, height=48, n_train=6
    )
    field = KPlanesRadianceField(aabb=AABB, resolutions=(8, 16), ranks=(4, 4))
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


def test_kplanes_tanh_activation_bounded_and_identitylike():
    """plane_activation="tanh": (a) features (hence products) are bounded,
    (b) at the near-one init the encoding matches the raw formulation to
    first order (value and slope agree at f=1), (c) the amp prior adds
    mean((p-1)^2) to the regularizer."""
    key = jax.random.PRNGKey(2)
    raw = KPlanesEncoder(
        resolutions=(8,), ranks=(4,), compute_dtype=jnp.float32
    )
    tan = KPlanesEncoder(
        resolutions=(8,), ranks=(4,), compute_dtype=jnp.float32,
        plane_activation="tanh",
    )
    params = raw.init(key)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.random((128, 4)).astype(np.float32))
    # (b) near init: the two formulations agree closely (tanh is identity
    # to 2nd order at f=1; init spread is 0.1)
    np.testing.assert_allclose(
        np.asarray(raw(params, q)), np.asarray(tan(params, q)),
        atol=5e-3, rtol=0.05,
    )
    # (a) blow the planes up 100x: tanh features stay in (0, 2) so the
    # 6-way product stays < 2^6, while the raw product explodes
    big = {"planes": [params["planes"][0] * 100.0]}
    out_t = np.asarray(tan(big, q))
    out_r = np.asarray(raw(big, q))
    assert np.abs(out_t).max() <= 64.0
    assert np.abs(out_r).max() > 1e6
    # (c) amp prior
    amp = KPlanesEncoder(
        resolutions=(8,), ranks=(4,), compute_dtype=jnp.float32,
        amp_prior=2.0,
    )
    base = float(raw.param_regularizer(params))
    with_amp = float(amp.param_regularizer(params))
    d1 = np.asarray(params["planes"][0]) - 1.0
    np.testing.assert_allclose(
        with_amp - base, 2.0 * float((d1 * d1).mean()), rtol=1e-5
    )
