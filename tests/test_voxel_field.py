"""Dense voxel field: the one-row-gather trilinear encode must equal
8-corner gather interpolation exactly, with correct custom-VJP gradients
for both the grid and the query positions (reference role: DVGO/tcnn
dense-grid features, examples/radiance_fields/ngp.py:110-163)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.models import VoxelGridEncoder, VoxelRadianceField
from nerfacc_tpu.models.voxel_field import _trilinear_gather

AABB = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)


def _trilinear_ref(grid, u):
    """Plain-autodiff 8-corner gather reference."""
    R = grid.shape[0]
    res = jnp.asarray(grid.shape[:3], u.dtype)
    pos = jnp.clip(u, 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, R - 1)
    i1 = jnp.minimum(i0 + 1, R - 1)
    f = pos - i0.astype(pos.dtype)
    out = 0.0
    for dx, wx in ((0, 1 - f[:, 0]), (1, f[:, 0])):
        for dy, wy in ((0, 1 - f[:, 1]), (1, f[:, 1])):
            for dz, wz in ((0, 1 - f[:, 2]), (1, f[:, 2])):
                ix = i0[:, 0] if dx == 0 else i1[:, 0]
                iy = i0[:, 1] if dy == 0 else i1[:, 1]
                iz = i0[:, 2] if dz == 0 else i1[:, 2]
                out = out + grid[ix, iy, iz] * (wx * wy * wz)[:, None]
    return out


def test_trilinear_gather_matches_reference():
    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (9, 9, 9, 5))
    u = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    # boundary + grid-exact positions
    u = u.at[:4].set(
        jnp.asarray(
            [[0, 0, 0], [1, 1, 1], [0.5, 0.25, 1.0], [3 / 8, 5 / 8, 7 / 8]]
        )
    )
    out = _trilinear_gather(grid, u)
    ref = _trilinear_ref(grid, u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_trilinear_gather_grads_match_reference():
    """The custom VJP (scatter-add + 8-shift fold for the grid; analytic
    weight derivative for the positions) must equal plain autodiff of the
    gather reference."""
    grid = jax.random.normal(jax.random.PRNGKey(2), (7, 7, 7, 3))
    u = jax.random.uniform(jax.random.PRNGKey(3), (32, 3), minval=0.02,
                           maxval=0.98)
    cot = jax.random.normal(jax.random.PRNGKey(4), (32, 3))

    def loss_fast(g, x):
        return jnp.sum(_trilinear_gather(g, x) * cot)

    def loss_ref(g, x):
        return jnp.sum(_trilinear_ref(g, x) * cot)

    gg_fast, gu_fast = jax.grad(loss_fast, argnums=(0, 1))(grid, u)
    gg_ref, gu_ref = jax.grad(loss_ref, argnums=(0, 1))(grid, u)
    np.testing.assert_allclose(
        np.asarray(gg_fast), np.asarray(gg_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gu_fast), np.asarray(gu_ref), atol=1e-4, rtol=1e-4
    )


def test_voxel_field_interface_and_trainer_smoke():
    from nerfacc_tpu.data import ProceduralSceneLoader
    from nerfacc_tpu.trainers import NGPOccTrainer

    field = VoxelRadianceField(
        aabb=AABB, resolutions=(8, 16), channels=(2, 2)
    )
    params = field.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1.0, 1.0, (16, 3)), jnp.float32
    )
    rgb, sigma = field(params, x, x)
    assert rgb.shape == (16, 3) and sigma.shape == (16, 1)
    assert np.all(
        np.asarray(field.query_density(params, jnp.full((4, 3), 9.0))) == 0
    )
    reg = field.param_regularizer(params)
    assert np.isfinite(float(reg))

    ds = ProceduralSceneLoader(
        split="train", num_rays=128, seed=0, width=48, height=48, n_train=4,
        gt_samples=64,
    )
    trainer = NGPOccTrainer(
        field=field,
        aabb=AABB,
        grid_resolution=16,
        render_step_size=0.05,
        sample_budget=2048,
        max_samples_per_ray=128,
        warmup_steps=4,
        update_interval=2,
        max_steps=100,
        field_reg_weight=1e-4,
    )
    state = trainer.init_state()
    losses = []
    for i in range(16):
        batch = ds[int(np.random.default_rng(i).integers(0, len(ds)))]
        state, aux = trainer.train_step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
