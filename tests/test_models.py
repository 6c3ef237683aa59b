"""Model tests: hash-grid and CP encoders, NGP/CP/vanilla fields — shape
contracts, selector zeroing, gradient flow, trunc_exp clamped backward."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.models import (
    HashGridEncoder,
    NGPRadianceField,
    SinusoidalEncoder,
    TNeRFRadianceField,
    VanillaNeRFRadianceField,
    spherical_harmonics_16,
    trunc_exp,
)
from nerfacc_tpu.models.cp_field import CPGridEncoder, CPRadianceField

AABB = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)


def test_trunc_exp_backward_clamped():
    g = jax.grad(lambda x: trunc_exp(x))(20.0)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-5)
    np.testing.assert_allclose(
        jax.grad(lambda x: trunc_exp(x))(2.0), np.exp(2.0), rtol=1e-5
    )


def test_trunc_exp_forward_capped():
    """Forward exp is capped at exp(30): an uncapped f32 exp overflows to
    inf past x ~ 88 and inf * 0 in the transmittance chain NaNs the whole
    train state (measured on the hard-surface procedural scene)."""
    out = trunc_exp(jnp.asarray([100.0, 1e9, 30.0, 1.0]))
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out[:3]), np.exp(30.0), rtol=1e-6)
    # transmittance chain stays finite at extreme raw densities
    sigma = trunc_exp(jnp.asarray([200.0, 200.0]))
    T = jnp.exp(-jnp.cumsum(sigma * 1e-3))
    assert np.isfinite(np.asarray(T * sigma)).all()


def test_sh16_constant_and_norm():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    sh = spherical_harmonics_16(d)
    assert sh.shape == (2, 16)
    np.testing.assert_allclose(sh[:, 0], 0.28209479, rtol=1e-5)


def test_sinusoidal_encoder_dims():
    enc = SinusoidalEncoder(3, 0, 10, True)
    x = jnp.ones((5, 3))
    out = enc(x)
    assert out.shape == (5, enc.latent_dim)
    assert enc.latent_dim == (1 + 10 * 2) * 3


def test_hash_grid_encoder_interpolates():
    enc = HashGridEncoder(n_levels=4, base_resolution=4, max_resolution=32,
                          log2_hashmap_size=12)
    table = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    out = enc(table, x)
    assert out.shape == (16, enc.output_dim)
    # continuity: nearby points give nearby features
    out2 = enc(table, x + 1e-5)
    np.testing.assert_allclose(out, out2, atol=1e-4)
    # gradient reaches the table
    g = jax.grad(lambda t: jnp.sum(enc(t, x) ** 2))(table)
    assert float(jnp.abs(g).sum()) > 0


def test_cp_encoder_and_field():
    enc = CPGridEncoder(resolutions=(8, 16), ranks=(4, 4))
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    out = enc(params, x)
    assert out.shape == (32, 8)
    out2 = enc(params, x + 1e-5)
    # encoder output is bf16 end-to-end (dots AND the 3-axis product), so
    # continuity holds to ~3 bf16 ulps of the O(1) features
    np.testing.assert_allclose(out, out2, atol=3e-2)

    field = CPRadianceField(aabb=AABB, resolutions=(8, 16), ranks=(4, 4))
    p = field.init(jax.random.PRNGKey(2))
    pos = jax.random.uniform(jax.random.PRNGKey(3), (32, 3), minval=-1, maxval=1)
    dirs = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    rgb, dens = field(p, pos, dirs)
    assert rgb.shape == (32, 3) and dens.shape == (32, 1)
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    assert (np.asarray(dens) >= 0).all()
    # out-of-aabb density is zero
    far = jnp.full((4, 3), 5.0)
    assert np.asarray(field.query_density(p, far)).max() == 0.0
    # gradients flow to lines and MLPs
    g = jax.grad(lambda p: jnp.sum(field(p, pos, dirs)[0]))(p)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert sum(float(jnp.abs(x).sum()) for x in flat) > 0


def test_cp_encoder_block_matches_dense():
    """The block-decomposed level path must equal the dense hat dot exactly
    in f32 (construction is a reindexing, not an approximation) and to bf16
    noise in the default compute dtype."""
    res, ranks = (256,), (8,)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    # exact grid/block-boundary positions included
    x = x.at[:6, 0].set(
        jnp.array([0.0, 1.0, 4 / 255, 127 / 255, 252 / 255, 0.5])
    )
    for dtype, atol in ((jnp.float32, 0.0), (jnp.bfloat16, 4e-2)):
        dense = CPGridEncoder(
            resolutions=res, ranks=ranks, block_size=0, compute_dtype=dtype
        )
        block = CPGridEncoder(
            resolutions=res, ranks=ranks, block_size=4, compute_dtype=dtype
        )
        params = dense.init(jax.random.PRNGKey(0))
        a = np.asarray(dense(params, x))
        b = np.asarray(block(params, x))
        np.testing.assert_allclose(a, b, atol=atol)
        ga = jax.grad(lambda p: jnp.sum(dense(p, x) ** 2))(params)
        gb = jax.grad(lambda p: jnp.sum(block(p, x) ** 2))(params)
        for la, lb in zip(ga["lines"], gb["lines"]):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), atol=max(atol, 2e-5) * 30
            )


def test_cp_encoder_remat_matches_plain():
    """remat="dots"/"full" change only WHAT is saved for the backward, not
    the math — values and line-table grads must match the plain path
    bit-for-bit (the rematerialized hat weights are deterministic)."""
    res, ranks = (8, 32), (4, 8)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
    plain = CPGridEncoder(resolutions=res, ranks=ranks)
    params = plain.init(jax.random.PRNGKey(0))
    ref = np.asarray(plain(params, x))
    gref = jax.grad(lambda p: jnp.sum(plain(p, x) ** 2))(params)
    for mode in ("dots", "full"):
        enc = CPGridEncoder(resolutions=res, ranks=ranks, remat=mode)
        np.testing.assert_array_equal(ref, np.asarray(enc(params, x)))
        g = jax.grad(lambda p: jnp.sum(enc(p, x) ** 2))(params)
        for la, lb in zip(gref["lines"], g["lines"]):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_cp_encoder_fused_levels_matches_per_level():
    """fused_levels evaluates every line level with ONE block-diagonal dot;
    the zero off-diagonal blocks contribute nothing, so in f32 the result
    (and the line-table grads) must equal the per-level dense path exactly.
    (Measured slower on-chip — 17.3M vs 23.1M samples/s end-to-end, the 3x
    zero-block FLOPs don't pay — kept as an A/B knob; see PERF.md.)"""
    res, ranks = (8, 32, 64), (4, 8, 8)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
    plain = CPGridEncoder(
        resolutions=res, ranks=ranks, block_size=0, compute_dtype=jnp.float32
    )
    fused = CPGridEncoder(
        resolutions=res, ranks=ranks, block_size=0,
        compute_dtype=jnp.float32, fused_levels=True,
    )
    params = plain.init(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(plain(params, x)), np.asarray(fused(params, x)),
        rtol=0, atol=1e-6,
    )
    ga = jax.grad(lambda p: jnp.sum(plain(p, x) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(fused(p, x) ** 2))(params)
    for la, lb in zip(ga["lines"], gb["lines"]):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=0, atol=1e-5
        )


def test_triplane_encoder_matches_bilinear_gather():
    """The matmul-chain plane encode (hat_u @ P, then the local
    v-contraction) must equal naive 4-neighbor bilinear interpolation of
    each plane, multiplied across the three planes — exactly in f32."""
    R, rank = 16, 4
    enc = CPGridEncoder(
        resolutions=(8,),
        ranks=(2,),
        plane_resolutions=(R,),
        plane_ranks=(rank,),
        compute_dtype=jnp.float32,
    )
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    # grid-exact and boundary positions included
    x = x.at[:4, 1].set(jnp.array([0.0, 1.0, 5 / (R - 1), 0.5]))
    out = np.asarray(enc(params, x))  # (64, 2 + 4)
    plane = np.asarray(params["planes"][0])  # (3, R, R, rank)

    def bilerp(P, u, v):
        pu, pv = u * (R - 1), v * (R - 1)
        i0 = np.clip(np.floor(pu).astype(int), 0, R - 1)
        j0 = np.clip(np.floor(pv).astype(int), 0, R - 1)
        i1, j1 = np.minimum(i0 + 1, R - 1), np.minimum(j0 + 1, R - 1)
        fu, fv = pu - i0, pv - j0
        return (
            P[i0, j0] * (1 - fu)[:, None] * (1 - fv)[:, None]
            + P[i1, j0] * fu[:, None] * (1 - fv)[:, None]
            + P[i0, j1] * (1 - fu)[:, None] * fv[:, None]
            + P[i1, j1] * fu[:, None] * fv[:, None]
        )

    xs = np.asarray(x)
    want = (
        bilerp(plane[0], xs[:, 0], xs[:, 1])
        * bilerp(plane[1], xs[:, 0], xs[:, 2])
        * bilerp(plane[2], xs[:, 1], xs[:, 2])
    )
    np.testing.assert_allclose(out[:, 2:], want, rtol=1e-5, atol=1e-6)
    # output_dim accounting + gradient flow into the plane tables
    assert enc.output_dim == 6
    g = jax.grad(lambda p: jnp.sum(enc(p, x) ** 2))(params)
    assert float(jnp.abs(g["planes"][0]).sum()) > 0


def test_vm_plane_encoder_matches_gather_reference():
    """plane_mode="vm" (TensoRF vector-matrix): each plane's bilinear
    feature times the LINEAR interpolation of its complementary-axis line,
    the three products concatenated — exact in f32 vs a gather reference."""
    R, rank = 16, 3
    enc = CPGridEncoder(
        resolutions=(8,),
        ranks=(2,),
        plane_resolutions=(R,),
        plane_ranks=(rank,),
        plane_mode="vm",
        compute_dtype=jnp.float32,
    )
    assert enc.output_dim == 2 + 3 * rank
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (48, 3))
    out = np.asarray(enc(params, x))[:, 2:]  # (48, 3*rank)
    plane = np.asarray(params["planes"][0])  # (3, R, R, rank)
    pline = np.asarray(params["plane_lines"][0])  # (3, R, rank)

    def bilerp(P, u, v):
        pu, pv = u * (R - 1), v * (R - 1)
        i0 = np.clip(np.floor(pu).astype(int), 0, R - 1)
        j0 = np.clip(np.floor(pv).astype(int), 0, R - 1)
        i1, j1 = np.minimum(i0 + 1, R - 1), np.minimum(j0 + 1, R - 1)
        fu, fv = pu - i0, pv - j0
        return (
            P[i0, j0] * (1 - fu)[:, None] * (1 - fv)[:, None]
            + P[i1, j0] * fu[:, None] * (1 - fv)[:, None]
            + P[i0, j1] * (1 - fu)[:, None] * fv[:, None]
            + P[i1, j1] * fu[:, None] * fv[:, None]
        )

    def lerp(L, w):
        pw = w * (R - 1)
        i0 = np.clip(np.floor(pw).astype(int), 0, R - 1)
        i1 = np.minimum(i0 + 1, R - 1)
        f = (pw - i0)[:, None]
        return L[i0] * (1 - f) + L[i1] * f

    xs = np.asarray(x)
    want = np.concatenate(
        [
            bilerp(plane[0], xs[:, 0], xs[:, 1]) * lerp(pline[0], xs[:, 2]),
            bilerp(plane[1], xs[:, 0], xs[:, 2]) * lerp(pline[1], xs[:, 1]),
            bilerp(plane[2], xs[:, 1], xs[:, 2]) * lerp(pline[2], xs[:, 0]),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
    g = jax.grad(lambda p: jnp.sum(enc(p, x) ** 2))(params)
    assert float(jnp.abs(g["plane_lines"][0]).sum()) > 0


def test_param_regularizer_tv():
    """TV regularizer: zero on constant tables, positive otherwise, and
    differentiable (smoothing gradient points toward the neighbors)."""
    enc = CPGridEncoder(
        resolutions=(8,), ranks=(4,),
        plane_resolutions=(8,), plane_ranks=(4,),
    )
    params = enc.init(jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_map(jnp.ones_like, params)
    assert float(enc.param_regularizer(flat)) == 0.0
    r = float(enc.param_regularizer(params))
    assert r > 0
    g = jax.grad(lambda p: enc.param_regularizer(p))(params)
    assert float(jnp.abs(g["lines"][0]).sum()) > 0
    assert float(jnp.abs(g["planes"][0]).sum()) > 0


def test_triplane_field_trains():
    """CPRadianceField with a plane level: forward shapes, finite grads."""
    field = CPRadianceField(
        aabb=AABB,
        resolutions=(8,),
        ranks=(4,),
        plane_resolutions=(8,),
        plane_ranks=(4,),
    )
    p = field.init(jax.random.PRNGKey(2))
    pos = jax.random.uniform(jax.random.PRNGKey(3), (32, 3), minval=-1, maxval=1)
    dirs = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    rgb, dens = field(p, pos, dirs)
    assert rgb.shape == (32, 3) and dens.shape == (32, 1)
    g = jax.grad(lambda p: jnp.sum(field(p, pos, dirs)[0]))(p)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in flat)
    assert float(jnp.abs(g["encoder"]["planes"][0]).sum()) > 0


def test_ngp_field_contract():
    field = NGPRadianceField(aabb=AABB, n_levels=4, log2_hashmap_size=12,
                             max_resolution=64)
    p = field.init(jax.random.PRNGKey(0))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    dirs = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    rgb, dens = field(p, pos, dirs)
    assert rgb.shape == (16, 3) and dens.shape == (16, 1)
    d, feat = field.query_density(p, pos, return_feat=True)
    assert feat.shape == (16, 15)


def test_vanilla_and_tnerf_fields():
    field = VanillaNeRFRadianceField(net_depth=2, net_width=32,
                                     net_width_condition=16)
    p = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3), minval=-1, maxval=1)
    cond = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    rgb, sigma = field(p, x, cond)
    assert rgb.shape == (8, 3) and sigma.shape == (8, 1)
    assert (np.asarray(sigma) >= 0).all()
    opac = field.query_opacity(p, x, 0.01)
    assert opac.shape == (8, 1)

    tfield = TNeRFRadianceField()
    tp = tfield.init(jax.random.PRNGKey(2))
    t = jnp.zeros((8, 1))
    rgb, sigma = tfield(tp, x, t, condition=cond)
    assert rgb.shape == (8, 3) and sigma.shape == (8, 1)
    # at init the warp is near-identity (output_init_scale=1e-4)
    warped = tfield._warped(tp, x, t)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(x), atol=0.05)


def test_ndrt_field_invertible_warp_and_density():
    """NDRT field (reference mlp.py:286-395): forward shapes, time
    dependence, and exact invertibility of each warp block."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfacc_tpu.models import NDRTNeRFRadianceField

    field = NDRTNeRFRadianceField()
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 3)) * 0.5, jnp.float32)
    t = jnp.asarray(rng.random((32, 1)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    rgb, density = field(params, x, t, condition=dirs)
    assert rgb.shape == (32, 3) and density.shape == (32, 1)
    assert np.all(np.asarray(density) >= 0)

    # time-dependent: different t -> different warp (densities differ
    # somewhere once params are non-trivial)
    d2 = field.query_density(params, x, t + 0.3)
    assert not np.allclose(np.asarray(density), np.asarray(d2), atol=0)

    # invertibility of one block: reconstruct uv from the output
    t_enc = field.time_encoder(t)
    y = field._warp_block(params, x, t_enc, 0)
    # invert: w' = y[:,2:]; rt from w' matches forward's rt; undo rotation
    from nerfacc_tpu.models.mlp import _linear
    tfeat2 = _linear(params["time2"][0], t_enc, None)
    rt = field.warp2(
        params["warp2"][0],
        jnp.concatenate([field.posi_encoder_2(y[:, 2:]), tfeat2], -1))
    theta, tr = rt[:, 0], rt[:, 1:]
    c, s = jnp.cos(theta), jnp.sin(theta)
    uv = y[:, :2]
    # forward did uv' = R(theta) @ (uv - tr) with R = [[c,-s],[s,c]]
    undo = jnp.stack(
        [c * uv[:, 0] + s * uv[:, 1], -s * uv[:, 0] + c * uv[:, 1]], -1
    ) + tr
    np.testing.assert_allclose(np.asarray(undo), np.asarray(x[:, :2]),
                               atol=1e-5)

    # query_opacity draws random frame times
    ts_all = jnp.asarray([[0.0], [0.5], [1.0]])
    op = field.query_opacity(params, x, ts_all, 5e-3, jax.random.PRNGKey(1))
    assert op.shape == (32, 1)


def test_tensorf_field_vm_configuration():
    """TensoRF-VM family naming (reference benchmark:
    docs/source/examples/static/tensorf.rst): line + tri-plane levels,
    forward shapes, density gated outside the aabb."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfacc_tpu.models import TensoRFRadianceField

    field = TensoRFRadianceField(
        aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5),
        resolutions=(8, 16),
        ranks=(4, 4),
        plane_resolutions=(8,),
        plane_ranks=(4,),
    )
    params = field.init(jax.random.PRNGKey(0))
    assert len(params["encoder"]["lines"]) == 2
    assert len(params["encoder"]["planes"]) == 1
    assert field.encoder.output_dim == 12

    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1.0, 1.0, (8, 3)), jnp.float32
    )
    rgb, sigma = field(params, x, x)
    assert rgb.shape == (8, 3) and sigma.shape == (8, 1)
    assert np.all(np.isfinite(np.asarray(rgb)))
    x_out = jnp.full((4, 3), 9.0)
    assert np.all(np.asarray(field.query_density(params, x_out)) == 0)
