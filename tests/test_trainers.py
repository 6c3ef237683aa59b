"""Trainer smoke tests (tiny shapes, CPU): the fused occ-grid step and the
proposal-network step must run, decrease the loss, and keep state shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu.models.cp_field import CPDensityField, CPRadianceField
from nerfacc_tpu.trainers import NGPOccTrainer, NGPPropTrainer

AABB = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]


def _tiny_batch(key, n_rays=64):
    k1, k2 = jax.random.split(key)
    rays_o = jax.random.normal(k1, (n_rays, 3)) * 0.05 + jnp.array([0.0, 0.0, -2.5])
    rays_d = jnp.array([[0.0, 0.0, 1.0]]) + jax.random.normal(k2, (n_rays, 3)) * 0.1
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    # synthetic target: a red ball at the origin on white background
    rgb = jnp.where(
        (jnp.abs(rays_d[:, :1]) < 0.08) & (jnp.abs(rays_d[:, 1:2]) < 0.08),
        jnp.array([[1.0, 0.2, 0.2]]),
        jnp.ones((1, 3)),
    )
    return {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "rgb": rgb,
        "color_bkgd": jnp.ones((3,)),
    }


def _tiny_field():
    return CPRadianceField(aabb=tuple(AABB), resolutions=(8, 16), ranks=(4, 4))


def test_occ_trainer_step_decreases_loss():
    trainer = NGPOccTrainer(
        field=_tiny_field(),
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
    )
    state = trainer.init_state()
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, aux = trainer.train_step(state, _tiny_batch(sub))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert int(state.step) == 30


def test_occ_trainer_multi_step_scan():
    trainer = NGPOccTrainer(
        field=_tiny_field(),
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
    )
    state = trainer.init_state()
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    batches = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_tiny_batch(k) for k in keys]
    )
    state, auxs = trainer.train_steps(state, batches)
    assert auxs["loss"].shape == (4,)
    assert np.isfinite(np.asarray(auxs["loss"])).all()
    assert int(state.step) == 4


def test_prop_trainer_step():
    field = _tiny_field()
    props = [CPDensityField(aabb=tuple(AABB), resolutions=(8,), ranks=(4,))]
    trainer = NGPPropTrainer(
        field=field,
        prop_fields=props,
        prop_samples=[16],
        num_samples=8,
        near_plane=1.5,
        far_plane=3.5,
        sampling_type="uniform",
        max_steps=100,
    )
    state = trainer.init_state()
    key = jax.random.PRNGKey(2)
    for i, rg in enumerate([True, False, True]):
        key, sub = jax.random.split(key)
        state, aux = trainer.train_step(state, _tiny_batch(sub), rg)
        assert np.isfinite(float(aux["loss"]))
    assert int(state.step) == 3


def test_occ_trainer_dynamic_budget_buckets():
    """dynamic_budget specializes the step to a smaller bucket once demand
    is observed, without changing training semantics."""
    trainer = NGPOccTrainer(
        field=_tiny_field(),
        aabb=AABB,
        grid_resolution=16,
        render_step_size=0.05,
        sample_budget=8192,
        max_samples_per_ray=128,
        warmup_steps=4,
        update_interval=2,
        max_steps=100,
        dynamic_budget=True,
        budget_granularity=1024,
    )
    state = trainer.init_state()
    key = jax.random.PRNGKey(0)
    # first call runs at the full budget (no demand observed yet)
    assert trainer._pick_budget() is None
    buckets = []
    # enough calls for the warmup-phase (dense grid) demand spike to age
    # out of the sliding demand window.  (Coarse 1024 granularity: demand
    # jitter at 256 granularity produced a fresh bucket — and a full step
    # recompile — every few calls, tripling the test's wall time for the
    # same assertions.)
    for i in range(12):
        key, sub = jax.random.split(key)
        buckets.append(trainer._pick_budget())
        state, aux = trainer.train_step(state, _tiny_batch(sub))
        assert np.isfinite(float(aux["loss"]))
    # demand on the tiny scene (~2.6k samples) is far below 8192: a bucket
    # must kick in
    assert buckets[-1] is not None and buckets[-1] < 8192
    assert buckets[-1] % 1024 == 0
    # the bucket still covers the demand the controller reports
    assert buckets[-1] >= float(jnp.max(aux["n_total_samples"]))
    assert int(state.step) == 12


def test_prop_trainer_multi_step_scan():
    """Fused prop steps: the requires_grad schedule rides as a traced
    per-step flag (lax.cond) and matches per-step results structurally."""
    field = _tiny_field()
    props = [CPDensityField(aabb=tuple(AABB), resolutions=(8,), ranks=(4,))]
    trainer = NGPPropTrainer(
        field=field,
        prop_fields=props,
        prop_samples=[16],
        num_samples=8,
        near_plane=1.5,
        far_plane=3.5,
        sampling_type="uniform",
        max_steps=100,
    )
    state = trainer.init_state()
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    batches = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_tiny_batch(k) for k in keys]
    )
    rgs = np.array([True, False, False, True])
    state, auxs = trainer.train_steps(state, batches, rgs)
    assert auxs["loss"].shape == (4,)
    assert np.isfinite(np.asarray(auxs["loss"])).all()
    # prop loss only accrues on requires_grad steps
    p = np.asarray(auxs["prop_loss"])
    assert (p[~rgs] == 0.0).all()
    assert int(state.step) == 4


def test_prop_render_image_scan_matches_chunks():
    """The single-dispatch scan renderer must equal per-chunk rendering,
    including the padded tail chunk."""
    field = _tiny_field()
    props = [CPDensityField(aabb=tuple(AABB), resolutions=(8,), ranks=(4,))]
    trainer = NGPPropTrainer(
        field=field, prop_fields=props, prop_samples=[16], num_samples=8,
        near_plane=1.5, far_plane=3.5, sampling_type="uniform", max_steps=100,
    )
    state = trainer.init_state()
    batch = _tiny_batch(jax.random.PRNGKey(9), n_rays=100)  # 100 % 32 != 0
    data = {k: np.asarray(v) for k, v in batch.items()}
    img = trainer.render_image(state, data, chunk=32)
    assert img.shape == (100, 3)
    ref, _, _ = trainer._render_chunk(
        state.params,
        jnp.asarray(data["rays_o"][:32]),
        jnp.asarray(data["rays_d"][:32]),
        jnp.asarray(data["color_bkgd"]),
    )
    np.testing.assert_allclose(img[:32], np.asarray(ref), atol=1e-6)


_BASELINE = {}


def _baseline_step():
    """Shared deterministic baseline trainer + one stepped result for the
    knob-comparison tests below (field_reg, grad_clip) — each used to
    compile its own identical baseline program (~8 s apiece on the CI
    host); memoizing it halves those tests' wall time."""
    if not _BASELINE:
        field = _tiny_field()
        kw = dict(
            field=field, aabb=AABB, grid_resolution=16,
            render_step_size=0.05, sample_budget=2048,
            max_samples_per_ray=128, warmup_steps=2, update_interval=2,
            max_steps=50, stratified=False,
        )
        t0 = NGPOccTrainer(**kw)
        batch = _tiny_batch(jax.random.PRNGKey(3))
        s0, a0 = t0.train_step(t0.init_state(), batch)
        _BASELINE.update(
            kw=kw, field=field, t0=t0, batch=batch, s0=s0, a0=a0
        )
    return _BASELINE


def test_occ_trainer_field_reg():
    """field_reg_weight adds the TV prior to the fused step: the loss gains
    the reg term and the step stays finite (smoothing grads reach the
    tables even where no samples land)."""
    b = _baseline_step()
    t1 = NGPOccTrainer(**b["kw"], field_reg_weight=10.0)
    s1, a1 = t1.train_step(t1.init_state(), b["batch"])
    l0, l1 = float(b["a0"]["loss"]), float(a1["loss"])
    assert np.isfinite(l1)
    reg = float(b["field"].param_regularizer(t1.init_state().params))
    np.testing.assert_allclose(l1 - l0, 10.0 * reg, rtol=1e-3)


def test_prop_trainer_unbounded_360_config():
    """The unbounded proposal configuration end-to-end at tiny shapes:
    2-level proposal cascade, lindisp s->t transform, opaque background,
    contracted fields (reference config: examples/train_ngp_nerf_prop.py —
    prop nets [256, 96] -> 48, lindisp, opaque bkgd, far 1e3)."""
    field = CPRadianceField(
        aabb=tuple(AABB), resolutions=(8, 16), ranks=(4, 4), unbounded=True
    )
    props = [
        CPDensityField(
            aabb=tuple(AABB), resolutions=(8,), ranks=(4,), unbounded=True
        )
        for _ in range(2)
    ]
    trainer = NGPPropTrainer(
        field=field,
        prop_fields=props,
        prop_samples=[32, 16],
        num_samples=8,
        near_plane=0.2,
        far_plane=1e3,
        sampling_type="lindisp",
        opaque_bkgd=True,
        max_steps=100,
    )
    state = trainer.init_state()
    key = jax.random.PRNGKey(11)
    for i, rg in enumerate([True, False, True]):
        key, sub = jax.random.split(key)
        state, aux = trainer.train_step(state, _tiny_batch(sub), rg)
        assert np.isfinite(float(aux["loss"])), i
    # the interlevel loss accrues on requires_grad steps (both levels cached)
    assert float(aux["prop_loss"]) >= 0.0 and np.isfinite(
        float(aux["prop_loss"])
    )
    assert int(state.step) == 3


def test_occ_trainer_unbounded_360_config():
    """The mipnerf360 configuration end-to-end at tiny shapes: 4-level grid,
    cone-angle stepping, scene contraction (reference config:
    examples/train_ngp_nerf_occ.py:49-78).  Loss must stay finite and the
    traversal must draw samples from EVERY grid level — content placed
    outside the base aabb is only reachable through levels 1-3."""
    field = CPRadianceField(
        aabb=tuple(AABB), resolutions=(8, 16), ranks=(4, 4), unbounded=True
    )
    trainer = NGPOccTrainer(
        field=field,
        aabb=AABB,
        grid_resolution=16,
        grid_nlvl=4,
        render_step_size=0.02,
        cone_angle=0.004,
        alpha_thre=1e-2,
        near_plane=0.1,
        sample_budget=8192,
        max_samples_per_ray=512,
        warmup_steps=4,
        update_interval=2,
        max_steps=100,
    )
    state = trainer.init_state()

    # 360-style batch: cameras on a ring at radius 1.8 (outside the base
    # aabb), rays through the origin and out the far side to radius > 4
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    th = jax.random.uniform(k1, (64,)) * 2 * jnp.pi
    rays_o = jnp.stack(
        [1.8 * jnp.cos(th), 1.8 * jnp.sin(th), jnp.full_like(th, 0.6)], -1
    )
    rays_d = -rays_o + jax.random.normal(k2, (64, 3)) * 0.15
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    batch = {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "rgb": jnp.full((64, 3), 0.5),
        "color_bkgd": jnp.ones((3,)),
    }

    for i in range(6):
        state, aux = trainer.train_step(state, batch)
        assert np.isfinite(float(aux["loss"])), i
    assert float(aux["n_rendering_samples"]) > 0

    # per-level sample coverage through the public reference wrapper on the
    # trainer's own 4-level grid (warmup keeps all levels occupied)
    from nerfacc_tpu.grid import traverse_grids

    binaries = jnp.ones_like(state.occ_state.binaries)
    _, samples, _ = traverse_grids(
        rays_o, rays_d, binaries, state.occ_state.aabbs,
        near_planes=jnp.full((64,), 0.1),
        far_planes=jnp.full((64,), 1e10),
        step_size=0.02, cone_angle=0.004, max_samples=512,
    )
    pos = rays_o[:, None, :] + samples.vals[..., None] * rays_d[:, None, :]
    v = np.asarray(samples.is_valid)
    pos = np.asarray(pos)
    aabbs = np.asarray(state.occ_state.aabbs)
    # finest level containing each sample (level 0 innermost)
    counts = np.zeros(4, np.int64)
    inside_prev = np.zeros(v.shape, bool)
    for lvl in range(4):
        lo, hi = aabbs[lvl, :3], aabbs[lvl, 3:]
        inside = ((pos >= lo) & (pos <= hi)).all(-1) & v
        counts[lvl] = int((inside & ~inside_prev).sum())
        inside_prev |= inside
    assert (counts > 0).all(), counts


def test_pooled_eval_renderer_matches_alive_ray():
    """The pooled multi-round inference renderer must reproduce the
    while-loop alive-ray renderer (same math, different scheduling)."""
    trainer = NGPOccTrainer(
        field=_tiny_field(),
        aabb=AABB,
        grid_resolution=16,
        render_step_size=0.05,
        sample_budget=1024,  # small budget => several rounds + truncations
        max_samples_per_ray=128,
        warmup_steps=4,
        update_interval=2,
        max_steps=100,
    )
    state = trainer.init_state()
    key = jax.random.PRNGKey(0)
    for i in range(8):
        key, sub = jax.random.split(key)
        state, _ = trainer.train_step(state, _tiny_batch(sub))

    batch = _tiny_batch(jax.random.PRNGKey(99), n_rays=64)
    o = jnp.asarray(batch["rays_o"])
    d = jnp.asarray(batch["rays_d"])
    bkgd = jnp.ones((3,))
    t = jnp.zeros((), jnp.float32)
    c_pool, op_pool, dep_pool = trainer._render_chunk_pooled(
        state.params, state.occ_state, o, d, bkgd, t
    )
    c_alive, op_alive, dep_alive = trainer._render_chunk(
        state.params, state.occ_state, o, d, bkgd, t
    )
    np.testing.assert_allclose(
        np.asarray(c_pool), np.asarray(c_alive), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(op_pool), np.asarray(op_alive), atol=2e-2
    )
    # cursor renderer (coarse phase hoisted out of the round loop, window
    # cursors instead of t-plane resumes) — same math again; the tiny
    # sample budget forces several rounds plus window-granular rollbacks
    c_cur, op_cur, dep_cur = trainer._render_chunk_cursor(
        state.params, state.occ_state, o, d, bkgd, t
    )
    np.testing.assert_allclose(
        np.asarray(c_cur), np.asarray(c_alive), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(op_cur), np.asarray(op_alive), atol=2e-2
    )

    # eval_sample_budget only changes round granularity, never the image: a
    # trainer with a different eval budget must reproduce the default
    # renderer's output exactly (same resumable-transmittance math).
    # (Folded in here to reuse the trained state — a standalone test paid
    # ~19 s of duplicate trainer compiles for one extra renderer compile.)
    import dataclasses as _dc

    big = _dc.replace(trainer, eval_sample_budget=4096)
    c_big, op_big, _ = big._render_chunk_pooled(
        state.params, state.occ_state, o, d, bkgd, t
    )
    np.testing.assert_allclose(np.asarray(c_big), np.asarray(c_pool), atol=1e-4)
    np.testing.assert_allclose(np.asarray(op_big), np.asarray(op_pool), atol=1e-4)


def test_grad_clip_knob():
    """grad_clip > 0 clips the global UPDATE norm after Adam (clipping raw
    grads would be a no-op — Adam is gradient-scale invariant): the step
    stays finite and an aggressively small clip visibly shrinks the first
    parameter update."""
    b = _baseline_step()
    t0, s0 = b["t0"], b["s0"]
    t1 = NGPOccTrainer(**b["kw"], grad_clip=1e-4)  # aggressively small
    s1, a1 = t1.train_step(t1.init_state(), b["batch"])
    assert np.isfinite(float(a1["loss"]))
    d0 = np.abs(
        np.asarray(s0.params["mlp_base"][0])
        - np.asarray(t0.init_state().params["mlp_base"][0])
    ).max()
    d1 = np.abs(
        np.asarray(s1.params["mlp_base"][0])
        - np.asarray(t1.init_state().params["mlp_base"][0])
    ).max()
    assert d1 < d0, (d0, d1)


def test_table_lr_mult_scales_encoder_updates_only():
    """table_lr_mult sits after Adam in the chain: the first step's encoder
    (table) update is scaled by exactly the multiplier while the MLP update
    is bit-identical to the baseline."""
    b = _baseline_step()
    init = b["t0"].init_state().params
    t1 = NGPOccTrainer(**b["kw"], table_lr_mult=4.0)
    s1, _ = t1.train_step(t1.init_state(), b["batch"])

    def delta(params):
        return jax.tree.map(lambda a, c: np.asarray(a) - np.asarray(c),
                            params, init)

    d0, d1 = delta(b["s0"].params), delta(s1.params)
    # MLP subtrees untouched by the mask
    for sub in ("mlp_base", "mlp_head"):
        for a, c in zip(jax.tree.leaves(d0[sub]), jax.tree.leaves(d1[sub])):
            np.testing.assert_allclose(a, c, atol=1e-7)
    # encoder tables: exactly 4x the baseline update
    for a, c in zip(
        jax.tree.leaves(d0["encoder"]), jax.tree.leaves(d1["encoder"])
    ):
        np.testing.assert_allclose(4.0 * a, c, rtol=5e-4, atol=3e-7)
