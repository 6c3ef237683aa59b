"""Dissect the opaque-scene EVAL break at finite params (round 5).

diag_collapse.py run 2 (ckpt at step 1500): train loss healthy (0.0018),
params finite, occ_max ~2.5e5 — yet eval PSNR 9.58 (run 2) / -29.97
(run 1).  Hypothesis: samples with t_end < t_start (negative delta) from
the analytic orbit recompute meet the enormous hard-surface densities:
alpha = 1 - exp(+sigma*|dt|) explodes (large-negative or -inf), and
trans = exp(-excl) with a negative exclusive sum exceeds 1, so a handful
of pixels accumulate +-30 values; the cursor renderer then feeds
prefix_w = 1 - opacity < 0 into the next round, compounding it.

This probe loads the checkpoint, renders one test view, reports pixel
extremes, then re-runs ONE cursor round with instrumentation: min/max
valid delta, sigma max, alpha/trans/weight extremes.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from nerfacc_tpu.data import PROCEDURAL_SCENES
    from nerfacc_tpu.models.cp_field import CPRadianceField
    from nerfacc_tpu.trainers import NGPOccTrainer
    from nerfacc_tpu.trainers.ngp_occ import TrainState
    from nerfacc_tpu.utils.checkpoint import load_checkpoint

    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    field = CPRadianceField(aabb=tuple(aabb))
    trainer = NGPOccTrainer(
        field=field, aabb=aabb, max_steps=2500,
        sample_budget=1 << 16, max_samples_per_ray=1024,
        render_step_size=5e-3, fine_probes=4, lr=1e-2, seed=42,
    )
    like = trainer.init_state()
    state = TrainState(*load_checkpoint("/tmp/diag_state.ckpt", like=like))
    print(json.dumps({"step": int(state.step)}), flush=True)

    test_ds = PROCEDURAL_SCENES["proceduralopaque"](split="test")
    data = test_ds[0]
    rgb = trainer.render_image(state, data)
    ref = np.asarray(data["rgb"])
    bad = np.abs(rgb) > 1.5
    print(json.dumps({
        "rgb_min": float(rgb.min()), "rgb_max": float(rgb.max()),
        "rgb_nan": int(np.isnan(rgb).sum()),
        "n_bad_pix": int(bad.any(-1).sum()),
        "mse": float(((rgb - ref) ** 2).mean()),
    }), flush=True)

    # pick the worst chunk of rays and instrument one cursor round
    chunk = 8192
    flat_o = np.asarray(data["rays_o"], np.float32).reshape(-1, 3)
    flat_d = np.asarray(data["rays_d"], np.float32).reshape(-1, 3)
    badrow = np.abs(rgb).max(-1)
    worst = int(np.argmax(badrow))
    ci = worst // chunk
    print(json.dumps({"worst_pix": worst, "worst_val": float(badrow[worst]),
                      "chunk": ci}), flush=True)
    o = jnp.asarray(flat_o[ci * chunk:(ci + 1) * chunk])
    d = jnp.asarray(flat_d[ci * chunk:(ci + 1) * chunk])

    from nerfacc_tpu.grid import build_coarse_pool, pooled_round_from_coarse
    from nerfacc_tpu.utils.rendering import compact_samples_from_windows
    from nerfacc_tpu.volrend import render_weight_from_density

    occ_state = state.occ_state
    params = state.params
    f = trainer.window_size
    max_coarse = max(trainer.max_samples_per_ray // f + 32, 64)
    budget = trainer.sample_budget
    wb = max((3 * budget) // (2 * f), 1024)
    n_rays = o.shape[0]
    near = jnp.full((n_rays,), trainer.near_plane, jnp.float32)
    far = jnp.full((n_rays,), trainer.far_plane, jnp.float32)

    field_fn = trainer._field_eval_fn(params, jnp.asarray(0.0, jnp.float32))

    from nerfacc_tpu.volrend import accumulate_along_rays

    @jax.jit
    def one_round(cpool, cursor, alive, opacity):
        ws, advance = pooled_round_from_coarse(
            cpool, cursor, alive, occ_state.binaries, occ_state.aabbs,
            trainer.render_step_size, trainer.cone_angle, max_coarse, f,
            wb, budget, trainer.fine_probes,
        )
        prefix_w = jnp.take(1.0 - opacity[:, 0],
                            jnp.minimum(ws.ray_ids, n_rays - 1))
        samples = compact_samples_from_windows(
            ws, budget, n_rays, extras=prefix_w,
            step_size=trainer.render_step_size, cone_angle=trainer.cone_angle,
        )
        valid = samples.valid
        delta = samples.t_ends - samples.t_starts
        t_mid = 0.5 * (samples.t_starts + samples.t_ends)
        so, sd = samples.rays_o, samples.rays_d
        if so is None:
            idx = jnp.minimum(samples.ray_indices, n_rays - 1)
            so, sd = o[idx], d[idx]
        pos = so + t_mid[:, None] * sd
        rgbs, sig = field_fn(pos, sd)
        sigmas = sig[..., 0] if sig.ndim > 1 else sig
        weights, trans, alphas = render_weight_from_density(
            samples.t_starts, samples.t_ends, sigmas,
            ray_indices=samples.ray_indices, n_rays=n_rays,
            masks=valid, indices_sorted=True,
            seg_starts=samples.seg_starts, seg_ends=samples.seg_ends,
            prefix_trans=samples.extras[:, 0],
        )
        vdelta = jnp.where(valid, delta, jnp.inf)
        stats = {
            "n_valid": valid.sum(),
            "min_delta": jnp.min(vdelta),
            "n_neg_delta": jnp.sum(valid & (delta < 0)),
            "sigma_max": jnp.max(jnp.where(valid, sigmas, 0)),
            "sigdt_min": jnp.min(jnp.where(valid, sigmas * delta, 0)),
            "alpha_min": jnp.min(jnp.where(valid, alphas, 0)),
            "alpha_max": jnp.max(jnp.where(valid, alphas, 0)),
            "trans_max": jnp.max(jnp.where(valid, trans, 0)),
            "w_min": jnp.min(jnp.where(valid, weights, 0)),
            "w_max": jnp.max(jnp.where(valid, weights, 0)),
            "prefix_min": jnp.min(samples.extras[:, 0]),
        }
        o_add = accumulate_along_rays(
            weights, None, ray_indices=samples.ray_indices, n_rays=n_rays,
            masks=valid, indices_sorted=True,
        )
        opacity = opacity + o_add
        cursor = cursor + advance
        alive = (alive & (opacity[:, 0] <= 1.0 - 1e-4)
                 & (cursor < cpool.counts_w))
        return cursor, alive, opacity, stats

    cpool = build_coarse_pool(
        o, d, occ_state.binaries, occ_state.aabbs, near, far,
        trainer.render_step_size, trainer.cone_angle, max_coarse, f,
        max_windows=trainer.cursor_max_windows,
        rays_mask=jnp.ones((n_rays,), bool),
    )
    cursor = jnp.zeros((n_rays,), jnp.int32)
    alive = jnp.ones((n_rays,), bool)
    opacity = jnp.zeros((n_rays, 1), jnp.float32)

    for rnd in range(6):
        cursor, alive, opacity, stats = one_round(cpool, cursor, alive,
                                                  opacity)
        out = {"round": rnd}
        out.update({k: float(v) for k, v in stats.items()})
        out["opacity_min"] = float(opacity.min())
        out["opacity_max"] = float(opacity.max())
        print(json.dumps(out), flush=True)
        if not bool(alive.any()):
            break


if __name__ == "__main__":
    main()
