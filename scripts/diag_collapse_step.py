"""Single-step introspection of the opaque-collapse NaN (see
diag_collapse.py).  Loads the state checkpoint saved just before the
blow-up, replays the exact training stream one step at a time (the batch
draw is `sampler.sample(arrays, fold_in(state.key, 0x5A))`, identical to
`_train_steps_sampled_impl`), and at the first step whose updated params
contain a NaN, dissects that step: sample-interval sanity (min delta over
valid lanes), field density range, per-leaf gradient NaN counts and
magnitudes, and the loss-forward intermediates (alphas/trans/weights).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default="/tmp/diag_state.ckpt")
    p.add_argument("--scene", type=str, default="proceduralopaque")
    p.add_argument("--num_rays", type=int, default=2048)
    p.add_argument("--budget", type=int, default=1 << 16)
    p.add_argument("--fine_probes", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--max_probe_steps", type=int, default=200)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from nerfacc_tpu.data import PROCEDURAL_SCENES, DeviceRaySampler
    from nerfacc_tpu.models.cp_field import CPRadianceField
    from nerfacc_tpu.trainers import NGPOccTrainer
    from nerfacc_tpu.trainers.ngp_occ import TrainState
    from nerfacc_tpu.utils.checkpoint import load_checkpoint

    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    loader_cls = PROCEDURAL_SCENES[args.scene]
    train_ds = loader_cls(split="train", num_rays=args.num_rays,
                          seed=args.seed)
    field = CPRadianceField(aabb=tuple(aabb))
    trainer = NGPOccTrainer(
        field=field, aabb=aabb, max_steps=2500,
        sample_budget=args.budget, max_samples_per_ray=1024,
        render_step_size=5e-3, fine_probes=args.fine_probes,
        lr=args.lr, seed=args.seed,
    )
    like = trainer.init_state()
    state = load_checkpoint(args.ckpt, like=like)
    state = TrainState(*state)
    sampler = DeviceRaySampler.from_loader(train_ds, num_rays=args.num_rays)

    def any_nan(tree):
        return any(bool(jnp.isnan(x).any()) for x in jax.tree.leaves(tree))

    step_fn = jax.jit(
        lambda st, b: trainer._train_step_impl(st, b, None)
    )

    print(json.dumps({"start_step": int(state.step)}), flush=True)
    for i in range(args.max_probe_steps):
        kb = jax.random.fold_in(state.key, 0x5A)
        batch = sampler.sample(sampler.arrays, kb)
        new_state, aux = step_fn(state, batch)
        if any_nan(new_state.params) or any_nan(new_state.occ_state.occs):
            print(json.dumps({
                "nan_at_step": int(state.step),
                "params_nan": any_nan(new_state.params),
                "occs_nan": bool(jnp.isnan(new_state.occ_state.occs).any()),
            }), flush=True)
            dissect(trainer, state, batch)
            return
        state = new_state
    print("no NaN within probe window")


def dissect(trainer, state, batch):
    """Recompute the bad step's pieces with full introspection."""
    import jax
    import jax.numpy as jnp

    from nerfacc_tpu.grid import sampling_pooled, compact_samples_from_windows
    from nerfacc_tpu.volrend import render_weight_from_density

    key, k_occ, k_strat, k_time = jax.random.split(state.key, 4)
    params = state.params
    occ_state = state.occ_state
    rays_o, rays_d = batch["rays_o"], batch["rays_d"]

    max_coarse = max(
        trainer.max_samples_per_ray // trainer.window_size + 32, 64
    )
    wb = (
        trainer.window_budget
        if trainer.window_budget is not None
        else max(trainer.sample_budget // 5, 1024)
    )
    ws = sampling_pooled(
        occ_state, rays_o, rays_d,
        near_plane=trainer.near_plane, far_plane=trainer.far_plane,
        render_step_size=trainer.render_step_size,
        stratified=trainer.stratified, cone_angle=trainer.cone_angle,
        key=k_strat, window_budget=min(wb, rays_o.shape[0] * max_coarse),
        window_size=trainer.window_size, max_coarse=max_coarse,
        fine_probes=trainer.fine_probes, compaction=trainer.compaction,
    )
    samples = compact_samples_from_windows(
        ws, trainer.sample_budget, rays_o.shape[0],
        step_size=trainer.render_step_size, cone_angle=trainer.cone_angle,
        compaction=trainer.compaction,
    )
    delta = samples.t_starts - samples.t_ends
    valid = samples.valid
    print(json.dumps({
        "n_valid": int(jnp.sum(valid)),
        "min_delta_valid": float(jnp.min(jnp.where(valid, -delta, jnp.inf))),
        "max_t": float(jnp.max(jnp.where(valid, samples.t_ends, 0))),
        "neg_delta_valid": int(jnp.sum(valid & (delta > 0))),
    }), flush=True)

    # field on the sample positions
    t_mid = 0.5 * (samples.t_starts + samples.t_ends)
    o, d = samples.rays_o, samples.rays_d
    if o is None:
        idx = jnp.minimum(samples.ray_indices, rays_o.shape[0] - 1)
        o, d = rays_o[idx], rays_d[idx]
    positions = o + t_mid[:, None] * d

    def loss_fn(params):
        rgb, density = trainer._apply_field(
            params, positions, d, jnp.minimum(
                samples.ray_indices, rays_o.shape[0] - 1), batch
        )
        sigmas = density[..., 0]
        weights, trans, alphas = render_weight_from_density(
            samples.t_starts, samples.t_ends, sigmas,
            ray_indices=samples.ray_indices, n_rays=rays_o.shape[0],
            masks=samples.valid, indices_sorted=True,
            seg_starts=samples.seg_starts, seg_ends=samples.seg_ends,
        )
        stats = {
            "sigma_max": jnp.max(jnp.where(valid, sigmas, 0)),
            "sigma_nan": jnp.sum(jnp.isnan(sigmas)),
            "alpha_min": jnp.min(alphas),
            "alpha_max": jnp.max(alphas),
            "alpha_nan": jnp.sum(jnp.isnan(alphas)),
            "trans_nan": jnp.sum(jnp.isnan(trans)),
            "w_nan": jnp.sum(jnp.isnan(weights)),
            "w_max": jnp.max(jnp.abs(weights)),
            "rgb_nan": jnp.sum(jnp.isnan(rgb)),
        }
        loss = jnp.sum(weights * jnp.sum(rgb, -1))  # probe reduction
        return loss, stats

    (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    print(json.dumps(
        {k: float(v) for k, v in stats.items()}), flush=True)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        n = int(jnp.sum(jnp.isnan(g)))
        if n or bool(jnp.isinf(g).any()):
            print(f"grad {jax.tree_util.keystr(path)}: nan={n} "
                  f"inf={int(jnp.sum(jnp.isinf(g)))} "
                  f"max={float(jnp.max(jnp.abs(jnp.nan_to_num(g)))):.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
