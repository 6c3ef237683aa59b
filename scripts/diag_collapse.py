"""Instrumented repro of the round-5 opaque/textured training collapse.

Runs the head-to-head protocol (scripts/head_to_head.py) on a collapsing
(field, scene) combo and logs, every ``steps_per_call`` steps: loss/mse,
rendered-sample counts, occupancy-grid statistics (binary fraction, occs
mean/max), and field parameter norms.  The collapse signature we chase:
PSNR drops to the all-background value (13.37 on proceduralopaque)
between steps 1000 and 2500, field-independent (cp AND plane128), which
points at the sampling/occupancy loop, an optimizer spike, or a density
blow-up — each leaves a different trail in these signals:

- optimizer spike: param max-abs jumps by orders of magnitude in one call;
- occupancy collapse: binary fraction -> 0, n_rendering_samples -> 0,
  loss goes flat (no gradient ever recovers it);
- density blow-up: occs max pegs at the trunc_exp cap while params grow;
- renderer saturation: opacity ~1 everywhere from huge density => the
  background term vanishes and the image washes out.

Runs fine on CPU (JAX_PLATFORMS=cpu) at reduced shapes; the collapse
reproduces there (see PERF.md round-5 "opaque collapse" entry).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", type=str, default="proceduralopaque")
    p.add_argument("--field", type=str, default="cp")
    p.add_argument("--max_steps", type=int, default=2500)
    p.add_argument("--num_rays", type=int, default=2048)
    p.add_argument("--budget", type=int, default=1 << 16)
    p.add_argument("--fine_probes", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--grad_clip", type=float, default=0.0)
    p.add_argument("--steps_per_call", type=int, default=25)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save_at", type=int, default=0,
                   help="save a state checkpoint at this step (0 = off)")
    p.add_argument("--save_path", type=str, default="/tmp/diag_state.ckpt")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from nerfacc_tpu.data import PROCEDURAL_SCENES, DeviceRaySampler
    from nerfacc_tpu.trainers import NGPOccTrainer

    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    loader_cls = PROCEDURAL_SCENES[args.scene]
    train_ds = loader_cls(split="train", num_rays=args.num_rays,
                          seed=args.seed)
    test_ds = loader_cls(split="test")

    if args.field == "cp":
        from nerfacc_tpu.models.cp_field import CPRadianceField

        field = CPRadianceField(aabb=tuple(aabb))
    elif args.field == "voxel":
        from nerfacc_tpu.models import VoxelRadianceField

        field = VoxelRadianceField(aabb=tuple(aabb))
    else:
        raise SystemExit(f"unknown field {args.field}")

    trainer = NGPOccTrainer(
        field=field,
        aabb=aabb,
        max_steps=args.max_steps,
        sample_budget=args.budget,
        max_samples_per_ray=1024,
        render_step_size=5e-3,
        fine_probes=args.fine_probes,
        lr=args.lr,
        grad_clip=args.grad_clip,
        seed=args.seed,
    )
    state = trainer.init_state()
    sampler = DeviceRaySampler.from_loader(train_ds, num_rays=args.num_rays)

    M = args.steps_per_call

    def stats(state, auxs):
        occ = state.occ_state
        params = state.params
        leaves = jax.tree.leaves(params)
        pmax = max(float(jnp.max(jnp.abs(x))) for x in leaves)
        pnorm = float(
            jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))
        )
        live = occ.occs >= 0
        return {
            "loss": round(float(auxs["loss"][-1]), 6),
            "loss_max_call": round(float(jnp.max(auxs["loss"])), 6),
            "mse": round(float(auxs["mse"][-1]), 6),
            "n_samp": int(auxs["n_rendering_samples"][-1]),
            "n_total": int(auxs["n_total_samples"][-1]),
            "n_trunc": int(auxs["n_rays_truncated"][-1]),
            "bin_frac": round(float(jnp.mean(occ.binaries)), 5),
            "occ_mean": round(float(jnp.mean(jnp.where(live, occ.occs, 0))), 5),
            "occ_max": round(float(jnp.max(occ.occs)), 4),
            "p_max": round(pmax, 4),
            "p_norm": round(pnorm, 3),
        }

    step = 0
    t0 = time.time()
    while step < args.max_steps:
        state, auxs = trainer.train_steps_sampled(state, sampler, M)
        step += M
        if args.save_at and step == args.save_at:
            from nerfacc_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(args.save_path, state)
            print(json.dumps({"step": step, "saved": args.save_path}),
                  flush=True)
        if step % args.log_every == 0 or step == args.max_steps:
            s = stats(state, auxs)
            print(json.dumps({"step": step,
                              "wall": round(time.time() - t0, 1), **s}),
                  flush=True)
        if step % args.eval_every == 0 or step == args.max_steps:
            m = trainer.eval_metrics(state, test_ds, max_images=2)
            print(json.dumps({"step": step, "psnr": round(m["psnr"], 2),
                              "ssim": round(m["ssim"], 4)}), flush=True)


if __name__ == "__main__":
    main()
