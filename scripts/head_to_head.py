"""Field quality head-to-head under the pinned round-3 protocol.

Protocol (PERF.md "CP vs hash-grid quality head-to-head"): procedural bench
scene, NGPOccTrainer, FIXED 2048 rays, 2^16-sample budget, fine_probes=4,
2500 steps, eval PSNR over the first 2 eval images at steps 500/1000/2500.
Wall time is train-only (the clock pauses during checkpoint evals; compile
time of the first fused call is excluded — both paths pay it once and it
would otherwise dominate short runs).

Usage examples:
    python scripts/head_to_head.py --name cp-default
    python scripts/head_to_head.py --name planes \
        --plane_res 64 128 --plane_rank 32 32
    python scripts/head_to_head.py --name hash --field ngp
Prints one JSON line per checkpoint plus a final summary line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", type=str, default="run")
    p.add_argument("--field", type=str, default="cp",
                   choices=["cp", "ngp", "tensorf", "voxel"])
    p.add_argument("--channels", type=int, nargs="*", default=None)
    p.add_argument("--resolutions", type=int, nargs="*", default=None)
    p.add_argument("--ranks", type=int, nargs="*", default=None)
    p.add_argument("--plane_res", type=int, nargs="*", default=[])
    p.add_argument("--plane_rank", type=int, nargs="*", default=[])
    p.add_argument("--plane_mode", type=str, default="product",
                   choices=["product", "vm"])
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--table_lr_mult", type=float, default=1.0)
    p.add_argument("--encoder_remat", type=str, default="none",
                   choices=["none", "dots", "full"])
    p.add_argument("--field_reg_weight", type=float, default=0.0)
    p.add_argument("--max_steps", type=int, default=2500)
    p.add_argument("--checkpoints", type=int, nargs="*",
                   default=[500, 1000, 2500])
    p.add_argument("--num_rays", type=int, default=2048)
    p.add_argument("--budget", type=int, default=1 << 16)
    p.add_argument("--fine_probes", type=int, default=4)
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="post-Adam update-norm clip (0 = off, the "
                   "protocol default; the round-5 opaque/textured "
                   "collapses are the reason this knob exists here)")
    p.add_argument("--eval_images", type=int, default=2)
    p.add_argument("--steps_per_call", type=int, default=25)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--scene", type=str, default="procedural",
                   help="procedural scene name (see data.PROCEDURAL_SCENES;"
                   " static scenes only — the round-5 multi-scene protocol"
                   " runs each family over procedural/opaque/textured/"
                   "thin/mixed and reports means)")
    args = p.parse_args()

    import jax
    import numpy as np

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from nerfacc_tpu.data import PROCEDURAL_SCENES, DeviceRaySampler
    from nerfacc_tpu.trainers import NGPOccTrainer

    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    loader_cls = PROCEDURAL_SCENES[args.scene]
    train_ds = loader_cls(
        split="train", num_rays=args.num_rays, seed=args.seed
    )
    test_ds = loader_cls(split="test")

    fkw = {}
    if args.resolutions is not None:
        fkw["resolutions"] = tuple(args.resolutions)
    if args.ranks is not None:
        fkw["ranks"] = tuple(args.ranks)
    if args.field == "cp":
        from nerfacc_tpu.models.cp_field import CPRadianceField

        field = CPRadianceField(
            aabb=tuple(aabb),
            plane_resolutions=tuple(args.plane_res),
            plane_ranks=tuple(args.plane_rank),
            plane_mode=args.plane_mode,
            hidden_dim=args.hidden_dim,
            encoder_remat=args.encoder_remat,
            **fkw,
        )
    elif args.field == "tensorf":
        from nerfacc_tpu.models import TensoRFRadianceField

        field = TensoRFRadianceField(aabb=tuple(aabb), **fkw)
    elif args.field == "voxel":
        from nerfacc_tpu.models import VoxelRadianceField

        vkw = dict(fkw)
        vkw.pop("ranks", None)
        if args.channels is not None:
            vkw["channels"] = tuple(args.channels)
        field = VoxelRadianceField(
            aabb=tuple(aabb), hidden_dim=args.hidden_dim, **vkw
        )
    else:
        from nerfacc_tpu.models import NGPRadianceField

        field = NGPRadianceField(aabb=tuple(aabb))

    trainer = NGPOccTrainer(
        field=field,
        aabb=aabb,
        max_steps=args.max_steps,
        sample_budget=args.budget,
        max_samples_per_ray=1024,
        render_step_size=5e-3,
        fine_probes=args.fine_probes,
        field_reg_weight=args.field_reg_weight,
        lr=args.lr,
        table_lr_mult=args.table_lr_mult,
        grad_clip=args.grad_clip,
        seed=args.seed,
    )
    state = trainer.init_state()
    sampler = DeviceRaySampler.from_loader(train_ds, num_rays=args.num_rays)

    M = args.steps_per_call
    checkpoints = sorted(args.checkpoints)
    assert all(c % M == 0 for c in checkpoints), (
        "checkpoints must be multiples of steps_per_call"
    )

    # compile the fused call once off the clock (both fields pay this once;
    # a 2500-step run would otherwise be ~30% compile)
    state, auxs = trainer.train_steps_sampled(state, sampler, M)
    jax.block_until_ready(auxs["loss"])
    step = M
    train_wall = 0.0
    results = []
    t0 = time.time()
    while step < args.max_steps:
        state, auxs = trainer.train_steps_sampled(state, sampler, M)
        step += M
        if step in checkpoints or step == args.max_steps:
            jax.block_until_ready(auxs["loss"])
            train_wall += time.time() - t0
            m = trainer.eval_metrics(state, test_ds, max_images=args.eval_images)
            results.append(
                {"step": step, "psnr": round(m["psnr"], 2),
                 "ssim": round(m["ssim"], 4),
                 "train_wall_s": round(train_wall, 1)}
            )
            print(json.dumps({"name": args.name, **results[-1]}), flush=True)
            t0 = time.time()

    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(state.params)
    )
    print(json.dumps({
        "name": args.name, "params": n_params,
        "results": results,
    }))


if __name__ == "__main__":
    main()
