"""Train T-NeRF (time-warped NeRF) on a D-NeRF dynamic scene.

TPU-native equivalent of reference examples/train_mlp_tnerf.py: 4x64 warp
MLP + vanilla NeRF, 30k steps, scheduled alpha threshold, per-ray
timestamps flowing through the fused train step.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--scene", type=str, default="lego")
    parser.add_argument("--train_split", type=str, default="train")
    parser.add_argument("--max_steps", type=int, default=30000)
    parser.add_argument("--target_sample_batch_size", type=int, default=1 << 16)
    parser.add_argument("--init_batch_size", type=int, default=1024)
    parser.add_argument("--log_every", type=int, default=5000)
    parser.add_argument("--steps_per_call", type=int, default=8)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--field",
        type=str,
        default="tnerf",
        choices=["tnerf", "kplanes", "tineuvox"],
        help="tnerf = time-warp MLP (reference model); kplanes = the "
        "space-time-plane factorized field (the reference's K-Planes "
        "benchmark family, all-matmul on TPU); tineuvox = time-aware "
        "neural voxels + tiny deformation MLP (the reference's TiNeuVox "
        "benchmark family)",
    )
    parser.add_argument("--field_reg_weight", type=float, default=None,
                        help="TV/smoothness prior weight; None = per-field "
                             "default (kplanes 1e-3 — REQUIRED for "
                             "stability, the 6-plane Hadamard product "
                             "collapses without it; tineuvox 1e-4; "
                             "tnerf 0)")
    parser.add_argument("--lr", type=float, default=None,
                        help="override the per-field default learning rate")
    parser.add_argument("--plane_activation", type=str, default="none",
                        choices=["none", "tanh"],
                        help="kplanes only: bounded per-plane feature "
                             "activation (1 + tanh(f - 1)) — breaks the "
                             "Hadamard-product positive-feedback loop that "
                             "collapses low-TV runs (see KPlanesEncoder)")
    parser.add_argument("--amp_prior", type=float, default=0.0,
                        help="kplanes only: amplitude prior ratio — adds "
                             "amp_prior * mean((plane-1)^2) to the "
                             "regularizer (scaled by field_reg_weight)")
    parser.add_argument("--log_plane_norms", action="store_true",
                        help="kplanes only: log per-level plane magnitude "
                             "stats at every log interval (collapse "
                             "diagnosis)")
    args = parser.parse_args()

    import jax

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from nerfacc_tpu.models import TNeRFRadianceField
    from nerfacc_tpu.trainers import NGPOccTrainer

    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    if args.data_root is not None:
        from nerfacc_tpu.data.dnerf_synthetic import SubjectLoader

        train_dataset = SubjectLoader(
            subject_id=args.scene,
            root_fp=args.data_root,
            split=args.train_split,
            num_rays=args.init_batch_size,
            seed=args.seed,
        )
        test_dataset = SubjectLoader(
            subject_id=args.scene, root_fp=args.data_root, split="test"
        )
    else:
        # no dataset on disk: time-varying procedural scene (D-NeRF role).
        # "procedurallocaldyn" selects the local/non-smooth-motion variant
        # (independent per-blob frequencies + sharp appearance windows).
        from nerfacc_tpu.data import (
            PROCEDURAL_SCENES,
            ProceduralDynamicSceneLoader,
        )

        loader_cls = PROCEDURAL_SCENES.get(
            args.scene, ProceduralDynamicSceneLoader
        )
        train_dataset = loader_cls(
            split="train", num_rays=args.init_batch_size, seed=args.seed
        )
        test_dataset = loader_cls(split="test")

    if args.field == "kplanes":
        from nerfacc_tpu.models import KPlanesRadianceField

        field = KPlanesRadianceField(
            aabb=tuple(aabb),
            plane_activation=args.plane_activation,
            amp_prior=args.amp_prior,
        )
        # TV 1e-3 is the raw-product stability requirement; the bounded
        # tanh activation doesn't need the strong prior (measured, see
        # docs/benchmarks.md K-Planes stability table)
        reg_raw = 1e-3 if args.plane_activation == "none" else 1e-4
        lr, adam_eps, warmup, reg_default = 1e-2, 1e-15, 100, reg_raw
    elif args.field == "tineuvox":
        from nerfacc_tpu.models import TiNeuVoxRadianceField

        field = TiNeuVoxRadianceField(aabb=tuple(aabb))
        lr, adam_eps, warmup, reg_default = 1e-2, 1e-15, 100, 1e-4
    else:
        field = TNeRFRadianceField()
        lr, adam_eps, warmup, reg_default = 5e-4, 1e-8, 0, 0.0
    if args.lr is not None:
        lr = args.lr
    trainer = NGPOccTrainer(
        field=field,
        aabb=aabb,
        max_steps=args.max_steps,
        render_step_size=5e-3,
        lr=lr,
        weight_decay=0.0,
        adam_eps=adam_eps,
        warmup_lr_steps=warmup,
        sample_budget=args.target_sample_batch_size,
        max_samples_per_ray=1024,
        time_dependent=True,
        timestamps=train_dataset.timestamps,
        field_reg_weight=(
            reg_default
            if args.field_reg_weight is None
            else args.field_reg_weight
        ),
        seed=args.seed,
    )
    state = trainer.init_state()

    from train_ngp_nerf_occ import round_to_bucket

    buckets = sorted({1024 * 2**i for i in range(7)} | {1536 * 2**i for i in range(6)})
    rng = np.random.default_rng(args.seed)
    tic = time.time()
    M = max(1, args.steps_per_call)
    step = 0
    total_samples = 0
    while step <= args.max_steps:
        datas = [
            train_dataset[int(rng.integers(0, len(train_dataset)))]
            for _ in range(M)
        ]
        batches = {k: np.stack([d[k] for d in datas]) for k in datas[0]}
        state, auxs = trainer.train_steps(state, batches)
        step += M
        total_samples += int(np.asarray(auxs["n_total_samples"]).sum())

        n_total = int(np.asarray(auxs["n_total_samples"])[-1])
        if n_total > 0 and args.target_sample_batch_size > 0:
            num_rays = train_dataset.num_rays
            num_rays = int(
                num_rays * (args.target_sample_batch_size / float(n_total))
            )
            train_dataset.update_num_rays(round_to_bucket(num_rays, buckets))

        if step % args.log_every < M:
            jax.block_until_ready(state.params)
            mse = float(np.asarray(auxs["mse"])[-1])
            psnr = -10.0 * np.log10(max(mse, 1e-10))
            print(
                f"elapsed_time={time.time() - tic:.2f}s | step={step} | "
                f"psnr={psnr:.2f} | num_rays={len(datas[0]['rgb'])}"
            )
            if args.log_plane_norms and args.field == "kplanes":
                # collapse diagnosis: per-level plane magnitude stats —
                # the Hadamard feedback shows as |p-1| drifting up level
                # by level before train PSNR moves
                for li, p in enumerate(state.params["encoder"]["planes"]):
                    p = np.asarray(p)
                    d = np.abs(p - 1.0)
                    print(
                        f"  planes L{li}: mean|p-1|={d.mean():.4f} "
                        f"max|p-1|={d.max():.3f} rms={np.sqrt((p*p).mean()):.4f}",
                        flush=True,
                    )

    train_wall = time.time() - tic
    m = trainer.eval_metrics(state, test_dataset)
    print(
        f"evaluation: psnr_avg={m['psnr']:.2f} ssim_avg={m['ssim']:.4f} | "
        f"train_wall={train_wall:.1f}s"
    )
    # one machine-readable summary line (the round-5 multi-scene sweep
    # harness greps these; samples_per_sec = rendered train samples /
    # train wall — the same numerator bench.py reports)
    import json

    print(json.dumps({
        "name": f"{args.field}@{args.scene}",
        "field": args.field,
        "scene": args.scene,
        "steps": args.max_steps,
        "psnr": round(m["psnr"], 2),
        "ssim": round(m["ssim"], 4),
        "train_wall_s": round(train_wall, 1),
        "samples_per_sec": round(total_samples / max(train_wall, 1e-9)),
    }), flush=True)


if __name__ == "__main__":
    main()
